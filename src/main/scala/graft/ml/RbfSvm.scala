package graft.ml

/** Exact C-SVC with an RBF kernel — the reference's model family.
  *
  * The reference trains Gaia/libsvm support-vector classifiers with the
  * RBF kernel over a C × gamma × preprocessing grid and keeps the most
  * accurate model (reference `dataset_eval/gaia_wrapper.py:22-119`,
  * `db/dataset_eval.py:43-45`). Until round 9 this engine approximated
  * the family with Random Fourier Features + a linear SVM; this is the
  * exact dual solver, closing that gap.
  *
  * Clean-room implementation from the published algorithm descriptions:
  * SMO on the dual with maximal-violating-pair working-set selection
  * (Keerthi et al., "Improvements to Platt's SMO Algorithm", Neural
  * Computation 13(3), 2001; Fan, Chen & Lin, JMLR 6, 2005) and
  * one-vs-one multiclass voting as in LIBSVM (Chang & Lin, "LIBSVM: A
  * Library for Support Vector Machines", ACM TIST 2(3), 2011). No code
  * consulted — only the papers' math.
  *
  * Everything is deterministic: no RNG anywhere, working-set ties break
  * on the lowest index, and callers pass rows in a stable order — the
  * same model comes out on any cluster, any run. Training sets here are
  * bounded dataset SNAPSHOTS (the reference trains per-dataset, never
  * per-corpus), so a single model fit is a single-task problem; the
  * distribution axes are the hyper-parameter grid × CV folds (each
  * combo an independent task over a broadcast sample) and the scoring
  * of the test set (embarrassingly parallel over partitions).
  */
object RbfSvm {

  /** One trained binary C-SVC: support vectors, their y·α coefficients,
    * the bias `rho` (decision f(x) = Σ coef·K(sv,x) − rho), and the SMO
    * iteration count (diagnostics). */
  final case class Binary(
      sv: Array[Array[Double]],
      coef: Array[Double],
      rho: Double,
      iters: Int)

  /** One-vs-one multiclass model: `classes` sorted ascending;
    * `machines(k)` is the binary model for the pair `pairs(k) = (i, j)`
    * with class `classes(i)` mapped to +1 and `classes(j)` to −1. */
  final case class Ovo(
      classes: Array[Int],
      pairs: Array[(Int, Int)],
      machines: Array[Binary],
      gamma: Double)

  @inline private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var k = 0
    while (k < a.length) { val d = a(k) - b(k); s += d * d; k += 1 }
    s
  }

  @inline def kernel(a: Array[Double], b: Array[Double], gamma: Double): Double =
    math.exp(-gamma * sqDist(a, b))

  /** SMO for binary C-SVC. `x` rows with labels `y` ∈ {+1,−1}; dual
    * min ½αᵀQα − eᵀα, 0 ≤ α ≤ C, yᵀα = 0 with Q_ij = y_i y_j K_ij.
    * Gradient G_i = (Qα)_i − 1 is kept incrementally; each iteration
    * picks the maximal violating pair (i from I_up maximizing −y·G, j
    * from I_low minimizing it), solves the two-variable subproblem
    * analytically and clips to the box. Stops when the violation gap
    * m(α) − M(α) ≤ tol (LIBSVM's default tol 1e-3 kept). The kernel row
    * cache is the full Gram matrix — training sets are snapshots, never
    * the corpus, so n is small by construction and O(n²) memory is the
    * right trade. */
  def trainBinary(
      x: Array[Array[Double]],
      y: Array[Int],
      c: Double,
      gamma: Double,
      tol: Double = 1e-3,
      maxIter: Int = 200000): Binary = {
    val n = x.length
    require(n > 0, "empty training set")
    val gram = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var j = 0
      while (j <= i) {
        val k = kernel(x(i), x(j), gamma)
        gram(i)(j) = k; gram(j)(i) = k
        j += 1
      }
      i += 1
    }
    val alpha = new Array[Double](n)
    val grad = Array.fill(n)(-1.0)
    var iter = 0
    var mUp = 0.0
    var mLow = 0.0
    var done = false
    while (!done && iter < maxIter) {
      // maximal violating pair: -y*G extremes over the feasible index sets
      var iUp = -1; var iLow = -1
      mUp = Double.NegativeInfinity; mLow = Double.PositiveInfinity
      var t = 0
      while (t < n) {
        val v = -y(t) * grad(t)
        val inUp = if (y(t) > 0) alpha(t) < c else alpha(t) > 0
        val inLow = if (y(t) > 0) alpha(t) > 0 else alpha(t) < c
        if (inUp && v > mUp) { mUp = v; iUp = t }
        if (inLow && v < mLow) { mLow = v; iLow = t }
        t += 1
      }
      if (iUp < 0 || iLow < 0 || mUp - mLow <= tol) done = true
      else {
        val ii = iUp; val jj = iLow
        // minimize along the equality-feasible direction
        // Δα_ii = y_ii·s, Δα_jj = −y_jj·s; quadratic coefficient is
        // K_ii + K_jj − 2K_ij regardless of the label pattern.
        val quad = math.max(gram(ii)(ii) + gram(jj)(jj) - 2.0 * gram(ii)(jj), 1e-12)
        var s = (mUp - mLow) / quad
        // box clipping for both coordinates
        var lo = if (y(ii) > 0) -alpha(ii) else alpha(ii) - c
        var hi = if (y(ii) > 0) c - alpha(ii) else alpha(ii)
        val lo2 = if (y(jj) > 0) alpha(jj) - c else -alpha(jj)
        val hi2 = if (y(jj) > 0) alpha(jj) else c - alpha(jj)
        if (lo2 > lo) lo = lo2
        if (hi2 < hi) hi = hi2
        if (s < lo) s = lo
        if (s > hi) s = hi
        alpha(ii) += y(ii) * s
        alpha(jj) -= y(jj) * s
        // G_t += y_t·s·(K_ti − K_tj)
        var u = 0
        while (u < n) {
          grad(u) += y(u) * s * (gram(u)(ii) - gram(u)(jj))
          u += 1
        }
        iter += 1
      }
    }
    // rho: free SVs satisfy y_i·G_i = rho; all −y·G gap members straddle
    // −rho, so rho = −(mUp + mLow)/2 covers the no-free-SV case too.
    var rhoSum = 0.0; var nFree = 0
    var t = 0
    while (t < n) {
      if (alpha(t) > 0 && alpha(t) < c) { rhoSum += y(t) * grad(t); nFree += 1 }
      t += 1
    }
    val rho0 = if (nFree > 0) rhoSum / nFree else -(mUp + mLow) / 2.0
    // a degenerate input (e.g. a single-class fold) leaves one side of
    // the violation gap empty — fall back to a neutral bias rather than
    // propagate ±Inf into every decision value
    val rho = if (java.lang.Double.isFinite(rho0)) rho0 else 0.0
    val svIdx = (0 until n).filter(alpha(_) > 0).toArray
    Binary(
      svIdx.map(x(_)),
      svIdx.map(k => alpha(k) * y(k)),
      rho,
      iter)
  }

  /** Binary decision value f(x) = Σ coef·K(sv, x) − rho. */
  def decision(m: Binary, gamma: Double, x: Array[Double]): Double = {
    var s = 0.0; var k = 0
    while (k < m.sv.length) { s += m.coef(k) * kernel(m.sv(k), x, gamma); k += 1 }
    s - m.rho
  }

  /** One-vs-one training over (label, features) rows. Classes sorted
    * ascending (stable across engines, unlike order-of-appearance); for
    * the pair (classes(i), classes(j)), i < j, rows of classes(i) are
    * +1. Rows must arrive in a stable caller-defined order. */
  def trainOvo(
      rows: Array[(Int, Array[Double])],
      c: Double,
      gamma: Double): Ovo = {
    val classes = rows.map(_._1).distinct.sorted
    val byClass = classes.map(cl => rows.filter(_._1 == cl).map(_._2))
    val pairs = for {
      i <- classes.indices
      j <- classes.indices
      if i < j
    } yield (i, j)
    val machines = pairs.map { case (i, j) =>
      val x = byClass(i) ++ byClass(j)
      val y = Array.fill(byClass(i).length)(1) ++ Array.fill(byClass(j).length)(-1)
      trainBinary(x, y, c, gamma)
    }
    Ovo(classes, pairs.toArray, machines.toArray, gamma)
  }

  /** LIBSVM's OvO vote aggregation, isolated from the decision machinery:
    * pairwise sign k decides pair (i, j) — true votes i (f > 0 → first
    * class), false votes j; most votes wins, ties break to the smallest
    * class INDEX (classes are sorted ascending, so that is the smallest
    * label). This exact argmax — max votes, tie to smallest — is what the
    * oracle-gated `m4_ovo_votes` plan replays in SQL, and RbfSvmSpec pins
    * the two formulations against each other on exhaustive small vote
    * matrices. */
  def vote(nClasses: Int, pairs: Array[(Int, Int)],
      signs: Array[Boolean]): Int = {
    val votes = new Array[Int](nClasses)
    var k = 0
    while (k < pairs.length) {
      val (i, j) = pairs(k)
      if (signs(k)) votes(i) += 1 else votes(j) += 1
      k += 1
    }
    var best = 0; var b = votes(0)
    var t = 1
    while (t < nClasses) {
      if (votes(t) > b) { b = votes(t); best = t }
      t += 1
    }
    best
  }

  /** LIBSVM-style prediction: each pairwise machine's decision sign feeds
    * [[vote]]. */
  def predict(m: Ovo, x: Array[Double]): Int = {
    val signs = new Array[Boolean](m.machines.length)
    var k = 0
    while (k < m.machines.length) {
      signs(k) = decision(m.machines(k), m.gamma, x) > 0
      k += 1
    }
    m.classes(vote(m.classes.length, m.pairs, signs))
  }

  /** Per-dimension standardization fitted on the training sample — the
    * "normalized" arm of the reference's preprocessing axis (gaia's
    * project file carries a preprocessing list per classifier; reference
    * `dataset_eval/gaia_wrapper.py:60-80`). σ = 0 dims pass through
    * unscaled, matching `n1_vector_normalize`'s zero-std guard. */
  final case class Standardizer(mean: Array[Double], std: Array[Double]) {
    def apply(x: Array[Double]): Array[Double] = {
      if (mean.length == 0) return x // identity: fitted on an empty corpus
      val out = new Array[Double](x.length)
      var k = 0
      while (k < x.length) {
        out(k) = if (std(k) == 0.0) x(k) else (x(k) - mean(k)) / std(k)
        k += 1
      }
      out
    }
  }

  /** Inverse standard-normal CDF via Peter Acklam's published rational
    * approximation (relative error < 1.15e-9 — "An algorithm for
    * computing the inverse normal cumulative distribution function",
    * 2003; the coefficients are public). Deterministic plain arithmetic,
    * no library dependency. */
  // Acklam coefficients, object-level: probit runs once per (row, dim)
  // inside Gaussianizer — per-call array allocation would dominate it
  private val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
    -2.759285104469687e+02, 1.383577518672690e+02,
    -3.066479806614716e+01, 2.506628277459239e+00)
  private val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
    -1.556989798598866e+02, 6.680131188771972e+01,
    -1.328068155288572e+01)
  private val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
    -2.400758277161838e+00, -2.549732539343734e+00,
    4.374664141464968e+00, 2.938163982698783e+00)
  private val dd = Array(7.784695709041462e-03, 3.224671290700398e-01,
    2.445134137142996e+00, 3.754408661907416e+00)

  def probit(p: Double): Double = {
    val pLow = 0.02425
    if (p < pLow) {
      val q = math.sqrt(-2.0 * math.log(p))
      (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((dd(0) * q + dd(1)) * q + dd(2)) * q + dd(3)) * q + 1.0)
    } else if (p <= 1.0 - pLow) {
      val q = p - 0.5
      val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1.0)
    } else {
      val q = math.sqrt(-2.0 * math.log(1.0 - p))
      -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((dd(0) * q + dd(1)) * q + dd(2)) * q + dd(3)) * q + 1.0)
    }
  }

  /** Rank-based per-dimension gaussianization fitted on the training
    * sample — the "gaussianized" arm of the reference's preprocessing
    * axis. Each value maps through the train empirical CDF (midrank for
    * ties, clamped away from {0,1}) into [[probit]]. Deterministic:
    * sorted train columns + binary search, no RNG. */
  final case class Gaussianizer(sorted: Array[Array[Double]]) {
    def apply(x: Array[Double]): Array[Double] = {
      if (sorted.length == 0) return x // identity: fitted on an empty corpus
      val out = new Array[Double](x.length)
      var k = 0
      while (k < x.length) {
        val col = sorted(k); val n = col.length
        val v = x(k)
        var lo = 0; var hi = n
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (col(mid) < v) lo = mid + 1 else hi = mid
        }
        var eq = lo
        while (eq < n && col(eq) == v) eq += 1
        val rank = lo + 0.5 * (eq - lo)
        val p = math.min(math.max((rank + 0.5) / (n + 1.0), 1e-9), 1.0 - 1e-9)
        out(k) = probit(p)
        k += 1
      }
      out
    }
  }

  object Gaussianizer {
    /** Total on empty input: returns the identity transform rather than
      * throwing on rows.head — callers (MLPack.prepOf) eta-expand fit and
      * an innocent hoist must not reintroduce the empty-corpus crash. */
    def fit(rows: Array[Array[Double]]): Gaussianizer = {
      if (rows.isEmpty) return Gaussianizer(Array.empty)
      val dim = rows.head.length
      Gaussianizer(Array.tabulate(dim) { k =>
        val col = rows.map(_(k)); java.util.Arrays.sort(col); col
      })
    }
  }

  object Standardizer {
    /** Total on empty input: identity transform (see Gaussianizer.fit). */
    def fit(rows: Array[Array[Double]]): Standardizer = {
      if (rows.isEmpty) return Standardizer(Array.empty, Array.empty)
      val dim = rows.head.length
      val n = rows.length.toDouble
      val mean = new Array[Double](dim)
      val m2 = new Array[Double](dim)
      rows.foreach { r =>
        var k = 0
        while (k < dim) { mean(k) += r(k); k += 1 }
      }
      var k = 0
      while (k < dim) { mean(k) /= n; k += 1 }
      rows.foreach { r =>
        var j = 0
        while (j < dim) { val d = r(j) - mean(j); m2(j) += d * d; j += 1 }
      }
      val std = m2.map(v => math.sqrt(v / n))
      Standardizer(mean, std)
    }
  }
}
