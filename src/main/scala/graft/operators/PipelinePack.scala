package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The training-data corpus-prep pipeline as ONE declarative plan — the
  * composition the individual operators exist for: language filter →
  * quality filter → exact dedup → MinHash-LSH near-dup removal → token
  * accounting. At 100 TB this is the nightly corpus build; expressing it as
  * a single DataFrame lets Catalyst fuse the per-row stages (lang-ID,
  * quality, hashing are one codegen'd pass over `text`) and schedule the
  * two wide stages (content-hash groupBy, LSH bucket groupBy) back to back
  * on the already-filtered minority of rows.
  *
  * Stage semantics (each deterministic, mirrored in the oracle):
  *  1. keep docs whose n-gram language guess is 'en'
  *     (TextFunctions.langGuess — reference-shaped validation gate,
  *     db/data.py:114-135);
  *  2. keep docs with >= [[MinTokens]] whitespace tokens and stopword
  *     ratio >= [[MinStopRatio]] (the classic Gopher-style quality cuts);
  *  3. exact dedup: keep the lowest doc_id per md5(text) group (reference
  *     D1's content-hash dedup, db/data.py:250-257);
  *  4. near-dup removal: greedy keep-lowest — drop any surviving doc that
  *     appears as `doc_b` (the higher id) in a MinHash-LSH candidate pair
  *     over the SURVIVING corpus ([[DedupPack.minhashPairs]]). Greedy-by-id
  *     is order-deterministic and needs no connected components; chains
  *     a<b<c drop both b and c.
  *
  * Scale note: exact dedup is a `row_number` window over the content hash
  * (one shuffle, no join-back — the groupBy+self-join formulation scans the
  * filtered corpus twice). The deduped-corpus subtree is referenced twice
  * (LSH pair generation + final output), so it is persisted
  * (MEMORY_AND_DISK) between the stages — the lang/quality/dedup cascade
  * runs once, and at 100 TB the survivors spill instead of recomputing.
  */
object PipelinePack {

  /** Minimum whitespace-token count to survive the quality cut. */
  val MinTokens = 15

  /** Token budget per packed training sequence (`pipe_pack_sequences`). */
  val PackBudget = 512L

  /** Minimum stopword ratio (stopword-looking docs are prose, not noise). */
  val MinStopRatio = 0.01

  /** Target training-mixture weights by language, as integer parts of
    * [[MixDen]] (en-heavy, the usual pre-training mixture shape). Integer
    * weights keep every threshold computation in exact BIGINT arithmetic
    * on both engines — no float rounding to diverge on. */
  private[graft] val MixWeights: Seq[(String, Long)] =
    Seq("de" -> 2L, "en" -> 4L, "es" -> 1L, "fr" -> 2L, "zh" -> 1L)

  /** Denominator of the mixture weights (= sum of [[MixWeights]]). */
  private[graft] val MixDen = 10L

  /** Hash-threshold scale: u = first 8 hex chars of md5 ∈ [0, 2^32). */
  private[graft] val MixScale = 4294967296L

  /** Negatives per document / bucket count for `pipe_negative_pairs`. */
  private[graft] val NegK = 4L
  private[graft] val NegBuckets = 256L

  /** Exact integer division for positive longs: `a - a%b` is an exact
    * multiple of `b`, and IEEE double division of exact multiples below
    * 2^53 is exact — unlike `(a / b).cast(long)`, which truncates a
    * correctly-rounded but inexact quotient. (Spark's DataFrame `/` on
    * longs is double division; SQL's `div` has no `functions` twin.) */
  private def idiv(a: Column, b: Column): Column =
    ((a - a % b) / b).cast("long")

  /** The domain-mix resample: documents kept so the corpus matches the
    * [[MixWeights]] target language mixture, sized to the largest total the
    * mixture permits (the scarcest language binds: N_out = min over langs
    * of n_l · MixDen / w_l).
    *
    * Membership is a pure hash-threshold filter — doc kept iff
    * `u(doc_id) < w_l · N_out · 2^32 / (MixDen · n_l)` with u uniform from
    * md5 — NOT a per-language rank window. The window formulation
    * (`row_number() OVER (PARTITION BY lang ORDER BY hash) <= k_l`) hits
    * the exact counts but pays a full shuffle + sort of the corpus; the
    * threshold form touches each row once with a 5-row broadcast joined in,
    * which is the only shape that survives 100 TB. The price is sampling
    * noise in the achieved counts (binomial around k_l) — exactly the
    * trade a production mixture sampler makes.
    *
    * Scale note on the threshold arithmetic: `w·N_out·2^32` stays inside
    * BIGINT up to ~10^9 docs per language; beyond that the product must
    * move to DECIMAL(38,0) (both engines have it) — the formula, not the
    * plan, changes. Returns per-doc rows with `u` and `thresh` attached. */
  private def domainMix(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
      .filter(col("lang").isin(MixWeights.map(_._1): _*))
    val weights = MixWeights.toDF("lang", "wt")
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .join(weights, "lang")
    val nout = counts.agg(
      min(idiv(col("n") * MixDen, col("wt"))).as("nout"))
    val thresholds = counts.crossJoin(nout).select(
      col("lang"), col("n"), col("wt"),
      idiv(col("wt") * col("nout") * MixScale, col("n") * MixDen)
        .as("thresh"))
    val u = conv(
      substring(md5(concat(lit("mix:"), col("doc_id").cast("string"))), 1, 8),
      16, 10).cast("long")
    docs.join(broadcast(thresholds), "lang").withColumn("u", u)
  }

  /** Sequence packing: assign documents to fixed-token-budget training
    * bins — the batch-prep step between a cleaned corpus and a training
    * run (every LLM data pipeline ends in some form of this). Streaming
    * first-fit in doc_id order WITHIN each source: a document goes to bin
    * `floor(preceding_cum_tokens / budget)`, so bins are contiguous id
    * ranges and a bin can overflow its budget by at most one document —
    * the standard overflow-tolerant streaming pack (the alternative,
    * best-fit bin packing, is NP-hard and inherently sequential; this
    * formulation is one window computation and fully deterministic).
    *
    * Scale: the window partitions by `source` — the ingest-shard key at
    * deployment scale — so each shard packs independently in one shuffle
    * and no global ordered scan exists. Per-shard packing is also what a
    * training job wants (shards stream independently into loaders). */
  private[graft] def packSequences(docs: DataFrame): DataFrame = {
    val wCum = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val wPos = Window.partitionBy(col("source"), col("bin"))
      .orderBy(col("doc_id"))
    docs
      .select(col("doc_id"), col("source"),
        tokenCount(col("text")).as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(wCum))
      .withColumn("bin",
        floor((col("cum") - col("n_tokens")) / PackBudget).cast("long"))
      .withColumn("bin_pos", row_number().over(wPos).cast("long"))
      .select("doc_id", "source", "n_tokens", "bin", "bin_pos")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- training-sequence packing over the documents table --------------
    "pipe_pack_sequences" -> ((s, d) =>
      packSequences(Tables.documents(s, d))
        .orderBy("source", "bin", "bin_pos")),

    // ---- per-bin fill accounting: the packing-efficiency monitor ---------
    // (fill_ratio > 1 marks the overflow bins — bounded by one document)
    "pipe_pack_stats" -> ((s, d) =>
      packSequences(Tables.documents(s, d))
        .groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("bin_tokens"))
        .withColumn("fill_ratio",
          round(col("bin_tokens").cast("double") / PackBudget, 6))
        .orderBy("source", "bin")),

    // ---- contrastive negative sampling ----------------------------------
    // Deterministic pseudo-random negative partners per document — the
    // pair-generation step of contrastive / embedding training. Each
    // (doc, i < NegK) hashes into one of [[NegBuckets]] buckets whose
    // REPRESENTATIVE (lowest doc_id hashed into it) becomes the negative;
    // self-pairs and same-source pairs (near-positives) are dropped —
    // "up to K negatives, with replacement" is the defined contract,
    // mirrored in the oracle. Scale shape: ONE aggregate builds the
    // B-row representative table, then a broadcast join — no corpus
    // self-join, no global sort, no RNG (the md5-prefix recipe shared
    // with the domain-mix sampler reproduces bit-identically on any
    // engine). ------------------------------------------------------------
    "pipe_negative_pairs" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
      def u(prefix: String, c: Column) = conv(
        substring(md5(concat(lit(prefix), c)), 1, 8), 16, 10).cast("long")
      val reps = docs
        .withColumn("bkt",
          pmod(u("negrep:", col("doc_id").cast("string")), lit(NegBuckets)))
        .groupBy("bkt").agg(min(col("doc_id")).as("neg_id"))
        .join(docs.select(col("doc_id").as("neg_id"),
          col("source").as("neg_source")), Seq("neg_id"))
      docs
        .select(col("doc_id"), col("source"),
          explode(sequence(lit(0L), lit(NegK - 1L))).as("i"))
        .withColumn("bkt", pmod(
          u("neg:", concat(col("doc_id").cast("string"), lit(":"),
            col("i").cast("string"))), lit(NegBuckets)))
        .join(broadcast(reps), Seq("bkt"))
        .filter(col("neg_id") =!= col("doc_id") &&
          col("neg_source") =!= col("source"))
        .select(col("doc_id"), col("i"), col("neg_id"))
        .orderBy("doc_id", "i")
    }),

    // ---- domain-mix resample: kept rows (the corpus a training run reads) -
    "pipe_domain_mix" -> ((s, d) =>
      domainMix(s, d).filter(col("u") < col("thresh"))
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")),

    // ---- mixture accounting: per-language totals, kept counts, thresholds -
    "pipe_domain_mix_stats" -> ((s, d) =>
      domainMix(s, d)
        .groupBy(col("lang"), col("wt"), col("thresh"))
        .agg(count(lit(1)).as("n_total"),
          count(when(col("u") < col("thresh"), 1)).as("n_kept"))
        .select(col("lang"), col("wt"), col("n_total"), col("n_kept"),
          col("thresh"))
        .orderBy("lang")),

    "pipe_corpus_prep" -> ((s, d) => {
      val t = col("text")
      val scored = Tables.documents(s, d)
        .select(col("doc_id"), t,
          tokenCount(t).as("n_tokens"),
          stopwordRatio(t).as("stop_ratio"),
          langGuess(t).as("pred_lang"),
          bpeTokenEstimate(t).as("est_bpe_tokens"))
      val filt = scored
        .filter(col("pred_lang") === "en" &&
          col("n_tokens") >= MinTokens && col("stop_ratio") >= MinStopRatio)
      // exact dedup as a window (keep lowest doc_id per content hash): one
      // shuffle on the hash and NO join back — the groupBy+self-join
      // formulation scans the filtered corpus twice
      val wHash = Window.partitionBy(md5(col("text")))
        .orderBy(col("doc_id"))
      // the deduped corpus feeds BOTH the LSH pair generation and the final
      // anti-join; persist it so the filter→window subtree runs once, not
      // per reference (MEMORY_AND_DISK: at 100 TB the survivors of the
      // lang/quality/dedup cuts are a minority of the input but can still
      // exceed executor memory — spill, don't recompute)
      val corpus = filt
        .withColumn("rn", row_number().over(wHash))
        .filter(col("rn") === 1)
        .drop("rn")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nearDupLosers = DedupPack.minhashPairs(corpus.select("doc_id", "text"))
        .select(col("doc_b").as("doc_id"))
        .distinct()
      corpus.join(nearDupLosers, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("n_tokens"), col("est_bpe_tokens"))
        .orderBy("doc_id")
    })
  )

  /** Shared CTE chain for the two domain-mix oracles — mirrors
    * [[domainMix]] stage for stage, all-BIGINT (`//` is DuckDB integer
    * division; the hex-prefix cast is its `'0x…'::BIGINT`). */
  private def mixCtes: String = {
    val langList = MixWeights.map(w => s"'${w._1}'").mkString(", ")
    val valuesSql = MixWeights
      .map { case (l, w) => s"('$l', CAST($w AS BIGINT))" }.mkString(", ")
    s"""WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents
       |  WHERE lang IN ($langList) GROUP BY lang),
       |w(lang, wt) AS (VALUES $valuesSql),
       |cw AS (SELECT c.lang, c.n, w.wt FROM c JOIN w USING (lang)),
       |no AS (SELECT MIN(n * $MixDen // wt) AS nout FROM cw),
       |th AS (SELECT lang, n, wt,
       |  CAST(wt * no.nout * $MixScale // (n * $MixDen) AS BIGINT) AS thresh
       |  FROM cw, no),
       |uu AS (SELECT d.doc_id, d.lang, th.wt, th.thresh,
       |  ('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
       |    AS u
       |  FROM documents d JOIN th USING (lang))""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "pipe_negative_pairs" ->
      s"""WITH d AS (SELECT doc_id, source FROM documents),
         |reps0 AS (
         |  SELECT ('0x' || substr(md5('negrep:' || CAST(doc_id AS VARCHAR)),
         |      1, 8))::BIGINT % $NegBuckets AS bkt,
         |    MIN(doc_id) AS neg_id
         |  FROM d GROUP BY 1),
         |reps AS (SELECT r.bkt, r.neg_id, d.source AS neg_source
         |  FROM reps0 r JOIN d ON d.doc_id = r.neg_id),
         |cand AS (
         |  SELECT d.doc_id, d.source, gi.i,
         |    ('0x' || substr(md5('neg:' || CAST(d.doc_id AS VARCHAR) || ':'
         |        || CAST(gi.i AS VARCHAR)), 1, 8))::BIGINT % $NegBuckets
         |      AS bkt
         |  FROM d, (SELECT unnest(generate_series(0, ${NegK - 1})) AS i) gi)
         |SELECT c.doc_id, c.i, r.neg_id
         |FROM cand c JOIN reps r USING (bkt)
         |WHERE r.neg_id <> c.doc_id AND r.neg_source <> c.source
         |ORDER BY doc_id, i""".stripMargin,

    "pipe_domain_mix" ->
      s"""$mixCtes
         |SELECT doc_id, lang FROM uu WHERE u < thresh
         |ORDER BY doc_id""".stripMargin,

    "pipe_domain_mix_stats" ->
      s"""$mixCtes
         |SELECT lang, wt, CAST(COUNT(*) AS BIGINT) AS n_total,
         |  CAST(COUNT(*) FILTER (WHERE u < thresh) AS BIGINT) AS n_kept,
         |  thresh
         |FROM uu GROUP BY lang, wt, thresh ORDER BY lang""".stripMargin,

    "pipe_pack_sequences" -> {
      import TextPack.toksSql
      s"""WITH toks AS (SELECT doc_id, source,
         |  CAST(len($toksSql) AS BIGINT) AS n_tokens FROM documents),
         |cum AS (SELECT doc_id, source, n_tokens,
         |  SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS cum
         |  FROM toks)
         |SELECT doc_id, source, n_tokens,
         |  CAST((cum - n_tokens) // $PackBudget AS BIGINT) AS bin,
         |  CAST(row_number() OVER (PARTITION BY source,
         |    (cum - n_tokens) // $PackBudget ORDER BY doc_id) AS BIGINT)
         |    AS bin_pos
         |FROM cum ORDER BY source, bin, bin_pos""".stripMargin
    },

    "pipe_pack_stats" -> {
      import TextPack.toksSql
      s"""WITH toks AS (SELECT doc_id, source,
         |  CAST(len($toksSql) AS BIGINT) AS n_tokens FROM documents),
         |cum AS (SELECT doc_id, source, n_tokens,
         |  SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS cum
         |  FROM toks),
         |binned AS (SELECT source, n_tokens,
         |  CAST((cum - n_tokens) // $PackBudget AS BIGINT) AS bin FROM cum)
         |SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
         |  round(CAST(SUM(n_tokens) AS DOUBLE) / $PackBudget, 6)
         |    AS fill_ratio
         |FROM binned GROUP BY source, bin
         |ORDER BY source, bin""".stripMargin
    },

    "pipe_corpus_prep" -> {
      import TextPack.{countSql, langCaseSql, toksSql}
      import graft.functions.TextFunctions.EnglishStopwords
      s"""WITH scored AS (SELECT doc_id, text,
         |  CAST(len($toksSql) AS BIGINT) AS n_tokens,
         |  CAST(${countSql(EnglishStopwords)} AS DOUBLE)
         |    / len($toksSql) AS stop_ratio,
         |  $langCaseSql AS pred_lang,
         |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens
         |FROM documents),
         |filt AS (SELECT doc_id, text, n_tokens, est_bpe_tokens FROM scored
         |  WHERE pred_lang = 'en' AND n_tokens >= $MinTokens
         |    AND stop_ratio >= $MinStopRatio),
         |corpus AS (SELECT doc_id, text, n_tokens, est_bpe_tokens FROM (
         |  SELECT f.*, row_number() OVER (PARTITION BY md5(text)
         |    ORDER BY doc_id) AS rn
         |  FROM filt f) t WHERE rn = 1),
         |${DedupPack.minhashPairCtes("corpus")}
         |SELECT doc_id, n_tokens, est_bpe_tokens FROM corpus
         |WHERE doc_id NOT IN (SELECT doc_b FROM mhpairs)
         |ORDER BY doc_id""".stripMargin
    }
  )
}
