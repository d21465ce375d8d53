package graft.operators

import graft.Tables
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity-engine operators over the `embeddings` table — the Spark-first
  * re-expression of the reference's metric-vector + Annoy ANN subsystem
  * (reference: similarity/metrics.py, similarity/index_model.py,
  * db/similarity_stats.py).
  *
  * Scale design: population statistics are a 64-row aggregate broadcast back
  * to the fact table (reference N2's 10k-sample stats, db/similarity_stats.py
  * :27-61); brute-force top-K broadcasts the (small) query set against the
  * corpus and never collects vectors to the driver; the sign-LSH variant
  * buckets the corpus so each query only scores its own bucket — the
  * 100 TB path where brute force stops being viable. Exact decimal sums make
  * the per-dimension stats bit-identical across engines and cluster sizes.
  */
object SimilarityPack {

  private val Dim = 64
  private val dec9 = DecimalType(18, 9)

  /** (vec_id, pos [1-based], val double) exploded view of the embeddings. */
  private def exploded(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        posexplode(asDouble(col("embedding"))).as(Seq("p0", "val")))
      .select(col("vec_id"), (col("p0") + 1).cast(LongType).as("pos"),
        col("val"))

  /** Per-dimension population stats, bit-identical across engines.
    *
    * Values are scaled to exact 1e-9-grid integers before summation, so both
    * the sum and the sum of squares are exact integer arithmetic (BIGINT /
    * DECIMAL(38,0)); every cast back to double is then a single correctly
    * rounded operation in both Spark and DuckDB. (Casting a scale-18 decimal
    * to double double-rounds in DuckDB, and decimal rescale truncates there
    * but rounds half-up in Spark — integer domain sidesteps both.) */
  private def dimStats(s: SparkSession, d: String): DataFrame =
    exploded(s, d)
      .withColumn("iv", round(col("val") * 1e9, 0).cast(LongType))
      .groupBy(col("pos"))
      .agg(
        sum(col("iv")).as("s9"),
        sum(col("iv").cast(DecimalType(19, 0)) *
            col("iv").cast(DecimalType(19, 0))).as("sq0"),
        count(lit(1)).as("n"),
        min(col("val")).as("vmin"),
        max(col("val")).as("vmax"))
      .select(col("pos"), col("n"), col("vmin"), col("vmax"),
        (col("s9").cast(DoubleType) / 1e9).as("sd"),
        (col("sq0").cast(DoubleType) / 1e18).as("sq"))
      .select(col("pos"),
        (col("sd") / col("n")).as("mean"),
        sqrt((col("sq") - col("sd") * col("sd") / col("n")) / col("n")).as("std"),
        col("vmin"), col("vmax"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- per-dimension population stats (reference A6/N2) ----------------
    "a6_dimension_stats" -> ((s, d) =>
      dimStats(s, d).orderBy("pos")),

    // ---- vector ETL: population-normalized vectors (reference N1/F13,
    //      zero-std guard per similarity/metrics.py:33-45) -----------------
    "n1_vector_normalize" -> ((s, d) => {
      val stats = dimStats(s, d).select("pos", "mean", "std")
      exploded(s, d)
        .join(broadcast(stats), "pos")
        .select(col("vec_id"), col("pos"),
          when(col("std") === 0.0, col("val"))
            .otherwise((col("val") - col("mean")) / col("std")).as("norm_val"))
        .orderBy("vec_id", "pos")
    }),

    // ---- brute-force top-K cosine neighbours (reference N4/W5) -----------
    "n4_topk_cosine" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .withColumn("nrm", l2Norm(col("v")))
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qn"))
      val scored = emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cosine"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      scored.withColumn("rank", row_number().over(w).cast(LongType))
        .filter(col("rank") <= 10)
        .select("query_id", "rank", "neighbor_id")
        .orderBy("query_id", "rank")
    }),

    // ---- pairwise angular distance (reference N5:
    //      similarity/index_model.py:226-244) -----------------------------
    "n5_pairwise_distance" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val q = emb.filter(col("vec_id") === 0)
        .select(col("v").as("qv"))
      emb.filter(col("vec_id") >= 1 && col("vec_id") <= 20)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(angularDistance(col("qv"), col("v")), 8).as("angular_dist"))
        .orderBy("vec_id")
    }),

    // ---- grouped centroids (reference N2 per-class variant) --------------
    "sim_label_centroid" -> ((s, d) => {
      Tables.embeddings(s, d)
        .select(col("label"),
          posexplode(asDouble(col("embedding"))).as(Seq("p0", "val")))
        .groupBy(col("label"), (col("p0") + 1).cast(LongType).as("pos"))
        .agg((sum(col("val").cast(dec9)).cast(DoubleType) / count(lit(1)))
          .as("centroid"))
        .orderBy("label", "pos")
    }),

    // ---- exponentially weighted vectors (reference F14:
    //      similarity/metrics.py:48-58) -----------------------------------
    "f14_exp_weighted" -> ((s, d) => {
      Tables.embeddings(s, d)
        .filter(col("vec_id") < 5)
        .select(col("vec_id"),
          posexplode(expWeighted(asDouble(col("embedding")), 0.95))
            .as(Seq("p0", "wval")))
        .select(col("vec_id"), (col("p0") + 1).cast(LongType).as("pos"),
          round(col("wval"), 8).as("wval"))
        .orderBy("vec_id", "pos")
    }),

    // ---- sign-LSH bucketed ANN (the 100 TB scale path; approximate, so
    //      rows-only driver check — no SQL oracle) -------------------------
    "ann_lsh_bucketed" -> ((s, d) => {
      val hp = lshHyperplanes(8, Dim)
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .withColumn("bucket", lshBucket(col("v"), hp))
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("bucket").as("qbucket"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      emb.join(broadcast(q),
          col("bucket") === col("qbucket") && col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          cosine(col("qv"), col("v")).as("cosine"))
        .withColumn("rank", row_number().over(w).cast(LongType))
        .filter(col("rank") <= 10)
        .select("query_id", "rank", "neighbor_id")
        .orderBy("query_id", "rank")
    })
  )

  /** Exploded (vec_id, pos, val) CTE shared by the vector oracles. */
  private val exCte =
    """ex AS (SELECT vec_id,
      |  unnest(generate_series(1, len(embedding))) AS pos,
      |  CAST(unnest(embedding) AS DOUBLE) AS val
      |FROM embeddings)""".stripMargin

  /** Per-dimension stats CTE mirroring `dimStats` (exact integer sums on the
    * 1e-9 grid; see dimStats scaladoc for why). */
  private val statsCte =
    """iex AS (SELECT pos, val,
      |  CAST(round(val * 1000000000.0) AS BIGINT) AS iv FROM ex),
      |sums AS (SELECT pos, SUM(iv) AS s9,
      |  SUM(CAST(iv AS DECIMAL(19,0)) * CAST(iv AS DECIMAL(19,0))) AS sq0,
      |  COUNT(*) AS n, MIN(val) AS vmin, MAX(val) AS vmax
      |FROM iex GROUP BY pos),
      |sums2 AS (SELECT pos, n, vmin, vmax,
      |  CAST(s9 AS DOUBLE) / 1e9 AS sd,
      |  CAST(sq0 AS DOUBLE) / 1e18 AS sq FROM sums),
      |stats AS (SELECT pos, sd / n AS mean,
      |  sqrt((sq - sd * sd / n) / n) AS std, vmin, vmax FROM sums2)""".stripMargin

  val oracles: Map[String, String] = Map(
    "a6_dimension_stats" ->
      s"""WITH $exCte,
         |$statsCte
         |SELECT CAST(pos AS BIGINT) AS pos, mean, std, vmin, vmax
         |FROM stats ORDER BY pos""".stripMargin,

    "n1_vector_normalize" ->
      s"""WITH $exCte,
         |$statsCte
         |SELECT vec_id, CAST(e.pos AS BIGINT) AS pos,
         |  CASE WHEN std = 0.0 THEN val ELSE (val - mean) / std END
         |    AS norm_val
         |FROM ex e JOIN stats st ON e.pos = st.pos
         |ORDER BY vec_id, pos""".stripMargin,

    "n4_topk_cosine" ->
      s"""WITH $exCte,
         |norms AS (SELECT vec_id, sqrt(SUM(val * val)) AS nrm
         |          FROM ex GROUP BY vec_id),
         |dots AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |           SUM(q.val * c.val) AS dp
         |         FROM ex q JOIN ex c ON q.pos = c.pos
         |         WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
         |         GROUP BY q.vec_id, c.vec_id),
         |ranked AS (SELECT query_id, neighbor_id,
         |  row_number() OVER (PARTITION BY query_id
         |    ORDER BY dp / (nq.nrm * nc.nrm) DESC, neighbor_id) AS rank
         |  FROM dots
         |  JOIN norms nq ON nq.vec_id = query_id
         |  JOIN norms nc ON nc.vec_id = neighbor_id)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id
         |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "n5_pairwise_distance" ->
      s"""WITH $exCte,
         |norms AS (SELECT vec_id, sqrt(SUM(val * val)) AS nrm
         |          FROM ex GROUP BY vec_id),
         |dots AS (SELECT c.vec_id, SUM(q.val * c.val) AS dp
         |         FROM ex q JOIN ex c ON q.pos = c.pos
         |         WHERE q.vec_id = 0 AND c.vec_id BETWEEN 1 AND 20
         |         GROUP BY c.vec_id)
         |SELECT d.vec_id,
         |  round(sqrt(2.0 * (1.0 - dp / (nq.nrm * nc.nrm))), 8)
         |    AS angular_dist
         |FROM dots d
         |JOIN norms nq ON nq.vec_id = 0
         |JOIN norms nc ON nc.vec_id = d.vec_id
         |ORDER BY d.vec_id""".stripMargin,

    "sim_label_centroid" ->
      s"""WITH exl AS (SELECT label,
         |  unnest(generate_series(1, len(embedding))) AS pos,
         |  CAST(unnest(embedding) AS DOUBLE) AS val
         |FROM embeddings)
         |SELECT label, CAST(pos AS BIGINT) AS pos,
         |  CAST(SUM(CAST(val AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*)
         |    AS centroid
         |FROM exl GROUP BY label, pos ORDER BY label, pos""".stripMargin,

    "f14_exp_weighted" ->
      s"""WITH $exCte
         |SELECT vec_id, CAST(pos AS BIGINT) AS pos,
         |  round(val * power(0.95, CAST(pos - 1 AS DOUBLE)), 8) AS wval
         |FROM ex WHERE vec_id < 5 ORDER BY vec_id, pos""".stripMargin
    // ann_lsh_bucketed: approximate operator, rows-only driver check.
  )
}
