package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dataset-management / evaluation operators (reference §2.10:
  * dataset_eval/artistfilter.py, db/dataset_eval.py) mapped onto
  * `documents`: class = `lang`, grouping key ("artist") = `source`.
  *
  * The reference's random sampling/shuffling (F19, random.sample/shuffle)
  * is replaced by MD5-hash ordering: the same uniform-but-arbitrary order,
  * but reproducible on any engine, any cluster size, any run — which is
  * what a 100 TB pipeline needs for resumable, auditable splits.
  */
object MLPack {

  private val hashOrder = md5(concat(lit("seed42:"), col("doc_id").cast(StringType)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- groundtruth build: dataset classes → (class, recording) pairs
    //      (reference M1: dataset_eval/evaluate.py:102-127) ----------------
    "m1_groundtruth" -> ((s, d) => {
      // build the nested dataset shape (class -> recordings), then explode
      // it back out — the reference round-trips through this structure.
      Tables.documents(s, d)
        .groupBy(col("lang").as("class"))
        .agg(sort_array(collect_list(col("doc_id"))).as("recordings"))
        .select(col("class"), explode(col("recordings")).as("doc_id"))
        .orderBy("class", "doc_id")
    }),

    // ---- artist-aware train/test split (reference M2:
    //      artistfilter.py:66-119 — one recording per (class, artist) into
    //      train, rest to test; deterministic hash order replaces RNG) -----
    "m2_artist_split" -> ((s, d) => {
      val w = Window.partitionBy(col("lang"), col("source"))
        .orderBy(hashOrder, col("doc_id"))
      Tables.documents(s, d)
        .withColumn("rn", row_number().over(w))
        .select(col("doc_id"), col("lang").as("class"),
          when(col("rn") === 1, "train").otherwise("test").as("split"))
        .orderBy("doc_id")
    }),

    // ---- class normalization: downsample to ≤60 per class (reference M3:
    //      artistfilter.py:33-52, cut at 450) ------------------------------
    "m3_class_downsample" -> ((s, d) => {
      val w = Window.partitionBy(col("lang")).orderBy(hashOrder, col("doc_id"))
      Tables.documents(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 60)
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }),

    // ---- dataset validation: every member has data, classes ≥2 members
    //      (reference M7: db/dataset_eval.py:123-164) ----------------------
    "m7_validate_dataset" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(col("n_chars") > 0)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2)
        .orderBy("lang")
    }),

    // ---- deterministic sample (reference F19: TABLESAMPLE / random.sample,
    //      made reproducible via hash order) ------------------------------
    "f19_deterministic_sample" -> ((s, d) => {
      Tables.documents(s, d)
        .orderBy(hashOrder, col("doc_id"))
        .select(col("doc_id"), col("lang"))
        .limit(50)
        .orderBy("doc_id")
    })
  )

  private val orderSql = "md5('seed42:' || CAST(doc_id AS VARCHAR))"

  val oracles: Map[String, String] = Map(
    "m1_groundtruth" ->
      """SELECT lang AS class, doc_id FROM documents
        |ORDER BY class, doc_id""".stripMargin,

    "m2_artist_split" ->
      s"""WITH ranked AS (
         |  SELECT doc_id, lang AS class,
         |    row_number() OVER (PARTITION BY lang, source
         |      ORDER BY $orderSql, doc_id) AS rn
         |  FROM documents)
         |SELECT doc_id, class,
         |  CASE WHEN rn = 1 THEN 'train' ELSE 'test' END AS split
         |FROM ranked ORDER BY doc_id""".stripMargin,

    "m3_class_downsample" ->
      s"""WITH ranked AS (
         |  SELECT doc_id, lang,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY $orderSql, doc_id) AS rn
         |  FROM documents)
         |SELECT doc_id, lang FROM ranked WHERE rn <= 60
         |ORDER BY doc_id""".stripMargin,

    "m7_validate_dataset" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
        |FROM documents WHERE n_chars > 0
        |GROUP BY lang HAVING COUNT(*) >= 2 ORDER BY lang""".stripMargin,

    "f19_deterministic_sample" ->
      s"""SELECT doc_id, lang FROM
         |  (SELECT doc_id, lang FROM documents
         |   ORDER BY $orderSql, doc_id LIMIT 50) t
         |ORDER BY doc_id""".stripMargin
  )
}
