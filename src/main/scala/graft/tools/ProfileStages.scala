package graft.tools

import graft.Tables
import graft.functions.HashFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev-only stage bisection for the dedup pipeline hotspots. */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Engine.session("32")
    val s = spark

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[stage] $name rows=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    val sh = Tables.documents(s, d)
      .select(col("doc_id"), wordShingles(col("text"), 3).as("sh"))

    time("warmup")(Tables.documents(s, d).count())
    time("shingled")(sh.count())
    time("shingled_again")(sh.count())
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("g"))
    time("exploded")(ex.count())
    val grouped = ex.groupBy(col("g"))
      .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
    time("grouped")(grouped.count())
    val pairs = grouped.select(explode(pairCombos(col("ids"))).as("p"))
    time("pairs")(pairs.count())
    val shared = pairs
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    time("shared")(shared.count())
    // minhash side
    val hm = ex.select(col("doc_id"), hashMaterial(col("g")).as("h"))
    time("hash_material")(hm.count())
    val sig = hm.groupBy(col("doc_id"))
      .agg(minhashAggs(col("h"), 16).head, minhashAggs(col("h"), 16).tail: _*)
    time("signatures")(sig.count())
    val sig2 = ex.select(col("doc_id"), hashMaterial(col("g")).as("h"))
      .groupBy(col("doc_id"))
      .agg(minhashAggs(col("h"), 16).head, minhashAggs(col("h"), 16).tail: _*)
    time("sig_warm")(sig2.count())
    val banded = sig2.select(col("doc_id"),
      posexplode(array(bandKeyCols(4, 4): _*)).as(Seq("band", "key")))
      .filter(col("key").isNotNull)
    val buckets = banded.groupBy(col("band"), col("key"))
      .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, 1000))
    time("buckets")(buckets.count())
    val cand = buckets.select(explode(pairCombos(col("ids"))).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
    time("cand_pairs")(cand.count())
    time("cand_distinct")(cand.distinct().count())
    val sh2 = Tables.documents(s, d)
      .select(col("doc_id"), simhashBits(col("text")).as("sh"))
    time("simhash_sigs")({sh2.agg(max(md5(col("sh")))).collect(); 1L})
    val blocks = sh2.select(col("doc_id"), col("sh"),
      posexplode(array((0 until 4).map(b => substring(col("sh"), b * 16 + 1, 16)): _*))
        .as(Seq("blk", "key")))
    val shBuckets = blocks.groupBy(col("blk"), col("key"))
      .agg(count(lit(1)).as("n"))
    time("simhash_bucket_pairs")({
      val r = shBuckets.agg(sum(col("n") * (col("n") - 1) / 2)).collect()(0)
      r.get(0).toString.toDouble.toLong
    })
    spark.stop()
  }
}
