package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev profiling harness: time named queries (args) on SPARK_GRAFT_SF_DIR,
  * twice each (cold + warm), printing plans on request via EXPLAIN=1. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Engine.session(cpus)
    // same stored layout as Bench/Verify — raw-parquet timings are not
    // representative of the driven paths
    graft.Tables.prepare(spark, sfDir)
    args.foreach { name =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        println(f"[profile] $name run$i rows=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
      if (sys.env.contains("EXPLAIN"))
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
