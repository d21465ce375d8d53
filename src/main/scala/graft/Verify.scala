package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Engine.session(cpus)
    new java.io.File(outDir).mkdirs()
    // Materialize the bucketed/partitioned layout before the concurrent
    // drive (one writer, then every query reads the stored layout).
    Tables.prepare(spark, sfDir)
    // Run queries concurrently: Spark's scheduler interleaves independent
    // jobs, so 8 in flight keep all cores busy while single-threaded
    // stages (sorts, tiny outputs) of one query overlap another's scans.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futures = SparkEntry.queries.toSeq.map { case (name, fn) =>
      scala.concurrent.Future {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          // remove any stale output from a previous run so a now-broken
          // query can never be graded against its old results — recursively:
          // a write that dies mid-job leaves a _temporary/ subtree, and
          // File#delete silently no-ops on non-empty directories
          val dir = Paths.get(s"$outDir/$name")
          if (Files.exists(dir)) {
            val walk = Files.walk(dir)
            try {
              walk.sorted(java.util.Comparator.reverseOrder())
                .forEach { p =>
                  try Files.deleteIfExists(p)
                  catch { case io: java.io.IOException =>
                    System.err.println(s"[verify] could not delete $p: $io")
                  }
                }
            } finally walk.close()
          }
        }
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration.Inf)
    pool.shutdown()
    // JSON string escape (JsonUtil): backslash, quote, and ALL control
    // chars (<0x20) — a tab or CR in builder-authored SQL would otherwise
    // make the driver's json.load fail and silently zero the round's
    // correctness.
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${JsonUtil.str(k)}: ${JsonUtil.str(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
