package graft.tools

/** Dev tool: write each named query's `.explain("formatted")` output to
  * `<outDir>/<query>_<tag>.txt` — the round's committed plan evidence
  * (plans/rNN/). Usage: PlanDump <sfDir> <outDir> <tag> <q1> [q2 ...].
  * The plan is the POST-AQE executed plan (same execution discipline as
  * ExplainCheck: run this DataFrame's own QueryExecution through a
  * row-discarding foreachPartition, then render), with the initial
  * formatted plan appended for the scan/pushdown sections that only the
  * formatted renderer carries. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "PlanDump <sfDir> <outDir> <tag> <q1> [q2 ...]")
    val Array(d, outDir, tag) = args.take(3)
    val spark = graft.Engine.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    graft.Tables.prepare(spark, d)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (q <- args.drop(3)) {
      val df = graft.SparkEntry.queries(q)(spark, d)
      df.queryExecution.toRdd.foreachPartition(_ => ())
      val post = df.queryExecution.executedPlan.toString
      val fmt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${q}_$tag.txt"),
        s"== Post-AQE executed plan ==\n$post\n\n== Formatted (initial) ==\n$fmt\n")
      println(s"[plandump] wrote $outDir/${q}_$tag.txt")
    }
    spark.stop()
  }
}
