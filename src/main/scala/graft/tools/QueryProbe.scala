package graft.tools

/** Dev probe (r17): per-query construct/plan/exec split through the noop
  * sink, with a per-stage wall/run/deser dump for stages over 30 ms —
  * the empirical side of guide §1 (where does the wall time actually
  * go). Usage: QueryProbe <q1> [q2 ...]; env SPARK_GRAFT_SF_DIR/_CPUS. */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Engine.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    graft.Tables.prepare(spark, d)
    val dumpStages = sys.env.contains("PROBE_STAGES")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val wall = (for {a <- i.completionTime; b <- i.submissionTime}
            yield a - b).getOrElse(-1L)
          if (dumpStages && wall > 30)
            println(f"[stage] id=${i.stageId} tasks=${i.numTasks} " +
              f"wall=${wall}ms run=${i.taskMetrics.executorRunTime}ms " +
              f"deser=${i.taskMetrics.executorDeserializeTime}ms " +
              f"sread=${i.taskMetrics.shuffleReadMetrics.totalBytesRead} " +
              f"swrite=${i.taskMetrics.shuffleWriteMetrics.bytesWritten}")
        }
      })
    for (q <- args; i <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(q)(spark, d)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      println(f"[probe] $q run$i construct ${(t1 - t0) / 1e9}%.2fs " +
        f"plan ${(t2 - t1) / 1e9}%.2fs exec ${(t3 - t2) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
