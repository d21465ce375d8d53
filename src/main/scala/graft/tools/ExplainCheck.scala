package graft.tools

/** Dev tool: count/shape the exchanges of selected queries (plan audit). */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("4")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("s8_hl_reassembly", "s3_highlevel_write", "w7_dedup_all",
        "w7_dedup_samescore", "ann_recall", "ann_lsh_multiprobe",
        "n1_vector_normalize")
    graft.Tables.prepare(spark, d)
    for (q <- names) {
      val df = graft.SparkEntry.queries(q)(spark, d)
      // Execute for the final (post-AQE) plan — reuse decisions are
      // runtime — WITHOUT materializing the result on the driver: query
      // names come from args, so a large-output query under collect()
      // could OOM the driver where the plan audit itself never would
      // (ADVICE r15). The execution must run through THIS DataFrame's own
      // QueryExecution: a noop-sink write plans a SEPARATE one, so
      // df.queryExecution.executedPlan would render the INITIAL adaptive
      // tree, not the post-AQE plan this tool exists to print (ADVICE
      // r16). foreachPartition over toRdd runs every stage of this exact
      // QueryExecution and discards rows executor-side.
      df.queryExecution.toRdd.foreachPartition(_ => ())
      val plan = df.queryExecution.executedPlan.toString
      val scans = "FileScan parquet [^\\s,\\]]*".r.findAllIn(plan).toSeq
      println(s"-- $q scans: ${scans.size} " +
        scans.groupBy(identity).map { case (k, v) => s"${v.size}x $k" }
          .mkString(", "))
      println(s"   reused_exchanges: " +
        "ReusedExchange".r.findAllIn(plan).size)
      val exchanges =
        "Exchange hashpartitioning|Exchange rangepartitioning|Exchange SinglePartition".r
          .findAllIn(plan).toSeq
      println(s"== $q: ${exchanges.size} exchanges " +
        s"(${exchanges.groupBy(identity).map { case (k, v) => s"${v.size}x $k" }.mkString(", ")})")
      if (plan.contains("CartesianProduct")) println(s"   !! CARTESIAN in $q")
      if (plan.contains("BroadcastNestedLoopJoin"))
        println(s"   (BroadcastNestedLoopJoin present)")
    }
    spark.stop()
  }
}
