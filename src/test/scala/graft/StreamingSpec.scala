package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming daemons match their batch equivalents
  * (reference §2.12: polling loop ≡ Trigger.AvailableNow run). */
class StreamingSpec extends SparkSpec {

  test("streaming daily stats equal the batch rollup") {
    val q = EventStream.dailyStats(spark, sfTiny)
      .writeStream.outputMode("complete")
      .format("memory").queryName("daily_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("daily_out")
      .select("day", "n", "total_value").orderBy("day").collect().toSeq
    val batch = operators.StatsPack.queries("t1_daily_stats")(spark, sfTiny)
      .select("day", "n", "total_value").orderBy("day").collect().toSeq
    assert(streamed == batch)
  }

  test("streaming dedup drops same-content submissions per user") {
    val q = EventStream.dedupedSubmissions(spark, sfTiny)
      .select("user_id", "content_hash")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()

    val out = spark.table("dedup_out")
    assert(out.groupBy("user_id", "content_hash").count()
      .filter(col("count") > 1).count() == 0)
  }
}
