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

  test("streaming per-key offset counter matches the batch window recompute") {
    val q = EventStream.offsetAssignments(spark, sfTiny)
      .writeStream.outputMode("append")
      .format("memory").queryName("offsets_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("offsets_out")
      .orderBy("user_id", "submission_offset")
      .collect().map(_.toString).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val batch = Tables.events(spark, sfTiny)
      .withColumn("submission_offset",
        row_number().over(w).cast("long") - 1)
      .select("user_id", "event_id", "submission_offset")
      .orderBy("user_id", "submission_offset")
      .collect().map(_.toString).toSeq
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
    // non-vacuous: the stream must emit exactly the batch-distinct count
    // (same shared hash recipe — Exprs.eventContentHash — as the stream)
    val batchDistinct = Tables.events(spark, sfTiny)
      .select(col("user_id"),
        Exprs.eventContentHash(col("event_type"), col("value"), col("props"))
          .as("content_hash"))
      .distinct().count()
    assert(out.count() == batchDistinct && out.count() > 0)
  }

  test("streaming packing gate equals batch first-fit packing across " +
    "micro-batches (per-source cursor state carries between batches)") {
    import graft.streaming.DocStream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // deliver the fixture in TWO micro-batches split on doc_id, the
    // append-only ingest pattern — the second batch's bins must continue
    // from the first's per-source cursors, which only state can provide
    val rows = Tables.documents(spark, sfTiny)
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    val (first, second) = rows.splitAt(rows.length / 2)
    val ms = MemoryStream[(Long, String, String)]
    val got = scala.collection.mutable.ArrayBuffer[(Long, String, Long, Long, Long)]()
    val q = DocStream.packingGate(
        ms.toDF().toDF("doc_id", "text", "source"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= b.collect().map(r => (r.getLong(0), r.getString(1),
          r.getLong(2), r.getLong(3), r.getLong(4)))
        ()
      }
      .start()
    ms.addData(first.toIndexedSeq); q.processAllAvailable()
    ms.addData(second.toIndexedSeq); q.processAllAvailable()
    q.stop()
    val want = operators.PipelinePack
      .packSequences(Tables.documents(spark, sfTiny)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(want.nonEmpty && got.toSet == want.toSet,
      s"stream packed ${got.size} rows, batch ${want.size}")
    // non-vacuous state carry: the second batch must CONTINUE at least one
    // source's bin numbering (some bin > 0 only makes sense with carry)
    assert(got.exists(_._4 > 0))
  }

  test("streaming cluster-cap gate equals the batch indexed cap across " +
    "micro-batches (per-component rank cursor carries between batches)") {
    import graft.streaming.DocStream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // resolve-once deployment shape: construct the gate, THEN stream
    val gate = DocStream.capGate(spark, sfTiny) _
    val rows = Tables.documents(spark, sfTiny)
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    val (first, second) = rows.splitAt(rows.length / 2)
    val ms = MemoryStream[(Long, String, String)]
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Boolean)]()
    val q = gate(ms.toDF().toDF("doc_id", "text", "source"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= b.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
        ()
      }
      .start()
    ms.addData(first.toIndexedSeq); q.processAllAvailable()
    ms.addData(second.toIndexedSeq); q.processAllAvailable()
    q.stop()
    // batch twin: the artifact-served cap (same labels by construction)
    val want = SparkEntry.queries("dd_component_cap_indexed")(spark, sfTiny)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(want.nonEmpty && got.toSet == want.toSet,
      s"stream capped ${got.size} rows, batch ${want.size}")
    // non-vacuous: some component's cap actually fires, and at least one
    // component spans the batch boundary (rank > first-batch count is
    // impossible for a singleton — carry is what makes ranks continue)
    assert(got.exists(!_._4), "cap never fired at the fixture")
    val firstIds = first.map(_._1).toSet
    val carried = got.filter(r => !firstIds.contains(r._1) && r._3 > 1)
      .map(_._2).toSet
    val earlier = got.filter(r => firstIds.contains(r._1)).map(_._2).toSet
    assert(carried.intersect(earlier).nonEmpty,
      "no component rank carried across the batch boundary")
  }

  test("packing gate fails loudly on out-of-order delivery instead of " +
    "silently diverging from the batch packer") {
    import graft.streaming.DocStream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Tables.documents(spark, sfTiny)
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    val (first, second) = rows.splitAt(rows.length / 2)
    val ms = MemoryStream[(Long, String, String)]
    val q = DocStream.packingGate(
        ms.toDF().toDF("doc_id", "text", "source"))
      .writeStream.outputMode("append")
      .format("memory").queryName("pack_ooo_out")
      .start()
    // deliver the HIGH half first, then the low half — the regression the
    // cursor state must reject (a quiet pack here would bin the low ids
    // at the cursor's end position, diverging from the batch rebuild)
    ms.addData(second.toIndexedSeq); q.processAllAvailable()
    ms.addData(first.toIndexedSeq)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      String.valueOf(c.getMessage).contains("breaks first-fit parity")),
      s"expected the packingGate order guard, got: $e")
    q.stop()

    // the guard is whole-batch, not head-only: a duplicate doc_id INSIDE
    // one micro-batch sorts adjacent (the head still advances past the
    // cursor) and would be packed twice by a head-only check
    val ms2 = MemoryStream[(Long, String, String)]
    val q2 = DocStream.packingGate(
        ms2.toDF().toDF("doc_id", "text", "source"))
      .writeStream.outputMode("append")
      .format("memory").queryName("pack_dup_out")
      .start()
    ms2.addData((first :+ first.last).toIndexedSeq)
    val e2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    assert(causes(e2).exists(c =>
      String.valueOf(c.getMessage).contains("breaks first-fit parity")),
      s"expected the duplicate guard, got: $e2")
    q2.stop()
  }

  test("offset-counter stream stopped between files resumes from its " +
    "checkpoint: recovered state continues the per-key counters and the " +
    "final committed output equals the batch recompute (no dup, no loss)") {
    // The exactly-once claim §2.12 previously made by citation only:
    // process HALF the input, stop the query, land more data, restart
    // from the same checkpoint. If state recovery lost the per-key
    // counters, the second run would re-assign offsets from 0 and the
    // final output could not match the batch window recompute; if source
    // offsets were lost, rows would duplicate (file sink commits are
    // exactly-once through its _spark_metadata log, which the final read
    // goes through).
    import org.apache.spark.sql.types.TimestampNTZType
    val landing = java.nio.file.Files
      .createTempDirectory("graft_restart_land").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_restart_ckpt").toString
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_restart_out").toString
    // ts cast to NTZ so the landed footers match the stream's fallback
    // schema (the landing dir has no file named events.parquet)
    // ts comparisons happen on the ORIGINAL TimestampType column; the NTZ
    // cast is applied after the split (comparing an NTZ column against a
    // Timestamp literal would be a cross-type comparison)
    def half(pred: org.apache.spark.sql.Column)
        : org.apache.spark.sql.DataFrame =
      Tables.events(spark, sfTiny).filter(pred)
        .select(col("event_id"), col("ts").cast(TimestampNTZType).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
    // split at the median distinct ts: every half-1 row precedes every
    // half-2 row, so per-key arrival order holds across the restart
    // boundary (the documented agreement regime of the offset gate)
    val tss = Tables.events(spark, sfTiny).select("ts").distinct()
      .orderBy("ts").collect().map(_.getTimestamp(0))
    assert(tss.length >= 2, "need at least two distinct ts to split")
    val cut = tss(tss.length / 2)
    val half1 = half(col("ts") < lit(cut))
    val half2 = half(col("ts") >= lit(cut))
    assert(half1.count() > 0 && half2.count() > 0, "degenerate split")
    half1.coalesce(1).write.mode("overwrite").parquet(landing)
    def runOnce(): Unit = {
      val q = EventStream.offsetAssignments(spark, landing, "*.parquet")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", outDir).start()
      q.processAllAvailable(); q.stop()
    }
    runOnce() // run 1: sees only half 1, then is stopped
    val afterRun1 = spark.read.parquet(outDir).count()
    assert(afterRun1 == half1.count(),
      s"run 1 must commit exactly half 1: $afterRun1 vs ${half1.count()}")
    half2.coalesce(1).write.mode("append").parquet(landing)
    runOnce() // run 2: restarts from the checkpoint, sees only half 2
    val got = spark.read.parquet(outDir)
      .select("user_id", "event_id", "submission_offset")
      .orderBy("user_id", "submission_offset")
      .collect().map(_.toString).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val batch = Tables.events(spark, sfTiny)
      .withColumn("submission_offset",
        row_number().over(w).cast("long") - 1)
      .select("user_id", "event_id", "submission_offset")
      .orderBy("user_id", "submission_offset")
      .collect().map(_.toString).toSeq
    assert(got == batch,
      "restarted stream diverged from the batch recompute — state or " +
        "source-offset recovery is broken")
  }

  test("watermarked dedup stream restarted from checkpoint still drops " +
    "duplicates FIRST SEEN BEFORE the restart (state-store recovery, " +
    "the second state class: dropDuplicatesWithinWatermark)") {
    // The offset test covers flatMapGroupsWithState recovery; this one
    // covers the watermark-evicted dedup state store. Controlled corpus:
    // 10 users submit once before the stop; after the restart each user
    // submits an exact DUPLICATE (1 h later — well inside the 1-day
    // horizon, so the recovered state must still drop it) plus one fresh
    // submission. Lost state would re-emit the 10 duplicates.
    import org.apache.spark.sql.types.TimestampNTZType
    import spark.implicits._
    val landing = java.nio.file.Files
      .createTempDirectory("graft_dedup_land").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_dedup_ckpt").toString
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_dedup_out").toString
    val t0 = java.time.LocalDateTime.of(2025, 3, 1, 12, 0, 0)
    def mk(rows: Seq[(Long, java.time.LocalDateTime, Long, String,
        Double, String)]) =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value",
          "props")
        .select(col("event_id"), col("ts").cast(TimestampNTZType).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
    val half1 = mk((1L to 10L).map(u =>
      (u, t0.plusSeconds(u), u, "submit", u.toDouble, "p")))
    val half2 = mk((1L to 10L).flatMap(u => Seq(
      // exact duplicate of user u's first submission, 1 h later
      (100L + u, t0.plusHours(1).plusSeconds(u), u, "submit",
        u.toDouble, "p"),
      // a genuinely new submission
      (200L + u, t0.plusHours(2).plusSeconds(u), u, "submit",
        u.toDouble + 100.0, "p"))))
    half1.coalesce(1).write.mode("overwrite").parquet(landing)
    def runOnce(): Unit = {
      val q = EventStream.dedupedSubmissions(spark, landing, "*.parquet")
        .select("event_id", "user_id", "content_hash")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", outDir).start()
      q.processAllAvailable(); q.stop()
    }
    runOnce()
    assert(spark.read.parquet(outDir).count() == 10)
    half2.coalesce(1).write.mode("append").parquet(landing)
    runOnce()
    val ids = spark.read.parquet(outDir)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val expect = ((1L to 10L) ++ (201L to 210L)).sorted
    assert(ids == expect,
      s"restarted dedup state diverged: emitted $ids — the 10x-duplicate " +
        "ids 101..110 must stay dropped by the RECOVERED state store")
  }

  test("a checkpoint written by the old 3-long packing cursor fails the " +
    "restart with the NAMED fresh-checkpoint guidance") {
    import graft.streaming.DocStream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_pack_ckpt").toString
    // the PRE-UPGRADE gate: identical key/output, 3-long state (no order
    // cursor) — exactly what a deployment's existing checkpoints hold
    val ms = MemoryStream[(Long, String, String)]
    val oldGate = ms.toDF().toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "source", "CAST(length(text) AS BIGINT) AS nt")
      .as[(Long, String, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (source: String, rows: Iterator[(Long, String, Long)],
         state: GroupState[(Long, Long, Long)]) => {
          var (cum, lastBin, lastPos) =
            state.getOption.getOrElse((0L, -1L, 0L))
          val out = rows.toSeq.sortBy(_._1).map { case (id, _, nt) =>
            val bin = cum / 64L
            val pos = if (bin == lastBin) lastPos + 1 else 1L
            cum += nt; lastBin = bin; lastPos = pos
            (id, source, nt, bin, pos)
          }
          state.update((cum, lastBin, lastPos))
          out.iterator
        })
      .toDF("doc_id", "source", "n_tokens", "bin", "bin_pos")
    // file sink: the one sink kind that SUPPORTS checkpoint recovery —
    // this test is precisely about restarting from an existing checkpoint
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_pack_out").toString
    val q1 = oldGate.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", outDir).start()
    ms.addData((1L, "aaa", "s1"), (2L, "bbbb", "s1"))
    q1.processAllAvailable(); q1.stop()
    // restart the SAME checkpoint under the current 4-long gate
    val restart = scala.util.Try {
      val q2 = DocStream.packingGate(
          ms.toDF().toDF("doc_id", "text", "source"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", outDir).start()
      ms.addData((3L, "cc", "s1"))
      try q2.processAllAvailable() finally q2.stop()
    }
    assert(restart.isFailure, "old-state restart unexpectedly succeeded")
    val e = restart.failed.get
    val explained = DocStream.explainStreamFailure(e)
    assert(explained.isDefined,
      s"state break not translated; raw failure was: $e")
    assert(explained.get.contains("FRESH checkpoint"))
    // and a non-state failure is NOT claimed by the translator
    assert(DocStream.explainStreamFailure(
      new RuntimeException("disk full")).isEmpty)
  }

  test("foreachBatch ledger catch-up equals the batch incremental series") {
    // the daemon cadence: one catch-up run, one micro-batch; the gate's
    // frozen ledger head + shared core must reproduce t1_incremental
    // row-for-row (which the DuckDB full-recompute oracle already gates)
    val got = scala.collection.mutable.ArrayBuffer[String]()
    val gate = EventStream.ledgerCatchupGate(spark, sfTiny)
    val q = EventStream.source(spark, sfTiny)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got.clear() // each catch-up run emits the full series
        got ++= gate(batch).collect().map(_.toString)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val want = SparkEntry.queries("t1_incremental")(spark, sfTiny)
      .collect().map(_.toString)
    assert(want.nonEmpty && got.toSeq == want.toSeq,
      s"stream series ${got.size} rows vs batch ${want.size}")
  }

  test("foreachBatch quality gate equals the batch cascade verdicts") {
    import graft.streaming.DocStream
    // drive the attributed gate per micro-batch, the deployment shape
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, String, Boolean)]()
    val q = DocStream.source(spark, sfTiny)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= DocStream.qualityGate(batch)
          .select("doc_id", "n_tokens", "reason", "keep").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
            r.getBoolean(3)))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val want = SparkEntry.queries("pipe_quality_gate")(spark, sfTiny)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getBoolean(3)))
    assert(want.nonEmpty && got.toSet == want.toSet,
      s"stream gated ${got.size} rows, batch ${want.size}")
  }

  test("foreachBatch domain-mix gate with frozen thresholds equals the " +
    "batch resample") {
    import graft.streaming.DocStream
    import graft.operators.PipelinePack
    // thresholds computed ONCE from the corpus version, then applied per
    // micro-batch — the deployment split the gate's contract encodes
    val th = PipelinePack.mixThresholds(spark, sfTiny).cache()
    val got = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val q = DocStream.source(spark, sfTiny)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= DocStream.mixGate(th)(batch)
          .collect().map(r => (r.getLong(0), r.getString(1)))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val want = SparkEntry.queries("pipe_domain_mix")(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(want.nonEmpty && got.toSet == want.toSet,
      s"stream kept ${got.size} docs, batch ${want.length}")
    th.unpersist()
  }

  test("foreachBatch temperature gate with frozen thresholds equals the " +
    "batch resample") {
    import graft.streaming.DocStream
    import graft.operators.PipelinePack
    val th = PipelinePack.tempThresholds(spark, sfTiny).cache()
    val got = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val q = DocStream.source(spark, sfTiny)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= DocStream.tempGate(th)(batch)
          .collect().map(r => (r.getLong(0), r.getString(1)))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val want = SparkEntry.queries("pipe_temp_sample")(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(want.nonEmpty && got.toSet == want.toSet,
      s"stream kept ${got.size} docs, batch ${want.length}")
    // a language ABSENT from the frozen frame (arrived between corpus
    // versions) is the scarcest case by definition: the gate keeps ALL
    // of it (left join + full-domain default), never silently drops it
    import spark.implicits._
    val novel = Seq((900001L, "tlh"), (900002L, "tlh"))
      .toDF("doc_id", "lang")
    val kept = DocStream.tempGate(th)(novel).collect()
    assert(kept.length == 2, s"unseen-lang docs dropped: ${kept.toSeq}")
    th.unpersist()
  }

  test("foreachBatch bigram-LM gate equals the smoothed batch twin and " +
    "scores an all-unseen batch instead of dropping it") {
    import graft.streaming.DocStream
    import spark.implicits._
    val want = SparkEntry.queries("tx_bigram_ppl_smoothed")(spark, sfTiny)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val c0 = graft.sim.IndexStore.ensureCalls.get()
    val gate = DocStream.bigramPplGate(spark, sfTiny)
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    val q = DocStream.source(spark, sfTiny)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= gate(batch)
          .select("doc_id", "n_bigrams", "mean_nll").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    assert(want.nonEmpty && got.toSet == want.toSet,
      s"stream scored ${got.size} rows, batch ${want.size}")
    assert(graft.sim.IndexStore.ensureCalls.get() - c0 == 1L,
      "streaming bigram gate re-ensured the artifact per batch")
    // post-freeze contract: a document whose every token (and bigram)
    // the frozen LM has never seen still gets a row — its per-position
    // probability is the pure Laplace floor 0.25/(N+V), not zero
    val unseen = Seq((999999L, "qzx wvv qzx wvv"))
      .toDF("doc_id", "text")
    val r = gate(unseen).collect()
    assert(r.length == 1 && r(0).getLong(1) == 3L)
    assert(r(0).getDouble(2) > 0.0 &&
      !r(0).getDouble(2).isInfinite && !r(0).getDouble(2).isNaN)
  }

  test("foreachBatch BM25 keyword gate equals the artifact-served batch " +
    "twin across micro-batches") {
    import graft.streaming.DocStream
    // per-doc keywords depend only on the doc's own tf plus the frozen
    // df/N — so the streamed union over micro-batches must equal the
    // whole-corpus indexed entry row-for-row
    val want = SparkEntry.queries("tx_bm25_indexed")(spark, sfTiny)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val c0 = graft.sim.IndexStore.ensureCalls.get()
    val gate = DocStream.bm25Gate(spark, sfTiny)
    val got =
      scala.collection.mutable.ArrayBuffer[(Long, Long, String, Double)]()
    val q = DocStream.source(spark, sfTiny)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= gate(batch)
          .select("doc_id", "rank", "token", "score").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
            r.getDouble(3)))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    assert(want.nonEmpty && got.toSet == want.toSet,
      s"stream extracted ${got.size} keyword rows, batch ${want.size}")
    assert(graft.sim.IndexStore.ensureCalls.get() - c0 == 1L,
      "streaming BM25 gate re-ensured the artifact per batch")
  }

  test("foreachBatch LM-perplexity gate equals the artifact-served batch " +
    "scoring") {
    import graft.streaming.DocStream
    // batch twin FIRST (it pays its own ensure), then the gate with the
    // ensure-call counter bracketing the whole streamed run
    val want = SparkEntry.queries("tx_unigram_ppl_smoothed")(spark, sfTiny)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    val c0 = graft.sim.IndexStore.ensureCalls.get()
    // the deployment posture: resolve the gate ONCE, outside foreachBatch
    val gate = DocStream.pplGate(spark, sfTiny)
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Double, String)]()
    val q = DocStream.source(spark, sfTiny)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= gate(batch)
          .select("doc_id", "n_tokens", "mean_nll", "bucket").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
            r.getString(3)))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    // the gate serves the SMOOTHED core (post-freeze semantics) — parity
    // is against its batch twin, not the exact-match indexed entry
    assert(want.nonEmpty && got.toSet == want.toSet,
      s"stream scored ${got.size} rows, batch ${want.size}")
    // the corpus fingerprint was paid ONCE at gate construction — the
    // per-batch serve never re-ensures (the resolve-once contract)
    assert(graft.sim.IndexStore.ensureCalls.get() - c0 == 1L,
      "streaming gate re-ensured the artifact per batch")
  }

  test("ppl gate scores all-unseen-vocabulary documents instead of " +
    "dropping them (the out-of-distribution arrivals the gate exists for)") {
    import graft.streaming.DocStream
    import spark.implicits._
    // a post-freeze batch sharing ZERO vocabulary with the frozen LM: the
    // exact-match join would emit no rows at all for these documents
    val batch = Seq(
      (900001L, "zzqx1 zzqx2 zzqx3 zzqx4"),
      (900002L, "zzqx5 zzqx5 zzqx6")).toDF("doc_id", "text")
    val rows = DocStream.pplGate(spark, sfTiny)(batch)
      .orderBy("doc_id").collect()
    assert(rows.length == 2, s"expected 2 scored rows, got ${rows.length}")
    // n_tokens counts the BATCH's own tokens, not the LM-matched subset
    assert(rows(0).getAs[Long]("n_tokens") == 4L)
    assert(rows(1).getAs[Long]("n_tokens") == 3L)
    // all-unseen surprisal is ln(N+V) − ln(1) per token — far beyond the
    // tail threshold, and exactly computable from the artifact's totals
    val p = operators.TextPack.ensureLmIndex(spark, sfTiny)
    val n = spark.read.parquet(s"$p/total").head().getLong(0)
    val v = spark.read.parquet(s"$p/lm").count()
    val wantNll = math.log((n + v).toDouble)
    assert(rows.forall(_.getAs[String]("bucket") == "tail"))
    assert(math.abs(rows(0).getAs[Double]("mean_nll") - wantNll) < 1e-5)
  }

  test("drift gate emits the full-drift row for an all-unseen batch " +
    "(l1_ppm = 2,000,000), not an empty frame") {
    import graft.streaming.DocStream
    import spark.implicits._
    val batch = Seq(
      (900001L, "zzqx1 zzqx2 zzqx3 zzqx4"),
      (900002L, "zzqx5 zzqx5 zzqx6")).toDF("doc_id", "text")
    val rows = DocStream.driftGate(spark, sfTiny)(batch).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("n_tokens") == 7L)
    // zero shared vocabulary = maximal L1: Σ|p_batch − p_corpus| = 2
    assert(rows(0).getAs[Long]("l1_ppm") == 2000000L,
      s"expected full drift, got ${rows(0)}")
  }

  test("foreachBatch drift gate: a single-source batch equals that " +
    "source's tx_source_drift row; empty batches yield no row") {
    import graft.streaming.DocStream
    val src = "src5"
    val driftG = DocStream.driftGate(spark, sfTiny)
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = DocStream.source(spark, sfTiny)
      .filter(col("source") === src)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= driftG(batch)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val want = SparkEntry.queries("tx_source_drift")(spark, sfTiny)
      .filter(col("source") === src)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(want.length == 1 && got.toList == want.toList,
      s"stream drift ${got.toList}, batch ${want.toList}")
    // the empty-batch boundary: no row, not a zero or a division error
    import graft.operators.TextPack
    val empty = Tables.documents(spark, sfTiny).filter(lit(false))
    assert(TextPack.driftServe(spark, sfTiny, empty).count() == 0)
  }

  test("streaming span-decontamination gate equals the batch scrub " +
    "(eval span set frozen once, applied per micro-batch)") {
    import graft.streaming.DocStream
    import graft.operators.DedupPack
    val docs = Tables.documents(spark, sfTiny)
    val evSpans = DedupPack.evalSpanHashes(
      docs.filter(col("source") === DedupPack.ContaminationEvalSource))
      .cache()
    val gate = DocStream.contaminationScrubGate(evSpans) _
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, String)]()
    val q = DocStream.source(spark, sfTiny)
      .filter(col("source") =!= DedupPack.ContaminationEvalSource)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= gate(batch).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getString(3)))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val want = SparkEntry.queries("dd_contamination_scrub")(spark, sfTiny)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(want.nonEmpty && got.toSet == want.toSet,
      s"stream scrubbed ${got.size} rows, batch ${want.size}")
    assert(got.exists(_._3 > 0), "no arrival was decontaminated — vacuous")
    evSpans.unpersist()
  }

  test("foreachBatch contamination gate agrees with the batch sweep") {
    import graft.streaming.DocStream
    import graft.operators.DedupPack
    val docs = Tables.documents(spark, sfTiny)
    val ev = DocStream.evalShingles(
      docs.filter(col("source") === DedupPack.ContaminationEvalSource))
    val corpus = docs.filter(
      col("source") =!= DedupPack.ContaminationEvalSource)
    // drive the gate the way a deployment does: per micro-batch
    val survivors = scala.collection.mutable.ArrayBuffer[Long]()
    val q = DocStream.source(spark, sfTiny)
      .filter(col("source") =!= DedupPack.ContaminationEvalSource)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        survivors ++= DocStream.contaminationGate(batch, ev)
          .select("doc_id").collect().map(_.getLong(0))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    // survivors = corpus minus exactly the batch sweep's flagged docs
    val flagged = SparkEntry.queries("dd_contamination")(spark, sfTiny)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want = corpus.select("doc_id").collect().map(_.getLong(0)).toSet -- flagged
    assert(flagged.nonEmpty && survivors.toSet == want)
  }

  test("streaming k-NN serving equals the batch artifact-served top-k") {
    import graft.streaming.{QueryStream, VectorStream}
    // queries arrive on a stream (here: the DefaultQueries ids, so the
    // batch twin below is the ann_kmeans_indexed entry verbatim); results
    // collect per micro-batch the way a serving sink would emit them
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
    val q = VectorStream.source(spark, sfTiny)
      .filter(col("vec_id") < 10)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= QueryStream.serveBatch(spark, sfTiny, batch, k = 5)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val want = SparkEntry.queries("ann_kmeans_indexed")(spark, sfTiny)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(want.nonEmpty && got.toSet == want.toSet,
      s"stream served ${got.size} rows, batch ${want.size}")
  }

  test("streaming k-NN serving: non-default query set equals the batch path") {
    import graft.streaming.{QueryStream, VectorStream}
    import graft.operators.SimilarityPack
    import graft.functions.VectorFunctions.asDouble
    import spark.implicits._
    // a query set the oracle rows never pin — parity must hold for ANY
    // arriving ids, not just the DefaultQueries instantiation
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
    val q = VectorStream.source(spark, sfTiny)
      .filter(col("vec_id") >= 100 && col("vec_id") < 120)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= QueryStream.serveBatch(spark, sfTiny, batch, k = 5)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    // batch twin: the SAME artifact served through cellTopk with the ids
    // injected as a QuerySet (the indexedTopkFor shape for this index)
    val p = SimilarityPack.ensureKmeansIndex(spark, sfTiny)
    val corpus = spark.read.parquet(s"$p/assignments")
      .join(Tables.embeddings(spark, sfTiny)
        .select(col("vec_id"), asDouble(col("embedding")).as("v")),
        Seq("vec_id"))
    val want = SimilarityPack.cellTopk(corpus, 5,
        SimilarityPack.querySetOf((100L until 120L).toDF("vec_id")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(want.nonEmpty && got.toSet == want.toSet,
      s"stream served ${got.size} rows, batch ${want.size}")
  }

  test("streaming tuned-IVF serving equals the id-injected artifact path") {
    import graft.streaming.{QueryStream, VectorStream}
    import graft.operators.SimilarityPack
    import spark.implicits._
    // arriving vectors are grid-ified and served from the tuned artifact;
    // for corpus members the stored and recomputed grid vectors are
    // identical, so the stream must reproduce indexedTopkFor row-for-row
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val q = VectorStream.source(spark, sfTiny)
      .filter(col("vec_id") >= 50 && col("vec_id") < 60)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= QueryStream.serveTunedBatch(spark, sfTiny, batch)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val want = SimilarityPack
      .indexedTopkFor(spark, sfTiny, (50L until 60L).toDF("vec_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(want.nonEmpty && got.toSet == want.toSet,
      s"stream served ${got.size} rows, batch ${want.size}")
  }

  test("streaming composed request gate equals the batch full-pipeline " +
    "row across a micro-batch split") {
    import graft.streaming.QueryStream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // resolve-once deployment shape: construct the gate, THEN stream
    val gate = QueryStream.composedGate(spark, sfTiny)
    val ms = MemoryStream[Long]
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Double)]()
    // foreachBatch drive: requests in two independent micro-batches
    val query = ms.toDF().toDF("vec_id").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= gate(batch).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        ()
      }
      .start()
    ms.addData(5L, 23L); query.processAllAvailable()
    ms.addData(77L, 311L); query.processAllAvailable()
    query.stop()
    val want = SparkEntry.queries("n4_serve_composed")(spark, sfTiny)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(want.nonEmpty && got.toSet == want.toSet,
      s"stream served ${got.size} rows, batch ${want.size}")
  }

  test("streaming k-NN serving: an empty micro-batch serves zero rows") {
    import graft.streaming.QueryStream
    import graft.functions.VectorFunctions.asDouble
    // a quiet trigger interval is a valid micro-batch — the serve path
    // must yield an empty frame, not fail against the artifact
    val empty = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"), col("embedding")).filter(lit(false))
    assert(QueryStream.serveBatch(spark, sfTiny, empty, k = 5).count() == 0)
    assert(QueryStream.serveTunedBatch(spark, sfTiny, empty).count() == 0)
  }

  test("streaming vector normalize equals the batch ETL on static stats") {
    import graft.streaming.VectorStream
    // the static stats frame — at deployment scale the persisted stats
    // artifact; here the same exact-grid aggregate the batch entries use
    val stats = SparkEntry.queries("a6_dimension_stats")(spark, sfTiny)
      .select(col("pos"), col("mean"), col("std"))
    val q = VectorStream.normalized(VectorStream.source(spark, sfTiny), stats)
      .writeStream.outputMode("append")
      .format("memory").queryName("vec_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("vec_out")
    val batch = SparkEntry.queries("n1_vector_normalize")(spark, sfTiny)
    assert(streamed.count() == batch.count() && streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0)
  }

  test("streaming corpus gate matches the batch gates + exact dedup") {
    import graft.functions.TextFunctions._
    import graft.streaming.DocStream
    val q = DocStream.corpusGate(spark, sfTiny)
      .writeStream.outputMode("append")
      .format("memory").queryName("gate_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("gate_out")
    // batch equivalent of the gates (same shared constants/expressions)
    val gated = Tables.documents(spark, sfTiny)
      .filter(langGuess(col("text")) === "en" &&
        tokenCount(col("text")) >= operators.PipelinePack.MinTokens &&
        stopwordRatio(col("text")) >= operators.PipelinePack.MinStopRatio)
    // every survivor passed the gates …
    assert(streamed.select("doc_id")
      .exceptAll(gated.select("doc_id")).count() == 0)
    // … and dedup kept exactly one doc per distinct surviving text
    val batchDistinct = gated.select(md5(col("text"))).distinct().count()
    assert(streamed.count() == batchDistinct && streamed.count() > 0)
    assert(streamed.select("content_hash").distinct().count()
      == streamed.count())
  }

  test("streaming sessionization matches the batch rollup for closed sessions") {
    import graft.streaming.EventStream
    import graft.operators.EventsPack
    val q = EventStream.sessions(spark, sfTiny)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("sess_out")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val batch = operators.EventsPack.queries("ev_sessionize")(spark, sfTiny)
      .select(col("user_id"), col("n_events"),
        unix_micros(col("start_ts")).as("start_us"),
        unix_micros(col("end_ts")).as("end_us"), col("duration_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    // every streamed session is a real batch session …
    assert(got.nonEmpty && got.subsetOf(batch),
      s"stream emitted ${got.size} rows, ${got.diff(batch).size} unknown")
    // … and every session the watermark provably closed was emitted:
    // timeout fires in the no-data batch once end + gap clears the
    // watermark (max ts − 1 h); 2 ms slack for the ms-floor timeout
    val maxUs = Tables.events(spark, sfTiny)
      .agg(max(unix_micros(col("ts")))).head.getLong(0)
    val horizon = maxUs - 3600L * 1000000 - EventsPack.SessionGapUs - 2000
    val mustClose = batch.filter(_._4 < horizon)
    assert(mustClose.subsetOf(got),
      s"${mustClose.diff(got).size} watermark-closed sessions missing")
    assert(mustClose.nonEmpty, "horizon too tight — test is vacuous")
  }

  test("streaming IVF-PQ serving equals the batch compressed-index path") {
    import graft.streaming.{QueryStream, VectorStream}
    import graft.operators.SimilarityPack
    import spark.implicits._
    val got = scala.collection.mutable.ArrayBuffer[String]()
    val q = VectorStream.source(spark, sfTiny)
      .filter(col("vec_id") >= 40 && col("vec_id") < 60)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= QueryStream.servePqBatch(spark, sfTiny, batch)
          .collect().map(_.toString)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val want = SimilarityPack.ivfPqTopkFor(spark, sfTiny,
        (40L until 60L).toDF("vec_id"))
      .collect().map(_.toString)
    assert(want.nonEmpty && got.toSet == want.toSet,
      s"stream served ${got.size} rows, batch ${want.size}")
  }

  test("streaming split gate equals the batch leak-safe split " +
    "(sides served per micro-batch from the component-label artifact)") {
    import graft.streaming.DocStream
    val splitG = DocStream.splitGate(spark, sfTiny)
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, String)]()
    val q = DocStream.source(spark, sfTiny)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= splitG(batch)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val want = SparkEntry.queries("pipe_leak_safe_split")(spark, sfTiny)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(want.nonEmpty && got.toSet == want.toSet,
      s"stream assigned ${got.size} rows, batch ${want.size}")
    // non-vacuous leak-safety: both sides occur, and at least one doc is
    // assigned through a component REP different from its own id
    assert(got.map(_._3).toSet == Set("train", "val"))
    assert(got.exists(r => r._2 != r._1))
  }

  test("streaming BPE token-count gate equals the batch artifact-served " +
    "encode; unseen-vocabulary batches still tokenize (no OOV path)") {
    import graft.streaming.DocStream
    val bpeG = DocStream.bpeCountGate(spark, sfTiny)
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val q = DocStream.source(spark, sfTiny)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= bpeG(batch)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val want = SparkEntry.queries("tx_bpe_encode")(spark, sfTiny)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(want.nonEmpty && got.toSet == want.toSet,
      s"stream counted ${got.size} rows, batch ${want.size}")
    // BPE must compress: some document's BPE count is below its char
    // count but at/above its word count
    assert(got.forall(r => r._3 >= r._2))
    // an all-unseen batch tokenizes from characters — no row is dropped
    import spark.implicits._
    val unseen = Seq((900001L, "zzqx9 wvut8")).toDF("doc_id", "text")
    val rows = bpeG(unseen).collect()
    assert(rows.length == 1 && rows(0).getLong(1) == 2L &&
      rows(0).getLong(2) >= 2L && rows(0).getLong(2) <= 10L)
  }

  test("streaming near-dup gate equals the batch indexed incremental dedup") {
    import graft.streaming.DocStream
    import graft.operators.DedupPack
    // arriving ingest batch = the src6 slice (the same slice the batch
    // dd_incremental_indexed entry probes), served per micro-batch from
    // the persisted band index via the shared probeBandIndexed core
    val dedupG = DocStream.dedupGate(spark, sfTiny)
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    val q = DocStream.source(spark, sfTiny)
      .filter(col("source") === DedupPack.IncrementalBatchSource)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= dedupG(batch)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val want = SparkEntry.queries("dd_incremental_indexed")(spark, sfTiny)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(want.nonEmpty && got.toSet == want.toSet,
      s"stream flagged ${got.size} rows, batch ${want.size}")
  }

  test("foreachBatch incident gate with a frozen window set equals the " +
    "batch purchase tags across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = Tables.events(spark, sfTiny)
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    // the window set is the frozen per-corpus-version artifact — resolved
    // ONCE, outside the per-batch closure
    val gate = EventStream.incidentGate(
      operators.EventsPack.incidentWindows(Tables.events(spark, sfTiny)))
    val (first, second) = ev.splitAt(ev.length / 2)
    val ms = MemoryStream[(Long, String, Long)]
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = ms.toDF().toDF("event_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us")))
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= gate(b).collect().map(r => (r.getLong(0), r.getLong(1)))
        ()
      }
      .start()
    ms.addData(first.toIndexedSeq); q.processAllAvailable()
    ms.addData(second.toIndexedSeq); q.processAllAvailable()
    q.stop()
    val want = SparkEntry.queries("j12_purchase_tags")(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(want.nonEmpty && got.toSet == want.toSet,
      s"stream tagged ${got.size} purchases, batch ${want.length}")
    // non-vacuous: some purchase inside a window, some outside
    assert(got.exists(_._2 > 0) && got.exists(_._2 == 0))
  }

  test("stream-stream interval join (both sides unbounded) equals the " +
    "batch cell-blocked pairs, including one straddling the batch split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batchEv = Tables.events(spark, sfTiny)
    val want = operators.EventsPack.cellCandidates(
        operators.EventsPack.incidentWindows(batchEv),
        operators.EventsPack.purchaseProbes(batchEv))
      .filter(col("p_us") >= col("lo_us") && col("p_us") <= col("hi_us"))
      .select("win_id", "p_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty)
    val ev = batchEv
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(e => (e._3, e._1))
    // split the time-ordered stream BETWEEN the two events of a real
    // matched pair, so the join must hold one side in state across
    // micro-batches to emit it
    val byId = ev.map(e => e._1 -> e._3).toMap
    // equal-ts pairs can't be split (partition on < puts both events in
    // the second batch) — pick the latest-starting pair whose events
    // differ in time
    val splittable = want.filter { case (w, p) => byId(w) != byId(p) }
    assert(splittable.nonEmpty, "no time-separated matched pair to split on")
    val straddle = splittable.maxBy { case (w, p) =>
      math.min(byId(w), byId(p)) }
    val laterUs = math.max(byId(straddle._1), byId(straddle._2))
    val (first, second) = ev.partition(e => e._3 < laterUs)
    assert(first.exists(e => e._1 == straddle._1 || e._1 == straddle._2) &&
      second.exists(e => e._1 == straddle._1 || e._1 == straddle._2))
    val ms = MemoryStream[(Long, String, Long)]
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = EventStream.incidentPairs(
        ms.toDF().toDF("event_id", "event_type", "us")
          .withColumn("ts", timestamp_micros(col("us"))))
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= b.collect().map(r => (r.getLong(0), r.getLong(1)))
        ()
      }
      .start()
    ms.addData(first.toIndexedSeq); q.processAllAvailable()
    ms.addData(second.toIndexedSeq); q.processAllAvailable()
    q.stop()
    assert(got.toSet == want,
      s"stream-stream join: got ${got.size} pairs, want ${want.size}")
    assert(got.contains(straddle), "the cross-batch pair was not emitted")
  }

  test("left-outer stream-stream join emits uncovered purchases with a " +
    "NULL window once both watermarks pass their join horizon") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batchEv = Tables.events(spark, sfTiny)
    val matched = operators.EventsPack.cellCandidates(
        operators.EventsPack.incidentWindows(batchEv),
        operators.EventsPack.purchaseProbes(batchEv))
      .filter(col("p_us") >= col("lo_us") && col("p_us") <= col("hi_us"))
      .select("p_id", "win_id").collect()
      .map(r => (r.getLong(0), Some(r.getLong(1)): Option[Long])).toSet
    val allP = operators.EventsPack.purchaseProbes(batchEv)
      .select("p_id").collect().map(_.getLong(0)).toSet
    val want = matched ++
      (allP -- matched.map(_._1)).map(p => p -> (None: Option[Long]))
    val ev = batchEv
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(e => (e._3, e._1))
    val mxUs = ev.map(_._3).max
    // heartbeat rows: advance BOTH event-time watermarks past every real
    // purchase's horizon; they sit hours apart so they never join, and
    // the heartbeat purchase itself (no later flush) must never emit
    def flush(round: Long) = Seq(
      (900000L + round, "error", mxUs + round * 7200000000L),
      (900100L + round, "purchase", mxUs + round * 7200000000L + 3600000000L))
    val ms = MemoryStream[(Long, String, Long)]
    val got = scala.collection.mutable.ArrayBuffer[(Long, Option[Long])]()
    val q = EventStream.incidentPairsOuter(
        ms.toDF().toDF("event_id", "event_type", "us")
          .withColumn("ts", timestamp_micros(col("us"))))
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= b.collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1))))
        ()
      }
      .start()
    val (first, second) = ev.splitAt(ev.length / 2)
    ms.addData(first.toIndexedSeq); q.processAllAvailable()
    ms.addData(second.toIndexedSeq); q.processAllAvailable()
    ms.addData(flush(1).toIndexedSeq); q.processAllAvailable()
    ms.addData(flush(2).toIndexedSeq); q.processAllAvailable()
    q.stop()
    val real = got.filter(_._1 < 900000L).toSet
    assert(real == want,
      s"outer join: got ${real.size} rows, want ${want.size} " +
        s"(missing ${(want -- real).take(3)}, extra ${(real -- want).take(3)})")
    assert(real.exists(_._2.isEmpty) && real.exists(_._2.nonEmpty),
      "fixture exercises only one side of the outer join")
    // the FINAL heartbeat purchase has no later watermark advance, so its
    // null form must still be held back (the first heartbeat's purchase
    // correctly emits once the second advances the watermark past it)
    assert(!got.exists(g => g._1 == 900102L),
      "the last heartbeat purchase emitted before its horizon closed")
  }

  // ---- late/out-of-order event-time drives (round 15, VERDICT r14 #5):
  // restart recovery was proven in r14; these pin the accept/drop
  // CONTRACT for deliveries that cross the allowed-lateness boundary —
  // the semantics a 100 TB deployment relies on when a stalled upstream
  // shard flushes hours of old data.

  test("dedup stream: a duplicate delivered BEYOND the lateness horizon " +
    "is dropped as late data, never re-emitted — and in-horizon rows " +
    "keep flowing in the same batch") {
    // dropDuplicatesWithinWatermark's contract: state for a hash is kept
    // only within the 1-day horizon; once the watermark passes an
    // original's eviction point, a replayed duplicate is no longer
    // deduplicated BY STATE — it is dropped BY THE WATERMARK (its event
    // time is below the current watermark), which is the same visible
    // outcome (not emitted) for a different reason, and the reason
    // matters: a late FRESH submission is dropped too. The reference's
    // batch semantics (D1: db/data.py:250-257) would accept the fresh
    // row — that divergence IS the allowed-lateness contract, pinned
    // here so it is a documented decision, not a surprise.
    import org.apache.spark.sql.types.TimestampNTZType
    import spark.implicits._
    val landing = java.nio.file.Files
      .createTempDirectory("graft_late_dedup_land").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_late_dedup_ckpt").toString
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_late_dedup_out").toString
    val t0 = java.time.LocalDateTime.of(2025, 3, 1, 12, 0, 0)
    def mk(rows: Seq[(Long, java.time.LocalDateTime, Long, String,
        Double, String)]) =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value",
          "props")
        .select(col("event_id"), col("ts").cast(TimestampNTZType).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
    def runOnce(): Unit = {
      val q = EventStream.dedupedSubmissions(spark, landing, "*.parquet")
        .select("event_id", "user_id")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", outDir).start()
      q.processAllAvailable(); q.stop()
    }
    // batch 1: 10 originals at t0 — all emit; watermark stays < t0
    mk((1L to 10L).map(u => (u, t0.plusSeconds(u), u, "submit",
      u.toDouble, "p"))).coalesce(1).write.mode("append").parquet(landing)
    runOnce()
    // batch 2: one far-future fresh row advances the watermark to t0+2d
    // (3d max event time − 1d delay) once the batch commits
    mk(Seq((99L, t0.plusDays(3), 99L, "submit", 999.0, "p")))
      .coalesce(1).write.mode("append").parquet(landing)
    runOnce()
    // batch 3, everything in ONE delivery: exact duplicates of the
    // originals at t0+1h (below the t0+2d watermark — late), a FRESH
    // late submission at t0+1h, and a fresh IN-horizon submission at
    // t0+2d+1h. Only the last may emit.
    mk((1L to 10L).map(u => (100L + u, t0.plusHours(1).plusSeconds(u), u,
        "submit", u.toDouble, "p")) ++ Seq(
      (300L, t0.plusHours(1), 7L, "submit", 12345.0, "fresh-but-late"),
      (400L, t0.plusDays(2).plusHours(1), 7L, "submit", 54321.0,
        "fresh-in-horizon")))
      .coalesce(1).write.mode("append").parquet(landing)
    runOnce()
    val ids = spark.read.parquet(outDir)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val expect = ((1L to 10L) ++ Seq(99L, 400L)).sorted
    assert(ids == expect,
      s"late-delivery contract broke: emitted $ids, expected $expect " +
        "(late duplicates AND late fresh rows drop at the watermark; " +
        "in-horizon rows in the same batch still flow)")
  }

  test("sessionize stream: an out-of-order in-horizon event extends the " +
    "open session; a below-watermark row is dropped before the operator " +
    "— a closed session row is immutable, never resurrected") {
    // Empirically pinned contract (this test found it): Spark filters
    // input BELOW the watermark ahead of event-time-timeout stateful
    // operators, so EventStream.sessions never sees truly-late rows —
    // a delayed flush cannot extend a closed session, create a phantom
    // singleton, or rewrite a committed append-mode row. Out-of-order
    // rows ABOVE the watermark do reach the operator and extend the
    // open session (the in-gap branch).
    import org.apache.spark.sql.types.TimestampNTZType
    import spark.implicits._
    val landing = java.nio.file.Files
      .createTempDirectory("graft_late_sess_land").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_late_sess_ckpt").toString
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_late_sess_out").toString
    val t0 = java.time.LocalDateTime.of(2025, 3, 1, 12, 0, 0)
    def us(t: java.time.LocalDateTime): Long =
      t.toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    var nextId = 0L
    def mk(rows: Seq[(Long, java.time.LocalDateTime)]) =
      rows.map { case (u, t) => nextId += 1
        (nextId, t, u, "click", 1.0, "p") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .select(col("event_id"), col("ts").cast(TimestampNTZType).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
    def runOnce(): Unit = {
      val q = EventStream.sessions(spark, landing, "*.parquet")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", outDir).start()
      q.processAllAvailable(); q.stop()
    }
    val A = 1L; val B = 2L; val C = 3L
    // batch 1: A and C each open a session (t0, t0+10m); nothing closes
    mk(Seq((A, t0), (A, t0.plusMinutes(10)), (C, t0),
      (C, t0.plusMinutes(10))))
      .coalesce(1).write.mode("append").parquet(landing)
    runOnce()
    // batch 2 (watermark still < t0): C's OUT-OF-ORDER row at t0+5m is
    // above the watermark -> reaches the operator, in-gap -> extends the
    // open session to (t0, t0+10m, 3). Nothing emits.
    mk(Seq((C, t0.plusMinutes(5))))
      .coalesce(1).write.mode("append").parquet(landing)
    runOnce()
    // batch 3: B at t0+4h — processed under the old watermark (no
    // timeouts); commits the watermark to t0+3h for the next batch
    mk(Seq((B, t0.plusHours(4))))
      .coalesce(1).write.mode("append").parquet(landing)
    runOnce()
    // batch 4 (watermark now t0+3h): A and C have no data -> their
    // pending t0+40m timeouts fire -> both sessions emit closed. B2
    // keeps B's session open so it never pollutes the assertion.
    mk(Seq((B, t0.plusHours(4).plusMinutes(1))))
      .coalesce(1).write.mode("append").parquet(landing)
    runOnce()
    // batch 5: A's row at t0+20m is BELOW the watermark -> dropped as
    // late data before the operator; no new session row may appear
    mk(Seq((A, t0.plusMinutes(20))))
      .coalesce(1).write.mode("append").parquet(landing)
    runOnce()
    val got = spark.read.parquet(outDir)
      .filter(col("user_id").isin(A, C))
      .select("user_id", "n_events", "start_us", "end_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val expect = Set(
      (A, 2L, us(t0), us(t0.plusMinutes(10))),
      (C, 3L, us(t0), us(t0.plusMinutes(10))))
    assert(got == expect,
      s"late-session contract broke: got $got, expected $expect " +
        "(out-of-order in-horizon extends; below-watermark drops; " +
        "closed rows immutable)")
  }

  test("ledger gate: rows at or before the frozen ledger watermark day " +
    "are invisible — a late flush cannot mutate finalized days") {
    // D5's streaming contract: the catch-up gate freezes the ledger head
    // at construction (the daemon's SELECT max(collected)) and each
    // batch contributes only rows with to_date(ts) > watermark-day. A
    // delivery mixing late rows (inside finalized days) with fresh ones
    // must produce EXACTLY the series the fresh-only delivery produces —
    // finalized ledger days are immutable, the reference daemon's
    // append-only statistics-table semantics (db/submission_stats.py).
    val gate = EventStream.ledgerCatchupGate(spark, sfTiny)
    val ev = Tables.events(spark, sfTiny)
    val p = graft.operators.StatsPack.ensureStatsLedger(spark, sfTiny)
    val wm = graft.operators.StatsPack.ledgerHead(
      spark.read.parquet(s"$p/daily"))._1
      .getOrElse(fail("ledger artifact has no watermark day"))
    val fresh = ev.filter(to_date(col("ts")) > lit(wm))
    val late = ev.filter(to_date(col("ts")) <= lit(wm))
    assert(late.count() > 0 && fresh.count() > 0,
      "fixture must straddle the ledger watermark")
    val mixed = gate(fresh.unionByName(late)).collect().map(_.toString)
    val freshOnly = gate(fresh).collect().map(_.toString)
    assert(mixed.nonEmpty && mixed.toSeq == freshOnly.toSeq,
      "late rows leaked into finalized ledger days")
  }

  // ---- upgrade contract across a checkpoint restart (round 16) -----------
  // The executor-kill drive proved SAME-code recovery; real deployments
  // restart checkpoints with NEW code (the reference daemons restart
  // stateless every 30 s — hl_calc.py; the engine's stateful equivalent
  // must make its upgrade story explicit). Pinned here: which code changes
  // a running checkpoint tolerates (stateless transforms) and which fail
  // LOUDLY at the first batch (state-schema widening, stateful-topology
  // change) — the deployment answer for the failing class is
  // drain-and-restart: stop the old query, start the new code with a
  // FRESH checkpoint + full source replay (or a batch backfill), exactly
  // the reference's stateless-daemon posture. Guidance: BASELINE.md
  // "Streaming upgrade contract".

  /** Minimal stateful pipeline over a parquet landing dir: per-user
    * running event count via flatMapGroupsWithState. `wide` switches the
    * state product from Long to (Long, Long) — the canonical "state
    * gained a field" upgrade; `dedupUpstream` prepends a second stateful
    * operator — the topology upgrade. */
  private def counterStream(landing: String, wide: Boolean,
      dedupUpstream: Boolean = false) = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val src0 = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP_NTZ, user_id LONG")
      .parquet(s"$landing/*.parquet")
    val src = if (dedupUpstream)
      src0.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
        .withWatermark("ts", "1 day")
        .dropDuplicatesWithinWatermark("event_id")
    else src0
    val keyed = src.select(col("user_id"), col("event_id"))
      .as[(Long, Long)].groupByKey(_._1)
    if (!wide)
      keyed.flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[(Long, Long)], st: GroupState[Long]) => {
          val n = st.getOption.getOrElse(0L) + rows.size
          st.update(n); Iterator((uid, n))
        }).toDF("user_id", "n")
    else
      keyed.flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[(Long, Long)],
         st: GroupState[(Long, Long)]) => {
          val (n0, mx0) = st.getOption.getOrElse((0L, 0L))
          val ids = rows.map(_._2).toSeq
          val s = (n0 + ids.size, math.max(mx0, ids.max))
          st.update(s); Iterator((uid, s._1))
        }).toDF("user_id", "n")
  }

  private def feedCounter(landing: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.types.TimestampNTZType
    val t0 = java.time.LocalDateTime.of(2025, 4, 1, 0, 0, 0)
    ids.map(i => (i, t0.plusSeconds(i), i % 3))
      .toDF("event_id", "ts", "user_id")
      .select(col("event_id"), col("ts").cast(TimestampNTZType).as("ts"),
        col("user_id"))
      .coalesce(1).write.mode("append").parquet(landing)
  }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("upgrade contract: a checkpoint restart with a WIDENED state " +
    "product fails loudly at the first batch — never silently " +
    "misreads old state") {
    val landing = tmp("graft_upg_state_land")
    val ckpt = tmp("graft_upg_state_ckpt")
    val outDir = tmp("graft_upg_state_out")
    def runOnce(wide: Boolean): Unit = {
      val q = counterStream(landing, wide)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", outDir).start()
      try { q.processAllAvailable() } finally q.stop()
    }
    feedCounter(landing, 1L to 6L)
    runOnce(wide = false)
    feedCounter(landing, 7L to 9L)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runOnce(wide = true)
    }
    val msg = (e.getMessage + " " +
      Option(e.getCause).map(_.getMessage).getOrElse("")).toLowerCase
    assert(msg.contains("schema") && msg.contains("compatible"),
      s"expected a state-schema compatibility failure, got: $msg")
    // and the committed v1 output is intact — the failed restart wrote
    // nothing (3 rows: one per user group in batch 1)
    assert(spark.read.parquet(outDir).count() == 3)
  }

  test("upgrade contract: adding a STATEFUL operator upstream of the " +
    "counter fails the checkpoint restart loudly; a stateless transform " +
    "restarts cleanly and state carries over") {
    // failing half: new dedup stage shifts the stateful-operator layout
    val landing = tmp("graft_upg_topo_land")
    val ckpt = tmp("graft_upg_topo_ckpt")
    val outDir = tmp("graft_upg_topo_out")
    def runOnce(dedup: Boolean): Unit = {
      val q = counterStream(landing, wide = false, dedupUpstream = dedup)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", outDir).start()
      try { q.processAllAvailable() } finally q.stop()
    }
    feedCounter(landing, 1L to 6L)
    runOnce(dedup = false)
    feedCounter(landing, 7L to 9L)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runOnce(dedup = true)
    }
    // the pinned error class: Spark detects the stateful-operator layout
    // change against the checkpoint's state metadata at the first batch
    val msg = (e.getMessage + " " +
      Option(e.getCause).map(_.getMessage).getOrElse("")).toLowerCase
    assert(msg.contains("stateful_operator_not_match_in_state_metadata"),
      s"expected a stateful-topology mismatch failure, got: $msg")

    // benign half: a STATELESS upstream change (projection/filter added)
    // restarts on the same checkpoint and the per-user counts CONTINUE
    // from carried state — the upgrade class that needs no drain
    val landing2 = tmp("graft_upg_ok_land")
    val ckpt2 = tmp("graft_upg_ok_ckpt")
    val outDir2 = tmp("graft_upg_ok_out")
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    def runCounter(filtered: Boolean): Unit = {
      val src0 = spark.readStream
        .schema("event_id LONG, ts TIMESTAMP_NTZ, user_id LONG")
        .parquet(s"$landing2/*.parquet")
      val src = if (filtered) src0.filter(col("event_id") =!= 9999L) else src0
      val q = src.select(col("user_id"), col("event_id"))
        .as[(Long, Long)].groupByKey(_._1)
        .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.NoTimeout)(
          (uid: Long, rows: Iterator[(Long, Long)],
           st: GroupState[Long]) => {
            val n = st.getOption.getOrElse(0L) + rows.size
            st.update(n); Iterator((uid, n))
          }).toDF("user_id", "n")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt2)
        .format("parquet").option("path", outDir2).start()
      try { q.processAllAvailable() } finally q.stop()
    }
    feedCounter(landing2, 1L to 6L)   // users 0,1,2 get 2 each
    runCounter(filtered = false)
    feedCounter(landing2, 7L to 9L)   // one more each
    runCounter(filtered = true)       // NEW code, same checkpoint
    val last = spark.read.parquet(outDir2)
      .groupBy("user_id").agg(max("n").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(last == Map(0L -> 3L, 1L -> 3L, 2L -> 3L),
      s"stateless upgrade lost carried state: $last")
  }

  // ---- upgrade contract, the EVOLUTION path (round 17, VERDICT r16 #6) ---
  // The r16 contract pins that a WIDENED flatMapGroupsWithState product
  // fails loudly; Spark 4.x's transformWithState + Avro state encoding is
  // the engine's supported ALTERNATIVE to drain-and-restart: a state value
  // that gains a NULLABLE field evolves across a checkpoint restart (old
  // rows read back with the new field absent), under the same RocksDB
  // production backend the r16 drives pinned. Posture documented in
  // BASELINE.md "Streaming upgrade contract": fMGWS pipelines keep
  // drain-and-restart; pipelines that EXPECT state evolution should be
  // written on transformWithState with nullable additions.
  test("upgrade contract, evolution path: transformWithState + Avro " +
    "state encoding carries state through a WIDENED (nullable-add) value " +
    "across a checkpoint restart") {
    import spark.implicits._
    val landing = tmp("graft_tws_land")
    val ckpt = tmp("graft_tws_ckpt")
    val outDir = tmp("graft_tws_out")
    val confs = Map(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.stateStore.encodingFormat" -> "avro")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def runOnce(wide: Boolean): Unit = {
        import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
        val keyed = spark.readStream
          .schema("event_id LONG, ts TIMESTAMP_NTZ, user_id LONG")
          .parquet(s"$landing/*.parquet")
          .select(col("user_id"), col("event_id"))
          .as[(Long, Long)].groupByKey(_._1)
        val out =
          if (!wide) keyed.transformWithState(new TwsCounterV1,
            TimeMode.None(), OutputMode.Append())
          else keyed.transformWithState(new TwsCounterV2,
            TimeMode.None(), OutputMode.Append())
        val q = out.toDF("user_id", "n")
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .format("parquet").option("path", outDir).start()
        try { q.processAllAvailable() } finally q.stop()
      }
      feedCounter(landing, 1L to 6L)   // users 0,1,2: 2 events each
      runOnce(wide = false)            // V1 state: TwsCount(n)
      feedCounter(landing, 7L to 9L)   // one more each
      runOnce(wide = true)             // V2 state: TwsCount2(n, mx: Option)
      val last = spark.read.parquet(outDir)
        .groupBy("user_id").agg(max("n").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(last == Map(0L -> 3L, 1L -> 3L, 2L -> 3L),
        s"evolved state lost the carried counts: $last")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

/** transformWithState state values for the evolution-path test. V2 adds a
  * NULLABLE field — the Avro-evolvable widening (a non-nullable add has no
  * default for old rows and would fail the schema-compatibility gate). */
case class TwsCount(n: Long)
case class TwsCount2(n: Long, mx: Option[Long])

/** V1 processor: per-user running count with a TwsCount value state. */
class TwsCounterV1 extends org.apache.spark.sql.streaming.StatefulProcessor[
    Long, (Long, Long), (Long, Long)] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
  @transient private var st: ValueState[TwsCount] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[TwsCount]("cnt",
      org.apache.spark.sql.Encoders.product[TwsCount], TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      tv: TimerValues): Iterator[(Long, Long)] = {
    val n = (if (st.exists()) st.get().n else 0L) + rows.size
    st.update(TwsCount(n))
    Iterator((key, n))
  }
}

/** V2 processor: SAME state name, widened value type (nullable add) —
  * restarted on V1's checkpoint it must read old rows with mx = None. */
class TwsCounterV2 extends org.apache.spark.sql.streaming.StatefulProcessor[
    Long, (Long, Long), (Long, Long)] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
  @transient private var st: ValueState[TwsCount2] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[TwsCount2]("cnt",
      org.apache.spark.sql.Encoders.product[TwsCount2], TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      tv: TimerValues): Iterator[(Long, Long)] = {
    val prev = if (st.exists()) st.get() else TwsCount2(0L, None)
    val ids = rows.map(_._2).toSeq
    val s = TwsCount2(prev.n + ids.size,
      Some(math.max(prev.mx.getOrElse(0L), ids.max)))
    st.update(s)
    Iterator((key, s.n))
  }
}
