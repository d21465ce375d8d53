package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted}
import scala.collection.concurrent.TrieMap

/** Per-query-group spill/peak-memory accounting for the memory-pressure
  * drive: the 100×-scale claim ("bounded collects, broadcast-only dims,
  * no driver-side accumulation") has only ever been exercised inside a
  * 128 GiB sandbox that never spilled — this listener turns a
  * deliberately starved run (e.g. `-Xmx4g` at sf0.1) into per-query
  * numbers: bytes spilled to memory/disk and the peak execution memory
  * per task, attributed through the job group each Verify future sets.
  *
  * The reference's own bounded-memory discipline is the contract being
  * matched: its dump path streams 10k-row chunks precisely so the full
  * table never lives in RAM (reference db/dump.py:34,585-696).
  *
  * Stage attempts are SUMMED (a retried stage re-pays its spill — that
  * is real I/O, not double counting); `peak_mem` is the max single-task
  * execution-memory footprint seen in the group, the number that must
  * stay under executor-memory/cores at any scale. */
final class SpillReport extends SparkListener {
  /** The session's defaultParallelism, stamped by the installer: shuffle
    * BYTES are deterministic per parallelism but NOT across them
    * (local[16] vs local[32] regroups input splits and changes
    * shuffle-block compression granularity — measured ±~2.4× on ~1 MB
    * shuffles, r17), so a bytes capture is only comparable to a manifest
    * seeded at the same setting. The ratchet refuses the compare
    * otherwise; -1 means an installer predating the stamp. */
  @volatile var parallelism: Int = -1

  private val jobGroup = TrieMap.empty[Int, String]
  private val stageJob = TrieMap.empty[Int, Int]
  // group -> (memSpilled, diskSpilled, peakExecMem, shufRead, shufWrite)
  // Shuffle BYTES ride the same attribution (round 15, VERDICT r14 #4):
  // the shuffle-count ratchet pins exchange TOPOLOGY but cannot see a
  // candidate explosion that keeps the plan shape (the dd_edit_blocked
  // class) — per-query read+write bytes, gated by
  // tools/shuffle_ratchet.py against the committed manifest, can.
  private val acc = TrieMap.empty[String, (Long, Long, Long, Long, Long)]

  override def onJobStart(js: SparkListenerJobStart): Unit = {
    val g = Option(js.properties)
      .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
      .getOrElse("ungrouped")
    jobGroup.put(js.jobId, g)
    // putIfAbsent: a stage shared with an earlier job is SKIPPED by later
    // jobs — the first (executing) job must keep the attribution, or a
    // stage that ran under query A gets billed to query B's group.
    js.stageIds.foreach(sid => stageJob.putIfAbsent(sid, js.jobId))
  }

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val m = sc.stageInfo.taskMetrics
    if (m != null) {
      val g = stageJob.get(sc.stageInfo.stageId)
        .flatMap(jobGroup.get).getOrElse("ungrouped")
      val sr = m.shuffleReadMetrics.remoteBytesRead +
        m.shuffleReadMetrics.localBytesRead
      val sw = m.shuffleWriteMetrics.bytesWritten
      acc.updateWith(g) {
        case Some((ms, ds, pk, r, w)) => Some((ms + m.memoryBytesSpilled,
          ds + m.diskBytesSpilled, pk.max(m.peakExecutionMemory),
          r + sr, w + sw))
        case None => Some((m.memoryBytesSpilled, m.diskBytesSpilled,
          m.peakExecutionMemory, sr, sw))
      }
    }
  }

  /** One JSON object: heap bound, totals, and the per-group rows (every
    * group that spilled, peaked above 64 MiB, or shuffled any bytes — the
    * shuffle-bytes ratchet needs all shuffling groups — plus an
    * `n_groups` count so silence is distinguishable from an uninstalled
    * listener). */
  def json(): String = {
    val rows = acc.toSeq.sortBy(-_._2._2)
    val (tm, td) = rows.foldLeft((0L, 0L)) {
      case ((a, b), (_, (m, d, _, _, _))) => (a + m, b + d) }
    val interesting = rows.filter { case (_, (m, d, pk, r, w)) =>
      m > 0 || d > 0 || pk > (64L << 20) || r > 0 || w > 0 }
    val body = interesting.map { case (g, (m, d, pk, r, w)) =>
      s"${graft.JsonUtil.str(g)}: {" +
        s""""mem_spill": $m, "disk_spill": $d, "peak_mem": $pk, """ +
        s""""shuffle_read": $r, "shuffle_write": $w}"""
    }.mkString("{", ",", "}")
    s"""{"heap_max": ${Runtime.getRuntime.maxMemory()}, """ +
      s""""parallelism": $parallelism, """ +
      s""""n_groups": ${rows.size}, "total_mem_spill": $tm, """ +
      s""""total_disk_spill": $td, "groups": $body}"""
  }
}
