package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** The ONE sanctioned `localCheckpoint` wrapper + pre-truncation frame
  * registry.
  *
  * `localCheckpoint(eager = true)` truncates lineage: downstream
  * `queryExecution` shows a leaf scan where the checkpointed segment's
  * plan used to be, so ANY plan-shape gate that walks a query's final
  * plan (PlanSpec's suite-wide unpartitioned-window sweep) is blind to
  * operators INSIDE checkpointed segments. Round 12 patched that with
  * per-query hand pins (g2/g3 re-built unmaterialized); VERDICT r12
  * item 3 asked for the generic form: every checkpoint site funnels
  * through here, and while a capture is active (test-only) the
  * PRE-truncation physical plan is recorded under a site label. The
  * sweep then walks every recorded frame — a new checkpointing builder
  * is covered the moment it exists, because the meta-gate (PlanSpec's
  * source scan) rejects raw `.localCheckpoint` calls anywhere else in
  * main source.
  *
  * Capture is off outside the spec: one atomic-boolean read per call,
  * no planning work, no behavior change (`apply` is literally
  * `localCheckpoint(eager)` then).
  */
object Checkpointed {

  private val reg =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, SparkPlan)]()
  private val capturing = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Begin recording pre-checkpoint frames (clears prior captures). */
  def startCapture(): Unit = { reg.clear(); capturing.set(true) }

  /** Stop recording; return and clear everything captured. */
  def stopCapture(): Seq[(String, SparkPlan)] = {
    capturing.set(false)
    import scala.jdk.CollectionConverters._
    val out = reg.iterator().asScala.toVector
    reg.clear()
    out
  }

  /** Checkpoint `df` (eagerly by default), registering the pre-truncation
    * plan under `label` when a capture is active. The recorded frame is
    * the PREPARED plan (exchanges inserted, adaptive wrapper unwrapped —
    * `executedPlan` on an unexecuted adaptive root is the initial
    * prepared tree), so sweeps can count both WindowExec AND
    * ShuffleExchangeExec nodes; `sparkPlan` predates EnsureRequirements
    * and carries no Exchange nodes at all. Preparation is rule-running
    * only — nothing executes beyond the checkpoint itself.
    *
    * FAULT-TOLERANCE CONTRACT (round 15, found by the executor-kill
    * drive): `localCheckpoint` stores its blocks ONLY on the computing
    * executors and truncates lineage, so losing one of those executors
    * makes every downstream read fail PERMANENTLY
    * (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND — task retries cannot recompute a
    * truncated plan). That is acceptable in one-JVM gates and wrong on a
    * real cluster. When `spark.checkpoint.dir` is configured (any
    * multi-executor deployment; the kill drive sets it via
    * GRAFT_ENGINE_CONF) this funnel switches to the RELIABLE
    * `Dataset.checkpoint` — shared-storage files survive any executor
    * loss, and the frames funneled through here are rollup-sized by
    * design, so the write is bounded. Reliable checkpoint files
    * accumulate for the app's lifetime unless
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true`. */
  def apply(label: String, df: DataFrame, eager: Boolean = true): DataFrame = {
    if (capturing.get) {
      val prepared = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      reg.add(label -> prepared)
    }
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager)
    else df.localCheckpoint(eager)
  }
}
