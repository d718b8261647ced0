package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Lineage cuts with an audit trail.
  *
  * `localCheckpoint` replaces a frame's logical plan with an opaque
  * `LogicalRDD`, which is exactly right for execution (iterative
  * algorithms must not re-derive their whole history) and exactly
  * wrong for plan audits: a broadcast hint buried below a cut is
  * invisible to every static walk — the r9 `dedup_semantic` gate miss
  * was this class (its corpus-coupled centroid broadcast hid behind
  * the kmeans chain's checkpoints).
  *
  * All library cut sites therefore go through [[CutOps.cutLineage]].
  * In normal operation it is `localCheckpoint` with zero overhead.
  * When a plan gate turns [[record]] on, every cut also logs the
  * pre-cut OPTIMIZED plan (optimized so join hints are already folded
  * into `Join.hint`), letting the gate walk and measure the frames
  * that execution-side lineage cutting would otherwise hide.
  */
object Ckpt {
  private val recording = new java.util.concurrent.atomic.AtomicBoolean(false)
  private val cutLog = new java.util.concurrent.ConcurrentLinkedQueue[LogicalPlan]()

  /** Toggle pre-cut plan recording (audit harnesses only). */
  def record(on: Boolean): Unit = {
    recording.set(on)
    if (!on) cutLog.clear()
  }

  /** Remove and return every pre-cut plan recorded since the last
    * drain (construction order).
    */
  def drain(): Seq[LogicalPlan] = {
    val out = scala.collection.mutable.ListBuffer.empty[LogicalPlan]
    var p = cutLog.poll()
    while (p != null) { out += p; p = cutLog.poll() }
    out.toSeq
  }

  implicit final class CutOps(private val df: DataFrame) extends AnyVal {
    def cutLineage(eager: Boolean = true): DataFrame = {
      if (recording.get()) cutLog.add(df.queryExecution.optimizedPlan)
      df.localCheckpoint(eager)
    }
  }
}
