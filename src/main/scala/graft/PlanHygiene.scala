package graft

import org.apache.spark.sql.Dataset

/** Lifecycle helpers for localCheckpoint-based plan flattening.
  *
  * Spark has no public "release this checkpoint" API: `Dataset
  * .unpersist` is a no-op for checkpoints because the materialized RDD
  * hides inside the plan's `LogicalRDD` leaf. Every iterative or
  * long-lived mutable plan in this engine (connected components' label
  * rounds, the facade/shell state cell) checkpoints per step and MUST
  * release the superseded step, or storage grows by one full snapshot
  * per step.
  */
object PlanHygiene {

  /** Release a localCheckpoint'd frame's cached blocks. Best-effort: an
    * unexpected plan shape just leaves the blocks to the context's
    * cleaner. After release the frame can no longer be recomputed —
    * only call on snapshots nothing else references.
    */
  def releaseCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
