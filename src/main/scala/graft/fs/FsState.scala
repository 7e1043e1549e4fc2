package graft.fs

import graft.PlanHygiene

/** Mutation-counting (catalog, chunks) holder shared by the facade and
  * the shell — the Spark analog of the reference's per-op Cassandra
  * mutations for LONG-LIVED sessions.
  *
  * Every FS verb returns a new `GraftFs` whose plan wraps the previous
  * one (an anti-join, a union, a prefix rewrite), so a session's plan
  * depth grows with every mutation — by the thousandth small write,
  * analysis alone dominates. Every `compactEvery`-th mutation this cell
  * flattens both planes to eager localCheckpoints (single LogicalRDD
  * leaves: bounded analysis, one materialized snapshot) and releases
  * the superseded checkpoint pair so storage holds exactly one
  * snapshot plus ≤compactEvery deltas. A persistent deployment
  * checkpoints to parquet instead (`FsCatalog.save`/`load`) — this is
  * the in-session middle ground.
  */
final class FsState(initial: GraftFs, compactEvery: Int = FsState.CompactEvery) {
  require(compactEvery > 0, "compactEvery must be positive")

  private var current = initial
  private var mutations = 0
  private var lastCheckpointed: Option[GraftFs] = None

  def get: GraftFs = current

  def set(next: GraftFs): Unit = {
    current = next
    mutations += 1
    if (mutations % compactEvery == 0) compactNow()
  }

  /** Force a compaction boundary (also runs automatically). */
  def compactNow(): Unit = {
    val compacted = current.compact() // eager: materialized before release
    lastCheckpointed.foreach { prev =>
      PlanHygiene.releaseCheckpoint(prev.catalog.inodes)
      PlanHygiene.releaseCheckpoint(prev.chunks)
    }
    lastCheckpointed = Some(compacted)
    current = compacted
  }
}

object FsState {
  /** Default mutation count between compactions: deep enough that
    * plan-flattening cost amortizes (one snapshot materialization per
    * 64 ops), shallow enough that analysis never sees a 1000-union
    * plan.
    */
  val CompactEvery: Int = 64
}
