package graft.fs

import graft.PlanHygiene

/** Mutation-counting (catalog, chunks) holder shared by the facade and
  * the shell — the Spark analog of the reference's per-op Cassandra
  * mutations for LONG-LIVED sessions.
  *
  * Every FS verb returns a new `GraftFs` whose plan wraps the previous
  * one (an anti-join, a union, a prefix rewrite), so a session's plan
  * depth grows with every mutation — by the thousandth small write,
  * analysis alone dominates. This cell periodically flattens both
  * planes to eager localCheckpoints (single LogicalRDD leaves: bounded
  * analysis, one materialized snapshot) and releases the superseded
  * checkpoint pair so storage holds one snapshot plus recent deltas.
  *
  * Cost model: each compaction re-materializes the FULL current
  * snapshot (mutations are arbitrary rewrites — deletes and renames
  * transform the whole plane — so deltas are not separable). A fixed
  * cadence would make total materialization quadratic in plane size
  * under sustained writes; the interval therefore DOUBLES after every
  * compaction (capped), so a session pays O(log N) full snapshots
  * instead of O(N/64) while plan depth stays bounded by the cap.
  *
  * Snapshots escape through `pinCurrent` (the facade's `graftFs`, the
  * shell's `fs`): a pinned generation's checkpoint is excluded from
  * release, so externally-held state keeps working after later
  * compactions — storage for pins is the caller's choice to make.
  *
  * Methods are synchronized so a compaction can't release a checkpoint
  * mid-`set`; the read-modify-write races of CONCURRENT mutators are
  * out of scope — the engine's documented single-driver/single-writer
  * narrowing (SURVEY.md §1.3, FileLocks) applies here too.
  *
  * A persistent deployment with a large resident plane checkpoints to
  * parquet instead (`FsCatalog.save`/`load`); this is the in-session
  * middle ground, sized for the facade/shell compatibility surface.
  */
final class FsState(initial: GraftFs, compactEvery: Int = FsState.CompactEvery) {
  require(compactEvery > 0, "compactEvery must be positive")

  private var current = initial
  private var sinceCompact = 0
  private var interval = compactEvery
  private var lastCheckpointed: Option[GraftFs] = None
  private var pinned: List[GraftFs] = Nil

  def get: GraftFs = synchronized(current)

  /** Return the current snapshot and pin its backing checkpoint: later
    * compactions will not release it, so the caller's copy stays
    * queryable for the session's lifetime.
    */
  def pinCurrent(): GraftFs = synchronized {
    lastCheckpointed.foreach { cp =>
      if (!pinned.exists(_ eq cp)) pinned ::= cp
    }
    current
  }

  def set(next: GraftFs): Unit = synchronized {
    current = next
    sinceCompact += 1
    if (sinceCompact >= interval) compactNow()
  }

  /** Force a compaction boundary (also runs automatically). */
  def compactNow(): Unit = synchronized {
    val compacted = current.compact() // eager: materialized before release
    lastCheckpointed
      .filterNot(prev => pinned.exists(_ eq prev))
      .foreach { prev =>
        PlanHygiene.releaseCheckpoint(prev.catalog.inodes)
        PlanHygiene.releaseCheckpoint(prev.chunks)
      }
    lastCheckpointed = Some(compacted)
    current = compacted
    sinceCompact = 0
    interval = math.min(interval * 2, FsState.MaxCompactEvery)
  }
}

object FsState {
  /** Initial mutation count between compactions; the interval doubles
    * per compaction up to [[MaxCompactEvery]] (see the cost model in
    * the class doc).
    */
  val CompactEvery: Int = 64

  /** Ceiling for the doubling interval — bounds plan depth (analysis
    * cost) even in the longest sessions.
    */
  val MaxCompactEvery: Int = 1024
}
