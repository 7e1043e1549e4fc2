package graft.fs

import java.io.{FileNotFoundException, IOException}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.catalog.FsCatalog

/** The complete filesystem: metadata catalog + data plane, kept
  * consistent by construction.
  *
  * The reference deletes a file's blocks WITH its inode
  * (ThriftStore.scala:437-471, called from DeleteCommand.scala:40-43) —
  * the catalog and the data plane move together. `FsCatalog` alone only
  * mutates inode rows, which would orphan chunk rows on every rm/mv.
  * This wrapper applies the SAME path predicate to both planes:
  *
  *  - delete: anti-filter on the catalog (FsCatalog's error matrix) AND
  *    an identical prefix anti-filter on chunk rows;
  *  - rename:  one prefix-rewrite pass over each plane — a single
  *    distributed transform per side, no per-file loop (the 100 TB-safe
  *    shape; the reference loops child-by-child);
  *  - copy:    subtree duplication on both planes.
  *
  * Both planes partition by `path`, so each cascade is the same pruned
  * scan shape the catalog side already has (path-range parquet min/max
  * stats, see FsCatalog.save).
  */
final case class GraftFs(catalog: FsCatalog, chunks: DataFrame) {

  private def prefixOf(path: String): String =
    if (path == "/") "/" else path + "/"

  private def inSubtree(path: String) =
    col("path") === path || col("path").startsWith(prefixOf(path))

  /** A7/D8 + B9: delete cascades to chunk rows — no orphaned data. */
  def delete(path: String, recursive: Boolean): (GraftFs, Boolean) = {
    val (cat2, ok) = catalog.delete(path, recursive)
    if (!ok) (this, false)
    else (GraftFs(cat2, chunks.filter(!inSubtree(path))), true)
  }

  /** CHUNK-plane-only rename for the mounted facade, whose catalog
    * derives from its driver-resident inode cache (the cache moved the
    * metadata already; only payload rows need the frame rewrite). The
    * facade calls this ONLY when the renamed subtree actually has rows
    * folded into the base plan — its pending-buffer rows move in pure
    * memory — so the filter-rewrite ∪ passthrough's 2× tree growth is
    * paid O(once) per session, not per committer rename. (Both cheap
    * alternatives measured fatal at committer frequency, r11: this
    * shape per rename doubles the tree — 2^16 nodes wedged analysis
    * for minutes — and a when() projection is worse still: it
    * references `path` 4×, and CollapseProject substitutes the whole
    * previous CaseWhen into every reference — 4^16, OOM.)
    */
  private[fs] def renameChunksOnly(src: String, dst: String): GraftFs = {
    val newPath = concat(lit(dst), expr(s"substring(path, ${src.length + 1})"))
    val moved = chunks.filter(inSubtree(src)).withColumn("path", newPath)
    GraftFs(catalog, chunks.filter(!inSubtree(src)).unionByName(moved))
  }

  /** D8 over a glob, cascading to the data plane: the removed path set
    * (catalog-before ∖ catalog-after — metadata-scale) anti-joins the
    * chunk table, so every matched file's payload rows vanish with its
    * inode, subtrees of matched dirs included.
    */
  def deleteGlob(pattern: String, recursive: Boolean): (GraftFs, Boolean) = {
    val (cat2, ok) = catalog.deleteGlob(pattern, recursive)
    if (!ok) (this, false)
    else {
      val removed = catalog.inodes.select(col("path"))
        .except(cat2.inodes.select(col("path")))
      (GraftFs(cat2, chunks.join(removed, Seq("path"), "left_anti")), true)
    }
  }

  /** A8/D6: rename rewrites chunk paths with the same one-pass prefix
    * rewrite the catalog side uses (FsCatalog.rename, which throws on
    * every failed precondition — its Boolean is always true).
    */
  def rename(src: String, dst: String): (GraftFs, Boolean) = {
    // self-rename is a no-op success on EVERY surface (FsCatalog.rename
    // and the mounted facade agree) — also skips the identity chunk
    // rewrite the general path would otherwise add to the plan
    if (src == dst) return (this, true)
    val (cat2, _) = catalog.rename(src, dst) // preconditions throw here
    val newPath = concat(lit(dst), expr(s"substring(path, ${src.length + 1})"))
    // filter-rewrite ∪ passthrough, NOT a whole-table when() projection:
    // only subtree rows' payload bytes flow through the rewrite; the
    // untouched branch is a pure filter that parquet min/max stats prune
    // on the path-partitioned layout (moving one subtree must not
    // funnel the entire data plane through a projection at 100 TB)
    val moved = chunks.filter(inSubtree(src)).withColumn("path", newPath)
    (GraftFs(cat2, chunks.filter(!inSubtree(src)).unionByName(moved)), true)
  }

  /** D7: copy duplicates the subtree's chunk rows under the new prefix
    * (FsCatalog.copy throws on every failed precondition).
    */
  def copy(src: String, dst: String): (GraftFs, Boolean) = {
    val (cat2, _) = catalog.copy(src, dst)
    val dup = chunks
      .filter(inSubtree(src))
      .withColumn("path", concat(lit(dst), expr(s"substring(path, ${src.length + 1})")))
    (GraftFs(cat2, chunks.unionByName(dup)), true)
  }

  /** D12: cat through the catalog — a path the catalog no longer knows
    * throws, even if (in a buggy world) chunk rows survived; a directory
    * errors like the reference shell (bytes live only in files).
    */
  def cat(path: String): DataFrame = {
    val node = catalog.retrieve(path).getOrElse(
      throw new FileNotFoundException(path))
    if (node.isDir) throw new IOException(s"$path is a directory")
    DataPlane.cat(chunks, path)
  }

  /** Flatten both planes' lazy plans into materialized snapshots
    * (eager localCheckpoints). Long-lived mutable sessions (the facade,
    * the shell) layer one plan node per mutation — one union per
    * written subblock — so analysis cost grows with session age;
    * compaction resets both plans to single `LogicalRDD` leaves. The
    * caller owns releasing the PREVIOUS compaction (`FsState` does) —
    * and note an externally-held older snapshot cannot be recomputed
    * once its checkpoint is released.
    */
  def compact(): GraftFs =
    GraftFs(graft.catalog.FsCatalog(catalog.inodes.localCheckpoint(true)),
      chunks.localCheckpoint(true))

  /** Data-plane accounting for consistency checks: chunk rows + bytes
    * under a prefix.
    */
  def chunkSummary(prefix: String): DataFrame =
    chunks
      .filter(col("path").startsWith(prefix))
      .agg(
        lit(prefix).as("prefix"),
        count(lit(1)).as("n_chunks"),
        coalesce(sum(col("length")), lit(0L)).as("n_bytes"))
}
