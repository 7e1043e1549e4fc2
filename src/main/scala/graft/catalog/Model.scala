package graft.catalog

import java.sql.Timestamp

/** Spark-native re-expression of the reference's metadata model.
  *
  * The reference serializes INode/BlockMeta/SubBlockMeta with a hand-rolled
  * binary codec into a Cassandra column (reference INode.scala:41-77,
  * BlockMeta.scala:23, SubBlockMeta.scala:23). Here the same shape is a
  * nested Spark schema — `ArrayType(StructType(...))` — so the codec is the
  * parquet encoder and the nested-array folds (file length = Σ block
  * lengths, reference SnackFileStatus.scala:40) become codegen'd
  * higher-order functions instead of driver-side loops.
  */
final case class SubBlockMeta(id: String, offset: Long, length: Long)

final case class BlockMeta(
    id: String,
    offset: Long,
    length: Long,
    subBlocks: Seq[SubBlockMeta])

/** One row per file or directory (reference INode.scala:32-33).
  * Directories carry `blocks = null` (reference MakeDirectoryCommand.scala:52).
  */
final case class Inode(
    path: String,
    parentPath: String,
    user: String,
    group: String,
    permission: Int,
    isDir: Boolean,
    mtime: Timestamp,
    blocks: Seq[BlockMeta]) {
  def isFile: Boolean = !isDir
  /** File length = Σ block lengths (reference SnackFileStatus.scala:40). */
  def length: Long = if (blocks == null) 0L else blocks.map(_.length).sum
}

object PathOps {
  /** Parent of an absolute path; null for the root (Hadoop Path.getParent). */
  def parent(path: String): String =
    if (path == "/") null
    else {
      val cut = path.lastIndexOf('/')
      if (cut <= 0) "/" else path.substring(0, cut)
    }

  /** The path plus all its ancestors up to "/" — the level walk the
    * reference runs in MakeDirectoryCommand.scala:68-71.
    */
  def ancestors(path: String): Seq[String] = {
    var p = path
    val acc = Seq.newBuilder[String]
    while (p != null) { acc += p; p = parent(p) }
    acc.result()
  }
}
