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

object BlockMeta {
  /** Block/subblock metadata for a file of `len` bytes with the SAME
    * geometry `DataPlane.chunk` uses, so the catalog's length folds and
    * `blockLocations` range pruning agree with the chunk table
    * byte-for-byte — every writer (facade create, shell put) must build
    * inode blocks through this.
    */
  def forLength(path: String, len: Long,
                subBlockSize: Int, blockSize: Int): Seq[BlockMeta] = {
    require(subBlockSize > 0 && blockSize % subBlockSize == 0,
      "blockSize must be a positive multiple of subBlockSize")
    if (len == 0) return Seq.empty
    val nBlocks = ((len + blockSize - 1) / blockSize).toInt
    (0 until nBlocks).map { b =>
      val off = b.toLong * blockSize
      val blen = math.min(blockSize.toLong, len - off)
      val nSub = ((blen + subBlockSize - 1) / subBlockSize).toInt
      BlockMeta(s"$path#b$b", off, blen,
        (0 until nSub).map { sb =>
          val soff = sb.toLong * subBlockSize
          SubBlockMeta(s"$path#b$b#s$sb", soff,
            math.min(subBlockSize.toLong, blen - soff))
        })
    }
  }
}

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

  /** FS glob → anchored Java regex, Hadoop `GlobPattern` semantics (the
    * reference shell resolves every path argument through
    * `FileSystem.globStatus`, SnackFSShell.scala:269-337): `*` and `?`
    * match within one path component (never '/'), `[...]` is a char
    * class with `[!...]` negation, `{a,b}` is alternation. Everything
    * else is escaped literally. Parsed driver-side — patterns are
    * literals; the compiled regex runs distributed via `rlike`.
    */
  def globToRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    var inClass = false
    var classStart = -1
    var braceDepth = 0
    var i = 0
    while (i < glob.length) {
      val c = glob.charAt(i)
      if (inClass) c match {
        case ']' => inClass = false; sb.append(']')
        case '!' if i == classStart + 1 => sb.append('^')
        case '^' | '\\' => sb.append('\\').append(c)
        case _ => sb.append(c)
      }
      else c match {
        case '*' => sb.append("[^/]*")
        case '?' => sb.append("[^/]")
        case '[' => inClass = true; classStart = i; sb.append('[')
        case '{' => braceDepth += 1; sb.append("(?:")
        case '}' if braceDepth > 0 => braceDepth -= 1; sb.append(')')
        case ',' if braceDepth > 0 => sb.append('|')
        case '\\' if i + 1 < glob.length =>
          i += 1; sb.append(java.util.regex.Pattern.quote(glob.charAt(i).toString))
        case _ if "\\.[]{}()<>*+-=!?^$|".indexOf(c.toInt) >= 0 =>
          sb.append('\\').append(c)
        case _ => sb.append(c)
      }
      i += 1
    }
    sb.append('$').toString
  }

  /** Literal prefix of a glob (up to the first metachar) — pushed as a
    * `startsWith` predicate so a path-range-partitioned catalog prunes
    * files before the regex ever runs.
    */
  def globLiteralPrefix(glob: String): String = {
    val cut = glob.indexWhere(c => "*?[{\\".indexOf(c.toInt) >= 0)
    if (cut < 0) glob else glob.substring(0, cut)
  }

  /** True if the pattern contains any glob metacharacter. */
  def isGlob(pattern: String): Boolean =
    pattern.exists(c => "*?[{\\".indexOf(c.toInt) >= 0)
}
