package graft.fs

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.Group
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.io.api.Binary

import graft.catalog.{BlockMeta, Inode, SubBlockMeta}

/** SESSION-FREE readers of a persisted filesystem state (the
  * `GraftShellMain.saveFs` layout: `catalog/` + `chunks/` parquet under
  * a versioned dir named by `CURRENT`) — the executor-side read path
  * of the scheme mount.
  *
  * Why this exists: the reference serves ANY client — every SnackFS
  * consumer talks straight to the store with no driver in the loop
  * (reference README.md:7, FileSystemInputStream.scala reads blocks
  * through the store connection it holds). The Spark-native analog of
  * "the store is directly addressable" is that a saved state IS plain
  * parquet: an executor (or any session-less JVM) can read an inode
  * table and fetch one file's block rows with the stock parquet-hadoop
  * reader — no SparkSession, no driver job, no nested action. The
  * facade's `blockAt` routes block misses of SAVED payloads here
  * (mount-table narrowing, SURVEY §8); only bytes written AFTER the
  * mount (pending/folded driver state) still need the driver path.
  *
  * Pruning shape: [[readBlock]] pushes `path = X AND block_id = N`
  * into the parquet reader (row-group statistics + dictionary +
  * record-level filtering), and `saveFs` range-partitions + sorts the
  * chunk table by (path, block_id), so at scale a one-block fetch
  * touches one row group of one file, not the corpus. A 100 TB
  * deployment points `graft.mount.state.dir` at shared storage and
  * every executor reads its own splits directly — the same no-driver
  * shape as the DSv2 connector, for the byte-stream API.
  */
object SavedState {

  private def parquetFiles(dir: String): Seq[String] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) return Seq.empty
    val l = Files.list(p)
    try l.iterator().asScala
      .map(_.toString)
      .filter(f => f.endsWith(".parquet") && !f.contains("_SUCCESS"))
      .toSeq.sorted
    finally l.close()
  }

  private def hconf(): Configuration = new Configuration(false)

  /** All inodes of a saved catalog dir — the executor-mode mount's
    * metadata bootstrap. Handles both parquet timestamp encodings
    * Spark emits (INT64 MICROS and legacy INT96) and directories'
    * null block arrays.
    */
  def readCatalog(catalogDir: String): Seq[Inode] =
    readInodes(catalogDir, None)

  /** Inodes of a catalog-layout dir matching an optional pushed-down
    * parquet predicate — the POINT/RANGE form the shell's spilled
    * namespace tier probes (FsCatalog.save sorts and range-partitions
    * on `path`, so a path-keyed predicate prunes at row-group
    * statistics before any decode).
    */
  def readInodes(catalogDir: String,
                 filter: Option[org.apache.parquet.filter2.predicate
                   .FilterPredicate]): Seq[Inode] = {
    val out = Seq.newBuilder[Inode]
    parquetFiles(catalogDir).foreach { f =>
      val b = ParquetReader
        .builder(new GroupReadSupport(), new org.apache.hadoop.fs.Path(f))
        .withConf(hconf())
      filter.foreach(p => b.withFilter(FilterCompat.get(p)))
      val reader = b.build()
      try {
        var g = reader.read()
        while (g != null) {
          out += inodeOf(g)
          g = reader.read()
        }
      } finally reader.close()
    }
    out.result()
  }

  /** Predicate: `path = p`. */
  def pathEq(p: String): org.apache.parquet.filter2.predicate.FilterPredicate =
    FilterApi.eq(FilterApi.binaryColumn("path"), Binary.fromString(p))

  /** Predicate: `prefix <= path < prefix-successor` — the subtree
    * range (parquet binary comparison is unsigned lexicographic, which
    * matches Java String order on the ASCII paths this engine uses).
    */
  def pathRange(prefix: String): org.apache.parquet.filter2.predicate.FilterPredicate = {
    val lo = FilterApi.gtEq(FilterApi.binaryColumn("path"),
      Binary.fromString(prefix))
    // empty prefix (whole namespace) and a Char.MaxValue tail (no
    // successor — the range is unbounded above) both degrade to the
    // half-open lower bound instead of throwing/wrapping
    if (prefix.isEmpty || prefix.last == Char.MaxValue) lo
    else FilterApi.and(lo,
      FilterApi.lt(FilterApi.binaryColumn("path"),
        Binary.fromString(prefix.init + (prefix.last + 1).toChar)))
  }

  private def optString(g: Group, field: String): String =
    if (g.getFieldRepetitionCount(field) == 0) null else g.getString(field, 0)

  /** Spark's physical timestamp forms: INT96 (julian day + nanos, the
    * legacy default) and INT64 with a TIMESTAMP logical annotation
    * whose UNIT is inspected, not assumed — a state written under
    * `spark.sql.parquet.outputTimestampType=TIMESTAMP_MILLIS` carries
    * MILLIS and dividing it by 1000 would silently shrink every mtime
    * 1000× (the r16 ADVICE gap).
    */
  private def readMtime(g: Group): java.sql.Timestamp = {
    if (g.getFieldRepetitionCount("mtime") == 0)
      return new java.sql.Timestamp(0L)
    val prim = g.getType.getType("mtime").asPrimitiveType()
    val millis = prim.getPrimitiveTypeName.name() match {
      case "INT96" =>
        val b = g.getInt96("mtime", 0).getBytes // little-endian nanos, julian day
        val buf = java.nio.ByteBuffer.wrap(b)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val nanos = buf.getLong
        val julian = buf.getInt
        (julian - 2440588).toLong * 86400000L + nanos / 1000000L
      case "INT64" =>
        val v = g.getLong("mtime", 0)
        prim.getLogicalTypeAnnotation match {
          case ts: org.apache.parquet.schema.LogicalTypeAnnotation
                .TimestampLogicalTypeAnnotation =>
            ts.getUnit match {
              case org.apache.parquet.schema.LogicalTypeAnnotation
                    .TimeUnit.MILLIS => v
              case org.apache.parquet.schema.LogicalTypeAnnotation
                    .TimeUnit.MICROS => v / 1000L
              case org.apache.parquet.schema.LogicalTypeAnnotation
                    .TimeUnit.NANOS => v / 1000000L
            }
          case _ => v / 1000L // unannotated INT64: Spark's MICROS default
        }
      case other => sys.error(s"unsupported mtime physical type $other")
    }
    new java.sql.Timestamp(millis)
  }

  /** One element of a Spark 3-level LIST group: list[i].element. */
  private def listElements(g: Group, field: String): Seq[Group] = {
    if (g.getFieldRepetitionCount(field) == 0) return null
    val lst = g.getGroup(field, 0)
    (0 until lst.getFieldRepetitionCount("list")).map { i =>
      lst.getGroup("list", i).getGroup("element", 0)
    }
  }

  private def inodeOf(g: Group): Inode = {
    val blocks = Option(listElements(g, "blocks")).map(_.map { b =>
      val subs = Option(listElements(b, "subBlocks"))
        .map(_.map(s => SubBlockMeta(s.getString("id", 0),
          s.getLong("offset", 0), s.getLong("length", 0))))
        .getOrElse(Seq.empty)
      BlockMeta(b.getString("id", 0), b.getLong("offset", 0),
        b.getLong("length", 0), subs)
    }).orNull
    Inode(
      g.getString("path", 0),
      optString(g, "parentPath"),
      optString(g, "user"),
      optString(g, "group"),
      g.getInteger("permission", 0),
      g.getBoolean("isDir", 0),
      readMtime(g),
      blocks)
  }

  /** One file's ONE block, reassembled in subblock order, fetched with
    * `path = savedPath AND block_id = blockId` pushed into the reader —
    * row groups whose (path, block_id) statistics exclude the key are
    * skipped without decoding (the save layout sorts on exactly these
    * columns). Returns empty when the block has no rows.
    */
  def readBlock(chunksDir: String, savedPath: String,
                blockId: Long): Array[Byte] = {
    val pred = FilterApi.and(
      FilterApi.eq(FilterApi.binaryColumn("path"),
        Binary.fromString(savedPath)),
      FilterApi.eq(FilterApi.intColumn("block_id"),
        java.lang.Integer.valueOf(blockId.toInt)))
    val rows = Seq.newBuilder[(Int, Array[Byte])]
    parquetFiles(chunksDir).foreach { f =>
      val reader = ParquetReader
        .builder(new GroupReadSupport(), new org.apache.hadoop.fs.Path(f))
        .withConf(hconf())
        .withFilter(FilterCompat.get(pred))
        .build()
      try {
        var g = reader.read()
        while (g != null) {
          rows += ((g.getInteger("sub_id", 0),
            g.getBinary("data", 0).getBytes))
          g = reader.read()
        }
      } finally reader.close()
    }
    val ordered = rows.result().sortBy(_._1)
    val total = ordered.iterator.map(_._2.length).sum
    val out = new Array[Byte](total)
    var at = 0
    ordered.foreach { case (_, d) =>
      System.arraycopy(d, 0, out, at, d.length); at += d.length
    }
    out
  }
}
