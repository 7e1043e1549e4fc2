package graft.fs

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.schema.{MessageType, MessageTypeParser}

import graft.catalog.Inode

/** SESSION-FREE writers of the persisted filesystem-state layout — the
  * mutation-side twin of [[SavedState]]'s readers: any JVM (no
  * SparkSession, no driver) can append a catalog or chunk parquet file
  * that Spark (`GraftShellMain.loadFs`), the pruned [[SavedState]]
  * readers, and DuckDB all read back identically.
  *
  * Why this exists: the reference's store is DIRECTLY writable by any
  * client — every SnackFS consumer runs its own mutations as Cassandra
  * batch mutates with no coordinator process (reference
  * ThriftStore.scala:281-385). The Spark-native analog for the
  * persisted state is that the layout is PLAIN PARQUET with a fixed
  * schema: writing one inode row or one file's chunk rows needs the
  * stock parquet-hadoop writer, nothing else. [[SharedStateStore]]
  * composes these writers with the cross-process create-lock protocol
  * to give N independent driver JVMs a single live namespace.
  *
  * Schema parity: the message types below mirror what Spark's parquet
  * writer emits for the `Inode` dataset (3-level LIST groups named
  * `list`/`element` — exactly what [[SavedState.listElements]] walks)
  * and for `DataPlane.chunk` rows. Timestamps are written INT64
  * TIMESTAMP(MILLIS) — a unit [[SavedState.readMtime]] inspects from
  * the logical annotation, and Spark reads natively.
  *
  * Stats anchoring: callers pass rows PRE-SORTED on the lookup key
  * (`path` for catalogs, `(path, block_id, sub_id)` for chunks) so
  * parquet row-group min/max statistics keep the same point/range
  * pruning contract `FsCatalog.save` and `GraftShellMain.saveFs`
  * establish for the Spark-written files.
  */
object SavedStateWriter {

  private val catalogSchema: MessageType = MessageTypeParser.parseMessageType(
    """message spark_schema {
      |  optional binary path (UTF8);
      |  optional binary parentPath (UTF8);
      |  optional binary user (UTF8);
      |  optional binary group (UTF8);
      |  optional int32 permission;
      |  optional boolean isDir;
      |  optional int64 mtime (TIMESTAMP(MILLIS,true));
      |  optional group blocks (LIST) {
      |    repeated group list {
      |      optional group element {
      |        optional binary id (UTF8);
      |        optional int64 offset;
      |        optional int64 length;
      |        optional group subBlocks (LIST) {
      |          repeated group list {
      |            optional group element {
      |              optional binary id (UTF8);
      |              optional int64 offset;
      |              optional int64 length;
      |            }
      |          }
      |        }
      |      }
      |    }
      |  }
      |}""".stripMargin)

  private val chunksSchema: MessageType = MessageTypeParser.parseMessageType(
    """message spark_schema {
      |  optional binary path (UTF8);
      |  optional int32 block_id;
      |  optional int32 sub_id;
      |  optional int64 block_offset;
      |  optional int64 offset;
      |  optional binary data;
      |  optional int64 length;
      |}""".stripMargin)

  private def writer(file: String, schema: MessageType) = {
    val conf = new Configuration(false)
    org.apache.parquet.hadoop.example.GroupWriteSupport
      .setSchema(schema, conf)
    ExampleParquetWriter.builder(
        org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
          new org.apache.hadoop.fs.Path(file), conf))
      .withConf(conf)
      .withType(schema)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
  }

  /** Write inodes (caller-sorted by path) as ONE parquet file. */
  def writeCatalogFile(file: String, inodes: Seq[Inode]): Unit = {
    val f = new SimpleGroupFactory(catalogSchema)
    val w = writer(file, catalogSchema)
    try inodes.foreach { n =>
      val g = f.newGroup()
      g.add("path", n.path)
      if (n.parentPath != null) g.add("parentPath", n.parentPath)
      if (n.user != null) g.add("user", n.user)
      if (n.group != null) g.add("group", n.group)
      g.add("permission", n.permission)
      g.add("isDir", n.isDir)
      if (n.mtime != null) g.add("mtime", n.mtime.getTime)
      if (n.blocks != null) {
        val blocks = g.addGroup("blocks")
        n.blocks.foreach { b =>
          val e = blocks.addGroup("list").addGroup("element")
          e.add("id", b.id)
          e.add("offset", b.offset)
          e.add("length", b.length)
          if (b.subBlocks != null) {
            val subs = e.addGroup("subBlocks")
            b.subBlocks.foreach { s =>
              val se = subs.addGroup("list").addGroup("element")
              se.add("id", s.id)
              se.add("offset", s.offset)
              se.add("length", s.length)
            }
          }
        }
      }
      w.write(g)
    } finally w.close()
  }

  /** One subblock row of the chunk plane (DataPlane.chunk's shape). */
  final case class ChunkRow(path: String, blockId: Int, subId: Int,
                            blockOffset: Long, offset: Long,
                            data: Array[Byte])

  /** Slice a payload into subblock rows with DataPlane.chunk's exact
    * geometry (zero-length files yield zero rows — the reference
    * stores none), so a writer-produced chunk table is
    * row-for-row what the Spark chunker would have emitted.
    */
  def chunkRows(path: String, data: Array[Byte], subBlockSize: Int,
                blockSize: Int): Seq[ChunkRow] = {
    require(subBlockSize > 0 && blockSize % subBlockSize == 0,
      "blockSize must be a positive multiple of subBlockSize")
    val sbPerBlock = blockSize / subBlockSize
    val nSb = (data.length + subBlockSize - 1) / subBlockSize
    (0 until nSb).map { i =>
      val from = i * subBlockSize
      val until = math.min(data.length, from + subBlockSize)
      ChunkRow(path, i / sbPerBlock, i % sbPerBlock,
        (i / sbPerBlock).toLong * blockSize,
        (i % sbPerBlock).toLong * subBlockSize,
        java.util.Arrays.copyOfRange(data, from, until))
    }
  }

  /** Write chunk rows (caller-sorted by (path, block_id, sub_id)) as
    * ONE parquet file.
    */
  def writeChunksFile(file: String, rows: Seq[ChunkRow]): Unit = {
    val f = new SimpleGroupFactory(chunksSchema)
    val w = writer(file, chunksSchema)
    try rows.foreach { r =>
      val g = f.newGroup()
      g.add("path", r.path)
      g.add("block_id", r.blockId)
      g.add("sub_id", r.subId)
      g.add("block_offset", r.blockOffset)
      g.add("offset", r.offset)
      g.add("data", org.apache.parquet.io.api.Binary.fromConstantByteArray(r.data))
      g.add("length", r.data.length.toLong)
      w.write(g)
    } finally w.close()
  }

  /** Read every chunk row of one path from a chunks-layout file/dir —
    * the delta-side payload read (deltas are single small files; the
    * BASE plane keeps using [[SavedState.readBlock]]'s block-pruned
    * point reads).
    */
  def readPayload(chunksDir: String, path: String): Array[Byte] = {
    import org.apache.parquet.filter2.compat.FilterCompat
    import org.apache.parquet.filter2.predicate.FilterApi
    import org.apache.parquet.hadoop.ParquetReader
    import org.apache.parquet.hadoop.example.GroupReadSupport
    val pred = FilterApi.eq(FilterApi.binaryColumn("path"),
      org.apache.parquet.io.api.Binary.fromString(path))
    val rows = Seq.newBuilder[(Long, Array[Byte])]
    val files = {
      val p = java.nio.file.Paths.get(chunksDir)
      if (java.nio.file.Files.isDirectory(p)) {
        val l = java.nio.file.Files.list(p)
        try l.iterator().asScala.map(_.toString)
          .filter(f => f.endsWith(".parquet")).toSeq.sorted
        finally l.close()
      } else if (java.nio.file.Files.exists(p)) Seq(chunksDir)
      else Seq.empty
    }
    files.foreach { file =>
      val reader = ParquetReader
        .builder(new GroupReadSupport(),
          new org.apache.hadoop.fs.Path(file))
        .withConf(new Configuration(false))
        .withFilter(FilterCompat.get(pred))
        .build()
      try {
        var g = reader.read()
        while (g != null) {
          rows += ((g.getLong("block_offset", 0) + g.getLong("offset", 0),
            g.getBinary("data", 0).getBytes))
          g = reader.read()
        }
      } finally reader.close()
    }
    val ordered = rows.result().sortBy(_._1)
    val out = new Array[Byte](ordered.iterator.map(_._2.length).sum)
    var at = 0
    ordered.foreach { case (_, d) =>
      System.arraycopy(d, 0, out, at, d.length); at += d.length
    }
    out
  }
}
