package graft.catalog

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Builders for catalog instances.
  *
  * `fromPart` derives a deterministic filesystem tree from the `part`
  * table entirely with distributed expressions (no driver loop), so the
  * DuckDB oracle can reproduce every catalog query from the same parquet:
  *
  *   /pt                         directory
  *   /pt/<p_brand>               directory per distinct brand
  *   /pt/<p_brand>/part_<key>    file of length p_size, one block with
  *                               one subblock (real nested metadata, so
  *                               the HOF folds in FsCatalog run against
  *                               genuinely nested data)
  */
object CatalogBuilder {

  private val epoch = new Timestamp(1704067200000L)

  def fromPart(spark: SparkSession, sfDir: String): FsCatalog = {
    import spark.implicits._
    val part = Tables.part(spark, sfDir)

    val files = part
      .select(
        concat(lit("/pt/"), col("p_brand"), lit("/part_"), col("p_partkey")).as("path"),
        concat(lit("/pt/"), col("p_brand")).as("parentPath"),
        col("p_size").cast("long").as("len"))
      .select(
        col("path"),
        col("parentPath"),
        lit("graft").as("user"),
        lit("graft").as("group"),
        lit(420).as("permission"),
        lit(false).as("isDir"),
        lit(epoch).as("mtime"),
        array(struct(
          md5(col("path")).as("id"),
          lit(0L).as("offset"),
          col("len").as("length"),
          array(struct(
            md5(concat(col("path"), lit("#0"))).as("id"),
            lit(0L).as("offset"),
            col("len").as("length"))).as("subBlocks"))).as("blocks"))

    val blocksType = files.schema("blocks").dataType
    val dirs = part
      .select(concat(lit("/pt/"), col("p_brand")).as("path")).distinct()
      .select(
        col("path"),
        lit("/pt").as("parentPath"),
        lit("graft").as("user"),
        lit("graft").as("group"),
        lit(493).as("permission"),
        lit(true).as("isDir"),
        lit(epoch).as("mtime"),
        lit(null).cast(blocksType).as("blocks"))

    val roots = Seq(("/", null: String), ("/pt", "/"))
      .map { case (p, par) => FsCatalog.dirInode(p, "graft").copy(parentPath = par) }

    FsCatalog(
      files.as[Inode]
        .unionByName(dirs.as[Inode])
        .unionByName(spark.createDataset(roots)))
  }

  /** Filesystem tree over `documents`, matching DataPlaneQueries' chunked
    * payloads: /docs/g<doc_id % 4>/doc_<zero-padded id>, len =
    * octet_length(text). Gives GraftFs a tree with deletable subtrees
    * whose expected state DuckDB can reproduce from the same parquet.
    *
    * Block metadata uses the SAME (subBlockSize, blockSize) geometry as
    * the chunk rows it gets paired with (DataPlaneQueries uses 64/256),
    * so catalog blocks and data-plane chunks agree on counts, offsets
    * and lengths — a query joining the two planes sees one story.
    */
  def fromDocuments(spark: SparkSession, sfDir: String,
                    subBlockSize: Int = 64, blockSize: Int = 256): FsCatalog = {
    import spark.implicits._
    require(subBlockSize > 0 && blockSize % subBlockSize == 0,
      "blockSize must be a positive multiple of subBlockSize")
    val docs = Tables.documents(spark, sfDir)

    val blocksExpr = expr(
      s"""transform(sequence(0, CAST(ceil(len / CAST($blockSize AS DOUBLE)) AS INT) - 1),
         |  b -> struct(
         |    md5(concat(path, '#', b)) AS id,
         |    CAST(b * $blockSize AS BIGINT) AS offset,
         |    CAST(least($blockSize, len - b * $blockSize) AS BIGINT) AS length,
         |    transform(
         |      sequence(0, CAST(ceil(least($blockSize, len - b * $blockSize)
         |                            / CAST($subBlockSize AS DOUBLE)) AS INT) - 1),
         |      s -> struct(
         |        md5(concat(path, '#', b, '#', s)) AS id,
         |        CAST(s * $subBlockSize AS BIGINT) AS offset,
         |        CAST(least($subBlockSize,
         |                   least($blockSize, len - b * $blockSize)
         |                     - s * $subBlockSize) AS BIGINT) AS length))
         |      AS subBlocks))""".stripMargin)
    val emptyBlocks = expr(
      """CAST(array() AS ARRAY<STRUCT<id:STRING, offset:BIGINT, length:BIGINT,
        |  subBlocks:ARRAY<STRUCT<id:STRING, offset:BIGINT, length:BIGINT>>>>)""".stripMargin)

    val files = docs
      .select(
        concat(lit("/docs/g"), (col("doc_id") % 4).cast("string"),
          lit("/doc_"), lpad(col("doc_id").cast("string"), 8, "0")).as("path"),
        concat(lit("/docs/g"), (col("doc_id") % 4).cast("string")).as("parentPath"),
        octet_length(col("text")).cast("long").as("len"))
      .select(
        col("path"),
        col("parentPath"),
        lit("graft").as("user"),
        lit("graft").as("group"),
        lit(420).as("permission"),
        lit(false).as("isDir"),
        lit(epoch).as("mtime"),
        when(col("len") > 0, blocksExpr).otherwise(emptyBlocks).as("blocks"))

    val roots = (Seq(("/", null: String), ("/docs", "/")) ++
      (0 to 3).map(g => (s"/docs/g$g", "/docs")))
      .map { case (p, par) => FsCatalog.dirInode(p, "graft").copy(parentPath = par) }

    FsCatalog(files.as[Inode].unionByName(spark.createDataset(roots)))
  }

  /** Small literal trees for unit tests: (path, isDir, length). Files get
    * two blocks when length is even enough to split — exercises the
    * multi-block folds.
    */
  def fromEntries(spark: SparkSession, entries: Seq[(String, Boolean, Long)]): FsCatalog = {
    import spark.implicits._
    val inodes = entries.map { case (path, isDir, len) =>
      if (isDir) FsCatalog.dirInode(path, "graft")
      else {
        val half = len / 2
        val blocks =
          if (len == 0) Seq.empty[BlockMeta]
          else if (half == 0) Seq(BlockMeta(s"$path#b0", 0L, len,
            Seq(SubBlockMeta(s"$path#b0s0", 0L, len))))
          else Seq(
            BlockMeta(s"$path#b0", 0L, half, Seq(SubBlockMeta(s"$path#b0s0", 0L, half))),
            BlockMeta(s"$path#b1", half, len - half,
              Seq(SubBlockMeta(s"$path#b1s0", 0L, len - half))))
        Inode(path, PathOps.parent(path), "graft", "graft", 420,
          isDir = false, epoch, blocks)
      }
    }
    FsCatalog(spark.createDataset(inodes))
  }
}
