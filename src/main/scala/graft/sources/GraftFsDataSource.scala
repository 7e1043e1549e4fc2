package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector for a deterministic generated inode tree —
  * the reference's locality surface (A10/B11: block → Cassandra ring
  * token → replica endpoints, ThriftStore.scala:543-605) re-expressed
  * the Spark-native way:
  *
  *  - one `InputPartition` per directory, with
  *    `preferredLocations = node-(dir % 3)` — the scheduler places tasks
  *    near the owning "replica" exactly as the reference's
  *    getFileBlockLocations hints do;
  *  - `SupportsPushDownFilters`: `path`/`parent_path` equality and
  *    prefix filters PRUNE partitions at planning time (the reference's
  *    secondary-index scan, done by not even planning the other splits).
  *    Filters are conservatively left in the post-scan plan too, so
  *    correctness never depends on connector pruning.
  *
  * Usage:
  *   spark.read.format("graft.sources.GraftFsDataSource")
  *     .option("dirs", 32).option("files_per_dir", 100).load()
  *
  * Tree shape: /gen/dir<i>/file<j>, i < dirs, j < files_per_dir,
  * len = (i*31 + j) % 1000; plus one dir row per directory.
  */
class GraftFsDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftFsDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new GraftFsTable(
      properties.getOrDefault("dirs", "32").toInt,
      properties.getOrDefault("files_per_dir", "100").toInt)
}

object GraftFsDataSource {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("parent_path", StringType, nullable = false),
    StructField("is_dir", BooleanType, nullable = false),
    StructField("len", LongType, nullable = false)))
}

class GraftFsTable(dirs: Int, filesPerDir: Int) extends Table with SupportsRead {
  override def name(): String = s"graftfs($dirs x $filesPerDir)"
  override def schema(): StructType = GraftFsDataSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftFsScanBuilder(dirs, filesPerDir)
}

class GraftFsScanBuilder(dirs: Int, filesPerDir: Int)
    extends ScanBuilder with SupportsPushDownFilters {
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case EqualTo("path", _) | EqualTo("parent_path", _) => true
      case StringStartsWith("path", _) | StringStartsWith("parent_path", _) => true
      case _ => false
    }
    // return ALL filters as residual: Spark re-evaluates them post-scan,
    // so pruning is purely an optimization, never a correctness dependency
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new GraftFsScan(dirs, filesPerDir, pushed)
}

class GraftFsScan(dirs: Int, filesPerDir: Int, pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = GraftFsDataSource.schema
  override def toBatch: Batch = this

  /** Partition pruning from pushed path predicates: a dir partition
    * survives only if some pushed filter could match paths under it.
    */
  private def dirSurvives(i: Int): Boolean = {
    val dirPath = s"/gen/dir$i"
    if (pushed.isEmpty) true
    else pushed.forall {
      case EqualTo("path", v: String) =>
        v == dirPath || v.startsWith(dirPath + "/")
      case EqualTo("parent_path", v: String) =>
        v == dirPath || v == "/gen"
      case StringStartsWith("path", p: String) =>
        dirPath.startsWith(p) || (dirPath + "/").startsWith(p) || p.startsWith(dirPath + "/")
      case StringStartsWith("parent_path", p: String) =>
        dirPath.startsWith(p) || "/gen".startsWith(p)
      case _ => true
    }
  }

  override def planInputPartitions(): Array[InputPartition] =
    (0 until dirs).filter(dirSurvives)
      .map(i => GraftFsPartition(i, filesPerDir): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftFsReaderFactory
}

/** One directory per partition; locality hint = the hash-ring owner. */
case class GraftFsPartition(dir: Int, filesPerDir: Int) extends InputPartition {
  override def preferredLocations(): Array[String] = Array(s"node-${dir % 3}")
}

class GraftFsReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GraftFsPartition]
    new PartitionReader[InternalRow] {
      // row -1 is the directory inode itself; 0..filesPerDir-1 the files
      private var j = -2

      override def next(): Boolean = { j += 1; j < gp.filesPerDir }

      override def get(): InternalRow = {
        val dirPath = s"/gen/dir${gp.dir}"
        if (j == -1)
          InternalRow(UTF8String.fromString(dirPath),
            UTF8String.fromString("/gen"), true, 0L)
        else
          InternalRow(UTF8String.fromString(s"$dirPath/file$j"),
            UTF8String.fromString(dirPath), false,
            ((gp.dir * 31 + j) % 1000).toLong)
      }

      override def close(): Unit = ()
    }
  }
}
