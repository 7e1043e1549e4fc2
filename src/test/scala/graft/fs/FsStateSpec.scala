package graft.fs

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.must.Matchers

import graft.TestSpark
import graft.catalog.CatalogBuilder

/** The compacting state cell: plan depth stays bounded across many
  * mutations, content survives compaction, and superseded checkpoints
  * are released without breaking the live snapshot.
  */
class FsStateSpec extends AnyFlatSpec with Matchers {
  private lazy val spark = TestSpark.spark

  private def oneFile(path: String, payload: String) = {
    val df = spark.createDataFrame(java.util.Arrays.asList(
      org.apache.spark.sql.Row(path, payload.getBytes)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("data",
          org.apache.spark.sql.types.BinaryType))))
    DataPlane.chunk(df, 4, 8)
  }

  private def emptyFs() = GraftFs(
    CatalogBuilder.fromEntries(spark, Seq(("/", true, 0L))),
    oneFile("/seed", "").filter(lit(false)))

  it must "flatten the plan at the compaction boundary and keep content identical" in {
    val cell = new FsState(emptyFs(), compactEvery = 4)
    (1 to 10).foreach { i =>
      val fs = cell.get
      cell.set(GraftFs(
        fs.catalog.touchz(s"/f$i"),
        fs.chunks.unionByName(oneFile(s"/f$i", s"payload-$i"))))
    }
    // 10 mutations, compactEvery=4 → compacted at 4 and 8; two deltas
    // since — the chunk plan holds one checkpoint leaf + 2 unions, not
    // a 10-union chain
    val leaves = cell.get.chunks.queryExecution.analyzed.collectLeaves()
    leaves.size must be <= 3
    leaves.count(_.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]) must be(1)
    // content unaffected: every payload reads back through the compacted plan
    (1 to 10).foreach { i =>
      val bytes = DataPlane.cat(cell.get.chunks, s"/f$i").collect()(0)
        .getAs[Array[Byte]]("data")
      new String(bytes) must be(s"payload-$i")
      cell.get.catalog.exists(s"/f$i") must be(true)
    }
    // forced compaction releases the previous checkpoint and still reads
    cell.compactNow()
    cell.compactNow() // second release path (prev checkpoint present)
    new String(DataPlane.cat(cell.get.chunks, "/f7").collect()(0)
      .getAs[Array[Byte]]("data")) must be("payload-7")
  }
}
