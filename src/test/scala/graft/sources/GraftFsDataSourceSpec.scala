package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, StringStartsWith}
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.must.Matchers

import graft.TestSpark

class GraftFsDataSourceSpec extends AnyFlatSpec with Matchers {
  private lazy val spark = TestSpark.spark

  private def load() =
    spark.read.format("graft.sources.GraftFsDataSource")
      .option("dirs", 8).option("files_per_dir", 10).load()

  behavior of "GraftFsDataSource (DataSourceV2)"

  it must "serve the full deterministic tree" in {
    val df = load()
    df.count() must be(8L * 11) // 10 files + 1 dir row per directory
    df.filter(col("is_dir")).count() must be(8L)
    df.filter(col("path") === "/gen/dir3/file4").collect()(0)
      .getAs[Long]("len") must be((3 * 31 + 4) % 1000L)
  }

  it must "prune partitions from pushed path predicates" in {
    val sb = new GraftFsScanBuilder(8, 10)
    sb.pushFilters(Array(EqualTo("parent_path", "/gen/dir7")))
    sb.build().toBatch.planInputPartitions().length must be(1)

    val sb2 = new GraftFsScanBuilder(8, 10)
    sb2.pushFilters(Array(StringStartsWith("path", "/gen/dir2/")))
    sb2.build().toBatch.planInputPartitions().length must be(1)

    val sb3 = new GraftFsScanBuilder(8, 10)
    sb3.pushFilters(Array.empty)
    sb3.build().toBatch.planInputPartitions().length must be(8)
  }

  it must "attach hash-ring locality hints per partition (A10 analog)" in {
    val parts = new GraftFsScan(8, 10, Array.empty).planInputPartitions()
    parts.map(_.preferredLocations().head).toSeq must be(
      (0 until 8).map(i => s"node-${i % 3}"))
  }

  it must "answer filtered aggregates correctly through the V2 read path" in {
    val out = load()
      .filter(col("parent_path") === "/gen/dir7" && !col("is_dir"))
      .agg(count(lit(1)), sum(col("len"))).collect()(0)
    out.getLong(0) must be(10L)
    out.getLong(1) must be((0 until 10).map(j => (7 * 31 + j) % 1000).sum.toLong)
  }
}
