package graft.fs

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.must.Matchers

import graft.TestSpark

/** Proves the co-located join: two tables bucketed on the join key
  * sort-merge-join with NO shuffle exchange in the physical plan.
  */
class BucketingSpec extends AnyFlatSpec with Matchers {
  private lazy val spark = TestSpark.spark

  behavior of "bucketed co-located join"

  it must "join bucketed tables without a shuffle exchange" in {
    val s = spark
    import s.implicits._
    val left = (0L until 1000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (0L until 1000L).map(i => (i, i * 2)).toDF("k", "rv")
    Bucketing.writeBucketed(left, "bk_left", "k", 4)
    Bucketing.writeBucketed(right, "bk_right", "k", 4)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = Bucketing.readTable(spark, "bk_left")
        .join(Bucketing.readTable(spark, "bk_right"), "k")
      joined.count() must be(1000L)
      val plan = joined.queryExecution.executedPlan.toString
      plan must include("SortMergeJoin")
      plan must not include "Exchange hashpartitioning"
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bk_left")
      spark.sql("DROP TABLE IF EXISTS bk_right")
    }
  }
}
