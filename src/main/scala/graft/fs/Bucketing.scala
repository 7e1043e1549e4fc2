package graft.fs

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed warehouse writes — the co-located-join path for the joins
  * that repeat at 100 TB: both sides bucketed (and sorted) on the join
  * key land pre-partitioned on disk, so the sort-merge join needs NO
  * exchange and no sort at read time. This is the "pre-partition the
  * fact tables once, join free forever after" posture the builder brief
  * calls for; BucketingSpec asserts the exchange-free plan.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
