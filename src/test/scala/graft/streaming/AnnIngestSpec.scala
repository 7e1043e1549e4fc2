package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.must.Matchers

import graft.TestSpark
import graft.ops.Similarity

/** The streaming ANN-index ingest drain: the merged (history ∪ streamed
  * batches) index must carry EXACTLY the batch-built assignment set, and
  * the increment must really arrive over multiple micro-batches (each
  * committing its own idempotent batch=<id> partition).
  */
class AnnIngestSpec extends AnyFlatSpec with Matchers {
  private lazy val spark = TestSpark.spark

  it must "merge streamed batch partitions into the exact batch-built index" in {
    val sfDir = Files.createTempDirectory("graft-annstream-sf").toString
    try {
      val s = spark
      import s.implicits._
      // deterministic 60×4 corpus — enough for 16 centroids + a 6-vector
      // increment split over 3 range chunks
      (0L until 60L).map { i =>
        (i, Array.tabulate(4)(d =>
          math.sin(i * 7 + d * 3).toFloat), (i % 3).toInt)
      }.toDF("vec_id", "embedding", "label")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$sfDir/embeddings.parquet")

      val emb = graft.Tables.embeddings(spark, sfDir)
      val hist = emb.filter(col("vec_id") % 10 =!= 0)
      val cents = Similarity.kmeansCentroids(hist, 16, 3)
      val merged = EventsStream.annIngestAvailableNow(spark, sfDir)

      // content equality: streamed-ingest index == from-scratch build
      val got = merged.select(col("vec_id"), col("bucket"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = Similarity.assignBuckets(emb, cents)
        .select(col("vec_id"), col("bucket"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got must be(want)
      got.size must be(60)

      // the ingest really ran as multiple micro-batches: the history
      // partition plus ≥2 streamed batch=<id> partitions
      val parts = merged.withColumn("f", input_file_name())
        .select(regexp_extract(col("f"), "batch=([^/]+)", 1).as("b"))
        .distinct().collect().map(_.getString(0)).toSet
      parts must contain("hist")
      (parts - "hist").size must be >= 2
    } finally {
      graft.PlanHygiene.deleteRecursively(java.nio.file.Paths.get(sfDir))
    }
  }
}
