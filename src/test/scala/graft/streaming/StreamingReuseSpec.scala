package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.must.Matchers

import graft.TestSpark
import graft.ops.TextAnalysis

/** The declarative pipeline ops are engine-agnostic: the SAME
  * TextAnalysis transform (stateless projections) runs unchanged over
  * readStream input — ingest-time quality filtering is just the batch
  * operator applied to a stream, no parallel implementation to keep in
  * sync (the Spark-first payoff the reference's imperative byte-stream
  * engine can't have).
  */
class StreamingReuseSpec extends AnyFlatSpec with Matchers {
  private lazy val spark = TestSpark.spark

  behavior of "batch transforms reused on streams"

  it must "produce identical quality rows in batch and streaming" in {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog. it is a fine day."),
      (2L, "x"),
      (3L, "words and words and words of it, to a point; mostly the same."))

    val batch = TextAnalysis.quality(docs.toDF("doc_id", "text"))
      .collect().map(_.toSeq).toSet

    val mem = MemoryStream[(Long, String)]
    val q = TextAnalysis.quality(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("quality_stream")
      .outputMode("append").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val stream = spark.table("quality_stream").collect().map(_.toSeq).toSet
      stream must be(batch)
    } finally q.stop()
  }
}
