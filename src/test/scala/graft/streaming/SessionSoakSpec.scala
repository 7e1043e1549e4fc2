package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.must.Matchers

import graft.TestSpark

/** Long-lived-session flatness — the in-process analog of the bench
  * guard's driver-side evidence (r12 verdict #8): a production engine
  * session serves a mixed workload for hours, so per-iteration cost
  * over a representative mix must stay FLAT. Each iteration runs a
  * 10-op mix spanning the hot families (text analysis, quality
  * gating, LSH pair generation + components, BM25, and a fresh
  * STATEFUL streaming drain — the very shape whose leaked listener
  * buses inflated earlier rounds' suites). Assertions: (1) the median
  * of the last iterations stays within band of the first post-warmup
  * ones; (2) the LiveListenerBus stays listener-flat (the r13 leak
  * fix holds under sustained use); (3) no iteration fails.
  */
class SessionSoakSpec extends AnyFlatSpec with Matchers {
  private lazy val spark = TestSpark.spark

  private def busCount(): Int = {
    val sc = spark.sparkContext
    val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
    val m = bus.getClass.getMethods.find(m =>
      m.getName == "listeners" && m.getParameterCount == 0).get
    import scala.jdk.CollectionConverters._
    m.invoke(bus).asInstanceOf[java.util.List[_]].asScala
      .count(_.getClass.getName.endsWith("StreamingQueryListenerBus"))
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted; s((s.size - 1) / 2)
  }

  behavior of "a long-lived session under a mixed 10-op soak"

  it must "hold per-iteration time and listener count flat across 12 iterations" taggedAs graft.SlowTest in {
    val s = spark
    import s.implicits._
    val sfDir = java.nio.file.Files.createTempDirectory("graft-soak-sf").toString
    try {
      val words = Seq("the", "quick", "brown", "fox", "jumps", "over",
        "lazy", "dog", "and", "a", "of", "to", "in", "is", "it", "data")
      val docs = (0L until 240L).map { i =>
        val r = new scala.util.Random(i)
        val t = (0 until (20 + (i % 40)).toInt)
          .map(_ => words(r.nextInt(words.length))).mkString(" ")
        (i, t, if (i % 2 == 0) "en" else "de", s"src${i % 3}",
          t.length.toLong)
      }
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(2).write.mode("overwrite")
        .parquet(s"$sfDir/documents.parquet")

      // one throwaway pass so file listing / codegen of the mix is
      // warm before iteration 1 is measured
      graft.ops.TextAnalysis.quality(
        spark.read.parquet(s"$sfDir/documents.parquet")).count()
      spark.streams.active
      EventsStream.reapLeakedListenerBuses(spark)
      val busBase = busCount()

      val iters = 12
      val times = (1 to iters).map { it =>
        val t0 = System.nanoTime()
        val d = spark.read.parquet(s"$sfDir/documents.parquet")
        graft.ops.TextAnalysis.quality(d).count()
        graft.ops.TextAnalysis.langId(d).count()
        graft.ops.TextAnalysis.tfidf(d, k = 2).count()
        graft.ops.TextAnalysis.redactPii(d).count()
        graft.ops.TextAnalysis.bm25(d, Seq("quick", "data")).count()
        graft.ops.Curation.qualityFilter(d).count()
        graft.ops.Curation.chunkWithOverlap(d, 8, 4).count()
        val pairs = graft.ops.Dedup.minhashPairs(d)
        graft.ops.Dedup.components(pairs).count()
        // fresh stateful streaming run each iteration — the leak shape
        val ckpt = java.nio.file.Files.createTempDirectory(s"graft-soak-ck$it")
        val q = spark.readStream
          .schema(EventsStream.documentsSchema)
          .parquet(s"$sfDir/documents.parquet")
          .groupBy(col("lang")).count()
          .writeStream.format("memory").queryName(s"soak_agg_$it")
          .option("checkpointLocation", ckpt.toString)
          .outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        graft.PlanHygiene.deleteRecursively(ckpt)
        EventsStream.reapLeakedListenerBuses(spark) // the drains' hygiene
        graft.PlanHygiene.sweepPersisted(spark)
        (System.nanoTime() - t0) / 1e9
      }
      info("soak iterations (s): " +
        times.map(t => f"$t%.2f").mkString(" "))

      // (1) flatness: the tail must not drift above the head's band.
      // Median-vs-median with a 2x + 1 s allowance — wide enough for
      // box weather on single iterations, narrow enough that the
      // pre-fix leak shape (monotone growth to 2.6-12x) fails hard.
      val head = times.slice(1, 4) // drop iteration 1 (residual warmup)
      val tail = times.takeRight(3)
      withClue(s"head median ${median(head)} vs tail median ${median(tail)}: ") {
        median(tail) must be <= (2.0 * median(head) + 1.0)
      }
      // (2) the listener bus ends exactly where it started
      busCount() must be(busBase)
    } finally {
      graft.PlanHygiene.deleteRecursively(java.nio.file.Paths.get(sfDir))
    }
  }
}
