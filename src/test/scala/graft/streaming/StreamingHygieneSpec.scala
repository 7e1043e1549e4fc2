package graft.streaming

import org.apache.spark.sql.functions.col
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.must.Matchers

import graft.TestSpark

/** The measured mechanism behind the r12 "JVM-context inflation"
  * narrative, pinned: every STATEFUL streaming query run clones the
  * session, and the clone's StreamingQueryManager registers its own
  * StreamingQueryListenerBus on the shared LiveListenerBus — which
  * nothing removes when the clone dies. Measured in the r13 full-suite
  * bench: listener count 6 → 27 across the 13 streaming channels,
  * every leaked bus still processing every event while the text family
  * ran. This spec pins (1) the leak exists per stateful run, (2)
  * [[EventsStream.reapLeakedListenerBuses]] removes exactly the
  * orphans and keeps the root session's own bus, and (3) the drain
  * channels stay listener-flat end to end (drainHygiene runs in every
  * drain's finally).
  */
class StreamingHygieneSpec extends AnyFlatSpec with Matchers {
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

  behavior of "streaming listener-bus hygiene"

  it must "leak one listener bus per stateful run and reap all orphans" in {
    val s = spark
    import s.implicits._
    val sfDir = java.nio.file.Files.createTempDirectory("graft-leak-sf").toString
    try {
      Seq((1L, "the quick brown fox jumps over the lazy dog today", "en",
           "web", 50L),
          (2L, "ein kurzer text", "de", "web", 15L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$sfDir/documents.parquet")

      // force the root session's own bus into existence so the reap
      // baseline is stable (spark.streams registers it on first touch)
      spark.streams.active
      EventsStream.reapLeakedListenerBuses(spark)
      val base = busCount()
      base must be >= 1 // the root session's own bus survives reaps

      // three stateful runs, no hygiene: the leak is +1 per run
      for (i <- 1 to 3) {
        val ckpt = java.nio.file.Files.createTempDirectory(s"graft-leak-ck$i")
        val q = spark.readStream
          .schema(EventsStream.documentsSchema)
          .parquet(s"$sfDir/documents.parquet")
          .groupBy(col("lang")).count()
          .writeStream.format("memory").queryName(s"leak_stateful_$i")
          .option("checkpointLocation", ckpt.toString)
          .outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        graft.PlanHygiene.deleteRecursively(ckpt)
        withClue(s"after stateful run $i: ") { busCount() must be(base + i) }
      }

      // the reap removes exactly the three orphans, never the root bus
      EventsStream.reapLeakedListenerBuses(spark) must be(3)
      busCount() must be(base)
      EventsStream.reapLeakedListenerBuses(spark) must be(0)

      // the channels run hygiene themselves: a full drain (stateless
      // ingest serving three channels) ends listener-flat
      EventsStream.qualityFilterAvailableNow(spark, sfDir).count()
      EventsStream.qualityFilterFilesAvailableNow(spark, sfDir).count()
      busCount() must be(base)
    } finally {
      graft.PlanHygiene.deleteRecursively(java.nio.file.Paths.get(sfDir))
    }
  }
}
