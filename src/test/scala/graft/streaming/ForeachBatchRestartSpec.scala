package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.must.Matchers

import graft.TestSpark

/** The semantic gate's sink contract (EventsStream.semanticGate…):
  * foreachBatch writing each micro-batch to an OVERWRITTEN
  * `batch=<id>` partition dir is exactly-once ON REPLAY — the claim is
  * only real if a crash mid-batch followed by a resume from the same
  * checkpoint leaves the read-back equal to an uninterrupted run with
  * no duplicated and no lost rows. Same deterministic kill as
  * crashResumeFileSink: mtime-ordered chunk files, one per
  * micro-batch, the third byte-corrupted then repaired.
  */
class ForeachBatchRestartSpec extends AnyFlatSpec with Matchers {
  private lazy val spark = TestSpark.spark

  behavior of "idempotent foreachBatch partition-overwrite sink"

  it must "survive a mid-stream crash with no duplicate and no lost rows" in {
    val s = spark
    import s.implicits._
    val landing = Files.createTempDirectory("graft-febr-landing")
    val outDir = Files.createTempDirectory("graft-febr-out")
    val ckpt = Files.createTempDirectory("graft-febr-ckpt")
    try {
      // four mtime-ordered chunks, 25 rows each
      val base = System.currentTimeMillis() - 60000
      (0 until 4).foreach { c =>
        val stage = Files.createTempDirectory("graft-febr-stage")
        (c * 25 until (c + 1) * 25).map(i => (i.toLong, i * 2.0))
          .toDF("id", "v").coalesce(1)
          .write.mode("overwrite").parquet(stage.toString)
        val part = {
          val l = Files.list(stage)
          try {
            import scala.jdk.CollectionConverters._
            l.iterator().asScala
              .find(_.getFileName.toString.endsWith(".parquet")).get
          } finally l.close()
        }
        val dst = landing.resolve(f"chunk_$c%03d.parquet")
        Files.move(part, dst)
        Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(base + c * 2000L))
        graft.PlanHygiene.deleteRecursively(stage)
      }
      val victim = landing.resolve("chunk_002.parquet")
      val realBytes = Files.readAllBytes(victim)
      val vMtime = Files.getLastModifiedTime(victim)
      Files.write(victim, "GRAFT-INJECTED-CRASH".getBytes("UTF-8"))
      Files.setLastModifiedTime(victim, vMtime)

      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.DoubleType)))
      def runOnce(): Option[Throwable] = {
        var q: org.apache.spark.sql.streaming.StreamingQuery = null
        try {
          q = spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("ignoreCorruptFiles", "false")
            .parquet(landing.toString)
            .writeStream
            .option("checkpointLocation", ckpt.toString)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
                             batchId: Long) =>
              // the semantic-gate sink shape: keep a filtered slice and
              // OVERWRITE this batch's own partition dir (replay-safe)
              batch.filter(col("id") % 2 === 0)
                .write.mode("overwrite")
                .parquet(s"$outDir/batch=$batchId")
              ()
            }
            .start()
          q.awaitTermination()
          None
        } catch { case e: Throwable => Some(e) } finally {
          if (q != null && q.isActive) q.stop()
        }
      }

      // run 1 crashes at the corrupted chunk, AFTER committed batches
      runOnce().isDefined must be(true)
      val committedBefore = {
        val l = Files.list(outDir)
        try {
          import scala.jdk.CollectionConverters._
          l.iterator().asScala.count(_.getFileName.toString.startsWith("batch="))
        } finally l.close()
      }
      committedBefore must be >= 1
      committedBefore must be < 4

      // repair + resume from the SAME checkpoint: the aborted batch
      // replays into its own (overwritten) partition dir
      Files.write(victim, realBytes)
      Files.setLastModifiedTime(victim, vMtime)
      runOnce() must be(None)

      val got = spark.read.parquet(outDir.toString)
        .select(col("id")).as[Long].collect().sorted
      val expected = (0L until 100L).filter(_ % 2 == 0).toArray
      // no lost rows, and — the exactly-once leg — no duplicates from
      // the replayed batch
      got must be(expected)
    } finally {
      graft.PlanHygiene.deleteRecursively(landing)
      graft.PlanHygiene.deleteRecursively(outDir)
      graft.PlanHygiene.deleteRecursively(ckpt)
    }
  }
}
