package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Runnable streaming entry point: streams the sf events parquet through
  * the watermarked hourly aggregation with Trigger.AvailableNow (process
  * everything currently on disk, then stop) and reports totals — the
  * file-source production path, exercised end-to-end.
  *
  *   sbt "runMain graft.streaming.StreamDemo /root/testdata/sf0.001"
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the file source wants a landing DIRECTORY of arriving files; stage
    // the single sf events file into one (the production shape)
    val landing = java.nio.file.Files.createTempDirectory("graft-events-")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      landing.resolve("events-0.parquet"))

    val q = EventsStream.hourlyAgg(
        EventsStream.readEvents(spark, landing.toString))
      .writeStream
      .format("memory").queryName("hourly")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val n = spark.table("hourly").count()
    // Append mode emits only watermark-finalized windows; the max-ts
    // window stays open, so finalized < total hours in the data.
    println(s"""{"stream":"hourly","finalized_windows":$n}""")
    spark.stop()
  }
}
