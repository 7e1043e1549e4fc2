package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.must.Matchers

import graft.TestSpark

class EventsStreamSpec extends AnyFlatSpec with Matchers {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  behavior of "hourlyAgg (watermarked tumbling window)"

  it must "emit finalized hourly windows once the watermark passes" in {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val q = EventsStream.hourlyAgg(df).writeStream
      .format("memory").queryName("hourly_test").outputMode("append").start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 10:05:00"), 1L, "click", 1.0, "{}"),
        (2L, ts("2024-01-01 10:45:00"), 2L, "click", 2.0, "{}"),
        (3L, ts("2024-01-01 10:50:00"), 1L, "view", 3.0, "{}"))
      q.processAllAvailable()
      // advance event time far enough to close the 10:00 window (2h watermark)
      mem.addData((4L, ts("2024-01-01 13:30:00"), 1L, "click", 4.0, "{}"))
      q.processAllAvailable()

      val out = spark.table("hourly_test").collect()
        .map(r => (r.getAs[Timestamp]("hour").toString, r.getAs[String]("event_type"),
          r.getAs[Long]("n"), r.getAs[Double]("sum_value")))
      out must contain(("2024-01-01 10:00:00.0", "click", 2L, 3.0))
      out must contain(("2024-01-01 10:00:00.0", "view", 1L, 3.0))
      // the 13:00 window is NOT final yet — append mode must not have it
      out.map(_._1) must not contain "2024-01-01 13:00:00.0"
    } finally q.stop()
  }

  behavior of "hourlyUniqueUsers (chained dedup state + windowed count)"

  it must "count each user once per hour through the chained stateful ops" in {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val q = EventsStream.hourlyUniqueUsers(df).writeStream
      .format("memory").queryName("unique_test").outputMode("append").start()
    try {
      mem.addData(
        // user 1 three times + user 2 once in the 10:00 hour → 2 uniques
        (1L, ts("2024-01-01 10:05:00"), 1L, "click", 1.0, "{}"),
        (2L, ts("2024-01-01 10:15:00"), 1L, "view", 1.0, "{}"),
        (3L, ts("2024-01-01 10:55:00"), 1L, "click", 1.0, "{}"),
        (4L, ts("2024-01-01 10:45:00"), 2L, "click", 1.0, "{}"),
        // user 1 again in 11:00 — a NEW (user, hour) key, counted again
        (5L, ts("2024-01-01 11:10:00"), 1L, "click", 1.0, "{}"))
      q.processAllAvailable()
      // advance the watermark (on the TRUNCATED hour) past 10:00+1h+2h
      mem.addData((6L, ts("2024-01-01 14:30:00"), 9L, "click", 1.0, "{}"))
      q.processAllAvailable()

      val out = spark.table("unique_test").collect()
        .map(r => r.getAs[Timestamp]("hour").toString -> r.getAs[Long]("n_users"))
        .toMap
      out("2024-01-01 10:00:00.0") must be(2L) // dedup collapsed user 1's 3 events
      // 11:00 closed too (watermark = 14:00 − 2 h = 12:00 ≥ 11:00 + 1 h)
      out("2024-01-01 11:00:00.0") must be(1L)
      // 14:00 is not final — append mode must not have emitted it
      out.keySet must not contain "2024-01-01 14:00:00.0"
    } finally q.stop()
  }

  behavior of "sessionWindowAgg (built-in session_window twin)"

  it must "merge an exactly-gap-separated event (inclusive boundary) and emit window ends" in {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val q = EventsStream.sessionWindowAgg(df).writeStream
      .format("memory").queryName("swin_test").outputMode("append").start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, "{}"),
        (2L, ts("2024-01-01 10:10:00"), 1L, "click", 1.0, "{}"), // merges (10 min)
        (3L, ts("2024-01-01 10:40:00"), 1L, "click", 1.0, "{}"), // EXACTLY 30 min → merges
        (4L, ts("2024-01-01 11:10:01"), 1L, "click", 1.0, "{}")) // 30 min + 1 s → new
      q.processAllAvailable()
      mem.addData((5L, ts("2024-01-01 14:00:00"), 9L, "click", 1.0, "{}"))
      q.processAllAvailable()

      val out = spark.table("swin_test").collect()
        .filter(_.getAs[Long]("user_id") == 1L)
        .map(r => (r.getAs[Timestamp]("session_start").toString,
          r.getAs[Timestamp]("session_end").toString, r.getAs[Long]("n_events")))
        .sortBy(_._1)
      // the exact-gap event MERGED (inclusive boundary); the gap+1s
      // event did not; emitted ends are last event + gap
      out.toSeq must be(Seq(
        ("2024-01-01 10:00:00.0", "2024-01-01 11:10:00.0", 3L),
        ("2024-01-01 11:10:01.0", "2024-01-01 11:40:01.0", 1L)))
    } finally q.stop()
  }

  behavior of "sessionize (flatMapGroupsWithState)"

  it must "split a user's events into gap-delimited sessions" in {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val q = EventsStream.sessionize(df, gapSec = 1800).writeStream
      .format("memory").queryName("session_test").outputMode("append").start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0, "{}"),
        (2L, ts("2024-01-01 10:10:00"), 7L, "view", 1.0, "{}"),
        // 50-minute gap > 30-minute session gap → new session
        (3L, ts("2024-01-01 11:00:00"), 7L, "click", 1.0, "{}"))
      q.processAllAvailable()

      val rows = spark.table("session_test").collect()
      val closed = rows.filter(_.getAs[Boolean]("closed"))
      closed.length must be(1)
      closed(0).getAs[Long]("n_events") must be(2L)
      closed(0).getAs[Timestamp]("session_start") must be(ts("2024-01-01 10:00:00"))
      closed(0).getAs[Timestamp]("session_end") must be(ts("2024-01-01 10:10:00"))
      val open = rows.filterNot(_.getAs[Boolean]("closed"))
      open.map(_.getAs[Long]("n_events")).max must be(1L)

      // advance the watermark (1h delay) past 11:00 + 30min gap: the idle
      // session must close via the event-time timeout
      mem.addData((4L, ts("2024-01-01 13:00:00"), 8L, "click", 1.0, "{}"))
      q.processAllAvailable()
      val closed2 = spark.table("session_test").collect()
        .filter(r => r.getAs[Boolean]("closed") && r.getAs[Long]("user_id") == 7L)
      closed2.length must be(2)
      closed2.map(_.getAs[Timestamp]("session_start").toString).sorted.last must
        be("2024-01-01 11:00:00.0")
    } finally q.stop()
  }

  it must "hold one state row per active key, linear in cardinality, draining on timeout" in {
    // The 100 TB posture question for flatMapGroupsWithState: what bounds
    // the state store? Answer, pinned here by the reported state-operator
    // metrics: ACTIVE KEY CARDINALITY — independent of events per key
    // (10 events/key collapse to one SessionState row), linear in keys
    // (10× keys ⇒ exactly 10× state rows: 40 → 400 measured), and
    // timed-out sessions REMOVE their rows (400 → 1 after the watermark
    // passes last+gap), so idle keys cannot accumulate forever.
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    def lastStateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
      q.recentProgress.reverse.iterator
        .flatMap(_.stateOperators.headOption).map(_.numRowsTotal)
        .find(_ => true).getOrElse(-1L)

    def load(mem: MemoryStream[(Long, Timestamp, Long, String, Double, String)],
             keys: Int): Unit =
      mem.addData((0 until keys).flatMap { k =>
        (0 until 10).map(i =>
          ((k * 10 + i).toLong, ts(f"2024-01-01 10:0$i%01d:00"), k.toLong,
            "click", 1.0, "{}"))
      })

    for ((keys, name) <- Seq(40 -> "session_state_1x", 400 -> "session_state_10x")) {
      val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
      val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val q = EventsStream.sessionize(df, gapSec = 1800).writeStream
        .format("memory").queryName(name).outputMode("append").start()
      try {
        load(mem, keys)
        q.processAllAvailable()
        withClue(s"$keys keys, 10 events each: ") {
          lastStateRows(q) must be(keys.toLong)
        }
        if (keys == 400) {
          // watermark (1h delay) past 10:09 + 30min gap closes every
          // session; their state rows must be REMOVED, not retained
          mem.addData(Seq((99999L, ts("2024-01-01 13:00:00"), 99999L, "click", 1.0, "{}")))
          q.processAllAvailable()
          lastStateRows(q) must be(1L) // only the watermark-advancing key
          q.recentProgress.flatMap(_.stateOperators.headOption)
            .map(_.numRowsRemoved).sum must be >= 400L
        }
      } finally q.stop()
    }
  }

  behavior of "dedupByContent (streaming exact dedup)"

  it must "emit only the first arrival of each content hash" in {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val q = EventsStream.dedupByContent(df, "props").writeStream
      .format("memory").queryName("dedup_test").outputMode("append").start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 10:00:00"), 1L, "ingest", 1.0, "PAYLOAD_A"),
        (2L, ts("2024-01-01 10:01:00"), 2L, "ingest", 1.0, "PAYLOAD_A"),
        (3L, ts("2024-01-01 10:02:00"), 3L, "ingest", 1.0, "PAYLOAD_B"))
      q.processAllAvailable()
      // a later duplicate within the watermark window must also be dropped
      mem.addData((4L, ts("2024-01-01 10:30:00"), 4L, "ingest", 1.0, "PAYLOAD_B"))
      q.processAllAvailable()

      val out = spark.table("dedup_test").collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("props")))
      out.map(_._2).sorted must be(Seq("PAYLOAD_A", "PAYLOAD_B"))
      out.toMap must be(Map(1L -> "PAYLOAD_A", 3L -> "PAYLOAD_B"))
    } finally q.stop()
  }

  behavior of "unseenOnly (stream-static anti-join)"

  it must "emit only rows whose (user, props) key is absent from static history" in {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val history = Seq(
        (0L, ts("2024-01-01 09:00:00"), 1L, "click", 1.0, "{\"a\":1}"),
        (1L, ts("2024-01-01 09:01:00"), 3L, "click", 1.0, null.asInstanceOf[String]))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val q = EventsStream.unseenOnly(df, history).writeStream
      .format("memory").queryName("unseen_test").outputMode("append").start()
    try {
      mem.addData(
        (10L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, "{\"a\":1}"), // seen key
        (11L, ts("2024-01-01 10:01:00"), 1L, "click", 1.0, "{\"a\":2}"), // new props
        (12L, ts("2024-01-01 10:02:00"), 2L, "click", 1.0, "{\"a\":1}"), // new user
        // NULL props must behave like the NOT EXISTS oracle: equality
        // never matches NULL, so the row counts as unseen and EMITS —
        // a concatenated-hash key would collapse it with history's
        // (3, NULL) row and silently drop it
        (13L, ts("2024-01-01 10:03:00"), 3L, "click", 1.0, null.asInstanceOf[String]))
      q.processAllAvailable()
      val out = spark.table("unseen_test").collect()
        .map(_.getAs[Long]("event_id")).sorted
      out must be(Array(11L, 12L, 13L))
    } finally q.stop()
  }

  it must "emit the same set regardless of micro-batch boundaries (stateless contract)" in {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val history = Seq((0L, ts("2024-01-01 09:00:00"), 1L, "click", 1.0, "{\"a\":1}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = Seq(
      (20L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, "{\"a\":1}"),
      (21L, ts("2024-01-01 10:01:00"), 2L, "click", 1.0, "{\"a\":1}"),
      (22L, ts("2024-01-01 10:02:00"), 1L, "click", 1.0, "{\"a\":9}"))

    def run(name: String)(feed: (MemoryStream[(Long, Timestamp, Long, String, Double, String)],
                                 org.apache.spark.sql.streaming.StreamingQuery) => Unit): Set[Long] = {
      val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
      val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val q = EventsStream.unseenOnly(df, history).writeStream
        .format("memory").queryName(name).outputMode("append").start()
      try {
        feed(mem, q)
        q.processAllAvailable()
        spark.table(name).collect().map(_.getAs[Long]("event_id")).toSet
      } finally q.stop()
    }

    val oneBatch = run("unseen_one") { (m, _) => m.addData(rows: _*) }
    // drain between rows so each one REALLY lands in its own
    // micro-batch — adding all rows before one processAllAvailable
    // would collapse to a single batch and compare identical runs
    val perRow = run("unseen_split") { (m, q) =>
      rows.foreach { r => m.addData(r); q.processAllAvailable() }
    }
    oneBatch must be(perRow)
    oneBatch must be(Set(21L, 22L))
  }

  behavior of "streaming/batch parity"

  it must "produce the same hourly totals as the batch groupBy on the same rows" in {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val rows = Seq(
      (1L, ts("2024-01-01 08:10:00"), 1L, "click", 1.5, "{}"),
      (2L, ts("2024-01-01 08:20:00"), 2L, "click", 2.5, "{}"),
      (3L, ts("2024-01-01 09:10:00"), 1L, "view", 1.0, "{}"))

    val batch = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .collect().map(r => (r.getAs[Timestamp](0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet

    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val q = EventsStream.hourlyAgg(
        mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .writeStream.format("memory").queryName("parity_test").outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      mem.addData((9L, ts("2024-01-01 23:00:00"), 9L, "view", 0.0, "{}")) // advance watermark
      q.processAllAvailable()
      val stream = spark.table("parity_test").collect()
        .map(r => (r.getAs[Timestamp](0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      stream must be(batch)
    } finally q.stop()
  }

  behavior of "readEvents (file source entry point)"

  it must "re-stage on a same-size in-place rewrite (content fingerprint, not mtime)" in {
    // the staged-landing cache's staleness check must catch a rewrite
    // that preserves file size AND lands within a coarse filesystem's
    // mtime granularity window — the case a (size, mtime) fingerprint
    // provably misses; the content-CRC fingerprint closes it
    import java.nio.file.{Files, Paths}
    val src = Files.createTempDirectory("graft-restage-src")
    try {
      val f = src.resolve("part-0.parquet")
      val mtime = java.nio.file.attribute.FileTime.fromMillis(1700000000000L)
      Files.write(f, "AAAA".getBytes("UTF-8"))
      Files.setLastModifiedTime(f, mtime)
      val staged1 = EventsStream.stageLanding(src.toString)
      new String(Files.readAllBytes(
        Paths.get(staged1, "part-0.parquet")), "UTF-8") must be("AAAA")
      // same size, same mtime — only the bytes change
      Files.write(f, "BBBB".getBytes("UTF-8"))
      Files.setLastModifiedTime(f, mtime)
      val staged2 = EventsStream.stageLanding(src.toString)
      new String(Files.readAllBytes(
        Paths.get(staged2, "part-0.parquet")), "UTF-8") must be("BBBB")
      // an untouched source keeps serving the cached staging (the
      // whole point of the cache) — same dir, no recopy churn
      EventsStream.stageLanding(src.toString) must be(staged2)
    } finally graft.PlanHygiene.deleteRecursively(src)
  }

  it must "start on an EMPTY landing directory via the declared-schema fallback" in {
    // files arriving later is the normal state for a file stream's
    // entry point; the ts-type sniff (an eager batch read) must not
    // turn "no files yet" into an AnalysisException at stream start
    val dir = java.nio.file.Files.createTempDirectory("graft-empty-landing")
    try {
      val df = EventsStream.readEvents(spark, dir.toString)
      df.isStreaming must be(true)
      df.schema("ts").dataType must be(
        org.apache.spark.sql.types.TimestampType)
    } finally java.nio.file.Files.deleteIfExists(dir)
  }
}
