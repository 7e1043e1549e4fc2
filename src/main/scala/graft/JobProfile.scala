package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Per-query measurement harness for the optimization rounds (guide §1):
  * runs named driver queries under Bench's exact evaluation sink and
  * reports, per rep, wall seconds plus the JOB / STAGE / TASK counts and
  * the shuffle bytes the rep scheduled. On tiny local SFs the suite's
  * cost is dominated by fixed per-job/per-stage overhead, so these
  * counts are the numbers that tell which operator restructure pays —
  * the Spark UI is disabled in the bench session, and this is the
  * scriptable replacement for its Jobs tab.
  *
  *   sbt "runMain graft.JobProfile <sfDir> <reps> <query> [query ...]"
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(3)
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shuffleRead = new AtomicLong(0L)
    // SPARK_GRAFT_JOBS=1 additionally prints every job's wall time and
    // description — the attribution view for channels whose cost hides
    // in side-effect jobs (index writes, streaming drains) that the
    // per-rep totals cannot separate
    val perJob = sys.env.get("SPARK_GRAFT_JOBS").contains("1")
    val jobStart =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (perJob) {
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(j.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse("")
          jobStart.put(j.jobId, (System.nanoTime(), desc))
        }
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        if (perJob) Option(jobStart.remove(j.jobId)).foreach {
          case (t0, desc) =>
            println(f"[job] id=${j.jobId} t=${(System.nanoTime() - t0) / 1e9}%.3f $desc")
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => () }
    names.foreach { name =>
      // Bench's exact evaluation sink (shared, not copied — r17 ADVICE:
      // a drifting copy would silently profile a different plan); an
      // unknown name fails with the valid set instead of a bare
      // NoSuchElementException
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'; valid names: " +
          SparkEntry.queries.keys.toSeq.sorted.mkString(", ")))
      (1 to reps).foreach { i =>
        val pre = Bench.jvmSnap(spark)
        jobs.set(0); stages.set(0); tasks.set(0); shuffleRead.set(0L)
        val t0 = System.nanoTime()
        Bench.evalAll(fn(spark, sfDir))
        val dt = (System.nanoTime() - t0) / 1e9
        // let the listener bus drain so the counts are complete
        // (listenerBus is private[spark]; same reflective read as
        // Bench.listenerCount)
        try {
          val sc = spark.sparkContext
          val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
          bus.getClass.getMethods.find(m =>
              m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
            .foreach(_.invoke(bus))
        } catch { case _: Throwable => Thread.sleep(200) }
        val post = Bench.jvmSnap(spark)
        println(f"[profile] $name rep=$i t=$dt%.3f jobs=${jobs.get}" +
          f" stages=${stages.get} tasks=${tasks.get}" +
          f" shuffleMB=${shuffleRead.get / 1e6}%.1f" +
          f" codegen_d=${post.codegenCompiles - pre.codegenCompiles}" +
          f" gc_ms_d=${post.gcMs - pre.gcMs}")
        PlanHygiene.sweepPersisted(spark)
      }
    }
    spark.stop()
  }
}
