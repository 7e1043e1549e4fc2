package graft

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.must.Matchers

/** Pins the checkpoint lifecycle: queries that eagerly
  * `localCheckpoint` (to outlive a deleted temp snapshot, or to flatten
  * an iterative plan) leave blocks behind after materialization, and
  * the r7 bench suite accumulated 90 queries × 3 reps of them into a
  * 1.8× suite-wide slowdown. Bench and Verify now sweep between units
  * of work; this spec proves (a) the leak class is real — the
  * representative queries DO leave persistent RDDs behind — and (b) one
  * `sweepPersisted` call releases every one of them.
  */
class PlanHygieneSpec extends AnyFlatSpec with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  behavior of "PlanHygiene.sweepPersisted"

  it must "release fs_save_load's eager checkpoint after materialization" in {
    val s = spark
    PlanHygiene.sweepPersisted(s, blocking = true)
    SparkEntry.queries("fs_save_load")(s, sfDir).count() must be > 0L
    // the leak is real: the reloaded-listing checkpoint (taken so the
    // snapshot dir could be deleted) survives the count
    s.sparkContext.getPersistentRDDs must not be empty
    PlanHygiene.sweepPersisted(s, blocking = true) must be >= 1
    s.sparkContext.getPersistentRDDs mustBe empty
  }

  it must "release the DSv2 mount query's checkpoint" in {
    val s = spark
    PlanHygiene.sweepPersisted(s, blocking = true)
    SparkEntry.queries("fs_dsv2_scan")(s, sfDir).count() must be > 0L
    s.sparkContext.getPersistentRDDs must not be empty
    PlanHygiene.sweepPersisted(s, blocking = true)
    s.sparkContext.getPersistentRDDs mustBe empty
  }

  it must "release connected components' final-round checkpoint" in {
    val s = spark
    import s.implicits._
    PlanHygiene.sweepPersisted(s, blocking = true)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("id_a", "id_b")
    val labels = ops.Dedup.components(pairs)
    labels.count() must be(5L)
    // intermediates are released inside the loop; the final label
    // table's checkpoint intentionally survives so the returned frame
    // stays queryable — the session owner sweeps when done with it
    s.sparkContext.getPersistentRDDs must not be empty
    PlanHygiene.sweepPersisted(s, blocking = true)
    s.sparkContext.getPersistentRDDs mustBe empty
  }

  it must "be a counted no-op on a clean context" in {
    val s = spark
    PlanHygiene.sweepPersisted(s, blocking = true)
    PlanHygiene.sweepPersisted(s, blocking = true) must be(0)
  }
}
