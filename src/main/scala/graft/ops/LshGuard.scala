package graft.ops

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Loud accounting for bounded-bucket candidate generation.
  *
  * Every bucket-grouped pair generator (MinHash/SimHash LSH, IVF
  * embedding dedup) explodes each bucket's id list into its i<j pairs —
  * quadratic per bucket. Healthy corpora keep buckets small by
  * construction, but a real crawl has degenerate content (empty docs,
  * boilerplate templates) that collapses into one bucket: a 1M-doc
  * bucket is a 10^12-pair Generate. The generators therefore cap the
  * bucket size — pairs are bounded BY CONSTRUCTION, not by corpus luck
  * (the reference bounds its own only unbounded query the same way: a
  * hard 100 000-row cap, ThriftStore.scala:509).
  *
  * A silent cap would turn recall loss into a correct-looking answer,
  * so the drop is surfaced through `Dataset.observe` metrics — computed
  * DURING the normal pass, zero extra jobs — and a per-session
  * `QueryExecutionListener` that shouts when any bucket was dropped.
  * The right fix for a shouting pipeline is upstream: exact-dedup the
  * boilerplate first (identical docs collide in EVERY band, so they
  * always form the hottest bucket), or raise the cap deliberately.
  */
object LshGuard {

  /** Observe-metrics over a bucketed frame (one row per bucket):
    * buckets above `cap` (these get dropped), member rows inside them,
    * and the largest bucket seen.
    */
  def dropMetrics(sizeCol: Column, cap: Int): Seq[Column] = Seq(
    sum(when(sizeCol > cap, 1L).otherwise(0L)).as("dropped_buckets"),
    sum(when(sizeCol > cap, sizeCol.cast("long")).otherwise(0L)).as("dropped_ids"),
    max(sizeCol.cast("long")).as("max_bucket"))

  // observation names must be unique within a query execution; ops like
  // components() embed minhashPairs alongside other observed frames
  private val seq = new AtomicLong()
  def observationName(kind: String): String =
    s"lsh_${kind}_${seq.incrementAndGet()}"

  /** Drop handler — swappable so specs can capture the shout; default
    * prints to stderr (the session may have no log4j config).
    */
  @volatile var onDrop: (String, Long, Long, Long) => Unit =
    (name, buckets, ids, maxBucket) =>
      Console.err.println(
        s"[graft][WARN] $name: dropped $buckets oversized bucket(s) holding " +
          s"$ids ids (largest bucket: $maxBucket) — pairs inside them are NOT " +
          "reported; exact-dedup boilerplate upstream or raise maxBucket")

  private val registered = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** AQE's runtime empty-relation propagation can ERASE the accounting:
    * when a cap suppresses every pair (total boilerplate flood — the
    * exact case that must shout loudest), the post-cap stage reports
    * zero rows, AQE replaces the downstream subtree with an empty scan,
    * and the already-executed CollectMetrics stage is disconnected from
    * the final adaptive plan — `observedMetrics` (which reads only that
    * final plan) comes back EMPTY. Measured: a 6-doc flood under cap 3
    * collected `[1 bucket, 6 ids]` yet surfaced `Map()`. Excluding this
    * one AQE rule (static PropagateEmptyRelation still runs at
    * optimization time) keeps drop metrics indestructible; none of the
    * engine's query shapes rely on runtime empty-branch shortcuts.
    */
  private val EmptyProp =
    "org.apache.spark.sql.execution.adaptive.AQEPropagateEmptyRelation"

  /** Register the shouting listener once per session (weakly keyed — a
    * stopped session unregisters itself by being collected), and pin
    * the session conf so plan replacement cannot swallow the shout.
    */
  def ensureListener(spark: SparkSession): Unit =
    if (registered.putIfAbsent(spark, java.lang.Boolean.TRUE) == null) {
      val key = "spark.sql.adaptive.optimizer.excludedRules"
      val cur = spark.conf.getOption(key).getOrElse("")
      if (!cur.contains(EmptyProp)) {
        spark.conf.set(key, if (cur.isEmpty) EmptyProp else s"$cur,$EmptyProp")
        // session-wide and permanent — say so, or a user diffing plans
        // before/after their first capped-dedup call has no clue why
        Console.err.println(
          s"[graft][INFO] capped-bucket accounting: excluded " +
            s"AQEPropagateEmptyRelation via $key for this session so " +
            "drop metrics survive empty-result plans")
      }
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
                               durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("lsh_")) {
              val dropped = longAt(row, "dropped_buckets")
              if (dropped > 0)
                onDrop(name, dropped, longAt(row, "dropped_ids"),
                  longAt(row, "max_bucket"))
            }
          }
        override def onFailure(funcName: String, qe: QueryExecution,
                               exception: Exception): Unit = ()
      })
    }

  private def longAt(row: Row, field: String): Long = {
    val i = row.fieldIndex(field)
    if (row.isNullAt(i)) 0L else row.getLong(i)
  }

  /** Observe + cap one bucketed frame (one row per bucket holding a
    * collected list column `listCol`): buckets below `minSize` drop
    * (for WITHIN-bucket pair generation a singleton can yield no pair —
    * the default; an incremental cross-side join passes minSize=1
    * because one history doc per bucket still matches), drop metrics
    * ride the same pass, buckets above `cap` are excluded — the shared
    * front half of every bounded pair generator, so the cap/accounting
    * logic exists exactly once.
    */
  def capBuckets(buckets: DataFrame, listCol: String, cap: Int,
                 kind: String, minSize: Int = 2): DataFrame = {
    ensureListener(buckets.sparkSession)
    val metrics = dropMetrics(size(col(listCol)), cap)
    buckets
      .filter(size(col(listCol)) >= minSize)
      .observe(observationName(kind), metrics.head, metrics.tail: _*)
      .filter(size(col(listCol)) <= cap)
  }

  /** Capped sorted-id buckets (`ids` column) → distinct i<j pairs —
    * the full skeleton for generators whose bucket rows carry plain
    * ids (MinHash bands, IVF buckets). SimHash buckets carry
    * (id, signature) structs and keep their own explode + Hamming gate
    * on top of [[capBuckets]].
    *
    * Pair generation is two chained `posexplode`s with an i<j filter —
    * whole-stage-codegen Generates — not a nested `transform(slice(…))`
    * lambda: higher-order functions evaluate interpreted, and the
    * per-element `slice` copies made the HOF form ~3× slower at equal
    * output (measured 0.93 s → 0.33 s on a 24k-bucket profile). The
    * codegen form emits n² index pairs before the filter, but n is
    * already ≤ cap by construction, so the constant factor stays small.
    */
  def pairsFromIdBuckets(buckets: DataFrame, cap: Int,
                         kind: String): DataFrame =
    capBuckets(buckets, "ids", cap, kind)
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "id_a")))
      .select(col("i"), col("id_a"), posexplode(col("ids")).as(Seq("j", "id_b")))
      .filter(col("i") < col("j"))
      .select(col("id_a"), col("id_b"))
      .distinct()
}
