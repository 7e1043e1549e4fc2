package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables._
import graft.ops.Sketches

/** Relational operator inventory over the TPC-H-ish tables — covers every
  * §2.5 category from SURVEY.md: scan, filter/projection (parquet
  * pushdown), equi/semi/anti join, hash aggregation, window prefix-sum
  * (the C8 `scanLeft` analog, reference BlockInputStream.scala:42-59),
  * sort+limit/top-k, set ops, string/date/math scalar functions, JSON
  * functions, grouping sets.
  *
  * Scale posture: dimension joins are `broadcast()`; fact-side work is a
  * single shuffle on the grouping/join key; no query collects to the
  * driver. At 100 TB the same plans hold — AQE handles skew, filters and
  * projections reach the parquet scan (verified via `.explain`).
  */
object Relational {

  /** Exact-arithmetic cast: doubles → DECIMAL(18,s) before aggregation. */
  private def dec(c: Column, s: Int = 2): Column = c.cast(DecimalType(18, s))
  /** Final output cast for decimal sums. The accumulation stays DECIMAL
    * (exact, order-independent across shuffle partitions), but the OUTPUT
    * is DOUBLE on both engines: DECIMAL(38,x) stringifies with trailing
    * zeros (`253942.00`) while DuckDB's pandas bridge yields float64
    * (`253942.0`), so a decimal-typed output fails any stringified compare
    * even when numerically identical. One exact decimal → nearest double is
    * the same bits on both engines. */
  private def decOut(c: Column): Column = c.cast("double")

  val defs: Seq[QueryDef] = Seq(

    // ── Flagship: scan → filter → join → agg (SURVEY §7.2) ──────────────
    QueryDef(
      "q01_flagship",
      (s, d) => {
        val li = lineitem(s, d).filter(col("l_shipdate") <= lit("1997-06-30").cast("timestamp"))
        li.join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(
            decOut(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4))).as("revenue"),
            count(lit(1)).as("n_lines"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority,
             |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             |       COUNT(*) AS n_lines
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE l_shipdate <= TIMESTAMP '1997-06-30 00:00:00'
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ── TPC-H Q1-style pricing summary: wide hash agg ───────────────────
    QueryDef(
      "q02_pricing_summary",
      (s, d) =>
        // widenedForAgg: the distinct-expand partial aggregate is the
        // whole cost and the scan's row-group layout serializes it —
        // see Tables.widenedForAgg (no-op on a many-row-group layout)
        graft.Tables.widenedForAgg(s, d, "lineitem", col("l_orderkey"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            decOut(sum(dec(col("l_quantity")))).as("sum_qty"),
            decOut(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
            decOut(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4))).as("sum_disc_price"),
            count(lit(1)).as("count_order"),
            countDistinct(col("l_orderkey")).as("n_orders"))
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
             |       COUNT(*) AS count_order,
             |       COUNT(DISTINCT l_orderkey) AS n_orders
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ── Selective filter + narrow projection (parquet pushdown) ─────────
    QueryDef(
      "q03_filter_scan",
      (s, d) =>
        lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                  col("l_shipdate") <  lit("1996-04-01").cast("timestamp") &&
                  col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
                  col("l_quantity") < 24)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
             |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ── Multi-way join through broadcast dims: revenue per region ───────
    QueryDef(
      "q04_join_region",
      (s, d) =>
        orders(s, d)
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(
            decOut(sum(dec(col("o_totalprice")))).as("revenue"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("r_name")),
      Some("""SELECT r_name,
             |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             |       COUNT(*) AS n_orders
             |FROM orders
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    // ── Semi join (EXISTS) ──────────────────────────────────────────────
    QueryDef(
      "q05_semi_join",
      (s, d) =>
        orders(s, d)
          .join(
            lineitem(s, d).filter(col("l_quantity") > 45).select(col("l_orderkey")),
            col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("o_orderstatus")),
      Some("""SELECT o_orderstatus, COUNT(*) AS n FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // ── Anti join (NOT EXISTS): customers without in-progress orders ────
    QueryDef(
      "q06_anti_join",
      (s, d) =>
        customer(s, d)
          .join(orders(s, d).filter(col("o_orderstatus") === "P").select(col("o_custkey")),
                col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
             |ORDER BY c_custkey""".stripMargin)),

    // ── Window prefix-sum ≙ C8 scanLeft (BlockInputStream.scala:42-59) ──
    QueryDef(
      "q07_window_prefix_sum",
      (s, d) => {
        val w = Window
          .partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        lineitem(s, d)
          .filter(col("l_suppkey") <= 5)
          .withColumn("running_qty",
            decOut(sum(dec(col("l_quantity"))).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
          .withColumn("rn", row_number().over(w))
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
                  col("running_qty"), col("rn"))
          .orderBy(col("l_suppkey"), col("rn"))
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
             |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
             |            OVER (PARTITION BY l_suppkey
             |                  ORDER BY l_shipdate, l_orderkey, l_linenumber
             |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |            AS DOUBLE) AS running_qty,
             |       ROW_NUMBER() OVER (PARTITION BY l_suppkey
             |                  ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
             |FROM lineitem WHERE l_suppkey <= 5
             |ORDER BY l_suppkey, rn""".stripMargin)),

    // ── Sort + limit (top-k with total tiebreak) ────────────────────────
    QueryDef(
      "q08_topk",
      (s, d) =>
        orders(s, d)
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10)
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority")),
      Some("""SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // ── Set ops: UNION (distinct) then EXCEPT ───────────────────────────
    QueryDef(
      "q09_set_ops",
      (s, d) => {
        val c = customer(s, d)
        val building = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
        val rich     = c.filter(col("c_acctbal") > 5000).select(col("c_custkey"))
        val finished = orders(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("c_custkey"))
        building.union(rich).distinct().except(finished).orderBy(col("c_custkey"))
      },
      Some("""(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
             | UNION
             | SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
             |EXCEPT
             |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
             |ORDER BY c_custkey""".stripMargin)),

    // ── String scalar functions ─────────────────────────────────────────
    QueryDef(
      "q10_string_fns",
      (s, d) =>
        part(s, d)
          .filter(col("p_partkey") <= 500)
          .select(
            col("p_partkey"),
            upper(col("p_brand")).as("brand_u"),
            substring(col("p_name"), 1, 8).as("name8"),
            concat(col("p_type"), lit("#"), col("p_size").cast("string")).as("type_tag"),
            length(col("p_name")).as("name_len"),
            regexp_replace(col("p_name"), "a", "@").as("name_sub"))
          .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey, UPPER(p_brand) AS brand_u,
             |       SUBSTRING(p_name, 1, 8) AS name8,
             |       p_type || '#' || CAST(p_size AS VARCHAR) AS type_tag,
             |       CAST(LENGTH(p_name) AS INTEGER) AS name_len,
             |       REGEXP_REPLACE(p_name, 'a', '@', 'g') AS name_sub
             |FROM part WHERE p_partkey <= 500 ORDER BY p_partkey""".stripMargin)),

    // ── Date scalar functions ───────────────────────────────────────────
    QueryDef(
      "q11_date_fns",
      (s, d) =>
        orders(s, d)
          .filter(col("o_orderkey") <= 1000)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("y"),
            month(col("o_orderdate")).as("m"),
            dayofmonth(col("o_orderdate")).as("dom"),
            date_trunc("month", col("o_orderdate")).as("month_start"),
            (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("plus30"))
          .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
             |       CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS y,
             |       CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS m,
             |       CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS dom,
             |       CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
             |       o_orderdate + INTERVAL 30 DAY AS plus30
             |FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""".stripMargin)),

    // ── JSON functions over events.props ────────────────────────────────
    QueryDef(
      "q12_json_fns",
      (s, d) =>
        events(s, d)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
          .groupBy(col("event_type"))
          .agg(
            sum(col("k")).as("sum_k"),
            count(lit(1)).as("n"),
            max(col("k")).as("max_k"))
          .orderBy(col("event_type")),
      Some("""SELECT event_type,
             |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
             |       COUNT(*) AS n,
             |       CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ── Grouping sets: ROLLUP ───────────────────────────────────────────
    QueryDef(
      "q13_rollup",
      (s, d) =>
        lineitem(s, d)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(
            decOut(sum(dec(col("l_quantity")))).as("sum_qty"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |       COUNT(*) AS n
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // ── Grouping sets: CUBE (all four grouping combinations) ────────────
    QueryDef(
      "q20_cube",
      (s, d) =>
        // widenedForAgg: the 4-way cube Expand runs in the scan task
        graft.Tables.widenedForAgg(s, d, "lineitem", col("l_orderkey"))
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(
            decOut(sum(dec(col("l_extendedprice")))).as("sum_price"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             |       COUNT(*) AS n
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // ── Time-bucketed agg (batch twin of the streaming pipeline) ────────
    QueryDef(
      "q14_hourly_events",
      (s, d) =>
        events(s, d)
          .groupBy(
            date_trunc("hour", col("ts")).as("hour"),
            col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            decOut(sum(dec(col("value"), 4))).as("sum_value"))
          .orderBy(col("hour"), col("event_type")),
      Some("""SELECT DATE_TRUNC('hour', ts) AS hour, event_type, COUNT(*) AS n,
             |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ── q14's STREAMING-EXECUTED twin: the same windowed aggregation
    //    run through Structured Streaming (file source → watermarked
    //    window agg → AvailableNow → memory sink). Append mode emits
    //    exactly the windows the final watermark (max ts − 2 h) closed,
    //    so the oracle is q14's SQL restricted to window_end ≤
    //    max(ts) − 2 h — a real end-to-end streaming run with a full
    //    hash-checked oracle, not a batch re-execution. ────────────────
    QueryDef(
      "stream_hourly_events",
      (s, d) =>
        graft.streaming.EventsStream.hourlyAggAvailableNow(s, d)
          .orderBy(col("hour"), col("event_type")),
      Some("""WITH m AS (SELECT MAX(ts) AS mx FROM events)
             |SELECT DATE_TRUNC('hour', ts) AS hour, event_type, COUNT(*) AS n,
             |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
             |FROM events, m
             |WHERE DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR <= mx - INTERVAL 2 HOUR
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ── STATEFUL file-sink streaming twin: the same watermarked
    //    windowed aggregation drains through Spark's native parquet
    //    FileSink — append mode emits each window exactly once when
    //    the watermark closes it, the contract the FileSink requires,
    //    so the production ingest topology extends to STATEFUL
    //    operators unchanged (state in the checkpoint's store, output
    //    committed by executors, the driver holds neither). Same
    //    emitted prefix, same oracle as stream_hourly_events. ──────────
    QueryDef(
      "stream_hourly_events_files",
      (s, d) =>
        graft.streaming.EventsStream.hourlyAggFilesAvailableNow(s, d)
          .orderBy(col("hour"), col("event_type")),
      Some("""WITH m AS (SELECT MAX(ts) AS mx FROM events)
             |SELECT DATE_TRUNC('hour', ts) AS hour, event_type, COUNT(*) AS n,
             |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
             |FROM events, m
             |WHERE DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR <= mx - INTERVAL 2 HOUR
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ── Chained stateful streaming, EXECUTED (sixth streaming
    //    channel): watermarked dropDuplicates state feeding a windowed
    //    count in ONE query — per-hour unique users, the ingest-time
    //    "daily actives" shape. Both stateful ops key on the truncated
    //    event hour, so one watermark evicts dedup state AND closes
    //    windows; the final watermark (max truncated ts − 2 h) makes
    //    the emitted prefix SQL-predictable. ───────────────────────────
    QueryDef(
      "stream_hourly_unique",
      (s, d) =>
        graft.streaming.EventsStream.hourlyUniqueAvailableNow(s, d)
          .orderBy(col("hour")),
      Some("""WITH m AS (SELECT DATE_TRUNC('hour', MAX(ts)) AS mxh FROM events)
             |SELECT DATE_TRUNC('hour', ts) AS hour,
             |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
             |FROM events, m
             |WHERE DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR <= mxh - INTERVAL 2 HOUR
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ── Streaming exact dedup, EXECUTED (third streaming channel):
    //    dropDuplicatesWithinWatermark over the staged events drained
    //    with AvailableNow. The deterministic view is the emitted
    //    content set (see EventsStream.dedupAvailableNow scaladoc);
    //    exactly-once-per-key within the horizon is MemoryStream-spec
    //    pinned where batch boundaries are controlled. ─────────────────
    QueryDef(
      "stream_dedup",
      (s, d) =>
        graft.streaming.EventsStream.dedupAvailableNow(s, d)
          .orderBy(col("props")),
      Some("SELECT DISTINCT props FROM events ORDER BY props")),

    // ── Stream-static anti-join, EXECUTED (fourth streaming channel):
    //    the increment (event_id % 10 == 0) streams; history (the rest)
    //    is the STATIC side; only rows with an unseen (user_id, props)
    //    key emit. Stateless, so the emitted set is batch-predictable
    //    row for row; ~55%/45% pass/filter measured tri-SF, both join
    //    outcomes exercised. ─────────────────────────────────────────────
    QueryDef(
      "stream_unseen",
      (s, d) =>
        graft.streaming.EventsStream.unseenAvailableNow(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"))
          .orderBy(col("event_id")),
      Some("""SELECT event_id, user_id, event_type FROM events e
             |WHERE event_id % 10 = 0 AND NOT EXISTS (
             |  SELECT 1 FROM events h WHERE h.event_id % 10 <> 0
             |    AND h.user_id = e.user_id AND h.props = e.props)
             |ORDER BY event_id""".stripMargin)),

    // ── Streaming decontamination, EXECUTED (fifth streaming channel):
    //    documents stream through a per-row probe of the broadcast
    //    benchmark shingle index — stateless append mode, no shuffle,
    //    so the emitted pair set is batch-predictable row for row and
    //    shares pipeline_decontaminate's EXACT oracle (same %10 split,
    //    same n/minShared). ─────────────────────────────────────────────
    // ── Streaming SEMANTIC decontamination, EXECUTED (tenth streaming
    //    channel): arriving embedding vectors stream through an exact
    //    stream-static cosine screen against the held-out corpus slice
    //    (%5 split) — only arrivals with no corpus neighbor at cosine
    //    ≥ 0.45 pass. Stateless vs a static corpus → batch-identical
    //    kept set; the oracle is the full NOT EXISTS all-pairs check. ──
    QueryDef(
      "stream_semantic_gate",
      (s, d) =>
        graft.streaming.EventsStream.semanticGateAvailableNow(s, d)
          .orderBy(col("vec_id")),
      Some("""SELECT a.vec_id, CAST(a.label AS INT) AS label
             |FROM embeddings a
             |WHERE a.vec_id % 5 = 0 AND NOT EXISTS (
             |  SELECT 1 FROM embeddings c WHERE c.vec_id % 5 <> 0
             |    AND list_cosine_similarity(a.embedding, c.embedding) >= 0.45)
             |ORDER BY a.vec_id""".stripMargin)),

    QueryDef(
      "stream_decontaminate",
      (s, d) =>
        graft.streaming.EventsStream.decontaminateAvailableNow(s, d)
          .orderBy(col("doc_id"), col("bench_id")),
      Some("""WITH sh AS (
             |  SELECT doc_id,
             |         unnest(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
             |                               for i in range(1, len(t)-1)])) AS shingle
             |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS t
             |        FROM documents)),
             |hits AS (
             |  SELECT train.doc_id AS doc_id, bench.doc_id AS bench_id,
             |         COUNT(*) AS n_shared
             |  FROM (SELECT * FROM sh WHERE doc_id % 10 <> 0) train
             |  JOIN (SELECT * FROM sh WHERE doc_id % 10 = 0) bench USING (shingle)
             |  GROUP BY 1, 2 HAVING COUNT(*) >= 3)
             |SELECT doc_id, bench_id, n_shared FROM hits
             |ORDER BY doc_id, bench_id""".stripMargin)),

    // ── Conditional aggregation (manual pivot) ──────────────────────────
    QueryDef(
      "q15_conditional_agg",
      (s, d) =>
        events(s, d)
          .groupBy((col("user_id") % 10).as("cohort"))
          .agg(
            sum(when(col("event_type") === "click", 1).otherwise(0)).as("n_click"),
            sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("n_purchase"),
            sum(when(col("event_type") === "error", 1).otherwise(0)).as("n_error"),
            count(lit(1)).as("n_total"))
          .orderBy(col("cohort")),
      Some("""SELECT user_id % 10 AS cohort,
             |       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
             |       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
             |       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
             |       COUNT(*) AS n_total
             |FROM events GROUP BY 1 ORDER BY cohort""".stripMargin)),

    // ── Higher-order array functions over nested data (A6 analog:
    //    nested-array reduction, reference SnackFileStatus.scala:40) ─────
    QueryDef(
      "q16_array_hof",
      (s, d) =>
        embeddings(s, d)
          .select(
            col("vec_id"),
            size(col("embedding")).cast("long").as("n_dims"),
            expr("size(filter(embedding, x -> x > 0))").cast("long").as("n_pos"),
            expr("size(filter(embedding, x -> x < 0))").cast("long").as("n_neg"))
          .orderBy(col("vec_id")),
      Some("""SELECT vec_id, CAST(LEN(embedding) AS BIGINT) AS n_dims,
             |       CAST(LEN(LIST_FILTER(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
             |       CAST(LEN(LIST_FILTER(embedding, x -> x < 0)) AS BIGINT) AS n_neg
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // ── As-of join: latest purchase at-or-before each event ─────────────
    // (composed union+window op, graft.ops.AsofJoin; DuckDB's native
    //  ASOF JOIN is the oracle. Timestamps truncated to seconds on both
    //  sides so the driver's ns-precision parquet and our µs session
    //  agree on tie semantics.)
    QueryDef(
      "q18_asof_join",
      (s, d) => {
        val ev = events(s, d).withColumn("ts_s", date_trunc("second", col("ts")))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_s").as("ts"), col("ts_s").as("p_ts"))
        val clicks = ev.filter(col("event_type") =!= "purchase")
          .select(col("event_id"), col("user_id"), col("ts_s").as("ts"))
        graft.ops.AsofJoin.asof(clicks, purchases,
            key = "user_id", ts = "ts", rightPayload = "p_ts",
            outName = "last_purchase_ts")
          .filter(col("last_purchase_ts").isNotNull)
          .select(col("event_id"), col("last_purchase_ts"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT e.event_id, p.p_ts AS last_purchase_ts
             |FROM (SELECT event_id, user_id, DATE_TRUNC('second', ts) AS ts
             |      FROM events WHERE event_type <> 'purchase') e
             |ASOF JOIN (SELECT user_id, DATE_TRUNC('second', ts) AS ts,
             |                  DATE_TRUNC('second', ts) AS p_ts
             |           FROM events WHERE event_type = 'purchase') p
             |  ON e.user_id = p.user_id AND e.ts >= p.ts
             |ORDER BY e.event_id""".stripMargin)),

    // ── Range join: orders binned into price bands (broadcast non-equi) ─
    QueryDef(
      "q19_range_join",
      (s, d) => {
        val session = s
        import session.implicits._
        val bands = Seq(
          ("low", 0.0, 100000.0),
          ("mid", 100000.0, 250000.0),
          ("high", 250000.0, 1e12)).toDF("band", "lo", "hi")
        orders(s, d)
          .join(broadcast(bands),
            col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
          .groupBy(col("band"))
          .agg(count(lit(1)).as("n"),
            decOut(sum(dec(col("o_totalprice")))).as("revenue"))
          .orderBy(col("band"))
      },
      Some("""SELECT band, COUNT(*) AS n,
             |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM orders
             |JOIN (VALUES ('low', 0, 100000), ('mid', 100000, 250000),
             |             ('high', 250000, 1000000000000)) b(band, lo, hi)
             |  ON o_totalprice >= b.lo AND o_totalprice < b.hi
             |GROUP BY band ORDER BY band""".stripMargin)),

    // ── Salted join: skew-robust equi-join, result-identical to plain.
    //    Two-path form — only keys with >1000 probe rows pay the salt
    //    replication; TPC-H orderkeys (≤7 lines) all take the cold path,
    //    so the plan degenerates to the plain join it must equal ────────
    QueryDef(
      "q21_salted_join",
      (s, d) =>
        graft.ops.SkewJoin.twoPathJoin(
            lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
              col("l_quantity")),
            orders(s, d).select(col("o_orderkey").as("l_orderkey"),
              col("o_orderpriority")),
            key = "l_orderkey", saltFactor = 8,
            probeSaltCols = Seq("l_linenumber"),
            hotThreshold = 1000L)
          .groupBy(col("o_orderpriority"))
          .agg(decOut(sum(dec(col("l_quantity")))).as("sum_qty"),
            count(lit(1)).as("n"))
          .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority,
             |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |       COUNT(*) AS n
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ── Sketch aggregates: HLL approx distinct next to the exact count.
    //    The raw HLL estimate is engine-specific, so the hash-compared
    //    outputs are the exact counts plus a bounded-relative-error flag
    //    (deterministic: HLL merge is order-independent, so the estimate
    //    is a pure function of the dataset) — the oracle asserts the
    //    sketch landed within its default-rsd envelope ─────────────────
    QueryDef(
      "q22_approx_distinct",
      (s, d) => {
        val exactParts = countDistinct(col("l_partkey"))
        val exactOrders = countDistinct(col("l_orderkey"))
        // widenedForAgg: the multi-distinct Expand (x3) runs in the
        // scan task otherwise
        graft.Tables.widenedForAgg(s, d, "lineitem", col("l_orderkey")).agg(
          exactParts.as("exact_parts"),
          exactOrders.as("exact_orders"),
          (abs(approx_count_distinct(col("l_partkey")) - exactParts)
            .cast("double") / exactParts <= 0.1).as("approx_parts_ok"),
          (abs(approx_count_distinct(col("l_orderkey")) - exactOrders)
            .cast("double") / exactOrders <= 0.1).as("approx_orders_ok"))
      },
      Some("""SELECT COUNT(DISTINCT l_partkey) AS exact_parts,
             |       COUNT(DISTINCT l_orderkey) AS exact_orders,
             |       TRUE AS approx_parts_ok, TRUE AS approx_orders_ok
             |FROM lineitem""".stripMargin)),

    // ── Exact percentiles (median / p95): Spark's exact `percentile`
    //    aggregate and DuckDB's quantile_cont share the same definition
    //    (sorted values, rank p·(n−1), linear interpolation), so the
    //    rounded values hash-match; the full sort is per-group, not
    //    global, and partial aggregation buffers per group ────────────────
    QueryDef(
      "q23_percentiles",
      (s, d) =>
        lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            round(expr("percentile(l_quantity, 0.5D)"), 4).as("p50_qty"),
            round(expr("percentile(l_quantity, 0.95D)"), 4).as("p95_qty"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, COUNT(*) AS n,
             |       ROUND(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5), 4) AS p50_qty,
             |       ROUND(quantile_cont(CAST(l_quantity AS DOUBLE), 0.95), 4) AS p95_qty
             |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // ── Table profiling: the ANALYZE pass — per-column row/null/
    //    distinct counts from ONE scan (multi-distinct plans as a
    //    single Expand + partial agg; a per-column loop would rescan
    //    the table |columns| times). Counts are exact integers, so the
    //    profile hash-checks. ────────────────────────────────────────────
    QueryDef(
      "q24_profile",
      // widenedForAgg measured and DECLINED here (r18): unlike q02/q22,
      // the profile's per-column DISTINCT keys are near-unique
      // (o_orderkey is every row), so the widened partial aggregate
      // cannot shrink its exchange — measured +1 job, shuffle
      // 3.3 → 7.5 MB, wall time tracking the untouched controls. The
      // serial Expand stays the cheaper evil at this distinct density.
      (s, d) => graft.ops.Profile.profile(
          graft.Tables.orders(s, d),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority"))
        .orderBy(col("column_name")),
      Some("""SELECT 'o_orderkey' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |       CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_nulls,
             |       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct
             |FROM orders
             |UNION ALL
             |SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT),
             |       CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
             |       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders
             |UNION ALL
             |SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
             |       CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
             |       CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) FROM orders
             |UNION ALL
             |SELECT 'o_totalprice', CAST(COUNT(*) AS BIGINT),
             |       CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
             |       CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) FROM orders
             |UNION ALL
             |SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
             |       CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
             |       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) FROM orders
             |ORDER BY column_name""".stripMargin)),

    // ── Count-Min frequency sketch, bound-gated: the second sketch
    //    family beside q22's HLL — per-key frequency ESTIMATES from a
    //    fully RELATIONAL CMS (graft.ops.Sketches: the d×w counter
    //    table is one map-side-combined aggregation, the probe a
    //    broadcast join + min-over-depth — no UDF, no driver sketch;
    //    replaced the ev.stat.countMinSketch udf probe, the last
    //    non-codegen call site, r8 VERDICT #8), gated by the CMS
    //    contract the oracle can check without recomputing the sketch:
    //    est ≥ exact always (structural), est ≤ exact + eps·N at the
    //    sketch's confidence (eps=0.001 on this key cardinality holds
    //    deterministically, tri-SF). ────────────────────────────────────
    QueryDef(
      "q27_cms_freq",
      (s, d) => {
        val ev = events(s, d)
        val sketch = Sketches.countMinTable(ev, col("event_type"),
          eps = 0.001, confidence = 0.99)
        val est = Sketches.countMinEstimates(
            ev.select(col("event_type")), col("event_type"), sketch,
            eps = 0.001, confidence = 0.99)
          .select(col("k").as("event_type"), col("est"))
        ev.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_exact"))
          .join(est, Seq("event_type"))
          .crossJoin(broadcast(ev.agg(count(lit(1)).as("n_total"))))
          .select(col("event_type"), col("n_exact"),
            (col("est") >= col("n_exact") &&
              col("est") <= col("n_exact") + lit(0.001) * col("n_total"))
              .as("bound_ok"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_exact,
             |       TRUE AS bound_ok
             |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin)),

    // ── Approximate quantiles: the THIRD sketch family beside HLL (q22)
    //    and Count-Min (q27) — Spark's approx_percentile is the
    //    mergeable rank sketch every executor can partial-aggregate
    //    (the 100 TB path; exact percentiles q23 need a per-group
    //    sort). Gated by the sketch's own contract, checkable without
    //    recomputing it: the returned value's EXACT rank must sit
    //    within n/accuracy (+1 for discreteness) of the target rank.
    //    The exact ranks come from ONE conditional-aggregation pass
    //    (the 4 approx values are a collected scalar row, broadcast by
    //    construction), never a sort. ──────────────────────────────────
    QueryDef(
      "q28_approx_quantiles",
      (s, d) => {
        val acc = 1000
        val pcts = Seq(0.1, 0.5, 0.9, 0.99)
        val li = lineitem(s, d)
          .select(col("l_extendedprice").cast("double").as("v"))
        val head = li.agg(
          expr(s"approx_percentile(v, array(${pcts.mkString(",")}), $acc)")
            .as("ap"),
          count(lit(1)).as("n")).head()
        val ap = head.getSeq[Double](0)
        val n = head.getLong(1)
        val tol = n.toDouble / acc + 1
        // a duplicated value occupies the rank INTERVAL
        // (count(v < a), count(v <= a)]; the sketch's contract is that
        // SOME rank of the returned value is near p·n, so the gate
        // asserts interval-intersection — a max-rank-only check would
        // flag a correct result whenever the probed percentile lands
        // on a value duplicated more than tol times
        val rankCols = pcts.indices.flatMap(i => Seq(
          sum(when(col("v") < ap(i), 1L).otherwise(0L)).as(s"lo$i"),
          sum(when(col("v") <= ap(i), 1L).otherwise(0L)).as(s"hi$i")))
        val ranks = li.agg(rankCols.head, rankCols.tail: _*).head()
        import s.implicits._
        pcts.indices.map { i =>
          val (lo, hi) = (ranks.getLong(2 * i), ranks.getLong(2 * i + 1))
          val target = pcts(i) * n
          (pcts(i), n, lo <= target + tol && hi >= target - tol)
        }.toDF("pct", "n_total", "bound_ok").orderBy(col("pct"))
      },
      Some("""SELECT pct, (SELECT COUNT(*) FROM lineitem) AS n_total,
             |       TRUE AS bound_ok
             |FROM (VALUES (0.1), (0.5), (0.9), (0.99)) t(pct)
             |ORDER BY pct""".stripMargin)),

    // ── Explicit GROUPING SETS: the third grouping-analytics surface
    //    beside rollup (q13) and cube (q20) — arbitrary set lists the
    //    other two can't express (here: by-type, by-day, grand total,
    //    but NOT by (type, day)). grouping_id disambiguates subtotal
    //    rows from genuine nulls; ORDER BY pins NULLS FIRST because
    //    Spark and DuckDB default opposite null orderings. ──────────────
    QueryDef(
      "q26_grouping_sets",
      (s, d) => {
        events(s, d)
          .withColumn("day", col("ts").cast("date"))
          .createOrReplaceTempView("events_gs")
        // day emits as STRING: a DATE column stringifies differently
        // across the compare harness's readers ('2024-01-01' vs
        // midnight-timestamp repr); ISO text is unambiguous in both
        s.sql("""SELECT event_type, CAST(day AS STRING) AS day,
                |       CAST(grouping_id(event_type, day) AS INT) AS gid,
                |       COUNT(*) AS n
                |FROM events_gs
                |GROUP BY GROUPING SETS ((event_type), (day), ())
                |ORDER BY gid, event_type NULLS FIRST, day NULLS FIRST
                |""".stripMargin)
      },
      Some("""SELECT event_type,
             |       CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             |       CAST(GROUPING(event_type, CAST(ts AS DATE)) AS INT) AS gid,
             |       CAST(COUNT(*) AS BIGINT) AS n
             |FROM events
             |GROUP BY GROUPING SETS ((event_type), (CAST(ts AS DATE)), ())
             |ORDER BY gid, event_type NULLS FIRST, day NULLS FIRST""".stripMargin)),

    // ── RANGE window frame: time-based sliding aggregation (events in
    //    the trailing hour per user) — the VALUE-based frame category
    //    q07's ROWS prefix-sum doesn't cover. Both engines frame over
    //    truncated epoch SECONDS, and a RANGE frame includes all peers
    //    of the current value, so tie order can't change the count. ─────
    QueryDef(
      "q25_range_frame",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("sec"))
          .rangeBetween(-3599, 0)
        events(s, d)
          .withColumn("sec", col("ts").cast("long"))
          .withColumn("n_trailing_1h", count(lit(1)).over(w))
          .select(col("event_id"), col("n_trailing_1h"))
          .orderBy(col("event_id"))
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id,
             |         CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec
             |  FROM events)
             |SELECT event_id,
             |       CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY sec
             |            RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
             |            AS BIGINT) AS n_trailing_1h
             |FROM e ORDER BY event_id""".stripMargin)),

    // ── Sessionization: window lag + cumulative gap counting ────────────
    QueryDef(
      "q17_sessionize",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        events(s, d)
          .withColumn("prev_ts", lag(col("ts"), 1).over(w))
          .withColumn("new_session",
            when(col("prev_ts").isNull ||
                 col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1)
              .otherwise(0))
          .groupBy(col("user_id"))
          .agg(sum(col("new_session")).cast("long").as("n_sessions"),
               count(lit(1)).as("n_events"))
          .orderBy(col("user_id"))
      },
      Some("""WITH gaps AS (
             |  SELECT user_id,
             |         CASE WHEN LAG(ts) OVER w IS NULL
             |                OR DATE_DIFF('second', LAG(ts) OVER w, ts) > 1800
             |              THEN 1 ELSE 0 END AS new_session
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
             |SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
             |       COUNT(*) AS n_events
             |FROM gaps GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ── q17's STREAMING-EXECUTED twin: custom session state via
    //    flatMapGroupsWithState + event-time timeout, drained with
    //    AvailableNow. Only CLOSED sessions emit: every session except a
    //    user's last is closed by the splitting event; the last closes
    //    iff the final watermark (max ts − 1 h) strictly passes
    //    session_end + gap (Spark's timeout check is
    //    timeoutTimestamp < watermark). Gap arithmetic is millisecond-
    //    floored on BOTH sides (Timestamp.getTime ↔ epoch_ms). ─────────
    QueryDef(
      "stream_sessionize",
      (s, d) =>
        graft.streaming.EventsStream.sessionizeAvailableNow(s, d)
          .orderBy(col("user_id"), col("session_start")),
      Some("""WITH e AS (
             |  SELECT user_id, event_id, epoch_ms(ts) AS tms FROM events),
             |flags AS (
             |  SELECT user_id, tms, event_id,
             |         CASE WHEN LAG(tms) OVER w IS NULL
             |                OR tms - LAG(tms) OVER w > 1800000
             |              THEN 1 ELSE 0 END AS new_session
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)),
             |s AS (
             |  SELECT user_id, tms,
             |         SUM(new_session) OVER (PARTITION BY user_id
             |                                ORDER BY tms, event_id
             |                                ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM flags),
             |g AS (
             |  SELECT user_id, sid, MIN(tms) AS start_ms, MAX(tms) AS end_ms,
             |         COUNT(*) AS n_events
             |  FROM s GROUP BY user_id, sid),
             |m AS (SELECT MAX(epoch_ms(ts)) AS mx FROM events)
             |SELECT user_id,
             |       make_timestamp(start_ms * 1000) AS session_start,
             |       make_timestamp(end_ms * 1000) AS session_end,
             |       n_events
             |FROM g, m
             |WHERE sid < (SELECT MAX(sid) FROM g g2 WHERE g2.user_id = g.user_id)
             |   OR end_ms + 1800000 < mx - 3600000
             |ORDER BY user_id, session_start""".stripMargin)),

    // ── Streaming weighted sampling, EXECUTED (eighth streaming
    //    channel): Curation.weightedSample runs verbatim on the
    //    document stream — stateless, and the Lehmer-hash uniform
    //    (not an RNG) makes the ingest-time sample IDENTICAL to the
    //    batch sample whatever the micro-batch boundaries, so it
    //    shares pipeline_weighted_sample's exact oracle. ───────────────
    QueryDef(
      "stream_weighted_sample",
      (s, d) =>
        graft.streaming.EventsStream.weightedSampleAvailableNow(s, d)
          .orderBy(col("doc_id")),
      Some(s"""WITH t AS (
              |  SELECT doc_id,
              |         CAST(LEN(regexp_extract_all(lower(text), '\\w+')) AS BIGINT)
              |           AS n_tokens
              |  FROM documents),
              |s AS (
              |  SELECT doc_id, n_tokens,
              |         LEAST(CAST(1.0 AS DOUBLE),
              |               GREATEST(CAST(0.0 AS DOUBLE),
              |                        CAST(n_tokens AS DOUBLE) / 200)) AS w,
              |         ${PipelineQueries.lehmerUSql} AS u
              |  FROM t)
              |SELECT doc_id, n_tokens, ROUND(w, 6) AS w, ROUND(u, 6) AS u
              |FROM s WHERE u < w ORDER BY doc_id""".stripMargin)),

    // ── Streaming quality gate, EXECUTED (ninth streaming channel):
    //    Curation.qualityFilter runs verbatim on the document stream —
    //    a stateless per-row projection + filter, so the ingest-time
    //    keep set is identical to the batch gate's whatever the
    //    micro-batch boundaries; filter-at-ingest never materializes
    //    rejected rows. Shares pipeline_quality_filter's exact oracle. ──
    QueryDef(
      "stream_quality_filter",
      (s, d) =>
        graft.streaming.EventsStream.qualityFilterAvailableNow(s, d)
          .orderBy(col("doc_id")),
      Some("""WITH t AS (
             |  SELECT doc_id, LENGTH(text) AS n_chars,
             |         regexp_extract_all(lower(text), '\w+') AS toks,
             |         LEN(regexp_extract_all(text, '[.,!?;:]')) AS n_punct
             |  FROM documents),
             |q AS (
             |  SELECT doc_id, CAST(LEN(toks) AS BIGINT) AS n_words,
             |         ROUND(CAST(n_punct AS DOUBLE) / n_chars, 6) AS punct_ratio,
             |         ROUND(CAST(LEN(list_filter(toks,
             |               w -> w IN ('the','a','of','and','to','in','is','it')))
             |               AS DOUBLE) / LEN(toks), 6) AS stopword_ratio
             |  FROM t)
             |SELECT doc_id, n_words, punct_ratio, stopword_ratio FROM q
             |WHERE n_words >= 5 AND punct_ratio < 0.1
             |  AND stopword_ratio >= 0.02
             |ORDER BY doc_id""".stripMargin)),

    // ── FILE-SINK streaming quality gate, EXECUTED — the production
    //    ingest TOPOLOGY twin of stream_quality_filter: the same
    //    stateless gate drains through Spark's native parquet FileSink
    //    (executor-side commits, _spark_metadata exactly-once), so the
    //    driver never buffers an output row; the channel reads the
    //    committed files back and the oracle hash rides the on-disk
    //    bytes. Shares pipeline_quality_filter's exact oracle. ─────────
    QueryDef(
      "stream_quality_filter_files",
      (s, d) =>
        graft.streaming.EventsStream.qualityFilterFilesAvailableNow(s, d)
          .orderBy(col("doc_id")),
      Some("""WITH t AS (
             |  SELECT doc_id, LENGTH(text) AS n_chars,
             |         regexp_extract_all(lower(text), '\w+') AS toks,
             |         LEN(regexp_extract_all(text, '[.,!?;:]')) AS n_punct
             |  FROM documents),
             |q AS (
             |  SELECT doc_id, CAST(LEN(toks) AS BIGINT) AS n_words,
             |         ROUND(CAST(n_punct AS DOUBLE) / n_chars, 6) AS punct_ratio,
             |         ROUND(CAST(LEN(list_filter(toks,
             |               w -> w IN ('the','a','of','and','to','in','is','it')))
             |               AS DOUBLE) / LEN(toks), 6) AS stopword_ratio
             |  FROM t)
             |SELECT doc_id, n_words, punct_ratio, stopword_ratio FROM q
             |WHERE n_words >= 5 AND punct_ratio < 0.1
             |  AND stopword_ratio >= 0.02
             |ORDER BY doc_id""".stripMargin)),

    // ── RESTART RECOVERY, stateless — exactly-once ACROSS A CRASH:
    //    the quality gate's file-sink drain is killed mid-stream
    //    (batch N−2 dies on an injected corrupt chunk AFTER earlier
    //    batches committed through _spark_metadata), the chunk is
    //    repaired, and a second query resumes from the SAME checkpoint
    //    and sink. The offset log replays the aborted batch, the
    //    manifest admits it exactly once, and the read-back hash rides
    //    the committed bytes — so green here means the interrupted +
    //    resumed run equals an uninterrupted one byte for byte.
    //    Shares pipeline_quality_filter's exact oracle. ─────────────────
    QueryDef(
      "stream_restart_recovery",
      (s, d) =>
        graft.streaming.EventsStream.restartRecoveryAvailableNow(s, d)
          .orderBy(col("doc_id")),
      Some("""WITH t AS (
             |  SELECT doc_id, LENGTH(text) AS n_chars,
             |         regexp_extract_all(lower(text), '\w+') AS toks,
             |         LEN(regexp_extract_all(text, '[.,!?;:]')) AS n_punct
             |  FROM documents),
             |q AS (
             |  SELECT doc_id, CAST(LEN(toks) AS BIGINT) AS n_words,
             |         ROUND(CAST(n_punct AS DOUBLE) / n_chars, 6) AS punct_ratio,
             |         ROUND(CAST(LEN(list_filter(toks,
             |               w -> w IN ('the','a','of','and','to','in','is','it')))
             |               AS DOUBLE) / LEN(toks), 6) AS stopword_ratio
             |  FROM t)
             |SELECT doc_id, n_words, punct_ratio, stopword_ratio FROM q
             |WHERE n_words >= 5 AND punct_ratio < 0.1
             |  AND stopword_ratio >= 0.02
             |ORDER BY doc_id""".stripMargin)),

    // ── RESTART RECOVERY, STATEFUL — the state-store leg of the same
    //    contract: the watermarked hourly aggregation is killed after
    //    ≥1 committed micro-batch and resumed from its checkpoint; the
    //    state store recovers its last committed version, the replayed
    //    batch emits exactly once, and ts-range-ordered chunks keep the
    //    recovered watermark sequence monotone (nothing late-dropped).
    //    Same emitted prefix, same oracle as stream_hourly_events. ─────
    QueryDef(
      "stream_restart_stateful",
      (s, d) =>
        graft.streaming.EventsStream.restartRecoveryStatefulAvailableNow(s, d)
          .orderBy(col("hour"), col("event_type")),
      Some("""WITH m AS (SELECT MAX(ts) AS mx FROM events)
             |SELECT DATE_TRUNC('hour', ts) AS hour, event_type, COUNT(*) AS n,
             |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
             |FROM events, m
             |WHERE DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR <= mx - INTERVAL 2 HOUR
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ── Streaming MULTIMODAL ingest, EXECUTED (twelfth streaming
    //    channel): image files arrive through the binaryFile streaming
    //    source and the REAL decode + feature extraction
    //    (Multimodal.featureGrid) runs at ingest — stateless per-row,
    //    so ingest features are byte-identical to a batch pass. The
    //    engineered landing (solid-gray exact-palette PNGs keyed by
    //    doc_id) makes every channel sum formula-predictable, so the
    //    oracle re-derives the whole decode→sum chain from arithmetic. ──
    QueryDef(
      "stream_mm_ingest",
      (s, d) =>
        graft.streaming.EventsStream.mmIngestAvailableNow(s, d)
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |       CAST(((doc_id * 37) % 200) * (8 + doc_id % 9)
             |            * (6 + doc_id % 7) AS BIGINT) AS r_sum,
             |       CAST(((doc_id * 37) % 200) * (8 + doc_id % 9)
             |            * (6 + doc_id % 7) AS BIGINT) AS g_sum,
             |       CAST(((doc_id * 37) % 200) * (8 + doc_id % 9)
             |            * (6 + doc_id % 7) AS BIGINT) AS b_sum
             |FROM documents WHERE doc_id < 30
             |ORDER BY doc_id""".stripMargin)),

    // ── Streaming VIDEO ingest, EXECUTED (thirteenth streaming
    //    channel): GIF files land through the binaryFile source, the
    //    REAL multi-frame compositor explodes each arrival into frame
    //    rows, featureGrid sums every frame — one stateless flatMap
    //    chain, no stream-stream join (geometry rides the key). The
    //    oracle re-derives frame count, geometry, and every channel
    //    sum from the mm_video_frames construction formula. ────────────
    QueryDef(
      "stream_video_ingest",
      (s, d) =>
        graft.streaming.EventsStream.videoIngestAvailableNow(s, d)
          .orderBy(col("doc_id"), col("frame_idx")),
      Some("""WITH dd AS (
             |  SELECT doc_id, 16 + doc_id % 17 AS w, 12 + doc_id % 13 AS h,
             |         2 + doc_id % 5 AS nf
             |  FROM documents WHERE doc_id < 12),
             |f AS (
             |  SELECT doc_id, w, h, g.i AS fi,
             |         (doc_id * 37 + g.i * 53) % 200 AS gray
             |  FROM dd, UNNEST(range(0, nf)) AS g(i))
             |SELECT doc_id, CAST(fi AS INT) AS frame_idx,
             |       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
             |       CAST(gray * w * h AS BIGINT) AS r_sum,
             |       CAST(gray * w * h AS BIGINT) AS g_sum,
             |       CAST(gray * w * h AS BIGINT) AS b_sum
             |FROM f ORDER BY doc_id, frame_idx""".stripMargin)),

    // ── Native session_window, EXECUTED (seventh streaming channel):
    //    Spark's built-in session aggregation under the same gap and
    //    watermark as the custom flatMapGroupsWithState channel, so
    //    BOTH emission contracts are pinned. Two oracle-encoded
    //    semantic differences: session_end = last event + gap (the
    //    window end), and sessions emit ONLY when the watermark passes
    //    that end (no split-closed early emission). The merge boundary
    //    is INCLUSIVE — an exactly-30-min gap still merges (MemoryStream
    //    spec-pinned), the same > rule as the custom oracle. ────────────
    QueryDef(
      "stream_session_window",
      (s, d) =>
        graft.streaming.EventsStream.sessionWindowAvailableNow(s, d)
          .orderBy(col("user_id"), col("session_start")),
      Some("""WITH e AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
             |flags AS (
             |  SELECT user_id, tus, event_id,
             |         CASE WHEN LAG(tus) OVER w IS NULL
             |                OR tus - LAG(tus) OVER w > 1800000000
             |              THEN 1 ELSE 0 END AS new_session
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
             |s AS (
             |  SELECT user_id, tus,
             |         SUM(new_session) OVER (PARTITION BY user_id
             |                                ORDER BY tus, event_id
             |                                ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM flags),
             |g AS (
             |  SELECT user_id, sid, MIN(tus) AS start_us, MAX(tus) AS end_us,
             |         COUNT(*) AS n_events
             |  FROM s GROUP BY user_id, sid),
             |m AS (SELECT MAX(epoch_us(ts)) AS mx FROM events)
             |SELECT user_id,
             |       make_timestamp(start_us) AS session_start,
             |       make_timestamp(end_us + 1800000000) AS session_end,
             |       n_events
             |FROM g, m
             |WHERE end_us + 1800000000 <= mx - 3600000000
             |ORDER BY user_id, session_start""".stripMargin))
  )
}
