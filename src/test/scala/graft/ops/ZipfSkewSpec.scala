package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.must.Matchers

import graft.TestSpark

/** The Zipf-adversary fixture the r13 verdict asked for: one stopword
  * prefix holds the majority of the corpus's bigram mass — the exact
  * hot-key shape that melts a shuffle equi-join at corpus scale — and
  * the spec pins BOTH that bigramFluency's hybrid join BROADCASTS the
  * head counts (hot keys never cross a shuffle as join keys) and that
  * the de-skewed result is bit-identical to the brute instance-level
  * formulation the oracle encodes.
  */
class ZipfSkewSpec extends AnyFlatSpec with Matchers {
  private lazy val spark = TestSpark.spark

  private def flat(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => flat(a.executedPlan)
    case q: QueryStageExec => q +: flat(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      r +: flat(r.child)
    case other => other +: (other.children.flatMap(flat) ++
      other.subqueries.flatMap(flat))
  }

  /** ~60% of all bigram instances share the prefix "the"; the tail is
    * a per-doc unique vocabulary (worst case for the count tables). */
  private def zipfDocs: DataFrame = {
    val s = spark
    import s.implicits._
    (0L until 300L).map { id =>
      // a 30-token stopword run: every head bigram is the SAME key
      // ("the the") — maximal hot-key concentration on both the bigram
      // and the prefix join
      val head = Seq.fill(30)("the").mkString(" ")
      val tail = (0 until 12).map(j => s"u${id}x$j v${id}y$j").mkString(" ")
      (id, s"$head $tail", "en", "web", 0L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** The pre-de-skew instance-level formulation, verbatim — the shape
    * the DuckDB oracle encodes. */
  private def bruteFluency(docs: DataFrame): DataFrame = {
    val bigrams = docs
      .select(col("doc_id"), explode(array(TextAnalysis.tokens)).as("toks"))
      .select(col("doc_id"),
        explode(expr(
          """zip_with(
            |  slice(toks, 1, greatest(size(toks) - 1, 0)),
            |  slice(toks, 2, greatest(size(toks) - 1, 0)),
            |  (a, b) -> concat(a, ' ', b))""".stripMargin)).as("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val cb = bigrams.groupBy(col("bg"))
      .agg(count(lit(1)).cast("long").as("cb"))
    val cp = bigrams.groupBy(col("w1"))
      .agg(count(lit(1)).cast("long").as("cp"))
    bigrams.join(cb, "bg").join(cp, "w1")
      .withColumn("r", col("cb").cast("double") / col("cp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        round(
          sum(col("r").cast(org.apache.spark.sql.types.DecimalType(28, 8)))
            .cast("double") / count(lit(1)), 6).as("fluency"))
  }

  behavior of "TextAnalysis.bigramFluency under Zipf-extreme skew"

  it must "hold >=50% of bigram mass on one prefix in the fixture (adversary is real)" in {
    val bigrams = zipfDocs
      .select(col("doc_id"), explode(array(TextAnalysis.tokens)).as("toks"))
      .select(explode(expr(
        """zip_with(
          |  slice(toks, 1, greatest(size(toks) - 1, 0)),
          |  slice(toks, 2, greatest(size(toks) - 1, 0)),
          |  (a, b) -> concat(a, ' ', b))""".stripMargin)).as("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val total = bigrams.count()
    val headMass = bigrams.filter(col("w1") === "the").count()
    headMass.toDouble / total must be >= 0.5
  }

  it must "broadcast the head count tables so hot keys never shuffle as join keys" in {
    // a small headM forces a real head/tail split in the fixture: the
    // "the …" bigrams land in the head (broadcast), the per-doc-unique
    // tail goes through the shuffle join WITHOUT the hot prefix
    val out = TextAnalysis.bigramFluency(zipfDocs, headM = 16)
    out.collect().length must be(300)
    val nodes = flat(out.queryExecution.executedPlan)
    // two head inner joins + two head anti joins, all broadcast — the
    // executed-plan form of "the hot keys ride a broadcast, not a
    // shuffle" (tail joins may also end up broadcast under AQE at this
    // fixture size; the floor is what the claim needs)
    nodes.count(_.isInstanceOf[BroadcastHashJoinExec]) must be >= 2
    nodes.count(n => n.isInstanceOf[BroadcastHashJoinExec] &&
      n.toString.contains("LeftAnti")) must be >= 2
  }

  it must "stay bit-identical to the instance-level oracle formulation" in {
    val deskew = TextAnalysis.bigramFluency(zipfDocs, headM = 16)
      .orderBy("doc_id").collect().map(_.toString)
    val brute = bruteFluency(zipfDocs)
      .orderBy("doc_id").collect().map(_.toString)
    deskew must be(brute)
  }

  it must "stay bit-identical when the head swallows everything and when it is empty" in {
    val allHead = TextAnalysis.bigramFluency(zipfDocs, headM = 1000000)
      .orderBy("doc_id").collect().map(_.toString)
    val noHead = TextAnalysis.bigramFluency(zipfDocs, headM = 0)
      .orderBy("doc_id").collect().map(_.toString)
    val brute = bruteFluency(zipfDocs)
      .orderBy("doc_id").collect().map(_.toString)
    allHead must be(brute)
    noHead must be(brute)
  }

  behavior of "Curation.dsirScores under Zipf-extreme skew"

  /** The instance-level formulation: every bigram occurrence rides the
    * ratio join individually (no per-(doc, bucket) pre-aggregation) —
    * the shape whose hot bucket WOULD concentrate on one task. */
  private def bruteDsir(docs: DataFrame,
                        isTarget: org.apache.spark.sql.Column): DataFrame = {
    val bg = docs
      .select(col("doc_id"), isTarget.as("tgt"),
        explode(array(TextAnalysis.tokens)).as("toks"))
      .select(col("doc_id"), col("tgt"),
        explode(expr(
          """zip_with(
            |  slice(toks, 1, greatest(size(toks) - 1, 0)),
            |  slice(toks, 2, greatest(size(toks) - 1, 0)),
            |  (a, b) -> concat(a, ' ', b))""".stripMargin)).as("bg"))
      .withColumn("bk",
        expr("cast(conv(substring(md5(bg), 1, 8), 16, 10) as bigint) % 256"))
    val ratios = bg.groupBy(col("bk"))
      .agg(count(lit(1)).cast("long").as("cr"),
        sum(when(col("tgt"), 1L).otherwise(0L)).cast("long").as("ct"))
      .withColumn("ratio", expr("((ct + 1) * 1000000L) div (cr + 1)"))
      .select(col("bk"), col("ratio"))
    bg.join(ratios, Seq("bk"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        sum(col("ratio")).cast("long").as("score"))
      .withColumn("avg_weight", expr("score div n_bigrams"))
  }

  it must "pre-aggregate the hot bucket and broadcast the ratio table" in {
    // the "the the" bigram — >=50% of all instances — folds to ONE row
    // per doc before any join, and the 256-row ratio table broadcasts:
    // the hot bucket never crosses a shuffle as a join key
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val out = Curation.dsirScores(zipfDocs, col("doc_id") % 3 === 0)
    out.collect().length must be(300)
    val nodes = flat(out.queryExecution.executedPlan)
    nodes.count(_.isInstanceOf[BroadcastHashJoinExec]) must be >= 1
    nodes.count(_.isInstanceOf[SortMergeJoinExec]) must be(0)
  }

  it must "stay bit-identical to the instance-level formulation" in {
    val preAgg = Curation.dsirScores(zipfDocs, col("doc_id") % 3 === 0)
      .select("doc_id", "n_bigrams", "score", "avg_weight")
      .orderBy("doc_id").collect().map(_.toString)
    val brute = bruteDsir(zipfDocs, col("doc_id") % 3 === 0)
      .select("doc_id", "n_bigrams", "score", "avg_weight")
      .orderBy("doc_id").collect().map(_.toString)
    preAgg must be(brute)
  }

  // ── histogram-cut rankers under a dominant stratum ──────────────────

  /** Every single-key WindowExec (partitioned by the group alone) must
    * run over the score HISTOGRAM — witnessed by a (group, score)
    * aggregate below it — never over the corpus: the executed-plan form
    * of "a dominant language/domain never sorts on one task". Per-row
    * windows are allowed only when the partition key includes the
    * score (tie-stratum-bounded).
    */
  private def assertHistogramWindows(df: DataFrame): Unit = {
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    import org.apache.spark.sql.execution.window.WindowExec
    def grouping(p: SparkPlan): Int = p match {
      case h: HashAggregateExec => h.groupingExpressions.size
      case o: ObjectHashAggregateExec => o.groupingExpressions.size
      case s: SortAggregateExec => s.groupingExpressions.size
      case _ => -1
    }
    val nodes = flat(df.queryExecution.executedPlan)
    val windows = nodes.collect { case w: WindowExec => w }
    windows must not be empty
    windows.filter(_.partitionSpec.size == 1).foreach { w =>
      withClue(s"single-key window over a non-histogram input: $w") {
        flat(w.child).exists(grouping(_) >= 2) must be(true)
      }
    }
  }

  /** 90% of the corpus is ONE language — the whole-language window
    * sort the r14 verdict flagged would put all 270 zz docs on a
    * single task. Repeated texts inject real fluency TIES so the
    * boundary-stratum path executes too. */
  private def langSkewDocs: DataFrame = {
    val s = spark
    import s.implicits._
    (0L until 300L).map { id =>
      val lang = if (id < 270L) "zz" else "en"
      // ids ≡ 0 (mod 3) share text pairwise (ties); others unique
      val t = if (id % 3 == 0) s"tie tok${id % 30} common words here"
              else s"u${id}a u${id}b u${id}c common words here"
      (id, t, lang, "web", 0L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  behavior of "Curation.ccnetBuckets under language skew"

  it must "derive tercile cuts from the histogram, never a whole-language sort" in {
    val out = Curation.ccnetBuckets(langSkewDocs)
    out.collect().length must be(300)
    assertHistogramWindows(out)
  }

  it must "stay bit-identical to the ntile window formulation" in {
    import org.apache.spark.sql.expressions.Window
    val fl = TextAnalysis.bigramFluency(langSkewDocs)
      .select(col("doc_id"), col("fluency"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("fluency").desc, col("doc_id"))
    val brute = langSkewDocs.select(col("doc_id"), col("lang"))
      .join(fl, Seq("doc_id"))
      .withColumn("bucket", ntile(3).over(w))
      .withColumn("ppl_bucket",
        when(col("bucket") === 1, "head")
          .when(col("bucket") === 2, "middle").otherwise("tail"))
      .orderBy("doc_id").collect().map(_.toString)
    val hist = Curation.ccnetBuckets(langSkewDocs)
      .orderBy("doc_id").collect().map(_.toString)
    hist must be(brute)
  }

  behavior of "Curation.quantileGate under domain skew"

  it must "rank through the score histogram and match percent_rank exactly" in {
    import org.apache.spark.sql.expressions.Window
    val s = spark
    import s.implicits._
    // 90% of docs in one domain, scores heavily tied (7 distinct
    // values) — both the dominant-group and dominant-stratum shapes
    val docs = (0L until 300L).map { id =>
      (id, if (id < 270L) "hot.com" else s"d${id % 5}.org", id % 7)
    }.toDF("doc_id", "grp", "score")
    val gate = Curation.quantileGate(docs, col("grp"), col("score"), 0.6)
    val got = gate.select("doc_id", "grp", "score", "pr")
      .orderBy("doc_id").collect().map(_.toString)
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("score").desc, col("doc_id"))
    val brute = docs.withColumn("pr", percent_rank().over(w))
      .filter(col("pr") < 0.6)
      .select("doc_id", "grp", "score", "pr")
      .orderBy("doc_id").collect().map(_.toString)
    got must be(brute)
    assertHistogramWindows(gate)
  }

  behavior of "Curation.nbQualityScores under Zipf-extreme skew"

  /** The instance-level NB formulation: every bigram occurrence rides
    * the weight join individually (no (doc, bucket) pre-aggregation) —
    * the shape whose hot stopword bucket WOULD concentrate on one task.
    */
  private def bruteNb(docs: DataFrame,
                      label: org.apache.spark.sql.Column,
                      isTrain: org.apache.spark.sql.Column): DataFrame = {
    val bg = docs
      .select(col("doc_id"),
        explode(array(TextAnalysis.tokens)).as("toks"), col("text"))
      .select(col("doc_id"), label.as("tgt"),
        explode(expr(
          """zip_with(
            |  slice(toks, 1, greatest(size(toks) - 1, 0)),
            |  slice(toks, 2, greatest(size(toks) - 1, 0)),
            |  (a, b) -> concat(a, ' ', b))""".stripMargin)).as("bg"))
      .withColumn("bk",
        expr("cast(conv(substring(md5(bg), 1, 8), 16, 10) as bigint) % 256"))
    val stats = bg.groupBy(col("bk"))
      .agg(sum(when(isTrain && col("tgt"), 1L).otherwise(0L))
          .cast("long").as("cp"),
        sum(when(isTrain && !col("tgt"), 1L).otherwise(0L))
          .cast("long").as("cn"))
    val weights = stats.select(col("bk"),
      expr(s"${Curation.fplog2Sql("(cp + 1)")} - " +
        s"${Curation.fplog2Sql("(cn + 1)")}").cast("long").as("w"))
    val k = stats.agg(sum(col("cp")).cast("long").as("tp"),
        sum(col("cn")).cast("long").as("tn"))
      .select(expr(s"${Curation.fplog2Sql("(tp + 256)")} - " +
        s"${Curation.fplog2Sql("(tn + 256)")}").cast("long").as("k"))
    docs.select(col("doc_id"))
      .join(bg.join(weights, Seq("bk"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).cast("long").as("n_bigrams"),
            sum(coalesce(col("w"), lit(0L))).cast("long").as("raw")),
        Seq("doc_id"), "left")
      .crossJoin(broadcast(k))
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        (coalesce(col("raw"), lit(0L)) -
          coalesce(col("n_bigrams"), lit(0L)) * col("k")).as("score"))
      .withColumn("predicted", col("score") > 0)
  }

  it must "pre-aggregate the hot bucket and broadcast weights + class mass" in {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val out = Curation.nbQualityScores(zipfDocs,
      label = col("doc_id") % 3 === 0, isTrain = col("doc_id") % 10 =!= 0)
    out.collect().length must be(300)
    val nodes = flat(out.queryExecution.executedPlan)
    // weight table (256 rows) and class-mass constant (1 row) both
    // broadcast; the hot "the the" bucket never shuffles as a join key
    nodes.count(_.isInstanceOf[BroadcastHashJoinExec]) +
      nodes.count(_.isInstanceOf[
        org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]) must be >= 2
    nodes.count(_.isInstanceOf[SortMergeJoinExec]) must be(0)
  }

  it must "stay bit-identical to the instance-level NB formulation" in {
    val label = col("doc_id") % 3 === 0
    val isTrain = col("doc_id") % 10 =!= 0
    val preAgg = Curation.nbQualityScores(zipfDocs, label, isTrain)
      .orderBy("doc_id").collect().map(_.toString)
    val brute = bruteNb(zipfDocs, label, isTrain)
      .orderBy("doc_id").collect().map(_.toString)
    preAgg must be(brute)
  }
}
