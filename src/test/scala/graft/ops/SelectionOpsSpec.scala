package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.must.Matchers

import graft.TestSpark

/** Hand-computed fixtures for the data-selection ops added in round 14's
  * third session: the C4 cleaning battery, DSIR importance weights,
  * histogram-cut token-budget selection, and CCNet perplexity terciles.
  */
class SelectionOpsSpec extends AnyFlatSpec with Matchers {
  private lazy val spark = TestSpark.spark

  private def docsDf(docs: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    docs.toDF("doc_id", "text")
  }

  behavior of "TextAnalysis.c4Filters"

  it must "fire every line rule and both page poisons independently" in {
    val clean3 = Seq(
      "good clean sentence here.",
      "another fine sentence today!",
      "a third proper line?").mkString("\n")
    val mixed = Seq(
      "good clean sentence here.",   // kept
      "no terminal punct line",      // dropped: no . ! ? "
      "click Javascript now here.",  // dropped: javascript
      "ok.",                         // dropped: < 3 words
      "another fine sentence today!" // kept
    ).mkString("\n")
    val lorem = clean3 + "\nthis has lorem ipsum inside."
    val brace = clean3 + "\ncode sample { nope }."
    val out = TextAnalysis.c4Filters(docsDf(Seq(
        1L -> clean3, 2L -> mixed, 3L -> lorem, 4L -> brace)))
      .orderBy("doc_id").collect()
    def row(id: Long): Row = out.find(_.getLong(0) == id).get
    row(1L).getAs[Long]("n_lines") must be(3L)
    row(1L).getAs[Long]("n_kept") must be(3L)
    row(1L).getAs[Boolean]("page_ok") must be(true)
    row(1L).getAs[String]("cleaned") must be(clean3)
    // the mixed page keeps exactly the two clean lines, in order, but
    // falls under the >=3 kept-lines page gate
    row(2L).getAs[Long]("n_lines") must be(5L)
    row(2L).getAs[Long]("n_kept") must be(2L)
    row(2L).getAs[Boolean]("page_ok") must be(false)
    row(2L).getAs[String]("cleaned") must be("")
    // page poisons kill regardless of kept-line count; the poison line
    // itself would even have survived the line gates
    Seq(3L, 4L).foreach { id =>
      row(id).getAs[Long]("n_kept") must be(4L)
      row(id).getAs[Boolean]("page_ok") must be(false)
      row(id).getAs[String]("cleaned") must be("")
    }
  }

  it must "keep line order in cleaned text and read the corpus once" in {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def flat(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flat(a.executedPlan)
      case q: QueryStageExec => q +: flat(q.plan)
      case other => other +: (other.children.flatMap(flat) ++
        other.subqueries.flatMap(flat))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-c4-plan")
    try {
      docsDf((0L until 40L).map(i => i ->
          (s"alpha beta gamma line$i." + "\nmid line no punct" +
            s"\nomega psi chi end$i!")))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val out = TextAnalysis.c4Filters(docs, minKeptLines = 2)
      val rows = out.collect()
      rows.foreach { r =>
        r.getAs[Boolean]("page_ok") must be(true)
        val id = r.getAs[Long]("doc_id")
        r.getAs[String]("cleaned") must be(
          s"alpha beta gamma line$id.\nomega psi chi end$id!")
      }
      flat(out.queryExecution.executedPlan)
        .count(_.isInstanceOf[FileSourceScanExec]) must be(1)
    } finally {
      graft.PlanHygiene.deleteRecursively(dir)
    }
  }

  behavior of "Curation.dsirScores"

  /** The Scala twin of the op's md5 bucket (and the DuckDB oracle's):
    * first 8 hex chars of md5, as a long, mod buckets.
    */
  private def bucketOf(bigram: String, buckets: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bigram.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16) % buckets
  }

  it must "reproduce the hand-computed integer ratio ladder" in {
    val s = spark
    import s.implicits._
    // target doc: "a b a b" → bigrams (a b)×2, (b a)×1
    // raw doc:    "x y x y" → bigrams (x y)×2, (y x)×1
    val df = Seq((1L, true, "a b a b"), (2L, false, "x y x y"))
      .toDF("doc_id", "tgt", "text")
    val out = Curation.dsirScores(df, col("tgt"), buckets = 256)
      .orderBy("doc_id").collect()
    // expected bucket counts (collision-free for these four bigrams is
    // asserted below, not assumed)
    val bks = Seq("a b", "b a", "x y", "y x").map(bucketOf(_, 256))
    bks.distinct.size must be(4)
    def ratio(ct: Long, cr: Long): Long = ((ct + 1) * 1000000L) / (cr + 1)
    // doc 1: 2·ratio(2,2) + 1·ratio(1,1); doc 2: 2·ratio(0,2) + 1·ratio(0,1)
    val exp1 = 2 * ratio(2, 2) + 1 * ratio(1, 1)
    val exp2 = 2 * ratio(0, 2) + 1 * ratio(0, 1)
    val r1 = out.find(_.getLong(0) == 1L).get
    val r2 = out.find(_.getLong(0) == 2L).get
    r1.getAs[Long]("n_bigrams") must be(3L)
    r1.getAs[Long]("score") must be(exp1)
    r1.getAs[Long]("avg_weight") must be(exp1 / 3)
    r2.getAs[Long]("score") must be(exp2)
    // target-like text outranks raw-only text
    r1.getAs[Long]("avg_weight") must be > r2.getAs[Long]("avg_weight")
  }

  it must "broadcast the bucket-ratio table (no shuffle join on buckets)" in {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
    def flat(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flat(a.executedPlan)
      case q: QueryStageExec => q +: flat(q.plan)
      case other => other +: (other.children.flatMap(flat) ++
        other.subqueries.flatMap(flat))
    }
    val df = docsDf((0L until 60L).map(i =>
      i -> s"tok${i % 5} tok${(i * 3) % 7} tok${(i * 5) % 11} fin"))
    val out = Curation.dsirScores(df, col("doc_id") % 2 === 0)
    out.collect()
    val nodes = flat(out.queryExecution.executedPlan)
    nodes.count(_.isInstanceOf[BroadcastHashJoinExec]) must be >= 1
    nodes.count(_.isInstanceOf[SortMergeJoinExec]) must be(0)
  }

  behavior of "Curation dsir stats index (save / pure-append / score)"

  it must "score an increment through folded generations identically to batch DSIR" in {
    val s = spark
    val docs = docsDf((0L until 80L).map(i =>
        i -> s"tok${i % 9} tok${(i * 3) % 7} tok${(i * 5) % 11} w$i end"))
      .withColumn("tgt", col("doc_id") % 4 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir-spec")
    try {
      val hist = docs.filter(col("doc_id") % 10 =!= 0)
      val inc = docs.filter(col("doc_id") % 10 === 0)
      Curation.saveDsirStats(hist, col("tgt"), dir.toString)
      Curation.appendToDsirStats(inc, col("tgt"), dir.toString)
      val indexed = Curation.dsirScoresIndexed(s, inc, dir.toString)
        .orderBy("doc_id").collect().map(_.toString)
      val batch = Curation.dsirScores(docs, col("tgt"))
        .filter(col("doc_id") % 10 === 0)
        .orderBy("doc_id").collect().map(_.toString)
      indexed must be(batch)
      // the ingest really was pure-append: both generations' row sets
      // survive on disk (a bucket hit by both batches carries TWO rows
      // — no read-modify-write of history)
      val gens = s.read.parquet(s"$dir/stats")
      gens.count() must be > gens.select("bk").distinct().count()
      val folded = gens.groupBy("bk")
        .agg(sum("cr").as("cr")).agg(sum("cr")).collect()(0).getLong(0)
      // folded raw mass = every bigram instance in the full corpus
      val totalBigrams = Curation.dsirScores(docs, col("tgt"))
        .agg(sum("n_bigrams")).collect()(0).getLong(0)
      folded must be(totalBigrams)
    } finally graft.PlanHygiene.deleteRecursively(dir)
  }

  it must "smooth unseen buckets to the uniform ratio when scoring new docs" in {
    val s = spark
    // history covers ONE bigram bucket; the scored doc's bigram hashes
    // elsewhere — under the documented add-1 smoothing it must emit a
    // row with the uniform ratio (0+1)*scale div (0+1) = scale, not
    // silently vanish from an inner join
    val hist = docsDf(Seq(1L -> "alpha beta")).withColumn("tgt", lit(true))
    val fresh = docsDf(Seq(9L -> "gamma delta"))
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir-smooth")
    try {
      Curation.saveDsirStats(hist, col("tgt"), dir.toString)
      val out = Curation.dsirScoresIndexed(s, fresh, dir.toString)
        .collect()
      out.length must be(1)
      out(0).getAs[Long]("n_bigrams") must be(1L)
      out(0).getAs[Long]("avg_weight") must be(1000000L)
    } finally graft.PlanHygiene.deleteRecursively(dir)
  }

  behavior of "Similarity.rangeSearch"

  it must "return exactly the neighbors at or above tau, and never shuffle" in {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def flat(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flat(a.executedPlan)
      case q: QueryStageExec => q +: flat(q.plan)
      case other => other +: (other.children.flatMap(flat) ++
        other.subqueries.flatMap(flat))
    }
    // unit vectors with hand-known cosines against q0 = (1, 0):
    // a = 1.0, b = 0.8, c = 0.0, d = -1.0
    val corpus = Seq(
      (0L, Array(1f, 0f)), (1L, Array(1f, 0f)), (2L, Array(0.8f, 0.6f)),
      (3L, Array(0f, 1f)), (4L, Array(-1f, 0f)))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") === 0L)
    val out = Similarity.rangeSearch(queries, corpus, tau = 0.5)
    val rows = out.collect()
    rows.map(_.getLong(1)).sorted must be(Array(1L, 2L))
    rows.foreach(_.getDouble(2) must be >= 0.5)
    // the op is one scan + broadcast + map-side filter: no exchange
    flat(out.queryExecution.executedPlan)
      .count(_.isInstanceOf[ShuffleExchangeExec]) must be(0)
  }

  behavior of "Curation.tokenBudgetSelect"

  private def scored(rows: Seq[(Long, Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "sc", "ct")
  }

  it must "take whole strata above the cut and a doc_id prefix of the boundary" in {
    val rows = Seq(
      (1L, 5L, 10L), (2L, 5L, 10L),            // stratum 5: mass 20
      (3L, 4L, 10L),                            // stratum 4: cum 30
      (4L, 3L, 10L), (5L, 3L, 10L), (6L, 3L, 10L), // stratum 3: cum 60
      (7L, 2L, 10L))
    // budget 45: strata 5 and 4 whole (used 30), remaining 15 fills
    // doc 4 (cum 10) but not doc 5 (cum 20)
    val out = Curation.tokenBudgetSelect(scored(rows), col("sc"), col("ct"),
        budget = 45L)
      .collect().map(_.getLong(0)).sorted
    out must be(Array(1L, 2L, 3L, 4L))
  }

  it must "handle the budget inside the top stratum and the everything-fits case" in {
    val rows = Seq((1L, 5L, 10L), (2L, 5L, 10L), (3L, 4L, 10L))
    // budget 15 < top stratum mass 20: tau_full is null, boundary is the
    // top stratum itself, doc 1 fits (10 <= 15), doc 2 does not
    Curation.tokenBudgetSelect(scored(rows), col("sc"), col("ct"), 15L)
      .collect().map(_.getLong(0)).sorted must be(Array(1L))
    // budget beyond total mass: every doc selected, no boundary at all
    Curation.tokenBudgetSelect(scored(rows), col("sc"), col("ct"), 1000L)
      .collect().map(_.getLong(0)).sorted must be(Array(1L, 2L, 3L))
  }

  it must "never exceed the budget and be prefix-monotone in it" in {
    val rows = (1L to 40L).map(i => (i, i % 7, 5 + i % 11))
    val df = scored(rows)
    val costs = rows.map(r => r._1 -> r._3).toMap
    var prev = Set.empty[Long]
    Seq(30L, 90L, 200L, 500L).foreach { b =>
      val sel = Curation.tokenBudgetSelect(df, col("sc"), col("ct"), b)
        .collect().map(_.getLong(0)).toSet
      sel.toSeq.map(costs).sum must be <= b
      // a larger budget only ever ADDS documents
      prev.subsetOf(sel) must be(true)
      prev = sel
    }
  }

  behavior of "TextAnalysis.stripHtml"

  it must "drop blocks whole, strip tags, and decode entities exactly once" in {
    val html = "<html><head><style>p { x }</style>" +
      "<script>if (1 < 2) { alert('hi') }</script></head>" +
      "<body><!-- note --><h1>Title</h1><p>plain <b>bold</b> text</p>" +
      "<div>A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;" +
      "and &amp;lt; survives</div></body></html>"
    val out = TextAnalysis.stripHtml(docsDf(Seq(1L -> html))).collect()
    out(0).getAs[String]("text") must be(
      "Title plain bold text A & B <tag> \"q\" 's' and &lt; survives")
    out(0).getAs[Long]("n_chars_raw") must be(html.length.toLong)
    out(0).getAs[Long]("n_chars_text") must be(
      out(0).getAs[String]("text").length.toLong)
  }

  it must "pass plain text through modulo whitespace collapse" in {
    val out = TextAnalysis.stripHtml(
      docsDf(Seq(2L -> "no  markup\n here"))).collect()
    out(0).getAs[String]("text") must be("no markup here")
  }

  it must "decode identically to the sequential regex chain the oracle runs" in {
    // the HtmlEntities scaladoc's equivalence contract, exercised: the
    // single-scan kernel must be bit-identical to applying the table's
    // regex rows as sequential global passes (what the DuckDB oracle
    // does) on adversarial entity soup — truncated entities, unknown
    // names/codepoints, zero-padding, hex case mixes, nested amp traps
    import graft.functions.HtmlEntities
    def viaRegexChain(s: String): String =
      HtmlEntities.regexRows.foldLeft(s) { case (acc, (pat, rep)) =>
        acc.replaceAll(pat, java.util.regex.Matcher.quoteReplacement(rep))
      }
    val frags = Seq("&", "#", ";", "x", "X", "0", "39", "amp", "lt;",
      "&amp;", "&#038;", "&#x26;", "&#X2014;", "&#0*60;", "&unknown;",
      "&#999;", "&#xzz;", "&copy", "&&lt;&", "a b", "&#0000169;",
      "&#x000A9;", "&nbsp;&nbsp;", "&apos", "&;", "&#;", "&#x;",
      "&#160;", "&#xa0;", "&#xA0;", "&#0160;", "&#32;", "&#x20;")
    val rng = new scala.util.Random(7)
    (1 to 300).foreach { _ =>
      val s = (1 to (1 + rng.nextInt(12)))
        .map(_ => frags(rng.nextInt(frags.size))).mkString
      val got = HtmlEntities.decode(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString
      withClue(s"input <$s>: ") { got must be(viaRegexChain(s)) }
    }
  }

  it must "decode numeric and extended named entities, once each" in {
    // decimal with and without leading zeros, hex in either case of
    // both the x and the hex letters, typographic punctuation, and the
    // numeric-amp double-decode traps (&amp;#60; / &#038;lt; must
    // surface as the LITERALS &#60; / &lt; — one decode, never two)
    val html = "<p>&#x27;a&#039; &rsquo;b&#8217; &#X2014;c&mdash; " +
      "d&hellip; &#169;&copy; &ndash;&#x2013; &ldquo;q&#x201D; " +
      "&amp;#60; &#038;lt; &#x26;gt;</p>"
    val out = TextAnalysis.stripHtml(docsDf(Seq(3L -> html))).collect()
    out(0).getAs[String]("text") must be(
      "'a' ’b’ —c— d… ©© " +
        "–– “q” &#60; &lt; &gt;")
  }

  it must "decode numeric NBSP to plain space and leave &#32; alone" in {
    // the r15 ADVICE gap: nbsp keyed at codepoint 32 decoded the
    // synthetic &#32; while the real-crawl numeric NBSP forms stayed
    // encoded; the table now keys nbsp at 160 with a normalize-to-space
    // replacement, so &#160;/&#xa0; fold like &nbsp; always did
    import graft.functions.HtmlEntities
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u8}
    HtmlEntities.decode(u8("a&#160;b&#xa0;c&nbsp;d")).toString must be(
      "a b c d")
    HtmlEntities.decode(u8("a&#32;b&#x20;c")).toString must be(
      "a&#32;b&#x20;c")
  }

  behavior of "Similarity.ivfRangeSearch"

  it must "never invent a neighbor and never emit a pair twice under multi-probe" in {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") < 200)
    val exact = Similarity.rangeSearch(q, emb, 0.45)
      .select("q_id", "neighbor_id")
    val pruned = Similarity.ivfRangeSearch(q, emb, 0.45, numCentroids = 16,
      nprobe = 8, corpusProbe = 2)
    // precision is structural: every pruned pair is exact-cosine
    // verified, so pruned ⊆ exact
    pruned.join(exact, Seq("q_id", "neighbor_id"), "left_anti")
      .count() must be(0L)
    // corpusProbe = 2 lists vectors in two buckets; membership must
    // still be a SET
    pruned.count() must be(
      pruned.select("q_id", "neighbor_id").distinct().count())
  }

  behavior of "Dedup.dedupLinesWithinDoc"

  it must "keep first occurrences in order and count dropped repeats" in {
    val doc = Seq("alpha beta", "chorus line", "gamma delta",
      "chorus line", "chorus line", "alpha beta", "ref 1").mkString("\n")
    val out = Dedup.dedupLinesWithinDoc(docsDf(Seq(1L -> doc))).collect()
    out.length must be(1)
    out(0).getAs[Long]("n_lines") must be(7L)
    out(0).getAs[Long]("n_kept") must be(4L)
    out(0).getAs[String]("cleaned") must be(
      Seq("alpha beta", "chorus line", "gamma delta", "ref 1")
        .mkString("\n"))
  }

  it must "leave repeat-free documents untouched" in {
    val doc = Seq("one two", "three four", "five six").mkString("\n")
    val out = Dedup.dedupLinesWithinDoc(docsDf(Seq(7L -> doc))).collect()
    out(0).getAs[Long]("n_kept") must be(3L)
    out(0).getAs[String]("cleaned") must be(doc)
  }

  behavior of "Dedup.clusterSizes"

  it must "histogram component sizes and account every unpaired doc as a singleton" in {
    val s = spark
    import s.implicits._
    // 7 docs; pairs close {1,2,3} (triangle via chain) and {5,6}; docs
    // 4 and 7 are unpaired singletons
    val docs = (1L to 7L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Dedup.clusterSizes(docs, pairs)
      .orderBy("cluster_size").collect()
    out.map(r => (r.getLong(0), r.getLong(1))) must be(
      Array((1L, 2L), (2L, 1L), (3L, 1L)))
  }

  behavior of "Dedup.canonicalizeUrl"

  it must "apply every rule and only the matching default port" in {
    val s = spark
    import s.implicits._
    val cases = Seq(
      // noisy → fully canonicalized
      ("HTTPS://WWW.Ex.COM:443/p/?utm_s=1&id=2&utm_c=3#frag",
        "https://www.ex.com/p/?id=2"),
      // utm-only query collapses to no query at all
      ("https://ex.com/p?utm_only=1", "https://ex.com/p"),
      // :443 is NOT default for http and must survive
      ("http://ex.com:443/p", "http://ex.com:443/p"),
      ("http://EX.com:80/p?a=1&b=2", "http://ex.com/p?a=1&b=2"),
      // no query, no fragment: passthrough modulo case
      ("https://Ex.com/just/path", "https://ex.com/just/path"),
      // bare host
      ("https://EX.COM", "https://ex.com"),
      // literal '&' in the PATH (no query): untouched — must NOT
      // collide with the distinct URL https://ex.com/a?b
      ("https://ex.com/a&b", "https://ex.com/a&b"),
      ("https://ex.com/a?b", "https://ex.com/a?b"),
      // literal '?' inside a query VALUE survives; the utm param
      // around it still strips
      ("https://ex.com/p?x=a?b&utm_x=1&id=2", "https://ex.com/p?x=a?b&id=2"),
      // scheme-less / protocol-relative / garbage: pass through
      // UNCHANGED — never into a shared '://' sentinel group
      ("/relative/path?utm_s=1", "/relative/path?utm_s=1"),
      ("//cdn.site.com/asset/1", "//cdn.site.com/asset/1"),
      ("not a url at all", "not a url at all"))
    val out = cases.zipWithIndex
      .map { case ((raw, _), i) => (i.toLong, raw) }
      .toDF("doc_id", "url")
      .select(col("doc_id"), Dedup.canonicalizeUrl(col("url")).as("c"))
      .orderBy("doc_id").collect().map(_.getString(1))
    out must be(cases.map(_._2).toArray)
  }

  behavior of "Dedup.dupRates"

  it must "count per-source duplicates exactly" in {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "same text", "web"), (2L, "same text", "web"),
      (3L, "other text", "web"), (4L, "unique here", "books"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.dupRates(docs).orderBy("source").collect()
    val web = out.find(_.getString(0) == "web").get
    web.getAs[Long]("n_docs") must be(3L)
    web.getAs[Long]("n_unique") must be(2L)
    web.getAs[Long]("n_dup") must be(1L)
    web.getAs[Double]("dup_rate") must be(0.333333)
    val books = out.find(_.getString(0) == "books").get
    books.getAs[Long]("n_dup") must be(0L)
    books.getAs[Double]("dup_rate") must be(0.0)
  }

  it must "fold null text into one empty-content group (the pinned convention)" in {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, null: String, "web"), (2L, null: String, "web"),
      (3L, "", "web"), (4L, "real text", "web"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.dupRates(docs).collect()
    out.length must be(1)
    // null, null, '' all hash as the empty content → 2 uniques, 2 dups
    out(0).getAs[Long]("n_docs") must be(4L)
    out(0).getAs[Long]("n_unique") must be(2L)
    out(0).getAs[Long]("n_dup") must be(2L)
  }

  behavior of "Curation.ccnetBuckets"

  it must "cut each language's fluency ranking into balanced terciles" in {
    val s = spark
    import s.implicits._
    // lang A: 6 docs, fluency strictly ordered by construction —
    // "a a" bigram repeated k times has high C(w1 w2)/C(w1 ·) when k
    // dominates; simpler: craft docs sharing bigrams so fluency is
    // monotone in how often the doc's bigram occurs corpus-wide.
    val docs = Seq(
      // 3 docs of the common bigram, 3 of rarer ones (per lang)
      (1L, "A", "x y x y x y"), (2L, "A", "x y x y"), (3L, "A", "x y"),
      (4L, "A", "p q"), (5L, "A", "r s"), (6L, "A", "t u"),
      (7L, "B", "x y x y"), (8L, "B", "p q"), (9L, "B", "r s"))
      .toDF("doc_id", "lang", "text")
    val out = Curation.ccnetBuckets(docs).collect()
    val byLang = out.groupBy(_.getAs[String]("lang"))
    byLang("A").map(_.getAs[Int]("bucket")).sorted must be(
      Array(1, 1, 2, 2, 3, 3))
    byLang("B").map(_.getAs[Int]("bucket")).sorted must be(Array(1, 2, 3))
    // head fluency >= tail fluency within each lang
    byLang.values.foreach { rows =>
      val head = rows.filter(_.getAs[String]("ppl_bucket") == "head")
        .map(_.getAs[Double]("fluency")).min
      val tail = rows.filter(_.getAs[String]("ppl_bucket") == "tail")
        .map(_.getAs[Double]("fluency")).max
      head must be >= tail
    }
    // labels track bucket ids exactly
    out.foreach { r =>
      val expect = r.getAs[Int]("bucket") match {
        case 1 => "head"; case 2 => "middle"; case 3 => "tail"
      }
      r.getAs[String]("ppl_bucket") must be(expect)
    }
  }

  behavior of "Curation.fplog2Sql"

  it must "match floor(8*log2) at octave edges and stay strictly monotone" in {
    val s = spark
    import s.implicits._
    val vals = (1L to 2048L) ++ Seq(1000000L, 1048575L, 1048576L,
      1099511627776L)
    val got = vals.toDF("v")
      .select(col("v"), expr(Curation.fplog2Sql("v")).cast("long").as("fp"))
      .orderBy("v").collect().map(r => r.getLong(0) -> r.getLong(1))
    // exact anchors: fp(2^m) = 8m always; fp(2^m - 1) = 8m - 1 once the
    // octave holds a full 3-bit mantissa (m >= 4; below that the grid
    // is coarser: fp(3) = 12, fp(7) = 22)
    got.toMap.apply(1L) must be(0L)
    Seq(1, 2, 3, 4, 10).foreach { m =>
      got.toMap.apply(1L << m) must be(8L * m)
    }
    Seq(4, 10).foreach { m =>
      got.toMap.apply((1L << m) - 1) must be(8L * m - 1)
    }
    got.toMap.apply(3L) must be(12L) // 8*log2(3) = 12.68 -> 12
    got.toMap.apply(7L) must be(22L)
    got.toMap.apply(1099511627776L) must be(320L) // 2^40
    // never exceeds the real log, never lags by a full step, monotone
    got.foreach { case (v, fp) =>
      fp must be <= math.floor(8.0 * math.log(v.toDouble) / math.log(2.0))
        .toLong
      fp.toDouble must be >= 8.0 * math.log(v.toDouble) / math.log(2.0) - 8.0
    }
    got.sliding(2).foreach { case Array((_, a), (_, b)) => a must be <= b }
  }

  behavior of "Curation.nbQualityScores"

  it must "separate classes on held-out docs and keep bigram-less docs total" in {
    // quality docs share stopword-rich phrasing; junk docs share
    // noise phrasing — the classifier must learn the distinction from
    // the train slice (doc_id % 10 <> 0) and carry it to the held-out
    // docs (doc_id % 10 == 0), which contribute NOTHING to training
    val good = (0L until 40L).map(i =>
      i * 3 -> s"the quick study of the river and the stone g$i")
    val junk = (0L until 40L).map(i =>
      i * 3 + 1 -> s"zzz qqq xxx kkk www $i jjj yyy n$i")
    val lone = Seq(200L -> "solitary") // 1 token -> zero bigrams
    val docs = docsDf(good ++ junk ++ lone)
    val label = expr("text like 'the %'")
    val out = Curation.nbQualityScores(docs, label,
        isTrain = col("doc_id") % 10 =!= 0)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    out.size must be(docs.count().toInt) // totality: every doc emits
    // the bigram-less doc survives with the neutral score
    out(200L) must be((0L, 0L, false))
    // every doc classifies to its class — INCLUDING the held-out ones
    good.foreach { case (id, _) =>
      withClue(s"good doc $id: ") { out(id)._3 must be(true) }
    }
    junk.foreach { case (id, _) =>
      withClue(s"junk doc $id: ") { out(id)._3 must be(false) }
    }
  }
}
