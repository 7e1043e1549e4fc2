package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline, all built from
  * codegen'd built-ins (split/regexp/HOFs) — no UDFs, so every op stays
  * inside WholeStageCodegen and scales linearly with the corpus. Each op
  * is a narrow projection: at 100 TB the parquet scan reads only
  * (doc_id, text).
  */
object TextAnalysis {

  /** Word tokens (ASCII \w+, lowercased). */
  val tokens: Column = expr("regexp_extract_all(lower(text), '\\\\w+', 0)")

  /** Token/char/punctuation counting. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      size(tokens).cast("long").as("n_words"),
      size(array_distinct(tokens)).cast("long").as("n_distinct_words"),
      expr("size(regexp_extract_all(text, '[.,!?;:]', 0))").cast("long").as("n_punct"))

  /** Quality scoring: length/punctuation/stopword ratios.
    * All ratios are a single int/int double division — bit-identical
    * across engines — then rounded. Divisors go through nullif: an
    * EMPTY document (0 chars / 0 tokens — a raw crawl always has some)
    * gets NULL ratios instead of an ANSI DIVIDE_BY_ZERO that kills the
    * whole pass; every downstream gate's NULL comparison then drops
    * the doc, which is the curation semantics an empty doc deserves
    * (found by the Round13 degenerate-input sweep).
    */
  def quality(docs: DataFrame): DataFrame = {
    val stop = Seq("the", "a", "of", "and", "to", "in", "is", "it")
      .map(s => s"'$s'").mkString(", ")
    docs
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
        tokens.as("toks"),
        expr("size(regexp_extract_all(text, '[.,!?;:]', 0))").cast("long").as("n_punct"))
      .select(
        col("doc_id"),
        col("n_chars"),
        size(col("toks")).cast("long").as("n_words"),
        round(expr("aggregate(toks, CAST(0 AS BIGINT), (acc, w) -> acc + length(w))")
          .cast("double") / nullif(size(col("toks")).cast("double"), lit(0d)),
          4).as("avg_word_len"),
        round(col("n_punct").cast("double") /
          nullif(col("n_chars").cast("double"), lit(0d)), 6).as("punct_ratio"),
        round(expr(s"size(filter(toks, w -> w IN ($stop)))").cast("double") /
          nullif(size(col("toks")).cast("double"), lit(0d)), 6)
          .as("stopword_ratio"))
      .withColumn("quality_ok",
        col("n_words") >= 5 && col("punct_ratio") < 0.1)
  }

  /** Language ID by per-language stopword votes with a fixed tiebreak
    * order (en > es > de > fr) — a deterministic n-gram-free heuristic
    * whose CASE ladder is reproducible in ANSI SQL.
    */
  def langId(docs: DataFrame): DataFrame = {
    def votes(words: Seq[String]): String =
      s"size(filter(toks, w -> w IN (${words.map(w => s"'$w'").mkString(", ")})))"
    docs
      .select(col("doc_id"), tokens.as("toks"))
      .withColumn("s_en", expr(votes(Seq("the", "and", "of", "to", "a"))))
      .withColumn("s_es", expr(votes(Seq("el", "los", "que", "y", "es"))))
      .withColumn("s_de", expr(votes(Seq("der", "die", "und", "das", "ist"))))
      .withColumn("s_fr", expr(votes(Seq("le", "les", "et", "des", "une"))))
      .select(
        col("doc_id"),
        when(col("s_en") >= greatest(col("s_es"), col("s_de"), col("s_fr")), "en")
          .when(col("s_es") >= greatest(col("s_de"), col("s_fr")), "es")
          .when(col("s_de") >= col("s_fr"), "de")
          .otherwise("fr").as("lang_guess"),
        (col("s_en") + col("s_es") + col("s_de") + col("s_fr")).cast("long").as("n_votes"))
  }

  /** Within-document repetition signals — the Gopher-style quality
    * heuristics that catch degenerate generated/scraped text (a page
    * that is one word or one phrase repeated scores near 1.0 on the
    * top-*-ratio columns and gets filtered upstream of training):
    * distinct-word ratio, most-frequent-word mass, most-frequent-bigram
    * mass.
    *
    * Shape: words explode once (codegen Generate) into a
    * map-side-combined (doc_id, word) count; bigrams come from a
    * zip_with over two shifted slices — a LINEAR per-row lambda (unlike
    * pair generation, where chained posexplodes win — see Dedup's
    * header note) — and explode into their own count. No window sort,
    * no shuffle beyond the two partial-aggregated groupBys. Ratios are
    * one int/int double division each, bit-identical across engines,
    * then rounded.
    */
  def repetition(docs: DataFrame): DataFrame = {
    val words = docs.select(col("doc_id"), explode(tokens).as("w"))
    val wstats = words
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("long").as("n_words"),
        count(lit(1)).cast("long").as("n_distinct"),
        max(col("c")).cast("long").as("top_w"))
    val bigrams = docs
      // Generate barrier: the token array materializes ONCE per row —
      // without it CollapseProject inlines the tokenizer regex into
      // every slice/size reference below (4 evaluations per doc, the
      // HOF-inlining trap from Dedup's header note)
      .select(col("doc_id"), explode(array(tokens)).as("toks"))
      .select(col("doc_id"),
        explode(expr(
          """zip_with(
            |  slice(toks, 1, greatest(size(toks) - 1, 0)),
            |  slice(toks, 2, greatest(size(toks) - 1, 0)),
            |  (a, b) -> concat(a, ' ', b))""".stripMargin)).as("bg"))
    val bstats = bigrams
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"), max(col("c")).as("top_b"))
    // left join: a one-token doc has words but no bigrams — it keeps a
    // row with bigram mass 0 instead of vanishing
    wstats.join(bstats, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_words"),
        round(col("n_distinct").cast("double") / col("n_words"), 6)
          .as("distinct_word_ratio"),
        round(col("top_w").cast("double") / col("n_words"), 6)
          .as("top_word_ratio"),
        coalesce(round(col("top_b").cast("double") / col("n_bigrams"), 6),
          lit(0.0)).as("top_bigram_ratio"))
  }

  /** Bigram-fluency score — the deterministic analog of the
    * KenLM-perplexity quality filter every production corpus pass
    * runs: score(doc) = mean over the doc's bigram INSTANCES of the
    * corpus conditional relative frequency C(w1 w2) / C(w1 ·). Fluent
    * text strings common continuations together (high ratios); word
    * salad, OCR noise, and wrong-language fragments string rare ones
    * (ratios → 1/C(w1 ·)). A true LM uses log-probabilities, but ln is
    * libm-dependent across engines (the tfidf linear-idf rationale);
    * the linear mean keeps every term ONE IEEE division of exact Longs
    * and the per-doc mean routes through DECIMAL(28,8) quantization
    * (the bm25 scale discipline), so the whole score column
    * hash-checks cross-engine. Docs with fewer than two tokens have no
    * bigram and emit no row — a fluency gate composes a left-anti /
    * left-outer join by policy.
    *
    * Scale shape (r13 de-skew): the per-instance rows PRE-AGGREGATE to
    * one row per (doc, bigram) with multiplicity k before any join —
    * map-side combine collapses the stopword-head mass, and the
    * per-doc contribution k · q(cb/cp) is EXACTLY the instance-level
    * decimal sum (k copies of the same DECIMAL(28,8) value sum to
    * k × that value; the multiply is exact DECIMAL(38,8)), so the
    * oracle is unchanged. The pre-aggregation is the primary de-skew:
    * a stopword bigram crosses the shuffle once per DOC, not once per
    * occurrence, and AQE's skew-join splits any residual per-doc hot
    * partition at runtime (on in GraftSession). For Zipf-EXTREME
    * corpora (one prefix holding most of the mass — the ZipfSkewSpec
    * adversary), `headM > 0` additionally enables a HYBRID count join:
    * the top-M most frequent bigram/prefix counts — a tiny frame by
    * construction — BROADCAST to the probe and only the long tail
    * shuffles, so the hot keys never cross a shuffle boundary as join
    * keys at all. The head/tail split partitions the key space, so the
    * output is invariant to M (spec-pinned at M ∈ {0, 16, ∞}); it
    * costs two extra join branches per count table, which is why the
    * default stays 0 — measured 0.98 s vs 1.75 s at sf0.1 where no
    * extreme skew exists. The consumers of the pre-aggregated frame
    * share one exchange (ReuseExchange); the per-doc mean partitions
    * by doc_id. No windows, no global sorts.
    */
  def bigramFluency(docs: DataFrame, headM: Int = 0): DataFrame = {
    val bigrams = docs
      // Generate barrier: the token array materializes ONCE per row
      // (the repetition() rationale — HOF-inlining trap)
      .select(col("doc_id"), explode(array(tokens)).as("toks"))
      .select(col("doc_id"),
        explode(expr(
          """zip_with(
            |  slice(toks, 1, greatest(size(toks) - 1, 0)),
            |  slice(toks, 2, greatest(size(toks) - 1, 0)),
            |  (a, b) -> concat(a, ' ', b))""".stripMargin)).as("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    // one row per (doc, bigram) with instance multiplicity k: the only
    // aggregation that ever sees per-instance rows, and it map-side
    // combines — a stopword bigram crosses the shuffle once per doc,
    // not once per occurrence. The explicit no-op null filter (neither
    // key can be null: bg is a concat of non-null tokens, w1 a
    // substring of bg) is LOAD-BEARING for plan reuse: without it
    // InferFiltersFromConstraints pushes a DIFFERENT IsNotNull set
    // into each of the three consumers (probe needs both join keys,
    // cb only bg, cp only w1), the subtrees stop canonicalizing equal,
    // and ReuseExchange cannot fire — the corpus scanned three times
    // (measured; with the filter, stages 1-2 read stage 0's exchange).
    val dbg = bigrams
      .filter(col("bg").isNotNull && col("w1").isNotNull)
      .groupBy(col("doc_id"), col("w1"), col("bg"))
      .agg(count(lit(1)).cast("long").as("k"))
    val cb = dbg.groupBy(col("bg")).agg(sum(col("k")).cast("long").as("cb"))
    val cp = dbg.groupBy(col("w1")).agg(sum(col("k")).cast("long").as("cp"))

    // hybrid broadcast-head / shuffle-tail count join: the head is the
    // top-M keys by count (deterministic tiebreak on the key; output
    // is invariant to the split), broadcast-joined; the anti-filtered
    // tail shuffles WITHOUT its hot keys
    def hybridCountJoin(left: DataFrame, counts: DataFrame,
                        key: String, cnt: String): DataFrame = {
      if (headM <= 0) return left.join(counts, Seq(key))
      val head = counts.orderBy(col(cnt).desc, col(key)).limit(headM)
      val headRows = left.join(broadcast(head), Seq(key))
      val tailRows = left
        .join(broadcast(head.select(col(key))), Seq(key), "left_anti")
        .join(counts, Seq(key))
      headRows.unionByName(tailRows)
    }

    hybridCountJoin(hybridCountJoin(dbg, cb, "bg", "cb"), cp, "w1", "cp")
      .withColumn("r", col("cb").cast("double") / col("cp"))
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).cast("long").as("n_bigrams"),
        round(
          // k · q(r) in exact decimal ≡ summing k instance copies of
          // q(r): DECIMAL(28,8) × DECIMAL(9,0) → DECIMAL(38,8), no
          // precision-loss adjustment, so the instance-level oracle
          // holds unchanged
          sum(col("r").cast(org.apache.spark.sql.types.DecimalType(28, 8)) *
            col("k").cast(org.apache.spark.sql.types.DecimalType(9, 0)))
            .cast("double") / sum(col("k")), 6).as("fluency"))
  }

  /** Token-rarity profile — the OOV/noise quality signal: per document,
    * the mean and minimum CORPUS document-frequency of its distinct
    * tokens (a doc dominated by tokens nothing else uses is noise,
    * OCR garbage, or another language). All counts are integers and the
    * mean is one int/int division, so the whole row set hash-checks.
    * Shape: the (doc, distinct-token) row set derives TWICE (df
    * aggregate + join probe — two scans, deliberate): the df table is
    * vocabulary-sized and broadcasts, so the probe side never
    * shuffles; the single-scan alternative (a count window partitioned
    * by token) would hot-key on stopwords — a "the" partition holding
    * most of the corpus on one task — which is the worse trade at
    * 100 TB. Aggregations are map-side-combined.
    */
  def tokenRarity(docs: DataFrame): DataFrame = {
    val dw = docs.select(col("doc_id"),
      explode(array_distinct(tokens)).as("w"))
    val tokDf = dw.groupBy(col("w"))
      .agg(count(lit(1)).cast("long").as("df"))
    dw.join(tokDf, "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_distinct"),
        min(col("df")).cast("long").as("min_df"),
        round(sum(col("df")).cast("double") / count(lit(1)), 4).as("avg_df"))
  }

  /** Per-document top-k characteristic terms by TF-IDF — the keyword /
    * topic-signal extractor (feeds domain tagging and near-dup triage).
    * Uses the LINEAR idf variant, score = tf · N / df, deliberately:
    * the classic ln(N/df) damping would hinge on `ln` rounding
    * identically in every engine (the JVM's Math.log is not guaranteed
    * correctly rounded), while tf·N is an exact integer and one IEEE
    * division by df is bit-identical everywhere — the same
    * integers-through-one-division rule every hash-compared double in
    * this repo follows. Ranking happens on the UNROUNDED score (also
    * deterministic for the same reason) with the term string as
    * tiebreak, so the selected set — not just the values — is stable
    * across engines.
    *
    * Shape mirrors tokenRarity: the vocabulary-sized df table
    * broadcasts into the (doc, term, tf) probe so the corpus-sized side
    * never reshuffles for the join, and the top-k window partitions by
    * doc_id — per-doc state, no hot key, no global sort. tf aggregates
    * map-side-combine before their one shuffle.
    */
  def tfidf(docs: DataFrame, k: Int = 3): DataFrame = {
    val words = docs.select(col("doc_id"), explode(tokens).as("w"))
    val tf = words.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).cast("long").as("tf"))
    // df derives FROM tf (one row per (doc, term) by construction), so
    // the tokenize+explode scan runs once, not once per aggregate
    val termDf = tf.groupBy(col("w")).agg(count(lit(1)).cast("long").as("df"))
    val n = docs.select(count(lit(1)).cast("long").as("n_docs"))
    val byScore = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("w"))
    tf.join(broadcast(termDf), "w")
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") * col("n_docs") / col("df"))
      .withColumn("rk", row_number().over(byScore))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("w"), col("tf"), col("df"),
        round(col("score"), 4).as("tfidf"), col("rk"))
  }

  /** Vocabulary count-of-counts — the Zipf profile ("how many distinct
    * terms appear in exactly d documents"): the corpus-statistics pass
    * behind vocabulary sizing, min-df cutoff selection, and OCR-noise
    * detection (a healthy natural corpus shows the long df=1 hapax
    * tail; a template-flooded crawl shows mass at high df). Two
    * map-side-combined aggregations — term df, then count per df —
    * over one explode scan; all integers, so the profile hash-checks.
    */
  def vocabZipf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(array_distinct(tokens)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("df"))
      .groupBy(col("df")).agg(count(lit(1)).as("n_terms"))
      .select(col("df").cast("long").as("df"),
        col("n_terms").cast("long").as("n_terms"))

  /** Corpus heavy hitters: the `k` word-n-grams appearing in the most
    * DISTINCT documents — the statistics pass that feeds stop-phrase
    * lists and template detection (the cross-corpus complement of
    * `repetition`'s within-doc mass). Reuses the LSH shingle pipeline
    * (per-doc distinct shingle ROWS), one map-side-combined count per
    * shingle, then TakeOrderedAndProject — a top-k over partial
    * per-partition heaps, never a full corpus sort. Ties at the cutoff
    * break by shingle text, so the emitted SET is deterministic.
    */
  def topNgrams(docs: DataFrame, n: Int, k: Int): DataFrame =
    Dedup.shingleRows(docs, n)
      .groupBy(col("shingle"))
      .agg(count(lit(1)).cast("long").as("df"))
      .orderBy(col("df").desc, col("shingle"))
      .limit(k)

  /** Distributed BPE merge induction — the tokenizer-TRAINING pass a
    * pretraining pipeline runs before token counting: `nMerges` rounds
    * of "count adjacent token-pair frequencies corpus-wide, merge the
    * most frequent pair everywhere". Each round is one distributed
    * map-side-combined pair count (the heavy part — pairs come from a
    * per-doc window `lead`, never crossing documents) plus one
    * scan-speed literal `replace` applying the merge, so the driver
    * holds only the k winning pairs. Deterministic: frequency ties
    * break by (left, right) lexicographically, and merge application
    * is leftmost-non-overlapping `replace` — and the sequence encodes
    * as bracket-wrapped symbols (`<a><b><c>`) precisely so no pattern
    * ever SHARES a character with the next occurrence (a space-
    * delimited encoding makes " a b a b " match only alternately,
    * because the trailing space of one match is the leading space of
    * the next) and so a pair pattern can never match a token suffix.
    * Tokens are \w+, so '<'/'>' never occur inside a symbol. Merged
    * symbols join with '_'; a corpus token that already contains '_'
    * is indistinguishable from a merged symbol on both sides of the
    * oracle (documented ambiguity, harmless to the contract).
    * Returns (merge_rank, lhs, rhs, freq) — names chosen to dodge the
    * RANK/LEFT/RIGHT SQL keywords on the oracle side.
    *
    * Scale note: each round stacks one `replace` onto the working
    * column, and CollapseProject folds them into a single growing
    * projection — fine at report-scale merge counts like this
    * channel's 3, but a real vocab induction (tens of thousands of
    * merges) must materialize the working column every few hundred
    * rounds (write/read or localCheckpoint+release, the components()
    * lifecycle) or the collapsed expression outgrows codegen.
    */
  def bpeMerges(docs: DataFrame, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    var cur = docs.select(col("doc_id"),
      concat(lit("<"), array_join(tokens, "><"), lit(">")).as("s"))
    val found = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (rank <- 1 to nMerges) {
      val toks = cur.select(col("doc_id"),
        posexplode(expr("regexp_extract_all(s, '[^<>]+', 0)"))
          .as(Seq("pos", "tok")))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val top = toks
        .withColumn("nxt", lead(col("tok"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("tok"), col("nxt"))
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("tok"), col("nxt"))
        .limit(1)
        .collect()
      if (top.nonEmpty) {
        val (l, r, f) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        found += ((rank, l, r, f))
        cur = cur.withColumn("s",
          expr(s"replace(s, '<$l><$r>', '<${l}_$r>')"))
      }
    }
    import spark.implicits._
    found.toSeq.toDF("merge_rank", "lhs", "rhs", "freq")
  }

  /** Batched BPE merge induction — the vocabulary-SCALE form of
    * [[bpeMerges]]: up to `batchM` merges per corpus scan instead of
    * one, so a 32k-merge vocabulary costs ~nMerges/batchM scans, not
    * 32k. Produces EXACTLY the sequential algorithm's merge table
    * (same ranks, same pairs, same frequencies) via a conservative
    * selection rule, so callers can batch without changing semantics
    * (spec-pinned against [[bpeMerges]], which deliberately keeps an
    * independent window-lead counting mechanism as the reference).
    *
    * Why the selection is exact: pairs are ordered (freq desc, lhs,
    * rhs) — the sequential pick order. Applying merge (a,b) only
    * changes counts of pairs sharing a symbol with it (pairs (x,a) /
    * (b,y) shrink; new pairs (x,a_b)/(a_b,y) appear with count ≤ the
    * pre-merge count of the conflicted pair (x,a)/(b,y) they came
    * from). So walking the count table in order: a pair sharing NO
    * symbol with anything selected so far still has its exact
    * sequential-moment count, and it is the sequential algorithm's
    * next pick as long as its freq strictly exceeds every conflicted
    * pair seen so far (a new pair can never out-count the conflicted
    * pair that spawned it, and ties break against us only at equal
    * freq — hence strict). Selection stops at the first candidate
    * that fails the gate; the next scan re-counts with all applied
    * merges visible. Every round selects at least its top pair, so
    * rounds ≤ nMerges always, and ≈ nMerges/batchM when the corpus
    * has many independent frequent pairs. MEASURED at vocab scale
    * (512 merges, batchM=64, sf0.01 documents — PLANS.md round-11):
    * natural-ish text does NOT live in that regime — hub tokens make
    * the top pairs conflict, and the gate admits ~2.4 merges/scan
    * (212 rounds), a real but bounded win over sequential's 512; the
    * vocab-scale spec pins that band. Carries the same documented
    * '_'-collision caveat
    * as [[bpeMerges]]: a corpus token textually equal to a merged
    * symbol name is indistinguishable from it.
    *
    * Per-round dataflow is leaner than the reference loop: adjacent
    * pairs come from a zero-width-lookahead regex over the encoded
    * string — a pure per-row projection straight into one map-side-
    * combined count — so there is NO per-doc window sort and the only
    * shuffle is the pair aggregation. (tok, nxt) are re-extracted
    * AFTER aggregation (distinct-pair cardinality, not corpus
    * cardinality) because ordering by the raw pair string would
    * diverge from (lhs, rhs) order on digit-bearing tokens ('0'-'9'
    * sort below '>'). The working column localCheckpoints every
    * `checkpointEvery` rounds, releasing the superseded snapshot, so
    * lineage and codegen size stay bounded at any merge count.
    */
  def bpeMergesBatched(docs: DataFrame, nMerges: Int, batchM: Int = 64,
                       checkpointEvery: Int = 8): DataFrame =
    bpeMergesBatchedWithRounds(docs, nMerges, batchM, checkpointEvery)._1

  /** [[bpeMergesBatched]] plus the executed round count — the
    * observable the vocab-scale bound spec pins (rounds ≈
    * nMerges/batchM when the corpus has many independent frequent
    * pairs; conflict fallbacks add rounds, and the claim is that they
    * add FEW, which only a measurement can check).
    */
  private[ops] def bpeMergesBatchedWithRounds(
      docs: DataFrame, nMerges: Int, batchM: Int = 64,
      checkpointEvery: Int = 8): (DataFrame, Int) = {
    require(nMerges >= 0 && batchM >= 1 && checkpointEvery >= 1,
      "need nMerges >= 0, batchM >= 1, checkpointEvery >= 1")
    val spark = docs.sparkSession
    var cur = docs.select(col("doc_id"),
      concat(lit("<"), array_join(tokens, "><"), lit(">")).as("s"))
    var prevCkpt: Option[DataFrame] = None
    val found =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rounds = 0
    var exhausted = false
    while (found.size < nMerges && !exhausted) {
      rounds += 1
      val m = math.min(batchM, nMerges - found.size)
      // enough headroom that one conflicted cluster doesn't starve the
      // round; correctness never depends on the horizon (pairs below
      // it simply wait for the next scan)
      val collectN = 4 * m + 16
      val top = cur
        .select(explode(regexp_extract_all(col("s"),
          lit("(?=(<[^<>]+><[^<>]+>))"), lit(1))).as("pair"))
        .groupBy(col("pair"))
        .agg(count(lit(1)).as("freq"))
        .select(
          regexp_extract(col("pair"), "^<([^<>]+)>", 1).as("tok"),
          regexp_extract(col("pair"), "><([^<>]+)>$", 1).as("nxt"),
          col("freq"))
        .orderBy(col("freq").desc, col("tok"), col("nxt"))
        .limit(collectN)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.HashSet.empty[String]
        val selected =
          scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var maxConflicted = Long.MinValue
        var i = 0
        var stop = false
        while (!stop && i < top.length && selected.size < m) {
          val (l, r, f) =
            (top(i).getString(0), top(i).getString(1), top(i).getLong(2))
          if (used(l) || used(r)) maxConflicted = math.max(maxConflicted, f)
          else if (f > maxConflicted) {
            selected += ((l, r, f))
            used += l; used += r; used += s"${l}_$r"
          } else stop = true
          i += 1
        }
        selected.foreach { case (l, r, f) =>
          found += ((found.size + 1, l, r, f))
        }
        val applied = selected.foldLeft(col("s")) { case (c, (l, r, _)) =>
          replace(c, lit(s"<$l><$r>"), lit(s"<${l}_$r>"))
        }
        cur = cur.withColumn("s", applied)
        if (rounds % checkpointEvery == 0) {
          val snap = cur.localCheckpoint()
          prevCkpt.foreach(graft.PlanHygiene.releaseCheckpoint)
          prevCkpt = Some(snap)
          cur = snap
        }
      }
    }
    prevCkpt.foreach(graft.PlanHygiene.releaseCheckpoint)
    import spark.implicits._
    (found.toSeq.toDF("merge_rank", "lhs", "rhs", "freq"), rounds)
  }

  /** Tokenizer APPLICATION — encode documents with a LEARNED merge
    * table, the pass a pretraining pipeline runs over the whole corpus
    * once the vocabulary is induced (and the half that actually costs
    * at 100 TB: training sees a sample, encoding sees everything).
    * `merges` is the rank-ordered (lhs, rhs) table from [[bpeMerges]] /
    * [[bpeMergesBatched]] — vocab-scale (tens of thousands of rows), so
    * driver-resident by construction. Application is the training
    * loop's OWN mechanism: the same bracket encoding and the same
    * rank-ordered leftmost-non-overlapping literal `replace` chain,
    * folded into scan-speed projections — zero shuffle, no UDF, and by
    * construction the exact token stream training's working column
    * held after those merges (spec-pinned). The working column
    * materializes every `checkpointEvery` merges so the collapsed
    * projection stays inside codegen limits at full vocabulary scale
    * (the [[bpeMergesBatched]] lifecycle; superseded snapshots release
    * inline, the final one travels with the returned plan and falls to
    * the caller's PlanHygiene sweep).
    *
    * Returns (doc_id, n_tokens_base, n_tokens_bpe, bpe_tokens): the
    * pre/post token counts — the compression ratio every tokenizer
    * change gets judged by — plus the encoded symbol array.
    */
  def bpeEncode(docs: DataFrame, merges: Seq[(String, String)],
                checkpointEvery: Int = 256): DataFrame = {
    require(checkpointEvery >= 1, "need checkpointEvery >= 1")
    var cur = docs.select(col("doc_id"),
      size(tokens).cast("long").as("n_tokens_base"),
      concat(lit("<"), array_join(tokens, "><"), lit(">")).as("s"))
    var prevCkpt: Option[DataFrame] = None
    val batches = merges.grouped(checkpointEvery).toSeq
    batches.zipWithIndex.foreach { case (batch, i) =>
      val applied = batch.foldLeft(col("s")) { case (c, (l, r)) =>
        replace(c, lit(s"<$l><$r>"), lit(s"<${l}_$r>"))
      }
      cur = cur.withColumn("s", applied)
      if (i < batches.size - 1) { // last batch folds into the result plan
        val snap = cur.localCheckpoint()
        prevCkpt.foreach(graft.PlanHygiene.releaseCheckpoint)
        prevCkpt = Some(snap)
        cur = snap
      }
    }
    // prevCkpt (if any) backs the returned plan — NOT released here;
    // the caller's PlanHygiene sweep reclaims it after materialization
    cur.select(col("doc_id"), col("n_tokens_base"),
      expr("regexp_extract_all(s, '[^<>]+', 0)").as("bpe_tokens"))
      .withColumn("n_tokens_bpe", size(col("bpe_tokens")).cast("long"))
      .select(col("doc_id"), col("n_tokens_base"), col("n_tokens_bpe"),
        col("bpe_tokens"))
  }

  /** Top-k TERM SEARCH — keyword retrieval over the corpus, ranked by
    * the tf·idf sum Σ_t tf(d,t)/df(t) in EXACT integer arithmetic: the
    * fractions cross-multiply onto the common denominator Π_j df(j)
    * (document-independent, so ranking is preserved), giving
    * score_num = Σ_t tf(d,t) · Π_{j≠t} df(j) — pure Long products, no
    * IEEE division anywhere, so the ranking AND the emitted score are
    * bit-identical on any engine/partitioning (a float idf sum would
    * hinge on accumulation order). Bounds: tf ≤ doc tokens, df ≤ N —
    * for any realistic query arity the products sit far inside Long;
    * the require below guards the 2^63 edge explicitly.
    *
    * Shape at 100 TB: tokens explode → filter to the query's terms
    * BEFORE any aggregation (the scan's selectivity is the query's
    * corpus frequency), one (doc, term) count, the ≤|terms| df rows
    * collect to the driver to build the weight CASE expression, one
    * map-side-combined Long sum per doc, TakeOrderedAndProject for the
    * top-k — never a full-corpus sort. Ties break (score desc, doc_id).
    */
  def termSearch(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms,
      "terms must be non-empty and distinct")
    // ONE corpus scan: the (doc, term) counts materialize eagerly and
    // serve BOTH the df collect below and the returned score plan (the
    // checkpoint travels with the result and falls to the caller's
    // PlanHygiene sweep, the bpeEncode lifecycle) — without it the
    // returned plan would re-tokenize the corpus a second time
    val tf = docs.select(col("doc_id"), explode(tokens).as("w"))
      .filter(col("w").isin(terms: _*))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    rankTf(tf, terms, k)
  }

  /** PERSISTED inverted index — the lexical analog of the persisted
    * IVF/IVF-PQ layouts: one corpus tokenization pass writes the
    * (term, doc, tf) postings PARTITIONED BY a term-hash bucket, so a
    * term-filtered search prunes non-matching buckets at the FILE
    * level (Hive partition pruning — the exact trick the ANN index
    * uses with its coarse buckets) and never re-reads corpus text. Per-
    * term df is deliberately NOT persisted: search recomputes it from
    * the PRUNED postings (each query touches ≤ |terms| buckets), which
    * makes incremental ingest PURE APPEND ([[appendToTextIndex]]) — no
    * stats table to merge, no retraining, and indexed search over
    * history ∪ increment is by construction identical to a fresh
    * full-corpus search.
    */
  def saveTextIndex(docs: DataFrame, dir: String,
                    buckets: Int = 64,
                    writerOptions: Map[String, String] = Map.empty): Unit =
    appendPostings(docs, dir, buckets, overwrite = true, writerOptions)

  /** Incremental ingest: append the new batch's postings — one pass
    * over the increment, zero passes over history (see
    * [[saveTextIndex]] for why no stats merge is needed). */
  def appendToTextIndex(newDocs: DataFrame, dir: String,
                        buckets: Int = 64,
                        writerOptions: Map[String, String] = Map.empty): Unit =
    appendPostings(newDocs, dir, buckets, overwrite = false, writerOptions)

  /** `writerOptions` passes parquet writer tuning through (e.g.
    * `parquet.block.size` to size row groups for the deployment's
    * term-selectivity — smaller groups = finer term-range skipping at
    * more footer overhead). */
  private def appendPostings(docs: DataFrame, dir: String, buckets: Int,
                             overwrite: Boolean,
                             writerOptions: Map[String, String]): Unit = {
    require(buckets > 0, "buckets must be positive")
    docs.select(col("doc_id"), explode(tokens).as("w"))
      .groupBy(col("w"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("wb", pmod(xxhash64(col("w")), lit(buckets.toLong)))
      // sort each writer task by (wb, w): every postings file's row
      // groups then span a NARROW term range, so a term-equality probe
      // skips a co-bucketed stopword's mass via parquet min/max stats —
      // term-level pruning INSIDE the bucket, on top of the bucket-dir
      // partition pruning (the same trick the catalog uses for path
      // ranges, SURVEY §8 perf notes). Pruning stopped at the bucket
      // dir before this: a rare term co-bucketed with a stopword read
      // the stopword's whole postings file (r13 verdict #4).
      .sortWithinPartitions(col("wb"), col("w"))
      .write.mode(if (overwrite) "overwrite" else "append")
      .options(writerOptions)
      .partitionBy("wb").parquet(s"$dir/postings")
  }

  /** Search the persisted index: prune postings to the query terms'
    * buckets (file-level partition pruning) + exact term match, then
    * the SAME exact-integer tf·idf ranking as [[termSearch]] — indexed
    * search is bit-identical to the direct corpus search. */
  def termSearchIndexed(spark: org.apache.spark.sql.SparkSession,
                        dir: String, terms: Seq[String], k: Int,
                        buckets: Int = 64): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms,
      "terms must be non-empty and distinct")
    import spark.implicits._
    // bucket ids via the ENGINE's own xxhash64 (a JVM-side reimplementation
    // could drift); |terms| rows, one local job
    val wbs = terms.toDF("w")
      .select(pmod(xxhash64(col("w")), lit(buckets.toLong)).as("wb"))
      .as[Long].collect().distinct.toSeq
    val tf = spark.read.parquet(s"$dir/postings")
      .filter(col("wb").isin(wbs: _*) && col("w").isin(terms: _*))
      .select(col("doc_id"), col("w"), col("tf"))
      .localCheckpoint(true) // serves the df collect AND the result plan
    rankTf(tf, terms, k)
  }

  /** The shared ranking core of [[termSearch]]/[[termSearchIndexed]]:
    * exact-integer tf·idf over a (doc_id, w, tf) frame (scaladoc on
    * termSearch). The caller hands a MATERIALIZED tf (checkpoint) so
    * the stats collect and the returned plan share one computation. */
  private def rankTf(tf: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    // df AND the max tf in one driver fetch — max tf feeds the
    // overflow guard below
    val stats = tf.groupBy(col("w"))
      .agg(count(lit(1)).as("df"), max(col("tf")).as("maxTf"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val dfMap = stats.view.mapValues(_._1).toMap
    val present = terms.filter(dfMap.contains)
    val spark = tf.sparkSession
    import spark.implicits._
    if (present.isEmpty)
      return Seq.empty[(Long, Long, Long)]
        .toDF("doc_id", "n_terms_hit", "score_num")
    val maxTf = math.max(1L, present.map(stats(_)._2).max)
    val arity = present.size.toLong
    val weights = present.map { t =>
      val others = present.filterNot(_ == t).map(dfMap)
      // guard the WHOLE score, not just the df product: every per-term
      // contribution is ≤ maxTf·w and at most `arity` of them sum, so
      // w ≤ Long.Max/(maxTf·arity) keeps the final Long sum exact —
      // Spark's non-ANSI arithmetic would wrap silently, rank the top
      // hit LAST, and diverge from the oracle's HUGEINT sum
      val w = others.foldLeft(1L) { (acc, d) =>
        require(acc <= Long.MaxValue / math.max(d, 1L) / maxTf / arity,
          s"score bound overflows Long (df product × maxTf $maxTf × " +
            s"arity $arity) — reduce query arity")
        acc * d
      }
      t -> w
    }
    val wgt = weights.tail.foldLeft(
      when(col("w") === weights.head._1, lit(weights.head._2))) {
      case (c, (t, v)) => c.when(col("w") === t, lit(v))
    }.otherwise(lit(0L))
    tf.withColumn("wgt", wgt)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"),
        sum(col("tf") * col("wgt")).as("score_num"))
      .orderBy(col("score_num").desc, col("doc_id"))
      .limit(k)
  }

  /** BATCH top-k term search — [[termSearch]] for a QUERIES TABLE
    * (query_id, terms array), the production fan-out shape: a driver-
    * built CASE expression serves one query, a million concurrent
    * queries need the weights RELATIONAL. Same exact integer algebra,
    * computed in-plan: per query, the df product folds with a Long
    * `aggregate` HOF over the collected df list (product is
    * commutative, so collect_list's nondeterministic order cannot
    * change it), each term's weight recovers as product DIV df —
    * exact integer division by construction — and per-(query, doc)
    * scores are Long sums of tf·weight. Ranking runs through the
    * bounded `graft_topk` heap aggregate (the ANN pattern): the
    * exchange carries ≤ partitions × |queries| fixed-width heaps,
    * never the scored corpus. Ties (score desc, doc_id asc) — the
    * heap's (value desc, id asc) order with doc_id as the id.
    *
    * The term-side join key is the term string; query terms are a
    * QUERY-CARDINALITY table (broadcast-small in the single-session
    * shape, hash-joinable at fan-out scale). The df-product fold
    * carries termSearch's whole-score overflow guard IN-PLAN (each
    * step requires acc ≤ Long.Max/(df·maxTf·arity), else raise_error
    * — see the inline comment), so a wrapped product can never reach
    * the scorer. Remaining documented caveat: the heap orders in
    * DOUBLE (exact to 2^53) — scores in (2^53, 2^63) are
    * guard-passing but could tie-break by rounded value; realistic
    * df/tf/arity sit far inside 2^53.
    */
  def termSearchMany(docs: DataFrame, queries: DataFrame,
                     k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val qterms = queries.select(col("query_id"),
      explode(col("terms")).as("w")).distinct()
    val allTerms = qterms.select(col("w")).distinct()
    val tf = docs.select(col("doc_id"), explode(tokens).as("w"))
      .join(allTerms, "w") // filter to the union of query vocabularies
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true) // one corpus scan serves df AND scoring
    val dfs = tf.groupBy(col("w"))
      .agg(count(lit(1)).as("df"), max(col("tf")).as("maxTf"))
    // the SAME whole-score guard as termSearch's driver-side require,
    // computed in-plan per query: every per-term contribution is ≤
    // maxTf·w and at most `arity` of them sum, so each df fold step
    // must keep acc ≤ Long.Max/(df·maxTf·arity) — otherwise the Long
    // product wraps SILENTLY under Spark's non-ANSI arithmetic and
    // the ranking is garbage with no error. At the advertised corpus
    // scale (df ~1e7-1e9) a 3-term query's raw product already
    // exceeds 2^63; the guard turns that into a loud raise_error
    // naming the fix instead of a wrong answer.
    val weights = qterms.join(dfs, "w") // absent terms drop, as in termSearch
      .groupBy(col("query_id"))
      .agg(collect_list(struct(col("w"), col("df"))).as("tds"),
        greatest(max(col("maxTf")), lit(1L)).as("qMaxTf"),
        greatest(count(lit(1)), lit(1L)).as("arity"))
      .select(col("query_id"),
        expr("""aggregate(tds, 1L, (acc, x) ->
            IF(acc <= 9223372036854775807L DIV greatest(x.df, 1L)
                 DIV qMaxTf DIV arity,
               acc * x.df,
               CAST(raise_error(concat(
                 'termSearchMany: score bound overflows Long (df product',
                 ' x maxTf ', qMaxTf, ' x arity ', arity,
                 ') - reduce query arity')) AS BIGINT)))""").as("prod"),
        explode(col("tds")).as("td"))
      .select(col("query_id"), col("td.w").as("w"),
        expr("prod DIV td.df").as("wgt"))
    tf.join(weights, "w")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"),
        sum(col("tf") * col("wgt")).as("score_num"))
      .groupBy(col("query_id"))
      .agg(expr(s"graft_topk(CAST(score_num AS DOUBLE), doc_id, $k)")
        .as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("i", "hit")))
      .select(col("query_id"), (col("i") + 1).as("rank_in_query"),
        col("hit.id").as("doc_id"),
        col("hit.score").cast("long").as("score_num"))
  }

  /** Retrieval-quality METRICS over a labeled ranking — the eval half
    * of the search stack (recall@k, MRR, DCG/IDCG), computed entirely
    * in exact integers so every number hash-checks cross-engine:
    *
    *   - ranking: [[termSearchMany]]'s top-k (integer tf·idf-fold
    *     scores, (score DESC, doc_id) total order);
    *   - ground truth: a doc is RELEVANT to a query iff it contains
    *     EVERY original query term (exact containment — deterministic
    *     on both engines; a query with an out-of-corpus term has no
    *     relevant docs, exercising the zero paths);
    *   - mrr_scaled = 10⁶ div first_hit_rank (0 when no hit);
    *   - dcg_scaled = Σ_hits (8·10⁶) div fplog2(rank+1) — binary-
    *     relevance DCG with the log2 replaced by the same fixed-point
    *     integer log the NB classifier uses (Curation.fplog2Sql): at
    *     rank 1 the weight is exactly 10⁶, and the weights are
    *     IDENTICALLY defined in both engines, which is what an eval
    *     metric needs (absolute calibration is a convention);
    *   - idcg_scaled = the same sum over ranks 1..min(n_relevant, k),
    *     emitted separately so nDCG stays a consumer-side division of
    *     two exact integers.
    *
    * Scale shape: two corpus scans total (the ranking's own scan plus
    * one presence scan filtered to the BROADCAST query vocabulary
    * before its distinct); every downstream frame is query-sized.
    */
  def retrievalMetrics(docs: DataFrame, queries: DataFrame,
                       k: Int): DataFrame = {
    val fp = graft.ops.Curation.fplog2Sql _
    val ranked = termSearchMany(docs, queries, k)
    val qt = queries.select(col("query_id"),
      explode(col("terms")).as("w")).distinct()
    val qar = qt.groupBy(col("query_id"))
      .agg(count(lit(1)).cast("long").as("arity"))
    val qvocab = qt.select(col("w")).distinct()
    val presence = docs.select(col("doc_id"), explode(tokens).as("w"))
      .join(broadcast(qvocab), "w").distinct()
    val rel = presence.join(broadcast(qt), "w")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("m"))
      .join(broadcast(qar), "query_id")
      .filter(col("m") === col("arity"))
      .select(col("query_id"), col("doc_id"))
    val nrel = rel.groupBy(col("query_id"))
      .agg(count(lit(1)).cast("long").as("n_relevant"))
    // the ranked sliver (k rows per query) BROADCASTS into the
    // relevance join: `rel` is corpus-bounded (every doc containing
    // all of a query's terms), so it must stay the streaming side
    val m = rel.join(
        broadcast(ranked.select(col("query_id"), col("doc_id"),
          col("rank_in_query"))),
        Seq("query_id", "doc_id"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).cast("long").as("hits_at_k"),
        min(col("rank_in_query")).cast("long").as("first_rank_raw"),
        sum(expr("8000000L div " +
          fp("(cast(rank_in_query as bigint) + 1)")))
          .cast("long").as("dcg_scaled"))
    queries.select(col("query_id")).distinct()
      .join(broadcast(nrel), Seq("query_id"), "left")
      .join(broadcast(m), Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_relevant"), lit(0L)).as("n_relevant"),
        coalesce(col("hits_at_k"), lit(0L)).as("hits_at_k"),
        coalesce(col("first_rank_raw"), lit(0L)).as("first_rank"),
        when(col("first_rank_raw").isNotNull,
          expr("1000000L div first_rank_raw")).otherwise(0L)
          .as("mrr_scaled"),
        coalesce(col("dcg_scaled"), lit(0L)).as("dcg_scaled"),
        when(coalesce(col("n_relevant"), lit(0L)) >= 1,
          expr(s"aggregate(sequence(1, cast(least(n_relevant, $k) " +
            "as int)), 0L, (acc, i) -> acc + 8000000L div " +
            fp("(cast(i as bigint) + 1)") + ")"))
          .otherwise(0L).as("idcg_scaled"))
  }

  /** GRADED-relevance retrieval metrics — [[retrievalMetrics]] with
    * the binary ground truth widened to integer GRADES so nDCG
    * discriminates partial relevance (the r15 verdict's stretch #8):
    * grade(query, doc) = the number of DISTINCT query terms the doc
    * contains (1..arity — exact containment of ALL terms is the top
    * grade, a single shared term the bottom; a doc sharing nothing is
    * irrelevant). The DCG ladder is unchanged (the fplog2 fixed-point
    * weights), each hit now contributing grade × weight, and IDCG
    * re-ranks the TRUE grade multiset descending (ties by doc_id —
    * the sum is tie-order-invariant) over ranks 1..min(n_relevant,k),
    * so nDCG < 1 whenever the ranking places a lower-grade doc above
    * a higher-grade one — exactly what binary relevance cannot see.
    *
    * Scale shape: same two corpus scans as the binary op; the relevant
    * sliver is now "docs sharing ≥1 query term" (vocabulary-filtered
    * at the scan, still query-bounded per doc), and the one new piece
    * of work is a per-query top-k over that sliver for the ideal
    * ladder (row_number window on the sliver, never the corpus).
    */
  def retrievalMetricsGraded(docs: DataFrame, queries: DataFrame,
                             k: Int): DataFrame = {
    val fp = graft.ops.Curation.fplog2Sql _
    val ranked = termSearchMany(docs, queries, k)
    val qt = queries.select(col("query_id"),
      explode(col("terms")).as("w")).distinct()
    val qvocab = qt.select(col("w")).distinct()
    val presence = docs.select(col("doc_id"), explode(tokens).as("w"))
      .join(broadcast(qvocab), "w").distinct()
    val rel = presence.join(broadcast(qt), "w")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).cast("long").as("grade"))
    val nrel = rel.groupBy(col("query_id"))
      .agg(count(lit(1)).cast("long").as("n_relevant"))
    val m = rel.join(
        broadcast(ranked.select(col("query_id"), col("doc_id"),
          col("rank_in_query"))),
        Seq("query_id", "doc_id"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).cast("long").as("hits_at_k"),
        min(col("rank_in_query")).cast("long").as("first_rank_raw"),
        sum(expr("grade * (8000000L div " +
          fp("(cast(rank_in_query as bigint) + 1)") + ")"))
          .cast("long").as("dcg_scaled"))
    val wIdeal = Window.partitionBy(col("query_id"))
      .orderBy(col("grade").desc, col("doc_id"))
    val idcg = rel.withColumn("irk", row_number().over(wIdeal))
      .filter(col("irk") <= k)
      .groupBy(col("query_id"))
      .agg(sum(expr("grade * (8000000L div " +
        fp("(cast(irk as bigint) + 1)") + ")"))
        .cast("long").as("idcg_scaled"))
    queries.select(col("query_id")).distinct()
      .join(broadcast(nrel), Seq("query_id"), "left")
      .join(broadcast(m), Seq("query_id"), "left")
      .join(broadcast(idcg), Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_relevant"), lit(0L)).as("n_relevant"),
        coalesce(col("hits_at_k"), lit(0L)).as("hits_at_k"),
        coalesce(col("first_rank_raw"), lit(0L)).as("first_rank"),
        when(col("first_rank_raw").isNotNull,
          expr("1000000L div first_rank_raw")).otherwise(0L)
          .as("mrr_scaled"),
        coalesce(col("dcg_scaled"), lit(0L)).as("dcg_scaled"),
        coalesce(col("idcg_scaled"), lit(0L)).as("idcg_scaled"))
  }

  /** BATCH BM25 — [[bm25]] for a QUERIES TABLE (query_id, terms
    * array), the production fan-out shape next to [[termSearchMany]]:
    * ONE corpus scan produces the (doc, term, dl) counts for the union
    * of query vocabularies; per-term df and idf compute RELATIONALLY
    * (the df table is vocabulary-sized and broadcasts, so the scoring
    * probe never shuffles the corpus side); corpus constants (N,
    * avgdl) fold as literals. The idf here evaluates in-plan via the
    * codegen'd natural log — the same java.lang.Math.log the single-
    * query path calls on the driver, so both paths score identically —
    * and the per-(query, doc) sum routes through the same
    * DECIMAL(28,8) quantization (see [[bm25]]'s scale rationale) so
    * the cross-engine oracle compares stably. Emits ALL matching
    * (query, doc) pairs; compose graft_topk for the bounded-heap
    * ranking shape (text_search_batch pins that plan).
    */
  // The tf sliver below persists lazily and the returned frame is
  // lazy too, so in-call unpersist would defeat the cache. Instead the
  // live handle count is BOUNDED AT ONE: each bm25Many call releases
  // the previous call's sliver (storage-evictable either way; this
  // caps the handle-count leak the same way the drain memos do), and
  // releaseBm25Cache() frees the last one explicitly.
  private val lastBm25Tf =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)

  /** Release the cached tf sliver held by the most recent
    * [[bm25Many]]/[[bm25]] call (safe after its result materialized). */
  def releaseBm25Cache(): Unit = {
    val prev = lastBm25Tf.getAndSet(null)
    if (prev != null) prev.unpersist(blocking = false)
  }

  def bm25Many(docs: DataFrame, queries: DataFrame,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k1 >= 0 && b >= 0 && b <= 1, s"bad BM25 params k1=$k1 b=$b")
    val qterms = queries.select(col("query_id"),
      explode(col("terms")).as("w")).distinct()
    val allTerms = qterms.select(col("w")).distinct()
    val tf = docs
      .select(col("doc_id"), size(tokens).cast("double").as("dl"),
        explode(tokens).as("w"))
      .join(allTerms, "w")
      .groupBy(col("doc_id"), col("dl"), col("w"))
      .agg(count(lit(1)).cast("double").as("tf"))
      // one corpus scan serves df AND scoring: LAZY persist (not an
      // eager checkpoint — that spends a whole extra job + block
      // writes before the real one, measured +~0.2 s on the 1-row
      // single-query channel): the broadcast(dfs) build materializes
      // the sliver into cache and the probe side reads it back
      .persist()
    val prev = lastBm25Tf.getAndSet(tf)
    if (prev != null) prev.unpersist(blocking = false)
    val corpusStats = docs.agg(count(lit(1)).cast("double"),
      avg(size(tokens).cast("double"))).head()
    val n = corpusStats.getDouble(0)
    // avg(dl) is NULL over an empty corpus; any finite stand-in is
    // correct because tf is empty too — the plan then emits the empty
    // result frame instead of NPE-ing on the null aggregate
    val avgdl = if (corpusStats.isNullAt(1)) 1d else corpusStats.getDouble(1)
    val dfs = tf.groupBy(col("w"))
      .agg(count(lit(1)).cast("double").as("df"))
    val idf = log(lit(1d) +
      (lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    tf.join(qterms, "w").join(broadcast(dfs), "w")
      .withColumn("part",
        idf * col("tf") * lit(k1 + 1d) /
          (col("tf") + lit(k1) * (lit(1d - b) + lit(b) * col("dl") / avgdl)))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"),
        round(sum(col("part").cast(org.apache.spark.sql.types
          .DecimalType(28, 8))).cast("double"), 5).as("bm25"))
  }

  /** Text normalization — the cleanup pass that runs BEFORE any
    * content-addressed op (sha/MinHash/SimHash/BPE), because "é" as
    * U+00E9 vs e+U+0301 are byte-different same-text and a stray
    * control char or doubled space forks every downstream hash:
    * Unicode NFC via the native codegen'd `graft_nfc` expression
    * (quick-check fast path — ASCII rows never allocate), control
    * chars stripped (NUL..US minus \t\n\r, plus DEL), whitespace runs
    * squashed to one space, ends trimmed. Patterns are the
    * RE2-compatible explicit classes shared verbatim with the oracle
    * (the redactPii convention). Pure per-row projection inside
    * WholeStageCodegen — scan speed at 100 TB, no shuffle, no UDF.
    */
  def normalizeText(docs: DataFrame, textCol: String = "text"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // ORDER IS LOAD-BEARING: controls strip BEFORE NFC. A control char
    // between a base letter and its combining mark blocks composition
    // (no composite exists for (control, mark)), so NFC-then-strip
    // leaves an uncomposed e+mark behind — a second pass would change
    // the text again. Strip-first makes the whole pipeline idempotent
    // (NFC is idempotent and never mints controls or ASCII whitespace)
    // — pinned as a ∀ property in Round12Properties.
    // the strip rides inside the graft_nfc SQL expression (the repo's
    // expr()-string convention for graft functions); SQL string
    // literals eat one backslash level, hence the doubling
    val nfc = expr(s"graft_nfc(regexp_replace(`$textCol`, " +
      "'[\\\\x00-\\\\x08\\\\x0B\\\\x0C\\\\x0E-\\\\x1F\\\\x7F]', ''))")
    val squashed = trim(regexp_replace(nfc, "[ \\t\\n\\r]+", " "))
    docs.select(col("doc_id"), squashed.as("norm_text"),
      length(col(textCol)).as("n_chars_raw"),
      length(squashed).as("n_chars_norm"))
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercased text —
    * the cheap cross-engine-stable dedup key (rolling-hash analog).
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp"),
      sha2(col("text"), 256).as("sha"))

  // PII patterns kept to the RE2-compatible subset (no lookaround, no
  // backrefs) so the scrub is reproducible across engines — the same
  // strings drive the DuckDB oracle with the 'g' flag
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+?\\d{3}[- ]\\d{3}[- ]\\d{4}"

  /** PII scrubbing — redact emails, IPv4 addresses, and phone-shaped
    * numbers to typed placeholders, with per-kind match counts. Order
    * matters: emails first (their local part can contain digits/dots an
    * IP pattern would chew on), then IPs, then phones — and each count
    * is taken on the text AS THE PREVIOUS PASS LEFT IT, so the counts
    * audit exactly what that pass removed (a phone-shaped string
    * consumed by the email pass is counted zero times, not once as
    * phone). A pure per-row projection of codegen'd regexp built-ins:
    * no shuffle, no UDF — at 100 TB this runs at scan speed.
    */
  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val afterEmail = regexp_replace(t, EmailRe, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, Ipv4Re, "<IP>")
    def matches(stage: Column, re: String): Column =
      size(regexp_extract_all(stage, lit(re), lit(0))).cast("long")
    docs.select(
      col("doc_id"),
      regexp_replace(afterIp, PhoneRe, "<PHONE>").as("redacted"),
      matches(t, EmailRe).as("n_emails"),
      matches(afterEmail, Ipv4Re).as("n_ips"),
      matches(afterIp, PhoneRe).as("n_phones"))
  }

  /** Okapi BM25 scoring of every matching document against a query —
    * THE standard lexical-retrieval scorer, next to [[termSearch]]'s
    * exact-integer tf·idf: idf(t) = ln(1 + (N − df + ½)/(df + ½)),
    * tf-part = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)). Thin
    * wrapper over [[bm25Many]] (a 1-row queries table) so ONE formula
    * serves the single- and batch-query channels: one corpus scan,
    * vocabulary-sized broadcast df table, nothing shuffles but the
    * (doc, term) slivers that matched the query. Emits ALL matching
    * docs (callers compose `.orderBy(desc).limit(k)` or the graft_topk
    * heap for the bounded fan-out shape — text_search_topk pins that
    * plan); scores round to 5 decimals so the cross-engine oracle
    * compares stably (ln/division are libm-identical to ~1 ulp; the
    * rounding absorbs it — the weightedSample round(6) precedent).
    */
  def bm25(docs: DataFrame, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms,
      "terms must be non-empty and distinct")
    // ONE scoring formula serves both surfaces: the single query rides
    // [[bm25Many]] as a 1-row queries table (idf evaluates through the
    // same codegen'd ln, the per-(doc) sum through the same
    // DECIMAL(28,8) quantization — see bm25Many's scale rationale), so
    // the two channels can never drift apart formula-wise. The 1-row
    // broadcast side costs nothing next to the corpus scan.
    val spark = docs.sparkSession
    import spark.implicits._
    bm25Many(docs, Seq((0L, terms)).toDF("query_id", "terms"), k1, b)
      .drop("query_id")
  }

  /** Gopher-style quality RULE battery (Rae et al. 2021 §A1.1.1, public)
    * — the published-threshold cousin of [[quality]]'s raw ratios: each
    * doc gets one boolean per rule plus the conjunction, so a curation
    * pass can report per-rule kill counts instead of one opaque gate.
    * Line-based rules (bullet/ellipsis) are omitted: this corpus is
    * single-line by construction, so they'd be vacuously true columns.
    * All inputs are exact integer counts off ONE materialized token
    * array; each ratio is a single int/int double division (rounded),
    * bit-identical cross-engine. Bounds are corpus-calibrated to
    * discriminate (word counts here span 10–99; real Gopher uses
    * 50–100k on web pages — the RULE SHAPE is the operator, the
    * constants are parameters).
    */
  def gopherRules(docs: DataFrame,
                  minWords: Int = 25, maxWords: Int = 80,
                  minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                  minAlphaFrac: Double = 0.8,
                  minStopHits: Int = 1): DataFrame = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val stopArr = stops.map(s => s"'$s'").mkString(", ")
    docs
      // Generate barrier: tokenize ONCE per row (the repetition()
      // CollapseProject trap — every ratio below references toks)
      .select(col("doc_id"), explode(array(tokens)).as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_words"),
        round(expr("aggregate(toks, CAST(0 AS BIGINT), (acc, w) -> acc + length(w))")
          .cast("double") / nullif(size(col("toks")).cast("double"), lit(0d)),
          4).as("mean_word_len"),
        round(expr("size(filter(toks, w -> w rlike '^[a-z]+$'))").cast("double") /
          nullif(size(col("toks")).cast("double"), lit(0d)), 6).as("alpha_frac"),
        expr(s"size(filter(array($stopArr), s -> array_contains(toks, s)))")
          .cast("long").as("stop_hits"))
      .withColumn("r_word_count",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("r_mean_len",
        col("mean_word_len") >= minMeanLen && col("mean_word_len") <= maxMeanLen)
      .withColumn("r_alpha", col("alpha_frac") >= minAlphaFrac)
      .withColumn("r_stopwords", col("stop_hits") >= minStopHits)
      .withColumn("gopher_ok",
        col("r_word_count") && col("r_mean_len") && col("r_alpha") &&
          col("r_stopwords"))
  }

  /** Entity decode table for [[stripHtml]]'s DuckDB oracle: one
    * RE2-safe alternation per target character covering the NAMED form
    * plus the decimal (`&#NNN;`, optional leading zeros) and hex
    * (`&#xHH;`, either `x` case, either hex-letter case) numeric forms
    * real crawls carry — `&#8217;`/`&#x2019;` style typographic
    * punctuation is the common case the original 6-entity set missed.
    * RENDERED from the same canonical (name, codepoint) table the
    * Spark-side kernel compiles its lookup maps from
    * (graft.functions.HtmlEntities — see its scaladoc for the
    * single-scan ≡ sequential-passes equivalence argument), so the two
    * engines' decode surfaces cannot drift. The `&amp;` row is last
    * (the double-decode guarantee).
    */
  private[graft] val htmlEntityTable: Seq[(String, String)] =
    graft.functions.HtmlEntities.regexRows

  /** HTML → text extraction — the step every web-crawl pipeline runs
    * BEFORE any quality filter sees a document: drop script/style
    * blocks whole (their content is code, not text), drop comments,
    * strip the remaining tags, THEN decode the entities of
    * [[htmlEntityTable]] — named, decimal, and hex numeric forms —
    * with `&amp;` strictly last (decoding it first would turn the
    * literal text "&amp;lt;" into "<", the classic double-decode
    * corruption; the numeric ampersand forms `&#38;`/`&#x26;` ride the
    * same last row for the same reason), and collapse whitespace. The
    * block/tag strips are codegen'd `regexp_replace`s (RE2-safe:
    * alternations only, no backreferences — script and style strip
    * separately, so the DuckDB oracle recomputes them identically);
    * the entity decode is the fused single-scan native expression
    * `graft_entity_decode` (14 chained regexp_replace columns benched
    * 2.28 s solo vs this kernel — each pass rescanned and reallocated
    * the full document). No UDF, one corpus scan.
    */
  def stripHtml(docs: DataFrame, textCol: String = "text"): DataFrame = {
    if (!graft.functions.GraftFunctions.directBridge)
      graft.functions.GraftFunctions.registerIfAbsent(docs.sparkSession)
    val noBlocks = regexp_replace(
      regexp_replace(col(textCol), "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(
      regexp_replace(noBlocks, "(?s)<!--.*?-->", " "),
      "<[^>]+>", " ")
    docs
      .withColumn("_nt", noTags)
      .withColumn("_de", graft.functions.GraftFunctions.entityDecode(col("_nt")))
      .select(col("doc_id"),
        length(col(textCol)).cast("long").as("n_chars_raw"),
        trim(regexp_replace(col("_de"), "[ \\t\\n\\r]+", " ")).as("text"))
      .withColumn("n_chars_text", length(col("text")).cast("long"))
      .select(col("doc_id"), col("n_chars_raw"), col("n_chars_text"),
        col("text"))
  }

  /** C4-style cleaning battery (Raffel et al. 2020 §2.2) — the LINE-level
    * heuristics that complement [[gopherRules]]'s document-level stats:
    * a line survives iff it ends in terminal punctuation (`. ! ? "`),
    * carries at least `minWordsPerLine` words, and does not mention
    * "javascript" (the boilerplate-nav tell); the PAGE is dropped
    * entirely when any line contains "lorem ipsum" or a curly brace
    * (template/code tells), or when fewer than `minKeptLines` lines
    * survive the line gates (C4's ≥-sentences rule). Output per doc:
    * line counts, the page verdict, and the cleaned text (kept lines in
    * original order; empty when the page is dropped).
    *
    * Determinism: every rule is a string predicate over the line itself
    * (no floats, no RNG), and the cleaned text reassembles via an
    * order-key sort of the kept (pos, line) structs, so the whole row
    * set hash-checks cross-engine. Scale shape: ONE corpus scan — lines
    * explode once, every flag is a codegen'd per-row predicate, and the
    * single aggregation groups by doc_id (partial-agg-fed; a doc's line
    * count bounds the collect_list buffer, never the corpus).
    */
  def c4Filters(docs: DataFrame, minWordsPerLine: Int = 3,
                minKeptLines: Int = 3): DataFrame = {
    val lines = docs
      .select(col("doc_id"),
        posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
      .withColumn("lw", lower(col("line")))
      .withColumn("keep_line",
        col("line").rlike("[.!?\"]$") &&
          size(expr("regexp_extract_all(lw, '\\\\w+', 0)")) >= minWordsPerLine &&
          !col("lw").contains("javascript"))
      .withColumn("poison",
        col("lw").contains("lorem ipsum") || col("line").contains("{"))
    lines
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("long").as("n_lines"),
        sum(when(col("keep_line"), 1L).otherwise(0L)).cast("long")
          .as("n_kept"),
        max(col("poison")).as("poisoned"),
        // collect_list skips the null structs the unkept lines produce;
        // the sort key restores original line order deterministically
        array_join(
          expr("transform(array_sort(collect_list(" +
            "CASE WHEN keep_line THEN struct(pos, line) END)), x -> x.line)"),
          "\n").as("kept_text"))
      .select(col("doc_id"), col("n_lines"), col("n_kept"),
        (!col("poisoned") && col("n_kept") >= minKeptLines).as("page_ok"),
        when(!col("poisoned") && col("n_kept") >= minKeptLines,
          col("kept_text")).otherwise(lit("")).as("cleaned"))
  }

  /** Gopher-style repetition battery in CHARACTER-MASS terms (Rae et
    * al. 2021 §A1.1.2) — the within-doc signals [[repetition]]'s count
    * ratios don't capture: a doc whose most frequent 3-gram is three
    * LONG words is more degenerate than one repeating three short
    * ones. Per doc: top-{2,3,4}-gram char fraction (char mass of the
    * heaviest n-gram over total token char mass) and dup-{5,6}-gram
    * char fraction (char mass of all n-grams occurring ≥2×).
    *
    * Determinism: "heaviest" is MAX over grams of count × gram char
    * mass — a pure max of exact Longs, so no most-frequent tiebreak is
    * ever needed (the usual top-1 ambiguity when two grams tie on
    * count). Char mass of one occurrence = length(gram) − (n−1)
    * (the concat_ws separators subtracted back out). Fractions are one
    * Long/Long double division each, rounded.
    *
    * Shape: ONE corpus scan, NO join. Tokens posexplode once (a
    * codegen'd Generate); ONE window pass per doc attaches lead(1..5)
    * to every position, and each row emits its up-to-6 grams (stratum
    * n exists iff lead(n−1) is non-null — leads are monotone within a
    * doc, so concat_ws never silently shortens a gram); ONE map-side-
    * combined (doc, gram) count follows, with n recovered from the
    * gram's own token count. The n=1 stratum IS the char-mass
    * accounting — Σ count(tok)·len(tok) over unigrams equals total
    * token char mass — so the denominator falls out of the same
    * aggregation that produces the numerators (an earlier cut joined a
    * separate mass projection back in: TWO corpus scans, caught by the
    * executed-plan scan pin). The window costs one token-mass exchange
    * the pure-HOF formulation avoided, but the index-lambda
    * `filter(transform(...))` strata evaluate INTERPRETED per element
    * (the header's HOF trap, in its non-inlined form) — MEASURED at
    * sf0.1 local[32]: HOF generation alone ~3.0 s, this full pipeline
    * ~1.0 s. A doc with zero tokens emits no row (the novelty/
    * bigramFluency no-row precedent).
    */
  def gopherRepetition(docs: DataFrame): DataFrame = {
    val pos = docs
      .select(col("doc_id"), posexplode(tokens).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val lead1to5 = (1 to 5).map(i => lead(col("tok"), i).over(w).as(s"l$i"))
    val withLeads = pos
      .select(Seq(col("doc_id"), col("tok")) ++ lead1to5: _*)
    def ls(n: Int): Seq[Column] =
      col("tok") +: (1 until n).map(i => col(s"l$i"))
    val gramStrata = array(
      array(col("tok")) +: (2 to 6).map { n =>
        when(col(s"l${n - 1}").isNotNull, array(concat_ws(" ", ls(n): _*)))
          .otherwise(array().cast("array<string>"))
      }: _*)
    val perGram = withLeads
      .select(col("doc_id"), explode(flatten(gramStrata)).as("gram"))
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("c"))
      .withColumn("n", size(split(col("gram"), " ")))
      .withColumn("w",
        col("c") * (length(col("gram")) - (col("n") - 1).cast("long")))
    val perDoc = perGram
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("n") === 1, col("w"))).as("n_token_chars"),
        max(when(col("n") === 2, col("w"))).as("t2"),
        max(when(col("n") === 3, col("w"))).as("t3"),
        max(when(col("n") === 4, col("w"))).as("t4"),
        sum(when(col("n") === 5 && col("c") >= 2, col("w"))).as("d5"),
        sum(when(col("n") === 6 && col("c") >= 2, col("w"))).as("d6"))
    def frac(c: Column): Column =
      coalesce(round(c.cast("double") /
        nullif(col("n_token_chars").cast("double"), lit(0d)), 6), lit(0.0))
    perDoc
      .select(col("doc_id"),
        col("n_token_chars").cast("long").as("n_token_chars"),
        frac(col("t2")).as("top_2gram_char_frac"),
        frac(col("t3")).as("top_3gram_char_frac"),
        frac(col("t4")).as("top_4gram_char_frac"),
        frac(col("d5")).as("dup_5gram_char_frac"),
        frac(col("d6")).as("dup_6gram_char_frac"))
  }

  /** Per-document shingle NOVELTY against everything that came before
    * it — the memorization-risk / marginal-value score a pretraining
    * pipeline ranks late-crawl documents by: novelty(d) = fraction of
    * d's distinct n-gram shingles whose corpus-wide FIRST occurrence
    * (minimum doc_id) is d itself. A doc stitched entirely from
    * earlier documents scores 0; fully fresh text scores 1. Docs with
    * fewer than n tokens have no shingle and emit no row (the
    * bigramFluency no-row precedent — a gate composes a join by
    * policy).
    *
    * Shape: a shingle's novel occurrences need NO attribution join
    * back to its rows — grouping the first-occurrence relation by its
    * OWN min gives each doc's novel-shingle count directly:
    * n_novel(d) = |{shingles with min(doc_id) = d}|. So the op is two
    * all-PARTIAL aggregations of the shingle rows (per-doc size;
    * per-shingle min re-grouped by the winning doc) plus one join of
    * two ≤|docs|-row frames. Every exchange carries map-side-combined
    * rows, which is what makes the op Zipf-IMMUNE: a boilerplate
    * shingle present in half the corpus folds to one row per map task
    * before any shuffle. The two shapes this replaced both had a
    * corpus-mass skew term — a window min over the shingle partition
    * (windows have NO partial aggregation: the hot shingle's every row
    * lands on one reducer) and a groupBy+join-back (the hot shingle's
    * full row set through the join exchange). The price is reading the
    * pruned (doc_id, text) columns twice — scans are the cheap
    * currency at 100 TB, stragglers are not (spec-pinned: 2 scans,
    * ZERO window exchanges). The first-occurrence relation is exactly
    * the dedup fingerprint table the warehouse already maintains.
    */
  def novelty(docs: DataFrame, n: Int = 3): DataFrame = {
    val sh = Dedup.shingleRows(docs, n)
    val perDoc = sh.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_shingles"))
    val novelPerDoc = sh
      .groupBy(col("shingle")).agg(min(col("doc_id")).as("first_doc"))
      .groupBy(col("first_doc")).agg(count(lit(1)).cast("long").as("n_novel"))
      .withColumnRenamed("first_doc", "doc_id")
    perDoc.join(novelPerDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).cast("long").as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_shingles").cast("double"), 6))
  }

  /** Persist the first-occurrence (novelty) index: one (shingle,
    * first_doc) row per distinct corpus shingle, hash-bucketed by
    * shingle and sorted within buckets (the postings layout, so a
    * shingle-equality probe gets bucket-dir pruning + row-group
    * min/max skipping). This is the ingest side of [[novelty]] — the
    * dedup-fingerprint relation a 100 TB warehouse maintains
    * continuously rather than recomputing per scoring pass.
    *
    * `buckets` sizes to the corpus: scoring probes are JOIN-shaped
    * (an increment's shingles span every bucket), so unlike the
    * term-point-probed text index (64), bucketing here mainly bounds
    * per-file size and serves future point lookups/compaction —
    * MEASURED at sf0.1 local[32], 64 buckets cost ~2× the roundtrip
    * of 16 in small-file overhead (each writer task forks one file
    * per bucket dir per generation).
    */
  def saveNoveltyIndex(docs: DataFrame, dir: String, n: Int = 3,
                       buckets: Int = 16): Unit =
    appendFirstSeen(Dedup.shingleRows(docs, n), dir, buckets,
      overwrite = true)

  /** PURE-APPEND ingest: write only the increment's within-batch first
    * occurrences — one pass over the increment, ZERO passes over
    * history. A shingle already indexed simply gains a second row with
    * a LATER first_doc; readers min-fold duplicate shingle rows
    * ([[noveltyWithIndex]]), so no read-modify-write of history rows is
    * ever needed — the appendToTextIndex no-merge contract, carried to
    * the novelty relation.
    */
  def appendToNoveltyIndex(newDocs: DataFrame, dir: String, n: Int = 3,
                           buckets: Int = 16): Unit =
    appendFirstSeen(Dedup.shingleRows(newDocs, n), dir, buckets,
      overwrite = false)

  private def appendFirstSeen(sh: DataFrame, dir: String, buckets: Int,
                              overwrite: Boolean): Unit = {
    require(buckets > 0, "buckets must be positive")
    sh.groupBy(col("shingle")).agg(min(col("doc_id")).as("first_doc"))
      .withColumn("sb", pmod(xxhash64(col("shingle")), lit(buckets.toLong)))
      .sortWithinPartitions(col("sb"), col("shingle"))
      .write.mode(if (overwrite) "overwrite" else "append")
      .partitionBy("sb").parquet(s"$dir/firstseen")
  }

  /** [[novelty]] of an INCREMENT at ingest time: each new doc's
    * effective first-occurrence is the min over the persisted index
    * (min-folded across appended generations) and the increment's own
    * within-batch window-min — `least` skips the NULL of a
    * never-seen shingle, so a shingle new to the corpus attributes to
    * its first arrival exactly as the batch op would. When every
    * indexed doc_id precedes the increment's (the time-ordered ingest
    * invariant), the result is BIT-IDENTICAL to full-corpus [[novelty]]
    * restricted to the increment — the retrain-free-ingest contract the
    * lexical and IVF indexes already carry, on the novelty relation.
    */
  def noveltyWithIndex(spark: org.apache.spark.sql.SparkSession,
                       dir: String, newDocs: DataFrame,
                       n: Int = 3): DataFrame = {
    val inc = Dedup.shingleRows(newDocs, n)
      .withColumn("inc_first",
        min(col("doc_id")).over(Window.partitionBy(col("shingle"))))
    val idx = spark.read.parquet(s"$dir/firstseen")
      .groupBy(col("shingle")).agg(min(col("first_doc")).as("hist_first"))
    inc.join(idx, Seq("shingle"), "left_outer")
      .withColumn("eff_first", least(col("hist_first"), col("inc_first")))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("long").as("n_shingles"),
        sum(when(col("eff_first") === col("doc_id"), 1L).otherwise(0L))
          .cast("long").as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_shingles").cast("double"), 6))
  }
}
