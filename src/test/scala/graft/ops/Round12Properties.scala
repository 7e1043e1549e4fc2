package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** Round-12 invariants over random inputs: keepBest must equal a plain
  * union-find + argmax reference on ANY doc set and pair graph — one
  * survivor per connected component, the max-score member with the
  * min-id tie-break, singletons surviving as themselves. Narrow score
  * range forces frequent ties so the tie-break is genuinely exercised;
  * random graphs include empty edge sets, multi-edges, and both edge
  * orientations. Real Spark jobs per case → low success counts, like
  * the other *Properties objects.
  */
object Round12Properties extends Properties("Round12Ops") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5).withWorkers(1)

  private lazy val spark = TestSpark.spark

  private val genCase: Gen[(Seq[(Long, Long)], Seq[(Long, Long)])] = for {
    n <- Gen.choose(2, 24)
    scores <- Gen.listOfN(n, Gen.choose(0L, 6L)) // narrow: force ties
    nEdges <- Gen.choose(0, 2 * n)
    edges <- Gen.listOfN(nEdges, for {
      a <- Gen.choose(0, n - 1)
      b <- Gen.choose(0, n - 1)
    } yield (a.toLong, b.toLong))
  } yield (
    scores.zipWithIndex.map { case (sc, i) => (i.toLong, sc) },
    edges.filter(e => e._1 != e._2))

  property("keepBest equals the union-find argmax reference (any graph)") =
    Prop.forAllNoShrink(genCase) { case (docs, pairs) =>
      val s = spark
      import s.implicits._
      // reference: union-find, component key = min member id (the
      // label Dedup.components produces), winner = (max score, min id)
      val parent = scala.collection.mutable.Map(docs.map(d => d._1 -> d._1): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x
        else { val r = find(parent(x)); parent(x) = r; r }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val score = docs.toMap
      val expected = docs.map(_._1).groupBy(find).map { case (_, members) =>
        val comp = members.min
        val best = members.map(score).max
        (comp, members.filter(score(_) == best).min, best, members.size.toLong)
      }.toSet
      val got = Dedup.keepBest(
          docs.toDF("doc_id", "score"),
          pairs.toDF("id_a", "id_b"),
          col("score"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      Prop(got == expected) :| s"got $got expected $expected"
    }

  property("keepBestIncremental is bit-identical to the full recompute (any split)") =
    Prop.forAllNoShrink(genCase, Gen.choose(1, 9)) {
      case ((docs, pairs), mod) =>
        val s = spark
        import s.implicits._
        // random increment: every doc_id ≡ 0 (mod `mod`) is "new";
        // pairs split the channel's way — new iff either endpoint is
        // (bridging edges and re-discovered history pairs included)
        val isNew = (i: Long) => i % mod == 0
        val hist = docs.filterNot(d => isNew(d._1))
        val inc = docs.filter(d => isNew(d._1))
        val histPairs = pairs.filter(p => !isNew(p._1) && !isNew(p._2))
        val newPairs = pairs.filter(p => isNew(p._1) || isNew(p._2))
        val docsDf = docs.toDF("doc_id", "score")
        def collectSet(df: org.apache.spark.sql.DataFrame) = df.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
        val full = collectSet(
          Dedup.keepBest(docsDf, pairs.toDF("id_a", "id_b"), col("score")))
        val incr = collectSet(Dedup.keepBestIncremental(
          Dedup.keepBest(hist.toDF("doc_id", "score"),
            histPairs.toDF("id_a", "id_b"), col("score")),
          docsDf, histPairs.toDF("id_a", "id_b"),
          inc.map(_._1).toDF("doc_id"), newPairs.toDF("id_a", "id_b"),
          col("score")))
        Prop(incr == full) :| s"incremental $incr != full $full"
    }

  // ── normalizeText is idempotent, ∀ pathological interleavings ──────
  // The order bug this pins: a control char BETWEEN a base letter and
  // its combining mark blocks NFC composition, so NFC-then-strip left
  // text a second pass would still change; strip-then-NFC does not.
  // The alphabet deliberately over-samples the nasty atoms: controls,
  // combining marks, decomposed pairs, Hangul jamo, whitespace runs.
  private val genNasty: Gen[Seq[String]] = {
    val atom = Gen.oneOf(
      "a", "Z", "9", ".", " ", "  ", "\t", "\n", "", "",
      "", "e", "́", "é", "é", "Å", "Å",
      "ᄀ", "ᅡ", "가", "  ", "x́")
    Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 24).flatMap(len =>
        Gen.listOfN(len, atom).map(_.mkString))))
  }

  property("normalizeText(normalizeText(x)) == normalizeText(x)") =
    Prop.forAllNoShrink(genNasty) { texts =>
      val s = spark
      import s.implicits._
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val once = TextAnalysis.normalizeText(docs)
        .select(col("doc_id"), col("norm_text"))
      val twice = TextAnalysis.normalizeText(
          once.withColumnRenamed("norm_text", "text"))
        .select(col("doc_id"), col("norm_text"))
      val a = once.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val b = twice.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      Prop(a == b) :| s"not idempotent: ${
        a.keySet.filter(k => a(k) != b(k)).map(k =>
          s"$k: '${a(k)}' -> '${b(k)}'").mkString("; ")}"
    }
}
