package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** Invariants of the round-10 operators over random inputs — the
  * ∀-contracts behind the example specs: aHash's brightness invariance
  * holds for EVERY pattern/geometry/shift (it is algebra, not luck),
  * termSearch's exact-integer ranking equals a from-scratch rational
  * reference on any corpus, and bpeEncode always reproduces a manual
  * replay of its own merge table. Real Spark jobs per case → low
  * success counts, like the other *Properties objects.
  */
object Round10Properties extends Properties("Round10Ops") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5).withWorkers(1)

  private lazy val spark = TestSpark.spark

  // ── aHash: exact brightness invariance, ∀ pattern/dims/shift ────────
  private val genImageCase: Gen[(Long, Int, Int, Int)] = for {
    seed <- Gen.choose(0L, 1000L)
    w <- Gen.choose(8, 40)
    h <- Gen.choose(8, 40)
    shift <- Gen.choose(1, 95)
  } yield (seed, w, h, shift)

  property("aHash is exactly invariant under any uniform brightness shift") =
    Prop.forAllNoShrink(genImageCase) { case (seed, w, h, shift) =>
      val s = spark
      import s.implicits._
      val out = Multimodal.aHash(Seq(
          ("/base", Multimodal.patternedImage(seed, w, h, 0)),
          ("/shifted", Multimodal.patternedImage(seed, w, h, shift)))
          .toDF("path", "data"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      out("/base") == out("/shifted")
    }

  // ── termSearch: Long score equals an exact rational reference ───────
  private val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon")

  private val genSearchCase: Gen[(Seq[(Long, String)], Seq[String])] = for {
    n <- Gen.choose(2, 7)
    texts <- Gen.listOfN(n, Gen.choose(1, 10).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf(vocab)).map(_.mkString(" "))))
    arity <- Gen.choose(1, 3)
    terms <- Gen.pick(arity, vocab)
  } yield (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) },
    terms.toSeq)

  property("termSearch ranking equals the from-scratch tf/df reference") =
    Prop.forAllNoShrink(genSearchCase) { case (rows, terms) =>
      val s = spark
      import s.implicits._
      val got = TextAnalysis.termSearch(rows.toDF("doc_id", "text"),
          terms, k = rows.size)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
      // reference: exact integer scores from first principles
      val toks = rows.map { case (id, t) =>
        id -> t.split(" ").toSeq.filter(_.nonEmpty) }.toMap
      val dfm = terms.map(t =>
        t -> toks.values.count(_.contains(t)).toLong).filter(_._2 > 0).toMap
      val present = terms.filter(dfm.contains)
      val expected =
        if (present.isEmpty) Seq.empty[(Long, Long)]
        else {
          val prod = present.map(dfm).product
          rows.map(_._1).flatMap { id =>
            val score = present.map(t =>
              toks(id).count(_ == t).toLong * (prod / dfm(t))).sum
            if (score > 0) Some(id -> score) else None
          }.sortBy { case (id, sc) => (-sc, id) }
        }
      got == expected
    }

  // ── semanticDedupExact: decisions equal a union-find reference ──────
  private val genVecs: Gen[Seq[(Long, Seq[Float])]] = for {
    n <- Gen.choose(2, 8)
    vs <- Gen.listOfN(n, Gen.listOfN(4, Gen.choose(-3, 3).map(_.toFloat)))
  } yield vs.zipWithIndex.collect {
    // zero vectors have undefined cosine — the generator skips them
    // (the op itself never divides by zero on real embeddings)
    case (v, i) if v.exists(_ != 0f) => (i.toLong, v)
  }

  property("semanticDedupExact equals a driver-side union-find reference") =
    Prop.forAllNoShrink(genVecs) { rows =>
      rows.size < 2 || {
        val s = spark
        import s.implicits._
        val got = Similarity.semanticDedupExact(
            rows.toDF("vec_id", "embedding"), threshold = 0.8)
          .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
          .sortBy(_._1).toSeq
        // reference: all-pairs cosine in Scala + union-find, min-id rep
        def cos(a: Seq[Float], b: Seq[Float]): Double = {
          val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
          val na = math.sqrt(a.map(x => x.toDouble * x).sum)
          val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
          dot / (na * nb)
        }
        val parent = scala.collection.mutable.Map(
          rows.map(r => r._1 -> r._1): _*)
        def find(x: Long): Long =
          if (parent(x) == x) x
          else { val r = find(parent(x)); parent(x) = r; r }
        for {
          (ia, va) <- rows; (ib, vb) <- rows
          if ia < ib && cos(va, vb) >= 0.8
        } {
          val (ra, rb) = (find(ia), find(ib))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expected = rows.map(_._1).sorted.map { id =>
          val rep = find(id)
          (id, id == rep, rep)
        }
        got == expected
      }
    }

  // ── bpeEncode: always the manual replay of its own merge table ──────
  private val genBpeCorpus: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(1, 5)
    texts <- Gen.listOfN(n, Gen.choose(2, 12).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" "))))
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  property("bpeEncode reproduces a manual replay of the learned merges") =
    Prop.forAllNoShrink(genBpeCorpus) { rows =>
      val s = spark
      import s.implicits._
      val corpus = rows.toDF("doc_id", "text")
      val merges = TextAnalysis.bpeMergesBatched(corpus, nMerges = 3)
        .orderBy(col("merge_rank")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val enc = TextAnalysis.bpeEncode(corpus, merges)
        .collect().map(r => r.getLong(0) -> r.getSeq[String](3)).toMap
      rows.forall { case (id, text) =>
        var st = "<" + text.split(" ").filter(_.nonEmpty).mkString("><") + ">"
        merges.foreach { case (l, r) =>
          st = st.replace(s"<$l><$r>", s"<${l}_$r>") }
        enc(id) == "[^<>]+".r.findAllIn(st).toSeq
      }
    }
}
