package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** Invariants of the chunker and the pack executor over random corpora
  * and geometries — the contracts a training pipeline silently relies
  * on: total coverage (every token lands in a chunk), exact overlap
  * between consecutive chunks, and pack materialization conserving
  * every token exactly once in planner order. Each case runs real Spark
  * jobs, so the success count is kept low (like DataPlaneProperties).
  */
object CurationProperties extends Properties("Curation") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5).withWorkers(1)

  private lazy val spark = TestSpark.spark

  private val genCase: Gen[(Seq[String], Int, Int)] = for {
    nDocs <- Gen.choose(1, 6)
    lens <- Gen.listOfN(nDocs, Gen.choose(0, 40))
    chunk <- Gen.choose(1, 12)
    stride <- Gen.choose(1, chunk)
  } yield (lens.zipWithIndex.map { case (n, d) =>
    (0 until n).map(i => s"d${d}t$i").mkString(" ") }, chunk, stride)

  private def docsDf(texts: Seq[String]) = {
    val s = spark
    import s.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, "x", t) }
      .toDF("doc_id", "lang", "text")
  }

  property("chunks cover every token; adjacent chunks overlap by chunk−stride") =
    Prop.forAllNoShrink(genCase) { case (texts, chunk, stride) =>
      val out = Curation.chunkWithOverlap(docsDf(texts), chunk, stride)
        .collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.sortBy(_.getLong(1))
          .map(r => r.getString(3).split(" ").filter(_.nonEmpty).toSeq).toSeq)
        .toMap
      texts.zipWithIndex.forall { case (t, d) =>
        val toks = t.split(" ").filter(_.nonEmpty).toSeq
        val chunks = out(d.toLong)
        // coverage: stitching chunks at stride offsets reproduces the doc
        val stitched = chunks.zipWithIndex
          .flatMap { case (c, i) => c.drop(if (i == 0) 0 else chunk - stride) }
        stitched == toks &&
          // every non-final chunk is full-size
          chunks.dropRight(1).forall(_.size == chunk) &&
          // overlap contract between consecutive chunks
          chunks.sliding(2).forall {
            case Seq(a, b) => a.takeRight(chunk - stride) == b.take(chunk - stride)
            case _ => true
          }
      }
    }

  property("materializePacks conserves every token once, in order, within budget groups") =
    Prop.forAllNoShrink(genCase) { case (texts, budgetSeed, _) =>
      val budget = budgetSeed * 4 // decouple from chunk geometry, keep > 0
      val docs = docsDf(texts)
      val packs = Curation.materializePacks(docs, col("lang"), budget,
        col("doc_id")).orderBy(col("pack_id")).collect()
      // compare TOKEN sequences, not raw strings: an empty doc joins
      // into its pack as an empty element, leaving a harmless extra
      // separator in packed_text that a string compare would flag
      val stitched = packs.flatMap(_.getString(4).split(" ")).filter(_.nonEmpty).toSeq
      val original = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
      val tokensConserved = stitched == original
      // pack token totals sum to the corpus total
      val total = packs.map(_.getLong(3)).sum
      val expected = texts.map(_.split(" ").count(_.nonEmpty).toLong).sum
      tokensConserved && total == expected
    }
}
