package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** Invariants of the round-6 pipeline operators over random corpora —
  * the contracts that hold for ANY input, complementing the
  * example-based specs: boilerplate stripping is the identity below
  * threshold, domain-mix weights form a distribution, SQ8 quantization
  * stays in its codomain. Real Spark jobs per case → low success
  * counts, like the other *Properties objects.
  */
object PipelineProperties extends Properties("PipelineOps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5).withWorkers(1)

  private lazy val spark = TestSpark.spark

  private val genCorpus: Gen[Seq[(Long, String, String)]] = for {
    n <- Gen.choose(1, 8)
    srcs <- Gen.listOfN(n, Gen.oneOf("A", "B"))
    texts <- Gen.listOfN(n, Gen.choose(1, 12).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf("alpha", "beta", "gamma", "delta"))
        // mixed separators so a third of corpora have MULTI-LINE docs —
        // the identity property must exercise split/reassembly, not
        // just single-line pass-through
        .flatMap(ws => Gen.oneOf(" ", "\n", " ").map(sep =>
          ws.mkString(sep)))))
  } yield srcs.zip(texts).zipWithIndex.map { case ((s, t), i) =>
    (i.toLong, s, t) }

  private def df(rows: Seq[(Long, String, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  property("stripBoilerplateLines is the identity when minDocs exceeds the corpus") =
    Prop.forAllNoShrink(genCorpus) { rows =>
      val out = Dedup.stripBoilerplateLines(df(rows), minDocs = rows.size + 1)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
        .toMap
      rows.forall { case (id, _, text) =>
        val lines = text.split("\n", -1)
        out(id) == ((lines.length.toLong, lines.length.toLong, text))
      }
    }

  property("domainMix weights are a distribution over sources") =
    Prop.forAllNoShrink(genCorpus) { rows =>
      val docs = df(rows).select(col("doc_id"), col("source"),
        col("text"))
      val out = Curation.domainMix(docs, col("source")).collect()
      val weights = out.map(_.getDouble(3))
      val nDocsTotal = out.map(_.getLong(1)).sum
      // rounding at 6 places: the sum is 1 within n*5e-7
      weights.forall(w => w > 0 && w <= 1) &&
        math.abs(weights.sum - 1.0) <= out.length * 5e-7 &&
        nDocsTotal == rows.size
    }

  private val genVecs: Gen[Seq[Seq[Float]]] = for {
    n <- Gen.choose(2, 10)
    dim <- Gen.choose(2, 8)
    seed <- Gen.choose(Long.MinValue, Long.MaxValue)
  } yield {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(Seq.fill(dim)(rnd.nextFloat() * 2 - 1))
  }

  property("SQ8 candidates stay in the int8 codomain and top-k matches brute after rerank") =
    Prop.forAllNoShrink(genVecs) { vecs =>
      val s = spark
      import s.implicits._
      val emb = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      // codomain: every quantized component is an int8 value
      val qvals = Similarity.quantized(emb, "vec_id", "q",
          Similarity.sq8Bounds(emb))
        .select(explode(col("q")).as("v"))
        .agg(min(col("v")), max(col("v"))).collect()(0)
      val codomainOk = qvals.getInt(0) >= -127 && qvals.getInt(1) <= 127
      val q = emb.filter(col("vec_id") < 2)
      val k = math.min(3, vecs.size - 1)
      val sq8 = Similarity.sq8TopK(q, emb, k = k, cand = vecs.size)
        .select("q_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val brute = Similarity.bruteTopK(q, emb, k = k).select("q_id", "neighbor_id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      // full-candidate rerank makes sq8 EXACTLY brute for any geometry
      codomainOk && sq8 == brute
    }
}
