package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** Invariants of the round-14 selection ops over random inputs, each
  * checked against a driver-side REFERENCE implementation — the
  * distributed histogram-cut must equal the sequential greedy scan it
  * replaces, and URL canonicalization must be a projection (idempotent,
  * case-stable). Real Spark jobs per case, so success counts stay low
  * (the CurationProperties discipline).
  */
object SelectionOpsProperties extends Properties("SelectionOps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5).withWorkers(1)

  private lazy val spark = TestSpark.spark

  // ── tokenBudgetSelect ≡ sequential greedy prefix ─────────────────────

  private val genBudgetCase: Gen[(Seq[(Long, Long, Long)], Long)] = for {
    n <- Gen.choose(1, 30)
    rows <- Gen.listOfN(n, for {
      sc <- Gen.choose(0L, 6L)
      ct <- Gen.choose(0L, 20L)
    } yield (sc, ct))
    budget <- Gen.choose(1L, 200L)
  } yield (rows.zipWithIndex.map { case ((sc, ct), i) =>
    (i.toLong, sc, ct) }, budget)

  /** The spec the histogram cut implements: walk docs in (score desc,
    * doc_id asc) order, take while the running cost stays ≤ budget —
    * but stop the TAKE only within the boundary stratum; the
    * histogram-cut semantics admit whole strata first, so the
    * reference is exactly that: full strata while they fit, then the
    * in-order prefix of the first stratum that does not.
    */
  private def greedyReference(rows: Seq[(Long, Long, Long)],
                              budget: Long): Set[Long] = {
    val strata = rows.groupBy(_._2).toSeq.sortBy(-_._1)
    var used = 0L
    val out = Set.newBuilder[Long]
    var boundaryDone = false
    strata.foreach { case (_, members) =>
      if (!boundaryDone) {
        val mass = members.map(_._3).sum
        if (used + mass <= budget) {
          used += mass
          members.foreach(m => out += m._1)
        } else {
          // boundary stratum: doc_id-ordered prefix of what still fits
          var rem = budget - used
          members.sortBy(_._1).foreach { m =>
            if (m._3 <= rem) { rem -= m._3; out += m._1 }
            else rem = -1 // prefix semantics: stop at the first misfit
          }
          boundaryDone = true
        }
      }
    }
    out.result()
  }

  property("tokenBudgetSelect equals the sequential greedy histogram cut") =
    Prop.forAllNoShrink(genBudgetCase) { case (rows, budget) =>
      val s = spark
      import s.implicits._
      val df = rows.toDF("doc_id", "sc", "ct")
      val got = Curation.tokenBudgetSelect(df, col("sc"), col("ct"), budget)
        .collect().map(_.getLong(0)).toSet
      val want = greedyReference(rows, budget)
      Prop(got == want) :| s"got=$got want=$want budget=$budget rows=$rows"
    }

  // ── canonicalizeUrl is a projection ─────────────────────────────────

  private val genUrl: Gen[String] = for {
    scheme <- Gen.oneOf("http", "HTTPS", "https", "HTTP")
    host <- Gen.oneOf("Ex.COM", "www.site3.com", "A.b.C")
    port <- Gen.oneOf("", ":443", ":80", ":8080")
    path <- Gen.oneOf("", "/", "/p", "/p/q")
    params <- Gen.someOf(Seq("id=1", "utm_s=x", "a=2", "utm_c=y", "b=3"))
    frag <- Gen.oneOf("", "#f", "#sec2")
  } yield scheme + "://" + host + port + path +
    (if (params.isEmpty) "" else "?" + params.mkString("&")) + frag

  property("canonicalizeUrl is idempotent and drops every utm param") =
    Prop.forAllNoShrink(Gen.listOfN(6, genUrl)) { urls =>
      val s = spark
      import s.implicits._
      val once = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
        .toDF("doc_id", "url")
        .select(col("doc_id"), Dedup.canonicalizeUrl(col("url")).as("c"))
        .orderBy("doc_id").collect().map(_.getString(1)).toSeq
      val twice = once.zipWithIndex.map { case (u, i) => (i.toLong, u) }
        .toDF("doc_id", "url")
        .select(col("doc_id"), Dedup.canonicalizeUrl(col("url")).as("c"))
        .orderBy("doc_id").collect().map(_.getString(1)).toSeq
      val idem = Prop(once == twice) :| s"once=$once twice=$twice"
      val noUtm = Prop(once.forall(!_.contains("utm_"))) :| s"utm in $once"
      val noFrag = Prop(once.forall(!_.contains("#"))) :| s"frag in $once"
      idem && noUtm && noFrag
    }
}
