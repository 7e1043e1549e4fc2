package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.must.Matchers

import graft.TestSpark

class CosineSimilaritySpec extends AnyFlatSpec with Matchers {
  private lazy val spark = TestSpark.spark

  behavior of "graft_cosine (native codegen'd expression)"

  it must "match the HOF aggregate/zip_with formulation bit-for-bit" in {
    GraftFunctions.register(spark)
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val df = (0 until 50).map { i =>
      (i.toLong, Seq.fill(64)(rnd.nextFloat() * 2 - 1), Seq.fill(64)(rnd.nextFloat() * 2 - 1))
    }.toDF("id", "qv", "ev")

    val hofDot =
      "aggregate(zip_with(qv, ev, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    def hofNorm(c: String) =
      s"sqrt(aggregate(transform($c, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0 AS DOUBLE), (acc, x) -> acc + x))"

    val rows = df.select(
      expr("graft_cosine(qv, ev)").as("native"),
      (expr(hofDot) / (expr(hofNorm("qv")) * expr(hofNorm("ev")))).as("hof"))
      .collect()
    rows.foreach { r => r.getDouble(0) must be(r.getDouble(1)) }
  }

  it must "resolve BOTH graft functions through the declarative extensions path alone" in {
    // newSession() = fresh function registry (no temp registrations from
    // other suites) but the same spark.sql.extensions — if
    // GraftSessionExtensions ever drops a function the imperative
    // register() path still has, this goes red (the r6 review found
    // exactly that divergence for graft_int_dot)
    val fresh = spark.newSession()
    fresh.sql("SELECT graft_int_dot(array(1, 2, 3), array(4, 5, 6)) AS d")
      .collect()(0).getLong(0) must be(32L)
    fresh.sql(
      "SELECT graft_cosine(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)), " +
        "array(CAST(1 AS FLOAT), CAST(0 AS FLOAT))) AS c")
      .collect()(0).getDouble(0) must be(1.0 +- 1e-12)
  }

  it must "answer known geometric cases" in {
    GraftFunctions.register(spark)
    val s = spark
    import s.implicits._
    val df = Seq(
      (Seq(1f, 0f), Seq(1f, 0f)),   // identical → 1
      (Seq(1f, 0f), Seq(0f, 1f)),   // orthogonal → 0
      (Seq(1f, 0f), Seq(-1f, 0f)))  // opposite → -1
      .toDF("qv", "ev")
    val out = df.select(expr("graft_cosine(qv, ev)")).collect().map(_.getDouble(0))
    out(0) must be(1.0 +- 1e-12)
    out(1) must be(0.0 +- 1e-12)
    out(2) must be(-1.0 +- 1e-12)
  }
}
