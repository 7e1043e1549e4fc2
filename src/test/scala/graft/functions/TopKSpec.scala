package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.must.Matchers

import graft.TestSpark

class TopKSpec extends AnyFlatSpec with Matchers {
  private lazy val spark = TestSpark.spark

  behavior of "graft_topk (bounded map-side top-k aggregate)"

  it must "match the windowed row_number formulation pair for pair" in {
    GraftFunctions.register(spark)
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    // scores drawn from a SMALL integer range so cross-id ties are
    // plentiful and the (score DESC, id ASC) tie-break is actually load-
    // bearing; 16 input partitions so merge crosses partial buffers
    val df = (0 until 5).flatMap { q =>
      (0 until 400).map { id => (q.toLong, id.toLong, rnd.nextInt(40).toDouble) }
    }.toDF("q_id", "neighbor_id", "score").repartition(16)

    val viaAgg = df.groupBy(col("q_id"))
      .agg(expr("graft_topk(score, neighbor_id, 25)").as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("q_id"), col("e.id").as("neighbor_id"),
        (col("pos") + 1).as("rank"), col("e.score").as("score"))

    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 25)
      .select(col("q_id"), col("neighbor_id"), col("rank"), col("score"))

    val a = viaAgg.orderBy(col("q_id"), col("rank")).collect()
    val b = viaWindow.orderBy(col("q_id"), col("rank")).collect()
    a.length must be(5 * 25)
    a.toSeq must be(b.toSeq)
  }

  it must "return every row best-first when k exceeds the group size" in {
    GraftFunctions.register(spark)
    val s = spark
    import s.implicits._
    val out = Seq((1L, 10L, 2.0), (1L, 11L, 3.0), (1L, 12L, 3.0))
      .toDF("q_id", "neighbor_id", "score")
      .groupBy(col("q_id"))
      .agg(expr("graft_topk(score, neighbor_id, 100)").as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.id"), col("e.score"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // score DESC first, then id ASC among the tied 3.0s
    out.toSeq must be(Seq((11L, 3.0), (12L, 3.0), (10L, 2.0)))
  }

  it must "survive buffer serialization round-trips with heap semantics intact" in {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = TopKByScore(Literal(0.0), Literal(0L), Literal(3))
    val buf = agg.createAggregationBuffer()
    Seq((5.0, 1L), (1.0, 2L), (3.0, 3L), (9.0, 4L), (3.0, 0L))
      .foreach { case (sc, id) => buf.insert(sc, id) }
    val back = agg.deserialize(agg.serialize(buf))
    back.sorted.toSeq must be(Seq((9.0, 4L), (5.0, 1L), (3.0, 0L)))
    // merging two buffers keeps the global best 3
    val other = agg.createAggregationBuffer()
    Seq((7.0, 9L), (2.0, 8L)).foreach { case (sc, id) => other.insert(sc, id) }
    back.mergeFrom(other)
    back.sorted.toSeq must be(Seq((9.0, 4L), (7.0, 9L), (5.0, 1L)))
  }

  it must "rank NaN scores worst instead of letting one jam the heap" in {
    // IEEE comparisons answer false for NaN: an unguarded heap whose
    // ROOT goes NaN (first row of a partition) rejects every later
    // insertion. The rank() guard orders NaN below -Inf, ties by id.
    val agg = TopKByScore(
      org.apache.spark.sql.catalyst.expressions.Literal(0.0),
      org.apache.spark.sql.catalyst.expressions.Literal(0L),
      org.apache.spark.sql.catalyst.expressions.Literal(2))
    val buf = agg.createAggregationBuffer()
    buf.insert(Double.NaN, 1L) // NaN lands at the root first
    buf.insert(5.0, 2L)
    buf.insert(3.0, 3L) // must EVICT the NaN, not be rejected by it
    buf.sorted.toSeq must be(Seq((5.0, 2L), (3.0, 3L)))
    // a NaN may be retained only while better scores don't fill k —
    // and then sorts LAST, after every real score
    val loose = agg.createAggregationBuffer()
    loose.insert(Double.NaN, 7L)
    loose.insert(1.0, 8L)
    val out = loose.sorted.toSeq
    out.head must be((1.0, 8L))
    out(1)._2 must be(7L)
  }

  it must "score a zero-norm vector as 0.0 cosine, never NaN" in {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_cosine(array(CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                    array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS z,
        |       graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                    array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS o
        |""".stripMargin).collect()(0)
    r.getDouble(0) must be(0.0)
    r.getDouble(1) must be(1.0)
  }

  it must "resolve through the declarative extensions path alone" in {
    val fresh = spark.newSession()
    val arr = fresh.sql(
      """SELECT graft_topk(CAST(s AS DOUBLE), CAST(i AS BIGINT), 2) AS top
        |FROM VALUES (1.0, 1), (3.0, 2), (2.0, 3) AS t(s, i)""".stripMargin)
      .selectExpr("transform(top, x -> x.id) AS ids")
      .collect()(0).getSeq[Long](0)
    arr must be(Seq(2L, 3L))
  }
}
