package graft.fs

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** Chunk/reassemble round-trip invariants over random payloads and
  * random (subBlock, block) geometries — the property behind every
  * C-series operator: bytes out == bytes in for ANY layout, and the
  * chunk count is exactly ceil(len / subBlockSize). Each case runs real
  * Spark jobs, so the success count is kept low (like
  * CatalogProperties).
  */
object DataPlaneProperties extends Properties("DataPlane") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5).withWorkers(1)

  private lazy val spark = TestSpark.spark

  private val genCase: Gen[(Array[Byte], Int, Int)] = for {
    n <- Gen.choose(0, 5000)
    seed <- Gen.choose(Long.MinValue, Long.MaxValue)
    sub <- Gen.choose(1, 64)
    mult <- Gen.choose(1, 8)
  } yield {
    val b = new Array[Byte](n)
    new scala.util.Random(seed).nextBytes(b)
    (b, sub, sub * mult)
  }

  private def filesDf(payload: Array[Byte]) = {
    val s = spark
    import s.implicits._
    Seq(("/p", payload)).toDF("path", "data")
  }

  property("reassemble(chunk(x)) == x for any payload and geometry") =
    Prop.forAllNoShrink(genCase) { case (payload, sub, block) =>
      val chunks = DataPlane.chunk(filesDf(payload), sub, block)
      val back =
        if (payload.isEmpty) Array.empty[Byte]
        else DataPlane.reassemble(chunks).collect()(0).getAs[Array[Byte]]("data")
      java.util.Arrays.equals(back, payload)
    }

  property("chunk count == ceil(len / subBlockSize)") =
    Prop.forAllNoShrink(genCase) { case (payload, sub, block) =>
      DataPlane.chunk(filesDf(payload), sub, block).count() ==
        (payload.length + sub - 1) / sub
    }

  property("readRange returns exactly the requested slice") =
    Prop.forAllNoShrink(for {
      c <- genCase if c._1.nonEmpty
      start <- Gen.choose(0, c._1.length - 1)
      len <- Gen.choose(1, c._1.length - start)
    } yield (c, start, len)) { case ((payload, sub, block), start, len) =>
      val chunks = DataPlane.chunk(filesDf(payload), sub, block)
      val got = DataPlane.readRange(chunks, start.toLong, len.toLong)
        .collect()(0).getAs[Array[Byte]]("data")
      java.util.Arrays.equals(got, payload.slice(start, start + len))
    }
}
