package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** Invariants of the round-11 operators over random inputs — the
  * ∀-contracts behind the example specs: zOrderKey equals the Morton
  * model and zCellsFor COVERS every point of any query box (a missed
  * cell would silently drop result rows at read time — the one failure
  * mode partition pruning must never have), audioFeatureRows equals a
  * scalar DSP replay for any geometry, and groupedSplits is
  * leakage-free over ANY random pair graph. Real Spark jobs per case →
  * low success counts, like the other *Properties objects.
  */
object Round11Properties extends Properties("Round11Ops") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5).withWorkers(1)

  private lazy val spark = TestSpark.spark

  // ── zOrderKey ≡ Morton model, ∀ (a, b, bits) ────────────────────────
  private val genZCase: Gen[(Int, Seq[(Int, Int)])] = for {
    bits <- Gen.choose(2, 12)
    n <- Gen.choose(3, 12)
    pts <- Gen.listOfN(n, for {
      a <- Gen.choose(0, (1 << bits) - 1)
      b <- Gen.choose(0, (1 << bits) - 1)
    } yield (a, b))
  } yield (bits, pts)

  private def morton(a: Int, b: Int, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1).toLong << (2 * i)) |
        (((b >> i) & 1).toLong << (2 * i + 1))
    }

  property("zOrderKey equals the Morton interleave model") =
    Prop.forAllNoShrink(genZCase) { case (bits, pts) =>
      val s = spark
      import s.implicits._
      val got = pts.toDF("a", "b")
        .select(col("a"), col("b"),
          Curation.zOrderKey(col("a"), col("b"), bits).as("z"))
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2))
        .toMap
      pts.forall { case (a, b) => got((a, b)) == morton(a, b, bits) }
    }

  // ── zCellsFor covers every point of any box (no silent pruning) ─────
  private val genBoxCase: Gen[(Int, Int, Int, Int, Int, Int)] = for {
    bits <- Gen.choose(3, 8)
    bb <- Gen.choose(1, math.min(3, bits))
    aLo <- Gen.choose(0, (1 << bits) - 1)
    aHi <- Gen.choose(aLo, (1 << bits) - 1)
    bLo <- Gen.choose(0, (1 << bits) - 1)
    bHi <- Gen.choose(bLo, (1 << bits) - 1)
  } yield (bits, bb, aLo, aHi, bLo, bHi)

  property("zCellsFor covers every in-box point's bucket") =
    Prop.forAllNoShrink(genBoxCase) { case (bits, bb, aLo, aHi, bLo, bHi) =>
      val cells = Curation.zCellsFor(aLo, aHi, bLo, bHi, bits, bb).toSet
      val shift = bits - bb
      // exhaustive over the box corners + a deterministic sample of
      // interior points (boxes can be large; cover every CELL of the
      // box grid by sampling each cell's corner)
      val samples = for {
        a <- (aLo to aHi by math.max(1, 1 << shift)) ++ Seq(aHi)
        b <- (bLo to bHi by math.max(1, 1 << shift)) ++ Seq(bHi)
      } yield (a, b)
      samples.forall { case (a, b) =>
        cells.contains(morton(a >> shift, b >> shift, bb))
      }
    }

  // ── audioFeatureRows ≡ scalar DSP replay, ∀ geometry ────────────────
  private val genAudioCase: Gen[(Long, Int, Int, Int)] = for {
    seed <- Gen.choose(0L, 500L)
    ch <- Gen.choose(1, 3)
    n <- Gen.choose(1, 400)
    w <- Gen.oneOf(16, 64, 256)
  } yield (seed, ch, n, w)

  property("audioFeatureRows equals the scalar windowed-DSP replay") =
    Prop.forAllNoShrink(genAudioCase) { case (seed, ch, n, w) =>
      val wav = Multimodal.syntheticWav(seed, ch, 8000, n.toLong)
      def sample(i: Long): Int = (((seed * 31 + i) & 0xFFFF).toShort).toInt
      val got = Multimodal.audioFeatureRows("/p", wav, w)
        .map(r => (r.channel, r.window_id) ->
          ((r.n_samples, r.sum_sq, r.sum_abs, r.peak, r.zero_crossings)))
        .toMap
      val expected = (for {
        c <- 0 until ch
        wid <- 0 until (n + w - 1) / w
      } yield {
        val js = (0 until n).filter(j => j / w == wid)
        val vs = js.map(j => sample(j.toLong * ch + c))
        val zc = js.count(j => j > 0 &&
          ((sample(j.toLong * ch + c) < 0) !=
            (sample((j - 1).toLong * ch + c) < 0)))
        (c, wid) -> ((vs.size, vs.map(v => v.toLong * v).sum,
          vs.map(v => math.abs(v).toLong).sum, vs.map(math.abs).max, zc))
      }).toMap
      got == expected
    }

  // ── groupedSplits: zero cross-split pairs, ∀ random pair graphs ─────
  private val genGraphCase: Gen[(Int, Seq[(Long, Long)])] = for {
    n <- Gen.choose(10, 60)
    m <- Gen.choose(1, 12)
    pairs <- Gen.listOfN(m, for {
      a <- Gen.choose(1L, n.toLong)
      b <- Gen.choose(1L, n.toLong) if b != a
    } yield (math.min(a, b), math.max(a, b)))
  } yield (n, pairs.distinct)

  property("groupedSplits never splits a near-dup pair (any graph)") =
    Prop.forAllNoShrink(genGraphCase) { case (n, pairs) =>
      val s = spark
      import s.implicits._
      val docs = (1L to n.toLong).map(i => (i, s"d$i")).toDF("doc_id", "text")
      val pdf = pairs.toDF("id_a", "id_b")
      val grouped = Curation.groupedSplits(docs, pdf, 0.8, 0.1)
        .select(col("doc_id"), col("split"))
      Curation.crossSplitPairs(pdf, grouped).count() == 0L
    }
}
