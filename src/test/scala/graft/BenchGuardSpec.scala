package graft

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.must.Matchers

/** Pins the Bench rep-slope degradation guard: the r6 driver bench
  * recorded dedup_simhash_wide growing 3.27 → 5.17 → 14.57 s across
  * in-process reps while the min-of-reps summary channel showed a
  * healthy number — monotone growth must FLAG, normal warmup (rep-1
  * slowest) and sub-second jitter must not.
  */
class BenchGuardSpec extends AnyFlatSpec with Matchers {

  behavior of "Bench.degrades (rep-slope guard)"

  it must "fire on the r6 dedup_simhash_wide degradation pattern" in {
    Bench.degrades(Seq(3.27, 5.17, 14.57)) must be(true)
  }

  it must "fire on late-rep blowup even when middle reps look healthy" in {
    Bench.degrades(Seq(2.0, 1.8, 9.0)) must be(true)
  }

  it must "fire on blowup masked by a slow rep-1 (the r7 escape)" in {
    // measured isolated dedup_simhash_wide r7: 13.02 is under 2×8.31
    // (the old rep-1 baseline let it through) but 4× the proven 3.27 s
    // capability — min-of-preceding-reps catches it
    Bench.degrades(Seq(8.31, 3.27, 13.02)) must be(true)
  }

  it must "stay clean on the normal warmup-then-stable profile" in {
    // the measured r7 isolated profile of the same query
    Bench.degrades(Seq(9.41, 3.31, 2.76, 2.62, 2.39)) must be(false)
    Bench.degrades(Seq(2.95, 2.49, 2.54)) must be(false)
    // r7 fs_cascade_delete contamination-victim shape: warmup rep-1,
    // fast later reps — min-shrinking must never flag it
    Bench.degrades(Seq(2.86, 0.97, 0.98)) must be(false)
  }

  it must "not flag sub-second jitter that doubles a tiny rep-1" in {
    // 2x trip alone would flag 0.11 -> 0.25; the +1s absolute floor
    // keeps fast queries' noise band out of the guard
    Bench.degrades(Seq(0.11, 0.25, 0.12)) must be(false)
  }

  it must "ignore failed runs and degenerate inputs" in {
    Bench.degrades(Seq(-1.0)) must be(false)
    Bench.degrades(Seq.empty) must be(false)
    Bench.degrades(Seq(5.0)) must be(false)
  }

  behavior of "Bench.exonerates (in-JVM recheck of a flagged query)"

  it must "exonerate the r8 driver simhash_wide blip shape" in {
    // suite reps 3.0 → 3.1 → 9.1 flagged; an isolated recheck landing
    // back at the ~3 s capability proves the 9.1 was transient weather,
    // not in-process growth
    Bench.exonerates(2.99, Seq(3.1, 2.8, 3.0)) must be(true)
  }

  it must "confirm a flag whose recheck stays slow (a real leak)" in {
    // the r7 checkpoint-leak class: leaked state is still loaded, so
    // every recheck rep stays far above the proven minimum
    Bench.exonerates(1.1, Seq(3.6, 3.7, 3.8)) must be(false)
  }

  it must "use the same band as the guard: 2x OR +1s, whichever is wider" in {
    // fast query: 2x of 0.4 is 0.8, but +1s allows up to 1.4
    Bench.exonerates(0.4, Seq(1.3)) must be(true)
    Bench.exonerates(0.4, Seq(1.5)) must be(false)
    // slow query: +1s of 4.0 is 5.0, but 2x allows up to 8.0
    Bench.exonerates(4.0, Seq(7.9)) must be(true)
    Bench.exonerates(4.0, Seq(8.1)) must be(false)
  }

  it must "never exonerate on failed or empty rechecks" in {
    Bench.exonerates(2.0, Seq(-1.0, -1.0)) must be(false)
    Bench.exonerates(2.0, Seq.empty) must be(false)
  }

  behavior of "Bench.mergedMin (exoneration evidence becomes the record)"

  it must "record the recheck floor when it undercuts the suite reps" in {
    // the r16 archaeology case: text_langid_eval printed 8.80 s in a
    // contaminated suite window while its same-run recheck sat at the
    // 0.37 s capability — the RECORD must carry the proven floor so
    // next round's cross-round ratios don't re-inherit the artifact
    Bench.mergedMin(Seq(8.80, 8.91, 9.02), Seq(0.38, 0.37, 0.40)) must be(0.37)
  }

  it must "keep the suite min when no recheck ran or the recheck is slower" in {
    Bench.mergedMin(Seq(1.2, 1.0, 1.1), Seq.empty) must be(1.0)
    // a CONFIRMED degradation's recheck stays slow: the suite min is
    // still the best evidence of capability this run
    Bench.mergedMin(Seq(1.0, 3.5, 3.6), Seq(3.4, 3.5)) must be(1.0)
  }

  it must "ignore failed reps on either side and stay -1 when all failed" in {
    Bench.mergedMin(Seq(-1.0), Seq(2.0, 1.8)) must be(1.8)
    Bench.mergedMin(Seq(2.5, -1.0), Seq(-1.0)) must be(2.5)
    Bench.mergedMin(Seq(-1.0), Seq(-1.0, -1.0)) must be(-1.0)
    Bench.mergedMin(Seq.empty, Seq.empty) must be(-1.0)
  }

  behavior of "Bench.crossRoundFlag (round-over-round level-shift guard)"

  it must "flag the two historical escapes that motivated it" in {
    // pipeline_train_set r9→r10: 1.45 → 2.40 s min, rep-stable,
    // channel code untouched — a level shift, not in-run growth
    Bench.crossRoundFlag(1.455, 2.399) must be(Some("shifted"))
    // stream_decontaminate r8→r9: 1.10 → 4.54 s — a full regression
    Bench.crossRoundFlag(1.10, 4.54) must be(Some("regressed"))
  }

  it must "stay silent across the measured r9→r10 drift band" in {
    // every non-shift common query moved ≤1.21×; the widest movers:
    Bench.crossRoundFlag(1.086, 1.309) must be(None) // dedup_substring
    Bench.crossRoundFlag(0.804, 0.916) must be(None) // q24_profile
    // improvements never flag
    Bench.crossRoundFlag(4.536, 0.466) must be(None)
  }

  it must "hold fast queries to the absolute floors, not just ratios" in {
    // 2.5× of a 0.1 s query is noise (+0.15 s), not a regression
    Bench.crossRoundFlag(0.10, 0.25) must be(None)
    // +0.3 s floor for shifted, +0.5 s for regressed
    Bench.crossRoundFlag(0.10, 0.39) must be(None)
    Bench.crossRoundFlag(0.10, 0.45) must be(Some("shifted"))
    Bench.crossRoundFlag(0.10, 0.70) must be(Some("regressed"))
  }

  it must "ignore failed runs and missing baselines" in {
    Bench.crossRoundFlag(0.0, 5.0) must be(None)
    Bench.crossRoundFlag(-1.0, 5.0) must be(None)
    Bench.crossRoundFlag(2.0, -1.0) must be(None)
  }

  behavior of "Bench.readBaselineMins (committed BENCH_DETAIL parse)"

  it must "read per-query mins from a detail file and skip junk" in {
    val f = java.io.File.createTempFile("bench_detail", ".json")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath,
      ("""{"metric":"total","value_min":3.0,"eval":"forced_full_row",""" +
        """"sf":"/data/sf0.1","queries":{""" +
        """"q_a":{"reps":[1.2,1.0],"first":1.2,"min":1.0},""" +
        """"q_b":{"min":0.5,"degrades":false},""" +
        """"q_junk":{"reps":[1.0]}}}""").getBytes("UTF-8"))
    val m = Bench.readBaselineMins(f.getAbsolutePath, "/data/sf0.1")
    m must be(Map("q_a" -> 1.0, "q_b" -> 0.5))
    // a record with no sf field still compares (trust the caller), but
    // it must carry the eval stamp — a stampless record is count()-era
    val g = java.io.File.createTempFile("bench_nosf", ".json")
    g.deleteOnExit()
    java.nio.file.Files.write(g.toPath,
      """{"eval":"forced_full_row","queries":{"q_a":{"min":1.0}}}"""
        .getBytes("UTF-8"))
    Bench.readBaselineMins(g.getAbsolutePath, "/data/sf0.1") must be(
      Map("q_a" -> 1.0))
  }

  it must "disarm on a count()-era baseline (eval-mode mismatch)" in {
    // count() let Catalyst prune final outer-join branches AND every
    // aggregate expression a row count doesn't need, so count-era mins
    // measured LESS work — comparing forced-full-row mins against them
    // would mass-flag honest re-pricings as regressions (measured r14:
    // 13 false "regressed" + 14 false "shifted"). Same loud disarm as
    // the SF mismatch: empty map, baseline_n = 0 on the summary line.
    val f = java.io.File.createTempFile("bench_eval_mismatch", ".json")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath,
      ("""{"sf":"/data/sf0.1","queries":""" +
        """{"q_a":{"min":0.3}}}""").getBytes("UTF-8"))
    Bench.readBaselineMins(f.getAbsolutePath, "/data/sf0.1") must be(
      Map.empty)
  }

  it must "disarm on a scale-factor mismatch instead of flagging noise" in {
    // an sf0.01 smoke run rewrites the detail file; a later sf0.1 run
    // comparing against those mins would mass-flag ~4x scale deltas as
    // regressions (observed r11: 1 regressed + 11 shifted, all false).
    // The guard must return empty — baseline_n 0 is the loud disarm.
    val f = java.io.File.createTempFile("bench_sf_mismatch", ".json")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath,
      ("""{"sf":"/data/sf0.01","queries":""" +
        """{"q_a":{"min":0.3}}}""").getBytes("UTF-8"))
    Bench.readBaselineMins(f.getAbsolutePath, "/data/sf0.1") must be(
      Map.empty)
  }

  it must "return empty (never throw) on a missing or corrupt file" in {
    Bench.readBaselineMins("/nonexistent/path.json",
      "/data/sf0.1") must be(Map.empty)
    val f = java.io.File.createTempFile("bench_corrupt", ".json")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath, "not json{{{".getBytes("UTF-8"))
    Bench.readBaselineMins(f.getAbsolutePath,
      "/data/sf0.1") must be(Map.empty)
  }

  it must "catch a below-summary-floor query regressing above the floor" in {
    // The r11 coverage hole: BENCH_r10's summary line floor-truncated
    // 65 fast queries, and a baseline rebuilt from the SUMMARY left
    // them uncompared (baseline_n 66 of 131) — a 0.1 s query could
    // regress 10x unseen. The committed BENCH_DETAIL.json carries
    // mins for EVERY query including sub-floor ones; this pins the
    // full path: a detail record whose min was cut from the summary
    // (0.12 < floor 0.239) still arms the guard, and a blowup past
    // the floor fires `regressed` through the exact same thresholds.
    val f = java.io.File.createTempFile("bench_subfloor", ".json")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath,
      ("""{"sf":"/data/sf0.1","eval":"forced_full_row",""" +
        """"q_floor":0.239,"n_below_floor":1,""" +
        """"queries":{"q_fast":{"reps":[0.14,0.12,0.13],"min":0.12},""" +
        """"q_slow":{"min":2.0}}}""").getBytes("UTF-8"))
    val base = Bench.readBaselineMins(f.getAbsolutePath, "/data/sf0.1")
    base must be(Map("q_fast" -> 0.12, "q_slow" -> 2.0)) // sub-floor kept
    // the regression the summary could never see: 0.12 s -> 1.2 s
    Bench.crossRoundFlag(base("q_fast"), 1.2) must be(Some("regressed"))
    // while sub-floor jitter inside the absolute floors stays silent
    Bench.crossRoundFlag(base("q_fast"), 0.3) must be(None)
    Bench.crossRoundFlag(base("q_fast"), 0.43) must be(Some("shifted"))
  }

  behavior of "Bench.family / Bench.familyShifts (contamination detector)"

  it must "fold names to their prefix family, with q01..q28 as one family" in {
    Bench.family("text_langid_eval") must be("text")
    Bench.family("ann_ivfpq_recall") must be("ann")
    Bench.family("q07_window_prefix_sum") must be("q")
    Bench.family("q22_approx_distinct") must be("q")
    Bench.family("fs_cat_roundtrip") must be("fs")
    Bench.family("quality") must be("quality") // non-q\d names intact
  }

  it must "flag the r12 text-cluster shape: one family inflated, rest level" in {
    // 11 text queries at 2.6-12x while everything else holds ~1.0 —
    // the exact driver-run evidence the detector was built for
    val text = (1 to 11).map(i => s"text_q$i" -> (2.6 + i * 0.8))
    val rest = (1 to 40).map(i => s"dedup_q$i" -> 1.05) ++
      (1 to 30).map(i => s"ann_q$i" -> 0.95) ++
      (1 to 28).map(i => f"q$i%02d_rel" -> 1.1)
    Bench.familyShifts((text ++ rest).toMap) must be(Seq("text"))
  }

  it must "stay silent on a suite-wide slowdown (load, not contamination)" in {
    val all = (1 to 11).map(i => s"text_q$i" -> 2.5) ++
      (1 to 20).map(i => s"dedup_q$i" -> 2.4) ++
      (1 to 20).map(i => s"ann_q$i" -> 2.6)
    Bench.familyShifts(all.toMap) must be(empty)
  }

  it must "stay silent on single-query blips and tiny families" in {
    // one hot query inside a level family: family median stays low
    val m1 = Map("text_a" -> 9.0, "text_b" -> 1.0, "text_c" -> 1.1,
      "text_d" -> 0.9, "dedup_a" -> 1.0, "dedup_b" -> 1.1, "dedup_c" -> 1.0)
    Bench.familyShifts(m1) must be(empty)
    // two inflated queries in a 2-member family: below the >=3 floor
    // (a 2-member cluster is indistinguishable from two weather blips)
    val m2 = Map("mm_a" -> 5.0, "mm_b" -> 4.0,
      "dedup_a" -> 1.0, "dedup_b" -> 1.1, "dedup_c" -> 1.0)
    Bench.familyShifts(m2) must be(empty)
  }

  behavior of "Bench.weatherFactor (suite-level load deflation)"

  it must "estimate the r15 1.5x weather band and neutralize its flags" in {
    // the measured r15 shape: ~everything at 1.4-1.7x, no family pattern
    val ratios = (1 to 60).map(i => s"q$i" -> (1.4 + (i % 4) * 0.1)).toMap
    val w = Bench.weatherFactor(ratios)
    w must be >= 1.4
    w must be <= 1.7
    // a weather-band query deflates below every flag threshold...
    Bench.crossRoundFlag(2.0, 2.0 * 1.6 / w) must be(None)
    // ...while a genuine 4x regression under the same weather survives
    Bench.crossRoundFlag(2.0, 2.0 * 4.0 / w) must be(Some("regressed"))
  }

  it must "never inflate, never over-deflate, never act on thin data" in {
    // calm suite: medians at/below 1 clamp to exactly 1 (no inflation)
    Bench.weatherFactor((1 to 20).map(i => s"q$i" -> 0.8).toMap) must be(1.0)
    // catastrophic global shift clamps at the documented 2x band — a
    // true whole-suite regression past it still flags
    Bench.weatherFactor((1 to 20).map(i => s"q$i" -> 5.0).toMap) must be(2.0)
    Bench.crossRoundFlag(1.0, 5.0 / 2.0) must be(Some("regressed"))
    // fewer than 8 baselined queries: medians are noise, stay at 1
    Bench.weatherFactor(Map("a" -> 3.0, "b" -> 3.0)) must be(1.0)
  }

  behavior of "Bench.weatherStreak (persistent-weather escalation)"

  it must "escalate two consecutive rounds above the 1.3 band" in {
    // a genuine homogeneous regression (all ~190 queries 1.5-2x from
    // one change) IS the median, so weatherFactor deflates it into
    // silence every round — persistence is what separates it from real
    // box load, which is episodic
    Bench.weatherStreak(1.5, 1.4) must be(true)
    Bench.weatherStreak(1.31, 1.31) must be(true)
  }

  it must "stay quiet on episodic weather and calm rounds" in {
    Bench.weatherStreak(1.0, 1.6) must be(false) // first loaded round
    Bench.weatherStreak(1.6, 1.0) must be(false) // load cleared
    Bench.weatherStreak(1.3, 1.3) must be(false) // at the band edge
    Bench.weatherStreak(1.0, 1.0) must be(false)
  }

  behavior of "Bench.DrainBaseline (adaptive listener-drain target)"

  it must "adopt a lazily-registered permanent listener after two stable timeouts" in {
    // the r16 first-run pathology: baseline captured at 4, a 5th
    // permanent listener registers on the first query — without
    // adoption every rep burns the full drain timeout (~20 min/suite)
    val b = new Bench.DrainBaseline(4)
    b.observe(5) must be(None) // first timeout: evidence, not adoption
    b.observe(5).isDefined must be(true) // second at the same count
    b.baseline must be(5)
  }

  it must "never adopt a strictly-growing leak" in {
    val b = new Bench.DrainBaseline(5)
    Seq(6, 7, 8, 9).foreach(n => b.observe(n) must be(None))
    b.baseline must be(5) // the loud path stays armed
  }

  it must "self-correct a false adoption downward (the slow-drain fake)" in {
    // stream listeners deregister asynchronously over seconds: two
    // timeouts at a stable count fake the permanent signature, the
    // ratchet adopts 7 — then the listeners finally drain and the
    // observed 5 must pull the baseline straight back down (the
    // invariant: the permanent set cannot exceed ANY observed count)
    val b = new Bench.DrainBaseline(5)
    b.observe(7); b.observe(7)
    b.baseline must be(7)
    b.observe(5) must be(None)
    b.baseline must be(5)
  }

  it must "ignore failed counts and stay put on clean drains" in {
    val b = new Bench.DrainBaseline(5)
    b.observe(-1) must be(None)
    b.baseline must be(5)
    b.observe(5) must be(None)
    b.baseline must be(5)
  }

  behavior of "Bench.cpuProbe (engine-independent host-load instrument)"

  it must "do fixed work in bounded time and scale with iterations" in {
    // warm once (JIT), then: the probe must be fast enough to charge
    // per-query (< 1 s even cold) and slow enough to measure (> 1 ms)
    Bench.cpuProbe()
    val t = Bench.cpuProbe()
    t must be > 0.001
    t must be < 1.0
    // 8x the iterations takes materially longer — the loop is real
    // work, not dead-code-eliminated around the volatile sink
    val big = Bench.cpuProbe(1 << 26)
    big must be > (2 * t)
  }
}
