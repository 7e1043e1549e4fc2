package graft

import org.apache.spark.sql.functions._

import graft.ops.{Curation, Decontaminate, Dedup, TextAnalysis}

/** Runnable end-to-end curation pipeline — the composition a real
  * training-data run executes, each stage one of the library's
  * oracle-checked operators:
  *
  *   raw → quality filter → exact dedup (keep-first) → near-dup removal
  *   (MinHash-LSH keep-first) → benchmark decontamination → sequence
  *   packing plan → JSONL export round-trip
  *
  *   sbt "runMain graft.PipelineDemo [sfDir]"
  *
  * Prints one funnel row per stage (rows surviving). Every stage is
  * deterministic, so reruns print identical numbers — the property the
  * per-operator driver queries hash-check individually.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.getOrCreate("graft-pipeline-demo",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir)
    val raw = docs.count()

    // persist each funnel stage before counting: every stage feeds both
    // its own count AND the next stage (and `clean` feeds three
    // consumers) — uncached, the MinHash banding alone would re-run 4+
    // times at larger SFs
    val quality = TextAnalysis.quality(docs).filter(col("quality_ok"))
      .select(col("doc_id"))
    val afterQuality = docs.join(quality, Seq("doc_id"), "left_semi").persist()

    val exactSurvivors = Dedup.keepFirst(afterQuality)
      .select(col("doc_id"))
    val afterExact = afterQuality.join(exactSurvivors, Seq("doc_id"), "left_semi")
      .persist()

    val nearDupDrops = Dedup.minhashPairs(afterExact, shingleN = 3,
        b = 8, r = 4, threshold = 0.5)
      .select(col("id_b").as("doc_id")).distinct()
    val afterNear = afterExact.join(nearDupDrops, Seq("doc_id"), "left_anti")
      .persist()

    // benchmark docs leave the TRAINING pool entirely (the split must be
    // disjoint — a bench doc fed to the train side would flag itself as
    // contaminated and read as leakage); survivors are then scrubbed of
    // anything sharing >= 3 shingles with the bench set
    val bench = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("text"))
    val trainPool = afterNear.filter(col("doc_id") % 10 =!= 0)
    val contaminated = Decontaminate.flagged(
        trainPool.select(col("doc_id"), col("text")),
        bench, n = 3, minShared = 3, maxBenchDf = Int.MaxValue)
      .select(col("doc_id")).distinct()
    val clean = trainPool.join(contaminated, Seq("doc_id"), "left_anti").persist()

    val packed = Curation.packSequences(clean, col("lang"),
      tokenBudget = 4096, orderKey = col("doc_id"))
    val nPacks = packed.select(col("lang"), col("pack_id")).distinct().count()

    val exportDir = java.nio.file.Files.createTempDirectory("graft-demo-jsonl")
    clean.select(col("doc_id"), col("lang"), col("text"))
      .write.mode("overwrite").json(exportDir.toString)
    val exported = spark.read
      .schema("doc_id LONG, lang STRING, text STRING")
      .json(exportDir.toString).count()
    graft.PlanHygiene.deleteRecursively(exportDir)

    println(f"""
      |stage                 rows
      |--------------------  ----
      |raw documents         $raw%5d
      |quality-filtered      ${afterQuality.count()}%5d
      |exact-deduped         ${afterExact.count()}%5d
      |near-dup removed      ${afterNear.count()}%5d
      |bench docs withheld   ${trainPool.count()}%5d
      |decontaminated        ${clean.count()}%5d
      |training packs        $nPacks%5d
      |exported (JSONL)      $exported%5d
      |""".stripMargin)
    spark.stop()
  }
}
