package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.catalog.CatalogBuilder

/** Queries over the custom DataSourceV2 connector (graft.sources):
  * proves the full mount story end-to-end — build a real FsCatalog from
  * `part`, `save` it as the path-range-partitioned snapshot, mount the
  * snapshot with `spark.read.format(...)`, and answer queries whose
  * pushed path predicates prune snapshot FILES at planning time (parquet
  * footer min/max stats) while locality hints attach per file. The
  * oracle reproduces the expected answers from the same `part` parquet
  * the catalog was derived from.
  */
object SourceQueries {

  /** Save the part-derived catalog to a temp snapshot, mount it through
    * the V2 connector, run `q`, materialize eagerly, delete the snapshot
    * (a bench run at REPS=3 must not leak snapshots per invocation).
    */
  private def withSnapshot(s: org.apache.spark.sql.SparkSession, d: String)(
      q: DataFrame => DataFrame): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft-dsv2")
    // delete in a finally: a failure anywhere (build, save, mount, the
    // eager checkpoint) must not strand a multi-file snapshot per rep
    try {
      CatalogBuilder.fromPart(s, d).save(dir.toString)
      val mounted = s.read.format("graft.sources.GraftFsDataSource")
        .load(dir.toString)
      q(mounted).localCheckpoint(true)
    } finally {
      val w = java.nio.file.Files.walk(dir)
      try w.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally w.close()
    }
  }

  val defs: Seq[QueryDef] = Seq(

    // ── point lookup: parent_path equality prunes to the one snapshot
    //    file whose [min,max] path range covers /pt/Brand#13/ ───────────
    QueryDef(
      "fs_dsv2_scan",
      (s, d) => withSnapshot(s, d) { mounted =>
        mounted
          .filter(col("parent_path") === "/pt/Brand#13" && !col("is_dir"))
          .agg(count(lit(1)).as("n"), sum(col("len")).as("total_len"))
      },
      Some("""SELECT COUNT(*) AS n, CAST(SUM(p_size) AS BIGINT) AS total_len
             |FROM part WHERE p_brand = 'Brand#13'""".stripMargin)),

    // ── subtree scan: path prefix covers the five Brand#2x directories;
    //    files outside the range are never planned ──────────────────────
    QueryDef(
      "fs_dsv2_deep_scan",
      (s, d) => withSnapshot(s, d) { mounted =>
        mounted
          .filter(col("path").startsWith("/pt/Brand#2") && !col("is_dir"))
          .groupBy(col("parent_path"))
          .agg(count(lit(1)).as("n"), sum(col("len")).as("total_len"))
          .orderBy(col("parent_path"))
      },
      Some("""SELECT '/pt/' || p_brand AS parent_path, COUNT(*) AS n,
             |       CAST(SUM(p_size) AS BIGINT) AS total_len
             |FROM part WHERE p_brand LIKE 'Brand#2%'
             |GROUP BY p_brand ORDER BY parent_path""".stripMargin))
  )
}
