package graft.queries

import org.apache.spark.sql.functions._

/** Queries over the custom DataSourceV2 connector (graft.sources):
  * proves the V2 read path end-to-end — pushed path predicates prune
  * partitions at planning time, locality hints attach per partition —
  * while the oracle reproduces the deterministic tree with
  * generate_series.
  */
object SourceQueries {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "fs_dsv2_scan",
      (s, _) =>
        s.read.format("graft.sources.GraftFsDataSource")
          .option("dirs", 32).option("files_per_dir", 100).load()
          .filter(col("parent_path") === "/gen/dir7" && !col("is_dir"))
          .agg(count(lit(1)).as("n"), sum(col("len")).as("total_len")),
      Some("""SELECT COUNT(*) AS n,
             |       CAST(SUM((7 * 31 + j) % 1000) AS BIGINT) AS total_len
             |FROM generate_series(0, 99) t(j)""".stripMargin)),

    QueryDef(
      "fs_dsv2_deep_scan",
      (s, _) =>
        s.read.format("graft.sources.GraftFsDataSource")
          .option("dirs", 32).option("files_per_dir", 100).load()
          .filter(col("path").startsWith("/gen/dir2/"))
          .groupBy(col("parent_path"))
          .agg(count(lit(1)).as("n"), sum(col("len")).as("total_len"))
          .orderBy(col("parent_path")),
      Some("""SELECT '/gen/dir2' AS parent_path, COUNT(*) AS n,
             |       CAST(SUM((2 * 31 + j) % 1000) AS BIGINT) AS total_len
             |FROM generate_series(0, 99) t(j)""".stripMargin))
  )
}
