package graft.queries

import org.apache.spark.sql.functions._

import graft.catalog.CatalogBuilder

/** The reference's FS/shell verbs (SURVEY.md §2.1/§2.4) as driver-visible
  * queries over a catalog deterministically derived from `part`
  * (CatalogBuilder.fromPart), so DuckDB can reproduce every result from
  * the same parquet. Each query exercises the real FsCatalog machinery —
  * the oracle reconstructs only the expected OUTPUT, not the operator.
  */
object CatalogQueries {

  private val statusCols =
    """path, is_dir, CAST(len AS BIGINT) AS len,
      |CAST(block_size AS BIGINT) AS block_size,
      |'graft' AS "user", CAST(permission AS INTEGER) AS permission""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ── D1/A9: ls — shallow children via parent_path equality ───────────
    QueryDef(
      "fs_ls",
      (s, d) => CatalogBuilder.fromPart(s, d).listStatus("/pt"),
      Some(s"""SELECT '/pt/' || p_brand AS path, TRUE AS is_dir,
              |       CAST(0 AS BIGINT) AS len, CAST(0 AS BIGINT) AS block_size,
              |       'graft' AS "user", CAST(493 AS INTEGER) AS permission
              |FROM (SELECT DISTINCT p_brand FROM part) ORDER BY path""".stripMargin)),

    // ── D2: lsr — deep prefix scan (ThriftStore deep-fetch analog) ──────
    QueryDef(
      "fs_lsr",
      (s, d) => CatalogBuilder.fromPart(s, d).listStatusRecursive("/pt/Brand#13"),
      Some(s"""SELECT '/pt/Brand#13/part_' || p_partkey AS path, FALSE AS is_dir,
              |       CAST(p_size AS BIGINT) AS len, CAST(p_size AS BIGINT) AS block_size,
              |       'graft' AS "user", CAST(420 AS INTEGER) AS permission
              |FROM part WHERE p_brand = 'Brand#13' ORDER BY path""".stripMargin)),

    // ── B1/C3 persistence: save → load round-trip through the driver
    //    gate — the path-range-partitioned parquet checkpoint is the
    //    production state-transition story every mutable surface defers
    //    to, so it gets its own oracle: the RELOADED catalog must list
    //    the identical subtree the in-memory one does.
    QueryDef(
      "fs_save_load",
      (s, d) => {
        val dir = java.nio.file.Files
          .createTempDirectory("graft-save-load")
        CatalogBuilder.fromPart(s, d).save(dir.toString)
        // materialize the RELOADED listing eagerly, then remove the
        // snapshot directory — a bench run at REPS=3 must not leak
        // three parquet snapshots per invocation
        val out = graft.catalog.FsCatalog.load(s, dir.toString)
          .listStatusRecursive("/pt/Brand#13")
          .localCheckpoint(true)
        graft.PlanHygiene.deleteRecursively(dir)
        out
      },
      Some(s"""SELECT '/pt/Brand#13/part_' || p_partkey AS path, FALSE AS is_dir,
              |       CAST(p_size AS BIGINT) AS len, CAST(p_size AS BIGINT) AS block_size,
              |       'graft' AS "user", CAST(420 AS INTEGER) AS permission
              |FROM part WHERE p_brand = 'Brand#13' ORDER BY path""".stripMargin)),

    // ── LIVE MULTI-DRIVER SHARED STATE (r17, the B12+B1 composition:
    //    reference README.md:7 — every client mounts and MUTATES one
    //    keyspace): TWO SharedStateStore instances model two drivers
    //    interleaving creates, an overwrite, and a delete against one
    //    persisted namespace (each mutation a cross-process-locked,
    //    atomically-renamed wal delta); one driver then COMPACTS (fold
    //    + WRITE-NEW-THEN-FLIP), and a THIRD cold client — fresh
    //    instance, nothing in memory — reads the final namespace
    //    session-free. The oracle reproduces path/len/content from
    //    `part`; the multi-PROCESS half of the claim is proven by
    //    SharedStateStoreSpec's four forked JVMs. ─────────────────────
    QueryDef(
      "fs_shared_state",
      (s, d) => {
        val dir = java.nio.file.Files
          .createTempDirectory("graft-shared-state-ch")
        try {
          val a = new graft.fs.SharedStateStore(dir.toString, 1024, 4096)
          val b = new graft.fs.SharedStateStore(dir.toString, 1024, 4096)
          a.createKeyspace(); b.createKeyspace()
          a.storeINode(graft.catalog.FsCatalog.dirInode("/shared", "graft"))
          // bounded driver fetch (25 distinct brands — fixture prep,
          // the fs_snapshot_diff precedent)
          val brands = graft.Tables.part(s, d).select("p_brand")
            .distinct().collect().map(_.getString(0)).sorted
          brands.zipWithIndex.foreach { case (br, i) =>
            val w = if (i % 2 == 0) a else b // alternating drivers
            w.storeFileData(s"/shared/$br", br.getBytes("UTF-8"), "graft")
          }
          // driver A overwrites the min brand (doubled payload),
          // driver B deletes the max brand — both against files the
          // OTHER driver wrote
          val (mn, mx) = (brands.head, brands.last)
          a.storeFileData(s"/shared/$mn", (mn + mn).getBytes("UTF-8"),
            "graft")
          b.deleteBlocks(s"/shared/$mx"); b.deleteINode(s"/shared/$mx")
          a.compact()
          val c = new graft.fs.SharedStateStore(dir.toString, 1024, 4096)
          val rows = c.fetchSubPaths("/shared", isDeepFetch = false)
            .map { p =>
              org.apache.spark.sql.Row(p,
                c.retrieveINode(p).get.length,
                new String(c.retrieveBlock(p), "UTF-8"))
            }
          import org.apache.spark.sql.{types => T}
          s.createDataFrame(
            java.util.Arrays.asList(rows: _*),
            T.StructType(Seq(
              T.StructField("path", T.StringType),
              T.StructField("len", T.LongType),
              T.StructField("content", T.StringType))))
            .orderBy(col("path"))
        } finally {
          graft.PlanHygiene.deleteRecursively(dir)
        }
      },
      Some("""WITH b AS (SELECT DISTINCT p_brand FROM part),
             |     mn AS (SELECT MIN(p_brand) AS v FROM b),
             |     mx AS (SELECT MAX(p_brand) AS v FROM b)
             |SELECT '/shared/' || p_brand AS path,
             |       CAST(CASE WHEN p_brand = (SELECT v FROM mn)
             |            THEN 2 * length(p_brand)
             |            ELSE length(p_brand) END AS BIGINT) AS len,
             |       CASE WHEN p_brand = (SELECT v FROM mn)
             |            THEN p_brand || p_brand ELSE p_brand END AS content
             |FROM b WHERE p_brand <> (SELECT v FROM mx)
             |ORDER BY path""".stripMargin)),

    // ── Snapshot diff — the incremental-pipeline primitive: one
    //    full-outer path join between two catalog versions classifies
    //    every added / deleted / modified path with old/new lengths
    //    (unchanged paths drop in-plan, so output is change-set-sized).
    //    The mutation mix covers all three classes through supported
    //    verbs only: recursive delete, subtree rename (old paths
    //    deleted + new paths added), and a B3 store upsert growing one
    //    deterministic file. Null side-lengths coalesce to −1 for the
    //    cross-engine compare. ─────────────────────────────────────────
    QueryDef(
      "fs_snapshot_diff",
      (s, d) => {
        // materialize the base version once: v2 stacks three mutation
        // layers on v1's plan and diff() reads BOTH sides, so the
        // md5-blocked fromPart build otherwise re-derives per consumer
        // (deterministic build — values unchanged)
        val v1 = graft.catalog.FsCatalog(
          CatalogBuilder.fromPart(s, d).inodes.localCheckpoint(true))
        val (v2a, _) = v1.delete("/pt/Brand#13", recursive = true)
        val (v2b, _) = v2a.rename("/pt/Brand#23", "/pt/archived")
        // deterministic modified row: the string-min Brand#21 file
        // grows 100 bytes (one bounded driver fetch — fixture prep)
        val modPath = v2b.inodes
          .filter(col("parentPath") === "/pt/Brand#21")
          .agg(min(col("path"))).head.getString(0)
        val node = v2b.retrieve(modPath).get
        val v2 = v2b.store(node.copy(blocks =
          node.blocks.map(b => b.copy(length = b.length + 100L))))
        v1.diff(v2)
          .select(col("path"), col("change"),
            coalesce(col("old_len"), lit(-1L)).as("old_len"),
            coalesce(col("new_len"), lit(-1L)).as("new_len"))
          .orderBy(col("path"))
      },
      Some("""WITH b13 AS (
             |  SELECT '/pt/Brand#13/part_' || p_partkey AS path,
             |         CAST(p_size AS BIGINT) AS len
             |  FROM part WHERE p_brand = 'Brand#13'),
             |b23 AS (
             |  SELECT p_partkey, CAST(p_size AS BIGINT) AS len
             |  FROM part WHERE p_brand = 'Brand#23'),
             |m AS (
             |  SELECT MIN('/pt/Brand#21/part_' || p_partkey) AS path
             |  FROM part WHERE p_brand = 'Brand#21'),
             |msz AS (
             |  SELECT CAST(p_size AS BIGINT) AS len FROM part
             |  WHERE '/pt/Brand#21/part_' || p_partkey = (SELECT path FROM m))
             |SELECT path, 'deleted' AS change, len AS old_len,
             |       CAST(-1 AS BIGINT) AS new_len FROM b13
             |UNION ALL SELECT '/pt/Brand#13', 'deleted',
             |       CAST(0 AS BIGINT), CAST(-1 AS BIGINT)
             |UNION ALL SELECT '/pt/Brand#23/part_' || p_partkey, 'deleted',
             |       len, CAST(-1 AS BIGINT) FROM b23
             |UNION ALL SELECT '/pt/Brand#23', 'deleted',
             |       CAST(0 AS BIGINT), CAST(-1 AS BIGINT)
             |UNION ALL SELECT '/pt/archived/part_' || p_partkey, 'added',
             |       CAST(-1 AS BIGINT), len FROM b23
             |UNION ALL SELECT '/pt/archived', 'added',
             |       CAST(-1 AS BIGINT), CAST(0 AS BIGINT)
             |UNION ALL SELECT (SELECT path FROM m), 'modified',
             |       (SELECT len FROM msz), (SELECT len FROM msz) + 100
             |ORDER BY path""".stripMargin)),

    // ── D3: du — per-child subtree totals (nested-array HOF + groupBy) ──
    QueryDef(
      "fs_du",
      (s, d) => CatalogBuilder.fromPart(s, d).du("/pt"),
      Some("""SELECT '/pt/' || p_brand AS path, CAST(SUM(p_size) AS BIGINT) AS len
             |FROM part GROUP BY p_brand ORDER BY path""".stripMargin)),

    // ── D4: dus — single subtree summary ────────────────────────────────
    QueryDef(
      "fs_dus",
      (s, d) => CatalogBuilder.fromPart(s, d).dus("/pt"),
      Some("""SELECT '/pt' AS path, CAST(SUM(p_size) AS BIGINT) AS len FROM part""".stripMargin)),

    // ── D5: count — (dirs, files, bytes) in one multi-aggregate ─────────
    QueryDef(
      "fs_count",
      (s, d) => CatalogBuilder.fromPart(s, d).countSummary("/pt"),
      Some("""SELECT '/pt' AS path,
             |       CAST(1 + COUNT(DISTINCT p_brand) AS BIGINT) AS dir_count,
             |       COUNT(*) AS file_count,
             |       CAST(SUM(p_size) AS BIGINT) AS content_size
             |FROM part""".stripMargin)),

    // ── A5/D14: mkdirs — ancestor fold, then deep-list what appeared ────
    QueryDef(
      "fs_mkdirs",
      (s, d) => {
        val (cat, ok) = CatalogBuilder.fromPart(s, d).mkdirs("/pt/new/deep/dir")
        require(ok, "mkdirs over clean tree must succeed")
        cat.listStatusRecursive("/pt/new")
      },
      Some(s"""SELECT path, is_dir, CAST(len AS BIGINT) AS len,
              |       CAST(block_size AS BIGINT) AS block_size,
              |       'graft' AS "user", CAST(permission AS INTEGER) AS permission
              |FROM (VALUES ('/pt/new/deep', TRUE, 0, 0, 'graft', 493),
              |             ('/pt/new/deep/dir', TRUE, 0, 0, 'graft', 493))
              |     t(path, is_dir, len, block_size, "user", permission)
              |ORDER BY path""".stripMargin)),

    // ── A8/D6: rename — subtree prefix rewrite, then list the new home ──
    QueryDef(
      "fs_rename",
      (s, d) => {
        val (cat, ok) = CatalogBuilder.fromPart(s, d).rename("/pt/Brand#13", "/pt/archived")
        require(ok, "rename with satisfied preconditions must succeed")
        cat.listStatusRecursive("/pt/archived")
      },
      Some(s"""SELECT '/pt/archived/part_' || p_partkey AS path, FALSE AS is_dir,
              |       CAST(p_size AS BIGINT) AS len, CAST(p_size AS BIGINT) AS block_size,
              |       'graft' AS "user", CAST(420 AS INTEGER) AS permission
              |FROM part WHERE p_brand = 'Brand#13' ORDER BY path""".stripMargin)),

    // ── A7/D8: recursive delete — anti-join, then summarize survivors ───
    QueryDef(
      "fs_delete",
      (s, d) => {
        val (cat, ok) = CatalogBuilder.fromPart(s, d).delete("/pt/Brand#13", recursive = true)
        require(ok, "recursive delete of existing dir must succeed")
        cat.countSummary("/pt")
      },
      Some("""SELECT '/pt' AS path,
             |       CAST(1 + COUNT(DISTINCT p_brand) AS BIGINT) AS dir_count,
             |       COUNT(*) AS file_count,
             |       CAST(SUM(p_size) AS BIGINT) AS content_size
             |FROM part WHERE p_brand <> 'Brand#13'""".stripMargin)),

    // ── A6/D17: getFileStatus/stat — nested-array length fold ───────────
    QueryDef(
      "fs_stat",
      (s, d) => {
        val cat = CatalogBuilder.fromPart(s, d)
        // probe key via a broadcast 1-row join — fully declarative, no
        // driver-side collect (the lookup composes into one plan)
        val probe = graft.Tables.part(s, d)
          .filter(col("p_brand") === "Brand#13")
          .agg(min(col("p_partkey")).as("k"))
          .select(concat(lit("/pt/Brand#13/part_"), col("k")).as("probe_path"))
        graft.catalog.FsCatalog.statusOf(cat.inodes)
          .join(broadcast(probe), col("path") === col("probe_path"))
          .drop("probe_path")
      },
      Some(s"""SELECT '/pt/Brand#13/part_' || p_partkey AS path, FALSE AS is_dir,
              |       CAST(p_size AS BIGINT) AS len, CAST(p_size AS BIGINT) AS block_size,
              |       'graft' AS "user", CAST(420 AS INTEGER) AS permission
              |FROM part
              |WHERE p_brand = 'Brand#13'
              |  AND p_partkey = (SELECT MIN(p_partkey) FROM part WHERE p_brand = 'Brand#13')""".stripMargin)),

    // ── D7: cp — subtree duplicate, then summarize the grown tree ───────
    QueryDef(
      "fs_cp",
      (s, d) => {
        val (cat, ok) = CatalogBuilder.fromPart(s, d).copy("/pt/Brand#13", "/pt/copy13")
        require(ok, "cp with satisfied preconditions must succeed")
        cat.countSummary("/pt")
      },
      Some("""SELECT '/pt' AS path,
             |       CAST(2 + COUNT(DISTINCT p_brand) AS BIGINT) AS dir_count,
             |       COUNT(*) + (SELECT COUNT(*) FROM part WHERE p_brand = 'Brand#13') AS file_count,
             |       CAST(SUM(p_size) + (SELECT SUM(p_size) FROM part WHERE p_brand = 'Brand#13') AS BIGINT) AS content_size
             |FROM part""".stripMargin)),

    // ── A10/B11: block locations — deterministic block→endpoint mapping
    //    (the Cassandra token-ring placement, ThriftStore.scala:543-605,
    //    as a pure hash function; exercises nested-blocks explode) ──────
    QueryDef(
      "fs_block_locations",
      (s, d) =>
        // start=25 exercises the range prune: fromPart files are single
        // blocks at offset 0 with length p_size, so blocks ending before
        // byte 25 (p_size < 25) must vanish (SnackFS.scala:138)
        CatalogBuilder.fromPart(s, d)
          .blockLocations("/pt/Brand#13/", start = 25L),
      Some(s"""SELECT '/pt/Brand#13/part_' || p_partkey AS path,
              |       md5('/pt/Brand#13/part_' || p_partkey) AS block_id,
              |       CAST(0 AS BIGINT) AS "offset",
              |       CAST(p_size AS BIGINT) AS length,
              |       'node-' || CAST(o % 3 AS VARCHAR) ||
              |       ',node-' || CAST((o + 1) % 3 AS VARCHAR) ||
              |       ',node-' || CAST((o + 2) % 3 AS VARCHAR) AS replicas
              |FROM (SELECT p_partkey, p_size,
              |             ascii(SUBSTRING(md5('/pt/Brand#13/part_' || p_partkey), 1, 1)) AS o
              |      FROM part WHERE p_brand = 'Brand#13' AND p_size >= 25)
              |ORDER BY path""".stripMargin)),

    // ── D1 glob: ls over patterns — matched dirs expand to children,
    //    matched files list themselves (SnackFSShell.scala:269-296 via
    //    globStatus). One pattern exercises the class+dir-expansion
    //    branch, one the star+file-match branch. ──────────────────────
    QueryDef(
      "fs_glob",
      (s, d) => {
        val cat = CatalogBuilder.fromPart(s, d)
        cat.listGlob("/pt/Brand#1[34]")
          .unionByName(cat.listGlob("/pt/Brand#2*/part_*7"))
          .orderBy(col("path"))
      },
      Some(s"""SELECT '/pt/' || p_brand || '/part_' || p_partkey AS path,
              |       FALSE AS is_dir, CAST(p_size AS BIGINT) AS len,
              |       CAST(p_size AS BIGINT) AS block_size,
              |       'graft' AS "user", CAST(420 AS INTEGER) AS permission
              |FROM part WHERE p_brand IN ('Brand#13', 'Brand#14')
              |UNION ALL
              |SELECT '/pt/' || p_brand || '/part_' || p_partkey AS path,
              |       FALSE AS is_dir, CAST(p_size AS BIGINT) AS len,
              |       CAST(p_size AS BIGINT) AS block_size,
              |       'graft' AS "user", CAST(420 AS INTEGER) AS permission
              |FROM part WHERE p_brand LIKE 'Brand#2%'
              |  AND CAST(p_partkey AS VARCHAR) LIKE '%7'
              |ORDER BY path""".stripMargin)),

    // ── D15/D16: touchz + test — zero-length file lifecycle ─────────────
    QueryDef(
      "fs_touchz",
      (s, d) => {
        val cat = CatalogBuilder.fromPart(s, d).touchz("/pt/zero.txt")
        require(cat.testE("/pt/zero.txt") && cat.testZ("/pt/zero.txt") &&
          !cat.testD("/pt/zero.txt"), "touchz must yield a zero-length file")
        cat.getFileStatus("/pt/zero.txt")
      },
      Some(s"""SELECT '/pt/zero.txt' AS path, FALSE AS is_dir,
              |       CAST(0 AS BIGINT) AS len, CAST(0 AS BIGINT) AS block_size,
              |       'graft' AS "user", CAST(420 AS INTEGER) AS permission""".stripMargin))
  )
}
