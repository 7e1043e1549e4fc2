package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.fs.DataPlane

/** Driver-visible data-plane queries: documents.text is treated as the
  * byte payload of files `/docs/<zero-padded id>`, chunked with a tiny
  * 64/256 subblock/block config (the sf-scaled analog of the reference's
  * FileSystemStreamSpec tiny configs), then read back through the real
  * reassembly path. The oracle reconstructs expected output straight from
  * `documents`.
  */
object DataPlaneQueries {

  private def docFiles(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d).select(
      col("doc_id"),
      concat(lit("/docs/"), lpad(col("doc_id").cast("string"), 8, "0")).as("path"),
      col("text"))

  val defs: Seq[QueryDef] = Seq(

    // ── C1-C9 + D12: chunked write → ordered read-back, byte equality ───
    QueryDef(
      "fs_cat_roundtrip",
      (s, d) => {
        val docs = docFiles(s, d)
        val chunks = DataPlane.chunk(
          docs.select(col("path"), col("text").cast("binary").as("data")), 64, 256)
        val counts = chunks.groupBy(col("path")).agg(count(lit(1)).as("n_chunks"))
        val re = DataPlane.reassemble(chunks).withColumnRenamed("data", "redata")
        docs.join(re, "path").join(counts, "path")
          .select(
            col("doc_id"),
            col("n_chunks"),
            (decode(col("redata"), "UTF-8") === col("text")).as("ok"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |       CAST(CEIL(octet_length(encode(text)) / 64.0) AS BIGINT) AS n_chunks,
             |       TRUE AS ok
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ── D18: tail — fetch only the overlapping subblocks ────────────────
    QueryDef(
      "fs_tail",
      (s, d) => {
        val docs = docFiles(s, d).filter(col("doc_id") < 20)
        val chunks = DataPlane.chunk(
          docs.select(col("path"), col("text").cast("binary").as("data")), 64, 256)
        DataPlane.tail(chunks, 100)
          .join(docs, "path")
          // hex, not decoded text: tail slices BYTES, and a byte window
          // has no char-exact VARCHAR twin once text goes multibyte —
          // hex-of-bytes compares byte-exactly for any content
          .select(col("doc_id"), hex(col("data")).as("tail_hex"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, RIGHT(hex(encode(text)), 200) AS tail_hex
             |FROM documents WHERE doc_id < 20 ORDER BY doc_id""".stripMargin)),

    // ── C5/C6: positioned read — seek + findBlock as range predicates ───
    QueryDef(
      "fs_read_at",
      (s, d) => {
        val docs = docFiles(s, d)
        val chunks = DataPlane.chunk(
          docs.select(col("path"), col("text").cast("binary").as("data")), 64, 256)
        DataPlane.readRange(chunks, start = 100L, len = 50L)
          .join(docs, "path")
          // hex for byte-exactness (see fs_tail): the seek offset is a
          // BYTE position, which SUBSTRING-on-VARCHAR only matches while
          // the corpus is pure ASCII
          .select(col("doc_id"), hex(col("data")).as("slice_hex"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, SUBSTRING(hex(encode(text)), 201, 100) AS slice_hex
             |FROM documents WHERE octet_length(encode(text)) > 100
             |ORDER BY doc_id""".stripMargin)),

    // ── D13: -text — codec-sniffing cat. Parquet text is plain, so the
    //    passthrough branch is oracle-checked here; the gzip inflate
    //    branch is spec-covered (DataPlaneSpec "text (D13)") ───────────
    QueryDef(
      "fs_text",
      (s, d) => {
        import s.implicits._
        val docs = docFiles(s, d).filter(col("doc_id") < 50)
        // a third of the corpus is gzip-compressed and a third PK-zipped
        // BEFORE chunking; the oracle compares against the original text,
        // so hash equality proves the -text codec sniff round-trips all
        // three framings (SnackFSShell.scala:154-155's "zip" formats)
        val encoded = docs
          .select(col("path"), col("doc_id"), col("text"))
          .as[(String, Long, String)]
          .mapPartitions(_.map { case (p, id, t) =>
            val raw = t.getBytes("UTF-8")
            val data: Array[Byte] =
              if (id % 3 == 0) {
                val bos = new java.io.ByteArrayOutputStream()
                val gz = new java.util.zip.GZIPOutputStream(bos)
                gz.write(raw); gz.close()
                bos.toByteArray
              } else if (id % 3 == 1) {
                val bos = new java.io.ByteArrayOutputStream()
                val zip = new java.util.zip.ZipOutputStream(bos)
                zip.putNextEntry(new java.util.zip.ZipEntry("doc"))
                zip.write(raw); zip.closeEntry(); zip.close()
                bos.toByteArray
              } else raw
            (p, data)
          })
          .toDF("path", "data")
        val chunks = DataPlane.chunk(encoded, 64, 256)
        DataPlane.text(chunks)
          .join(docs.select(col("doc_id"), col("path")), "path")
          .select(col("doc_id"), col("text"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, text FROM documents
             |WHERE doc_id < 50 ORDER BY doc_id""".stripMargin)),

    // ── B9: delete cascades from catalog to chunk rows — after rm -r of
    //    one of four subtrees, BOTH planes must agree with the oracle's
    //    survivor accounting (no orphan chunks, ThriftStore.scala:437-471)
    QueryDef(
      "fs_cascade_delete",
      (s, d) => {
        val docs = Tables.documents(s, d).select(
          concat(lit("/docs/g"), (col("doc_id") % 4).cast("string"),
            lit("/doc_"), lpad(col("doc_id").cast("string"), 8, "0")).as("path"),
          col("text"))
        val chunks = DataPlane.chunk(
          docs.select(col("path"), col("text").cast("binary").as("data")), 64, 256)
        val fs = graft.fs.GraftFs(
          graft.catalog.CatalogBuilder.fromDocuments(s, d), chunks)
        val (fs2, ok) = fs.delete("/docs/g1", recursive = true)
        require(ok, "recursive delete of existing subtree must succeed")
        val files = fs2.catalog.inodes
          .filter(!col("isDir") && col("path").startsWith("/docs/"))
          .agg(count(lit(1)).as("n_files"))
        fs2.chunkSummary("/docs/").crossJoin(files)
          .select(col("n_files"), col("n_chunks"), col("n_bytes"))
      },
      Some("""SELECT COUNT(*) AS n_files,
             |       CAST(SUM(CEIL(octet_length(encode(text)) / 64.0)) AS BIGINT) AS n_chunks,
             |       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS n_bytes
             |FROM documents WHERE doc_id % 4 <> 1""".stripMargin)),

    // ── D11: getmerge — ordered concat, checked by digest ───────────────
    QueryDef(
      "fs_getmerge",
      (s, d) => {
        val docs = docFiles(s, d).filter(col("doc_id") < 10)
        val chunks = DataPlane.chunk(
          docs.select(col("path"), col("text").cast("binary").as("data")), 64, 256)
        DataPlane.getmerge(chunks, "/docs/")
          .select(
            octet_length(col("data")).cast("long").as("n_bytes"),
            md5(col("data")).as("digest"))
      },
      Some("""SELECT CAST(SUM(octet_length(encode(text))) AS BIGINT) AS n_bytes,
             |       MD5(STRING_AGG(text, '' ORDER BY doc_id)) AS digest
             |FROM documents WHERE doc_id < 10""".stripMargin))
  )
}
