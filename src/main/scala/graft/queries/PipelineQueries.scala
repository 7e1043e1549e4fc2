package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}

/** LLM-training-data pipeline operators as driver queries. Oracles where
  * ANSI-SQL-expressible; murmur3/xxhash64-based ops (MinHash-LSH,
  * SimHash) and the stub decode are oracle-exempt (rows-only check) but
  * fully deterministic.
  */
object PipelineQueries {

  val defs: Seq[QueryDef] = Seq(

    // ── Text analysis ───────────────────────────────────────────────────
    QueryDef(
      "text_tokens",
      (s, d) => TextAnalysis.tokenStats(Tables.documents(s, d)).orderBy(col("doc_id")),
      Some("""SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars,
             |       CAST(LEN(regexp_extract_all(lower(text), '\w+')) AS BIGINT) AS n_words,
             |       CAST(LEN(list_distinct(regexp_extract_all(lower(text), '\w+'))) AS BIGINT) AS n_distinct_words,
             |       CAST(LEN(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct
             |FROM documents ORDER BY doc_id""".stripMargin)),

    QueryDef(
      "text_quality",
      (s, d) => TextAnalysis.quality(Tables.documents(s, d)).orderBy(col("doc_id")),
      Some("""WITH t AS (
             |  SELECT doc_id, LENGTH(text) AS n_chars,
             |         regexp_extract_all(lower(text), '\w+') AS toks,
             |         LEN(regexp_extract_all(text, '[.,!?;:]')) AS n_punct
             |  FROM documents)
             |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
             |       CAST(LEN(toks) AS BIGINT) AS n_words,
             |       ROUND(CAST(list_sum(list_transform(toks, w -> LENGTH(w))) AS DOUBLE) / LEN(toks), 4) AS avg_word_len,
             |       ROUND(CAST(n_punct AS DOUBLE) / n_chars, 6) AS punct_ratio,
             |       ROUND(CAST(LEN(list_filter(toks, w -> w IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE) / LEN(toks), 6) AS stopword_ratio,
             |       (LEN(toks) >= 5 AND CAST(n_punct AS DOUBLE) / n_chars < 0.1) AS quality_ok
             |FROM t ORDER BY doc_id""".stripMargin)),

    QueryDef(
      "text_langid",
      (s, d) => TextAnalysis.langId(Tables.documents(s, d)).orderBy(col("doc_id")),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         LEN(list_filter(regexp_extract_all(lower(text), '\w+'), w -> w IN ('the','and','of','to','a'))) AS s_en,
             |         LEN(list_filter(regexp_extract_all(lower(text), '\w+'), w -> w IN ('el','los','que','y','es'))) AS s_es,
             |         LEN(list_filter(regexp_extract_all(lower(text), '\w+'), w -> w IN ('der','die','und','das','ist'))) AS s_de,
             |         LEN(list_filter(regexp_extract_all(lower(text), '\w+'), w -> w IN ('le','les','et','des','une'))) AS s_fr
             |  FROM documents)
             |SELECT doc_id,
             |       CASE WHEN s_en >= GREATEST(s_es, s_de, s_fr) THEN 'en'
             |            WHEN s_es >= GREATEST(s_de, s_fr) THEN 'es'
             |            WHEN s_de >= s_fr THEN 'de'
             |            ELSE 'fr' END AS lang_guess,
             |       CAST(s_en + s_es + s_de + s_fr AS BIGINT) AS n_votes
             |FROM t ORDER BY doc_id""".stripMargin)),

    QueryDef(
      "text_fingerprint",
      (s, d) => TextAnalysis.fingerprint(Tables.documents(s, d)).orderBy(col("doc_id")),
      Some("""SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp,
             |       sha256(text) AS sha
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ── Deduplication ───────────────────────────────────────────────────
    QueryDef(
      "dedup_exact",
      (s, d) => Dedup.exactStats(Tables.documents(s, d)),
      Some("""SELECT COUNT(*) AS n_docs, COUNT(DISTINCT sha256(text)) AS n_unique
             |FROM documents""".stripMargin)),

    QueryDef(
      "dedup_keep_first",
      (s, d) => Dedup.keepFirst(Tables.documents(s, d)).orderBy(col("sha")),
      Some("""SELECT sha256(text) AS sha, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
             |FROM documents GROUP BY 1 ORDER BY sha""".stripMargin)),

    // MinHash-LSH: murmur3/xxhash64-based — oracle-exempt, deterministic.
    QueryDef(
      "dedup_minhash",
      (s, d) =>
        Dedup.minhashPairs(Tables.documents(s, d), shingleN = 3, b = 8, r = 4,
            threshold = 0.0)
          .agg(
            count(lit(1)).as("n_candidate_pairs"),
            sum(when(col("jaccard") >= 0.5, 1L).otherwise(0L)).as("n_verified_pairs"),
            coalesce(round(avg(col("jaccard")), 4), lit(0.0)).as("avg_candidate_jaccard")),
      None),

    QueryDef(
      "dedup_simhash",
      (s, d) =>
        Dedup.simhash(Tables.documents(s, d).filter(col("doc_id") < 50))
          .orderBy(col("doc_id")),
      None),

    // ── Similarity search ───────────────────────────────────────────────
    QueryDef(
      "ann_brute_topk",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.bruteTopK(emb.filter(col("vec_id") < 5), emb, k = 5)
          .select(col("q_id"), col("neighbor_id"), col("rank"))
          .orderBy(col("q_id"), col("rank"))
      },
      Some("""WITH scores AS (
             |  SELECT q.vec_id AS q_id, e.vec_id AS neighbor_id,
             |         list_cosine_similarity(q.embedding, e.embedding) AS score
             |  FROM embeddings e, embeddings q
             |  WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id)
             |SELECT q_id, neighbor_id, CAST(rank AS INTEGER) AS rank FROM (
             |  SELECT q_id, neighbor_id,
             |         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, neighbor_id) AS rank
             |  FROM scores)
             |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    // IVF scale path: probed-bucket search — oracle-exempt (bucket
    // assignment depends on our centroid choice), deterministic.
    QueryDef(
      "ann_ivf_topk",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.ivfTopK(emb.filter(col("vec_id") < 5), emb,
            numCentroids = 16, nprobe = 4, k = 5)
          .select(col("q_id"), col("neighbor_id"), col("rank"))
          .orderBy(col("q_id"), col("rank"))
      },
      None),

    // Embedding-cosine near-dup: IVF-bucketed candidate pairs — oracle-
    // exempt (bucket assignment is ours), deterministic summary row.
    QueryDef(
      "dedup_embedding",
      (s, d) =>
        graft.ops.Similarity.embeddingNearDups(
            Tables.embeddings(s, d), numCentroids = 16, threshold = 0.2)
          .agg(
            count(lit(1)).as("n_near_dup_pairs"),
            coalesce(round(max(col("score")), 4), lit(0.0)).as("max_score")),
      None),

    // BPE-ish token counting (whitespace + subword-boundary regex), both
    // reproducible in RE2 and Java regex (ASCII classes only).
    QueryDef(
      "text_bpe_tokens",
      (s, d) => {
        val pat = "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+"
        Tables.documents(s, d).select(
          col("doc_id"),
          expr("size(regexp_extract_all(text, '\\\\S+', 0))").cast("long").as("n_ws_tokens"),
          size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long").as("n_bpe_tokens"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |       CAST(LEN(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_ws_tokens,
             |       CAST(LEN(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+')) AS BIGINT) AS n_bpe_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ── Multimodal binary columns ───────────────────────────────────────
    QueryDef(
      "mm_sniff",
      (s, d) =>
        Multimodal.sniff(
          Tables.documents(s, d).select(
            concat(lit("/mm/"), col("doc_id")).as("path"),
            col("text").cast("binary").as("data")))
          .orderBy(col("path")),
      Some("""SELECT '/mm/' || doc_id AS path,
             |       CAST(LENGTH(text) AS BIGINT) AS n_bytes,
             |       hex(encode(SUBSTRING(text, 1, 4))) AS magic
             |FROM documents ORDER BY path""".stripMargin)),

    // Stub decode (deterministic fake) — real mapPartitions plumbing.
    QueryDef(
      "mm_decode_meta",
      (s, d) =>
        Multimodal.decodeMeta(
          Tables.documents(s, d).filter(col("doc_id") < 100).select(
            concat(lit("/mm/"), col("doc_id")).as("path"),
            col("text").cast("binary").as("data")))
          .orderBy(col("path")),
      None)
  )
}
