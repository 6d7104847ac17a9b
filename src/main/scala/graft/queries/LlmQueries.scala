package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.llm.{Dedup, Multimodal, Similarity, TextAnalysis}

/** LLM-training-data pipeline queries over the documents/embeddings
  * tables: text analysis, dedup (exact / MinHash / SimHash / n-gram
  * Jaccard), similarity search (brute-force + LSH), multimodal plumbing.
  *
  * Oracle policy: operators whose semantics are engine-portable (string
  * arithmetic, md5, counts) carry exact DuckDB SQL twins. Hash-family
  * operators (xxhash64-based MinHash/SimHash signatures) and float-
  * ranking operators are not portable SQL — they get rows-only checks
  * here and differential ScalaTests (approx vs exact on planted
  * duplicates) in LlmSpec. */
object LlmQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Per-document stats: counts/ratios via engine-portable string math. */
  val textStats: Q = (s, dir) => {
    val d = Tables(s, dir, "documents")
    d.select(
      col("doc_id"),
      length(col("text")).as("n_chars_text"),
      TextAnalysis.tokenCountWs(col("text")).as("n_tokens"),
      TextAnalysis.substrCount(col("text"), " ").as("n_spaces"),
      TextAnalysis.substrCount(concat(lit(" "), lower(col("text")), lit(" ")), " the ").as("n_the"),
      round(TextAnalysis.stopwordRatio(col("text")), 6).as("stopword_ratio"))
      .orderBy("doc_id")
  }

  /** Per-language corpus report — the summary a pipeline emits after
    * ingest: doc counts, token totals, exact token-count percentiles.
    * All exact arithmetic (integer sums, double division of exact ints,
    * Spark's exact `percentile` == DuckDB's `quantile_cont` linear
    * interpolation) ⇒ hash-verified oracle. */
  val corpusStats: Q = (s, dir) => {
    val d = Tables(s, dir, "documents")
      .withColumn("n_tokens", TextAnalysis.tokenCountWs(col("text")))
    d.groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("total_tokens"),
        (sum(col("n_tokens").cast("long")).cast("double") / count(lit(1))).as("mean_tokens"),
        expr("percentile(n_tokens, 0.5)").as("p50_tokens"),
        expr("percentile(n_tokens, 0.95)").as("p95_tokens"))
      .orderBy("lang")
  }

  /** Vocabulary heavy hitters: top-50 normalized tokens by frequency —
    * the vocab-stats pass of a tokenizer pipeline. Partial (map-side)
    * aggregation handles the explode fan-out before the single shuffle;
    * ties broken deterministically by token. */
  val topTokens: Q = (s, dir) =>
    Tables(s, dir, "documents")
      .select(explode(split(TextAnalysis.normalizeText(col("text")), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("token")).limit(50)

  /** Quality scoring (length/punct/token-shape heuristic). */
  val qualityScore: Q = (s, dir) =>
    Tables(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  /** Language-ID heuristic (marker-word argmax — deterministic function
    * of the text; the synthetic `lang` label is not text-derivable). */
  val langId: Q = (s, dir) =>
    Tables(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.langIdHeuristic(col("text")).as("lang_guess"))
      .orderBy("doc_id")

  /** Content fingerprints: md5 (dedup key). */
  val docFingerprint: Q = (s, dir) =>
    Tables(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.fingerprintMd5(col("text")).as("fp_md5"))
      .orderBy("doc_id")

  /** Exact dedup via content hash — at scale the shuffle carries only
    * (hash, id), never the text. */
  val dedupExact: Q = (s, dir) =>
    Dedup.exactDedup(Tables(s, dir, "documents"), "doc_id", "text")
      .orderBy("keep_id")
      .select("keep_id", "content_hash", "dup_count")

  /** MinHash+LSH near-dup candidate pairs (est. Jaccard >= 0.3). Hash
    * family ⇒ rows-only check; recall/precision pinned in LlmSpec on
    * planted duplicates. */
  val dedupMinhash: Q = (s, dir) =>
    Dedup.minHashPairs(Tables(s, dir, "documents"), "doc_id", "text", threshold = 0.3)
      .orderBy("id_a", "id_b")

  /** SimHash near-dup pairs (hamming <= 6 on 64-bit signatures — at 12
    * the synthetic corpus's unrelated word-soup docs start colliding). */
  val dedupSimhash: Q = (s, dir) =>
    Dedup.simHashPairs(Tables(s, dir, "documents"), "doc_id", "text", maxHamming = 6)
      .orderBy("id_a", "id_b")

  /** Exact n-gram Jaccard verification of the MinHash candidates. */
  val ngramJaccardPairs: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
    Dedup.verifyJaccard(
        Dedup.minHashPairs(docs, "doc_id", "text", threshold = 0.3), docs, "doc_id", "text")
      .orderBy("id_a", "id_b")
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact cosine top-5 for the first 10 embedding vectors (brute force
    * — the baseline the LSH path is measured against). Float ranking ⇒
    * rows-only check + differential ScalaTest. */
  val annBruteforce: Q = (s, dir) => {
    val e = Tables(s, dir, "embeddings")
    Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
      .orderBy("query_id", "rank")
      .select("query_id", "corpus_id", "rank")
  }

  /** LSH-bucketed approximate top-5 for the same queries. */
  val annLsh: Q = (s, dir) => {
    val e = Tables(s, dir, "embeddings")
    Similarity.lshTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
      .orderBy("query_id", "rank")
      .select("query_id", "corpus_id", "rank")
  }

  /** IVF-bucketed approximate top-5 (coarse quantizer + inverted lists). */
  val annIvf: Q = (s, dir) => {
    val e = Tables(s, dir, "embeddings")
    Similarity.ivfTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
      .orderBy("query_id", "rank")
      .select("query_id", "corpus_id", "rank")
  }

  /** Embedding-cosine near-dup pairs (LSH candidates + exact verify).
    * Threshold 0.4 — the synthetic embeddings are near-orthogonal (max
    * pairwise cosine ≈ 0.51), so 0.4 surfaces the genuine nearest pairs;
    * a production dedup would use ≥0.9. Float compare ⇒ rows-only. */
  val dedupEmbedding: Q = (s, dir) => {
    val e = Tables(s, dir, "embeddings")
    Similarity.cosineNearDupPairs(e, "vec_id", "embedding", threshold = 0.4)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
      .orderBy("id_a", "id_b")
  }

  /** Multimodal plumbing: documents' text bytes as a fake media payload
    * (schema/partitioning/feature-extraction path is real; the codec is
    * a deterministic stub). */
  val mediaFeatures: Q = (s, dir) => {
    val d = Tables(s, dir, "documents")
    val media = d.select(
      col("doc_id"),
      Multimodal.mediaStruct(
        to_binary(col("text"), lit("utf-8")), lit("application/octet-stream"),
        lit(0), lit(0), lit(1)).as("media"))
    val feats = Multimodal.extractFeatures(media, "doc_id", "media", dims = 4)
    feats
      .select(col("doc_id"),
        round(element_at(col("features"), 1), 4).as("f0"),
        round(element_at(col("features"), 2), 4).as("f1"))
      .orderBy("doc_id")
  }

  /** The composed ingest pipeline end-to-end in ONE query — what a
    * training-data run actually executes: quality-filter the corpus,
    * exact-dedup survivors (keep min doc_id per content hash), then
    * normalize + chunk the keepers. Three operator families verified
    * as a composition by one oracle; every stage is a narrow map or a
    * single hash-partitioned window — no extra shuffles from composing. */
  val pipelineCleanCorpus: Q = (s, dir) => {
    val d = Tables(s, dir, "documents")
    val scored = d.select(col("doc_id"), col("text"), TextAnalysis.qualityScore(col("text")).as("q"))
      .filter(col("q") >= 0.5)
    val keep = scored
      .withColumn("h", TextAnalysis.fingerprintMd5(col("text")))
      .withColumn("rk", row_number().over(Window.partitionBy(col("h")).orderBy(col("doc_id"))))
      .filter(col("rk") === 1)
    keep.select(col("doc_id"),
        posexplode(TextAnalysis.chunkWords(TextAnalysis.normalizeText(col("text")), 64, 8)))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk")
      .orderBy("doc_id", "chunk_idx")
  }

  /** Normalized text + 128-word chunks with 16-word overlap: the
    * context-window prep step, exploded to one row per chunk. */
  val docChunks: Q = (s, dir) => {
    val d = Tables(s, dir, "documents")
    d.select(col("doc_id"),
        posexplode(TextAnalysis.chunkWords(TextAnalysis.normalizeText(col("text")), 64, 8)))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk")
      .orderBy("doc_id", "chunk_idx")
  }

  /** Connected components through the iterative min-label-propagation
    * operator — the transitive-closure step of dedup (pairs → clusters).
    * The edge set here is deterministic and engine-portable (consecutive
    * doc_ids sharing a lang label), producing genuine multi-hop chains
    * (runs of length k ⇒ diameter k−1 ⇒ multiple propagation rounds), so
    * the ORACLE verifies real convergence, via gaps-and-islands SQL. */
  val dedupComponents: Q = (s, dir) => {
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("lang"))
    val e = d.as("a").join(d.as("b"),
        col("a.doc_id") + 1 === col("b.doc_id") && col("a.lang") === col("b.lang"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    Dedup.dedupGroups(d, "doc_id", e).orderBy("doc_id")
  }

  /** The production dedup flow end-to-end: MinHash+LSH near-dup pairs →
    * connected components → cluster representative per doc. Hash family
    * ⇒ rows-only check (clusters pinned by LlmSpec on planted dups). */
  val dedupGroupsMinhash: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
    Dedup.dedupGroups(docs, "doc_id",
        Dedup.minHashPairs(docs, "doc_id", "text", threshold = 0.3))
      .orderBy("doc_id")
  }

  /** LSH bucket-size histogram — the audit view for minHashPairs'
    * hot-bucket cap (buckets above maxBucket are dropped, never
    * silently): how many buckets hold n members, driver-visible. Bucket
    * keys are xxhash64-derived (not engine-portable) ⇒ rows-only check;
    * the planted-duplicate recall behind it is pinned in LlmSpec. */
  val lshBucketHistogram: Q = (s, dir) =>
    Dedup.lshBuckets(Tables(s, dir, "documents"), "doc_id", "text")
      .groupBy(col("n").as("bucket_size")).agg(count(lit(1)).as("n_buckets"))
      .select("bucket_size", "n_buckets")
      .orderBy("bucket_size")

  /** Frame sampling through the real binary path
    * ([[Multimodal.sampleFrames]]): every 4th 64-byte chunk of the
    * payload becomes a frame row, fingerprinted with md5. The DuckDB
    * oracle replays the slicing over VARCHAR (no blob substring in
    * DuckDB 1.0) — byte-identical because the corpus is pure ASCII
    * (validated at sf0.001/0.01/0.1: zero non-ASCII chars). */
  val mediaFrames: Q = (s, dir) => {
    val d = Tables(s, dir, "documents")
    val media = d.select(col("doc_id"),
      Multimodal.mediaStruct(
        to_binary(col("text"), lit("utf-8")), lit("application/octet-stream"),
        lit(0), lit(0), lit(1)).as("media"))
    Multimodal.sampleFrames(media, "doc_id", "media", frameBytes = 64, stride = 4)
      .select(col("doc_id"), col("frame_idx"), md5(col("frame")).as("frame_md5"))
      .orderBy("doc_id", "frame_idx")
  }

  /** Byte-level media stats (no decode): engine-portable ⇒ oracle. */
  val mediaStats: Q = (s, dir) => {
    val d = Tables(s, dir, "documents")
    d.select(
      col("doc_id"),
      octet_length(to_binary(col("text"), lit("utf-8"))).as("n_bytes"),
      md5(to_binary(col("text"), lit("utf-8"))).as("payload_md5"))
      .orderBy("doc_id")
  }

  val defs: Map[String, Q] = Map(
    "text_stats" -> textStats,
    "corpus_stats" -> corpusStats,
    "top_tokens" -> topTokens,
    "quality_score" -> qualityScore,
    "lang_id" -> langId,
    "doc_fingerprint" -> docFingerprint,
    "dedup_exact" -> dedupExact,
    "dedup_minhash" -> dedupMinhash,
    "dedup_simhash" -> dedupSimhash,
    "ngram_jaccard_pairs" -> ngramJaccardPairs,
    "ann_bruteforce" -> annBruteforce,
    "ann_lsh" -> annLsh,
    "ann_ivf" -> annIvf,
    "dedup_embedding" -> dedupEmbedding,
    "lsh_bucket_histogram" -> lshBucketHistogram,
    "dedup_components" -> dedupComponents,
    "dedup_groups_minhash" -> dedupGroupsMinhash,
    "doc_chunks" -> docChunks,
    "pipeline_clean_corpus" -> pipelineCleanCorpus,
    "media_features" -> mediaFeatures,
    "media_frames" -> mediaFrames,
    "media_stats" -> mediaStats
  )

  val oracles: Map[String, String] = Map(
    // Exact top-k ranking IS oracle-able: cosines of the random corpus
    // are well-separated, and both engines' double math agrees on the
    // ordering (validated at sf0.01 and sf0.1). ann_lsh stays rows-only
    // (xxhash64-derived hyperplanes are not portable; recall-gated in
    // LlmSpec); ann_ivf's md5-based centroid rule IS portable, so the
    // whole approximate pipeline is replayed as SQL below.
    "ann_ivf" ->
      """WITH cents AS (
        |  SELECT vec_id AS cid, embedding AS cvec FROM embeddings
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
        |corpus_assign AS (
        |  SELECT corpus_id, cell FROM (
        |    SELECT e.vec_id AS corpus_id, c.cid AS cell,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_cosine_similarity(e.embedding, c.cvec) DESC, c.cid) AS rk
        |    FROM embeddings e, cents c) WHERE rk <= 1),
        |query_assign AS (
        |  SELECT query_id, cell FROM (
        |    SELECT e.vec_id AS query_id, c.cid AS cell,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_cosine_similarity(e.embedding, c.cvec) DESC, c.cid) AS rk
        |    FROM embeddings e, cents c WHERE e.vec_id < 10) WHERE rk <= 4),
        |cands AS (
        |  SELECT DISTINCT q.query_id, ca.corpus_id
        |  FROM query_assign q JOIN corpus_assign ca ON q.cell = ca.cell
        |  WHERE ca.corpus_id <> q.query_id),
        |scored AS (
        |  SELECT cd.query_id, cd.corpus_id,
        |    row_number() OVER (PARTITION BY cd.query_id
        |      ORDER BY list_cosine_similarity(qe.embedding, ce.embedding) DESC, cd.corpus_id) AS rank
        |  FROM cands cd
        |  JOIN embeddings qe ON qe.vec_id = cd.query_id
        |  JOIN embeddings ce ON ce.vec_id = cd.corpus_id)
        |SELECT query_id, corpus_id, rank FROM scored WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "ann_bruteforce" ->
      """SELECT query_id, corpus_id, rank FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS rank
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND c.vec_id != q.vec_id)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "text_stats" ->
      """SELECT doc_id,
        |  length(text) AS n_chars_text,
        |  len(regexp_split_to_array(text, ' +')) AS n_tokens,
        |  CAST((length(text) - length(replace(text, ' ', ''))) AS INT) AS n_spaces,
        |  CAST((length(' ' || lower(text) || ' ')
        |      - length(replace(' ' || lower(text) || ' ', ' the ', ''))) / 5 AS INT) AS n_the,
        |  round(CAST(len(list_filter(regexp_split_to_array(lower(text), ' +'),
        |      t -> t IN ('the','a','an','and','or','of','to','in','is'))) AS DOUBLE)
        |    / len(regexp_split_to_array(text, ' +')), 6) AS stopword_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    "corpus_stats" ->
      """WITH t AS (SELECT lang, len(regexp_split_to_array(text, ' +')) AS n_tokens FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(sum(n_tokens) AS DOUBLE) / count(*) AS mean_tokens,
        |  quantile_cont(n_tokens, 0.5) AS p50_tokens,
        |  quantile_cont(n_tokens, 0.95) AS p95_tokens
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,
    "top_tokens" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(regexp_split_to_array(
        |    trim(regexp_replace(regexp_replace(lower(text), '[.,;:!?]', '', 'g'), ' +', ' ', 'g')),
        |    ' ')) AS token
        |  FROM documents)
        |WHERE length(token) > 0
        |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin,
    "quality_score" ->
      """SELECT doc_id, round(
        |    least(CAST(len(regexp_split_to_array(text, ' +')) AS DOUBLE) / 50.0, 1.0) * 0.4
        |  + (CASE WHEN CAST(length(text) AS DOUBLE) / len(regexp_split_to_array(text, ' +'))
        |          BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.3
        |  + greatest(0.0, 1.0 - (CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
        |                         / length(text)) * 10.0) * 0.3, 6) AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,
    "doc_fingerprint" ->
      "SELECT doc_id, md5(lower(text)) AS fp_md5 FROM documents ORDER BY doc_id",
    // gaps-and-islands replay of the consecutive-same-lang chain graph:
    // within a lang, consecutive doc_ids share (doc_id - row_number),
    // and the component label is the run's min doc_id — exactly what
    // min-label propagation converges to.
    "dedup_components" ->
      """WITH g AS (
        |  SELECT doc_id, lang,
        |    doc_id - row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS grp
        |  FROM documents)
        |SELECT doc_id, min(doc_id) OVER (PARTITION BY lang, grp) AS component
        |FROM g ORDER BY doc_id""".stripMargin,
    // marker-word argmax replayed in SQL: per-language substring counts
    // via length arithmetic (identical in both engines); ties resolve to
    // the FIRST language in the marker list, matching Spark's
    // array_position-first semantics.
    "lang_id" ->
      """WITH s AS (SELECT doc_id, ' ' || lower(text) || ' ' AS t FROM documents),
        |sc AS (SELECT doc_id,
        |  CAST((length(t)-length(replace(t,' the ','')))/5 AS INT)
        |    + CAST((length(t)-length(replace(t,' and ','')))/5 AS INT)
        |    + CAST((length(t)-length(replace(t,' of ','')))/4 AS INT) AS s_en,
        |  CAST((length(t)-length(replace(t,' el ','')))/4 AS INT)
        |    + CAST((length(t)-length(replace(t,' la ','')))/4 AS INT)
        |    + CAST((length(t)-length(replace(t,' de ','')))/4 AS INT) AS s_es,
        |  CAST((length(t)-length(replace(t,' der ','')))/5 AS INT)
        |    + CAST((length(t)-length(replace(t,' und ','')))/5 AS INT)
        |    + CAST((length(t)-length(replace(t,' die ','')))/5 AS INT) AS s_de,
        |  CAST((length(t)-length(replace(t,' le ','')))/4 AS INT)
        |    + CAST((length(t)-length(replace(t,' et ','')))/4 AS INT)
        |    + CAST((length(t)-length(replace(t,' les ','')))/5 AS INT) AS s_fr,
        |  CAST((length(t)-length(replace(t,'的','')))/1 AS INT)
        |    + CAST((length(t)-length(replace(t,'是','')))/1 AS INT)
        |    + CAST((length(t)-length(replace(t,'了','')))/1 AS INT) AS s_zh
        |FROM s)
        |SELECT doc_id,
        |  CASE WHEN greatest(s_en, s_es, s_de, s_fr, s_zh) <= 0 THEN 'und'
        |       WHEN s_en = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'en'
        |       WHEN s_es = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'es'
        |       WHEN s_de = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'de'
        |       WHEN s_fr = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'fr'
        |       ELSE 'zh' END AS lang_guess
        |FROM sc ORDER BY doc_id""".stripMargin,
    "doc_chunks" ->
      """WITH w AS (SELECT doc_id,
        |    regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[.,;:!?]', '', 'g'), ' +', ' ', 'g')), ' +') AS words
        |  FROM documents),
        |c AS (SELECT doc_id, i AS chunk_idx,
        |    array_to_string(words[i*56+1 : i*56+64], ' ') AS chunk
        |  FROM w, unnest(range(0, greatest((len(words) - 8 - 1) // 56, 0) + 1)) AS t(i))
        |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx, chunk FROM c
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    "pipeline_clean_corpus" ->
      """WITH q AS (
        |  SELECT doc_id, text, round(
        |      least(CAST(len(regexp_split_to_array(text, ' +')) AS DOUBLE) / 50.0, 1.0) * 0.4
        |    + (CASE WHEN CAST(length(text) AS DOUBLE) / len(regexp_split_to_array(text, ' +'))
        |            BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.3
        |    + greatest(0.0, 1.0 - (CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
        |                           / length(text)) * 10.0) * 0.3, 6) AS q
        |  FROM documents),
        |f AS (SELECT doc_id, text FROM q WHERE q >= 0.5),
        |k AS (SELECT doc_id, text,
        |    row_number() OVER (PARTITION BY md5(lower(text)) ORDER BY doc_id) AS rk FROM f),
        |keep AS (SELECT doc_id, text FROM k WHERE rk = 1),
        |w AS (SELECT doc_id,
        |    regexp_split_to_array(trim(regexp_replace(regexp_replace(lower(text), '[.,;:!?]', '', 'g'), ' +', ' ', 'g')), ' +') AS words
        |  FROM keep),
        |c AS (SELECT doc_id, i AS chunk_idx,
        |    array_to_string(words[i*56+1 : i*56+64], ' ') AS chunk
        |  FROM w, unnest(range(0, greatest((len(words) - 8 - 1) // 56, 0) + 1)) AS t(i))
        |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx, chunk FROM c
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, md5(lower(text)) AS content_hash,
        |  count(*) AS dup_count
        |FROM documents GROUP BY md5(lower(text)) ORDER BY keep_id""".stripMargin,
    "media_stats" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS payload_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "media_frames" ->
      """WITH f AS (
        |  SELECT doc_id, text,
        |    unnest(range(0, greatest(length(text) // 64 - 1, 0) + 1, 4)) AS i
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS INT) AS frame_idx,
        |  md5(substring(text, CAST(i * 64 + 1 AS INT), 64)) AS frame_md5
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin
  )
}
