package graft.queries

import graft.llm.Bpe

/** The DuckDB replay of the ENTIRE deterministic BPE training loop
  * ([[graft.llm.Bpe]]) as a generated chain of MATERIALIZED CTEs — the
  * `embedding_kmeans_assign` convention taken to an iterative trainer:
  * nothing trained on the Spark side enters the oracle as a literal;
  * DuckDB re-derives word frequencies, every pair-count argmax, every
  * merge application, the alphabet, the vocabulary ids AND the per-doc
  * encoding from the parquet alone, so a hash match verifies training
  * and application together.
  *
  * Per merge iteration i the block emits three CTEs:
  *   - `p{i}`: adjacent-pair counts over the current vocabulary
  *     representation, weighted by word frequency (overlapping
  *     occurrences counted, the Sennrich statistic);
  *   - `m{i}`: the argmax pair, ties by pair string ASC;
  *   - `v{i}`: the vocabulary with `" a  b " -> " ab "` applied — the
  *     same double-spaced substring replacement the Spark side
  *     compiles, byte-identical semantics in both engines.
  * `MATERIALIZED` is load-bearing: each m/v level is referenced by
  * every later level, and inlining would re-expand the whole chain
  * exponentially (measured: DuckDB 1.0 exhausts file handles at
  * M = 20 without it). */
object BpeOracle {

  private val M = Bpe.NumMerges
  private val V = Bpe.VocabWords

  /** DuckDB twin of [[graft.llm.TextAnalysis.normalizeText]]. */
  private val Norm =
    "trim(regexp_replace(regexp_replace(lower(text), '[.,;:!?]', '', 'g'), ' +', ' ', 'g'))"

  /** Shared training + encode CTE block (no leading WITH). Ends with:
    * `enc(doc_id, ts)` — the per-doc token array — and
    * `vocab(tk, id)` — the token-id table. Defined as the untagged
    * [[vocabCtes]] instantiation plus the encode tail, so the shipped
    * tokenizer's replay and the forget audit's replay share literally
    * ONE training-chain source (the round-20 review note: a second
    * copy of the argmax/replace text would be a drift surface). */
  val trainCtes: String = {
    val rep = (1 to M).foldLeft("' ' || regexp_replace(nt, '(.)', '\\1  ', 'g')") { (acc, j) =>
      s"replace($acc, ' ' || split_part((SELECT pr FROM m$j), ' ', 1) || '  ' || " +
        s"split_part((SELECT pr FROM m$j), ' ', 2) || ' ', " +
        s"' ' || replace((SELECT pr FROM m$j), ' ', '') || ' ')"
    }
    vocabCtes("", "") + ",\n" +
      s"enc AS MATERIALIZED (SELECT doc_id, regexp_split_to_array(trim($rep), ' +') AS ts FROM normd)"
  }

  /** The VOCAB-ONLY training chain of [[trainCtes]] (no per-doc
    * encode), parameterized by a CTE-name `tag` and a corpus `where`
    * clause so the `forget_vocab_audit` oracle can replay TWO complete
    * trainings — the shipped tokenizer and its delete-masked retrain —
    * side by side in one query (the unigram fertility-sweep
    * convention). Emits `tokw$tag … vocab$tag(tk, id)` plus the
    * `wf$tag`/`alpha$tag` inputs the unigram chain shares. The merge
    * CTE shapes are byte-identical to [[trainCtes]]' — one argmax /
    * replace source. */
  def vocabCtes(tag: String, where: String): String = {
    val ctes = Seq.newBuilder[String]
    ctes += s"tokw$tag AS (SELECT unnest(regexp_split_to_array($Norm, ' ')) AS w FROM documents $where)"
    ctes += (s"wf$tag AS MATERIALIZED (SELECT w, count(*) AS f FROM tokw$tag " +
      s"WHERE length(w) > 0 GROUP BY w ORDER BY f DESC, w LIMIT $V)")
    ctes += s"v0$tag AS MATERIALIZED (SELECT w, f, ' ' || regexp_replace(w, '(.)', '\\1  ', 'g') AS s FROM wf$tag)"
    (1 to M).foreach { i =>
      val p = i - 1
      ctes += (s"p$i$tag AS MATERIALIZED (SELECT pr, CAST(sum(f) AS BIGINT) AS n FROM (SELECT f, " +
        "unnest(list_transform(range(1, len(regexp_split_to_array(trim(s), ' +'))), " +
        "k -> regexp_split_to_array(trim(s), ' +')[k] || ' ' || " +
        s"regexp_split_to_array(trim(s), ' +')[k+1])) AS pr FROM v$p$tag) GROUP BY pr)")
      ctes += s"m$i$tag AS MATERIALIZED (SELECT pr FROM p$i$tag ORDER BY n DESC, pr LIMIT 1)"
      ctes += (s"v$i$tag AS MATERIALIZED (SELECT w, f, " +
        "replace(s, ' ' || split_part(m.pr, ' ', 1) || '  ' || split_part(m.pr, ' ', 2) || ' ', " +
        s"' ' || replace(m.pr, ' ', '') || ' ') AS s FROM v$p$tag, m$i$tag m)")
    }
    ctes += s"normd$tag AS MATERIALIZED (SELECT doc_id, $Norm AS nt FROM documents $where)"
    ctes += (s"alpha$tag AS (SELECT DISTINCT substr(nt, CAST(i AS INT), 1) AS tk FROM normd$tag, " +
      "unnest(range(1, length(nt) + 1)) t(i) WHERE substr(nt, CAST(i AS INT), 1) <> ' ')")
    ctes += s"vocabc$tag AS MATERIALIZED (SELECT tk, row_number() OVER (ORDER BY tk) - 1 AS id FROM alpha$tag)"
    ctes += (s"mlist$tag AS (" + (1 to M).map(j =>
      s"SELECT $j AS j, replace(pr, ' ', '') AS tk FROM m$j$tag").mkString(" UNION ALL ") + ")")
    ctes += (s"vocab$tag AS MATERIALIZED (SELECT tk, CAST(min(id) AS BIGINT) AS id FROM (" +
      s"SELECT tk, id FROM vocabc$tag UNION ALL " +
      s"SELECT tk, (SELECT count(*) FROM vocabc$tag) + j - 1 AS id FROM mlist$tag) GROUP BY tk)")
    ctes.result().mkString(",\n")
  }

  /** BYTE-MODE twin of [[trainCtes]] (round 15): the vocabulary
    * representation and the per-doc encode run over each word's UTF-8
    * bytes spelled as uppercase hex pairs — `hex()` of UTF-8 text is
    * bit-identical in Spark and DuckDB, which is what makes the
    * byte-level tokenizer oracle-able. The alphabet is the STRUCTURAL
    * 256-entry byte table (ids 0..255 = byte value), generated from
    * `range(256)`, not collected from the corpus: zero-OOV by
    * construction, which `bpe_coverage_bytes` then proves on text the
    * training corpus never saw. The merge loop CTEs are the same
    * argmax/replace shapes as the code-point chain. Word gaps in the
    * double-spaced hex expansion are 3 spaces (pair + separator), which
    * no ` a  b ` pattern (exactly two inner spaces) can span. */
  val trainCtesBytes: String = {
    val ctes = Seq.newBuilder[String]
    ctes += s"tokw AS (SELECT unnest(regexp_split_to_array($Norm, ' ')) AS w FROM documents)"
    ctes += ("wf AS MATERIALIZED (SELECT w, count(*) AS f FROM tokw " +
      s"WHERE length(w) > 0 GROUP BY w ORDER BY f DESC, w LIMIT $V)")
    ctes += ("v0 AS MATERIALIZED (SELECT w, f, " +
      "' ' || regexp_replace(hex(w), '([0-9A-F]{2})', '\\1  ', 'g') AS s FROM wf)")
    (1 to M).foreach { i =>
      val p = i - 1
      ctes += (s"p$i AS MATERIALIZED (SELECT pr, CAST(sum(f) AS BIGINT) AS n FROM (SELECT f, " +
        "unnest(list_transform(range(1, len(regexp_split_to_array(trim(s), ' +'))), " +
        "k -> regexp_split_to_array(trim(s), ' +')[k] || ' ' || " +
        s"regexp_split_to_array(trim(s), ' +')[k+1])) AS pr FROM v$p) GROUP BY pr)")
      ctes += s"m$i AS MATERIALIZED (SELECT pr FROM p$i ORDER BY n DESC, pr LIMIT 1)"
      ctes += (s"v$i AS MATERIALIZED (SELECT w, f, " +
        "replace(s, ' ' || split_part(m.pr, ' ', 1) || '  ' || split_part(m.pr, ' ', 2) || ' ', " +
        s"' ' || replace(m.pr, ' ', '') || ' ') AS s FROM v$p, m$i m)")
    }
    ctes += s"normd AS MATERIALIZED (SELECT doc_id, $Norm AS nt FROM documents)"
    ctes += ("hexd AS MATERIALIZED (SELECT doc_id, " +
      "array_to_string(list_transform(string_split(nt, ' '), w -> hex(w)), ' ') AS ht " +
      "FROM normd)")
    ctes += ("vocabc AS MATERIALIZED (SELECT " +
      "substr('0123456789ABCDEF', CAST(i // 16 AS INT) + 1, 1) || " +
      "substr('0123456789ABCDEF', CAST(i % 16 AS INT) + 1, 1) AS tk, " +
      "CAST(i AS BIGINT) AS id FROM range(256) t(i))")
    ctes += ("mlist AS (" + (1 to M).map(j =>
      s"SELECT $j AS j, replace(pr, ' ', '') AS tk FROM m$j").mkString(" UNION ALL ") + ")")
    ctes += ("vocab AS MATERIALIZED (SELECT tk, CAST(min(id) AS BIGINT) AS id FROM (" +
      "SELECT tk, id FROM vocabc UNION ALL " +
      "SELECT tk, (SELECT count(*) FROM vocabc) + j - 1 AS id FROM mlist) GROUP BY tk)")
    val rep = (1 to M).foldLeft("' ' || regexp_replace(ht, '([0-9A-F]{2})', '\\1  ', 'g')") { (acc, j) =>
      s"replace($acc, ' ' || split_part((SELECT pr FROM m$j), ' ', 1) || '  ' || " +
        s"split_part((SELECT pr FROM m$j), ' ', 2) || ' ', " +
        s"' ' || replace((SELECT pr FROM m$j), ' ', '') || ' ')"
    }
    ctes += s"enc AS MATERIALIZED (SELECT doc_id, regexp_split_to_array(trim($rep), ' +') AS ts FROM hexd)"
    ctes.result().mkString(",\n")
  }

  /** `bpe_encode_bytes`: the [[bpeEncodeSql]] witnesses over the
    * byte-mode chain. */
  val bpeEncodeBytesSql: String =
    s"""WITH $trainCtesBytes,
       |tk AS (SELECT doc_id, unnest(ts) AS tk, generate_subscripts(ts, 1) AS pos FROM enc),
       |wid AS (SELECT t.doc_id, t.pos, t.tk, coalesce(v.id, -1) AS id
       |  FROM tk t LEFT JOIN vocab v ON t.tk = v.tk)
       |SELECT doc_id, CAST(count(*) AS INT) AS n_tokens,
       |  md5(string_agg(tk, ' ' ORDER BY pos)) AS tokens_md5,
       |  md5(string_agg(CAST(id AS VARCHAR), ',' ORDER BY pos)) AS ids_md5
       |FROM wid GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** `bpe_vocab_bytes`: the byte-mode vocabulary artifact re-derived
    * from the training replay — 256 structural byte ids + merge ids in
    * training order under the min-id dedup rule. */
  val bpeVocabBytesSql: String =
    s"""WITH $trainCtesBytes
       |SELECT CAST(id AS INT) AS id, tk AS token,
       |  CAST(CASE WHEN id >= (SELECT count(*) FROM vocabc) THEN 1 ELSE 0 END AS INT) AS is_merge
       |FROM vocab ORDER BY id""".stripMargin

  /** `bpe_coverage_bytes`: the zero-OOV PROOF — the byte tokenizer
    * trained on `documents` alone, applied to documents PLUS hostile
    * out-of-corpus unicode (emoji, CJK, Cyrillic, combining marks —
    * [[LlmQueries.HostileTexts]] as literals, identical bytes in both
    * engines); every token must resolve to a vocabulary id. The
    * code-point tokenizer structurally CANNOT pass this (unseen
    * characters are outside its collected alphabet); the byte alphabet
    * covers any UTF-8 input by construction. */
  def bpeCoverageBytesSql(hostile: Seq[String]): String = {
    val lits = hostile.map(t => s"(${sqlString(t)})").mkString(", ")
    s"""WITH $trainCtesBytes,
       |hostile(htext) AS (VALUES $lits),
       |corpus AS (SELECT text FROM documents UNION ALL SELECT htext FROM hostile),
       |cnorm AS (SELECT ${Norm.replace("documents", "corpus")} AS nt FROM corpus),
       |chex AS (SELECT array_to_string(list_transform(string_split(nt, ' '), w -> hex(w)), ' ') AS ht
       |  FROM cnorm WHERE length(nt) > 0),
       |cenc AS (SELECT regexp_split_to_array(trim($encRepExpr), ' +') AS ts FROM chex),
       |ctok AS (SELECT unnest(ts) AS tk FROM cenc),
       |cid AS (SELECT coalesce(v.id, -1) AS id FROM ctok t LEFT JOIN vocab v ON t.tk = v.tk)
       |SELECT CAST(count(*) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN id < 0 THEN 1 ELSE 0 END) AS BIGINT) AS unknown_tokens,
       |  CAST(sum(CASE WHEN id >= 0 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS coverage_ppm
       |FROM cid ORDER BY n_tokens""".stripMargin
  }

  /** The byte-mode encode replace-chain over a column named `ht` —
    * shared by the per-doc and the coverage CTEs. */
  private def encRepExpr: String =
    (1 to M).foldLeft("' ' || regexp_replace(ht, '([0-9A-F]{2})', '\\1  ', 'g')") { (acc, j) =>
      s"replace($acc, ' ' || split_part((SELECT pr FROM m$j), ' ', 1) || '  ' || " +
        s"split_part((SELECT pr FROM m$j), ' ', 2) || ' ', " +
        s"' ' || replace((SELECT pr FROM m$j), ' ', '') || ' ')"
    }

  private def sqlString(s: String): String = "'" + s.replace("'", "''") + "'"

  /** `bpe_fertility_by_source`: per-source tokens-per-word and
    * bytes-per-token of the byte-mode tokenizer — training and every
    * per-doc token count replayed through the chain. */
  val bpeFertilityBySourceSql: String =
    s"""WITH $trainCtesBytes,
       |src AS (SELECT d.doc_id, d.source, n.nt
       |  FROM documents d JOIN normd n ON d.doc_id = n.doc_id),
       |m AS (SELECT s.source,
       |    CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(len(string_split(s.nt, ' '))) AS BIGINT) AS n_words,
       |    CAST(sum(len(e.ts)) AS BIGINT) AS n_tokens,
       |    CAST(sum(octet_length(encode(s.nt))) AS BIGINT) AS n_bytes
       |  FROM src s JOIN enc e ON s.doc_id = e.doc_id GROUP BY s.source)
       |SELECT source, n_docs, n_words, n_tokens, n_bytes,
       |  CAST(n_tokens * 1000000 // n_words AS BIGINT) AS fertility_ppm,
       |  CAST(n_bytes * 1000000 // n_tokens AS BIGINT) AS bytes_per_token_ppm
       |FROM m ORDER BY source""".stripMargin

  /** `bpe_decode_roundtrip`: the oracle states `md5(normalized text)`
    * INDEPENDENTLY per doc — it never simulates the Spark side's
    * decode; the hash only matches when ids → hex tokens → bytes →
    * text → word re-join reproduced the input exactly. `n_tokens_bytes`
    * replays through the byte-mode chain; `cp_decodable` replays the
    * code-point contrast: 0 iff the doc contains any character outside
    * the alphabet collected from `documents` (exactly when the
    * code-point id stream carries a -1 and the decode nulls). */
  def bpeDecodeRoundtripSql(hostile: Seq[String]): String = {
    val lits = hostile.zipWithIndex
      .map { case (t, i) => s"(${1000000L + i}, ${sqlString(t)})" }.mkString(", ")
    s"""WITH $trainCtesBytes,
       |hostile(doc_id, text) AS (VALUES $lits),
       |corpus AS (SELECT doc_id, text FROM documents UNION ALL
       |  SELECT doc_id, text FROM hostile),
       |cnorm AS MATERIALIZED (SELECT doc_id, $Norm AS nt FROM corpus),
       |cfil AS (SELECT doc_id, nt FROM cnorm WHERE length(nt) > 0),
       |chex AS (SELECT doc_id, array_to_string(list_transform(string_split(nt, ' '), w -> hex(w)), ' ') AS ht
       |  FROM cfil),
       |cenc AS (SELECT doc_id, regexp_split_to_array(trim($encRepExpr), ' +') AS ts FROM chex),
       |cpalpha AS MATERIALIZED (SELECT DISTINCT substr(nt, CAST(i AS INT), 1) AS ch
       |  FROM (SELECT $Norm AS nt FROM documents) d, unnest(range(1, length(nt) + 1)) t(i)
       |  WHERE substr(nt, CAST(i AS INT), 1) <> ' '),
       |cpch AS (SELECT doc_id, substr(nt, CAST(i AS INT), 1) AS ch
       |  FROM cfil, unnest(range(1, length(nt) + 1)) t(i)
       |  WHERE substr(nt, CAST(i AS INT), 1) <> ' '),
       |cpok AS (SELECT doc_id,
       |    CAST(CASE WHEN sum(CASE WHEN ch IN (SELECT ch FROM cpalpha) THEN 0 ELSE 1 END) > 0
       |      THEN 0 ELSE 1 END AS INT) AS cp_decodable
       |  FROM cpch GROUP BY doc_id)
       |SELECT f.doc_id, CAST(len(e.ts) AS INT) AS n_tokens_bytes,
       |  md5(f.nt) AS decoded_bytes_md5, cpok.cp_decodable
       |FROM cfil f JOIN cenc e ON f.doc_id = e.doc_id
       |JOIN cpok ON f.doc_id = cpok.doc_id
       |ORDER BY f.doc_id""".stripMargin
  }

  /** `bpe_encode`: per doc, exact token count plus md5 witnesses of the
    * token string and the id sequence. */
  val bpeEncodeSql: String =
    s"""WITH $trainCtes,
       |tk AS (SELECT doc_id, unnest(ts) AS tk, generate_subscripts(ts, 1) AS pos FROM enc),
       |wid AS (SELECT t.doc_id, t.pos, t.tk, coalesce(v.id, -1) AS id
       |  FROM tk t LEFT JOIN vocab v ON t.tk = v.tk)
       |SELECT doc_id, CAST(count(*) AS INT) AS n_tokens,
       |  md5(string_agg(tk, ' ' ORDER BY pos)) AS tokens_md5,
       |  md5(string_agg(CAST(id AS VARCHAR), ',' ORDER BY pos)) AS ids_md5
       |FROM wid GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** `bpe_vocab`: the vocabulary table re-derived entirely from the
    * training replay — ids pin merge order and the min-id dedup rule. */
  val bpeVocabSql: String =
    s"""WITH $trainCtes
       |SELECT CAST(id AS INT) AS id, tk AS token,
       |  CAST(CASE WHEN id >= (SELECT count(*) FROM vocabc) THEN 1 ELSE 0 END AS INT) AS is_merge
       |FROM vocab ORDER BY id""".stripMargin

  /** `token_length_histogram_bpe`: the context-length histogram on
    * exact BPE counts (bucket boundaries shared with the ws variant). */
  val tokenLengthHistogramBpeSql: String =
    s"""WITH $trainCtes,
       |nt AS (SELECT doc_id, len(ts) AS n FROM enc)
       |SELECT CASE WHEN n <= 64 THEN 'a_0-64' WHEN n <= 128 THEN 'b_65-128'
       |  WHEN n <= 256 THEN 'c_129-256' WHEN n <= 512 THEN 'd_257-512'
       |  ELSE 'e_513+' END AS len_bucket,
       |  count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS total_tokens
       |FROM nt GROUP BY 1 ORDER BY len_bucket""".stripMargin

  /** `source_mixture_weights_bpe`: the integer ppm mixture math of
    * `source_mixture_weights`, on exact BPE token budgets. */
  val sourceMixtureWeightsBpeSql: String =
    s"""WITH $trainCtes,
       |nt AS (SELECT e.doc_id, len(e.ts) AS n_tokens, d.source
       |  FROM enc e JOIN documents d USING (doc_id)),
       |per AS (SELECT source, count(*) AS n_docs,
       |    CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM nt GROUP BY source),
       |per2 AS (SELECT *, CAST(floor(sqrt(CAST(total_tokens AS DOUBLE))) AS BIGINT) AS isq FROM per),
       |tot AS (SELECT CAST(sum(total_tokens) AS BIGINT) AS gt, CAST(sum(isq) AS BIGINT) AS gi FROM per2)
       |SELECT source, n_docs, total_tokens,
       |  total_tokens * 1000000 // gt AS weight_ppm,
       |  isq * 1000000 // gi AS smoothed_weight_ppm
       |FROM per2, tot
       |ORDER BY source""".stripMargin

  /** `pack_payload_bpe`: the packed training payload itself — per
    * pack, the md5 witness over every member doc's id sequence
    * concatenated in doc order, re-derived from raw parquet through
    * training, encoding, the prefix-sum assignment, and the in-pack
    * order. */
  val packPayloadBpeSql: String =
    s"""WITH $trainCtes,
       |nt AS (SELECT doc_id, len(ts) AS n_tokens FROM enc),
       |c AS (SELECT doc_id, n_tokens,
       |    sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM nt),
       |pk AS (SELECT doc_id, n_tokens, CAST((cum - n_tokens) // 2048 AS BIGINT) AS pack_id FROM c),
       |tk AS (SELECT doc_id, unnest(ts) AS tk, generate_subscripts(ts, 1) AS pos FROM enc),
       |wid AS (SELECT t.doc_id, t.pos, coalesce(v.id, -1) AS id
       |  FROM tk t LEFT JOIN vocab v ON t.tk = v.tk),
       |idstr AS (SELECT doc_id, string_agg(CAST(id AS VARCHAR), ',' ORDER BY pos) AS ids
       |  FROM wid GROUP BY doc_id)
       |SELECT pk.pack_id, count(*) AS n_docs, CAST(sum(pk.n_tokens) AS BIGINT) AS n_tokens,
       |  md5(string_agg(idstr.ids, ',' ORDER BY pk.doc_id)) AS payload_md5
       |FROM pk JOIN idstr USING (doc_id)
       |GROUP BY pk.pack_id ORDER BY pack_id""".stripMargin

  /** `pack_sequences_bpe`: the `pack_sequences` window-sum replay on
    * EXACT BPE token counts instead of the whitespace proxy. */
  val packSequencesBpeSql: String =
    s"""WITH $trainCtes,
       |nt AS (SELECT doc_id, len(ts) AS n_tokens FROM enc),
       |c AS (SELECT doc_id, n_tokens,
       |    sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM nt)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST((cum - n_tokens) // 2048 AS BIGINT) AS pack_id
       |FROM c ORDER BY doc_id""".stripMargin
}
