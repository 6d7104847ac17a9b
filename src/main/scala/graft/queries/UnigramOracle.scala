package graft.queries

import graft.llm.Unigram

/** The DuckDB replay of the ENTIRE unigram-LM trainer
  * ([[graft.llm.Unigram]]) — the [[BpeOracle]] convention applied to
  * hard EM: nothing trained on the Spark side enters the oracle as a
  * literal; DuckDB re-derives word frequencies, the substring candidate
  * init, and BOTH EM rounds — every integer floor-log2 score
  * (`length(bin(c)) − 1`), every Viterbi DP cell (a recursive CTE
  * advancing one position per step, carrying the last four DP values
  * in the row — the window a ≤ 4-char piece can reach back to), every
  * backward-walk segment, every usage count and every prune — from the
  * parquet alone.
  *
  * Tie-breaks are structural in both engines: the DP picks
  * `greatest(c1..c4)` and resolves equal candidates to the LARGEST
  * piece length (the CASE tests L = 4 first), exactly the Scala
  * trainer's descending-L strict-improvement scan. Candidate validity
  * is enforced in the join conditions (`d.i >= L − 1`), never by
  * substr clamping. `MATERIALIZED` on every multiply-referenced level
  * — the BpeOracle CTE-inlining lesson. */
object UnigramOracle {

  private val V = Unigram.VocabWords
  private val K = Unigram.KeepPieces
  private val R = Unigram.EmRounds
  private val Sentinel = -1000000000L

  /** DuckDB twin of [[graft.llm.TextAnalysis.normalizeText]]. */
  private val Norm =
    "trim(regexp_replace(regexp_replace(lower(text), '[.,;:!?]', '', 'g'), ' +', ' ', 'g'))"

  /** Base CTEs for the standalone vocab gate (names match
    * [[BpeOracle.trainCtes]]' so the chain composes with it too). */
  private val baseCtes: String = Seq(
    s"tokw AS (SELECT unnest(regexp_split_to_array($Norm, ' ')) AS w FROM documents)",
    "wf AS MATERIALIZED (SELECT w, count(*) AS f FROM tokw " +
      s"WHERE length(w) > 0 GROUP BY w ORDER BY f DESC, w LIMIT $V)",
    s"normd AS MATERIALIZED (SELECT doc_id, $Norm AS nt FROM documents)",
    "alpha AS (SELECT DISTINCT substr(nt, CAST(i AS INT), 1) AS tk FROM normd, " +
      "unnest(range(1, length(nt) + 1)) t(i) WHERE substr(nt, CAST(i AS INT), 1) <> ' ')"
  ).mkString(",\n")

  /** One Viterbi DP + backward walk over the words of `wordsCte(w)`
    * under the scores of `scoreCte(p, s)`, emitting
    * `u$tag(w, i, p, bl)` segment rows (p NULL on the base row). */
  private def viterbiCtes(tag: String, wordsCte: String, scoreCte: String): String = {
    val dp = s"dp$tag"; val bk = s"bk$tag"
    Seq(
      s"""$dp AS (
         |  SELECT w, length(w) AS len, CAST(0 AS BIGINT) AS i,
         |    CAST(0 AS BIGINT) AS g0, CAST(NULL AS BIGINT) AS g1,
         |    CAST(NULL AS BIGINT) AS g2, CAST(NULL AS BIGINT) AS g3,
         |    CAST(0 AS BIGINT) AS bl
         |  FROM (SELECT DISTINCT w FROM $wordsCte)
         |  UNION ALL
         |  SELECT w, len, i + 1,
         |    greatest(c1, c2, c3, c4), g0, g1, g2,
         |    CASE WHEN c4 = greatest(c1, c2, c3, c4) THEN 4
         |         WHEN c3 = greatest(c1, c2, c3, c4) THEN 3
         |         WHEN c2 = greatest(c1, c2, c3, c4) THEN 2
         |         ELSE 1 END
         |  FROM (
         |    SELECT d.w, d.len, d.i, d.g0, d.g1, d.g2, d.g3,
         |      COALESCE(d.g0 + s1.s, $Sentinel) AS c1,
         |      COALESCE(d.g1 + s2.s, $Sentinel) AS c2,
         |      COALESCE(d.g2 + s3.s, $Sentinel) AS c3,
         |      COALESCE(d.g3 + s4.s, $Sentinel) AS c4
         |    FROM $dp d
         |    LEFT JOIN $scoreCte s1 ON s1.p = substr(d.w, CAST(d.i + 1 AS INT), 1)
         |    LEFT JOIN $scoreCte s2 ON d.i >= 1 AND s2.p = substr(d.w, CAST(d.i AS INT), 2)
         |    LEFT JOIN $scoreCte s3 ON d.i >= 2 AND s3.p = substr(d.w, CAST(d.i - 1 AS INT), 3)
         |    LEFT JOIN $scoreCte s4 ON d.i >= 3 AND s4.p = substr(d.w, CAST(d.i - 2 AS INT), 4)
         |    WHERE d.i < d.len) x)""".stripMargin,
      s"""$bk AS (
         |  SELECT w, CAST(length(w) AS BIGINT) AS i, CAST(NULL AS VARCHAR) AS p
         |  FROM (SELECT DISTINCT w FROM $wordsCte)
         |  UNION ALL
         |  SELECT b.w, b.i - d.bl, substr(b.w, CAST(b.i - d.bl + 1 AS INT), CAST(d.bl AS INT))
         |  FROM $bk b JOIN $dp d ON d.w = b.w AND d.i = b.i
         |  WHERE b.i > 0)""".stripMargin
    ).mkString(",\n")
  }

  /** The training chain after [[baseCtes]] (or after
    * [[BpeOracle.trainCtes]], whose wf/alpha/normd rows are
    * identical): candidate init `c0`/`v0`, then per round r the score
    * table `s{r}`, the DP/walk `dp{r}`/`bk{r}`, usage `uses{r}` and
    * the pruned vocab `v{r}`. Ends with `uv$R$tag(p, c)`.
    * Parameterized by the prune budget `keep` and a CTE-name `tag` so
    * the fertility SWEEP can run two complete trainings (KeepPieces 60
    * vs 120) side by side in ONE query without name collisions; the
    * single-vocab gates use `(KeepPieces, "")` — names unchanged. */
  private def trainChain(keep: Int, tag: String,
      wfRel: String = "wf", alphaRel: String = "alpha"): String = {
    val ctes = Seq.newBuilder[String]
    ctes += (s"c0$tag AS MATERIALIZED (SELECT substr(w, CAST(i AS INT), CAST(L AS INT)) AS p, " +
      s"CAST(sum(f) AS BIGINT) AS c FROM $wfRel, unnest(range(1, 5)) tl(L), " +
      "unnest(range(1, length(w) + 1)) ti(i) WHERE i + L - 1 <= length(w) GROUP BY 1)")
    ctes += (s"uv0$tag AS MATERIALIZED (SELECT p, c FROM " +
      s"(SELECT p, c FROM c0$tag WHERE length(p) > 1 ORDER BY c DESC, p LIMIT $keep) " +
      s"UNION ALL SELECT a.tk, greatest(COALESCE(c0$tag.c, 0), 1) " +
      s"FROM $alphaRel a LEFT JOIN c0$tag ON c0$tag.p = a.tk)")
    (1 to R).foreach { r =>
      val p = r - 1
      ctes += (s"s$r$tag AS MATERIALIZED (SELECT p, CAST(length(bin(c)) - 1 AS BIGINT) - " +
        s"(SELECT length(bin(CAST(sum(c) AS BIGINT))) - 1 FROM uv$p$tag) AS s FROM uv$p$tag)")
      ctes += viterbiCtes(s"$r$tag", wfRel, s"s$r$tag")
      ctes += (s"uses$r$tag AS MATERIALIZED (SELECT u.p, CAST(sum($wfRel.f) AS BIGINT) AS c " +
        s"FROM bk$r$tag u JOIN $wfRel ON $wfRel.w = u.w WHERE u.p IS NOT NULL GROUP BY u.p)")
      ctes += (s"uv$r$tag AS MATERIALIZED (SELECT p, c FROM uses$r$tag WHERE length(p) > 1 " +
        s"UNION ALL SELECT s.p, greatest(COALESCE(u.c, 0), 1) " +
        s"FROM (SELECT p FROM uv$p$tag WHERE length(p) = 1) s " +
        s"LEFT JOIN uses$r$tag u ON u.p = s.p)")
    }
    ctes.result().mkString(",\n")
  }

  private val trainChainDefault: String = trainChain(K, "")

  /** `unigram_vocab`: the trained artifact, re-derived end to end. */
  val unigramVocabSql: String =
    s"""WITH RECURSIVE
       |$baseCtes,
       |$trainChainDefault
       |SELECT p AS piece, c AS cnt,
       |  CAST(length(bin(c)) - 1 AS BIGINT) -
       |    (SELECT length(bin(CAST(sum(c) AS BIGINT))) - 1 FROM uv$R) AS score
       |FROM uv$R ORDER BY piece""".stripMargin

  /** `unigram_segment`: the exact piece BOUNDARIES of every corpus
    * doc — per distinct word the backward walk's pieces reassemble in
    * start order (`/`-joined inside a word, space-joined across the
    * doc's word sequence), md5'd per doc. */
  val unigramSegmentSql: String =
    s"""WITH RECURSIVE
       |$baseCtes,
       |$trainChainDefault,
       |sF AS MATERIALIZED (SELECT p, CAST(length(bin(c)) - 1 AS BIGINT) -
       |    (SELECT length(bin(CAST(sum(c) AS BIGINT))) - 1 FROM uv$R) AS s FROM uv$R),
       |dw AS MATERIALIZED (SELECT doc_id, wi, arr[CAST(wi AS INT)] AS w FROM
       |  (SELECT doc_id, regexp_split_to_array(nt, ' ') AS arr FROM normd),
       |  unnest(range(1, len(arr) + 1)) t(wi)),
       |${viterbiCtes("F", "dw", "sF")},
       |segw AS MATERIALIZED (SELECT w, string_agg(p, '/' ORDER BY i) AS seg,
       |    CAST(count(*) AS BIGINT) AS np
       |  FROM bkF WHERE p IS NOT NULL GROUP BY w)
       |SELECT d.doc_id,
       |  CAST(sum(COALESCE(s.np, 0)) AS BIGINT) AS n_pieces,
       |  md5(string_agg(COALESCE(s.seg, ''), ' ' ORDER BY d.wi)) AS seg_md5
       |FROM dw d LEFT JOIN segw s ON s.w = d.w
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin

  /** `unigram_fertility_sweep`: TWO complete hard-EM trainings
    * (KeepPieces 60 vs 120) replayed side by side in one query — the
    * comparison study the trainer exists for: how much does halving
    * the prune budget cost in fertility, per source. Each side is a
    * full [[trainChain]] instantiation (tagged CTE names) plus its own
    * apply-side Viterbi over the shared per-source word counts; the
    * corpus CTEs (wf, alpha, srcw) are shared so the two trainings see
    * byte-identical inputs. */
  val unigramFertilitySweepSql: String = {
    def side(keep: Int, tag: String): String =
      s"""${trainChain(keep, tag)},
         |sF$tag AS MATERIALIZED (SELECT p, CAST(length(bin(c)) - 1 AS BIGINT) -
         |    (SELECT length(bin(CAST(sum(c) AS BIGINT))) - 1 FROM uv$R$tag) AS s FROM uv$R$tag),
         |${viterbiCtes(s"F$tag", "srcw", s"sF$tag")},
         |pc$tag AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS np
         |  FROM bkF$tag WHERE p IS NOT NULL GROUP BY w),
         |uni$tag AS (SELECT s.source, CAST(sum(s.n) AS BIGINT) AS n_words,
         |    CAST(sum(s.n * COALESCE(pc$tag.np, 0)) AS BIGINT) AS n_pieces
         |  FROM srcw s LEFT JOIN pc$tag ON pc$tag.w = s.w GROUP BY s.source)""".stripMargin
    s"""WITH RECURSIVE
       |$baseCtes,
       |srcw AS MATERIALIZED (SELECT source, w, count(*) AS n FROM
       |  (SELECT source, unnest(regexp_split_to_array($Norm, ' ')) AS w
       |   FROM documents WHERE text IS NOT NULL)
       |  GROUP BY source, w),
       |nd AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
       |  FROM documents WHERE text IS NOT NULL GROUP BY source),
       |${side(60, "a")},
       |${side(120, "b")}
       |SELECT 60 AS keep_pieces, nd.source, nd.n_docs, u.n_words, u.n_pieces,
       |  u.n_pieces * 1000000 // u.n_words AS fertility_ppm
       |FROM unia u JOIN nd ON nd.source = u.source
       |UNION ALL
       |SELECT 120 AS keep_pieces, nd.source, nd.n_docs, u.n_words, u.n_pieces,
       |  u.n_pieces * 1000000 // u.n_words AS fertility_ppm
       |FROM unib u JOIN nd ON nd.source = u.source
       |ORDER BY keep_pieces, source""".stripMargin
  }

  /** `vocab_transplant`: BOTH tokenizer trainings re-derived (the BPE
    * chain's `vocab(id, tk)` + this trainer's final `uv$R(p, c)`) and
    * joined on the piece string — the warm-start mapping a tokenizer
    * migration initializes embeddings from. */
  val vocabTransplantSql: String =
    s"""WITH RECURSIVE
       |${BpeOracle.trainCtes},
       |$trainChainDefault
       |SELECT u.p AS piece, u.c AS unigram_cnt,
       |  CAST(v.id AS INT) AS bpe_id,
       |  CASE WHEN v.id IS NULL THEN 'unmapped' ELSE 'mapped' END AS status
       |FROM uv$R u LEFT JOIN vocab v ON v.tk = u.p
       |ORDER BY piece""".stripMargin

  /** `forget_vocab_audit`: FOUR complete trainings replayed in one
    * query — BPE and unigram, each over the shipped corpus AND over
    * the delete-masked survivor corpus (the fertility-sweep tagged-CTE
    * convention, with [[BpeOracle.vocabCtes]] supplying each side's
    * wf/alpha inputs so the two tokenizers see byte-identical
    * corpora) — full-outer-joined per tokenizer into the piece-level
    * kept / lost / gained verdict. Nothing trained enters as a
    * literal: a piece reads `lost` exactly when re-deriving the
    * training without the forgotten docs no longer produces it. */
  val forgetVocabAuditSql: String = {
    val mask = "WHERE NOT (" +
      LlmQueries.hx60("md5('forget:' || CAST(doc_id AS VARCHAR))") + " % 200 = 0)"
    s"""WITH RECURSIVE
       |${BpeOracle.vocabCtes("", "")},
       |${trainChain(K, "")},
       |${BpeOracle.vocabCtes("m", mask)},
       |${trainChain(K, "m", "wfm", "alpham")}
       |SELECT 'bpe' AS tokenizer, COALESCE(a.tk, b.tk) AS piece,
       |  CASE WHEN b.tk IS NULL THEN 'lost'
       |       WHEN a.tk IS NULL THEN 'gained' ELSE 'kept' END AS status
       |FROM vocab a FULL OUTER JOIN vocabm b ON a.tk = b.tk
       |UNION ALL
       |SELECT 'unigram', COALESCE(a.p, b.p),
       |  CASE WHEN b.p IS NULL THEN 'lost'
       |       WHEN a.p IS NULL THEN 'gained' ELSE 'kept' END
       |FROM uv$R a FULL OUTER JOIN uv${R}m b ON a.p = b.p
       |ORDER BY tokenizer, piece""".stripMargin
  }

  /** `unigram_fertility`: the final scores segment EVERY distinct
    * corpus word (not just the training top-V); per-source word
    * occurrence counts weight the piece counts; the BPE token side
    * rides [[BpeOracle.trainCtes]]' `enc` verbatim (whose wf/normd
    * this chain shares). */
  val unigramFertilitySql: String =
    s"""WITH RECURSIVE
       |${BpeOracle.trainCtes},
       |$trainChainDefault,
       |sF AS MATERIALIZED (SELECT p, CAST(length(bin(c)) - 1 AS BIGINT) -
       |    (SELECT length(bin(CAST(sum(c) AS BIGINT))) - 1 FROM uv$R) AS s FROM uv$R),
       |srcw AS MATERIALIZED (SELECT source, w, count(*) AS n FROM
       |  (SELECT source, unnest(regexp_split_to_array($Norm, ' ')) AS w FROM documents)
       |  GROUP BY source, w),
       |${viterbiCtes("F", "srcw", "sF")},
       |pc AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS np
       |  FROM bkF WHERE p IS NOT NULL GROUP BY w),
       |uni AS (SELECT s.source, CAST(sum(s.n) AS BIGINT) AS n_words,
       |    CAST(sum(s.n * COALESCE(pc.np, 0)) AS BIGINT) AS n_pieces_unigram
       |  FROM srcw s LEFT JOIN pc ON pc.w = s.w GROUP BY s.source),
       |bpet AS (SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(len(e.ts)) AS BIGINT) AS n_tokens_bpe
       |  FROM documents d JOIN enc e ON e.doc_id = d.doc_id
       |  WHERE d.text IS NOT NULL GROUP BY d.source)
       |SELECT u.source, b.n_docs, u.n_words, u.n_pieces_unigram, b.n_tokens_bpe,
       |  u.n_pieces_unigram * 1000000 // u.n_words AS fertility_unigram_ppm,
       |  b.n_tokens_bpe * 1000000 // u.n_words AS fertility_bpe_ppm
       |FROM uni u JOIN bpet b ON b.source = u.source
       |ORDER BY u.source""".stripMargin
}
