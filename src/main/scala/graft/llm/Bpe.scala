package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic byte-pair-encoding tokenizer — real subword merges,
  * trained end-to-end and applied corpus-wide, replacing the
  * whitespace/regex token-count PROXIES used elsewhere in the catalog
  * with exact token budgets (the single most-used operator of a
  * training-data pipeline: packing, mixture weights and length
  * filters all key off true token counts).
  *
  * Training (Sennrich-style, RNG-free): word frequencies over the
  * normalized corpus, bounded to the top-`vocabWords` words by
  * (freq DESC, word ASC) — the md5-sample boundedness class of
  * [[Similarity]]'s trained quantizers: at 100 TB the corpus-sized
  * work is ONE word-frequency aggregate (map-side partial, the
  * `top_tokens` shape) and everything after runs on a driver-side
  * table of a few hundred rows, because pair statistics weighted by
  * word frequency over the DISTINCT vocabulary are exactly the
  * corpus pair statistics (the `bpe_pair_stats` identity). Each of
  * `numMerges` iterations picks the max-count adjacent symbol pair —
  * ties by the pair string ASC — and merges it left-to-right
  * non-overlapping in every vocabulary word. Integer counts and
  * lexicographic tie-breaks make the trained merge list
  * bit-reproducible in any engine; the DuckDB oracle
  * ([[graft.queries.BpeOracle]]) replays the ENTIRE loop as chained
  * CTEs, so the training itself is hash-verified, not just the
  * application.
  *
  * Encoding runs SCAN-SIDE as a chain of codegen'd literal
  * `StringReplace`s — no UDF, no shuffle: the text is expanded to
  * one-symbol-per-token form with DOUBLE spaces between symbols
  * (single leading space per word), and merge (a, b) is the plain
  * substring replacement `" a  b " -> " ab "`. Each match consumes
  * one space of each double boundary and the replacement restores
  * it, so left-to-right non-overlapping replacement is EXACTLY the
  * Sennrich merge order — and plain `replace()` has identical
  * semantics in Spark and DuckDB (no lookaround regex, which RE2
  * lacks). Word gaps widen to 5 spaces under the expansion, which no
  * `" a  b "` pattern can span, so merges never cross word
  * boundaries. */
object Bpe {

  /** Training-vocabulary bound: the top-V words by frequency. Inactive
    * on the synthetic corpus (31 distinct words) but the reason the
    * train step stays driver-sized at 100 TB. */
  val VocabWords = 300

  /** Number of merge iterations (= learned subword vocabulary beyond
    * the base alphabet). */
  val NumMerges = 20

  /** A trained tokenizer: the base alphabet (sorted single symbols of
    * the normalized corpus) and the ordered merge list. */
  final case class Trained(alphabet: Seq[String], merges: Seq[(String, String)]) {

    /** token -> id. Alphabet symbols take ids 0..A-1 in sorted order;
      * merge outputs take A, A+1, … in training order. If two merges
      * concatenate to the same token string the FIRST occurrence wins
      * (both engines dedup by min id). */
    lazy val vocab: Map[String, Int] = {
      val all = alphabet ++ merges.map { case (a, b) => a + b }
      all.zipWithIndex.foldLeft(Map.empty[String, Int]) { case (m, (tk, id)) =>
        if (m.contains(tk)) m else m.updated(tk, id)
      }
    }
  }

  /** One Sennrich merge step over a symbol sequence: replace every
    * left-to-right non-overlapping adjacent (a, b) with a+b. */
  private[llm] def applyMerge(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) { out += (a + b); i += 2 }
      else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Driver-side reference encode of one word (used by training and as
    * the spec twin of the Column [[encode]]). */
  private[llm] def encodeWord(word: String, merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(word.map(_.toString).toVector) { case (s, (a, b)) => applyMerge(s, a, b) }

  /** Train on the corpus: two bounded collects (top-V word
    * frequencies; the distinct base alphabet) then a driver-side merge
    * loop. Deterministic: integer pair counts, ties by the
    * `"a b"` pair string ascending — the exact ORDER BY of the oracle
    * replay (equivalent to (a, b) tuple order because tokens contain
    * no character below 0x20). */
  def train(
      df: DataFrame,
      textCol: String,
      vocabWords: Int = VocabWords,
      numMerges: Int = NumMerges): Trained = {
    val norm = TextAnalysis.normalizeText(col(textCol))
    val wfRows = df.select(explode(split(norm, " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(desc("f"), asc("w")).limit(vocabWords)
      .collect()
    val alphabet = df.select(explode(split(norm, "")).as("c"))
      .filter(length(col("c")) > 0 && col("c") =!= " ")
      .distinct().collect().map(_.getString(0)).sorted.toSeq

    var words: Array[(Vector[String], Long)] =
      wfRows.map(r => (r.getString(0).map(_.toString).toVector, r.getLong(1)))
    val merges = Seq.newBuilder[(String, String)]
    var it = 0
    var exhausted = false
    while (it < numMerges && !exhausted) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pc.update(k, pc.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (pc.isEmpty) exhausted = true
      else {
        val best = pc.toSeq.minBy { case ((a, b), n) => (-n, s"$a $b") }._1
        merges += best
        words = words.map { case (syms, f) => (applyMerge(syms, best._1, best._2), f) }
      }
      it += 1
    }
    Trained(alphabet, merges.result())
  }

  /** The double-spaced symbol expansion of normalized text — one
    * leading space, every char followed by two spaces. Word-separating
    * spaces widen to 5-space gaps no merge pattern can span. */
  private def spaced(text: Column): Column =
    concat(lit(" "), regexp_replace(TextAnalysis.normalizeText(text), "(.)", "$1  "))

  /** Scan-side encode: the trained merge chain as literal codegen'd
    * `replace` calls over the double-spaced expansion, then one split.
    * Returns the array of subword tokens (all words, in order). A
    * narrow map — zero shuffle, whole-stage codegen end to end. */
  def encode(text: Column, merges: Seq[(String, String)]): Column = {
    val merged = merges.foldLeft(spaced(text)) { case (s, (a, b)) =>
      replace(s, lit(s" $a  $b "), lit(s" $a$b "))
    }
    split(trim(merged), " +")
  }

  /** Exact BPE token count — `size(encode(...))`. */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(encode(text, merges))

  /** Map a token array to ids via the trained vocabulary (broadcast as
    * a plan literal — the merge table is tiny by construction).
    * Unknown tokens (chars outside the training alphabet) map to -1. */
  def tokenIds(tokens: Column, trained: Trained): Column = {
    val vmap = typedLit(trained.vocab)
    transform(tokens, t => coalesce(element_at(vmap, t), lit(-1)))
  }
}
