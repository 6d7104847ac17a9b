package graft.llm

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** UNIGRAM-LM (SentencePiece-style) tokenizer trainer — the EM-trained
  * alternative to BPE (Kudo 2018: candidate pieces scored by a unigram
  * language model, words segmented by Viterbi, piece scores
  * re-estimated from the segmentations, low-value pieces pruned), so
  * tokenizer-comparison studies (unigram vs BPE fertility per domain)
  * can run in-engine against the [[Bpe]] artifact.
  *
  * ENGINE-PORTABLE by the same trade the rest of the library makes:
  * real SentencePiece maximizes Σ log p(piece) in floats; logs are
  * transcendental and their libm rounding is not replayable across
  * engines, so this trainer quantizes each piece's log-probability to
  * the INTEGER `floor(log2 c(piece)) − floor(log2 Σc)` (the library's
  * bit-length convention, `length(bin(c)) − 1` in the oracle) and runs
  * HARD EM (Viterbi counts, the k-means-style E step) instead of the
  * soft forward–backward. Every count, score, DP value and tie-break
  * is exact integer arithmetic — the DuckDB oracle replays the entire
  * training loop and every segmentation bit-for-bit.
  *
  * Determinism contract (mirrored exactly by the oracle's CTEs):
  *  - candidate init: every substring of length 1..[[MaxPieceLen]] of
  *    the top-[[VocabWords]] words, occurrence-weighted by word
  *    frequency; keep the top-[[KeepPieces]] multi-char candidates by
  *    (count DESC, piece ASC) plus EVERY corpus alphabet char (count
  *    floored to 1 — full coverage by construction, the reason Viterbi
  *    is total);
  *  - Viterbi: maximize Σ score(piece); ties prefer the LONGER last
  *    piece at each position (the DP scans L = max..1 and keeps the
  *    first strict improvement);
  *  - M step: piece count = Viterbi-usage weighted by word frequency;
  *    multi-char pieces with zero usage DROP (the prune), alphabet
  *    chars floor at count 1 (coverage is never pruned).
  *
  * Scale shape — the [[Bpe.train]] contract: training is two bounded
  * collects (top-V word frequencies, the distinct alphabet) plus a
  * driver loop over V words; APPLICATION ([[pieceCounts]] /
  * [[segmentArr]]) is a narrow scan with the vocab-sized score table
  * in the closure — no shuffle, no vocabulary-sized state beyond the
  * artifact. At 100 TB the word-count aggregate is the only corpus
  * pass, identical to BPE's. */
object Unigram {

  /** Training-vocabulary bound: the top-V words by frequency. */
  val VocabWords = 300

  /** Longest candidate piece. */
  val MaxPieceLen = 4

  /** Multi-char candidate pieces kept at init (the prune budget). */
  val KeepPieces = 120

  /** Hard-EM rounds (fixed and unrolled in the oracle). */
  val EmRounds = 2

  /** A trained unigram tokenizer: final piece counts and their total.
    * Scores derive from the counts (floor-log2 rule), so the artifact
    * is pure integers. */
  final case class Trained(counts: Map[String, Long]) {
    lazy val total: Long = counts.valuesIterator.sum
    /** piece -> integer score `floor(log2 c) − floor(log2 total)`. */
    lazy val scores: Map[String, Int] = {
      val b = bitLen(total) - 1
      counts.map { case (p, c) => p -> (bitLen(c) - 1 - b) }
    }
  }

  /** floor(log2 x) + 1 for x ≥ 1 — `length(bin(x))` in the oracle. */
  private def bitLen(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)

  /** Viterbi segmentation of one word under integer piece scores.
    * Total whenever every single char of `w` scores (the coverage
    * floor guarantees it for corpus text); unscored chars fall back to
    * a single-char piece with a MILD penalty (−1,000,000 — far below
    * any real score so scored pieces always win, but the DP runs in
    * Long so any NUMBER of OOV chars stays strictly above NegInf and
    * the path remains total: OOV text degrades to characters instead
    * of crashing, mirroring SentencePiece's byte-fallback spirit; the
    * earlier Int.MinValue/4 sentinel summed to exactly NegInf at two
    * OOV chars and looped the backward walk). Ties prefer the longer
    * last piece. Gate corpora never hit the fallback — the alphabet
    * floor scores every corpus char — so the oracle is unaffected. */
  private[llm] def viterbi(w: String, score: Map[String, Int]): Vector[String] = {
    val n = w.length
    if (n == 0) return Vector.empty
    val NegInf = Long.MinValue / 2
    val Fallback = -1000000L
    val dp = Array.fill(n + 1)(NegInf)
    val bp = new Array[Int](n + 1)
    dp(0) = 0L
    var i = 1
    while (i <= n) {
      var L = math.min(MaxPieceLen, i)
      while (L >= 1) {
        val s0: Long = score.get(w.substring(i - L, i)) match {
          case Some(s) => s.toLong
          case None => if (L == 1) Fallback else NegInf
        }
        if (s0 > NegInf && dp(i - L) > NegInf) {
          val cand = dp(i - L) + s0
          if (cand > dp(i)) { dp(i) = cand; bp(i) = L }
        }
        L -= 1
      }
      i += 1
    }
    var out = List.empty[String]
    var j = n
    while (j > 0) {
      // bp(j) == 0 is unreachable (the L==1 fallback always scores),
      // but guard the walk so a future scoring change can never hang.
      val step = math.max(bp(j), 1)
      out = w.substring(j - step, j) :: out
      j -= step
    }
    out.toVector
  }

  /** Train on the corpus: two bounded collects (the [[Bpe.train]]
    * shape) then the driver EM loop. */
  def train(
      df: DataFrame,
      textCol: String,
      vocabWords: Int = VocabWords,
      keepPieces: Int = KeepPieces,
      emRounds: Int = EmRounds): Trained = {
    val norm = TextAnalysis.normalizeText(col(textCol))
    val words: Array[(String, Long)] = df
      .select(explode(split(norm, " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(desc("f"), asc("w")).limit(vocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val alphabet: Seq[String] = df.select(explode(split(norm, "")).as("c"))
      .filter(length(col("c")) > 0 && col("c") =!= " ")
      .distinct().collect().map(_.getString(0)).sorted.toSeq

    // candidate init: occurrence-weighted substring counts
    val c0 = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for {
      (w, f) <- words
      len <- 1 to MaxPieceLen
      i <- 0 to w.length - len
    } c0(w.substring(i, i + len)) += f
    val multi = c0.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(keepPieces)
    var counts: Map[String, Long] =
      (alphabet.map(ch => ch -> math.max(c0(ch), 1L)) ++ multi).toMap

    var r = 0
    while (r < emRounds) {
      val sc = Trained(counts).scores
      val used = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((w, f) <- words; p <- viterbi(w, sc)) used(p) += f
      counts = counts.flatMap { case (p, _) =>
        val u = used(p)
        if (p.length == 1) Some(p -> math.max(u, 1L))
        else if (u > 0) Some(p -> u)
        else None
      }
      r += 1
    }
    Trained(counts)
  }

  /** Append the Viterbi PIECE COUNT over the space-split words of the
    * (pre-normalized) `textCol` — the fertility numerator. Narrow
    * mapPartitions carrying every input column through; the score map
    * is vocab-sized closure state. */
  def pieceCounts(df: DataFrame, textCol: String, trained: Trained,
      out: String = "n_pieces"): DataFrame = {
    val sc = trained.scores
    val idx = df.schema.fieldNames.indexOf(textCol)
    require(idx >= 0, s"column $textCol not found")
    val outSchema = StructType(df.schema.fields :+ StructField(out, LongType, nullable = false))
    df.mapPartitions { it =>
      it.map { r =>
        val t = r.getString(idx)
        var n = 0L
        if (t != null) {
          val ws = t.split(" ", -1)
          var i = 0
          while (i < ws.length) { n += viterbi(ws(i), sc).length; i += 1 }
        }
        Row.fromSeq(r.toSeq :+ n)
      }
    }(Encoders.row(outSchema))
  }

  /** Append the FULL SEGMENTATION — per doc, every word's Viterbi
    * pieces joined with `/` inside a word and ` ` between words (both
    * characters survive [[TextAnalysis.normalizeText]], so the
    * rendering is unambiguous for normalized input) — the
    * application-side twin of [[pieceCounts]] that pins the exact
    * piece BOUNDARIES, not just their count. Same narrow shape. */
  def segmentation(df: DataFrame, textCol: String, trained: Trained,
      out: String = "segmented"): DataFrame = {
    val sc = trained.scores
    val idx = df.schema.fieldNames.indexOf(textCol)
    require(idx >= 0, s"column $textCol not found")
    val outSchema = StructType(df.schema.fields :+ StructField(out, StringType))
    df.mapPartitions { it =>
      it.map { r =>
        val t = r.getString(idx)
        val seg =
          if (t == null) null
          else t.split(" ", -1).iterator
            .map(w => viterbi(w, sc).mkString("/")).mkString(" ")
        Row.fromSeq(r.toSeq :+ seg)
      }
    }(Encoders.row(outSchema))
  }
}
