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

  /** Driver-side reference encode of one word — the M-pass sequential
    * fold, O(M·len): one [[applyMerge]] pass per trained merge. Kept as
    * the SEMANTIC DEFINITION (it is literally the training loop's
    * application order) and as the differential twin of
    * [[heapEncodeWord]]; production encoding uses the heap encoder,
    * whose cost is independent of M. */
  private[llm] def encodeWord(word: String, merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(word.map(_.toString).toVector) { case (s, (a, b)) => applyMerge(s, a, b) }

  /** pair -> ascending ranks. A pair normally appears once, but an
    * arbitrary merge list may repeat one (two different merges can even
    * emit the same token STRING), so the table keeps every rank and the
    * encoder picks the first rank at-or-after each occurrence's
    * creation time. */
  type Ranks = Map[(String, String), Array[Int]]

  def buildRanks(merges: Seq[(String, String)]): Ranks =
    merges.zipWithIndex.groupBy(_._1)
      .map { case (p, xs) => p -> xs.map(_._2).sorted.toArray }

  /** Pair-heap encode of one word — O(len · log len), INDEPENDENT of
    * the merge count M (the production-vocab regime: at M = 32k the
    * M-pass fold does ~1600× the work of the M = 20 gate; this does the
    * same work at any M). Output is BIT-IDENTICAL to [[encodeWord]]:
    *
    *  - symbols live in a doubly-linked list over the word's code
    *    points; a min-heap orders candidate occurrences by
    *    (rank, position) — exactly "merge list order, left-to-right
    *    non-overlapping within each rank";
    *  - an entry is validated at pop time by comparing its recorded
    *    pair strings against the CURRENT symbols. Symbols only ever
    *    grow (a merge concatenates), and a node's successor changes
    *    only when the node itself merges, so string equality proves
    *    the occurrence is the unchanged one the entry was created for;
    *  - a pair occurrence CREATED while processing rank r is eligible
    *    only for that pair's first rank ≥ r (the creation floor): in
    *    the sequential fold, pass r' < r is already over and never
    *    revisited. (A merge can create an occurrence of an
    *    earlier-rank pair only via token-string collision — rare but
    *    real, and this rule reproduces the fold exactly there too.)
    */
  private[graft] def heapEncodeWord(word: String, ranks: Ranks): Vector[String] = {
    // split on CODE POINTS — the distributed twin's `regexp_replace
    // (., "$1  ")` spacing operates on code points, so a supplementary
    // char is one symbol there; mirror it. (For BMP text this equals
    // the reference fold's per-char split.)
    val cps = word.codePoints().toArray
    val n = cps.length
    if (n == 0) return Vector.empty
    val sym = new Array[String](n)
    var ci = 0
    while (ci < n) { sym(ci) = new String(Character.toChars(cps(ci))); ci += 1 }
    heapEncodeSyms(sym, ranks)
  }

  /** [[heapEncodeWord]] over an ARBITRARY initial symbol sequence —
    * the shared core of the code-point mode (symbols = code points)
    * and the byte mode (symbols = UTF-8 hex pairs, [[hexPairs]]). The
    * algorithm never assumes symbols are single characters; only the
    * initial split differs between modes. */
  private[graft] def heapEncodeSyms(sym: Array[String], ranks: Ranks): Vector[String] = {
    val n = sym.length
    if (n == 0) return Vector.empty
    if (n == 1) return Vector(sym(0))
    val nxt = Array.tabulate(n)(i => if (i + 1 < n) i + 1 else -1)
    val prv = Array.tabulate(n)(i => i - 1)
    val alive = Array.fill(n)(true)
    // entries: (rank, leftPos, leftSym, rightSym); min-heap on (rank, pos)
    val pq = scala.collection.mutable.PriorityQueue.empty[(Int, Int, String, String)](
      Ordering.by[(Int, Int, String, String), (Int, Int)](e => (e._1, e._2)).reverse)
    def push(pos: Int, floor: Int): Unit = {
      val j = nxt(pos)
      if (j >= 0) ranks.get((sym(pos), sym(j))).foreach { arr =>
        var k = 0
        while (k < arr.length && arr(k) < floor) k += 1
        if (k < arr.length) pq.enqueue((arr(k), pos, sym(pos), sym(j)))
      }
    }
    var i = 0
    while (i < n - 1) { push(i, 0); i += 1 }
    while (pq.nonEmpty) {
      val (r, pos, a, b) = pq.dequeue()
      if (alive(pos) && sym(pos) == a) {
        val j = nxt(pos)
        if (j >= 0 && sym(j) == b) {
          sym(pos) = a + b
          alive(j) = false
          val k = nxt(j)
          nxt(pos) = k
          if (k >= 0) prv(k) = pos
          if (prv(pos) >= 0) push(prv(pos), r)
          push(pos, r)
        }
      }
    }
    val out = Vector.newBuilder[String]
    var p = 0
    while (p >= 0) { if (alive(p)) out += sym(p); p = nxt(p) }
    out.result()
  }

  /** Heap-encode a whole NORMALIZED text (single-space separated, as
    * produced by [[TextAnalysis.normalizeText]]): per-word token arrays
    * concatenated in order — the exact output shape of the distributed
    * [[encode]]. Empty text yields `[""]`, matching
    * `split(trim(...), " +")` on an empty string. */
  private[graft] def heapEncodeText(norm: String, ranks: Ranks): Array[String] = {
    if (norm.isEmpty) return Array("")
    val out = Array.newBuilder[String]
    var start = 0
    val len = norm.length
    while (start < len) {
      var end = norm.indexOf(' ', start)
      if (end < 0) end = len
      if (end > start) heapEncodeWord(norm.substring(start, end), ranks).foreach(out += _)
      start = end + 1
    }
    out.result()
  }

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

    val words: Array[(Vector[String], Long)] =
      wfRows.map(r => (r.getString(0).map(_.toString).toVector, r.getLong(1)))
    Trained(alphabet, trainMerges(words, numMerges))
  }

  /** The driver merge loop, INCREMENTAL: pair counts and a pair→words
    * index are maintained across iterations, so merge i re-counts only
    * the words that actually CONTAIN the merged pair — O(affected·len)
    * per merge instead of the naive O(V·len) full recount. At
    * production merge counts (32k) the naive loop is O(V·M·len); this
    * is O(V·len + M·(scan + affected·len)), which is what keeps
    * "training stays driver-sized" true on the vocab axis too.
    * Output is bit-identical to [[trainMergesReference]] (differential
    * in BpeSpec): same exact integer counts, same (-count, "a b")
    * tie-break over the same candidate set. */
  private[graft] def trainMerges(
      words0: Array[(Vector[String], Long)], numMerges: Int): Seq[(String, String)] = {
    val words = words0.clone()
    val pc = scala.collection.mutable.Map.empty[(String, String), Long]
    val occ = scala.collection.mutable.Map.empty[(String, String), scala.collection.mutable.Set[Int]]
    def addWord(wi: Int, sign: Long): Unit = {
      val (syms, f) = words(wi)
      var i = 0
      while (i < syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        val n = pc.getOrElse(k, 0L) + sign * f
        if (n == 0L) pc.remove(k) else pc.update(k, n)
        if (sign > 0) occ.getOrElseUpdate(k, scala.collection.mutable.Set.empty) += wi
        i += 1
      }
      if (sign < 0) {
        var j = 0
        while (j < syms.length - 1) {
          val k = (syms(j), syms(j + 1))
          if (!pc.contains(k)) occ.remove(k)
          j += 1
        }
      }
    }
    // best-pair selection via a lazily-invalidated heap instead of a
    // full pc scan per iteration: every count UPDATE pushes a fresh
    // (count, pair) entry; a popped entry is live only if its count
    // still matches pc — so the first live pop IS the exact
    // (max count, min "a b" string) argmax the reference scan picks,
    // including ties (heap order = count DESC, pair string ASC).
    // At 32k merges the scan-per-iteration alternative is
    // O(M · |pairs|) ≈ 10⁹; this is O(updates · log). Differential
    // with [[trainMergesReference]] in BpeSpec covers the tie cases.
    val heap = scala.collection.mutable.PriorityQueue.empty[(Long, String, (String, String))](
      Ordering.by[(Long, String, (String, String)), (Long, String)](e => (-e._1, e._2)).reverse)
    def pushPc(k: (String, String)): Unit =
      pc.get(k).foreach(n => heap.enqueue((n, s"${k._1} ${k._2}", k)))
    var wi = 0
    while (wi < words.length) { addWord(wi, 1L); wi += 1 }
    pc.keysIterator.foreach(pushPc)
    val merges = Seq.newBuilder[(String, String)]
    var it = 0
    var exhausted = false
    while (it < numMerges && !exhausted) {
      var best: (String, String) = null
      while (best == null && heap.nonEmpty) {
        val (n, _, k) = heap.dequeue()
        if (pc.getOrElse(k, 0L) == n) best = k // live entry
      }
      if (best == null) exhausted = true
      else {
        merges += best
        val affected = occ.getOrElse(best, scala.collection.mutable.Set.empty).toArray
        java.util.Arrays.sort(affected)
        val touched = scala.collection.mutable.Set.empty[(String, String)]
        affected.foreach { w =>
          words(w)._1.sliding(2).foreach { s =>
            if (s.length == 2) touched += ((s(0), s(1))) }
          addWord(w, -1L)
          words(w) = (applyMerge(words(w)._1, best._1, best._2), words(w)._2)
          words(w)._1.sliding(2).foreach { s =>
            if (s.length == 2) touched += ((s(0), s(1))) }
          addWord(w, 1L)
        }
        touched.foreach(pushPc) // refresh heap entries for changed counts
        it += 1
      }
    }
    merges.result()
  }

  /** The naive full-recount merge loop — the SEMANTIC DEFINITION the
    * oracle replays CTE-by-CTE, kept as [[trainMerges]]'s differential
    * twin. */
  private[graft] def trainMergesReference(
      words0: Array[(Vector[String], Long)], numMerges: Int): Seq[(String, String)] = {
    var words = words0
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
    merges.result()
  }

  /** The double-spaced symbol expansion of normalized text — one
    * leading space, every char followed by two spaces. Word-separating
    * spaces widen to 5-space gaps no merge pattern can span. */
  private def spaced(text: Column): Column =
    concat(lit(" "), regexp_replace(TextAnalysis.normalizeText(text), "(.)", "$1  "))

  /** Scan-side encode — the PRODUCTION path: the pair-heap expression
    * ([[graft.functions.BpeEncode]]), O(len·log len) per word
    * independent of the merge count, over the normalized text. Output
    * is bit-identical to [[encodeChain]] (differential-pinned in
    * BpeSpec, and hash-verified end-to-end because the DuckDB oracle
    * still replays the chain formulation). A narrow map — zero
    * shuffle. */
  def encode(text: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.BpeEncode(
      ColumnBridge.expression(TextAnalysis.normalizeText(text)), merges))
  }

  /** The merge chain as literal codegen'd `replace` calls over the
    * double-spaced expansion, then one split — the SEMANTIC DEFINITION
    * the DuckDB oracle replays verbatim (plain `replace` has identical
    * semantics in both engines), kept as [[encode]]'s differential
    * twin. Whole-stage codegen, but both the work and the expression
    * tree grow linearly with M — gate-scale only. */
  def encodeChain(text: Column, merges: Seq[(String, String)]): Column = {
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

  // ---------------------------------------------------------------------
  // DECODE — the inspection/debug direction of a tokenized corpus: token
  // ids back to token strings back to text. The lossless twin of encode:
  // in BYTE mode decode(encode(x)) == x structurally for ANY x (every id
  // resolves, every token is hex pairs of x's own UTF-8 bytes); in
  // code-point mode an id of -1 (a char outside the trained alphabet)
  // NULLs the decode — loud, never a silently-wrong reconstruction.
  // ---------------------------------------------------------------------

  /** id → token, one entry per ASSIGNED id (the exact inverse of the
    * id assignment: alphabet 0..A−1 in sorted order, merge outputs
    * A, A+1, … in training order). Two merges concatenating to the same
    * token string both keep their ids here — [[tokenIds]] only ever
    * emits the min (the [[Trained.vocab]] dedup rule), but any stored
    * id stream that carries the later id still decodes to the same
    * string, which is the correct inverse. */
  def idToToken(trained: Trained): Map[Int, String] =
    (trained.alphabet ++ trained.merges.map { case (a, b) => a + b })
      .zipWithIndex.map { case (tk, id) => id -> tk }.toMap

  /** ids → token strings via the broadcast inverse table; an id with no
    * vocabulary entry (the -1 unknown marker, a corrupted id) maps to
    * NULL. */
  def idsToTokens(ids: Column, trained: Trained): Column = {
    val m = typedLit(idToToken(trained))
    transform(ids, i => element_at(m, i.cast("int")))
  }

  /** Code-point-mode token array → text of ONE word: plain
    * concatenation (every token IS a substring of the word). NULL if
    * any token is null — a partial decode is worse than no decode. */
  def decodeTokens(tokens: Column): Column =
    when(exists(tokens, t => t.isNull), lit(null).cast("string"))
      .otherwise(array_join(tokens, ""))

  /** Byte-mode token array → text of ONE word: tokens are uppercase
    * hex pairs of the word's UTF-8 bytes — concatenate, unhex, decode
    * UTF-8. NULL on any null token. */
  def decodeTokensBytes(tokens: Column): Column =
    when(exists(tokens, t => t.isNull), lit(null).cast("string"))
      .otherwise(decode(unhex(array_join(tokens, "")), "UTF-8"))

  /** Full id round trip for one word, code-point mode:
    * `decodeIds(tokenIds(encode(w)))` reconstructs w (or NULL on any
    * unknown id). */
  def decodeIds(ids: Column, trained: Trained): Column =
    decodeTokens(idsToTokens(ids, trained))

  /** Byte-mode twin of [[decodeIds]]. */
  def decodeIdsBytes(ids: Column, trained: Trained): Column =
    decodeTokensBytes(idsToTokens(ids, trained))

  /** The byte-mode merge-output id table: merge j's token takes id
    * 256 + j unless an earlier merge already produced the same string
    * (the min-id dedup rule). Tiny by construction (≤ NumMerges). */
  private def mergeIdsBytes(trained: Trained): Map[String, Int] =
    trained.merges.map { case (a, b) => a + b }.zipWithIndex
      .foldLeft(Map.empty[String, Int]) { case (m, (tk, j)) =>
        if (m.contains(tk)) m else m.updated(tk, 256 + j)
      }

  /** BYTE-MODE [[tokenIds]] exploiting the structural alphabet:
    * `element_at` on a literal map is a LINEAR scan per lookup
    * (measured: the 276-entry map made an id round-trip gate 6×
    * slower than this form), but a 2-hex-char token IS its byte value
    * (`conv(t, 16, 10)`) and only merge outputs (≥ 4 chars, ≤
    * NumMerges of them) need a table. Same results as [[tokenIds]]
    * on any byte-mode token stream — differential-pinned in
    * BpeDecodeSpec. */
  def tokenIdsBytes(tokens: Column, trained: Trained): Column = {
    val mlit = typedLit(mergeIdsBytes(trained))
    transform(tokens, t =>
      when(length(t) === 2, conv(t, 16, 10).cast("int"))
        .otherwise(coalesce(element_at(mlit, t), lit(-1))))
  }

  /** BYTE-MODE [[idsToTokens]], the structural inverse: ids 0..255
    * format as their own uppercase hex pair; merge ids read the tiny
    * inverse table (EVERY assigned merge id decodes — duplicate-token
    * later ids included, matching [[idToToken]]); anything else (the
    * -1 unknown marker) is NULL. */
  def idsToTokensBytes(ids: Column, trained: Trained): Column = {
    val inv = typedLit(trained.merges.map { case (a, b) => a + b }
      .zipWithIndex.map { case (tk, j) => (256 + j) -> tk }.toMap)
    transform(ids, i =>
      when(i.between(0, 255), lpad(upper(hex(i.cast("long"))), 2, "0"))
        .otherwise(element_at(inv, i.cast("int"))))
  }

  // ---------------------------------------------------------------------
  // BYTE-LEVEL mode (GPT-2 convention): the initial alphabet is the 256
  // possible BYTES of the word's UTF-8 encoding, so zero-OOV is
  // STRUCTURAL — any text whatsoever, hostile unicode included, decomposes
  // into alphabet symbols, and `tokenIds` can never emit -1. Characters
  // the training corpus never saw (emoji, CJK, combining marks) encode as
  // their byte pairs instead of falling out of the vocabulary. Bytes are
  // REPRESENTED as uppercase hex pairs — the one byte spelling that is
  // exactly portable between engines (`hex()` of UTF-8 text is identical
  // in Spark and DuckDB), playing the role of GPT-2's printable
  // byte-to-unicode table. Everything else — the incremental heap
  // trainer, the pair-heap encoder, the replace-chain oracle form — is
  // the SAME code as code-point mode; only the initial symbol split
  // differs.
  // ---------------------------------------------------------------------

  /** UTF-8 bytes of a word as uppercase hex pairs — the byte-mode
    * initial symbol split. Matches `hex(w)` in both engines pair for
    * pair. */
  private[graft] def hexPairs(word: String): Array[String] = {
    val bs = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[String](bs.length)
    var i = 0
    while (i < bs.length) { out(i) = f"${bs(i) & 0xff}%02X"; i += 1 }
    out
  }

  /** The structural byte alphabet: all 256 hex pairs, ids 0..255 = the
    * byte value (uppercase hex sorts lexicographically in byte order,
    * so the generic sorted-alphabet id rule lands on exactly this). */
  val ByteAlphabet: Seq[String] = (0 until 256).map(b => f"$b%02X")

  private[graft] def heapEncodeWordBytes(word: String, ranks: Ranks): Vector[String] =
    heapEncodeSyms(hexPairs(word), ranks)

  /** Byte-mode training: the SAME bounded word-frequency collect and
    * incremental driver merge loop as [[train]] — the words just enter
    * as hex-pair vectors and the alphabet is [[ByteAlphabet]] (fixed,
    * nothing to collect: byte coverage does not depend on the corpus,
    * which is the entire point). */
  def trainBytes(
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
    val words: Array[(Vector[String], Long)] =
      wfRows.map(r => (hexPairs(r.getString(0)).toVector, r.getLong(1)))
    Trained(ByteAlphabet, trainMerges(words, numMerges))
  }

  /** The double-spaced HEX expansion of normalized text: each word's
    * UTF-8 bytes as hex pairs with two spaces after each pair, words
    * joined by a 3-space gap no ` a  b ` merge pattern can span
    * (patterns carry exactly two inner spaces). The byte-mode twin of
    * [[spaced]]; `hex()` + this regex replay identically in DuckDB. */
  private def spacedBytes(text: Column): Column = {
    val hexText = array_join(
      transform(split(TextAnalysis.normalizeText(text), " "), w => hex(w)), " ")
    concat(lit(" "), regexp_replace(hexText, "([0-9A-F]{2})", "$1  "))
  }

  /** Byte-mode scan-side encode — pair-heap expression over hex-pair
    * initial symbols; bit-identical to [[encodeChainBytes]]
    * (differential in BpeSpec; the DuckDB oracle replays the chain). */
  def encodeBytes(text: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.BpeEncode(
      ColumnBridge.expression(TextAnalysis.normalizeText(text)), merges, byteMode = true))
  }

  /** [[encodeBytes]] over text that is ALREADY normalized — a
    * per-word caller (decode round trips segment first) otherwise
    * pays the two-regex normalization once per WORD instead of once
    * per doc. Identical results on normalized input (normalization is
    * idempotent); this just skips re-proving it 60× per row. */
  def encodeBytesPreNormalized(normText: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.BpeEncode(
      ColumnBridge.expression(normText), merges, byteMode = true))
  }

  /** Byte-mode literal replace-chain — the SEMANTIC DEFINITION the
    * DuckDB oracle replays, kept as [[encodeBytes]]'s differential
    * twin (gate-scale only, like [[encodeChain]]). */
  def encodeChainBytes(text: Column, merges: Seq[(String, String)]): Column = {
    val merged = merges.foldLeft(spacedBytes(text)) { case (s, (a, b)) =>
      replace(s, lit(s" $a  $b "), lit(s" $a$b "))
    }
    split(trim(merged), " +")
  }
}
