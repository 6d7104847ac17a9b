package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.llm.Bpe

/** Distributed pair-heap BPE encode — the production-vocab encoder.
  *
  * The literal-`replace`-chain formulation ([[graft.llm.Bpe.encodeChain]],
  * which the DuckDB oracle replays verbatim) is whole-stage-codegen'd
  * but LINEAR in the merge count M: one full-string replace pass per
  * trained merge, and the generated expression tree grows with M — fine
  * at the gate's M = 20, ~1600× the work (and an un-analyzable plan) at
  * a production 32k-merge vocabulary. This expression runs
  * [[graft.llm.Bpe.heapEncodeText]] instead: O(len · log len) per word
  * regardless of M, with a bounded per-instance word cache (word
  * frequencies are Zipfian, so the hit rate is high). Preference order
  * (b) from the build contract — a native `Expression` where built-in
  * operator composition cannot express the computation at the target
  * scale.
  *
  * Input must already be normalized ([[graft.llm.TextAnalysis
  * .normalizeText]] — single-space separated); [[graft.llm.Bpe.encode]]
  * composes that normalization in front. A narrow map: zero shuffle,
  * scales with input splits.
  *
  * `byteMode` switches the initial symbol split from code points to
  * UTF-8 hex pairs ([[graft.llm.Bpe.hexPairs]]) — the structurally
  * zero-OOV byte-level mode; the heap algorithm is shared.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)],
    byteMode: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val ranks: Bpe.Ranks = Bpe.buildRanks(merges)

  /** Word → token-array memo. Executor-local, shared across the tasks
    * that hold this expression instance; bounded so an adversarial
    * corpus (every word distinct) cannot grow it past ~64k entries.
    * Overflow sheds a RANDOM ~1/8 SLICE (weakly-consistent CHM
    * iteration — hash order, uncorrelated with recency or frequency)
    * instead of clearing: on a high-cardinality corpus a full clear
    * throws away the hot Zipf head every ~64k distinct words and the
    * re-encode burst shows up as periodic throughput cliffs; partial
    * random eviction keeps the expected hit rate flat (a hot word has
    * 7/8 survival odds per shed and re-memoizes on first miss).
    * Concurrent check-then-evict can overshoot by at most one entry
    * per racing task — bounded, unlike the old check-then-clear whose
    * racer could repopulate an already-cleared map unboundedly. */
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  private val CacheMax = 65536

  private def encodeWordCached(w: String): Array[String] = {
    val hit = cache.get(w)
    if (hit != null) hit
    else {
      val toks =
        if (byteMode) Bpe.heapEncodeWordBytes(w, ranks).toArray
        else Bpe.heapEncodeWord(w, ranks).toArray
      if (cache.size() >= CacheMax) {
        val it = cache.keySet().iterator()
        var n = CacheMax / 8
        while (n > 0 && it.hasNext) { it.next(); it.remove(); n -= 1 }
      }
      cache.put(w, toks)
      toks
    }
  }

  override protected def nullSafeEval(input: Any): Any = {
    val norm = input.asInstanceOf[UTF8String].toString
    val out =
      if (norm.isEmpty) Array(UTF8String.EMPTY_UTF8)
      else {
        val b = Array.newBuilder[UTF8String]
        var start = 0
        val len = norm.length
        while (start < len) {
          var end = norm.indexOf(' ', start)
          if (end < 0) end = len
          if (end > start) {
            val toks = encodeWordCached(norm.substring(start, end))
            var t = 0
            while (t < toks.length) { b += UTF8String.fromString(toks(t)); t += 1 }
          }
          start = end + 1
        }
        b.result()
      }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
