package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hash-sketch hot paths.
  *
  * Rationale (measured, sf0.1 documents = 5k docs × ~52 shingles):
  * the higher-order-function formulation (`transform(sequence(0,k-1),
  * seed -> array_min(transform(hashes, h -> xxhash64(seed, h))))`)
  * evaluates interpreted lambdas AND re-evaluates the inner array
  * expression once per seed — 86 s for what is ~8M hash calls. These
  * expressions do the same work as one compiled loop per row (< 1 s).
  * This is preference order (b) from the build contract: a native
  * `Expression` where the built-in operator composition genuinely cannot
  * express the computation efficiently.
  *
  * `CodegenFallback` is deliberate: the eval body is a tight compiled
  * Scala loop over `ArrayData`, and these sit in a projection beside
  * codegen'd neighbors; fusing them into generated Java would save only
  * the per-row call overhead.
  */

/** Word n-gram shingle set → 64-bit hash per distinct shingle.
  * Input: array<string> words (e.g. `split(lower(text), " +")`).
  * Output: array<bigint>, one xxhash64 per distinct n-gram. */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val len = words.numElements()
    val nShingles = math.max(len - n + 1, 1)
    val seen = new java.util.HashSet[Long](nShingles * 2)
    val out = new Array[Long](nShingles)
    var outLen = 0
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nShingles) {
      sb.setLength(0)
      var j = 0
      while (j < n && i + j < len) {
        if (j > 0) sb.append(' ')
        val w = words.getUTF8String(i + j)
        if (w != null) sb.append(w.toString)
        j += 1
      }
      val h = XxHash64Function.hash(UTF8String.fromString(sb.toString), StringType, 42L)
      if (seen.add(h)) { out(outLen) = h; outLen += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, outLen))
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes = copy(child = newChild)
}

/** MinHash signature from pre-hashed shingles: for each of k seeds, the
  * minimum seeded remix of the input hashes. One compiled pass:
  * W elements × k seeds. Empty input → signature of Long.MaxValue. */
case class MinHashFromHashes(child: Expression, k: Int) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any = {
    val hashes = input.asInstanceOf[ArrayData]
    val len = hashes.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < len) {
      val h = hashes.getLong(i)
      var s = 0
      while (s < k) {
        val m = XxHash64Function.hash(h, LongType, s.toLong)
        if (m < sig(s)) sig(s) = m
        s += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashFromHashes = copy(child = newChild)
}

/** 64-bit SimHash from a words array: per-word xxhash64, majority vote
  * per bit. One compiled pass: W × 64 bit tests. */
case class SimHash64Expr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val len = words.numElements()
    val counts = new Array[Int](64)
    var i = 0
    var n = 0
    while (i < len) {
      val w = words.getUTF8String(i)
      if (w != null) {
        val h = XxHash64Function.hash(w, StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1
          b += 1
        }
        n += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2 > n) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr = copy(child = newChild)
}

object HashFunctions {
  private def expr(c: Column): Expression = ColumnBridge.expression(c)

  def shingleHashes(words: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(expr(words), n))

  def minHashSignature(hashes: Column, k: Int): Column =
    ColumnBridge.column(MinHashFromHashes(expr(hashes), k))

  def simHash64(words: Column): Column =
    ColumnBridge.column(SimHash64Expr(expr(words)))
}
