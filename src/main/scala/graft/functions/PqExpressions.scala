package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Product-quantization (PQ) kernels — the memory path for ANN at scale:
  * a D-dim vector is split into `M` subvectors, each snapped to its
  * nearest codebook centroid, so the corpus representation shrinks from
  * `4·D` bytes to `M` small codes and the candidate scoring never touches
  * raw corpus vectors again (asymmetric distance: per-query lookup table
  * indexed by code). Mirrors the IVF/PQ design of FAISS-style engines
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011) re-expressed as narrow Spark expressions.
  *
  * All arithmetic runs on INTEGER-quantized values (`floor(x·1000)`,
  * the same rule as [[QuantizedHyperplaneSigExpr]]): subspace distances
  * are exact BIGINT sums with no float-summation-order hazard, so the
  * encode → LUT → ADC pipeline is replayable bit-for-bit in a second
  * engine — argmin ties resolve to the LOWEST centroid id on both sides.
  *
  * The codebook is a plan-time parameter (`Seq` for structural equality
  * under Catalyst canonicalization), broadcast to executors inside the
  * serialized expression — KBs, the PQ analogue of a broadcast dim. */
private object PqCodebook {
  /** codebook(m)(c)(j): quantized j-th component of centroid c of
    * subspace m. Validated rectangular at construction. */
  def toArrays(cb: Seq[Seq[Seq[Long]]]): Array[Array[Array[Long]]] = {
    require(cb.nonEmpty && cb.head.nonEmpty && cb.head.head.nonEmpty,
      "PQ codebook must have >= 1 subspace, centroid, and dimension")
    val nCent = cb.head.length
    val subDim = cb.head.head.length
    require(cb.forall(m => m.length == nCent && m.forall(_.length == subDim)),
      "PQ codebook must be rectangular: same centroid count and subspace dim everywhere")
    cb.map(_.map(_.toArray).toArray).toArray
  }

  def quantize(vec: ArrayData, isFloat: Boolean): Array[Long] = {
    val n = vec.numElements()
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      q(i) = math.floor(VecRead.get(vec, i, isFloat) * 1000.0).toLong
      i += 1
    }
    q
  }

  /** Exact integer squared L2 between a quantized subvector of `q`
    * starting at `off` and centroid row `cent`. */
  def subDist(q: Array[Long], off: Int, cent: Array[Long]): Long = {
    var d = 0L
    var j = 0
    while (j < cent.length) {
      val diff = q(off + j) - cent(j)
      d += diff * diff
      j += 1
    }
    d
  }
}

/** PQ encode: vector → `M` centroid codes (argmin subspace distance,
  * ties to the lowest centroid id). One narrow compiled loop per row —
  * O(M · K · D/M) = O(K·D). */
case class PqEncodeExpr(child: Expression, codebook: Seq[Seq[Seq[Long]]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  @transient private lazy val cb = PqCodebook.toArrays(codebook)
  private lazy val isFloat = VecRead.isFloatArray(child.dataType)

  // the codebook literal is KBs — keep it out of explain/UI strings
  override def toString: String =
    s"pq_encode($child, codebook[${codebook.length}x${codebook.head.length}x${codebook.head.head.length}])"

  override protected def nullSafeEval(input: Any): Any = {
    val q = PqCodebook.quantize(input.asInstanceOf[ArrayData], isFloat)
    val nSub = cb.length
    val subDim = cb(0)(0).length
    require(q.length == nSub * subDim,
      s"vector dim ${q.length} != codebook ${nSub}x$subDim")
    val codes = new Array[Int](nSub)
    var m = 0
    while (m < nSub) {
      val cents = cb(m)
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < cents.length) {
        val d = PqCodebook.subDist(q, m * subDim, cents(c))
        if (d < bestD) { bestD = d; best = c } // strict < == lowest-id tie-break
        c += 1
      }
      codes(m) = best
      m += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** Per-query ADC lookup table: `lut(m)(c)` = exact integer subspace
  * distance from the query's m-th subvector to centroid c. Computed
  * ONCE per query row (the broadcast side), so scoring a candidate is
  * `M` array lookups regardless of K or D. */
case class PqLutExpr(child: Expression, codebook: Seq[Seq[Seq[Long]]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_lut"

  @transient private lazy val cb = PqCodebook.toArrays(codebook)
  private lazy val isFloat = VecRead.isFloatArray(child.dataType)

  // the codebook literal is KBs — keep it out of explain/UI strings
  override def toString: String =
    s"pq_lut($child, codebook[${codebook.length}x${codebook.head.length}x${codebook.head.head.length}])"

  override protected def nullSafeEval(input: Any): Any = {
    val q = PqCodebook.quantize(input.asInstanceOf[ArrayData], isFloat)
    val nSub = cb.length
    val subDim = cb(0)(0).length
    require(q.length == nSub * subDim,
      s"vector dim ${q.length} != codebook ${nSub}x$subDim")
    val rows = new Array[Any](nSub)
    var m = 0
    while (m < nSub) {
      val cents = cb(m)
      val lut = new Array[Long](cents.length)
      var c = 0
      while (c < cents.length) {
        lut(c) = PqCodebook.subDist(q, m * subDim, cents(c))
        c += 1
      }
      rows(m) = new GenericArrayData(lut)
      m += 1
    }
    new GenericArrayData(rows)
  }

  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
}

/** Asymmetric distance: `sum_m lut(m)(codes(m))` — the PQ candidate
  * score, `M` lookups per (query, candidate) pair. */
case class PqAdcExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(codesAny: Any, lutAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val lut = lutAny.asInstanceOf[ArrayData]
    val nSub = codes.numElements()
    var s = 0L
    var m = 0
    while (m < nSub) {
      s += lut.getArray(m).getLong(codes.getInt(m))
      m += 1
    }
    s
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)
}

object PqFunctions {
  def pqEncode(vec: Column, codebook: Seq[Seq[Seq[Long]]]): Column =
    ColumnBridge.column(PqEncodeExpr(ColumnBridge.expression(vec), codebook))

  def pqLut(vec: Column, codebook: Seq[Seq[Seq[Long]]]): Column =
    ColumnBridge.column(PqLutExpr(ColumnBridge.expression(vec), codebook))

  def pqAdc(codes: Column, lut: Column): Column =
    ColumnBridge.column(PqAdcExpr(ColumnBridge.expression(codes), ColumnBridge.expression(lut)))
}
