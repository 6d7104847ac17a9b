package graft.plumba

import org.apache.spark.sql.types._

/** The reference's kernel type surface (SURVEY §1.3), as the Spark
  * lowering of `_POLARS_DTYPE_TO_NUMPY` (reference
  * src/polars_numba/__init__.py:408–434):
  *
  *  - Boolean → BooleanType; Int8/16/32/64 → Byte/Short/Integer/Long
  *  - UInt8/16/32/64 → widened to Short/Integer/Long/Decimal(20,0)
  *    (Spark has no unsigned ints — the parquet-reader convention;
  *    a deliberate, documented deviation)
  *  - Float16 → FloatType (widened); Float32/64 → Float/Double
  *  - Datetime → TimestampType; Duration → DayTimeIntervalType
  *  - Array(inner, size) → ArrayType(inner, containsNull=false), with
  *    the fixed length enforced by the operator, not the type
  *  - Struct → StructType (input packing only)
  *
  * Strings/decimals/maps/variable-length lists are NOT kernel types in
  * the reference (no NumPy lowering exists — a fold over a string column
  * raises KeyError there). JVM kernels handle them fine, so we accept
  * them as a flagged extension; [[checkKernelTypes]] enforces the strict
  * reference surface when parity matters. */
object Types {

  /** Types the reference can lower into a kernel. */
  def isReferenceKernelType(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
        FloatType | DoubleType | TimestampType | TimestampNTZType => true
    case _: DecimalType => true // the UInt64 widening target
    case _: DayTimeIntervalType => true
    case ArrayType(inner, _) => isReferenceKernelType(inner)
    case s: StructType => s.fields.forall(f => isReferenceKernelType(f.dataType))
    case _ => false
  }

  /** Validate that the selected kernel columns are inside the reference
    * type surface; `extensionOk = true` (default) merely returns the
    * offenders so callers can warn, `false` throws like the reference. */
  def checkKernelTypes(schema: StructType, cols: Seq[String], extensionOk: Boolean = true): Seq[String] = {
    val offenders = cols.filter(c => !isReferenceKernelType(schema(c).dataType))
    if (!extensionOk && offenders.nonEmpty)
      throw new IllegalArgumentException(
        s"columns not in the reference kernel type surface (SURVEY §1.3): ${offenders.mkString(", ")}")
    offenders
  }
}
