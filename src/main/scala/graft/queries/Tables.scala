package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loading + oracle-parity helpers shared by the query catalog. */
object Tables {

  /** Read a driver test table. `events.parquet` carries TIMESTAMP(NANOS),
    * which Spark 4 only reads with the nanosAsLong legacy conf (ts then
    * surfaces as bigint nanos; the DuckDB oracle side uses epoch_ns). */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Order-independent exact sum for double money columns, identical in
    * Spark and DuckDB: cast to decimal (exact integer arithmetic, same
    * result for ANY summation order) then back to double. A plain
    * sum(double) differs between engines in final ulps because each sums
    * in its own order — this would fail the driver's hash compare. */
  def decSum(c: Column, scale: Int = 6): Column =
    toDouble2(sum(c.cast(s"decimal(18,$scale)")))

  /** Final decimal→double conversion, rounded to scale 2 first: with the
    * scaled integer < 2^53 the IEEE conversion is exact in both engines.
    * A direct cast of a scale-12 decimal (scaled value > 2^53) differs by
    * 1 ulp between DuckDB (int128→double then divide) and the JVM
    * (correctly-rounded BigDecimal.doubleValue) — observed on
    * q5_region_revenue at sf0.01. */
  def toDouble2(c: Column): Column = c.cast("decimal(30,2)").cast("double")

  /** Exact revenue term: price * (1 - discount), in decimal. Scales are
    * kept tight (price < 10^9, rates < 10) so that even a further
    * * (1 + tax) factor stays inside precision 38 in BOTH engines —
    * overflowing 38 would trigger engine-specific precision-loss rounding
    * and break the hash compare. */
  def revenueTerm(price: Column, discount: Column): Column =
    price.cast("decimal(15,6)") * (lit(1).cast("decimal(7,6)") - discount.cast("decimal(7,6)"))

  /** One-plus-rate factor with the same tight scale. */
  def onePlus(rate: Column): Column =
    lit(1).cast("decimal(7,6)") + rate.cast("decimal(7,6)")

  /** The same expressions as DuckDB SQL text (for oracle strings). */
  def sqlDecSum(c: String, scale: Int = 6): String =
    sqlToDouble2(s"SUM(CAST($c AS DECIMAL(18,$scale)))")
  /** NOTE: DuckDB's decimal→decimal downcast TRUNCATES (0.125→0.12) while
    * Spark's rounds HALF_UP — the oracle must use explicit ROUND(), which
    * is half-away-from-zero in DuckDB and matches Spark exactly. */
  def sqlToDouble2(expr: String): String =
    s"CAST(CAST(ROUND($expr, 2) AS DECIMAL(30,2)) AS DOUBLE)"
  def sqlRevenueTerm(price: String, discount: String): String =
    s"CAST($price AS DECIMAL(15,6)) * (CAST(1 AS DECIMAL(7,6)) - CAST($discount AS DECIMAL(7,6)))"
  def sqlOnePlus(rate: String): String =
    s"(CAST(1 AS DECIMAL(7,6)) + CAST($rate AS DECIMAL(7,6)))"
}
