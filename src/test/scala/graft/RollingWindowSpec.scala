package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RANGE-frame rolling aggregate: peer (same-day) semantics and frame
  * bounds, hand-computed on a fixture shaped like rolling_revenue_7d. */
class RollingWindowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("7-day RANGE frame includes peers and honors the 6-preceding bound") {
    val rows = Seq(
      (1L, 100L, 1, 10.0),
      (2L, 100L, 2, 20.0),
      (3L, 100L, 2, 5.0),   // same-day peer of order 2
      (4L, 100L, 8, 7.0),   // day 8: frame [2,8] -> includes both day-2 orders
      (5L, 100L, 9, 1.0),   // day 9: frame [3,9] -> day-2 rows age out
      (6L, 200L, 1, 50.0)   // other customer: independent partition
    ).toDF("ok", "cust", "day", "price")
    val w = Window.partitionBy("cust").orderBy("day").rangeBetween(-6, 0)
    val got = rows.select(col("ok"),
        count(lit(1)).over(w).as("n"),
        sum(col("price")).over(w).as("rev"))
      .collect().map(r => (r.getAs[Long]("ok"), (r.getAs[Long]("n"), r.getAs[Double]("rev")))).toMap
    assert(got(1L) == ((1L, 10.0)))
    assert(got(2L) == ((3L, 35.0)), s"peers must aggregate together: ${got(2L)}")
    assert(got(3L) == ((3L, 35.0)), s"peers must see identical frames: ${got(3L)}")
    assert(got(4L) == ((3L, 32.0)), s"day 8 sees days 2..8: ${got(4L)}")
    assert(got(5L) == ((2L, 8.0)), s"day 9 drops day-2 rows: ${got(5L)}")
    assert(got(6L) == ((1L, 50.0)))
  }
}
