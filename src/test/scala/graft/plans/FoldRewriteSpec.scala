package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.plumba.ExprOps

class FoldRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df = Seq(
    ("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0),
    ("b", 1, 5.0), ("b", 2, 7.5)
  ).toDF("k", "ord", "v")

  private def sumFold = ExprOps.foldCol(
    Seq(col("ord")), Seq(col("v")), lit(100.0),
    (acc, x) => acc + x.getField(ExprOps.v(0)))

  private def balanceFold = ExprOps.foldCol(
    Seq(col("ord")), Seq(col("v")), lit(0.0),
    (acc, x) => when(acc + x.getField(ExprOps.v(0)) <= 25.0,
      acc + x.getField(ExprOps.v(0))).otherwise(acc))

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ FoldToNativeAgg
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == FoldToNativeAgg)
  }

  test("sum-shaped foldCol is rewritten to a native Sum (collect_list gone)") {
    withRule {
      val q = df.groupBy("k").agg(sumFold.as("f"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("collect_list"), optimized)
      assert(optimized.contains("sum("), optimized)
      val got = q.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == Map("a" -> 160.0, "b" -> 112.5))
    }
  }

  test("rewritten plan result == unrewritten result") {
    val base = df.groupBy("k").agg(sumFold.as("f"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val opt = withRule {
      df.groupBy("k").agg(sumFold.as("f"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    }
    assert(base == opt)
  }

  test("conditional (non-associative) foldCol is NOT rewritten") {
    withRule {
      val q = df.groupBy("k").agg(balanceFold.as("f"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("collect_list"), optimized)
      // and still computes the ordered balance correctly: a: 10 then
      // reject 20 (30>25), reject 30 -> 10; b: 5 then reject 7.5? 12.5<=25 ok -> 12.5
      val got = q.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == Map("a" -> 10.0, "b" -> 12.5))
    }
  }

  test("max-shaped foldCol (greatest step) is rewritten to native Max") {
    val maxFold = ExprOps.foldCol(
      Seq(col("ord")), Seq(col("v")), lit(-1.0),
      (acc, x) => greatest(acc, x.getField(ExprOps.v(0))))
    withRule {
      val q = df.groupBy("k").agg(maxFold.as("f"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("collect_list"), optimized)
      assert(optimized.contains("max("), optimized)
      val got = q.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == Map("a" -> 30.0, "b" -> 7.5))
    }
  }

  test("min-shaped foldCol (least step) is rewritten to native Min") {
    val minFold = ExprOps.foldCol(
      Seq(col("ord")), Seq(col("v")), lit(1e9),
      (acc, x) => least(acc, x.getField(ExprOps.v(0))))
    withRule {
      val q = df.groupBy("k").agg(minFold.as("f"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("collect_list"), optimized)
      assert(optimized.contains("min("), optimized)
      val got = q.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == Map("a" -> 10.0, "b" -> 5.0))
    }
  }

  test("multi-value-column fold summing ONE field is NOT rewritten (null-drop guard covers both)") {
    // the fold drops a row when ANY selected column is null; Sum(v) alone
    // would keep a row whose OTHER column is null — the rule must not fire.
    val twoColFold = ExprOps.foldCol(
      Seq(col("ord")), Seq(col("v"), col("w")), lit(0.0),
      (acc, x) => acc + x.getField(ExprOps.v(0)))
    withRule {
      val df2 = Seq(("a", 1, 10.0, Some(1.0)), ("a", 2, 20.0, None), ("b", 1, 5.0, Some(2.0)))
        .toDF("k", "ord", "v", "w")
      val q = df2.groupBy("k").agg(twoColFold.as("f"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("collect_list"), optimized)
      // ("a", 2, 20.0, null) is dropped by the fold; a Sum rewrite keeps it
      val got = q.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == Map("a" -> 10.0, "b" -> 5.0))
    }
  }

  test("integer-typed sum fold rewrites with Sum cast back to the field type") {
    // Sum(int) returns long; post-analysis no implicit cast is inserted,
    // so the rule must cast back or the rewritten Add(int, long) explodes
    // at runtime.
    val intFold = ExprOps.foldCol(
      Seq(col("ord")), Seq(col("n")), lit(7),
      (acc, x) => acc + x.getField(ExprOps.v(0)))
    withRule {
      val df3 = Seq(("a", 1, 10), ("a", 2, 20), ("b", 1, 5)).toDF("k", "ord", "n")
      val q = df3.groupBy("k").agg(intFold.as("f"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("collect_list"), optimized)
      val got = q.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(got == Map("a" -> 37, "b" -> 12))
    }
  }

  test("UNGUARDED sum over a NULLABLE field is NOT rewritten (null poisons the fold; Sum skips)") {
    // hand-built aggregate without foldCol's null-drop guard: the fold
    // computes Add(acc, null) -> NULL, native Sum would skip the null —
    // a semantics change the rule must refuse.
    def handFold(c: org.apache.spark.sql.Column) = aggregate(
      array_sort(collect_list(struct(col("ord").as("o0"), c.as("v0")))),
      lit(0.0), (acc, x) => acc + x.getField("v0"))
    withRule {
      val nullable = Seq(("a", 1, Some(10.0)), ("a", 2, None), ("b", 1, Some(5.0)))
        .toDF("k", "ord", "v")
      val q = nullable.groupBy("k").agg(handFold(col("v")).as("f"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("collect_list"), optimized)
      val got = q.collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
      assert(got == Map("a" -> None, "b" -> Some(5.0)), got.toString)
      // the same unguarded shape over a NON-nullable field still rewrites
      val q2 = df.groupBy("k").agg(handFold(col("v")).as("f"))
      val opt2 = q2.queryExecution.optimizedPlan.toString
      assert(!opt2.contains("collect_list"), opt2)
      val got2 = q2.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got2 == Map("a" -> 60.0, "b" -> 12.5))
    }
  }

  test("empty-group behavior preserved: sum-rewrite yields zero via coalesce") {
    withRule {
      // all values null in the fold columns -> collect_list drops all ->
      // fold over nothing = init; rewritten: init + coalesce(sum, 0)
      val nulls = Seq(("a", 1, null.asInstanceOf[java.lang.Double]))
        .toDF("k", "ord", "v")
      val q = nulls.groupBy("k").agg(sumFold.as("f"))
      val got = q.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == Map("a" -> 100.0))
    }
  }
}
