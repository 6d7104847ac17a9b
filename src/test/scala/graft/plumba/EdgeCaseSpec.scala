package graft.plumba

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.plumba.Kernel._
import graft.plumba.syntax._

/** Edge semantics through the full Spark paths: empty frames, all-null
  * frames, single rows. */
class EdgeCaseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("idx", IntegerType), StructField("a", LongType)))

  private def frame(rows: Seq[Row], parts: Int = 2) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, parts), schema)

  private val sumK = Fold[Double](0.5, (acc, args) => acc + args(0).asInstanceOf[Long])
  private val sumKM = sumK.copy(merge = Some(Merge(0.0, (a: Double, b: Double) => a + b)))

  test("collectFold over an empty frame returns init (both paths)") {
    val empty = frame(Seq.empty)
    assert(empty.collectFold(Seq("a"), Seq("idx"), sumK) == 0.5)
    assert(empty.collectFold(Seq("a"), Seq("idx"), sumKM) == 0.5)
  }

  test("collectFold over an all-null frame returns init (null-drop policy)") {
    val nulls = frame(Seq(Row(1, null), Row(2, null)))
    assert(nulls.collectFold(Seq("a"), Seq("idx"), sumK) == 0.5)
    assert(nulls.collectFold(Seq("a"), Seq("idx"), sumKM) == 0.5)
  }

  test("collectScan over an empty frame returns an empty result") {
    val empty = frame(Seq.empty)
    val scanned = empty.collectScan(Seq("a"), Seq("idx"),
      Scan[Double](0.0, (acc, args) => acc + args(0).asInstanceOf[Long]), DoubleType)
    assert(scanned.count() == 0)
  }

  test("collectScanMergeable over an empty frame returns an empty result") {
    val empty = frame(Seq.empty)
    val scanned = CollectOps.collectScanMergeable(empty, Seq("a"), Seq("idx"),
      Scan.of1[Double, Long](0.0)((acc, x) => acc + x),
      Merge(0.0, (a: Double, b: Double) => a + b), DoubleType)
    assert(scanned.count() == 0)
  }

  test("groupFold: group whose rows are all null-dropped still emits init-folded state") {
    val mixed = frame(Seq(Row(1, 10L), Row(2, null), Row(3, null)))
      .withColumnRenamed("idx", "idx") // keep schema
    val withKey = mixed.withColumn("k", org.apache.spark.sql.functions.expr("idx % 2"))
    val got = withKey.groupFold(Seq("k"), Seq("a"), Seq("idx"), sumK, DoubleType)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // k=1: rows idx 1 (10) and idx 3 (null->dropped) => 10.5
    // k=0: row idx 2 (null->dropped) => bare init 0.5
    assert(got == Map(1 -> 10.5, 0 -> 0.5))
  }

  test("single-row frame: fold == init step once; scan emits one value") {
    val one = frame(Seq(Row(1, 7L)), parts = 1)
    assert(one.collectFold(Seq("a"), Seq("idx"), sumK) == 7.5)
    val s = one.collectScan(Seq("a"), Seq("idx"),
      Scan.of1[Double, Long](0.5)((acc, x) => acc + x), DoubleType)
    assert(s.collect().map(_.getDouble(1)).toSeq == Seq(7.5))
  }
}
