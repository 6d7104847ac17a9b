package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Similarity.kCenterSelect]] — greedy farthest-point selection.
  * The main test replays the full trajectory (md5 seed rule, quantized
  * BIGINT L2, id tie-breaks) in plain Scala and asserts the exact
  * selection ORDER and distances; the blob fixture checks the
  * semantics the operator exists for (one pick per well-separated
  * region before any within-region pick). */
class KCenterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def quant(v: Array[Float]): Array[Long] =
    v.map(x => math.floor(x.toDouble * 1000.0).toLong)

  private def d2(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  /** Independent greedy replay: seed = smallest (md5(id), id); each
    * round argmax of min-dist2 to the selected set, (d desc, id asc). */
  private def replay(rows: Seq[(Long, Array[Float])], k: Int): Seq[(Int, Long, Option[Long])] = {
    val qs = rows.map { case (id, v) => id -> quant(v) }.toMap
    val seed = rows.map(_._1).minBy(id => (md5hex(id.toString), id))
    var picked = Vector((1, seed, Option.empty[Long]))
    while (picked.length < math.min(k, rows.length)) {
      val sel = picked.map(_._2).toSet
      val cands = rows.collect { case (id, _) if !sel(id) =>
        id -> sel.map(s => d2(qs(id), qs(s))).min
      }
      val (bid, bd) = cands.minBy { case (id, d) => (-d, id) }
      picked = picked :+ ((picked.length + 1, bid, Some(bd)))
    }
    picked
  }

  // 8 distinct 3-d points, irregular spacing so every round's argmax
  // is unique and the trajectory exercises real min-folding
  private val pts: Seq[(Long, Array[Float])] = Seq(
    1L -> Array(0.0f, 0.0f, 0.0f),
    2L -> Array(0.9f, 0.1f, 0.0f),
    3L -> Array(0.0f, 1.0f, 0.2f),
    4L -> Array(0.5f, 0.5f, 0.9f),
    5L -> Array(-0.8f, 0.2f, 0.1f),
    6L -> Array(0.3f, -0.7f, 0.4f),
    7L -> Array(0.31f, -0.69f, 0.41f), // near-dup of 6: picked last if ever
    8L -> Array(-0.2f, -0.2f, -0.9f))

  private def toDf(rows: Seq[(Long, Array[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("matches the plain-Scala greedy replay exactly (order + distances)") {
    val got = Similarity.kCenterSelect(toDf(pts), "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    assert(got === replay(pts, 5))
  }

  test("three separated blobs: first three picks cover all three blobs") {
    val blobs = Seq(
      10L -> Array(1.0f, 0.0f), 11L -> Array(0.98f, 0.02f), 12L -> Array(1.02f, -0.01f),
      20L -> Array(-1.0f, 0.0f), 21L -> Array(-0.99f, 0.03f),
      30L -> Array(0.0f, 1.0f), 31L -> Array(0.01f, 0.99f))
    val got = Similarity.kCenterSelect(toDf(blobs), "vec_id", "embedding", k = 3)
      .collect().map(_.getLong(1)).toSet
    assert(got.map(_ / 10).toSeq.sorted === Seq(1, 2, 3),
      s"expected one pick per blob, got ids $got")
  }

  test("k past the corpus size returns every row once, then stops") {
    val small = pts.take(3)
    val got = Similarity.kCenterSelect(toDf(small), "vec_id", "embedding", k = 10)
      .collect()
    assert(got.length === 3)
    assert(got.map(_.getLong(1)).toSet === small.map(_._1).toSet)
  }

  test("coverage radii are nonincreasing after the seed") {
    val ds = Similarity.kCenterSelect(toDf(pts), "vec_id", "embedding", k = 6)
      .collect().drop(1).map(_.getLong(2))
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b },
      s"radii must not increase: ${ds.toSeq}")
  }
}
