package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[TextAnalysis.packedWindowLayout]] — the tensor-ready FFD artifact.
  * Replays every placement record (bin, seq, offset) in plain Scala and
  * pins the LOADER properties: offsets are the exact running fill in
  * placement order, windows never interleave docs, and the per-slot
  * segment/position expansion (what the attention mask and position
  * ids are built from) reconstructs each doc's token span exactly. */
class PackLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val W = 2048

  private lazy val rows = {
    val docs = graft.queries.Tables(spark, TestSpark.sfDir, "documents")
      .withColumn("shard_id", Sampling.shardAssign(col("doc_id"), 8))
    TextAnalysis.packedWindowLayout(docs, Seq("shard_id"), "doc_id",
        TextAnalysis.tokenCountWs(col("text")).cast("long"), W)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
  }
  // (shard, doc_id, n_tokens, bin_id, seq_in_bin, token_offset)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  private def h60(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(15), 16)

  test("placement records replay the FFD loop in plain Scala, per shard") {
    rows.groupBy(_._1).foreach { case (shard, rs) =>
      val byId = rs.map(r => r._2 -> r).toMap
      // FFD order: n DESC, id ASC — replay placements
      val bins = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)] // rem, cnt, fill
      rs.sortBy(r => (-r._3, r._2)).foreach { case (_, id, n, _, _, _) =>
        val fit = bins.indexWhere(_._1 >= n)
        val (bin, seq, off) =
          if (fit >= 0) {
            val (rem, cnt, fill) = bins(fit)
            bins(fit) = (rem - n, cnt + 1, fill + n)
            (fit.toLong, cnt, fill)
          } else {
            bins += ((W - n, 1L, n))
            ((bins.length - 1).toLong, 0L, 0L)
          }
        val got = byId(id)
        assert((got._4, got._5, got._6) === ((bin, seq, off)),
          s"shard $shard doc $id placement")
      }
      // and the shard itself is the md5 rule, not hashPartitioning
      rs.foreach { case (sh, id, _, _, _, _) =>
        assert(sh.toLong === h60(id.toString) % 8, s"doc $id shard rule")
      }
    }
  }

  test("loader invariants: offsets are the running fill; spans are disjoint and contiguous") {
    rows.groupBy(r => (r._1, r._4)).foreach { case ((shard, bin), ms) =>
      val ordered = ms.sortBy(_._5)
      assert(ordered.map(_._5) === ordered.indices.map(_.toLong), s"bin ($shard,$bin) seq gap")
      var fill = 0L
      ordered.foreach { case (_, id, n, _, _, off) =>
        assert(off === fill, s"bin ($shard,$bin) doc $id offset != running fill")
        fill += n
      }
      // whole-doc packing: only an oversized SINGLETON may exceed the window
      if (fill > W) assert(ordered.length == 1, s"bin ($shard,$bin) oversize with company")
    }
  }

  test("slot expansion: segment ids partition the used window, position ids reset per doc") {
    // expand the first few bins exactly as the gate's slots_md5 does and
    // check the tensor semantics: slot t of member (seq, off, len) has
    // segment seq and position t - off; everything past the fill is pad
    rows.groupBy(r => (r._1, r._4)).take(12).foreach { case ((shard, bin), ms) =>
      val used = ms.map(_._3).sum
      val slots = (0L until W).map { t =>
        if (t >= used) "p"
        else {
          val m = ms.find(r => r._6 <= t && t < r._6 + r._3).get
          s"${m._5}/${t - m._6}"
        }
      }
      // position ids reset to 0 exactly at every member offset inside the fill
      ms.foreach { case (_, _, n, _, seq, off) =>
        if (off < W) assert(slots(off.toInt) === s"$seq/0", s"bin ($shard,$bin) no reset at $off")
        val last = math.min(off + n - 1, W - 1)
        if (last >= off) assert(slots(last.toInt) === s"$seq/${last - off}")
      }
      val padCount = slots.count(_ == "p")
      assert(padCount === math.max(W - used, 0L).toInt, s"bin ($shard,$bin) pad count")
    }
  }

  test("layout agrees with packSequencesFfdByGroup on the assignment itself") {
    val docs = graft.queries.Tables(spark, TestSpark.sfDir, "documents")
      .withColumn("shard_id", Sampling.shardAssign(col("doc_id"), 8))
    val plain = TextAnalysis.packSequencesFfdByGroup(docs, Seq("shard_id"), "doc_id",
        TextAnalysis.tokenCountWs(col("text")).cast("long"), W)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(3)).toMap
    rows.foreach { case (shard, id, _, bin, _, _) =>
      assert(plain((shard, id)) === bin, s"doc $id bin diverges from the plain packer")
    }
  }
}
