package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.llm.Dedup

/** STATEFUL streaming near-dup — the index that GROWS: where
  * `stream_neardup_probe` checks arrivals against a STATIC corpus
  * index, a production ingest stream must also dedup against ITSELF —
  * batch N+1 has to catch a near-dup of a document that arrived in
  * batch N. Arriving documents are banded in-stream (the same
  * expression-based shingle→minhash→band pipeline as the batch family,
  * [[Dedup.bandBuckets]]), then `flatMapGroupsWithState` KEYED BY BAND
  * BUCKET holds the cumulative per-bucket (doc_id, signature) index:
  * each arrival probes the bucket's accumulated state (plus
  * earlier-id arrivals of its own micro-batch, processed in doc_id
  * order), emits every candidate with signature-estimated Jaccard ≥
  * `threshold`, then joins the state itself.
  *
  * Semantics are BATCH-INVARIANT by construction — a pair (i, j),
  * i < j, is emitted exactly when both band to the same bucket, i is
  * among the bucket's first `maxBucket` arrivals, and est ≥ threshold
  * — regardless of how files chunk into micro-batches. Admission is
  * gated on a MONOTONE per-bucket arrivals counter carried in state
  * (never decremented by horizon pruning), so the first-maxBucket rule
  * survives in-state eviction; only a whole-bucket idle-timeout — a
  * full horizon of silence — removes the counter and restarts the cap
  * epoch. The oracle is
  * therefore the plain batch pairwise band join with a ROW_NUMBER cap,
  * and est = (equal signature components)/32 is an exact dyadic
  * rational, so the ≥-threshold cut is bit-identical in both engines.
  *
  * State bounding, the 100 TB story: state per bucket is ids +
  * 32-long signatures — never text; the `maxBucket` cap stops hot
  * (boilerplate) buckets from accumulating unbounded state (the
  * probe-then-add-if-room rule keeps the cap oracle-expressible); and
  * event-time TIMEOUT evicts buckets idle past the watermark horizon,
  * so steady-state state tracks DISTINCT BANDS IN THE HORIZON, not
  * history ([[graft.StreamingScaleProbe]] measures exactly that).
  * Event time is synthesized from doc_id (the fixture's arrival key);
  * a production deploy uses the real ingest timestamp. The gate's
  * horizon exceeds the fixture span so nothing evicts under the
  * oracle compare; the probe runs a tight horizon to measure the
  * eviction path.
  */
object StreamingNearDup {

  final case class Hit(bucket: String, cand_id: Long, probe_id: Long, est_jaccard: Double)

  /** VERSIONED per-bucket state envelope. Spark state encoders are
    * positional with no schema evolution: the round-14 widening of the
    * state tuple (3 → 4 fields) BROKE restarts from older checkpoints,
    * which was only documented as a migration rule. The fix is to
    * freeze the CHECKPOINT-visible schema at `(version int, payload
    * binary)` forever and hand-version the payload layout — widening
    * the logical state is now a new `version` branch in
    * [[BucketState.decode]], and a stream restarted from an
    * older-version checkpoint keeps its state (missing fields get
    * documented defaults) instead of failing to decode. */
  final case class BucketState(version: Int, payload: Array[Byte])

  object BucketState {
    /** The logical state: parallel lists of (id, signature, arrival
      * seconds) plus the MONOTONE admitted counter (see the admission
      * rationale in [[neardupStateful]]). */
    final case class Fields(ids: List[Long], sigs: List[Seq[Long]],
        secs: List[Long], admitted: Long)

    /** Layout history — every shipped version stays decodable:
      *  1: n, ids[n], (sigLen, sig[sigLen])[n], secs[n]
      *     (the pre-admission-counter layout; `admitted` reconstructs
      *     as ids.length — the exact rule that build gated on)
      *  2: version 1 + trailing admitted: Long */
    val CurrentVersion = 2

    def encode(f: Fields): BucketState = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      writeCommon(out, f.ids, f.sigs, f.secs)
      out.writeLong(f.admitted)
      out.flush()
      BucketState(CurrentVersion, bos.toByteArray)
    }

    def decode(e: BucketState): Fields = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(e.payload))
      val (ids, sigs, secs) = readCommon(in)
      e.version match {
        case 1 => Fields(ids, sigs, secs, ids.length.toLong)
        case 2 => Fields(ids, sigs, secs, in.readLong())
        case v => throw new IllegalStateException(
          s"near-dup state version $v is newer than this build (knows <= $CurrentVersion) — " +
            "a checkpoint must never be opened by an OLDER library than wrote it")
      }
    }

    private def writeCommon(out: java.io.DataOutputStream,
        ids: List[Long], sigs: List[Seq[Long]], secs: List[Long]): Unit = {
      out.writeInt(ids.length)
      ids.foreach(out.writeLong)
      sigs.foreach { s => out.writeInt(s.length); s.foreach(out.writeLong) }
      secs.foreach(out.writeLong)
    }

    private def readCommon(in: java.io.DataInputStream):
        (List[Long], List[Seq[Long]], List[Long]) = {
      val n = in.readInt()
      val ids = List.fill(n)(in.readLong())
      val sigs = List.fill(n) {
        val m = in.readInt()
        scala.collection.immutable.ArraySeq.unsafeWrapArray(
          Array.fill(m)(in.readLong())): Seq[Long]
      }
      val secs = List.fill(n)(in.readLong())
      (ids, sigs, secs)
    }

    /** TEST-ONLY: the version-1 writer, kept so the restart spec can
      * author an old-layout checkpoint and prove forward decoding. */
    private[streaming] def encodeV1(ids: List[Long], sigs: List[Seq[Long]],
        secs: List[Long]): BucketState = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      writeCommon(out, ids, sigs, secs)
      out.flush()
      BucketState(1, bos.toByteArray)
    }
  }

  def neardupStateful(
      src: DataFrame,
      horizonSec: Long,
      maxBucket: Int = 1000,
      threshold: Double = 0.3): Dataset[Hit] =
    neardupStatefulVersioned(src, horizonSec, maxBucket, threshold, BucketState.encode)

  /** [[neardupStateful]] with the state WRITER pluggable — test-only:
    * the StateEvolutionSpec restart test authors a checkpoint with the
    * version-1 writer and restarts the production reader from it,
    * proving forward decoding on a real checkpoint rather than on
    * bytes in isolation. Production always writes [[BucketState.encode]]. */
  private[streaming] def neardupStatefulVersioned(
      src: DataFrame,
      horizonSec: Long,
      maxBucket: Int,
      threshold: Double,
      enc: BucketState.Fields => BucketState): Dataset[Hit] = {
    import src.sparkSession.implicits._
    // +1e6 s epoch offset: a doc whose synthetic event time lands
    // EXACTLY on the initial watermark (epoch 0 — i.e. doc_id 0) is
    // dropped as late by the stateful operator's watermark filter;
    // shifting the whole clock is a no-op for every horizon comparison
    // (only differences of arrival times matter) and keeps id 0 alive
    val banded = Dedup.bandBuckets(Dedup.shingleHashSets(src, "doc_id", "text"))
      .withColumn("ets", (col("id") + lit(1000000L)).cast("timestamp"))
      .withWatermark("ets", s"$horizonSec seconds")
    // the watermark column must reach the grouped Dataset for
    // event-time timeout eligibility, so ets rides along in the tuple.
    // CHECKPOINT COMPATIBILITY: state persists as the VERSIONED
    // [[BucketState]] envelope — the checkpoint-visible schema is
    // frozen at (version int, payload binary), so widening the logical
    // state is a decoder branch, not a checkpoint break (the round-14
    // tuple widening broke restarts exactly once; this is the fix that
    // makes the NEXT widening restart-safe, proven by the
    // StateEvolutionSpec restart-from-v1 test). One unavoidable final
    // break: checkpoints written by the pre-envelope tuple builds do
    // not decode — restart those from a fresh checkpoint directory;
    // the horizon re-warms the state within one horizonSec.
    // State per bucket: parallel lists of (id, sig, arrival seconds)
    // PLUS a MONOTONE admitted-arrivals counter. The counter — never
    // decremented by horizon pruning — is what admission is gated on,
    // so "i is among the bucket's first maxBucket arrivals" holds
    // regardless of micro-batch chunking even when in-state pruning
    // shrinks the lists between batches (admission off the CURRENT
    // list size would re-open the cap after pruning, and which docs
    // then slip in would depend on batch boundaries — the exact
    // batch-variance the ROW_NUMBER oracle cannot express). The one
    // remaining boundary: whole-bucket TIMEOUT removes the state and
    // the counter with it — a bucket idle past the full horizon
    // restarts its cap epoch, which is the intended production
    // semantics (the horizon bounds every obligation, including the
    // cap's memory).
    // The horizon is part of the MATCH semantics, not just storage: a
    // candidate matches only if it arrived within `horizonSec` of the
    // probe — a pure function of the two arrival times, so emission
    // stays batch-invariant even though watermark-driven EVICTION
    // necessarily lags a batch behind (the watermark only advances
    // after the batch that carries the later data).
    banded.select(col("bucket"), col("id"), col("sig"), col("ets"))
      .as[(String, Long, Seq[Long], java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[BucketState, Hit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (bucket: String, rows: Iterator[(String, Long, Seq[Long], java.sql.Timestamp)],
         state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val st0 = state.getOption.map(BucketState.decode)
              .getOrElse(BucketState.Fields(
                List.empty[Long], List.empty[Seq[Long]], List.empty[Long], 0L))
            var ids = st0.ids
            var sigs = st0.sigs
            var secs = st0.secs
            var admitted = st0.admitted
            val out = Seq.newBuilder[Hit]
            val newRows = rows.toSeq.sortBy(_._2)
            newRows.foreach { case (_, id, sig, ets) =>
              val probeSec = ets.getTime / 1000L
              val sigArr = sig.toArray
              var is = ids
              var ss = sigs
              var cs = secs
              while (is.nonEmpty) {
                if (cs.head >= probeSec - horizonSec) {
                  val csig = ss.head
                  var eq = 0
                  var i = 0
                  while (i < sigArr.length) { if (csig(i) == sigArr(i)) eq += 1; i += 1 }
                  val est = eq.toDouble / sigArr.length
                  if (est >= threshold) out += Hit(bucket, is.head, id, est)
                }
                is = is.tail; ss = ss.tail; cs = cs.tail
              }
              if (admitted < maxBucket) {
                ids = id :: ids
                sigs = sig :: sigs
                secs = probeSec :: secs
                admitted += 1L
              }
            }
            // prune entries no future probe can match (arrivals are
            // time-ordered, so the latest arrival bounds all futures)
            if (newRows.nonEmpty) {
              val cutoff = newRows.last._4.getTime / 1000L - horizonSec
              if (secs.exists(_ < cutoff)) {
                val kept = ids.lazyZip(sigs).lazyZip(secs).toList.filter(_._3 >= cutoff)
                ids = kept.map(_._1); sigs = kept.map(_._2); secs = kept.map(_._3)
              }
            }
            state.update(enc(BucketState.Fields(ids, sigs, secs, admitted)))
            // store-level eviction: drop the whole bucket once the
            // watermark passes its latest arrival + horizon
            if (newRows.nonEmpty)
              state.setTimeoutTimestamp(newRows.last._4.getTime + horizonSec * 1000L)
            out.result().iterator
          }
      }
  }
}
