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

  def neardupStateful(
      src: DataFrame,
      horizonSec: Long,
      maxBucket: Int = 1000,
      threshold: Double = 0.3): Dataset[Hit] = {
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
    // CHECKPOINT COMPATIBILITY: the round-14 admission fix widened the
    // state tuple from 3 to 4 elements. A stream restarted from a
    // checkpoint written by the 3-tuple build will fail to decode its
    // state (Spark state encoders are positional, no schema evolution
    // for tuple state) — restart such streams from a fresh checkpoint
    // directory; the horizon re-warms the state within one horizonSec.
    // Future state-shape changes should follow the same rule, stated
    // here so the break is a documented migration, not a surprise.
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
      .flatMapGroupsWithState[(List[Long], List[Seq[Long]], List[Long], Long), Hit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (bucket: String, rows: Iterator[(String, Long, Seq[Long], java.sql.Timestamp)],
         state: GroupState[(List[Long], List[Seq[Long]], List[Long], Long)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var (ids, sigs, secs, admitted) = state.getOption
              .getOrElse((List.empty[Long], List.empty[Seq[Long]], List.empty[Long], 0L))
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
            state.update((ids, sigs, secs, admitted))
            // store-level eviction: drop the whole bucket once the
            // watermark passes its latest arrival + horizon
            if (newRows.nonEmpty)
              state.setTimeoutTimestamp(newRows.last._4.getTime + horizonSec * 1000L)
            out.result().iterator
          }
      }
  }
}
