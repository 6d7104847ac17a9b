package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING FORGET — tombstones over streaming-dedup state: the
  * governance twin of `stream_dedup_docs`. The door keeps one state
  * entry per live content fingerprint; a FORGET command (the streaming
  * delivery of a delete request — GDPR/right-to-be-forgotten) REMOVES
  * that entry, and content re-ingested after its forget passes the
  * door again as new. `dropDuplicates` cannot express this (its state
  * only grows within the watermark); the operator is
  * `flatMapGroupsWithState` keyed by the content hash, with explicit
  * `state.remove()` on the tombstone.
  *
  * Event model: (content_hash, seq, doc_id, op) with op 0 = ingest,
  * 1 = forget. `seq` is the event's PER-KEY LOG POSITION (the offset a
  * partitioned log assigns), so within a key, seq order IS logical
  * order; each event emits an ACK row —
  *   ingest → `kept` (state was absent; now live) or `dup` (swallowed),
  *   forget → `forgotten` (state removed) or `noop` (nothing live),
  *   any   → `stale` (seq ≤ the live entry's last applied seq — an
  *           at-least-once REDELIVERY; the first application already
  *           acked, so the replay must not mutate state — the r19
  *           advice fix: without this guard an ingest redelivered in a
  *           LATER trigger than a logically-later ingest would ack
  *           `dup` against the wrong keeper or double-apply).
  * The guard lives only as long as the entry does: a forget removes
  * the whole envelope (state must genuinely SHRINK — the compliance
  * property the FORGETSCALE probe pins), so an ingest redelivered
  * AFTER its key's forget re-enters as `kept` — exactly the documented
  * "re-ingested content passes the door again" semantics, and the same
  * bounded-tombstone-retention window a compacted log has: detecting
  * that replay would mean keeping per-key memory for every forgotten
  * fingerprint forever, which is precisely what a forget must not do.
  * Liveness has a closed form — live before event e iff some ingest
  * landed after the last forget before e — which is what the DuckDB
  * oracle replays with two running-max windows.
  *
  * Scale: state is one (version, keeper + lastSeq) entry per LIVE
  * fingerprint — bounded by distinct retained content, shrunk by every
  * forget; never the text. The per-trigger sort buffers one key's
  * events WITHIN one micro-batch (a hot fingerprint's burst lands on
  * one executor — the honest cost of ordered application; the log's
  * per-key delivery bounds it to one trigger's worth). No timeout: a
  * tombstone must not silently expire (production bounds the INGEST
  * side with a watermark horizon exactly as `stream_dedup_docs`
  * documents; the forget path must stay unconditional). State persists
  * as the frozen (version int, payload binary) envelope — the
  * [[StreamingNearDup.BucketState]] rule — so widening the logical
  * state is a decoder branch, not a checkpoint break: version 2 added
  * `lastSeq` and v1 checkpoints decode with `lastSeq = Long.MinValue`
  * (every in-flight event still applies). */
object StreamingForget {

  final case class Ack(content_hash: String, seq: Long, doc_id: Long, action: String)

  final case class FpState(version: Int, payload: Array[Byte])

  /** Decoded logical state of a LIVE fingerprint. */
  final case class Fp(keeper: Long, lastSeq: Long)

  object FpState {
    /** Layout history:
      *  1: keeper doc_id (8 bytes) — presence of the entry IS liveness.
      *  2: keeper doc_id (8) + lastSeq (8) — the redelivery guard. */
    val CurrentVersion = 2

    def encode(fp: Fp): FpState = {
      val b = java.nio.ByteBuffer.allocate(16)
      b.putLong(fp.keeper)
      b.putLong(fp.lastSeq)
      FpState(CurrentVersion, b.array())
    }

    def decode(s: FpState): Fp = s.version match {
      case 1 =>
        // v1 carried no lastSeq: treat every event as fresh (the old
        // behavior) — in-flight v1 entries upgrade on first write.
        Fp(java.nio.ByteBuffer.wrap(s.payload).getLong, Long.MinValue)
      case 2 =>
        val b = java.nio.ByteBuffer.wrap(s.payload)
        Fp(b.getLong, b.getLong)
      case v => throw new IllegalStateException(
        s"StreamingForget state version $v is newer than this build understands")
    }
  }

  /** `events`: (content_hash: String, seq: Long, doc_id: Long, op: Int). */
  def forgetTombstone(events: DataFrame): Dataset[Ack] = {
    import events.sparkSession.implicits._
    events.select("content_hash", "seq", "doc_id", "op")
      .as[(String, Long, Long, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FpState, Ack](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (ch: String, rows: Iterator[(String, Long, Long, Int)],
         state: GroupState[FpState]) =>
          var live = state.exists
          var fp = if (live) FpState.decode(state.get) else Fp(-1L, Long.MinValue)
          val out = Seq.newBuilder[Ack]
          rows.toSeq.sortBy(_._2).foreach { case (_, seq, docId, op) =>
            if (live && seq <= fp.lastSeq) out += Ack(ch, seq, docId, "stale")
            else if (op == 0) {
              if (live) { fp = fp.copy(lastSeq = seq); out += Ack(ch, seq, docId, "dup") }
              else { live = true; fp = Fp(docId, seq); out += Ack(ch, seq, docId, "kept") }
            } else {
              if (live) { live = false; fp = Fp(-1L, Long.MinValue)
                          out += Ack(ch, seq, docId, "forgotten") }
              else out += Ack(ch, seq, docId, "noop")
            }
          }
          if (live) state.update(FpState.encode(fp)) else state.remove()
          out.result().iterator
      }
  }
}
