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
  * 1 = forget. Within a key, events apply in `seq` order (the
  * per-key in-order delivery a partitioned log gives); each event
  * emits an ACK row —
  *   ingest → `kept` (state was absent; now live) or `dup` (swallowed),
  *   forget → `forgotten` (state removed) or `noop` (nothing live).
  * Liveness has a closed form — live before event e iff some ingest
  * landed after the last forget before e — which is what the DuckDB
  * oracle replays with two running-max windows.
  *
  * Scale: state is one (version, 8-byte keeper) entry per LIVE
  * fingerprint — bounded by distinct retained content, shrunk by every
  * forget; never the text. No timeout: a tombstone must not silently
  * expire (production bounds the INGEST side with a watermark horizon
  * exactly as `stream_dedup_docs` documents; the forget path must stay
  * unconditional). State persists as the frozen (version int, payload
  * binary) envelope — the [[StreamingNearDup.BucketState]] rule — so
  * widening the logical state is a decoder branch, not a checkpoint
  * break. */
object StreamingForget {

  final case class Ack(content_hash: String, seq: Long, doc_id: Long, action: String)

  final case class FpState(version: Int, payload: Array[Byte])

  object FpState {
    /** Layout history:
      *  1: keeper doc_id (8 bytes) — presence of the entry IS liveness. */
    val CurrentVersion = 1

    def encode(keeper: Long): FpState = {
      val b = java.nio.ByteBuffer.allocate(8)
      b.putLong(keeper)
      FpState(CurrentVersion, b.array())
    }

    def decode(s: FpState): Long = s.version match {
      case 1 => java.nio.ByteBuffer.wrap(s.payload).getLong
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
          var keeper = if (live) FpState.decode(state.get) else -1L
          val out = Seq.newBuilder[Ack]
          rows.toSeq.sortBy(_._2).foreach { case (_, seq, docId, op) =>
            if (op == 0) {
              if (live) out += Ack(ch, seq, docId, "dup")
              else { live = true; keeper = docId; out += Ack(ch, seq, docId, "kept") }
            } else {
              if (live) { live = false; keeper = -1L; out += Ack(ch, seq, docId, "forgotten") }
              else out += Ack(ch, seq, docId, "noop")
            }
          }
          if (live) state.update(FpState.encode(keeper)) else state.remove()
          out.result().iterator
      }
  }
}
