package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming operators — the Structured Streaming surface the
  * reference lacks (its "streaming" is asyncio micro-batching with no event
  * time, SURVEY.md §1.4) but a continuous crawl-ingest pipeline needs:
  * watermarked windowed aggregation and custom keyed state for cross-batch
  * exactly-once dedup. Both transformations run unchanged on batch frames
  * (minus the watermark effect), which is how the specs pin semantics.
  */
object StreamingOps {

  /** Watermarked tumbling-window counts per key column: late rows beyond
    * `lateness` are dropped, windows finalize (append-mode emittable) once
    * the watermark passes their end.
    */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
      windowLen: String = "1 hour", lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen).as("w"), col(keyCol))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col(keyCol), col("cnt"), col("sum_value"))

  final case class Seen(firstSeen: Long)
  final case class DedupIn(digest: String, doc_id: String, ts: Timestamp)
  final case class DedupOut(digest: String, doc_id: String, first: Boolean)

  /** Cross-batch exactly-once content dedup with custom keyed state
    * (flatMapGroupsWithState): the FIRST document per content digest is
    * emitted, later arrivals are swallowed; state expires
    * `stateTtlMs` after the watermark passes (bounding state for a
    * 10^12-doc stream — a digest that hasn't re-appeared within the TTL is
    * forgotten, the cost being that a duplicate arriving later re-emits).
    */
  final case class SessIn(user_id: String, event_id: String, ts: Timestamp, value: Double)
  final case class OpenSession(startMs: Long, lastMs: Long, n: Long, sumCents: Long)
  final case class SessionOut(user_id: String, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, sum_value: Double)

  /** Event-time SESSIONIZATION with keyed gap state — the streaming twin of
    * the batch gaps-and-islands operator ([[graft.operators.Events
    * .sessionize]]; same strict->gap close rule, same (ts, event_id)
    * ordering, same scaled-long value sum, so a stream fed batch-by-batch
    * converges to the batch answer — the spec asserts set equality).
    * Sessions close two ways: an event beyond the gap closes its
    * predecessor within the batch; the EventTimeTimeout closes the open
    * tail once the watermark passes last_event + gap, emitting in append
    * mode with state removed — bounded state for an unbounded stream.
    */
  def sessionize(events: Dataset[SessIn], gapSeconds: Long = 1800,
      lateness: String = "10 minutes"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapSeconds * 1000L
    def emit(uid: String, s: OpenSession) = SessionOut(uid,
      new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n, s.sumCents / 100.0)
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: String, rows: Iterator[SessIn], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(emit(uid, s))
          } else {
            // group-iterator order after the shuffle is not deterministic —
            // sort exactly like the batch window (ts, event_id)
            val sorted = rows.toArray.sortBy(r => (r.ts.getTime, r.event_id))
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { r =>
              val t = r.ts.getTime
              val cents = math.round(r.value * 100)
              cur match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  cur = Some(OpenSession(s.startMs, math.max(s.lastMs, t),
                    s.n + 1, s.sumCents + cents))
                case Some(s) =>
                  closed += emit(uid, s)
                  cur = Some(OpenSession(t, t, 1L, cents))
                case None =>
                  cur = Some(OpenSession(t, t, 1L, cents))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.iterator
          }
      }
  }

  def dedupByDigest(docs: Dataset[DedupIn], stateTtlMs: Long = 24 * 3600 * 1000L)
      : Dataset[DedupOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.digest)
      .flatMapGroupsWithState[Seen, DedupOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (digest: String, rows: Iterator[DedupIn], state: GroupState[Seen]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val first = !state.exists
            if (first) {
              state.update(Seen(System.currentTimeMillis()))
              state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + stateTtlMs)
              // representative = min (ts, doc_id) within the batch: the group
              // iterator's order after the groupByKey shuffle is NOT
              // deterministic, so "iterator head" would vary across runs when
              // duplicates share a micro-batch
              val rep = rows.minBy(r => (r.ts.getTime, r.doc_id))
              Iterator.single(DedupOut(digest, rep.doc_id, first = true))
            } else Iterator.empty
          }
      }
  }
}
