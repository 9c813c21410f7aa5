package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{functions => F}

/** Structured Streaming surplus module. The reference compiles to SQL
  * strings and has no streaming surface (SURVEY §1.4), but a Spark-native
  * engine should run its pipeline operators over unbounded inputs too.
  * This module re-expresses PipelineOps.p13 (gap-based event
  * sessionization) in the two canonical streaming shapes, batch-checked
  * against the p13 operator in StreamingSessionizeSpec:
  *
  *  1. [[sessionWindows]] — the DECLARATIVE path: built-in
  *     `session_window(ts, gap)` + watermark. Preferred at 100 TB: Catalyst
  *     plans it as a streaming session aggregation with state-store-backed
  *     incremental merge, partial aggregation, and watermark-driven state
  *     eviction — nothing hand-rolled.
  *  2. [[sessionizeWithState]] — the CUSTOM-STATE path
  *     (flatMapGroupsWithState): the shape to reach for when session logic
  *     outgrows an aggregate (per-session ML features, complex close
  *     conditions). Emits a session as soon as a gap closes it; state holds
  *     exactly one open session per user (O(users) state, not O(events)),
  *     and an EVENT-TIME TIMEOUT flushes the final open session once the
  *     watermark passes its close boundary — the stream emits every
  *     session on its own, no terminal helper needed.
  *
  * Ordering contract: events are processed in event-time order WITHIN each
  * micro-batch (sorted per group below); cross-batch late data is handled
  * by the watermark in (1) and must be handled by a reorder buffer in (2)
  * for production use — documented here rather than hidden.
  */
object SessionizeStream {

  final case class Ev(user_id: Long, event_id: Long, tus: Long)
  /** Open-session state per user. */
  final case class OpenSession(sessionId: Long, firstTus: Long, lastTus: Long,
                               nEvents: Long)
  final case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                              span_us: Long)

  /** Declarative sessionization: works identically on a static DataFrame or
    * a stream (pass the result of readStream + withWatermark). `ts` must be
    * a timestamp column; gap is a SQL interval string like "4 hours". */
  def sessionWindows(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(F.col("user_id"), F.session_window(F.col("ts"), gap))
      .agg(
        F.count(F.lit(1)).as("n_events"),
        // span in µs between first and last event (session_window end pads
        // the gap, so derive the span from the actual event bounds)
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).as("span_us"))
      .select(F.col("user_id"), F.col("session_window.start").as("session_start"),
        F.col("n_events"), F.col("span_us"))

  /** [[Ev]] widened with the event-time column the watermark attaches to. */
  final case class EvW(user_id: Long, event_id: Long, tus: Long,
                       ts: java.sql.Timestamp)

  /** Custom-state sessionization over a typed stream: one OpenSession per
    * user in the state store; a closed session is emitted the moment a gap
    * exceeds `gapUs`, and the still-open session is flushed by an
    * EVENT-TIME TIMEOUT once the watermark (derived from `tus` with
    * `watermarkDelay` slack) passes its close boundary `last + gap` — so a
    * session whose user simply stops producing events is still emitted by
    * the stream itself, with O(users) state reclaimed on the way out.
    *
    * On a BATCH Dataset this degrades exactly as Spark defines it: the
    * watermark node is a no-op and timeouts never fire, so a bounded
    * replay emits precisely the closed sessions (the final open session
    * per user stays unemitted — the batch-equivalence check in
    * StreamingSessionizeSpec relies on that). */
  def sessionizeWithState(events: Dataset[Ev], gapUs: Long,
                          watermarkDelay: String = "10 seconds"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val streaming = events.isStreaming
    events
      .withColumn("ts", F.timestamp_micros(F.col("tus")))
      .withWatermark("ts", watermarkDelay)
      .as[EvW]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[EvW], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap: the open session can never grow.
            // Keep a COUNTER-ONLY tombstone (nEvents == 0) instead of
            // removing the state outright: dropping it would restart the
            // user's next session at id 1 and emit a duplicate
            // (user_id, session_id) key. The tombstone holds only the next
            // session id — O(users) state, which is this operator's declared
            // state budget anyway — and sets no further timeout.
            val s = state.get
            state.update(OpenSession(s.sessionId + 1, 0L, 0L, 0L))
            Iterator.single(SessionOut(userId, s.sessionId, s.nEvents, s.lastTus - s.firstTus))
          } else {
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            // event-time order within the batch (iterator order is undefined)
            var nextId = 1L
            var open: OpenSession = null
            state.getOption.foreach { s =>
              if (s.nEvents == 0L) nextId = s.sessionId // counter tombstone
              else open = s
            }
            rows.toSeq.sortBy(e => (e.tus, e.event_id)).foreach { e =>
              open match {
                case null =>
                  open = OpenSession(nextId, e.tus, e.tus, 1L)
                case s if e.tus - s.lastTus > gapUs =>
                  out += SessionOut(userId, s.sessionId, s.nEvents, s.lastTus - s.firstTus)
                  open = OpenSession(s.sessionId + 1, e.tus, e.tus, 1L)
                case s =>
                  open = s.copy(lastTus = e.tus, nEvents = s.nEvents + 1)
              }
            }
            if (open != null) {
              state.update(open)
              // flush once the watermark clears the close boundary; clamp
              // above the current watermark (late data can leave last+gap
              // behind it, and a non-future timestamp is rejected)
              if (streaming)
                state.setTimeoutTimestamp(math.max(
                  (open.lastTus + gapUs) / 1000 + 1,
                  state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }
}
