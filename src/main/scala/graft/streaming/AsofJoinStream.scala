package graft.streaming

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

/** Streaming as-of join — the unbounded counterpart of the p34 batch
  * operator: each click matches the latest view AT OR BEFORE it for the
  * same user, under p34's exact order (event time, views before clicks at
  * the same instant, ties among simultaneous views to the highest
  * event_id).
  *
  * State contract: ONE (view_id, view_tus) pair per user — the best view
  * seen so far — bounded by the user domain like [[QuotaSampleStream]]'s
  * counters, independent of stream length. No watermark is needed for
  * state size; the match rule only ever needs the single latest view.
  *
  * Ordering contract (the per-key Kafka guarantee): micro-batch
  * boundaries must respect per-user event time — a user's batch-N events
  * all precede their batch-N+1 events. WITHIN a micro-batch arrival order
  * is free (the operator sorts each user's batch slice by p34's order
  * before folding), so shuffled intra-batch delivery is handled; only
  * cross-batch reordering per key is outside the contract, which a keyed
  * log feed satisfies by construction. Under that contract the streamed
  * match stream is row-identical to batch p34 over the union of fed
  * events — asserted in StreamingAsofJoinSpec, including a click matching
  * a view fed many micro-batches earlier.
  *
  * Batch input degrades to the p34 window formulation itself (one
  * user_id shuffle, no join operator — the operator's own plan).
  */
object AsofJoinStream {

  /** One input event: `event_type` is 'click' or 'view' (other types are
    * filtered out, as in p34); `tus` is event time in microseconds. */
  final case class Ev(event_id: Long, user_id: Long, tus: Long, event_type: String)

  /** One matched click; `view_id`/`lag_us` are None when no view precedes
    * the click (p34's null match). */
  final case class Match(click_id: Long, user_id: Long,
                         view_id: Option[Long], lag_us: Option[Long])

  /** Best-view-so-far state: p34's order means the winner is the max of
    * (view_tus, event_id). Public so the state encoder's generated
    * serializer can reach the constructor. */
  final case class BestView(view_id: Long, view_tus: Long)

  private def fold(user: Long, events: Iterator[Ev],
                   state: GroupState[BestView]): Iterator[Match] = {
    // p34's order: (tus, is_click, event_id) — views sort before clicks
    // at the same instant, simultaneous views resolve to max event_id
    val sorted = events.toSeq.sortBy(e =>
      (e.tus, if (e.event_type == "click") 1 else 0, e.event_id))
    var best = state.getOption
    val out = Seq.newBuilder[Match]
    sorted.foreach {
      case Ev(id, _, tus, "view") =>
        if (best.forall(b => tus > b.view_tus || (tus == b.view_tus && id > b.view_id)))
          best = Some(BestView(id, tus))
      case Ev(id, _, tus, "click") =>
        out += Match(id, user, best.map(_.view_id), best.map(b => tus - b.view_tus))
      case _ => () // other event types: ignored, as in p34's filter
    }
    best.foreach(state.update)
    out.result().iterator
  }

  /** As-of-match a stream (or static frame) of events with columns
    * (event_id, user_id, tus, event_type). Streaming: flatMapGroupsWithState
    * with one BestView per user, append-mode match stream. Batch: p34's
    * own window formulation. */
  def matchClicks(events: DataFrame): Dataset[Match] = {
    val spark = events.sparkSession
    import spark.implicits._
    for (c <- Seq("event_id", "user_id", "tus", "event_type"))
      require(events.columns.contains(c),
        s"matchClicks: input is missing column '$c' (has: ${events.columns.mkString(", ")})")
    // a clock-less or id-less event cannot be as-of matched: routed out and
    // COUNTED before the primitive-encoder boundary (NullGuard doc) —
    // applied before the branch so batch and stream see identical rows
    val events2 = NullGuard(events, "asof", Seq("event_id", "user_id", "tus"))
    val ds = events2.select($"event_id".cast("long"), $"user_id".cast("long"),
      $"tus".cast("long"), $"event_type".cast("string")).as[Ev]
      .filter(e => e.event_type == "click" || e.event_type == "view")
    if (events.isStreaming)
      ds.groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fold)
    else {
      events2.createOrReplaceTempView("graft_asof_events")
      spark.sql("""
        WITH e AS (
          SELECT event_id, user_id, tus,
            CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click,
            CASE WHEN event_type = 'view' THEN event_id END AS view_id,
            CASE WHEN event_type = 'view' THEN tus END AS view_tus
          FROM graft_asof_events WHERE event_type IN ('click', 'view')),
        m AS (
          SELECT event_id, user_id, tus, is_click,
            last(view_id, true) OVER (PARTITION BY user_id
              ORDER BY tus, is_click, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mv,
            last(view_tus, true) OVER (PARTITION BY user_id
              ORDER BY tus, is_click, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mt
          FROM e)
        SELECT event_id AS click_id, user_id, mv AS view_id, tus - mt AS lag_us
        FROM m WHERE is_click = 1""")
        .as[Match]
    }
  }
}
