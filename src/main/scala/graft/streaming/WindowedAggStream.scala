package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Watermarked windowed aggregation — the third canonical Structured
  * Streaming shape alongside [[SessionizeStream]]'s two (declarative
  * session windows, custom flatMapGroupsWithState): fixed event-time
  * windows with watermark-driven finalization.
  *
  * The aggregation is declarative (`window()` + groupBy), so on a stream
  * Catalyst plans a streaming aggregation with state-store-backed partial
  * merge and the watermark both bounds state and decides when a window is
  * FINAL (append mode emits a window only once the watermark passes its
  * end — exactly-once per window downstream). On a static DataFrame the
  * same function is a plain aggregation — the spec uses that as the
  * oracle, and drives a MemoryStream to prove append-mode finalization
  * emits the identical rows.
  *
  * At 100 TB: one shuffle on (window, event_type) with map-side partial
  * aggregation; state is O(open windows × keys), bounded by the watermark
  * delay, not the stream length. Sliding windows (`slide` < `width`) fan
  * each event into width/slide windows map-side — the standard cost, paid
  * before the shuffle.
  */
object WindowedAggStream {

  /** Per-(window, event_type) rollup: event count, value sum (exact —
    * doubles summed once per partial then merged; the spec's oracle
    * tolerance handles the float), distinct-ish user load via
    * approx_count_distinct (the only distinct aggregate Structured
    * Streaming supports incrementally — HLL state merges; documented
    * approximation, not a silent one). `width`/`slide` are SQL interval
    * strings; equal values give tumbling windows. */
  def windowedEventStats(events: DataFrame, width: String, slide: String,
                         watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(F.window(F.col("ts"), width, slide), F.col("event_type"))
      .agg(
        F.count(F.lit(1)).as("n_events"),
        F.sum(F.col("value")).as("value_sum"),
        F.approx_count_distinct("user_id").as("approx_users"))
      .select(F.col("window.start").as("window_start"),
        F.col("window.end").as("window_end"),
        F.col("event_type"), F.col("n_events"), F.col("value_sum"),
        F.col("approx_users"))

  def tumblingEventStats(events: DataFrame, width: String,
                         watermarkDelay: String = "10 seconds"): DataFrame =
    windowedEventStats(events, width, width, watermarkDelay)
}
