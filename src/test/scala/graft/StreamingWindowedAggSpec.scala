package graft

import graft.streaming.WindowedAggStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

/** Watermarked windowed aggregation: the batch run of the SAME function is
  * the oracle, and a MemoryStream drive proves append-mode finalization —
  * a window is emitted exactly once, only after the watermark passes its
  * end, with values identical to the batch computation. */
class StreamingWindowedAggSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  private def eventsDf = {
    import spark.implicits._
    Graft.normalizeEventTime(spark.read.parquet(s"$dir/events.parquet"))
      .select($"user_id", $"event_type", $"value", $"ts")
  }

  test("batch tumbling stats equal an independent floor-to-window SQL rollup") {
    eventsDf.createOrReplaceTempView("ev_batch")
    val oracle = spark.sql(
      """SELECT timestamp_seconds(unix_timestamp(ts) div 3600 * 3600) AS window_start,
        |       event_type,
        |       count(1) AS n_events,
        |       sum(value) AS value_sum
        |FROM ev_batch GROUP BY 1, 2""".stripMargin).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1.getTime, t._2))
    val got = WindowedAggStream.tumblingEventStats(eventsDf, "1 hour").collect()
      .map(r => (r.getTimestamp(r.fieldIndex("window_start")),
        r.getString(r.fieldIndex("event_type")),
        r.getLong(r.fieldIndex("n_events")),
        r.getDouble(r.fieldIndex("value_sum"))))
      .sortBy(t => (t._1.getTime, t._2))
    assert(got.length == oracle.length)
    got.zip(oracle).foreach { case (g, o) =>
      assert(g._1 == o._1 && g._2 == o._2 && g._3 == o._3, s"$g vs $o")
      assert(math.abs(g._4 - o._4) < 1e-6, s"$g vs $o")
    }
    assert(got.nonEmpty)
  }

  test("sliding windows fan each event into width/slide windows") {
    // 2h window sliding by 1h: every event lands in exactly 2 windows, so
    // total (window, type) event mass doubles vs tumbling
    val tumbling = WindowedAggStream.tumblingEventStats(eventsDf, "1 hour")
      .agg(F.sum("n_events")).head.getLong(0)
    val sliding = WindowedAggStream
      .windowedEventStats(eventsDf, "2 hours", "1 hour", "10 seconds")
      .agg(F.sum("n_events")).head.getLong(0)
    assert(sliding == 2 * tumbling, s"sliding $sliding vs tumbling $tumbling")
  }

  import StreamingWindowedAggSpec.E

  test("append mode emits a window exactly once, after the watermark passes its end") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val h = 3600L * 1000000
    val ms = MemoryStream[E]
    val stream = ms.toDS()
      .select($"user_id", $"event_type", $"value",
        F.timestamp_micros($"tus").as("ts"))
    val q = WindowedAggStream.tumblingEventStats(stream, "1 hour", "5 minutes")
      .writeStream.format("memory").queryName("wagg_out").outputMode("append")
      .start()
    try {
      val B = 100 * h // hour-aligned base, away from the epoch-0 watermark
      // window [B, B+1h): three events, two types
      ms.addData(E(1, "view", 1.0, B + 60), E(2, "view", 2.0, B + 120),
        E(1, "buy", 10.0, B + 180))
      q.processAllAvailable()
      // watermark still inside the window — nothing final yet
      assert(spark.table("wagg_out").isEmpty)
      // an event 2h later pushes the watermark (2h - 5min) past B+1h…
      ms.addData(E(3, "view", 5.0, B + 2 * h))
      q.processAllAvailable()
      // …and the first window finalizes with the batch-identical values
      val rows = spark.table("wagg_out").collect()
        .map(r => (r.getTimestamp(0).getTime * 1000, r.getString(2),
          r.getLong(3), r.getDouble(4))).toSet
      assert(rows == Set((B, "view", 2L, 3.0), (B, "buy", 1L, 10.0)),
        s"got $rows")
      // the late window emits nothing twice: a second nudge adds no rows
      // for the finalized window
      ms.addData(E(4, "view", 7.0, B + 2 * h + 60))
      q.processAllAvailable()
      val again = spark.table("wagg_out").collect()
        .count(r => r.getTimestamp(0).getTime * 1000 == B)
      assert(again == 2, "finalized window re-emitted")
    } finally q.stop()
  }
}

object StreamingWindowedAggSpec {
  final case class E(user_id: Long, event_type: String, value: Double,
                     tus: Long)
}
