package graft

import graft.pipeline.PipelineOps
import graft.streaming.SessionizeStream
import graft.streaming.SessionizeStream.{Ev, SessionOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

/** The streaming module's contract: the batch p13 operator is the oracle.
  * Both streaming shapes (declarative session_window and custom
  * flatMapGroupsWithState) must agree with it on the same input. */
class StreamingSessionizeSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  private def eventsDf = {
    import spark.implicits._
    // Graft.normalizeEventTime canonicalizes ts to a µs TIMESTAMP for
    // either physical schema (nanos-long or TIMESTAMP_NTZ)
    Graft.normalizeEventTime(spark.read.parquet(s"$dir/events.parquet"))
      .select($"user_id", $"event_id", $"ts")
  }

  private def p13Rows: Seq[(Long, Long, Long, Long)] =
    PipelineOps.queries("p13_sessionize")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("declarative session_window matches batch p13 on the events table") {
    val sw = SessionizeStream.sessionWindows(eventsDf, "4 hours")
      .collect().map(r => (r.getLong(r.fieldIndex("user_id")),
        r.getLong(r.fieldIndex("n_events")), r.getLong(r.fieldIndex("span_us"))))
    // session ids are ordinal in p13 and window-starts here — compare the
    // (user, n_events, span) multiset (boundary note: session_window closes
    // at gap strictly-equal where p13 keeps it open; no such exact-gap pair
    // exists in µs-grained data)
    val a = sw.toSeq.sorted
    val b = p13Rows.map(r => (r._1, r._3, r._4)).sorted
    assert(a == b)
  }

  test("flatMapGroupsWithState emits exactly the closed sessions (batch replay)") {
    import spark.implicits._
    val typed = Graft.normalizeEventTime(spark.read.parquet(s"$dir/events.parquet"))
      .select($"user_id", $"event_id", F.unix_micros($"ts").as("tus"))
      .as[Ev]
    val closed = SessionizeStream
      .sessionizeWithState(typed, 4L * 3600 * 1000000)
      .collect().map(s => (s.user_id, s.session_id, s.n_events, s.span_us)).toSet
    // expected: every p13 session except each user's final (still-open) one
    val all = p13Rows
    val lastPerUser = all.groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).max }
    val expected = all.filter { case (u, sid, _, _) => sid != lastPerUser(u) }
      .map(r => (r._1, r._2, r._3, r._4)).toSet
    assert(closed == expected)
    assert(expected.nonEmpty, "testdata should contain multi-session users")
  }

  test("flatMapGroupsWithState carries state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val h = 3600L * 1000000
    val ms = MemoryStream[Ev]
    // watermark far behind event time: nothing is late, no timeout fires —
    // this test isolates the state carry-over across batches
    val q = SessionizeStream.sessionizeWithState(ms.toDS(), 4 * h, "1000 hours")
      .writeStream.format("memory").queryName("fmgs_out").outputMode("append")
      .start()
    try {
      // session 1 of user 7 straddles the two micro-batches. Events start
      // at B > 0: the event-time-timeout path drops rows at-or-below the
      // watermark, and the INITIAL watermark is epoch 0 — a tus=0 event
      // would be born late (an artifact of epoch-0 test timestamps, not a
      // real stream shape)
      val B = 100 * h
      ms.addData(Ev(7, 1, B), Ev(7, 2, B + 1 * h))
      q.processAllAvailable()
      ms.addData(Ev(7, 3, B + 2 * h), Ev(7, 4, B + 10 * h)) // 8h gap closes session 1
      q.processAllAvailable()
      val rows = spark.table("fmgs_out").as[SessionOut].collect()
      assert(rows.toSeq == Seq(SessionOut(7, 1, 3, 2 * h)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState flushes an open session via event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val h = 3600L * 1000000
    val ms = MemoryStream[Ev]
    // the delay must cover the in-batch event spread (events arriving hours
    // apart in one micro-batch ARE late data to a seconds-scale watermark —
    // the event-time-timeout path drops them, by design), while staying
    // small enough that the sentinel batches push the watermark past
    // user 7's close boundary (1h + 4h gap)
    val q = SessionizeStream.sessionizeWithState(ms.toDS(), 4 * h, "10 hours")
      .writeStream.format("memory").queryName("fmgs_timeout_out").outputMode("append")
      .start()
    try {
      // user 7's session never sees a closing event — only the watermark,
      // advanced by OTHER users' traffic, may flush it. Events start at
      // B > 0 (the initial watermark is epoch 0 and at-or-below-watermark
      // rows are dropped by the event-time-timeout path)
      val B = 100 * h
      ms.addData(Ev(7, 1, B), Ev(7, 2, B + 1 * h))
      q.processAllAvailable()
      assert(spark.table("fmgs_timeout_out").isEmpty) // nothing closed yet
      // a far-future event advances the watermark past B + 1h + 4h…
      ms.addData(Ev(8, 1, B + 100 * h))
      q.processAllAvailable()
      // …and the NEXT batch evaluates timeouts against it
      ms.addData(Ev(8, 2, B + 101 * h))
      q.processAllAvailable()
      val rows = spark.table("fmgs_timeout_out").as[SessionOut].collect().toSet
      assert(rows.contains(SessionOut(7, 1, 2, 1 * h)),
        s"user 7's open session should be timeout-flushed, got $rows")
      assert(!rows.exists(_.user_id == 8), "user 8's session is still open")
    } finally q.stop()
  }

  test("session ids stay unique across a timeout flush (counter tombstone)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val h = 3600L * 1000000
    val ms = MemoryStream[Ev]
    val q = SessionizeStream.sessionizeWithState(ms.toDS(), 4 * h, "10 hours")
      .writeStream.format("memory").queryName("fmgs_tombstone_out").outputMode("append")
      .start()
    try {
      // session 1 of user 7 is flushed purely by the timeout (other users'
      // traffic advances the watermark), then user 7 RETURNS. The returned
      // session must be id 2 — losing the counter with the flushed state
      // would re-emit (7, 1) and corrupt any downstream keyed by
      // (user_id, session_id).
      val B = 100 * h
      ms.addData(Ev(7, 1, B))
      q.processAllAvailable()
      ms.addData(Ev(8, 1, B + 100 * h)) // advance watermark past B + 4h
      q.processAllAvailable()
      ms.addData(Ev(8, 2, B + 101 * h)) // next batch fires the timeout
      q.processAllAvailable()
      val afterFlush = spark.table("fmgs_tombstone_out").as[SessionOut].collect().toSet
      assert(afterFlush.contains(SessionOut(7, 1, 1, 0)), s"flush missing: $afterFlush")
      // user 7 returns (above the current watermark) and closes a session
      // by gap within later batches
      ms.addData(Ev(7, 10, B + 102 * h), Ev(7, 11, B + 110 * h)) // 8h gap closes
      q.processAllAvailable()
      val rows = spark.table("fmgs_tombstone_out").as[SessionOut].collect()
      assert(rows.count(s => s.user_id == 7 && s.session_id == 1) == 1,
        s"duplicate (user 7, session 1): $rows")
      assert(rows.exists(s => s.user_id == 7 && s.session_id == 2 && s.n_events == 1),
        s"returned session should be id 2: $rows")
    } finally q.stop()
  }

  test("declarative session_window runs as a real stream with watermark eviction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val h = 3600L * 1000000
    val ms = MemoryStream[Ev]
    val stream = ms.toDF()
      .select($"user_id", $"event_id", F.timestamp_micros($"tus").as("ts"))
      .withWatermark("ts", "1 second")
    val q = SessionizeStream.sessionWindows(stream, "4 hours")
      .writeStream.format("memory").queryName("sw_out").outputMode("append")
      .start()
    try {
      ms.addData(Ev(1, 1, 0), Ev(1, 2, 1 * h), Ev(1, 3, 10 * h), Ev(2, 1, 0))
      q.processAllAvailable()
      // sentinel far-future events push the watermark past every session end
      ms.addData(Ev(1, 99, 1000 * h), Ev(2, 99, 1000 * h))
      q.processAllAvailable()
      ms.addData(Ev(1, 100, 2000 * h)) // one more batch applies the watermark
      q.processAllAvailable()
      val rows = spark.table("sw_out")
        .select("user_id", "n_events", "span_us").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // closed: user1 session {t0, t0+1h} (span 1h), session {t0+10h} (span 0),
      // user2 session {t0}; sentinel sessions are still open → not emitted
      assert(rows == Set((1L, 2L, 1 * h), (1L, 1L, 0L), (2L, 1L, 0L)))
    } finally q.stop()
  }
}
