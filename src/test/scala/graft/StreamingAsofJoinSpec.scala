package graft

import graft.streaming.AsofJoinStream
import graft.streaming.AsofJoinStream.{Ev, Match}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming as-of join: batch p34 is the oracle. Under the per-key
  * chronological-feed contract the streamed match stream must be
  * row-identical to the batch operator over the union of fed events —
  * including matches that reach across many micro-batches — and the
  * p34 tie rules (views before clicks at the same instant, simultaneous
  * views to the max event_id) must hold inside a shuffled micro-batch. */
class StreamingAsofJoinSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  test("batch path equals the p34 operator on the real events table") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ev = graft.Graft.normalizeEventTime(spark.read.parquet(s"$dir/events.parquet"))
      .select($"event_id", $"user_id", unix_micros($"ts").as("tus"), $"event_type")
    val got = AsofJoinStream.matchClicks(ev).collect()
      .map(m => (m.click_id, m.user_id, m.view_id, m.lag_us)).toSet
    val p34 = pipeline.PipelineOps.queries("p34_asof_join")(spark, dir).collect()
      .map { r =>
        (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))
      }.toSet
    assert(got == p34, "batch degradation must be the p34 window formulation")
  }

  test("input validation: missing columns are named errors") {
    import spark.implicits._
    val df = Seq((1L, 2L, 3L)).toDF("event_id", "user_id", "tus")
    val e = intercept[IllegalArgumentException](AsofJoinStream.matchClicks(df))
    assert(e.getMessage.contains("missing column 'event_type'"))
  }

  test("streamed matches equal batch p34 over chronologically-fed real events") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.Graft.normalizeEventTime(spark.read.parquet(s"$dir/events.parquet"))
      .select($"event_id", $"user_id", unix_micros($"ts").as("tus"), $"event_type")
      .where($"event_type".isin("click", "view"))
      .as[Ev].collect().sortBy(_.tus)
    // three chronological micro-batches (the per-key ordered-feed
    // contract), shuffled WITHIN each batch to prove intra-batch order
    // does not matter; cuts advance past timestamp ties so no same-instant
    // group straddles a batch boundary (a same-tus view arriving after
    // its click's batch would be a contract violation, not a bug)
    def tieSafe(i: Int): Int = {
      var c = i
      while (c > 0 && c < ev.length && ev(c).tus == ev(c - 1).tus) c += 1
      c
    }
    val cut1 = tieSafe(ev.length / 3); val cut2 = tieSafe(2 * ev.length / 3)
    val batches = Seq(ev.slice(0, cut1), ev.slice(cut1, cut2), ev.slice(cut2, ev.length))
      .map(b => new scala.util.Random(7).shuffle(b.toSeq))
    val in = MemoryStream[Ev]
    val q = AsofJoinStream.matchClicks(in.toDF())
      .writeStream.format("memory").queryName("asof_out").outputMode("append")
      .start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      val streamed = spark.table("asof_out").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
      val batch = pipeline.PipelineOps.queries("p34_asof_join")(spark, dir).collect()
        .map { r =>
          (r.getLong(0), r.getLong(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2)),
            if (r.isNullAt(3)) None else Some(r.getLong(3)))
        }.toSet
      assert(streamed == batch,
        s"streamed (${streamed.size}) must equal batch p34 (${batch.size})")
    } finally q.stop()
  }

  test("cross-batch match and same-instant tie rules") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = AsofJoinStream.matchClicks(in.toDF())
      .writeStream.format("memory").queryName("asof_tie").outputMode("append")
      .start()
    try {
      def rows = spark.table("asof_tie").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
      // batch 1: a click with NO prior view -> null match; then two
      // simultaneous views (ids 5, 7) — 7 must win; a view-then-click at
      // the SAME instant — the view counts (views sort first)
      in.addData(Seq(
        Ev(1, 10, 100, "click"),
        Ev(5, 10, 200, "view"), Ev(7, 10, 200, "view"),
        Ev(8, 10, 300, "click"), Ev(6, 10, 300, "view")))
      q.processAllAvailable()
      assert(rows(1L).isEmpty, "click before any view matches nothing")
      assert(rows(8L) == Some(6L),
        "same-instant view sorts before the click and wins over older views")
      // batch 2, much later: the click must match state carried from
      // batch 1 (view 6 at tus 300 — the latest)
      in.addData(Seq(Ev(9, 10, 9000, "click")))
      q.processAllAvailable()
      assert(rows(9L) == Some(6L), "state must carry the best view across batches")
      // a second user's state is independent
      in.addData(Seq(Ev(11, 20, 9500, "click")))
      q.processAllAvailable()
      assert(rows(11L).isEmpty, "per-user state must not leak across keys")
    } finally q.stop()
  }
}
