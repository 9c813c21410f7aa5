package graft

import graft.streaming.IntervalJoinStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval join: the batch run of the SAME function is the
  * oracle (checked against an independent SQL join over real testdata),
  * and a two-MemoryStream drive proves streamed matches equal the batch
  * join while rows behind the watermark are dropped — i.e. join state is
  * actually evicted, the property that keeps the operator's state bounded
  * on an unbounded feed. */
class StreamingIntervalJoinSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  private def eventsDf = {
    import spark.implicits._
    Graft.normalizeEventTime(spark.read.parquet(s"$dir/events.parquet"))
      .select($"user_id", $"event_type", $"value", $"ts")
  }

  test("batch interval join equals an independent SQL range-join oracle") {
    val ev = eventsDf
    ev.createOrReplaceTempView("ev_ij")
    val types = ev.select("event_type").distinct().collect().map(_.getString(0)).sorted
    assert(types.length >= 2, s"need two event types, got ${types.mkString(",")}")
    val (tA, tB) = (types(0), types(1))
    val oracle = spark.sql(
      s"""SELECT a.user_id, a.ts AS view_ts, b.ts AS buy_ts,
         |       a.value AS view_value, b.value AS buy_value
         |FROM ev_ij a JOIN ev_ij b
         |  ON a.user_id = b.user_id
         | AND b.ts BETWEEN a.ts AND a.ts + INTERVAL 2 HOURS
         |WHERE a.event_type = '$tA' AND b.event_type = '$tB'""".stripMargin)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getDouble(3), r.getDouble(4))).sorted
    val got = IntervalJoinStream.viewToBuyAttribution(
        ev.where(F.col("event_type") === tA),
        ev.where(F.col("event_type") === tB), within = "2 hours")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getDouble(3), r.getDouble(4))).sorted
    assert(oracle.nonEmpty, "oracle join produced no pairs — test data too sparse")
    assert(got.toSeq == oracle.toSeq,
      s"${got.length} streamed-shape rows vs ${oracle.length} oracle rows")
  }

  test("intervalJoin rejects bad inputs with named errors (ADVICE r6 #4)") {
    import spark.implicits._
    val ok = Seq((1L, java.sql.Timestamp.valueOf("2022-01-01 00:00:00"), 1.0))
      .toDF("user_id", "ts", "value")
    def join(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
      IntervalJoinStream.intervalJoin(l, r, key = "user_id", tsCol = "ts",
        lower = "0 seconds", upper = "1 hour", watermarkDelay = "5 minutes")
    // missing key / ts column, either side
    val noKey = ok.withColumnRenamed("user_id", "uid")
    val e1 = intercept[IllegalArgumentException](join(noKey, ok))
    assert(e1.getMessage.contains("left input is missing column 'user_id'"))
    val noTs = ok.withColumnRenamed("ts", "event_time")
    val e2 = intercept[IllegalArgumentException](join(ok, noTs))
    assert(e2.getMessage.contains("right input is missing column 'ts'"))
    // a left column literally named like an _r-suffixed output previously
    // died as an ambiguous-attribute analyzer error at a distance
    val clash = ok.withColumn("ts_r", F.col("ts"))
    val e3 = intercept[IllegalArgumentException](join(clash, ok))
    assert(e3.getMessage.contains("ts_r") && e3.getMessage.contains("collide"))
    // valid inputs still pass validation and join
    assert(join(ok, ok).columns.contains("ts_r"))
  }

  import StreamingIntervalJoinSpec.E

  test("streamed matches equal the batch join; late rows are dropped (state evicted)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val m = 60L * 1000000 // one minute in µs
    val views = MemoryStream[E]
    val buys = MemoryStream[E]
    def ds(ms: MemoryStream[E]) = ms.toDS()
      .select($"user_id", F.timestamp_micros($"tus").as("ts"), $"value")
    val q = IntervalJoinStream.viewToBuyAttribution(
        ds(views), ds(buys), within = "30 minutes", watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("ij_out").outputMode("append")
      .start()
    try {
      val B = 1000 * m
      // view@B matches buy@B+10m (in window) but not buy@B+45m (outside)
      views.addData(E(1, B, 1.0))
      buys.addData(E(1, B + 10 * m, 10.0), E(1, B + 45 * m, 20.0))
      // different user: no match
      buys.addData(E(2, B + 5 * m, 30.0))
      q.processAllAvailable()
      val first = spark.table("ij_out").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000,
          r.getTimestamp(2).getTime * 1000, r.getDouble(3), r.getDouble(4)))
        .toSet
      assert(first == Set((1L, B, B + 10 * m, 1.0, 10.0)),
        s"expected exactly the in-window pair, got $first")

      // advance the watermark on BOTH streams far past B + 30m + 5m slack…
      views.addData(E(9, B + 120 * m, 0.0))
      buys.addData(E(9, B + 120 * m + 1, 0.0))
      q.processAllAvailable()
      val afterAdvance = spark.table("ij_out").count()
      // …then a LATE buy that would have matched view@B arrives: the view's
      // state is evicted and the late row is behind the watermark — dropped
      buys.addData(E(1, B + 20 * m, 99.0))
      q.processAllAvailable()
      assert(spark.table("ij_out").count() == afterAdvance,
        "late row behind the watermark produced a match — state not evicted")
      assert(!spark.table("ij_out").collect().exists(_.getDouble(4) == 99.0))
    } finally q.stop()
  }
}

object StreamingIntervalJoinSpec {
  final case class E(user_id: Long, tus: Long, value: Double)
}
