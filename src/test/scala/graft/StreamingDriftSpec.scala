package graft

import graft.streaming.DriftStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

/** Streaming drift monitor: the batch path must reproduce batch p81's KS
  * exactly when the reference is another source's own grid (the anti-drift
  * law — same ECDF arithmetic, independent constructions); the streamed
  * scores must equal the batch scores window-for-window once the watermark
  * closes them, each window scoring exactly once. */
class StreamingDriftSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  test("batch path with ref = src_b's grid equals batch p81's KS for every pair with src_b") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("ts", F.timestamp_micros(F.lit(0L)))
    val refSrc = "src1"
    val ref = DriftStream.referenceGrid(docs.filter(F.col("source") === refSrc), "text")
    val got = DriftStream.scoresBatch(docs.filter(F.col("source") =!= refSrc),
        "text", "source", "ts", "365 days", ref)
      .collect().map(r => r.getString(1) -> r.getLong(4)).toMap
    val p81 = pipeline.PipelineOps.queries("p81_dist_drift")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(4)))
      .collect { case (a, b, ks) if a == refSrc => b -> ks
                 case (a, b, ks) if b == refSrc => a -> ks }.toMap
    assert(got.nonEmpty && got == p81,
      s"drift-vs-reference must equal p81's pairwise KS:\ngot $got\nexp $p81")
  }

  test("streamed windows equal the batch scores and score exactly once; late data drops") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val m = 60L * 1000000 // one minute in µs
    val H = 60 * m        // one window
    val B = 100L * H
    def txt(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val rows = Seq(
      // window 0: srcA short docs, srcB long docs
      (B + 1 * m, "srcA", txt(3)), (B + 2 * m, "srcA", txt(4)),
      (B + 3 * m, "srcB", txt(9)), (B + 4 * m, "srcB", txt(10)),
      // window 1: srcA drifts long
      (B + H + 1 * m, "srcA", txt(9)), (B + H + 2 * m, "srcA", txt(11)))
    val ref = Seq((3L, 2L), (4L, 3L), (5L, 1L)) // short-doc reference grid
    val staticDocs = rows.toDF("tus", "source", "text")
      .select(F.timestamp_micros($"tus").as("ts"), $"source", $"text")
    val expected = DriftStream.scoresBatch(staticDocs, "text", "source", "ts",
        "1 hour", ref)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

    val in = MemoryStream[StreamingDriftSpec.D]
    val docs = in.toDS()
      .select(F.timestamp_micros($"tus").as("ts"), $"source", $"text")
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(java.sql.Timestamp, String, Long, Long, Long)]
    val q = DriftStream.start(docs, "text", "source", "ts",
      windowDur = "1 hour", watermarkDelay = "10 minutes", ref = ref,
      sink = df => out ++= df.collect().map(r => (r.getTimestamp(0),
        r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    try {
      def feed(rs: (Long, String, String)*): Unit = {
        in.addData(rs.map { case (t, s, x) => StreamingDriftSpec.D(t, s, x) }: _*)
        q.processAllAvailable()
      }
      feed(rows.take(4).map(r => (r._1, r._2, r._3)): _*) // window 0 fills
      assert(out.isEmpty, "no window may score before the watermark closes it")
      feed(rows.drop(4).map(r => (r._1, r._2, r._3)): _*) // window 1 fills, closes window 0
      // a far-future heartbeat closes window 1
      feed((B + 10 * H, "srcZ", txt(3)))
      val scored = out.filter(_._2 != "srcZ").toSet
      val exp = expected.filter(_._2 != "srcZ")
      assert(scored == exp, s"streamed scores must equal batch:\ngot $scored\nexp $exp")
      // a late arrival for the long-closed window 0 is behind the
      // watermark: dropped, the window does NOT re-score
      val sizeBefore = out.size
      feed((B + 5 * m, "srcA", txt(3)))
      feed((B + 11 * H, "srcZ", txt(3)))
      assert(out.count(_._2 == "srcA") == out.take(sizeBefore).count(_._2 == "srcA"),
        s"closed window re-scored on late data: $out")
    } finally q.stop()
  }

  test("an over-cap reference grid is a named error, never a driver OOM") {
    import spark.implicits._
    val static = Seq((0L, "s", "a b c")).toDF("tus", "source", "text")
      .select(F.timestamp_micros($"tus").as("ts"), $"source", $"text")
    val huge = (1L to (DriftStream.RefGridCap + 1L)).map(v => (v, 1L))
    val e = intercept[IllegalArgumentException](
      DriftStream.scoresBatch(static, "text", "source", "ts", "1 hour", huge))
    assert(e.getMessage.contains("plan-literal boundary"), e.getMessage)
  }

  test("two concurrent monitors keep their own references (no view collision)") {
    // r11 ADVICE: a fixed global/local ref view name let one monitor score
    // against the OTHER's reference. Two batch scorers with different refs,
    // both LAZY until after the second registers, must each use their own.
    import spark.implicits._
    val docs = Seq((0L, "s", (1 to 4).map(i => s"w$i").mkString(" ")))
      .toDF("tus", "source", "text")
      .select(F.timestamp_micros($"tus").as("ts"), $"source", $"text")
    val refSame = Seq((4L, 5L))             // matches the doc: KS = 0
    val refFar = Seq((100L, 5L))            // disjoint: KS = 1e6 ppm
    val a = DriftStream.scoresBatch(docs, "text", "source", "ts", "1 hour", refSame)
    val b = DriftStream.scoresBatch(docs, "text", "source", "ts", "1 hour", refFar)
    // evaluate AFTER both registered — a fixed view name would make both see refFar
    val ksA = a.collect().map(_.getLong(4)).toSeq
    val ksB = b.collect().map(_.getLong(4)).toSeq
    assert(ksA == Seq(0L), s"monitor A lost its reference: $ksA")
    assert(ksB == Seq(1000000L), s"monitor B: $ksB")
  }

  test("input validation: static input to start, empty reference are named errors") {
    import spark.implicits._
    val static = Seq((0L, "s", "a b c")).toDF("tus", "source", "text")
      .select(F.timestamp_micros($"tus").as("ts"), $"source", $"text")
    val e = intercept[IllegalArgumentException](
      DriftStream.start(static, "text", "source", "ts", "1 hour", "10 minutes",
        Seq((1L, 1L)), _ => ()))
    assert(e.getMessage.contains("streaming input"))
    val e2 = intercept[IllegalArgumentException](
      DriftStream.scoresBatch(static, "text", "source", "ts", "1 hour", Seq.empty))
    assert(e2.getMessage.contains("non-empty"))
    val e3 = intercept[IllegalArgumentException](
      DriftStream.scoresBatch(static.drop("source"), "text", "source", "ts",
        "1 hour", Seq((1L, 1L))))
    assert(e3.getMessage.contains("missing column 'source'"))
  }
}

object StreamingDriftSpec {
  final case class D(tus: Long, source: String, text: String)
}
