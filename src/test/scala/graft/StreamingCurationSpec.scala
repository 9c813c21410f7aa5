package graft

import graft.streaming.CurationStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** The composed streaming curation funnel (dedup → p20's quality gate →
  * per-language quota): batch degradation equals a single-SQL oracle on
  * real data, the streamed funnel is row-identical to the batch call
  * across shuffled micro-batch boundaries under the ordered-feed contract,
  * and the composition ORDER is proven — a duplicate never re-enters, a
  * rejected document never consumes quota. */
class StreamingCurationSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  import StreamingCurationSpec.C

  /** Real gate documents + planted exact duplicates (same text, higher id,
    * later ts) so the dedup stage is provably live; ts monotone in doc_id =
    * the ordered-feed contract. */
  private def fixture = {
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text")
      .withColumn("ts", F.expr("timestamp_micros(doc_id * 1000000)"))
    val dups = base.where("doc_id % 11 = 0")
      .withColumn("doc_id", F.expr("doc_id + 100000"))
      .withColumn("ts", F.expr("timestamp_micros(doc_id * 1000000)"))
    base.unionByName(dups)
  }

  test("batch funnel equals the dedup→gate→quota SQL oracle on real documents") {
    val in = fixture
    in.createOrReplaceTempView("cur_in")
    val got = CurationStream.curate(in, "text", "doc_id", "lang", "ts", "1 hour", 5L)
      .collect().map(k => (k.group, k.doc_id, k.taken_rank)).toSet
    val oracle = spark.sql(s"""
      WITH d AS (
        SELECT *, row_number() OVER (
          PARTITION BY md5(lower(trim(text))) ORDER BY ts, doc_id) AS rn
        FROM cur_in),
      w AS (
        SELECT doc_id, lang, split(trim(text), '\\\\s+') AS words
        FROM d WHERE rn = 1),
      m AS (
        SELECT doc_id, lang, ${graft.pipeline.PipelineOps.QualityMetricsSql.mkString(", ")}
        FROM w WHERE size(words) > 0),
      g AS (SELECT doc_id, lang FROM m WHERE ${graft.pipeline.PipelineOps.QualityPredSql}),
      r AS (SELECT lang, doc_id,
        row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rk FROM g)
      SELECT lang, doc_id, CAST(rk AS BIGINT) AS rk FROM r WHERE rk <= 5""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == oracle)
    assert(got.nonEmpty, "gate corpus should admit documents")
    // the planted duplicates must all have lost to their originals
    assert(!got.exists(_._2 >= 100000L), "a duplicate copy slipped past dedup")
  }

  test("streamed funnel == batch funnel across shuffled micro-batch boundaries (ordered feed)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = fixture.collect().map(r =>
      C(r.getLong(0), r.getString(1), r.getString(2), r.getTimestamp(3)))
    // The ordered-feed contract, stated per CONTENT GROUP: each group's
    // event-time winner arrives before the group's other members. Two
    // same-content rows inside ONE micro-batch have no arrival order at all
    // (the dedup shuffle decides), so the contract — like AsofJoinStream's —
    // is about batch boundaries: winners here, echoes later.
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.toLowerCase.trim.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val winners = rows.groupBy(c => md5hex(c.text)).values
      .map(_.minBy(c => (c.ts.getTime, c.doc_id))).toSeq.sortBy(_.doc_id)
    val echoes = {
      val w = winners.map(_.doc_id).toSet
      rows.filterNot(c => w(c.doc_id)).sortBy(c => (c.ts.getTime, c.doc_id)).toSeq
    }
    val batch = CurationStream
      .curate(fixture, "text", "doc_id", "lang", "ts", "1 hour", 5L)
      .collect().map(k => (k.group, k.doc_id, k.taken_rank)).toSet
    val in = MemoryStream[C]
    val q = CurationStream
      .curate(in.toDF(), "text", "doc_id", "lang", "ts", "1 hour", 5L)
      .writeStream.format("memory").queryName("curation_out").outputMode("append")
      .start()
    try {
      // three batches: winners split across a boundary (quota state must
      // carry), then every duplicate echo (dedup state must hold)
      val feed = Seq(winners.take(winners.length / 2),
        winners.drop(winners.length / 2), echoes)
      for (b <- feed if b.nonEmpty) {
        in.addData(b.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("curation_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch,
        s"streamed-batch drift: only-streamed=${(streamed -- batch).take(5)} " +
          s"only-batch=${(batch -- streamed).take(5)}")
    } finally q.stop()
  }

  test("composition order: duplicates never re-enter, rejected docs never consume quota") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def goodText(seed: Int) =
      ("the" +: (1 to 29).map(i => s"w${seed}_$i")).mkString(" ") // 30 tokens, gate-passing
    val badText = "hello world" // 2 tokens — fails the gate
    def ts(s: Long) = new Timestamp(s * 1000L)
    val in = MemoryStream[C]
    val q = CurationStream.curate(in.toDF(), "text", "doc_id", "lang", "ts", "1 hour", 2L)
      .writeStream.format("memory").queryName("curation_law").outputMode("append")
      .start()
    try {
      def kept = spark.table("curation_law").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      // batch 1: a rejected doc arrives FIRST — it must not hold a slot
      in.addData(C(1, "en", badText, ts(1)), C(2, "en", goodText(2), ts(2)))
      q.processAllAvailable()
      assert(kept == Set(("en", 2L, 1L)), "a gate-rejected doc consumed quota")
      // batch 2: a later duplicate of the ADMITTED doc 2 — dedup drops it,
      // so the last slot stays open for the fresh doc 4
      in.addData(C(3, "en", goodText(2), ts(3)), C(4, "en", goodText(4), ts(4)))
      q.processAllAvailable()
      assert(kept == Set(("en", 2L, 1L), ("en", 4L, 2L)),
        "a duplicate re-entered the funnel or blocked a fresh admission")
      // batch 3: quota closed — a fresh quality doc is refused
      in.addData(C(5, "en", goodText(5), ts(5)))
      q.processAllAvailable()
      assert(kept.size == 2, "a full language admitted past its quota")
      // and a duplicate of the REJECTED doc 1: dedup's first-arrival state
      // (not the gate) already owns that content — still nothing admitted
      in.addData(C(6, "zh", badText, ts(6)))
      q.processAllAvailable()
      assert(!kept.exists(_._1 == "zh"),
        "a duplicate of a rejected doc entered through a different language")
    } finally q.stop()
  }

  test("input validation: missing columns and a words collision are named errors") {
    val docs = fixture
    val e1 = intercept[IllegalArgumentException](
      CurationStream.curate(docs, "no_col", "doc_id", "lang", "ts", "1 hour", 5L))
    assert(e1.getMessage.contains("no_col"))
    val e2 = intercept[IllegalArgumentException](
      CurationStream.curate(docs.withColumn("words", F.lit(1)),
        "text", "doc_id", "lang", "ts", "1 hour", 5L))
    assert(e2.getMessage.contains("words"))
  }
}

object StreamingCurationSpec {
  final case class C(doc_id: Long, lang: String, text: String, ts: Timestamp)
}
