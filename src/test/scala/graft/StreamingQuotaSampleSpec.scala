package graft

import graft.streaming.QuotaSampleStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

/** Streaming per-group quota sampling: the batch path equals a window
  * row_number oracle on real data, and a MemoryStream drive proves the
  * quota fills ACROSS micro-batches (state carries the running count) and
  * closes exactly at the cap. */
class StreamingQuotaSampleSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  test("batch path equals the window row_number quota oracle") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val quota = 5L
    val got = QuotaSampleStream.quotaSample(docs, "lang", "doc_id", quota)
      .collect().map(k => (k.group, k.doc_id, k.taken_rank)).toSet
    docs.createOrReplaceTempView("documents")
    val oracle = spark.sql(s"""
      SELECT lang, doc_id,
        row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM documents""").filter(F.col("rn") <= quota)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2).toLong)).toSet
    assert(got == oracle, "batch quota sample must be each group's lowest-id prefix")
  }

  test("input validation: missing columns and bad quota are named errors") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val e1 = intercept[IllegalArgumentException](
      QuotaSampleStream.quotaSample(docs, "no_col", "doc_id", 5))
    assert(e1.getMessage.contains("no_col"))
    val e2 = intercept[IllegalArgumentException](
      QuotaSampleStream.quotaSample(docs, "lang", "doc_id", 0))
    assert(e2.getMessage.contains("quota"))
  }

  import StreamingQuotaSampleSpec.D

  test("streamed quota fills across micro-batches and closes at the cap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[D]
    val q = QuotaSampleStream.quotaSample(in.toDF(), "lang", "doc_id", 4)
      .writeStream.format("memory").queryName("quota_out").outputMode("append")
      .start()
    try {
      def kept = spark.table("quota_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      // batch 1: en has room for all 3 (ranks 1-3, doc_id order not arrival order)
      in.addData(D("en", 30), D("en", 10), D("en", 20))
      q.processAllAvailable()
      assert(kept == Set(("en", 10L, 1L), ("en", 20L, 2L), ("en", 30L, 3L)))
      // batch 2: en has ONE slot left — lowest id of the batch takes it;
      // zh opens fresh
      in.addData(D("en", 50), D("en", 40), D("zh", 7))
      q.processAllAvailable()
      assert(kept == Set(("en", 10L, 1L), ("en", 20L, 2L), ("en", 30L, 3L),
        ("en", 40L, 4L), ("zh", 7L, 1L)))
      // batch 3: en is full — nothing admitted, state holds
      in.addData(D("en", 5))
      q.processAllAvailable()
      assert(kept.count(_._1 == "en") == 4, "a full group admits nothing")
    } finally q.stop()
  }
}

object StreamingQuotaSampleSpec {
  final case class D(lang: String, doc_id: Long)
}
