package graft

import graft.streaming.WeightedReservoirStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

/** Streaming A-ES weighted reservoir: the oracle-gated batch p46 is the
  * ground truth — the reservoir is a deterministic function of the row
  * SET (top-k of a merge = top-k of the union), so the streamed selection
  * after the last micro-batch must EQUAL batch p46 over the fed rows,
  * however the rows were batched. Also proves the state contract (O(k)
  * per group) and re-ingest idempotence (identical triples dedup). */
class StreamingWeightedReservoirSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  /** lang -> picks as (doc_id, weight, key_u) in rank order. */
  private def picksOf(df: org.apache.spark.sql.DataFrame): Map[String, Seq[(Long, Long, Long)]] =
    df.select(F.col("lang"), F.explode(F.col("picks")).as("p"))
      .select("lang", "p.doc_id", "p.weight", "p.key_u")
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq)
      .toMap

  private def p46Truth(): Map[String, Seq[(Long, Long, Long)]] =
    pipeline.PipelineOps.queries("p46_weighted_sample")(spark, dir)
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.sortBy(_.getLong(1))
        .map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSeq)
      .toMap

  test("batch path equals the oracle-gated p46 selection per language") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val got = picksOf(WeightedReservoirStream.weightedSampleByGroup(
      docs, "lang", "doc_id", "n_chars"))
    assert(got == p46Truth(),
      "the aggregate reservoir must select exactly the p46 sample, in rank order")
  }

  test("input validation: missing columns and bad k are named errors") {
    import spark.implicits._
    val df = Seq(("en", 1L, 10L)).toDF("lang", "doc_id", "n_chars")
    val e1 = intercept[IllegalArgumentException](
      WeightedReservoirStream.weightedSampleByGroup(df, "language", "doc_id", "n_chars"))
    assert(e1.getMessage.contains("missing column 'language'"))
    val e2 = intercept[IllegalArgumentException](
      WeightedReservoirStream.weightedSampleByGroup(df, "lang", "doc_id", "n_chars", k = 0))
    assert(e2.getMessage.contains("k must be >= 1"))
  }

  test("streamed reservoir merges across micro-batches to the exact batch selection") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = spark.read.parquet(s"$dir/documents.parquet")
      .select("lang", "doc_id", "n_chars").as[(String, Long, Long)].collect().toSeq
    // uneven batches; last row re-fed in batch 3 to prove re-ingest is a no-op
    val (b1, rest) = all.splitAt(11)
    val (b2, b3raw) = rest.splitAt(200)
    val b3 = b3raw ++ b1.take(3)
    val in = MemoryStream[(String, Long, Long)]
    val docs = in.toDS().toDF("lang", "doc_id", "n_chars")
    val q = WeightedReservoirStream.weightedSampleByGroup(docs, "lang", "doc_id", "n_chars")
      .writeStream.format("memory").queryName("aes_out").outputMode("complete")
      .start()
    try {
      in.addData(b1); q.processAllAvailable()
      val afterB1 = picksOf(spark.table("aes_out"))
      val batchB1 = picksOf(WeightedReservoirStream.weightedSampleByGroup(
        b1.toDF("lang", "doc_id", "n_chars"), "lang", "doc_id", "n_chars"))
      assert(afterB1 == batchB1,
        "after one micro-batch the stream must equal the batch over that prefix")
      in.addData(b2); q.processAllAvailable()
      in.addData(b3); q.processAllAvailable()
      val streamed = picksOf(spark.table("aes_out"))
      assert(streamed == p46Truth(),
        "cross-batch reservoir merge must reproduce the batch p46 selection exactly")
      // state contract: never more than k picks per group
      assert(streamed.values.forall(_.length <= 8))
    } finally q.stop()
  }
}
