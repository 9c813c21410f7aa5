package graft

import graft.streaming.BloomDedupStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

/** BloomDedupStream: horizonless duplicate suppression under fixed-size
  * state. The contract split vs DedupStream: a bloom NEVER false-negatives
  * (true duplicates drop at ANY distance — no watermark re-admission),
  * while a false positive may drop a new doc with ~fpp odds (none fire at
  * the test geometry, so admissions equal the exact distinct set). */
class StreamingBloomDedupSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  private def exactHashes(rows: Seq[(String, Long)]): Set[Long] = {
    import spark.implicits._
    rows.toDF("text", "doc_id")
      .select(BloomDedupStream.contentHash("text").as("h"))
      .distinct().collect().map(_.getLong(0)).toSet
  }

  test("batch degradation: first arrival per content hash, exact distinct set") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val out = BloomDedupStream.dedupByBloom(docs, "text", "doc_id").collect()
    val all = docs.select("text", "doc_id").as[(String, Long)].collect().toSeq
    assert(out.map(_.content_hash).toSet == exactHashes(all),
      "admitted hashes must be exactly the distinct content hashes")
    assert(out.map(_.content_hash).distinct.length == out.length,
      "one admission per hash")
  }

  test("input validation: missing columns and bad geometry are named errors") {
    import spark.implicits._
    val df = Seq(("a", 1L)).toDF("text", "doc_id")
    val e1 = intercept[IllegalArgumentException](
      BloomDedupStream.dedupByBloom(df, "body", "doc_id"))
    assert(e1.getMessage.contains("missing column 'body'"))
    val e2 = intercept[IllegalArgumentException](
      BloomDedupStream.dedupByBloom(df, "text", "doc_id", fpp = 0.9))
    assert(e2.getMessage.contains("fpp must be in"))
  }

  test("streamed: duplicates drop at any batch distance; re-fed corpus admits nothing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = spark.read.parquet(s"$dir/documents.parquet")
      .select("text", "doc_id").as[(String, Long)].collect().toSeq
    val (b1, b2) = all.splitAt(100)
    // batch 3 re-feeds EVERYTHING with new ids — every row is a duplicate
    // of something admitted one or two batches ago (far past any
    // plausible watermark horizon)
    val b3 = all.map { case (t, id) => (t, id + 100000L) }
    val in = MemoryStream[(String, Long)]
    val docs = in.toDS().toDF("text", "doc_id")
    val q = BloomDedupStream.dedupByBloom(docs, "text", "doc_id")
      .writeStream.format("memory").queryName("bloom_dedup_out")
      .outputMode("append").start()
    try {
      in.addData(b1); q.processAllAvailable()
      val after1 = spark.table("bloom_dedup_out").collect().length
      assert(after1 == exactHashes(b1).size)
      in.addData(b2); q.processAllAvailable()
      val after2 = spark.table("bloom_dedup_out").collect()
      assert(after2.length == exactHashes(all).size,
        "batch-2 admissions = hashes not seen in batch 1")
      in.addData(b3); q.processAllAvailable()
      val after3 = spark.table("bloom_dedup_out").collect()
      assert(after3.length == after2.length,
        "a horizonless sketch admits NOTHING from a full re-feed")
      assert(after3.map(r => r.getLong(1)).toSet == exactHashes(all),
        "admitted set is exactly the distinct content of the stream")
    } finally q.stop()
  }
}
