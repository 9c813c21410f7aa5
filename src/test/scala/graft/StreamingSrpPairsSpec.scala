package graft

import graft.streaming.SrpPairsStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

/** SrpPairsStream: streaming SRP-LSH embedding near-dup pairs (p22's
  * ingest counterpart, exact-cosine verify in bounded state). Contracts:
  * streamed pairs over shuffled uneven micro-batches equal the batch band
  * self-join replica when nothing evicts; the un-capped batch path covers
  * batch p08's capped output at the same geometry and threshold; the
  * watermark horizon evicts for real. */
class StreamingSrpPairsSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  private def vecsWithTs() =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(F.col("vec_id"), F.col("embedding"))
      .withColumn("ts", F.expr("timestamp_seconds(1700000000 + vec_id)"))

  test("input validation: missing columns and bad threshold are named errors") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0f, 0.0f), new java.sql.Timestamp(0L)))
      .toDF("vec_id", "embedding", "ts")
    val e1 = intercept[IllegalArgumentException](
      SrpPairsStream.pairs(df, "vecs", "vec_id", "ts"))
    assert(e1.getMessage.contains("missing column 'vecs'"))
    val e2 = intercept[IllegalArgumentException](
      SrpPairsStream.pairs(df, "embedding", "vec_id", "ts", minCos = 1.5))
    assert(e2.getMessage.contains("minCos"))
  }

  test("batch path covers p08's capped pairs at the same geometry and threshold") {
    // p08 at sf0.001 derives (r, b) = (4, 8) — the stream's default — and
    // emits cos >= 0.2 pairs THROUGH a per-bucket candidate cap; the
    // stream replica is un-capped, so its pair set must be a superset
    val ours = SrpPairsStream.pairs(vecsWithTs(), "embedding", "vec_id", "ts",
      minCos = 0.2).collect().map(p => (p.ida, p.idb)).toSet
    val p08 = graft.pipeline.PipelineOps.queries("p08_ann_srp_lsh")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p08.nonEmpty, "fixture corpus lost its SRP pairs")
    val missing = p08.diff(ours)
    assert(missing.isEmpty,
      s"stream batch path lost ${missing.size} of p08's ${p08.size} pairs: ${missing.take(5)}")
  }

  test("streamed over shuffled uneven batches == batch replica when nothing evicts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = vecsWithTs().collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getTimestamp(2))).toSeq
    val expected = SrpPairsStream.pairs(vecsWithTs(), "embedding", "vec_id", "ts")
      .collect().map(p => (p.bkey, p.ida, p.idb, p.cos)).sorted.toSeq
    val shuffled = rows.sortBy(r => graft.functions.GraftMd5Util.h32(
      org.apache.spark.unsafe.types.UTF8String.fromString(r._1.toString)))
    val batches = Seq(shuffled.take(31), shuffled.slice(31, 200), shuffled.drop(200))
    val in = MemoryStream[(Long, Seq[Float], java.sql.Timestamp)]
    val vecs = in.toDS().toDF("vec_id", "embedding", "ts")
      .withColumn("embedding", F.col("embedding").cast("array<float>"))
    val q = SrpPairsStream.pairs(vecs, "embedding", "vec_id", "ts",
      watermarkDelay = "365 days")
      .writeStream.format("memory").queryName("srp_pairs_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      val got = spark.table("srp_pairs_out").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sorted.toSeq
      assert(got == expected,
        s"streamed pair set diverged: ${got.length} vs ${expected.length} rows; " +
          s"first diff ${got.zip(expected).find(p => p._1 != p._2)}")
    } finally q.stop()
  }

  test("zero-norm embeddings pair with nothing on BOTH paths (ADVICE r8)") {
    // cosine of a zero vector is 0/0 = NaN; Spark SQL's NaN ordering
    // (NaN > everything) would keep it past `cos >= minCos` while the
    // streaming Scala compare drops it — both paths must drop it
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val zero = Seq.fill(64)(0.0f)
    val v = Seq.tabulate(64)(i => if (i % 3 == 0) 1.0f else -0.5f)
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    val batchIn = Seq((1L, zero, ts(0)), (2L, v, ts(1)), (3L, v, ts(2)))
      .toDF("vec_id", "embedding", "ts")
      .withColumn("embedding", F.col("embedding").cast("array<float>"))
    val batchPairs = SrpPairsStream.pairs(batchIn, "embedding", "vec_id", "ts",
      minCos = -1.0).collect().map(p => (p.ida, p.idb)).distinct.toSeq.sorted
    assert(batchPairs == Seq((2L, 3L)),
      s"batch path must drop zero-norm pairs even at minCos = -1, got $batchPairs")
    val in = MemoryStream[(Long, Seq[Float], java.sql.Timestamp)]
    val vecs = in.toDS().toDF("vec_id", "embedding", "ts")
      .withColumn("embedding", F.col("embedding").cast("array<float>"))
    val q = SrpPairsStream.pairs(vecs, "embedding", "vec_id", "ts",
      watermarkDelay = "365 days", minCos = -1.0)
      .writeStream.format("memory").queryName("srp_pairs_zero")
      .outputMode("append").start()
    try {
      in.addData(Seq((1L, zero, ts(0)), (2L, v, ts(1)), (3L, v, ts(2))))
      q.processAllAvailable()
      val got = spark.table("srp_pairs_zero").collect()
        .map(r => (r.getLong(1), r.getLong(2))).distinct.toSeq.sorted
      assert(got == batchPairs,
        s"stream and batch diverged on zero-norm input: $got vs $batchPairs")
    } finally q.stop()
  }

  test("the horizon is real: an identical vector beyond eviction does not pair") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val v = Seq.tabulate(64)(i => if (i % 3 == 0) 1.0f else -0.5f)
    val w = Seq.tabulate(64)(i => if (i % 5 == 0) -1.0f else 0.25f)
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    val in = MemoryStream[(Long, Seq[Float], java.sql.Timestamp)]
    val vecs = in.toDS().toDF("vec_id", "embedding", "ts")
      .withColumn("embedding", F.col("embedding").cast("array<float>"))
    val q = SrpPairsStream.pairs(vecs, "embedding", "vec_id", "ts",
      watermarkDelay = "10 seconds", minCos = 0.9)
      .writeStream.format("memory").queryName("srp_pairs_evict")
      .outputMode("append").start()
    try {
      in.addData(Seq((1L, v, ts(0)))); q.processAllAvailable()
      in.addData(Seq((2L, w, ts(1000)))); q.processAllAvailable() // advances watermark
      in.addData(Seq((3L, v, ts(1001)))); q.processAllAvailable()
      assert(spark.table("srp_pairs_evict").collect().isEmpty,
        "an identical vector past the horizon must NOT pair")
      in.addData(Seq((4L, v, ts(1002)))); q.processAllAvailable()
      val got = spark.table("srp_pairs_evict").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).distinct
      assert(got.toSeq == Seq((3L, 4L, 1.0)),
        s"identical in-horizon vectors must pair at cosine 1 on every shared band, got ${got.toSeq}")
    } finally q.stop()
  }
}
