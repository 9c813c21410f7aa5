package graft

import graft.streaming.SketchStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

/** Streaming KMV distinct-count: the batch p35 operator is the oracle —
  * the sketch is a deterministic function of the distinct hash set, so
  * the streamed estimate after the last micro-batch must EQUAL the batch
  * estimate over the union of fed rows, however the rows were batched.
  * Also pins WHY the sketch exists: Spark refuses count(DISTINCT) in a
  * streaming aggregation (unbounded state), while the sketch's per-group
  * state is O(k) by construction. */
class StreamingSketchSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  test("batch path equals the p35 estimator column per language") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val got = SketchStream.kmvDistinctByGroup(docs, "lang", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val p35 = pipeline.PipelineOps.queries("p35_kmv_distinct")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == p35, "same sketch, same hash family, same estimates")
  }

  test("input validation: missing columns and bad k are named errors") {
    import spark.implicits._
    val df = Seq(("en", "a")).toDF("lang", "text")
    val e1 = intercept[IllegalArgumentException](
      SketchStream.kmvDistinctByGroup(df, "language", "text"))
    assert(e1.getMessage.contains("missing column 'language'"))
    val e2 = intercept[IllegalArgumentException](
      SketchStream.kmvDistinctByGroup(df, "lang", "text", k = 1))
    assert(e2.getMessage.contains("k must be >= 2"))
  }

  test("count(DISTINCT) on a stream is refused; the sketch is the feasible form") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, String)]
    val docs = in.toDS().toDF("lang", "text")
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      docs.groupBy("lang").agg(F.countDistinct("text"))
        .writeStream.format("memory").queryName("cd_refused")
        .outputMode("update").start()
    }
    assert(err.getMessage.toLowerCase.contains("distinct"),
      s"expected the streaming distinct refusal, got: ${err.getMessage.take(200)}")
  }

  test("streamed sketch merges across micro-batches to the exact batch estimate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = spark.read.parquet(s"$dir/documents.parquet")
      .select("lang", "text").as[(String, String)].collect().toSeq
    // feed in 3 uneven micro-batches (state must carry and merge)
    val (b1, rest) = all.splitAt(7)
    val (b2, b3) = rest.splitAt(19)
    val in = MemoryStream[(String, String)]
    val docs = in.toDS().toDF("lang", "text")
    val q = SketchStream.kmvDistinctByGroup(docs, "lang", "text")
      .writeStream.format("memory").queryName("kmv_out").outputMode("complete")
      .start()
    try {
      in.addData(b1); q.processAllAvailable()
      val afterB1 = spark.table("kmv_out").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val batchB1 = SketchStream.kmvDistinctByGroup(
        b1.toDF("lang", "text"), "lang", "text")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(afterB1 == batchB1,
        "after one micro-batch the stream must equal the batch over that prefix")
      in.addData(b2); q.processAllAvailable()
      in.addData(b3); q.processAllAvailable()
      val streamed = spark.table("kmv_out").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val batch = SketchStream.kmvDistinctByGroup(
        all.toDF("lang", "text"), "lang", "text")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(streamed == batch,
        "cross-batch state merge must reproduce the batch sketch exactly")
    } finally q.stop()
  }
}
