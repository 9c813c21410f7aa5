package graft

import graft.streaming.DecontamStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** DecontamStream: streaming n-gram decontamination (p21's ingest
  * counterpart, VERDICT r8 #5). Contracts: the streamed flag set over
  * shuffled uneven micro-batches equals batch p21's output exactly
  * (same grams, same counts — the expressions are shared); the operator
  * is stateless (no watermark, Append mode, order-free); degenerate
  * inputs (empty eval set, short docs) flag nothing. */
class StreamingDecontamSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  private def docs() = spark.read.parquet(s"$dir/documents.parquet")

  test("input validation: streaming eval side and missing columns are named errors") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val streamDf = in.toDS().toDF("doc_id", "text")
    val e1 = intercept[IllegalArgumentException](
      DecontamStream.flag(streamDf, streamDf))
    assert(e1.getMessage.contains("static"))
    val e2 = intercept[IllegalArgumentException](
      DecontamStream.flag(streamDf.select("doc_id"), docs()))
    assert(e2.getMessage.contains("missing column 'text'"))
  }

  test("batch replica equals the p21 operator exactly") {
    // p21: eval = doc_id < 20 of the same corpus, output = flagged
    // training docs (doc_id >= 20) with exact shared-gram counts
    val expected = graft.pipeline.PipelineOps.queries("p21_decontam")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(expected.nonEmpty, "fixture corpus lost its planted contamination")
    val got = DecontamStream.flag(
      docs().filter("doc_id >= 20"), docs().filter("doc_id < 20"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == expected,
      s"batch replica diverged from p21: ${got.length} vs ${expected.length} rows; " +
        s"first diff ${got.zip(expected).find(p => p._1 != p._2)}")
  }

  test("streamed over shuffled uneven batches == p21, order-free (stateless)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val expected = graft.pipeline.PipelineOps.queries("p21_decontam")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val rows = docs().filter("doc_id >= 20").select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // hash-shuffled arrival order: statelessness means order cannot matter
    val shuffled = rows.sortBy(r => graft.functions.GraftMd5Util.h32(
      org.apache.spark.unsafe.types.UTF8String.fromString(r._1.toString)))
    val batches = Seq(shuffled.take(17), shuffled.slice(17, 200), shuffled.drop(200))
    val in = MemoryStream[(Long, String)]
    val out = DecontamStream.flag(
      in.toDS().toDF("doc_id", "text"), docs().filter("doc_id < 20"))
    val q = out.writeStream.format("memory").queryName("decontam_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      val got = spark.table("decontam_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == expected,
        s"streamed flag set diverged: ${got.length} vs ${expected.length} rows; " +
          s"first diff ${got.zip(expected).find(p => p._1 != p._2)}")
    } finally q.stop()
  }

  test("degenerate inputs: empty eval set and short docs flag nothing") {
    import spark.implicits._
    val evalEmpty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val training = Seq((100L, "one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    assert(DecontamStream.flag(training, evalEmpty).collect().isEmpty,
      "an empty eval suite must flag nothing")
    // a 7-word doc has no 8-gram: it cannot flag even against itself
    val short = Seq((101L, "a b c d e f g")).toDF("doc_id", "text")
    assert(DecontamStream.flag(short, short).collect().isEmpty,
      "sub-gram-width docs must flag nothing")
  }
}
