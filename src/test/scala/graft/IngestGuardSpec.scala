package graft

import graft.streaming.NullGuard
import org.scalatest.funsuite.AnyFunSuite

/** Batch-side NullGuard parity (VERDICT r13 #8): the streaming null-drop
  * guard must be usable on a static ingest edge with the SAME contract —
  * rows with NULL required fields are dropped AND counted in the observed
  * metric `graft_null_drops_<tag>` — at zero plan cost (observe is a
  * CollectMetrics node: no shuffle, no second pass). This makes the
  * funnel accounting auditable for batch deployments, not just streams.
  */
class IngestGuardSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def mkDf = {
    import spark.implicits._
    Seq[(java.lang.Long, String)](
      (1L, "alpha"), (2L, null), (null, "gamma"), (4L, "delta"), (null, null)
    ).toDF("doc_id", "text")
  }

  test("batch NullGuard drops and COUNTS null-field rows via observedMetrics") {
    val guarded = NullGuard(mkDf, "ingest_spec", Seq("doc_id", "text"))
    val kept = guarded.collect()
    assert(kept.map(_.getLong(0)).sorted.toSeq == Seq(1L, 4L),
      "only fully-populated rows pass the guard")
    val metrics = guarded.queryExecution.observedMetrics
    val m = metrics.get("graft_null_drops_ingest_spec")
    assert(m.isDefined, s"observed metric missing; have: ${metrics.keys.mkString(", ")}")
    assert(m.get.getAs[Long]("null_field_drops") == 3L, "three poison rows counted")
    assert(m.get.getAs[Long]("rows") == 5L, "denominator is the full ingest row count")
  }

  test("the guard is plan-free: no exchange, no extra scan — one CollectMetrics node") {
    val guarded = NullGuard(mkDf, "ingest_plan", Seq("doc_id", "text"))
    guarded.collect()
    val plan = guarded.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"observe must not shuffle:\n$plan")
    assert(plan.contains("CollectMetrics"), s"expected a CollectMetrics node:\n$plan")
  }

  test("batch and stream keep ROW IDENTITY: same rows survive the same guard") {
    // the pre-branch placement rule: operators apply NullGuard before
    // splitting on isStreaming, so a batch backfill and the live stream
    // admit the identical row set — replayed here at the spec level
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = Seq[(java.lang.Long, String)](
      (10L, "keep"), (null, "drop-me"), (12L, null), (13L, "keep-too"))
    val batchKept = NullGuard(rows.toDF("doc_id", "text"), "ident_b", Seq("doc_id", "text"))
      .collect().map(_.getLong(0)).sorted.toSeq
    val in = MemoryStream[(java.lang.Long, String)]
    val q = NullGuard(in.toDS().toDF("doc_id", "text"), "ident_s", Seq("doc_id", "text"))
      .writeStream.format("memory").queryName("ingest_guard_ident")
      .outputMode("append").start()
    try {
      in.addData(rows)
      q.processAllAvailable()
      val streamKept = spark.table("ingest_guard_ident")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(streamKept == batchKept,
        s"guard admitted different rows per mode: batch=$batchKept stream=$streamKept")
    } finally q.stop()
  }
}
