package graft

import graft.streaming.TokenBudgetStream
import graft.streaming.TokenBudgetStream.In
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming token-budget admission: the strict-prefix rule (p44's
  * cum <= budget, accumulating over drops) under streaming state — batch
  * degradation cross-checked against a running-sum window oracle, the
  * budget binding across micro-batches, overflow closing the group for
  * good, and per-key isolation. */
class StreamingTokenBudgetSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  test("batch path equals the running-sum window strict prefix") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("lang", "doc_id", "size(split(trim(text), '\\\\s+')) AS n_tok")
    val got = TokenBudgetStream.admitByTokenBudget(docs, "lang", "doc_id", "n_tok", 2000L)
      .collect().map(a => (a.group, a.doc_id, a.tok_cum)).toSet
    docs.createOrReplaceTempView("tb_docs")
    val oracle = spark.sql("""
      SELECT lang, doc_id, cum FROM (
        SELECT lang, doc_id,
          sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM tb_docs)
      WHERE cum <= 2000""").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == oracle, "batch degradation must be the strict window prefix")
    assert(got.nonEmpty && got.size < docs.count(), "the budget must bind")
  }

  test("input validation: missing columns and bad budget are named errors") {
    import spark.implicits._
    val df = Seq(("a", 1L, 5L)).toDF("lang", "doc_id", "n_tok")
    val e1 = intercept[IllegalArgumentException](
      TokenBudgetStream.admitByTokenBudget(df, "lang", "doc_id", "tokens", 10L))
    assert(e1.getMessage.contains("missing column 'tokens'"))
    val e2 = intercept[IllegalArgumentException](
      TokenBudgetStream.admitByTokenBudget(df, "lang", "doc_id", "n_tok", 0L))
    assert(e2.getMessage.contains("budget must be >= 1"))
  }

  test("budget binds across micro-batches; overflow closes the group; keys isolate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[In]
    val q = TokenBudgetStream.admitByTokenBudget(in.toDF(), "group", "doc_id", "n_tok", 100L)
      .writeStream.format("memory").queryName("tb_out").outputMode("append")
      .start()
    try {
      def admitted = spark.table("tb_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
      // batch 1: group a consumes 70 of 100
      in.addData(In("a", 1, 40), In("a", 2, 30), In("b", 10, 99))
      q.processAllAvailable()
      assert(admitted == Set(("a", 1L, 40L), ("a", 2L, 70L), ("b", 10L, 99L)))
      // batch 2: the 40-token doc overflows (cum 110 > 100) -> dropped,
      // and the strict prefix means the group is CLOSED from here on
      in.addData(In("a", 3, 40))
      q.processAllAvailable()
      assert(!admitted.exists(_._2 == 3L), "overflowing doc must drop")
      // batch 3: a 10-token doc would fit 70+10 under first-fit, but the
      // strict prefix (cum accumulated to 110) must keep the group closed;
      // group b is unaffected (its own budget, 99 + 1 <= 100)
      in.addData(In("a", 4, 10), In("b", 11, 1))
      q.processAllAvailable()
      assert(!admitted.exists(_._2 == 4L),
        "strict prefix: a closed group must not back-fill smaller docs")
      assert(admitted.contains(("b", 11L, 100L)), "other groups admit independently")
    } finally q.stop()
  }
}
