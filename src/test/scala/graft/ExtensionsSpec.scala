package graft

import org.scalatest.funsuite.AnyFunSuite

/** The GraftExtensions injector: every corpus-independent kernel resolves
  * in plain SQL on a FRESH `newSession()` — which has an isolated temp
  * function registry, so resolution proves session-build injection, not a
  * leaked `GraftFunctions.register*` temp function from another suite. */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val fresh = TestSpark.spark.newSession()

  test("graft_dot and graft_nfc resolve with no register call") {
    assert(fresh.sql(
      "SELECT graft_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), array(CAST(3 AS FLOAT), CAST(4 AS FLOAT)))")
      .head.getDouble(0) == 11.0)
    assert(fresh.sql("SELECT graft_nfc('café')").head.getString(0) == "café")
  }

  test("graft_md5h32 is value-identical to the hex-prefix chain it replaces") {
    // the kernel's whole contract: same BIGINT as conv(substr(md5(s),1,8),16,10)
    // — which is what every DuckDB oracle computes — for ascii, unicode,
    // empty, long, and boundary inputs, in both the interpreted path
    // (inside a HOF lambda) and the codegen'd path (top-level column)
    val mism = fresh.sql("""
      WITH t AS (
        SELECT explode(array('hash', 'the', '', concat('caf', char(233)),
          repeat('x', 4096), ' lead', 'trail ', '0', '-1',
          concat('multi', char(10), 'line'))) AS s)
      SELECT count(*) FROM t
      WHERE graft_md5h32(s) != CAST(conv(substr(md5(s),1,8),16,10) AS BIGINT)""")
      .head.getLong(0)
    assert(mism == 0L, "kernel diverged from the hex-prefix chain")
    val lambdaMism = fresh.sql("""
      WITH t AS (SELECT array('a', 'b', 'longer token') AS ws)
      SELECT count(*) FROM t
      WHERE transform(ws, w -> graft_md5h32(w))
         != transform(ws, w -> CAST(conv(substr(md5(w),1,8),16,10) AS BIGINT))""")
      .head.getLong(0)
    assert(lambdaMism == 0L, "interpreted-lambda path diverged")
    assert(fresh.sql("SELECT graft_md5h32(CAST(NULL AS STRING))").head.isNullAt(0),
      "null in, null out")
    // the 60-bit join-key variant against ITS hex chain (15 digits)
    val mism60 = fresh.sql("""
      WITH t AS (
        SELECT explode(array('hash', 'the', '', concat('caf', char(233)),
          repeat('x', 4096), 'a b c d e f g h')) AS s)
      SELECT count(*) FROM t
      WHERE graft_md5h60(s) != CAST(conv(substr(md5(s),1,15),16,10) AS BIGINT)""")
      .head.getLong(0)
    assert(mism60 == 0L, "h60 kernel diverged from the 15-digit hex chain")
  }

  test("sketch aggregates take k as an optional trailing literal") {
    fresh.range(100).selectExpr("CAST(id AS BIGINT) h")
      .createOrReplaceTempView("ext_h")
    // default k = 64: fewer than k distinct values => exact count
    assert(fresh.sql("SELECT graft_kmv(h) FROM ext_h WHERE h < 50").head.getLong(0) == 50L)
    // explicit small k kicks the estimator branch (result >= k)
    assert(fresh.sql("SELECT graft_kmv(h, 4) FROM ext_h").head.getLong(0) >= 4L)
    val picks = fresh.sql(
      "SELECT graft_aes_topk(CAST(h AS DOUBLE), h, h + 1, 3) FROM ext_h")
      .head.getSeq[org.apache.spark.sql.Row](0)
    assert(picks.length == 3 && picks.map(_.getLong(0)) == Seq(0L, 1L, 2L),
      "k=3 smallest keys in order")
    val e = intercept[Exception](
      fresh.sql("SELECT graft_kmv(h, h) FROM ext_h").collect())
    assert(e.getMessage.contains("foldable literal"))
  }

  test("the bloom pair composes as build-then-probe in one statement") {
    fresh.range(1000).selectExpr("xxhash64(CAST(id AS STRING)) h", "id")
      .createOrReplaceTempView("ext_b")
    val survivors = fresh.sql("""
      WITH bf AS (SELECT graft_bloom_agg(h, CAST(500 AS BIGINT), CAST(8192 AS BIGINT)) b
                  FROM ext_b WHERE id < 500)
      SELECT count(*) FROM ext_b
      WHERE id >= 500 AND NOT graft_bloom_contains((SELECT b FROM bf), h)""")
      .head.getLong(0)
    // no false negatives: every id < 500 is bloom-positive; the >= 500 side
    // passes except fpp-bounded false positives
    assert(survivors > 400L && survivors <= 500L)
    val members = fresh.sql("""
      WITH bf AS (SELECT graft_bloom_agg(h, CAST(500 AS BIGINT), CAST(8192 AS BIGINT)) b
                  FROM ext_b WHERE id < 500)
      SELECT count(*) FROM ext_b
      WHERE id < 500 AND graft_bloom_contains((SELECT b FROM bf), h)""")
      .head.getLong(0)
    assert(members == 500L, "a bloom filter never false-negatives its members")
  }
}
