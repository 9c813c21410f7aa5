package graft

import graft.functions.GraftFunctions
import org.scalatest.funsuite.AnyFunSuite

/** The native codegen kernels must be VALUE-IDENTICAL to the interpreted
  * SQL-HOF folds they replaced — that equality is what keeps the DuckDB
  * oracle sound for p07/p08/p19 (same left-to-right double accumulation,
  * bit for bit). Checked here against the HOF text itself, on deterministic
  * pseudo-random float vectors, in both codegen and interpreted eval. */
class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mkVectors(n: Int, dim: Int): Unit = {
    // deterministic floats incl. negatives/zeros; float-cast before use
    spark.sql(
      s"""SELECT id AS vec_id,
         |  transform(sequence(0, ${dim - 1}),
         |    d -> CAST(sin(id * 37 + d) * 10 AS FLOAT)) AS embedding
         |FROM range($n)""".stripMargin).createOrReplaceTempView("vecs")
  }

  test("graft_dot equals the interpreted aggregate(zip_with(...)) fold exactly") {
    GraftFunctions.registerDot(spark)
    mkVectors(200, 64)
    val hof = "aggregate(zip_with(a.embedding, b.embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    val diff = spark.sql(
      s"""SELECT count(*) AS n FROM vecs a JOIN vecs b ON b.vec_id = pmod(a.vec_id * 7 + 3, 200)
         |WHERE graft_dot(a.embedding, b.embedding) != $hof""".stripMargin)
      .head.getLong(0)
    assert(diff == 0L, s"$diff pairs diverge from the HOF fold")
  }

  test("graft_srp_keys equals the interpreted per-plane fold + band packing") {
    val bits = 5
    val bands = 8
    // arbitrary deterministic ±1 planes — independent of the production
    // md5-derived matrix, which is an input, not part of the kernel
    val planes = Array.tabulate(bits * bands, 64)((p, d) => if ((p * 31 + d * 7) % 3 == 0) 1 else -1)
    GraftFunctions.registerSrpKeys(spark, planes, bits, bands)
    mkVectors(150, 64)
    val planesLit = planes.map(_.mkString("array(", ",", ")")).mkString("array(", ",", ")")
    val hofBits =
      s"""transform(sequence(0, ${bits * bands - 1}),
         |  p -> IF(aggregate(zip_with(embedding, element_at($planesLit, p + 1),
         |            (x, s) -> CAST(x AS DOUBLE) * CAST(s AS DOUBLE)),
         |          CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) > 0, 1, 0))""".stripMargin
    val diff = spark.sql(
      s"""SELECT count(*) AS n FROM (
         |  SELECT graft_srp_keys(embedding) AS native,
         |    transform(sequence(0, ${bands - 1}),
         |      j -> j * ${1 << bits}
         |           + aggregate(slice($hofBits, j * $bits + 1, $bits), 0,
         |               (acc, bit) -> acc * 2 + bit)) AS hof
         |  FROM vecs)
         |WHERE to_json(native) != to_json(hof)""".stripMargin).head.getLong(0)
    assert(diff == 0L, s"$diff rows diverge from the HOF band keys")
  }

  test("graft_dot null and interpreted-eval behavior") {
    GraftFunctions.registerDot(spark)
    // null side -> null; interpreted path (literals fold before codegen)
    val r = spark.sql(
      """SELECT graft_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))) AS a,
        |       graft_dot(array(CAST(1.5 AS FLOAT), CAST(-2.0 AS FLOAT)),
        |                 array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS b""".stripMargin).head
    assert(r.isNullAt(0))
    assert(r.getDouble(1) == 1.5 * 2.0 + -2.0 * 0.5)
  }

  test("graft_dot yields NULL on length mismatch, matching the HOF's zip_with null-pad") {
    GraftFunctions.registerDot(spark)
    mkVectors(50, 8)
    // truncate one side: HOF zip_with null-pads -> product null -> sum null;
    // the kernel must agree (NULL), never a silently-partial dot product
    val hof = "aggregate(zip_with(slice(a.embedding, 1, 5), b.embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    val rows = spark.sql(
      s"""SELECT graft_dot(slice(a.embedding, 1, 5), b.embedding) AS native, $hof AS hof
         |FROM vecs a JOIN vecs b ON b.vec_id = pmod(a.vec_id + 1, 50)""".stripMargin)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.isNullAt(0), "kernel returned a partial dot product on mismatched lengths")
      assert(r.isNullAt(1), "HOF baseline expectation changed")
    }
  }

  test("graft_minhash equals the interpreted k-wide running-min fold exactly") {
    val k = 16
    val p = 2147483647L
    val hashA = (0 until k).map(i => (1103515245L * (i + 1)) % p).toArray
    val hashB = (0 until k).map(i => (12345L + 7919L * i) % p).toArray
    GraftFunctions.registerMinhash(spark, hashA, hashB, p)
    val aLit = hashA.mkString("array(", ",", ")")
    val bLit = hashB.mkString("array(", ",", ")")
    // deterministic pseudo-random shingle-hash arrays of varying length,
    // incl. an empty array (id 0 -> sequence(1, 0) = []) — the fold's
    // initial accumulator [p, …, p] must survive
    spark.sql(
      s"""SELECT id AS doc_id,
         |  transform(sequence(1, CAST(id % 40 AS INT)),
         |    j -> pmod(id * 2654435761 + j * 40503, $p)) AS hs
         |FROM range(0, 120)""".stripMargin).createOrReplaceTempView("minhash_hs")
    val hof =
      s"""aggregate(hs, array_repeat(CAST($p AS BIGINT), $k),
         |  (acc, h) -> zip_with(acc, sequence(0, ${k - 1}),
         |    (m, i) -> least(m, pmod(element_at($aLit, i + 1) * h
         |                            + element_at($bLit, i + 1), $p))))""".stripMargin
    val diff = spark.sql(
      s"""SELECT count(*) AS n FROM minhash_hs
         |WHERE to_json(graft_minhash(hs)) != to_json($hof)""".stripMargin)
      .head.getLong(0)
    assert(diff == 0L, s"$diff rows diverge from the HOF minhash fold")
    // null array -> null; null ELEMENTS are skipped (least ignores nulls)
    val r = spark.sql(
      s"""SELECT graft_minhash(CAST(NULL AS ARRAY<BIGINT>)) AS a,
         |  to_json(graft_minhash(array(CAST(NULL AS BIGINT), 7L))) AS b,
         |  to_json($hof) AS c FROM (SELECT array(CAST(NULL AS BIGINT), 7L) AS hs)""".stripMargin)
      .head
    assert(r.isNullAt(0))
    assert(r.getString(1) == r.getString(2), "null-element handling diverges from the fold")
  }

  test("graft_top_terms equals the interpreted sort+run-count accumulator fold exactly") {
    import graft.pipeline.PipelineOps.{TopTerms, p14Insert}
    GraftFunctions.registerTopTerms(spark, TopTerms)
    // deterministic word arrays with heavy repetition, ties, and
    // non-ASCII / shared-prefix terms (binary-order edge cases)
    spark.sql(
      """SELECT id AS doc_id,
        |  transform(sequence(1, CAST(id % 60 + 1 AS INT)),
        |    j -> element_at(array('apple', 'app', 'apfel', 'zebra', 'Ω', 'a',
        |                          'banana', 'ananas', 'b'), CAST(pmod(id * 13 + j * j, 9) + 1 AS INT))) AS words
        |FROM range(0, 150)""".stripMargin).createOrReplaceTempView("tt_words")
    val hof =
      s"""aggregate(
         |  array_sort(words),
         |  named_struct('top', CAST(array() AS ARRAY<STRING>),
         |               'cur', CAST(NULL AS STRING), 'cnt', 0),
         |  (acc, w) -> CASE
         |    WHEN acc.cur IS NULL
         |      THEN named_struct('top', acc.top, 'cur', w, 'cnt', 1)
         |    WHEN w = acc.cur
         |      THEN named_struct('top', acc.top, 'cur', acc.cur, 'cnt', acc.cnt + 1)
         |    ELSE named_struct('top', ${p14Insert("acc.top", "acc.cur", "acc.cnt")},
         |                      'cur', w, 'cnt', 1) END,
         |  acc -> ${p14Insert("acc.top", "acc.cur", "acc.cnt")})""".stripMargin
    val diff = spark.sql(
      s"""SELECT count(*) AS n FROM tt_words
         |WHERE to_json(graft_top_terms(words)) != to_json($hof)""".stripMargin)
      .head.getLong(0)
    assert(diff == 0L, s"$diff rows diverge from the HOF top-terms fold")
    // count clamp at 99999: a term repeated beyond the clamp keeps key 00000
    val clamped = spark.sql(
      """SELECT element_at(graft_top_terms(
        |  concat(array_repeat('x', 100100), array('y'))), 1) AS k""".stripMargin)
      .head.getString(0)
    assert(clamped == "00000x", s"clamp broken: $clamped")
  }

  test("graft_srp_keys yields NULL when embedding width differs from the planes") {
    val bits = 4
    val bands = 4
    val planes = Array.tabulate(bits * bands, 16)((p, d) => if ((p + d) % 2 == 0) 1 else -1)
    GraftFunctions.registerSrpKeys(spark, planes, bits, bands)
    mkVectors(20, 12) // 12-dim embeddings vs 16-wide planes
    val n = spark.sql("SELECT count(*) AS n FROM vecs WHERE graft_srp_keys(embedding) IS NOT NULL")
      .head.getLong(0)
    assert(n == 0L, s"$n rows produced band keys from truncated products")
  }

  test("graft_minhash matches the pmod fold on NEGATIVE inputs (ADVICE r5)") {
    // graft_minhash is session-registered, so a caller may feed hash values
    // the internal pipelines would have pre-pmod'd; the kernel's Java %
    // must carry the pmod sign adjustment or signatures go negative and
    // silently diverge from the documented aggregate() contract
    val k = 4
    val p = 2147483647L
    val hashA = (0 until k).map(i => (1103515245L * (i + 1)) % p).toArray
    val hashB = (0 until k).map(i => (12345L + 7919L * i) % p).toArray
    GraftFunctions.registerMinhash(spark, hashA, hashB, p)
    val aLit = hashA.mkString("array(", ",", ")")
    val bLit = hashB.mkString("array(", ",", ")")
    val hof =
      s"""aggregate(hs, array_repeat(CAST($p AS BIGINT), $k),
         |  (acc, h) -> zip_with(acc, sequence(0, ${k - 1}),
         |    (m, i) -> least(m, pmod(element_at($aLit, i + 1) * h
         |                            + element_at($bLit, i + 1), $p))))""".stripMargin
    val r = spark.sql(
      s"""SELECT to_json(graft_minhash(hs)) AS native, to_json($hof) AS hof,
         |  array_min(graft_minhash(hs)) AS mn
         |FROM (SELECT array(-7L, -1000000L, 3L, CAST(-$p AS BIGINT)) AS hs)""".stripMargin)
      .head
    assert(r.getString(0) == r.getString(1),
      s"negative-input divergence: ${r.getString(0)} vs ${r.getString(1)}")
    assert(r.getLong(2) >= 0L, "signature values must stay in [0, p)")
  }

  test("graft_nfc: canonical equivalence collapses, NFC input passes through, codegen == interpreted") {
    GraftFunctions.registerNfc(spark)
    // decomposed (e + combining acute) and composed (U+00E9) converge
    val r = spark.sql(
      """SELECT graft_nfc('café') AS d, graft_nfc('café') AS c,
        |  length('café') AS lr, length(graft_nfc('café')) AS ln,
        |  graft_nfc(CAST(NULL AS STRING)) AS nn""".stripMargin).head
    assert(r.getString(0) == r.getString(1), "NFD and NFC forms must normalize identically")
    assert(r.getInt(2) == 5 && r.getInt(3) == 4, "combining mark must compose away")
    assert(r.isNullAt(4), "null propagates")
    // already-normalized ASCII is unchanged
    val id = spark.sql("SELECT graft_nfc('plain ascii') = 'plain ascii' AS ok").head.getBoolean(0)
    assert(id)
    // interpreted path (codegen off) agrees with the codegen'd path
    val saved = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val r2 = spark.sql("SELECT graft_nfc('caf\\u0065\\u0301') AS d").head.getString(0)
      assert(r2 == r.getString(0), "interpreted eval must match codegen")
    } finally spark.conf.set("spark.sql.codegen.wholeStage", saved)
    // type check is a named failure
    val e = intercept[Exception](spark.sql("SELECT graft_nfc(42)").head)
    assert(e.getMessage.contains("graft_nfc") || e.getMessage.toLowerCase.contains("type"))
  }

  test("kernel registration re-binds when the bound parameters change (ADVICE r5)") {
    // registerTopTerms: a later k must take effect, not be silently ignored
    GraftFunctions.registerTopTerms(spark, 2)
    val k2 = spark.sql("SELECT size(graft_top_terms(array('a','a','b','c','d'))) AS n")
      .head.getInt(0)
    assert(k2 == 2, s"k=2 registration ignored, got $k2 terms")
    GraftFunctions.registerTopTerms(spark, 4)
    val k4 = spark.sql("SELECT size(graft_top_terms(array('a','a','b','c','d'))) AS n")
      .head.getInt(0)
    assert(k4 == 4, s"k=4 re-registration ignored, got $k4 terms")
    // registerMinhash: new modulus must take effect (sig init value = p)
    GraftFunctions.registerMinhash(spark, Array(1L), Array(0L), 97L)
    val m97 = spark.sql("SELECT element_at(graft_minhash(CAST(array() AS ARRAY<BIGINT>)), 1) AS v").head.getLong(0)
    assert(m97 == 97L, s"p=97 registration ignored: $m97")
    GraftFunctions.registerMinhash(spark, Array(1L), Array(0L), 101L)
    val m101 = spark.sql("SELECT element_at(graft_minhash(CAST(array() AS ARRAY<BIGINT>)), 1) AS v").head.getLong(0)
    assert(m101 == 101L, s"p=101 re-registration ignored: $m101")
  }
}
