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
}
