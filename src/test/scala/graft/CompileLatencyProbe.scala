package graft

import org.scalatest.funsuite.AnyFunSuite

/** Profiling probe for compile latency (VERDICT r2 #8): splits parse (pure
  * Scala, ~60-160µs warmed — the axis comparable to the reference's ~300µs
  * compile) from total (one Spark analyzer run per DataFrame op, ~1.5ms
  * each — the price of emitting an analyzed Catalyst plan instead of a SQL
  * string). Informative, not a regression gate — prints the split. */
class CompileLatencyProbe extends AnyFunSuite {

  test("profile parse vs plan time") {
    val spark = TestSpark.spark
    val src = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "/root/reference/book/tests/prql/examples/variables-0.prql")), "UTF-8")
    val employees = spark.range(1).selectExpr("CAST(1 AS DOUBLE) salary",
      "CAST(1 AS DOUBLE) payroll_tax", "CAST(1 AS DOUBLE) benefits_cost",
      "'USA' country", "'e' title", "CAST(1 AS DOUBLE) gross_salary",
      "CAST(1 AS DOUBLE) gross_cost")
    val cat: String => org.apache.spark.sql.DataFrame = _ => employees
    (1 to 30).foreach(_ => Graft.compile(src, spark, cat))
    val n = 200
    var t0 = System.nanoTime()
    (1 to n).foreach(_ => graft.parse.Parser.parseWithSpans(src))
    val parseUs = (System.nanoTime() - t0) / 1e3 / n
    t0 = System.nanoTime()
    (1 to n).foreach(_ => Graft.compile(src, spark, cat))
    val totalUs = (System.nanoTime() - t0) / 1e3 / n
    info(f"parse: $parseUs%.1f us, compile total: $totalUs%.1f us, plan+analysis: ${totalUs - parseUs}%.1f us")
    println(f"[probe] parse: $parseUs%.1f us, total: $totalUs%.1f us")
  }
}
