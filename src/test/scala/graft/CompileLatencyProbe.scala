package graft

import org.scalatest.funsuite.AnyFunSuite

/** Profiling probe for compile latency (VERDICT r2 #8): prints the parse vs
  * plan-build split via the same measurement code the bench publishes
  * (Bench.measureCompileLatency), so the numbers are directly comparable.
  * Informative, not a regression gate. */
class CompileLatencyProbe extends AnyFunSuite {

  test("profile parse vs plan time") {
    val spark = TestSpark.spark
    val (parseUs, totalUs) = Bench.measureCompileLatency(spark)
    info(f"parse: $parseUs%.1f us, compile total: $totalUs%.1f us, plan+analysis: ${totalUs - parseUs}%.1f us")
    println(f"[probe] parse: $parseUs%.1f us, total: $totalUs%.1f us")
  }
}
