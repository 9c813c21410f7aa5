package graft

/** Compile-latency probe (same methodology as Bench.measureCompileLatency,
  * longer warm-up) — splits parse / fold / full-compile on the reference's
  * compile-bench query (prql-compiler/benches/bench.rs:11-21). */
object LatProbe {
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession("4")
    val src = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "/root/reference/book/tests/prql/examples/variables-0.prql")), "UTF-8")
    val employees = spark.range(1).selectExpr("CAST(1 AS DOUBLE) salary",
      "CAST(1 AS DOUBLE) payroll_tax", "CAST(1 AS DOUBLE) benefits_cost",
      "'USA' country", "'e' title", "CAST(1 AS DOUBLE) gross_salary",
      "CAST(1 AS DOUBLE) gross_cost")
    val cat: String => org.apache.spark.sql.DataFrame = _ => employees
    val n = 1000
    def bench(tag: String)(f: => Any): Unit = {
      (1 to 500).foreach(_ => f)
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      println(f"$tag: ${(System.nanoTime()-t0)/1e3/n}%.1f us")
    }
    bench("parse") { graft.parse.Parser.parseWithSpans(src) }
    bench("parse+fold") {
      val (q, spans) = graft.parse.Parser.parseWithSpans(src)
      new graft.plan.Planner(spark, cat, q, spans).planMainUnresolved()
    }
    bench("full compile") { Graft.compile(src, spark, cat) }
    // the reference's ACTUAL artifact is SQL text (translator.rs:32-49);
    // this is the apples-to-apples axis against its ~300 us compile
    bench("toSparkSql (reference's artifact shape)") { Graft.toSparkSql(src) }
    // analyzer floor: ONE trivial Dataset op (a 1-column select on an
    // already-analyzed base) pays the same per-run analyzer machinery with
    // a 2-node plan — the irreducible cost any Catalyst-plan-emitting
    // compile pays, however small the fold's plan
    bench("analyzer floor (trivial select)") { employees.select("salary") }
    val key = "spark.sql.analyzer.singlePassResolver.enabledTentatively"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try bench("full compile (fixed-point analyzer)") { Graft.compile(src, spark, cat) }
    finally prior match { case Some(v) => spark.conf.set(key, v)
                          case None => spark.conf.unset(key) }
    spark.stop()
  }
}
