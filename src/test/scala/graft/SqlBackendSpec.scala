package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL-text backend must agree with the DataFrame planner on every
  * corpus query: `spark.sql(Graft.toSparkSql(q))` row-equals
  * `Graft.compileDir(q)` over the sf0.001 parquet tables (columns compared
  * by name — the two backends may order appended derive columns
  * differently, like the driver's own hash gate). This is VERDICT r3 item
  * 6's done-condition, run over the whole 48-query corpus rather than 10. */
class SqlBackendSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val tablesRegistered: Unit = {
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders",
                  "lineitem", "events", "documents", "embeddings")) {
      val f = new java.io.File(s"$dir/$t.parquet")
      if (f.exists)
        Graft.parquetCatalog(spark, dir)(t).createOrReplaceTempView(t)
    }
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect()
      .map(_.toSeq.map {
        case null => "NULL"
        case d: Double => f"$d%.9f"
        case f: Float => f"$f%.6f"
        case x => x.toString
      }.mkString("|"))
      .sorted
      .toSeq
  }

  for ((name, prql) <- SparkEntry.prqlTexts) {
    test(s"sql backend row-equals the DataFrame path: $name") {
      tablesRegistered
      val dfPath = Graft.compileDir(prql, spark, dir)
      val sql = Graft.toSparkSql(prql)
      val sqlPath =
        try spark.sql(sql)
        catch {
          case e: Throwable =>
            fail(s"generated SQL failed to run:\n$sql\n${e.getMessage.take(500)}")
        }
      val (a, b) = (canon(dfPath), canon(sqlPath))
      assert(a == b,
        s"row mismatch (${a.length} vs ${b.length} rows)\nSQL:\n$sql\n" +
          s"first diff: ${a.zip(b).find(p => p._1 != p._2).orElse(Some(("<len>", "<len>")))}")
    }
  }

  test("a nested-paren literal group key stays a constant, not a GROUP BY ordinal") {
    // r11 ADVICE: deOrdinal stripped only ONE paren layer, so an s-string
    // key rendering as ((91)) still reached Spark as a bare integer literal
    // in GROUP BY — read as "column 91" instead of a constant.
    tablesRegistered
    val prql =
      """from region
        |derive k = s"((91))"
        |group [r_name, k] (aggregate [c = count])""".stripMargin
    val sql = Graft.toSparkSql(prql)
    val got = canon(spark.sql(sql))
    val exp = canon(Graft.compileDir(prql, spark, dir))
    assert(got == exp, s"SQL:\n$sql")
    assert(got.length == 5) // one row per region; the constant groups nothing apart
  }

  test("a comma-adjacent paren group key is not peeled into an ordinal (balanced check)") {
    // VERDICT r13 #7: the old deOrdinal peel walked through `(a),(b)`-shaped
    // keys — `((1),(2))` peeled once to `(1),(2)` whose outer parens do NOT
    // match each other, and a further naive peel would yield `1),(2`. The
    // digit regex failed closed, so behavior was right by accident; the
    // balanced-paren check makes it right by construction. Both backends
    // must agree, and the struct-valued constant key must group nothing
    // apart (5 regions → 5 rows).
    tablesRegistered
    val prql =
      """from region
        |derive k = s"((1),(2))"
        |group [r_name, k] (aggregate [c = count])""".stripMargin
    val sql = Graft.toSparkSql(prql)
    val got = canon(spark.sql(sql))
    val exp = canon(Graft.compileDir(prql, spark, dir))
    assert(got == exp, s"SQL:\n$sql")
    assert(got.length == 5)
  }

  test("a deeply nested literal key still de-ordinalizes through many balanced layers") {
    tablesRegistered
    val prql =
      """from region
        |derive k = s"(((7)))"
        |group [r_name, k] (aggregate [c = count])""".stripMargin
    val sql = Graft.toSparkSql(prql)
    val got = canon(spark.sql(sql))
    val exp = canon(Graft.compileDir(prql, spark, dir))
    assert(got == exp, s"SQL:\n$sql")
    assert(got.length == 5)
  }
}
