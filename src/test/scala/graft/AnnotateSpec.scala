package graft

import org.scalatest.funsuite.AnyFunSuite

/** Golden outputs for the CLI annotate modes (the reference's prql-frames /
  * prql-refs, cli.rs:20-36) against the in-memory fixtures. */
class AnnotateSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def cat = TestSpark.catalog

  test("frames: each stage line is annotated with the frame after it") {
    val prql =
      """from salaries
        |filter salary > 500
        |derive bump = salary * 1.1
        |select [emp_no, bump]""".stripMargin
    val out = Annotate.frames(prql, spark, cat)
    val expect =
      """from salaries               # [emp_no, salary, country, from_date, to_date]
        |filter salary > 500         # [emp_no, salary, country, from_date, to_date]
        |derive bump = salary * 1.1  # [emp_no, salary, country, from_date, to_date, bump]
        |select [emp_no, bump]       # [emp_no, bump]""".stripMargin
    assert(out == expect)
  }

  test("frames: group sub-pipeline stages annotate their own lines") {
    val prql =
      """from salaries
        |group country (
        |  aggregate [avg_pay = average salary]
        |)""".stripMargin
    val out = Annotate.frames(prql, spark, cat)
    assert(out.linesIterator.toSeq(2).contains("# [country, avg_pay]"))
    // the `group` stage itself annotates its first line with the final frame
    assert(out.linesIterator.toSeq(1).contains("# [country, avg_pay]"))
  }

  test("catalog falls back to csv and json sources") {
    val dir = java.nio.file.Files.createTempDirectory("graft_src").toFile
    try {
      java.nio.file.Files.writeString(
        new java.io.File(dir, "people.csv").toPath, "id,name\n1,ada\n2,alan\n")
      java.nio.file.Files.writeString(
        new java.io.File(dir, "pets.json").toPath,
        """{"id":1,"pet":"cat"}""" + "\n" + """{"id":2,"pet":"dog"}""" + "\n")
      val out = Graft.compileDir(
        """from people
          |join pets [id]
          |select [id, name, pet]
          |sort id""".stripMargin, spark, dir.getAbsolutePath).collect()
      assert(out.map(_.toString).toSeq == Seq("[1,ada,cat]", "[2,alan,dog]"))
    } finally {
      dir.listFiles.foreach(_.delete()); dir.delete()
    }
  }

  test("catalog reads ORC with the parquet-grade typed schema and ts treatment") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toFile
    try {
      // typed columns (long/double/timestamp) survive the round trip —
      // unlike csv's inferSchema, ORC carries the schema like parquet;
      // the `ts` column gets the same event-time normalization
      Seq((1L, 9.5, java.sql.Timestamp.valueOf("2026-01-02 03:04:05")),
          (2L, 8.25, java.sql.Timestamp.valueOf("2026-01-02 03:04:06")))
        .toDF("id", "score", "ts")
        .write.mode("overwrite").orc(new java.io.File(dir, "scores.orc").getAbsolutePath)
      val df = Graft.parquetCatalog(spark, dir.getAbsolutePath)("scores")
      assert(df.schema("id").dataType == org.apache.spark.sql.types.LongType)
      assert(df.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
      val out = Graft.compileDir(
        """from scores
          |filter score > 9
          |select [id, score]""".stripMargin, spark, dir.getAbsolutePath).collect()
      assert(out.map(_.toString).toSeq == Seq("[1,9.5]"))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
  }

  test("refs: idents are classified as table / column / functions") {
    val prql =
      """func double x -> x * 2
        |from salaries
        |derive d = (double salary)
        |aggregate [m = max d]""".stripMargin
    val out = Annotate.refs(prql, spark, cat)
    val expect =
      """line 2, col 6: salaries -> table
        |line 3, col 13: double -> user function
        |line 3, col 20: salary -> column
        |line 4, col 16: max -> builtin function
        |line 4, col 20: d -> column""".stripMargin
    assert(out == expect)
  }

  test("refs: desugared `??` emits no phantom coalesce ref; explicit coalesce does") {
    // `a ?? b` parses to FuncCall("coalesce") carrying the operator
    // expression's span — refs must not report an identifier that isn't in
    // the source at that position
    val desugared = Annotate.refs(
      """from salaries
        |derive x = salary ?? 0""".stripMargin, spark, cat)
    assert(!desugared.contains("coalesce ->"), desugared)
    assert(desugared.contains("salary -> column"))
    val explicit = Annotate.refs(
      """from salaries
        |derive x = (coalesce salary 0)""".stripMargin, spark, cat)
    assert(explicit.contains("coalesce -> builtin function"), explicit)
  }
}
