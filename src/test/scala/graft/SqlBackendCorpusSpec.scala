package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** VERDICT r4 #5: the SQL text backend must agree with the DataFrame
  * planner on the whole 83-file golden book corpus, not just the 48-query
  * oracle set. Every book file GoldenCorpusSpec executes is run both ways
  * — `spark.sql(Graft.toSparkSql(q))` vs `Graft.compile(q)` over the
  * in-memory fixtures registered as temp views — and compared row-wise
  * (columns by sorted name, like the driver's hash gate). Files the text
  * backend cannot express must throw SqlGenError AND be individually
  * documented in [[sqlInexpressible]]; a file that starts rendering must
  * be removed from the list (the assertion is two-sided so the list can
  * only shrink). */
class SqlBackendCorpusSpec extends AnyFunSuite {

  private val corpusRoot = Paths.get("/root/reference/book/tests/prql")

  /** Same exclusions as GoldenCorpusSpec: engine-specific s-strings /
    * placeholders (parse-only there, unrunnable here for the same reason)
    * and the deliberately-ambiguous employees-1. */
  private val notExecutable = Set(
    "examples/employees-1.prql",   // AMBIGUOUS_REFERENCE by design
    "examples/employees-2.prql",   // s-string: OVERLAPS — not Spark SQL
    "examples/employees-3.prql",
    "language-features/s-strings-2.prql",
    "examples/misc-0.prql",        // free `part` ident (reference TODO #286)
    "examples/sql-parameters-0.prql", // $1 bind placeholder
  )

  /** Tables whose names cannot be temp views (dots): the DataFrame path
    * resolves them through the catalog closure, but `spark.sql` text has
    * no view to hit. The one file using them is documented here. */
  private val unregistrableFixture = Set(
    "language-features/s-strings-3.prql", // `project-foo.dataset.table`
  )

  /** Files the SQL text backend cannot express, each with the SqlGenError
    * reason. Two-sided: these MUST throw SqlGenError, everything else MUST
    * render and row-match. */
  private val sqlInexpressible: Set[String] = Set(
  )

  /** join-0/join-2 imply an `employees` schema without `employee_id` —
    * same narrowed fixture GoldenCorpusSpec serves the DataFrame path. */
  private def overridesFor(name: String): Map[String, org.apache.spark.sql.DataFrame] =
    if (name == "transforms/join-0.prql" || name == "transforms/join-2.prql")
      Map("employees" -> TestSpark.fixtures("employees").drop("employee_id"))
    else Map.empty

  private def files: Seq[Path] =
    Files.walk(corpusRoot).iterator().asScala
      .filter(p => p.toString.endsWith(".prql"))
      .toSeq.sortBy(_.toString)

  private def rel(p: Path): String = corpusRoot.relativize(p).toString

  private lazy val spark = TestSpark.spark

  private def registerFixtures(
      overrides: Map[String, org.apache.spark.sql.DataFrame]): Unit =
    for ((name, df) <- TestSpark.fixtures ++ overrides)
      if (!name.contains(".")) df.createOrReplaceTempView(name)

  /** Canonical rows with columns ordered by (name, position) — by POSITION
    * not name-lookup, because post-join frames legitimately carry duplicate
    * column names (select-by-name would be AMBIGUOUS_REFERENCE). Both
    * backends emit join sides in the same left-to-right order, so position
    * disambiguates consistently. */
  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val order = df.columns.zipWithIndex.sortBy { case (n, i) => (n, i) }.map(_._2).toSeq
    val renamed = df.toDF(df.columns.indices.map(i => s"_c$i"): _*)
    renamed.select(order.map(i => org.apache.spark.sql.functions.col(s"_c$i")): _*)
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

  for (f <- files) {
    val name = rel(f)
    if (!notExecutable(name) && !unregistrableFixture(name)) {
      val src = new String(Files.readAllBytes(f), "UTF-8")
      test(s"sql backend row-equals the DataFrame path on book corpus: $name") {
        val overrides = overridesFor(name)
        registerFixtures(overrides)
        val rendered =
          try Right(Graft.toSparkSql(src))
          catch { case e: graft.plan.SqlGenError => Left(e) }
        rendered match {
          case Left(e) =>
            assert(sqlInexpressible(name),
              s"SqlGenError not documented in sqlInexpressible: ${e.getMessage}")
          case Right(sql) =>
            assert(!sqlInexpressible(name),
              s"file renders now — remove it from sqlInexpressible:\n$sql")
            val dfPath = TestSpark.compileWith(src, overrides)
            val sqlPath =
              try spark.sql(sql)
              catch {
                case e: Throwable =>
                  fail(s"generated SQL failed to run:\n$sql\n${e.getMessage.take(500)}")
              }
            assert(dfPath.columns.sorted.toSeq == sqlPath.columns.sorted.toSeq,
              s"column mismatch: ${dfPath.columns.toSeq} vs ${sqlPath.columns.toSeq}\nSQL:\n$sql")
            val (a, b) = (canon(dfPath), canon(sqlPath))
            assert(a == b,
              s"row mismatch (${a.length} vs ${b.length} rows)\nSQL:\n$sql\n" +
                s"first diff: ${a.zip(b).find(p => p._1 != p._2)
                  .orElse(Some(("<len>", "<len>")))}")
        }
      }
    }
  }
}
