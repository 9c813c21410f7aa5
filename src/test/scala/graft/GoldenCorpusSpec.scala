package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** The reference's de-facto conformance suite: every ```prql``` block from
  * the book, extracted by its harness into book/tests/prql (recursive) (83 files,
  * see /root/reference/book/tests/snapshot.rs:28-44).
  *
  * Mirror here (SURVEY.md §5): every file must PARSE; every file that
  * doesn't depend on non-Spark SQL inside s-strings (or engine-side
  * placeholders) must also PLAN AND EXECUTE on Spark against in-memory
  * fixtures. The files are read from the read-only reference checkout
  * rather than copied into this repo.
  */
class GoldenCorpusSpec extends AnyFunSuite {

  private val corpusRoot = Paths.get("/root/reference/book/tests/prql")

  /** Engine-specific files: these contain raw-SQL escape hatches that are
    * not Spark SQL (`OVERLAPS`, `$1` placeholders) or reference columns
    * across CTE scope in a way the reference itself marks as TODO
    * (misc-0.prql's `part`). They must still parse. */
  private val parseOnly = Set(
    "examples/employees-2.prql",   // s-string: (a,b) OVERLAPS (c,d) — not Spark SQL
    "examples/employees-3.prql",   // same
    "language-features/s-strings-2.prql", // same
    "examples/misc-0.prql",        // free `part` ident (reference TODO #286)
    "examples/sql-parameters-0.prql", // $1 bind placeholder — no Spark analogue
  )

  /** The reference compiles these to SQL whose bare column reference is
    * ambiguous across the joined tables (`salary` lives on both sides) and
    * leaves resolution to the target DB — which errors. The faithful Spark
    * behavior is the same analysis error. */
  private val ambiguousByDesign = Set("examples/employees-1.prql")

  /** join-0/join-2 imply an `employees` schema without `employee_id` (that
    * column belongs to `positions` there), while window-0 needs
    * `employees.employee_id`. Serve the joins a narrowed fixture. */
  private def overridesFor(name: String) =
    if (name == "transforms/join-0.prql" || name == "transforms/join-2.prql")
      Map("employees" -> TestSpark.fixtures("employees").drop("employee_id"))
    else Map.empty[String, org.apache.spark.sql.DataFrame]

  private def files: Seq[Path] =
    Files.walk(corpusRoot).iterator().asScala
      .filter(p => p.toString.endsWith(".prql"))
      .toSeq.sortBy(_.toString)

  private def rel(p: Path): String = corpusRoot.relativize(p).toString

  for (f <- files) {
    val name = rel(f)
    val src = new String(Files.readAllBytes(f), "UTF-8")

    test(s"parse: $name") {
      Graft.parse(src) // throws on failure
    }

    if (ambiguousByDesign(name)) {
      test(s"execute (ambiguity error, like the reference's SQL): $name") {
        // r10: the planner now rejects the duplicated bare name itself with
        // a LOCATED error (the reference's name_resolver.rs:509-520 rule,
        // added off fuzz seed 543) — strictly earlier and better-located
        // than the Spark AMBIGUOUS_REFERENCE analysis error it replaced
        val e = intercept[graft.plan.PlanError] {
          TestSpark.compile(src).collect()
        }
        assert(e.getMessage.contains("ambiguous reference"), e.getMessage)
      }
    } else if (!parseOnly(name)) {
      test(s"execute: $name") {
        val out = TestSpark.compileWith(src, overridesFor(name))
        out.collect() // force full analysis + execution
      }
    }
  }
}
