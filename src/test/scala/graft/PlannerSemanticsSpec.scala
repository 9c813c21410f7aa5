package graft

import graft.plan.PlanError
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Exact-result semantics of the planner's lowering decisions, on in-memory
  * data small enough to reason about by hand. */
class PlannerSemanticsSpec extends AnyFunSuite {

  import TestSpark.{compile, spark}

  private def rows(prql: String): Seq[Row] = compile(prql).collect().toSeq

  private def nums(spec: String): Unit = {
    val df = spark.range(1, 101).toDF("n") // 1..100
    df.createOrReplaceTempView("nums")
  }

  private lazy val numsReady: Unit = {
    import spark.implicits._
    (1L to 100L).toDF("n").createOrReplaceTempView("nums")
  }

  private def compileSess(prql: String): Seq[Row] = {
    numsReady
    Graft.compileSession(prql, spark).collect().toSeq
  }

  // ---- arithmetic & literals ----

  test("left-associative arithmetic evaluates like flat SQL") {
    val r = rows("derive [y = 10 - 4 + 1, z = 2 - 3 - 4]").head
    assert(r.getLong(r.fieldIndex("y")) == 7L)
    assert(r.getLong(r.fieldIndex("z")) == -5L)
  }

  test("null semantics: == null lowers to IS NULL, ?? to coalesce") {
    val r = rows(
      """from employees
        |filter first_name == null
        |select [last_name, t = tax ?? -1]""".stripMargin)
    assert(r == Seq(Row("Turing", 10.0)))
  }

  test("a join re-introducing a kept column makes the bare name a located rejection") {
    // r10 differential fuzz, seed 543: select keeps v but drops k, a second
    // join against the same dim re-introduces v — referencing bare `v` must
    // be the reference's located "ambiguous reference" (name_resolver.rs:
    // 509-520), not Spark's unlocated AMBIGUOUS_REFERENCE at analysis
    import spark.implicits._
    (1L to 10L).map(i => (i, i % 3, i % 5)).toDF("a", "b", "c")
      .createOrReplaceTempView("amb_fuzz")
    (1L to 8L).map(k => (k, k * 3 % 13)).toDF("k", "v")
      .createOrReplaceTempView("amb_dim")
    val prql =
      """from amb_fuzz
        |join amb_dim [a == k]
        |select [a, b, v]
        |join amb_dim [a == k]
        |select [a, v]""".stripMargin
    val e = intercept[PlanError](Graft.compileSession(prql, spark))
    assert(e.getMessage.contains("ambiguous reference 'v'"), e.getMessage)
    assert(e.getMessage.contains("--> line"), s"must be located: ${e.getMessage}")
    // the qualified form stays compilable — that's the remedy the error names
    val ok = Graft.compileSession(
      """from amb_fuzz
        |join amb_dim [a == k]
        |select [a, b, v]
        |join side:inner d2 = amb_dim [a == k]
        |select [a, vv = d2.v]""".stripMargin, spark)
    assert(ok.collect().length == 8) // inner joins keep the k <= 8 rows
  }

  // ---- take semantics (1-based inclusive) ----

  test("take n..m is a 1-based inclusive slice") {
    assert(compileSess("from nums\nsort n\ntake 5..7").map(_.getLong(0)) == Seq(5L, 6L, 7L))
    assert(compileSess("from nums\nsort n\ntake 98..").map(_.getLong(0)) == Seq(98L, 99L, 100L))
    assert(compileSess("from nums\nsort n\ntake 3").map(_.getLong(0)) == Seq(1L, 2L, 3L))
    assert(compileSess("from nums\nsort n\ntake ..2").map(_.getLong(0)) == Seq(1L, 2L))
  }

  test("consecutive takes compose (slice of a slice)") {
    assert(compileSess("from nums\nsort n\ntake 10..20\ntake 2..3").map(_.getLong(0)) == Seq(11L, 12L))
  }

  // ---- distinct & grouped take ----

  test("group ks (take 1) without sort is DISTINCT over the whole frame") {
    val r = rows(
      """from employees
        |select [country, title]
        |group country (take 1)
        |sort [country, title]""".stripMargin)
    // USA has two distinct titles -> distinct over (country,title) keeps both,
    // mirroring distinct.rs:33-40 (not one arbitrary row per country)
    assert(r == Seq(Row("UK", "Eng"), Row("USA", "Eng"), Row("USA", "Ops")))
  }

  test("grouped sorted take n is top-k per group") {
    val r = rows(
      """from employees
        |group country (
        |  sort [-salary]
        |  take 1
        |)
        |select [country, name]
        |sort country""".stripMargin)
    assert(r == Seq(Row("UK", "Alan T"), Row("USA", "Grace H")))
  }

  test("grouped unsorted take >1 is a named error (reference emits nondeterministic ROW_NUMBER)") {
    val e = intercept[PlanError](compile("from employees\ngroup country (take 2)"))
    assert(e.getMessage.contains("requires a sort"))
  }

  test("group ks (take 1..1) without sort is DISTINCT too (distinct.rs take_only_first)") {
    val r = rows(
      """from employees
        |select [country, title]
        |group country (take 1..1)
        |sort [country, title]""".stripMargin)
    assert(r == Seq(Row("UK", "Eng"), Row("USA", "Eng"), Row("USA", "Ops")))
  }

  test("or/and precedence in filters matches flat SQL semantics") {
    // salary > 2500 or country == "UK" and gender == "M"
    // ≡ salary > 2500 OR (country = UK AND gender = M) -> Grace + Alan
    val r = rows(
      """from employees
        |filter salary > 2500 or country == "UK" and gender == "M"
        |select [name]
        |sort name""".stripMargin)
    assert(r == Seq(Row("Alan T"), Row("Grace H")))
  }

  // ---- join semantics ----

  test("USING join dedups the key column") {
    val df = compile("from employees\njoin titles [emp_no]")
    assert(df.columns.count(_ == "emp_no") == 1)
  }

  test("USING join validates both sides") {
    val e = intercept[PlanError](compile("from employees\njoin titles [salary]"))
    assert(e.getMessage.contains("missing from the right side"))
  }

  test("bare join condition resolves against exactly one side; ambiguity is an error") {
    // titles has `title`, employees has `title` -> ambiguous bare ident
    val e = intercept[PlanError](
      compile("from employees\njoin titles [title == title]"))
    assert(e.getMessage.contains("both sides"))
    // qualified works
    val ok = compile("from e=employees\njoin titles [e.emp_no == titles.emp_no]")
    assert(ok.count() == 3)
  }

  // ---- transform nesting legality ----

  test("filter/join are rejected inside group") {
    val e1 = intercept[PlanError](
      compile("from employees\ngroup country (filter salary > 0)"))
    assert(e1.getMessage.contains("not allowed inside group"))
    val e2 = intercept[PlanError](
      compile("from employees\ngroup country (join titles [emp_no])"))
    assert(e2.getMessage.contains("not allowed inside group"))
  }

  test("only select/derive are legal inside window") {
    val e = intercept[PlanError](
      compile("from employees\nwindow rows:-1..0 (filter salary > 0)"))
    assert(e.getMessage.contains("not allowed inside window"))
  }

  test("group keys must be idents, even inside a list") {
    val e = intercept[PlanError](
      compile("from employees\ngroup [country, salary + 1] (aggregate [n = count])"))
    assert(e.getMessage.contains("group keys must be idents"))
  }

  test("sort by expression is rejected") {
    val e = intercept[PlanError](compile("from employees\nsort (salary + 1)"))
    assert(e.getMessage.contains("sort expects column identifiers"))
  }

  test("jinja blocks parse but planning rejects them with a named error") {
    val e = intercept[PlanError](compile("from {{ ref('x') }}\ntake 1"))
    assert(e.getMessage.contains("jinja"))
  }

  test("jinja blocks pass through VERBATIM in the SQL text backend") {
    // the reference's artifact behavior (translator.rs:44-46, :764): the
    // rendered SQL is a TEMPLATE for a downstream jinja renderer, so the
    // blocks must survive untouched — in FROM position and in expressions
    val sql = Graft.toSparkSql(
      "from {{ ref('x') }}\nfilter country == {{ var('country') }}\ntake 1")
    assert(sql.contains("FROM {{ ref('x') }}"), sql)
    assert(sql.contains("{{ var('country') }}"), sql)
    assert(sql.contains("LIMIT 1"), sql)
  }

  // ---- window semantics ----

  test("rolling window sums trail n rows inclusive") {
    val r = compileSess(
      """from nums
        |sort n
        |window rolling:3 (derive [r = sum n])
        |filter n <= 4
        |select [n, r]""".stripMargin)
    assert(r.map(x => (x.getLong(0), x.getLong(1))) ==
      Seq((1L, 1L), (2L, 3L), (3L, 6L), (4L, 9L)))
  }

  test("expanding window is a running total") {
    val r = compileSess(
      """from nums
        |sort n
        |window expanding:true (derive [r = sum n])
        |filter n <= 4
        |select [n, r]""".stripMargin)
    assert(r.map(x => (x.getLong(0), x.getLong(1))) ==
      Seq((1L, 1L), (2L, 3L), (3L, 6L), (4L, 10L)))
  }

  test("aggregate over an ambient sort with no explicit frame is a full-partition total") {
    // wrap_into_windowed default (Rows, unbounded..unbounded) survives frame
    // elision when sorted — NOT a running sum (ADVICE r2, name_resolver.rs:343-373)
    val r = compileSess(
      """from nums
        |sort n
        |derive [t = sum n]
        |filter n <= 3
        |select [n, t]""".stripMargin)
    assert(r.map(x => (x.getLong(0), x.getLong(1))) ==
      Seq((1L, 5050L), (2L, 5050L), (3L, 5050L)))
  }

  test("bare `window (...)` sets the same Rows-unbounded frame") {
    val r = compileSess(
      """from nums
        |sort n
        |window (derive [t = sum n])
        |filter n <= 2
        |select [n, t]""".stripMargin)
    assert(r.map(x => (x.getLong(0), x.getLong(1))) == Seq((1L, 5050L), (2L, 5050L)))
  }

  test("combined window arguments follow the reference priority (expanding > rows)") {
    // transforms.rs:225-240: expanding wins over rows; an error here would
    // reject reference-legal queries
    val r = compileSess(
      """from nums
        |sort n
        |window expanding:true rows:0..1 (derive [r = sum n])
        |filter n <= 3
        |select [n, r]""".stripMargin)
    assert(r.map(x => (x.getLong(0), x.getLong(1))) ==
      Seq((1L, 1L), (2L, 3L), (3L, 6L)))
  }

  test("rolling:0 and expanding:false fall through to the next frame argument") {
    val r = compileSess(
      """from nums
        |sort n
        |window expanding:false rolling:0 rows:0..1 (derive [r = sum n])
        |filter n <= 3
        |select [n, r]""".stripMargin)
    assert(r.map(x => (x.getLong(0), x.getLong(1))) ==
      Seq((1L, 3L), (2L, 5L), (3L, 7L)))
  }

  test("grouped take after aggregate keeps rows only when the range admits 1") {
    val keep = rows(
      """from employees
        |group country (aggregate [s = sum salary] | take 1)""".stripMargin)
    assert(keep.nonEmpty)
    val none = rows(
      """from employees
        |group country (aggregate [s = sum salary] | take 0)""".stripMargin)
    assert(none.isEmpty)
    val none2 = rows(
      """from employees
        |group country (aggregate [s = sum salary] | take 2..)""".stripMargin)
    assert(none2.isEmpty)
  }

  test("lag/lead honor the ambient group sort") {
    val r = rows(
      """from employees
        |group country (
        |  sort [salary]
        |  derive [p = lag 1 salary]
        |)
        |select [name, p]
        |sort name""".stripMargin)
    assert(r == Seq(Row("Ada L", null), Row("Alan T", null), Row("Grace H", 1000.0)))
  }

  // ---- functions ----

  test("function inlining with currying and named defaults") {
    val r = rows(
      """func scale by:10 x -> x * by
        |
        |from employees
        |derive [a = (salary | scale), b = (salary | scale by:2), c = (scale 3 salary)]
        |filter emp_no == 1
        |select [a, b, c]""".stripMargin).head
    assert(r == Row(10000.0, 2000.0, 3000.0))
  }

  test("join with two separate condition arguments is an error, not a silent drop") {
    val e = intercept[PlanError](
      compile("from e=employees\njoin titles [e.emp_no == titles.emp_no] [e.salary > 0]"))
    assert(e.getMessage.contains("one condition argument"))
  }

  test("a table def referencing its own name reads the base table (non-recursive WITH)") {
    val r = rows(
      """table employees = (
        |  from employees
        |  filter salary >= 2000
        |)
        |
        |from employees
        |aggregate [n = count]""".stripMargin).head
    assert(r.getLong(0) == 2L)
  }

  test("aggregate context survives ! and f-strings") {
    val r = rows(
      """from employees
        |group country (
        |  aggregate [ok = !(min salary == 0), lbl = f"n={count}"]
        |)
        |sort country""".stripMargin)
    assert(r == Seq(Row("UK", true, "n=1"), Row("USA", true, "n=2")))
  }

  test("f-/s-string interpolations capture the value at their pipeline position under a later shadow") {
    // VERDICT r13 #5's targeted half: the fuzz band covers s-string x
    // shadow compositions over Long columns; f-strings produce STRINGS,
    // outside the band's integer-only oracle, so the law is pinned here.
    // Both interpolation forms must read the column as bound WHERE THE
    // STRING WAS DERIVED — a lazy re-binding against the post-shadow
    // value would print v=10/eval 11 instead of v=2/3.
    val r = compileSess(
      """from nums
        |filter n <= 2
        |derive d = n * 2
        |derive lbl = f"v={d}"
        |derive sx = s"({d} + 1)"
        |derive d = n * 10
        |sort n
        |select [n, d, lbl, sx]""".stripMargin)
    assert(r == Seq(Row(1L, 10L, "v=2", 3L), Row(2L, 20L, "v=4", 5L)),
      s"interpolation must capture pre-shadow values, got $r")
  }

  test("a hidden sort-carry dies at the aggregate boundary (fuzz seed 33932)") {
    // r14 band at offset 33000: sort on c, select drops c (carry
    // __gsort_c appended), group+aggregate re-keys the relation — the
    // Aggregate output has no carry, but carryCols survived, so the
    // derive-rebind's by-name re-projection emitted a dead '__gsort_c
    // reference (UNRESOLVED_COLUMN at analysis). The carry must clear
    // with the ambient sort it serves.
    import TestSpark.spark
    import spark.implicits._
    (1L to 60L).map(i => (i, i % 7, (i % 11) - 5)).toDF("a", "b", "c")
      .createOrReplaceTempView("carry_fuzz")
    val prql =
      """from carry_fuzz
        |sort [+c, a]
        |select [a, b]
        |group a (aggregate [s2 = sum b, n2 = count])
        |derive n2 = a * 2 + 9
        |group a (
        |  sort [+s2, a]
        |  take 1
        |)
        |derive x5 = s"({a} * {n2} + 8)"
        |sort a""".stripMargin
    val rows = Graft.compileSession(prql, spark).collect()
    assert(rows.length == 60, "a is unique, so per-key take 1 keeps every key")
    val r3 = rows.find(_.getAs[Long]("a") == 3L).get
    assert(r3.getAs[Long]("s2") == 3L, "sum of b over the single a=3 row")
    assert(r3.getAs[Long]("n2") == 15L, "rebound n2 = a*2+9")
    assert(r3.getAs[Long]("x5") == 53L, "s-string reads the rebound n2")
  }

  test("take after aggregate inside group stays per-group (keeps every group)") {
    val r = rows(
      """from employees
        |group country (
        |  aggregate [n = count]
        |  take 1
        |)
        |sort country""".stripMargin)
    assert(r.map(_.getString(0)) == Seq("UK", "USA"))
    // take 2.. over 1-row groups selects nothing
    val empty = rows(
      """from employees
        |group country (
        |  aggregate [n = count]
        |  take 2..
        |)""".stripMargin)
    assert(empty.isEmpty)
  }

  test("unknown window arguments are rejected") {
    val e = intercept[PlanError](
      compile("from employees\nwindow row:-2..0 (derive [s = sum salary])"))
    assert(e.getMessage.contains("unknown window argument"))
  }

  test("window body legality holds even without a frame argument") {
    val e = intercept[PlanError](
      compile("from employees\nwindow (filter salary > 0)"))
    assert(e.getMessage.contains("not allowed inside window"))
  }

  test("user functions inline inside s-string interpolations") {
    val r = rows(
      """func double x -> x * 2
        |
        |from employees
        |filter emp_no == 1
        |select [y = s"CAST({double salary} AS DOUBLE)"]""".stripMargin)
    assert(r == Seq(Row(2000.0)))
  }

  test("malformed @ literals are lex errors, not silent strings") {
    intercept[Exception](Graft.parse("from t\nfilter d > @2020-01-01+1days"))
    intercept[Exception](Graft.parse("from t\nderive x = @garbage"))
  }

  test("zero-arg filter/aggregate produce named errors") {
    val e1 = intercept[PlanError](compile("from employees\nfilter"))
    assert(e1.getMessage.contains("filter expects"))
    val e2 = intercept[PlanError](compile("from employees\naggregate []"))
    assert(e2.getMessage.contains("aggregate expects"))
  }

  test("a user function named like an agg builtin takes precedence in aggregate") {
    val r = rows(
      """func sum x -> 42
        |
        |from employees
        |aggregate [s = (sum salary)]""".stripMargin).head
    assert(r.getLong(0) == 42L)
  }

  test("table definitions behave as CTEs and compose") {
    val r = rows(
      """table rich = (
        |  from employees
        |  filter salary >= 2000
        |)
        |
        |from rich
        |aggregate [n = count]""".stripMargin).head
    assert(r.getLong(0) == 2L)
  }

  test("twice-shadowed sort key replaces its carry instead of duplicating it") {
    // r11 ADVICE: sort x | derive x=… | sort x | derive x=… created a second
    // __gsort_x while carryCols still held the first — the Project emitted
    // two same-named hidden attributes and the take's re-sort repoint died
    // with an ambiguous reference on a valid pipeline. The second `sort n`
    // re-establishes the bare name, so the old carry is dead: replace it.
    val got = compileSess(
      """from nums
        |sort [-n]
        |derive n = n + 1000
        |sort [-n]
        |derive n = n - 2000
        |take 3""".stripMargin).map(_.getLong(0))
    // after derive1: n = old+1000, ambient order by old n desc (carried);
    // sort -n re-sorts by the new n desc (same order here, values shifted);
    // derive2: n = that - 2000, ambient order by pre-derive2 value desc.
    // top 3 of 1..100: 100,99,98 → +1000 → sorted desc → -2000.
    assert(got == Seq(-900L, -901L, -902L))
  }
}
