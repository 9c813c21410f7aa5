package graft

import org.scalatest.funsuite.AnyFunSuite

/** The surplus `join_asof` transform (VERDICT r8 stretch #8): p34's
  * tagged-union as-of shape behind the language surface —
  * `join_asof right [keys] on:ord tie:col`. Contracts: the q49 oracle
  * query over events is ROW-IDENTICAL to the p34 operator (same
  * semantics, independent constructions); error paths are located and
  * named; the SQL-text backend refuses with the documented divergence
  * error; the plan is the one-shuffle window shape (no range product). */
class JoinAsofSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map {
      case null => "NULL"; case x => x.toString
    }.mkString("|")).toSeq

  test("q49 join_asof row-equals the p34 operator") {
    val q49 = SparkEntry.queries("q49_asof_transform")(spark, dir)
    val p34 = graft.pipeline.PipelineOps.queries("p34_asof_join")(spark, dir)
    assert(q49.columns.toSeq == p34.columns.toSeq,
      s"column contract drifted: ${q49.columns.toSeq} vs ${p34.columns.toSeq}")
    val (a, b) = (rows(q49), rows(p34))
    assert(a.nonEmpty, "asof fixture lost its matches")
    assert(a == b, s"join_asof diverged from p34 (${a.length} vs ${b.length} rows); " +
      s"first diff ${a.zip(b).find(p => p._1 != p._2)}")
  }

  test("unmatched left rows survive with null right columns") {
    val df = SparkEntry.queries("q49_asof_transform")(spark, dir)
    val clicks = spark.read.parquet(s"$dir/events.parquet")
      .filter("event_type = 'click'").count()
    assert(df.count() == clicks, "as-of is left-preserving: every click must appear")
    assert(df.filter("view_id IS NULL").count() > 0,
      "the fixture has clicks before any view — they must carry nulls")
  }

  test("error paths are named: missing on/tie/keys, bad args, collisions") {
    def compileErr(q: String): String =
      intercept[graft.plan.PlanError](Graft.compileDir(q, spark, dir)).getMessage
    assert(compileErr("from events\njoin_asof events [user_id] tie:event_id")
      .contains("on:"))
    assert(compileErr("from events\njoin_asof events [user_id] on:ts")
      .contains("tie:"))
    assert(compileErr("from events\njoin_asof events on:ts tie:event_id")
      .contains("at least one equi key"))
    assert(compileErr("from events\njoin_asof events [user_id] on:no_such tie:event_id")
      .contains("missing from the left"))
    // self-join without an alias: every renamed right column collides
    val collide = compileErr(
      """table e2 = (
        |  from events
        |  derive events_ts = ts
        |)
        |from e2
        |join_asof events [user_id] on:ts tie:event_id""".stripMargin)
    assert(collide.contains("collides"))
  }

  test("null semantics: null-ord/null-key right rows never match; null left rows match nothing") {
    // NULLS-FIRST ordering would otherwise hand the null-ts right row to
    // click 100 (which has no real predecessor), and null keys would
    // match each other (code-review r9 finding)
    spark.sql(
      """SELECT * FROM VALUES
           (100L, 1L, TIMESTAMP'2024-01-01 10:00:00'),
           (101L, 1L, TIMESTAMP'2024-01-01 12:00:00'),
           (102L, CAST(NULL AS BIGINT), TIMESTAMP'2024-01-01 10:00:00'),
           (103L, 2L, CAST(NULL AS TIMESTAMP))
         AS t(event_id, user_id, ts)""").createOrReplaceTempView("asof_l")
    spark.sql(
      """SELECT * FROM VALUES
           (200L, 1L, CAST(NULL AS TIMESTAMP)),
           (201L, CAST(NULL AS BIGINT), TIMESTAMP'2024-01-01 09:00:00'),
           (202L, 1L, TIMESTAMP'2024-01-01 11:00:00')
         AS t(event_id, user_id, ts)""").createOrReplaceTempView("asof_r")
    val got = Graft.compileSession(
      """from asof_l
        |join_asof asof_r [user_id] on:ts tie:event_id
        |select [event_id, matched = asof_r_event_id]
        |sort event_id""".stripMargin, spark)
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
    assert(got == Seq(
      100L -> None,        // no prior view; null-ts right row 200 must NOT match
      101L -> Some(202L),  // the real 11:00 view matches
      102L -> None,        // null-key left row matches nothing (not row 201)
      103L -> None),       // null-ord left row matches nothing
      s"null semantics violated: $got")
  }

  test("the SQL-text backend refuses join_asof with the documented error") {
    val e = intercept[graft.plan.SqlGenError](
      Graft.toSparkSql(SparkEntry.asofPrql))
    assert(e.getMessage.contains("join_asof is not SQL-text-expressible"))
  }

  test("plan shape: one window over the union, no join operator at all") {
    val df = SparkEntry.queries("q49_asof_transform")(spark, dir)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"as-of must be the tagged-union window, not a join:\n$plan")
    assert(plan.contains("Window"), s"expected the as-of window:\n$plan")
  }

  test("physical shape: exactly one key-hash exchange (plus the output sort)") {
    val df = SparkEntry.queries("q49_asof_transform")(spark, dir)
    val phys = df.queryExecution.executedPlan.toString
    val hashEx = "hashpartitioning\\(user_id".r.findAllIn(phys).size
    assert(hashEx == 1,
      s"the as-of match must shuffle on the key exactly once, found $hashEx:\n$phys")
    // the only other exchange is the trailing ORDER BY's range partitioner
    val allEx = "Exchange ".r.findAllIn(phys).size
    assert(allEx <= 2, s"unexpected extra exchanges ($allEx):\n$phys")
  }
}
