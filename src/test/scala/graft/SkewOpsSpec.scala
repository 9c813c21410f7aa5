package graft

import graft.pipeline.SkewOps
import org.scalatest.funsuite.AnyFunSuite

/** Salted joins must be result-identical to plain joins while spreading a
  * hot key across the salted key space. */
class SkewOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def skewed = {
    import spark.implicits._
    // 95% of rows share key 1 — the shape AQE splitting alone can't fix
    (1 to 2000).map(i => (if (i % 20 == 0) (i % 50).toLong else 1L, i.toLong))
      .toDF("k", "payload")
  }

  private def dim = {
    import spark.implicits._
    (0L to 49L).map(k => (k, s"name_$k")).toDF("k", "name")
  }

  test("salted inner join equals the plain inner join") {
    val plain = skewed.join(dim, Seq("k"), "inner")
      .collect().map(_.toString).sorted.toSeq
    val salted = SkewOps.saltedJoin(skewed, dim, "k", factor = 8)
      .select("k", "payload", "name")
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("salted left join preserves unmatched left rows exactly once") {
    import spark.implicits._
    val leftOnly = skewed.union(Seq((999L, -1L)).toDF("k", "payload"))
    val plain = leftOnly.join(dim, Seq("k"), "left")
      .collect().map(_.toString).sorted.toSeq
    val salted = SkewOps.saltedJoin(leftOnly, dim, "k", factor = 4, joinType = "left")
      .select("k", "payload", "name")
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
  }

  test("the shuffle key includes the salt (the hot key spreads)") {
    // force a shuffle join: at this toy size the dim side would broadcast
    // (which is the right plan — salting matters when it can't)
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = SkewOps.saltedJoin(skewed, dim, "k", factor = 8)
        .queryExecution.executedPlan.toString
      assert(p.contains("_salt_graft"), s"salt missing from plan:\n$p")
      assert("hashpartitioning\\(k#\\d+L?, _salt_graft".r.findFirstIn(p).isDefined,
        s"expected (k, salt) shuffle key in:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }
}
