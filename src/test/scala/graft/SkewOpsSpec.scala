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

  test("salted right join preserves unmatched right rows exactly once") {
    import spark.implicits._
    // dim keys 0..49 but skewed has no key 0 or 37-multiples missing? build
    // an explicit unmatched right row instead: key 999 exists only on right
    val rightOnly = dim.union(Seq((999L, "orphan")).toDF("k", "name"))
    val plain = skewed.join(rightOnly, Seq("k"), "right")
      .collect().map(_.toString).sorted.toSeq
    val salted = SkewOps.saltedJoin(skewed, rightOnly, "k", factor = 4, joinType = "right")
      .select("k", "payload", "name")
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
    assert(plain.exists(_.contains("orphan")))
  }

  test("salted full join preserves unmatched rows on BOTH sides exactly once") {
    import spark.implicits._
    val leftPlus = skewed.union(Seq((777L, -7L)).toDF("k", "payload"))   // left-only key
    val rightPlus = dim.union(Seq((999L, "orphan")).toDF("k", "name"))   // right-only key
    val plain = leftPlus.join(rightPlus, Seq("k"), "full")
      .collect().map(_.toString).sorted.toSeq
    val salted = SkewOps.saltedJoin(leftPlus, rightPlus, "k", factor = 4, joinType = "full")
      .select("k", "payload", "name")
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
    assert(plain.exists(_.contains("orphan")) && plain.exists(_.contains("-7")))
  }

  test("a pre-existing _salt_graft column is not clobbered") {
    import spark.implicits._
    val leftWithSalt = skewed.withColumn("_salt_graft",
      org.apache.spark.sql.functions.lit("user-data"))
    val out = SkewOps.saltedJoin(leftWithSalt, dim, "k", factor = 4)
    assert(out.columns.contains("_salt_graft"), "user column must survive")
    assert(out.select("_salt_graft").distinct().collect().map(_.getString(0)).toSeq
      == Seq("user-data"))
  }

  test("map-typed columns don't break salting (excluded from the salt hash)") {
    import spark.implicits._
    val leftWithMap = skewed.withColumn("m",
      org.apache.spark.sql.functions.map(
        org.apache.spark.sql.functions.lit("a"),
        org.apache.spark.sql.functions.col("payload")))
    val plain = leftWithMap.join(dim, Seq("k"), "inner").count()
    val salted = SkewOps.saltedJoin(leftWithMap, dim, "k", factor = 8).count()
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
