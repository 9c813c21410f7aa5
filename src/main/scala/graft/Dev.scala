package graft

import org.apache.spark.sql.SparkSession

/** Scratch runner for local iteration: `sbt "runMain graft.Dev"`.
  * Not part of the driver contract. */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession("8")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"

    val queries = Seq(
      "filter+select+take" ->
        """from lineitem
          |filter l_quantity > 45
          |select [l_orderkey, l_quantity, l_extendedprice]
          |sort [-l_extendedprice]
          |take 5""".stripMargin,
      "derive" ->
        """from lineitem
          |derive disc_price = l_extendedprice * (1 - l_discount)
          |select [l_orderkey, disc_price]
          |sort [-disc_price]
          |take 3""".stripMargin,
      "group-agg" ->
        """from lineitem
          |group [l_returnflag, l_linestatus] (
          |  aggregate [
          |    sum_qty = sum l_quantity,
          |    avg_price = average l_extendedprice,
          |    ct = count,
          |  ]
          |)
          |sort [l_returnflag, l_linestatus]""".stripMargin,
      "join-asof" ->
        """table clicks = (
          |  from events
          |  filter event_type == "click"
          |  select [event_id, user_id, ts]
          |)
          |table views = (
          |  from events
          |  filter event_type == "view"
          |  select [event_id, user_id, ts]
          |)
          |from clicks
          |join_asof views [user_id] on:ts tie:event_id
          |select [click_id = event_id, user_id, view_id = views_event_id]
          |sort click_id
          |take 5""".stripMargin,
      "join-using-group" ->
        """from customer
          |join nation [n_nationkey == c_nationkey]
          |group [n_name] (aggregate [nc = count, bal = sum c_acctbal])
          |sort [-nc, n_name]
          |take 5""".stripMargin,
      "distinct" ->
        """from customer
          |select c_mktsegment
          |group c_mktsegment (take 1)
          |sort c_mktsegment""".stripMargin,
      "topk-per-group" ->
        """from orders
          |group o_custkey (sort [-o_totalprice] | take 1)
          |sort [-o_totalprice]
          |take 5
          |select [o_custkey, o_orderkey, o_totalprice]""".stripMargin,
      "window-lag" ->
        """from orders
          |filter o_custkey == 1
          |sort o_orderdate
          |derive [prev_price = lag 1 o_totalprice, rn = row_number]
          |select [o_orderkey, o_totalprice, prev_price, rn]""".stripMargin,
      "window-rolling" ->
        """from events
          |filter user_id == 1
          |group user_id (
          |  sort ts
          |  window rolling:3 (derive [r3 = sum value])
          |)
          |select [event_id, value, r3]
          |sort event_id
          |take 5""".stripMargin,
      "having+fstring" ->
        """from nation
          |group n_regionkey (aggregate [n = count])
          |filter n > 3
          |derive tag = f"region_{n_regionkey}"
          |sort n_regionkey""".stripMargin,
      "func-inline" ->
        """func disc x d -> x * (1 - d)
          |
          |from lineitem
          |derive dp = (disc l_extendedprice l_discount)
          |select [l_orderkey, dp]
          |sort [-dp]
          |take 3""".stripMargin,
      "cte" ->
        """table big_orders = (
          |  from orders
          |  filter o_totalprice > 100000
          |)
          |
          |from big_orders
          |group o_orderstatus (aggregate [n = count])
          |sort o_orderstatus""".stripMargin,
      "take-range" ->
        """from orders
          |sort [-o_totalprice, o_orderkey]
          |take 4..6
          |select [o_orderkey, o_totalprice]""".stripMargin,
      "sstring+null+in" ->
        """from orders
          |filter (o_totalprice | in 1000..2000)
          |filter o_orderstatus != null
          |derive yr = s"year(o_orderdate)"
          |group yr (aggregate [n = count])
          |sort yr""".stripMargin,
    )

    // error-path probes: each should fail with a clean, named error
    val probes = Seq(
      "probe-syntax-error" -> "from lineitem | filter l_quantity >",
      "probe-unknown-table" -> "from no_such_table | take 3",
      "probe-unknown-func" -> "from lineitem | derive x = (frobnicate l_quantity)",
      "probe-agg-arity" -> "from lineitem | aggregate average l_quantity x",
    )

    val only = if (args.nonEmpty) args.toSet else Set.empty[String]
    var failed = 0
    queries.foreach { case (name, q) =>
      if (only.isEmpty || only(name)) {
        try {
          val df = Graft.compileDir(q, spark, dir)
          println(s"=== $name")
          df.show(8, truncate = false)
        } catch {
          case e: Throwable =>
            failed += 1
            println(s"=== $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    }
    probes.foreach { case (name, q) =>
      if (only.isEmpty || only(name)) {
        try {
          Graft.compileDir(q, spark, dir).collect()
          println(s"=== $name: UNEXPECTED SUCCESS")
          failed += 1
        } catch {
          case e: Throwable =>
            println(s"=== $name rejected as expected: ${e.getClass.getSimpleName}: ${e.getMessage.linesIterator.next()}")
        }
      }
    }
    // annotate-mode and located-error probes (round-3 surface)
    if (only.isEmpty) {
      try {
        val fr = Annotate.frames("from nation\nselect [n_name]", spark,
          Graft.parquetCatalog(spark, dir))
        if (fr.contains("# [n_name]")) println("=== probe-frames ok")
        else { failed += 1; println(s"=== probe-frames BAD OUTPUT:\n$fr") }
        val rf = Annotate.refs("from nation\nselect [n_name]", spark,
          Graft.parquetCatalog(spark, dir))
        if (rf.contains("nation -> table")) println("=== probe-refs ok")
        else { failed += 1; println(s"=== probe-refs BAD OUTPUT:\n$rf") }
        try {
          Graft.compileDir("from nation\nfilter no_col > 1", spark, dir)
          failed += 1; println("=== probe-located-error: UNEXPECTED SUCCESS")
        } catch {
          case e: Throwable =>
            if (e.getMessage.contains("--> line 2")) println("=== probe-located-error ok")
            else { failed += 1; println(s"=== probe-located-error UNLOCATED: ${e.getMessage}") }
        }
      } catch {
        case e: Throwable =>
          failed += 1
          println(s"=== annotate probes FAILED: ${e.getMessage}")
      }
    }
    println(s"done, failed=$failed")
    spark.stop()
  }
}
