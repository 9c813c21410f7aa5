package graft

/** Measurement tool (optimization r16): generalizes [[SpreadProbe]] to any
  * session conf — in ONE session, A/B the given conf key's settings over a
  * query list, alternating executions so host drift hits both arms equally.
  *
  * Usage: runMain graft.KnobProbe <runsPerArm> <confKey> <setting,...> <query> [query ...]
  * The literal setting "unset" removes the conf (the operator's default).
  */
object KnobProbe {
  def main(args: Array[String]): Unit = {
    val runs = args(0).toInt
    val key = args(1)
    val settings = args(2).split(",").toSeq
    val names = args.drop(3).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.localSession(cpus)
    def arm(s: String): Unit =
      if (s == "unset") spark.conf.unset(key) else spark.conf.set(key, s)
    def execute(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val acc = scala.collection.mutable.Map.empty[(String, String), Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (s <- settings; n <- names) {
      arm(s)
      try execute(n) catch { case e: Throwable =>
        System.err.println(s"[probe] warm $n@$s failed: ${e.getMessage}") }
    }
    for (r <- 1 to runs; s <- settings; n <- names) {
      arm(s)
      val d = execute(n)
      acc((n, s)) = acc((n, s)) :+ d
      System.err.println(f"[probe] run=$r $n%-26s $s%-6s $d%7.3f s")
    }
    println("query,setting,median,min,max,n")
    for (n <- names; s <- settings) {
      val v = acc((n, s)).sorted
      if (v.nonEmpty)
        println(f"$n,$s,${v(v.size / 2)}%.3f,${v.head}%.3f,${v.last}%.3f,${v.size}")
    }
    spark.stop()
  }
}
