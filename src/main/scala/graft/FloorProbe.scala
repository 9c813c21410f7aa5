package graft

/** Measurement tool (optimization r16, VERDICT r15 #6): split the
  * ~0.1-0.15 s per-query harness floor into its parts for a given query.
  * Per timed sample (N of each, interleaved):
  *   - build_plan: fn(spark, dir) + force queryExecution.executedPlan —
  *     PRQL/SQL compile + analyze + optimize + physical planning + codegen
  *     prep, NO job;
  *   - exec_cached: noop save of ONE prebuilt Dataset (plan + codegen
  *     reused across samples) — scan + compute + job submit + commit;
  *   - full: fn + noop save, the bench's actual per-run methodology;
  *   - submit_floor: noop save of spark.range(1) — pure job submit/commit.
  * full ≈ build_plan + exec_cached; the floor's split is readable directly.
  *
  * Usage: runMain graft.FloorProbe <n> <query> [query ...]
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val n = args(0).toInt
    val names = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.localSession(cpus)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def med(v: Seq[Double]): Double = v.sorted.apply(v.size / 2)
    println("query,phase,median_ms,min_ms,n")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm everything once
      (1 to 3).foreach(_ => noop(fn(spark, sfDir)))
      val cached = fn(spark, sfDir)
      noop(cached)
      val trivial = spark.range(1).toDF()
      noop(trivial)
      def sample(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      val acc = scala.collection.mutable.Map.empty[String, Vector[Double]]
        .withDefaultValue(Vector.empty)
      (1 to n).foreach { _ =>
        acc("build_plan") :+= sample {
          fn(spark, sfDir).queryExecution.executedPlan
        }
        acc("exec_cached") :+= sample(noop(cached))
        acc("full") :+= sample(noop(fn(spark, sfDir)))
        acc("submit_floor") :+= sample(noop(trivial))
      }
      for (phase <- Seq("build_plan", "exec_cached", "full", "submit_floor")) {
        val v = acc(phase)
        println(f"$name,$phase,${med(v)}%.1f,${v.min}%.1f,${v.size}")
      }
    }
    spark.stop()
  }
}
