package graft

/** Measures the multi-consumer re-execution hazard each Barrier prevents
  * (VERDICT r11 #9): every operator whose exclusion reason cites the
  * "measured-hazard class" runs twice — once at the default barrier
  * (`localCheckpoint`) and once at `spark.graft.barrier=none` (identity,
  * the measurement-only mode) — so the exclusion reasons carry numbers,
  * not anecdotes. The hazard is real work: with no barrier, every consumer
  * of the materialized relation (band keys, verify re-joins, rescore
  * passes) re-executes the producing plan, and pushed-down predicates
  * re-inline lambda chains with no CSE (the CollapseProject hazard,
  * doc'd on PipelineOps.materialized).
  *
  * Protocol: per op per mode, one untimed warm run (plan + parquet footer
  * cache) then the min of two timed runs to a noop sink (Bench's execute
  * shape). `none` runs are capped by `-DhazardTimeoutS` (default 600) via
  * a cancellable job group — a hazard that times out is reported as
  * `">= timeout"`, still a number. The timeout applies PER RUN (warm and
  * each timed run separately — ADVICE r12: a single timeout around all
  * three runs only guaranteed a per-run floor of timeout/3, so the ">=
  * timeout" floor overstated the measurement by up to 3x); the first run
  * to exceed it sets the floor and the op's remaining runs are skipped.
  *
  * Usage: `runMain graft.HazardProbe [sfDir]` (default /root/testdata/sf0.1).
  * Prints one JSON line: {"op":{"barrier_s":...,"none_s":...,"ratio":...}}.
  */
object HazardProbe {

  /** The exclusion entries that cite the measured-hazard class. */
  private val Ops = Seq(
    "p04_minhash_lsh",
    "p21_decontam",
    "p25_embed_quant",
    "p28_contamination_matrix",
    "p67_semantic_dedup")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.localSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val timeoutS = sys.props.getOrElse("hazardTimeoutS", "600").toLong

    def execute(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def timedMin(op: String): Double = {
      val fn = SparkEntry.queries(op)
      execute(fn(spark, dir)) // warm: plan + footers
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        execute(fn(spark, dir))
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    /** [[timedMin]] with the timeout applied to EACH run (warm, then each
      * timed run) rather than around the whole triple: None means some
      * single run exceeded timeoutS, so `timeoutS` is a true per-run
      * floor. Runs after the first timeout are skipped — they can only
      * confirm what the floor already states. */
    def timedMinPerRun(op: String): Option[Double] = {
      val fn = SparkEntry.queries(op)
      val warm = withTimeout(s"$op-warm") { execute(fn(spark, dir)); 0.0 }
      if (warm.isEmpty) None
      else {
        val runs = Iterator.range(0, 2).map { i =>
          withTimeout(s"$op-run$i") {
            val t0 = System.nanoTime()
            execute(fn(spark, dir))
            (System.nanoTime() - t0) / 1e9
          }
        }.takeWhile(_.nonEmpty).flatten.toSeq
        // any completed run is a true measurement (a later run timing out
        // only means contention — min over completed runs still holds);
        // None = no timed run finished, so timeoutS is a per-run floor
        if (runs.isEmpty) None else Some(runs.min)
      }
    }

    /** run under a cancellable job group; None = exceeded timeoutS */
    def withTimeout(tag: String)(body: => Double): Option[Double] = {
      import scala.concurrent.{Await, Future, ExecutionContext, TimeoutException}
      import scala.concurrent.duration._
      implicit val ec: ExecutionContext = ExecutionContext.global
      val fut = Future {
        spark.sparkContext.setJobGroup(s"hazard-$tag", tag, interruptOnCancel = true)
        try body finally spark.sparkContext.clearJobGroup()
      }
      try Some(Await.result(fut, timeoutS.seconds))
      catch {
        case _: TimeoutException =>
          System.err.println(s"[hazard] $tag exceeded ${timeoutS}s — cancelling")
          spark.sparkContext.cancelJobGroup(s"hazard-$tag")
          try Await.ready(fut, 120.seconds) catch { case _: Throwable => }
          None
      }
    }

    def f3(d: Double) = f"$d%.3f"
    val entries = Ops.map { op =>
      spark.conf.set(pipeline.Barrier.ModeKey, "localCheckpoint")
      val base = timedMin(op)
      spark.conf.set(pipeline.Barrier.ModeKey, "none")
      val noneOpt = try timedMinPerRun(op)
                    finally spark.conf.unset(pipeline.Barrier.ModeKey)
      val noneS = noneOpt.getOrElse(timeoutS.toDouble)
      val ratio = if (base > 0) noneS / base else -1.0
      System.err.println(s"[hazard] $op barrier=${f3(base)}s none=${f3(noneS)}s" +
        s" ratio=${f3(ratio)}${if (noneOpt.isEmpty) " (TIMEOUT floor, per-run)" else ""}")
      s""""$op":{"barrier_s":${f3(base)},"none_s":${f3(noneS)},"ratio":${f3(ratio)},"none_timed_out":${noneOpt.isEmpty},"timeout_scope":"per_run"}"""
    }
    println(entries.mkString("{", ",", "}"))
    spark.stop()
  }
}
