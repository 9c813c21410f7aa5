package graft

import graft.ast.Query
import graft.parse.{LexError, ParseError, Parser, SpanMap}
import graft.plan.{PlanError, Planner}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Public API: compile PRQL straight to a Spark DataFrame.
  *
  * The reference (prql/prql v0.2.2) compiles PRQL → SQL string and delegates
  * execution to a database (prql-compiler/src/lib.rs:19-27). Here the
  * "database" is Spark: we parse + resolve the same language and fold each
  * transform into DataFrame operations, so Catalyst/Tungsten provide the
  * optimizer and execution engine.
  */
object Graft {

  /** Parse only — returns the AST. Lex/parse errors are rethrown with a
    * located, annotated message (line/col + underlined source line). */
  def parse(prql: String): Query = parseLocated(prql)._1

  /** Parse with located lex/parse errors, keeping the span side-table. */
  private def parseLocated(prql: String): (Query, SpanMap) =
    try Parser.parseWithSpans(prql)
    catch {
      case e: LexError =>
        throw new LexError(ErrorRender.annotateAt(prql, e.getMessage, e.pos), e.pos)
      case e: ParseError =>
        throw new ParseError(ErrorRender.annotateAt(prql, e.getMessage, e.pos), e.pos)
    }

  /** Compile against an explicit table resolver (`from name` → DataFrame). */
  def compile(prql: String, spark: SparkSession,
              catalog: String => DataFrame): DataFrame =
    compileWithDiagnostics(prql, spark, catalog)._1

  /** Parse + plan with located, annotated errors; returns the planner (for
    * diagnostics/stage traces) and the planned main DataFrame. Single entry
    * for compile and the CLI annotate modes. */
  private[graft] def plannedFor(prql: String, spark: SparkSession,
                                catalog: String => DataFrame): (Planner, DataFrame) = {
    val (query, spans) = parseLocated(prql)
    val planner = new Planner(spark, catalog, query, spans)
    val df =
      try planner.planMain()
      catch {
        case e: PlanError =>
          e.span match {
            case Some(sp) =>
              throw new PlanError(ErrorRender.annotate(prql, e.getMessage, sp), e.span)
            case None => throw e
          }
      }
    (planner, df)
  }

  /** Compile and also return compile-time scale diagnostics: warnings about
    * plans that execute correctly but concentrate work on one partition at
    * cluster scale (global-sort windows, deep positional offsets). */
  def compileWithDiagnostics(prql: String, spark: SparkSession,
                             catalog: String => DataFrame): (DataFrame, Seq[String]) = {
    val (planner, df) = plannedFor(prql, spark, catalog)
    (df, planner.diagnostics.toSeq)
  }

  /** Parse + lower to an UNRESOLVED Catalyst plan (no analyzer run) — the
    * latency probe's split point between the pure-Scala compiler fold and
    * Spark's analysis ([[Bench.measureCompileLatency]], VERDICT r9 #6). */
  private[graft] def lowerUnresolved(
      prql: String, spark: SparkSession, catalog: String => DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    val (query, spans) = parseLocated(prql)
    new Planner(spark, catalog, query, spans).planMainUnresolved()
  }

  /** Render PRQL to ONE runnable Spark SQL string — the reference's actual
    * artifact shape (translator.rs:32-49). A debug/parity surface: the
    * DataFrame path (compile) is the primary backend; SqlBackendSpec proves
    * `spark.sql(toSparkSql(q))` row-equals it across the corpus. */
  def toSparkSql(prql: String): String =
    new graft.plan.SqlGen(parse(prql)).render()

  /** Compile with `from name` resolving to `$dir/name.parquet`
    * (the TESTDATA.md convention), falling back to temp views. */
  def compileDir(prql: String, spark: SparkSession, dir: String): DataFrame =
    compile(prql, spark, parquetCatalog(spark, dir))

  /** Compile with `from name` resolving against the session catalog
    * (temp views / tables). */
  def compileSession(prql: String, spark: SparkSession): DataFrame =
    compile(prql, spark, name => spark.table(name))

  /** `from name` resolution order: `$dir/name.parquet`, then `.orc`
    * (typed schema like parquet — ORC ships in Spark's core jars), then
    * `.csv` (header + schema inference), then `.json` (JSON-lines), then
    * the session catalog (temp views/tables). The reference has no source
    * formats at all (it emits SQL text — SURVEY §2.9); the parquet-first
    * convention is the driver's, the rest are the formats a Spark-native
    * engine reads without extra dependencies. */
  def parquetCatalog(spark: SparkSession, dir: String): String => DataFrame =
    name => {
      def p(ext: String) = s"$dir/$name.$ext"
      // PRQL-path default measured OFF (r15 A/B probe: the relational
      // corpus' per-row work is columnar-cheap, so one round-robin
      // exchange of the rows costs more than the 1-task scan it fixes;
      // q04/q05/q28/q33 all read worse under the spread). The conf can
      // still force it for payload-heavy user tables.
      if (new java.io.File(p("parquet")).exists)
        scanSpreadIf(normalizeEventTime(spark.read.parquet(p("parquet"))),
          p("parquet"), default = false)
      else if (new java.io.File(p("orc")).exists)
        // ORC ships in Spark's core jars (no extra dependency) and keeps
        // the full typed schema like parquet — same event-time treatment
        scanSpreadIf(normalizeEventTime(spark.read.orc(p("orc"))),
          p("orc"), default = false)
      else if (new java.io.File(p("csv")).exists)
        spark.read.option("header", "true").option("inferSchema", "true")
          .csv(p("csv"))
      else if (new java.io.File(p("json")).exists)
        spark.read.json(p("json"))
      else spark.table(name)
    }

  /** Canonicalize the `events.ts` event-time column to a microsecond
    * TIMESTAMP (session-TZ = UTC), whichever physical schema the driver's
    * parquet carries:
    *   - TIMESTAMP(NANOS) → Spark reads it only as a nanos-since-epoch long
    *     (spark.sql.legacy.parquet.nanosAsLong); convert with integer `div`
    *     (ns values overflow a double mantissa). µs truncation matches
    *     DuckDB's TIMESTAMP_NS::TIMESTAMP cast.
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false) → Spark 4 infers
    *     TIMESTAMP_NTZ; cast to TIMESTAMP so `unix_micros`/window logic
    *     applies (lossless under the UTC session TZ both engines pin).
    * Downstream code can then assume `ts` is TimestampType everywhere. */
  private[graft] def normalizeEventTime(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    if (!df.columns.contains("ts")) df
    else df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }

  /** Scale-adaptive scan spread (optimization r15; guide §2.2/§2.4/§6.1).
    *
    * Parquet scans split only at row-group boundaries, and the driver's
    * testdata ships every table as ONE file with ONE row group — so every
    * scan stage is exactly 1 task, and all pre-Exchange work (tokenize /
    * shingle / hash HOFs, SRP plane products, filters, partial aggregation)
    * serializes on one core of local[N]. When the FILE LAYOUT proves the
    * scan cannot fill the machine (estimated scan tasks < cores), insert
    * one round-robin repartition to `defaultParallelism` directly above the
    * scan. Catalyst pushes filters and column pruning THROUGH `Repartition`
    * (`PushDownPredicates`/`ColumnPruning` both list it), so PushedFilters/
    * ReadSchema at the scan are unchanged and the exchange carries only the
    * pruned, filtered rows.
    *
    * Scale behavior: this is the IDENTITY whenever estimated scan tasks
    * (Σ ceil(file/maxPartitionBytes), min one task per file) reach the core
    * count — any table past ~cores×128 MB, i.e. every real deployment —
    * so a 100 TB scan never pays an extra shuffle; the trigger is the file
    * layout, not a constant tuned to local mode. Knobs:
    * `spark.graft.scanSpread` = auto (default) | off | <target partitions>;
    * `spark.graft.scanSpreadMinBytes` (default 32 KiB) exempts dictionary
    * tables (nation/region) where an exchange costs more than it buys.
    *
    * Results are unaffected: spread only changes row-to-partition
    * assignment. The corpus' own determinism rules (exact/decimal sums,
    * rounded AVG/STDDEV, total-order output sorts, tie-broken windows,
    * array-internal left folds — SparkEntry/PipelineOps headers) make every
    * declared query order-independent, and the driver gate re-proves it:
    * sf0.01/sf0.001 files are above the threshold, so the gates exercise
    * the spread path. */
  /** Conditional spread: the per-CALL default comes from this round's
    * per-operator measurements (each operator's entry names its choice);
    * the session conf `spark.graft.scanSpread` overrides globally —
    * `off` forces identity, any other value forces the spread at that
    * setting (the A/B probe flips one conf instead of recompiling). */
  private[graft] def scanSpreadIf(df: DataFrame, path: String,
                                  default: Boolean): DataFrame =
    df.sparkSession.conf.getOption("spark.graft.scanSpread") match {
      case Some("off")          => df
      case Some(_)              => scanSpread(df, path)
      case None if default      => scanSpread(df, path)
      case None                 => df
    }

  private[graft] def scanSpread(df: DataFrame, path: String): DataFrame = {
    val spark = df.sparkSession
    val mode = spark.conf.getOption("spark.graft.scanSpread").getOrElse("auto")
    if (mode == "off") return df
    val cores = spark.sparkContext.defaultParallelism
    if (mode != "auto")
      require(scala.util.Try(mode.toInt).toOption.exists(_ >= 1),
        s"spark.graft.scanSpread: auto | off | positive int, got $mode")
    val f = new java.io.File(path)
    val sizes: Array[Long] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty)
          .filter(x => x.isFile && !x.getName.startsWith("_") &&
            !x.getName.startsWith("."))
          .map(_.length())
      else Array(f.length())
    val total = sizes.sum
    val minBytes = spark.conf.getOption("spark.graft.scanSpreadMinBytes")
      .map(_.toLong).getOrElse(32768L)
    require(minBytes >= 0,
      s"spark.graft.scanSpreadMinBytes must be >= 0, got $minBytes")
    if (total < minBytes) return df
    // `auto` scales the target with DATA SIZE (compressed bytes /
    // taskBytes, capped at the core count): tiny relations keep few
    // partitions (a 32-task stage on kilobytes pays pure scheduling
    // overhead, multiplied by every round of an iterative op), big ones
    // fill the machine. An explicit integer pins the target.
    val taskBytes = spark.conf.getOption("spark.graft.scanSpreadTaskBytes")
      .map(_.toLong).getOrElse(65536L)
    require(taskBytes >= 1,
      s"spark.graft.scanSpreadTaskBytes must be >= 1, got $taskBytes")
    val target =
      if (mode == "auto")
        math.min(cores.toLong, math.max(1L, total / taskBytes)).toInt
      else mode.toInt
    if (target <= 1) return df
    val maxPB = spark.sessionState.conf.filesMaxPartitionBytes
    val estTasks = sizes.map(s => math.max(1L, (s + maxPB - 1) / maxPB)).sum
    if (estTasks >= target) df else df.repartition(target)
  }

  /** Shared local-mode session builder for the driver-contract mains (Bench,
    * Verify, Main, Dev) — one place for the configs the determinism contract
    * depends on (UTC session TZ, nanos-as-long parquet reads). */
  def localSession(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      // deployment-style kernel registration: every graft_* function that
      // doesn't need corpus-derived geometry is available in plain SQL on
      // any session (incl. newSession() isolation) with no register call
      .withExtensions(new functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // Single-pass analyzer where the ResolverGuard approves the plan
      // (tentative mode falls back to the fixed-point analyzer otherwise —
      // identical results either way, the whole test suite runs under this
      // conf). Cuts the one analysis run of a compile ~6.3 ms → ~1.1 ms on
      // the reference's compile-bench query. Validation stays ON: the
      // resolver is experimental in 4.1 and its internal assertions are the
      // only guard against a SILENT mis-resolution (a wrong-but-non-throwing
      // result bypasses Planner.toDf's exception fallback entirely).
      .config("spark.sql.analyzer.singlePassResolver.enabledTentatively", "true")
      .config("spark.sql.analyzer.singlePassResolver.validationEnabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
