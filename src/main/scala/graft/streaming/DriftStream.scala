package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{DataFrame, functions => F}

/** Streaming distribution-drift monitor — the unbounded counterpart of
  * batch p81: per (event-time window, source), the two-sample
  * Kolmogorov-Smirnov statistic of the window's token-count distribution
  * against a REFERENCE grid (the accepted corpus's (token-count, count)
  * rollup — the monitoring artifact a pipeline owner pins and re-derives
  * on a cadence). Batch p81 answers "have two sources drifted apart?";
  * this answers "has THIS HOUR's feed drifted from what we accepted?" —
  * the alarm wire for a crawler change or truncation regression, live.
  *
  * Shape: the corpus never carries state — docs collapse map-side to a
  * token count, a watermarked APPEND-mode windowed aggregation builds the
  * per-(window, source, v) grid (the only stateful stage, bounded by the
  * horizon), and each finalized batch of grid rows runs p81's exact ECDF
  * arithmetic against the broadcast reference: integer cross-multiplied
  * differences (|cum_w·n_ref − cum_ref·n_w| over exact integers), max
  * first, ONE double division, 1e6 fixed-point — the p81 determinism
  * discipline verbatim. A window's groups all finalize at the same
  * watermark crossing, so each (window, source) scores exactly once.
  *
  * The reference grid is a bounded literal relation (distinct token
  * counts of the reference corpus — thousands of rows at most): it rides
  * each micro-batch as a local view and the tiny
  * (windows×sources)×|grid| expansion is the sanctioned
  * small-side-broadcast class, never corpus-sized.
  *
  * Anti-drift law (spec-pinned): on a static frame with one all-covering
  * window and the reference = another source's own grid, the score
  * equals batch p81's KS for that source pair exactly. */
object DriftStream {

  private val GridView = "graft_drift_grid"

  /** Driver-materialization bound on the reference grid (distinct token
    * counts — ≈ max doc length, not corpus size; 1M distinct values is
    * already a pathological corpus, not a monitoring grid). The
    * DecontamStream:65 house rule: a bounded-by-construction collect still
    * fails LOUDLY, never OOMs the driver. */
  val RefGridCap: Int = 1 << 20

  /** Global temp views are application-wide — a FIXED name lets two
    * concurrent drift monitors overwrite each other's reference between
    * micro-batches, silently scoring one stream against the other's
    * reference (r11 ADVICE). Each start()/scoresBatch() call registers its
    * own suffixed view. */
  private val viewSeq = new java.util.concurrent.atomic.AtomicLong(0L)
  private def freshRefView(): String = s"graft_drift_ref_${viewSeq.incrementAndGet()}"

  /** p81's ECDF arithmetic over a per-(wstart, source) stream grid vs the
    * reference grid — shared verbatim by the batch and streaming paths. */
  private def ksSql(grid: String, ref: String): String = s"""
    WITH gk AS (SELECT DISTINCT wstart, source FROM $grid),
    u AS (
      SELECT wstart, source, v, c AS cs, CAST(0 AS BIGINT) AS cr FROM $grid
      UNION ALL
      SELECT gk.wstart, gk.source, r.v, CAST(0 AS BIGINT), r.c
      FROM gk CROSS JOIN $ref r),
    uv AS (
      SELECT wstart, source, v, sum(cs) AS cs, sum(cr) AS cr
      FROM u GROUP BY wstart, source, v),
    cum AS (
      SELECT wstart, source,
        sum(cs) OVER (PARTITION BY wstart, source ORDER BY v) AS fs,
        sum(cr) OVER (PARTITION BY wstart, source ORDER BY v) AS fr,
        sum(cs) OVER (PARTITION BY wstart, source) AS ns,
        sum(cr) OVER (PARTITION BY wstart, source) AS nr
      FROM uv),
    agg AS (
      SELECT wstart, source,
        CAST(max(ns) AS BIGINT) AS n_win, CAST(max(nr) AS BIGINT) AS n_ref,
        CAST(max(abs(fs * nr - fr * ns)) AS BIGINT) AS dmax
      FROM cum GROUP BY wstart, source)
    SELECT wstart, source, n_win, n_ref,
      CAST(floor(1e6 * (CAST(dmax AS DOUBLE) / (n_win * n_ref)) + 0.5) AS BIGINT) AS ks_ppm
    FROM agg WHERE n_win > 0 AND n_ref > 0 ORDER BY wstart, source"""

  private def tokenCountExpr(textCol: String): String =
    s"""CAST(size(split(trim($textCol), '\\\\s+')) AS BIGINT)"""

  private def requireCols(docs: DataFrame, cols: Seq[String]): Unit =
    cols.foreach(c => require(docs.columns.contains(c),
      s"DriftStream: input is missing column '$c' (has: ${docs.columns.mkString(", ")})"))

  private def registerRef(spark: org.apache.spark.sql.SparkSession,
                          ref: Seq[(Long, Long)], global: Boolean,
                          view: String): String = {
    require(ref.nonEmpty, "DriftStream: the reference grid must be non-empty")
    require(ref.size <= RefGridCap,
      s"DriftStream: the reference grid has ${ref.size} rows, over the " +
        s"$RefGridCap plan-literal boundary - this is a token-count rollup " +
        "(bounded by max document length), not a corpus; re-derive it with " +
        "referenceGrid or coarsen the token counts before monitoring")
    import spark.implicits._
    val df = ref.toDF("v", "c")
    if (global) { df.createOrReplaceGlobalTempView(view); s"global_temp.$view" }
    else { df.createOrReplaceTempView(view); view }
  }

  /** Reference grid of a batch corpus: distinct (token-count, count).
    * Bounded by distinct token-count values — but a pathological corpus
    * (e.g. token counts used as ids) must fail loudly, not OOM the
    * driver: the collect is LIMIT-capped and the cap is a named require. */
  def referenceGrid(docs: DataFrame, textCol: String): Seq[(Long, Long)] = {
    requireCols(docs, Seq(textCol))
    val rows = docs.selectExpr(s"${tokenCountExpr(textCol)} AS v")
      // a null-payload document has no token count — it is not part of
      // the reference distribution (StreamingDegenerateSpec: the null row
      // otherwise surfaces as a ROW_VALUE_IS_NULL on the collect)
      .where("v IS NOT NULL")
      .groupBy("v").count()
      .limit(RefGridCap + 1)
      .collect()
    require(rows.length <= RefGridCap,
      s"DriftStream.referenceGrid: over $RefGridCap distinct token counts " +
        "(the plan-literal boundary) - the text column does not look like " +
        "documents; coarsen the counts (e.g. bucket to the nearest 10) or " +
        "use batch p81's source-pair table instead")
    rows.map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
  }

  /** Batch degradation: per (window, source) KS vs `ref` on a static
    * frame — the same grid construction and ECDF SQL as the stream. */
  def scoresBatch(docs: DataFrame, textCol: String, srcCol: String,
                  tsCol: String, windowDur: String,
                  ref: Seq[(Long, Long)]): DataFrame = {
    requireCols(docs, Seq(textCol, srcCol, tsCol))
    val spark = docs.sparkSession
    val refRel = registerRef(spark, ref, global = false, freshRefView())
    docs.selectExpr(s"window($tsCol, '$windowDur').start AS wstart",
        s"$srcCol AS source", s"${tokenCountExpr(textCol)} AS v")
      // clock-less or payload-less rows belong to no window / no grid
      // cell — dropped, mirroring the stream path's guard
      .where(s"wstart IS NOT NULL AND v IS NOT NULL")
      .groupBy("wstart", "source", "v").agg(F.count(F.lit(1)).as("c"))
      .createOrReplaceTempView(GridView)
    spark.sql(ksSql(GridView, refRel))
  }

  /** Streaming: watermarked append-mode windowed grid, then the shared KS
    * SQL per finalized batch; rows (wstart, source, n_win, n_ref, ks_ppm)
    * go to `sink` once per closed window. */
  def start(docs: DataFrame, textCol: String, srcCol: String, tsCol: String,
            windowDur: String, watermarkDelay: String, ref: Seq[(Long, Long)],
            sink: DataFrame => Unit): StreamingQuery = {
    require(docs.isStreaming, "DriftStream.start needs a streaming input; " +
      "use scoresBatch for static relations")
    requireCols(docs, Seq(textCol, srcCol, tsCol))
    // one suffixed global view per query — concurrent monitors cannot
    // overwrite each other's reference (r11 ADVICE)
    val refView = freshRefView()
    val grid = NullGuard(docs, "drift", Seq(tsCol))
      .withWatermark(tsCol, watermarkDelay)
      .selectExpr(tsCol, s"$srcCol AS source", s"${tokenCountExpr(textCol)} AS v")
      .where("v IS NOT NULL")
      .groupBy(F.window(F.col(tsCol), windowDur), F.col("source"), F.col("v"))
      .agg(F.count(F.lit(1)).as("c"))
      .select(F.col("window.start").as("wstart"), F.col("source"),
        F.col("v"), F.col("c"))
    grid.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sess = batch.sparkSession
        // the micro-batch runs in a cloned session (the StitchMergeStream
        // rule): the reference crosses via global_temp
        val refRel = registerRef(sess, ref, global = true, refView)
        // EAGERLY process every partition of the stateful batch before
        // handing control to the caller's sink: Spark 4 validates that a
        // foreachBatch consumed all state-store partitions, so a sink
        // that samples (show/limit) or ignores the frame would otherwise
        // kill the QUERY with a commit-validation error
        // (StreamingDegenerateSpec found this with a no-op sink)
        batch.persist()
        try {
          batch.count()
          batch.createOrReplaceTempView(GridView)
          sink(sess.sql(ksSql(GridView, refRel)))
        } finally batch.unpersist()
      }
      .start()
  }
}
