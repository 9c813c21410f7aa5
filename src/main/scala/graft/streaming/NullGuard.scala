package graft.streaming

import org.apache.spark.sql.{DataFrame, functions => F}

/** Route rows with NULL in required fields OUT before a typed boundary —
  * primitive-encoder case classes and flatMapGroupsWithState event-time
  * reads (`ts.getTime` on a null timestamp): one poison-pill row — a
  * crawler timeout leaving the event time null — must degrade to a
  * COUNTED drop, never kill the whole stream. StreamingDegenerateSpec
  * found five operators crashing this way (AsofJoin, LshPairs,
  * ParagraphDedup, SrpPairs on null event time; TokenBudget on a null
  * token count); this is the MediaOps codecs' dead-letter-count rule
  * applied to streams.
  *
  * The drop count is published per micro-batch as the observed metric
  * `graft_null_drops_<tag>` (columns `null_field_drops` / `rows` — the
  * ratio is what monitoring alerts on), visible in
  * StreamingQueryProgress.observedMetrics. A true dead-letter side output
  * is the caller's composition via the negated predicate over the same
  * input. Applied BEFORE the batch/stream branch in each operator, so
  * batch-degradation row-identity is preserved.
  *
  * BATCH parity (VERDICT r13 #8): the same function guards a static
  * ingest edge — `observe` lowers to a CollectMetrics node (no shuffle,
  * no extra pass; IngestGuardSpec pins the plan shape), and the counts
  * surface in `df.queryExecution.observedMetrics` after any action (or a
  * QueryExecutionListener at deployment). One contract, one metric name,
  * both execution modes — the funnel accounting (n_docs >= rows kept)
  * is auditable wherever the operator runs. The 81 frozen oracle ops do
  * NOT route through it retroactively: their per-op null rules (p31's
  * counted NULLs, the codecs' dead-letter counts) are documented
  * semantics the oracles pin; this is the shared guard DEPLOYMENT feeds
  * compose in front. */
private[graft] object NullGuard {
  def apply(df: DataFrame, tag: String, cols: Seq[String]): DataFrame = {
    val pred = cols.map(c => F.col(c).isNotNull).reduce(_ && _)
    df.observe(s"graft_null_drops_$tag",
        F.count(F.when(!pred, F.lit(1))).as("null_field_drops"),
        F.count(F.lit(1)).as("rows"))
      .where(pred)
  }
}
