package graft.streaming

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.{functions => F}

/** Streaming curation — the COMPOSED ingest funnel (VERDICT r11 #6): exact
  * content dedup → p20's quality gate → per-language quota, as one
  * streaming query built from the existing pieces ([[DedupStream]],
  * [[QuotaSampleStream]]) rather than a third implementation of each.
  *
  * Batch p20 grades the funnel with corpus-global knowledge (LSH near-dup
  * clusters, per-mille hash sampling over known counts); a stream has
  * neither, so the honest streaming funnel is the ingest-shaped one: first
  * arrival per content hash wins within the watermark horizon, the SAME
  * quality expressions p20 applies ([[graft.pipeline.PipelineOps.QualityPredSql]],
  * shared constant — not a copy), and a per-language admission quota.
  *
  * Order matters and is part of the contract: dedup BEFORE the gate (a
  * re-crawled duplicate must not re-enter), gate BEFORE the quota (a
  * rejected document must never consume quota — the composition bug this
  * operator exists to prevent; StreamingCurationSpec proves it).
  *
  * Batch degradation: on a static frame the same call runs the funnel with
  * the DETERMINISTIC statement of first-arrival-wins — the lowest
  * (event-time, id) row per content hash is the representative (a window
  * over the hash key; stream-side `dropDuplicates` leaves the winner to
  * partition order, which is no law to pin a cross-check on). Under the
  * ordered-feed contract (arrivals in event-time order, the same contract
  * [[AsofJoinStream]] documents) the streamed funnel is ROW-IDENTICAL to
  * the batch call across any micro-batch boundaries — spec-proven over
  * shuffled batch splits.
  *
  * At feed scale: three shuffles (content hash, then nothing for the
  * stateless gate, then language), each keyed state bounded — dedup state
  * by the horizon's distinct-content count, quota state by one counter per
  * language. No collect, no unbounded buffers.
  */
object CurationStream {

  /** Admitted document: language, id, and the 1-based admission index
    * within the language's quota (stable across micro-batches). */
  type Kept = QuotaSampleStream.Kept

  def curate(docs: DataFrame, textCol: String, idCol: String, langCol: String,
             tsCol: String, watermarkDelay: String, quota: Long): Dataset[Kept] = {
    def requireCol(c: String): Unit =
      require(docs.columns.contains(c),
        s"curate: input is missing column '$c' (has: ${docs.columns.mkString(", ")})")
    requireCol(textCol); requireCol(idCol); requireCol(langCol); requireCol(tsCol)
    require(!docs.columns.contains("words"),
      "curate: input already has a 'words' column; rename it")
    // ADVICE r12: the batch branch adds content_hash via withColumn, which
    // silently OVERWRITES a pre-existing column of that name while the
    // streaming branch raises DedupStream's named require for the same
    // input — a batch/stream validation divergence in an operator whose
    // contract is batch-degradation row-identity. Reject it up front on
    // both branches.
    require(!docs.columns.contains("content_hash"),
      "curate: input already has a 'content_hash' column; rename it " +
        "(curate derives its own dedup hash from the text column)")
    // the quality gate derives these over `*` (QualityMetricsSql), so a
    // same-named input column becomes an AMBIGUOUS_REFERENCE deep in the
    // analyzer — reject it here with a named error instead
    // (StreamingDegenerateSpec found this with an n_tokens input column)
    for (c <- Seq("n_tokens", "stop_ratio", "distinct_ratio"))
      require(!docs.columns.contains(c),
        s"curate: input already has a '$c' column, which the quality gate " +
          "derives; rename it")

    val deduped =
      if (docs.isStreaming)
        DedupStream.dedupByContent(docs, textCol, tsCol, watermarkDelay)
      else {
        // deterministic batch reference for first-arrival-wins
        val hashed = docs.withColumn("content_hash", DedupStream.contentHash(textCol))
        hashed.withColumn("__rn", F.row_number().over(
            Window.partitionBy("content_hash").orderBy(F.col(tsCol), F.col(idCol))))
          .where(F.col("__rn") === 1).drop("__rn")
      }

    val gated = deduped
      .withColumn("words", F.expr(s"split(trim(`$textCol`), '\\\\s+')"))
      .where(F.expr("size(words) > 0"))
      .selectExpr("*" +: graft.pipeline.PipelineOps.QualityMetricsSql: _*)
      .where(F.expr(graft.pipeline.PipelineOps.QualityPredSql))

    QuotaSampleStream.quotaSample(gated, langCol, idCol, quota)
  }
}
