package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Streaming content-defined-chunk novelty — the unbounded counterpart of
  * the p73 batch operator. Each arriving document is chunked MAP-SIDE by
  * p73's boundary rule (a chunk ends after any word whose 60-bit md5 ≡ 0
  * mod [[graft.pipeline.PipelineOps.CdcDivisor]] — boundaries depend only
  * on local content, so a re-crawled page with an inserted paragraph still
  * produces the same chunks after the edit point), and the stream keeps
  * the FIRST arrival of each chunk signature within the watermark horizon:
  * the novel-content feed an incremental-ingest pipeline trains on, with
  * recurring boilerplate runs suppressed at CHUNK granularity (p63 needs
  * author paragraph breaks; this does not).
  *
  * State contract (the DedupStream rule): `dropDuplicatesWithinWatermark`
  * holds one entry per distinct chunk signature inside the horizon and
  * evicts past it — state is O(distinct chunks within the horizon),
  * independent of stream length. A chunk recurring after eviction is
  * re-admitted (exact-once within the horizon, at-least-once beyond — a
  * little redundancy, never lost content). On a static DataFrame the same
  * function degrades to `dropDuplicates(chunk_sig)`.
  *
  * At 100 TB feed scale: the chunking fold is one sequential pass per
  * document inside the ingest projection (no shuffle, no explode until
  * the chunk rows — ~n/D of the word count); the dedup is one shuffle on
  * the signature with watermark-driven state cleanup in the state store.
  */
object CdcChunkStream {

  private def divisor: Int = graft.pipeline.PipelineOps.CdcDivisor

  /** Array of CDC chunks of `textCol` — ONE sequential fold per document
    * (no explode, no window), chunk-identical to p73's posexplode+window
    * formulation under the SAME hash family: same tokenization, same
    * 60-bit boundary rule (md5 prefix or xxhash64 — ADVICE r9: the
    * boundary must follow `spark.graft.hashFamily`, or a production
    * xxhash64 deployment gets streamed chunks that silently diverge from
    * batch p73's), same space-joined chunk text. The batch operator keeps
    * the window form because its corpus-wide rollup wants the positional
    * rows anyway; the stream wants the fold because ingest has no
    * business shuffling. */
  /** Family-resolving overload (ADVICE r10): a hardcoded `md5` default let
    * any direct caller under an xxhash64 deployment silently reproduce the
    * exact batch-vs-stream divergence the hf threading fixed — so the
    * no-arg form resolves `spark.graft.hashFamily` from the ACTIVE session
    * (loud if none), and the explicit-arg form remains for callers that
    * already hold the resolved family. */
  def chunks(textCol: String): Column =
    chunks(textCol, graft.pipeline.PipelineOps.hashFamily(
      org.apache.spark.sql.SparkSession.active))

  def chunks(textCol: String, hf: String): Column = {
    // p73's hKeySpark rule per family; xxhash64 can go negative, but
    // (-k) % D = 0 ⟺ k % D = 0, so the boundary set matches batch
    val bkey =
      if (hf == "xxhash64") "xxhash64(w)"
      else s"CAST(conv(substr(md5(w), 1, 15), 16, 10) AS BIGINT)"
    F.expr(
      s"""aggregate(
      filter(split(trim($textCol), '\\\\s+'), w -> w != ''),
      named_struct('done', CAST(array() AS ARRAY<STRING>), 'cur', CAST(array() AS ARRAY<STRING>)),
      (acc, w) -> IF($bkey % $divisor = 0,
        named_struct('done', array_append(acc.done, array_join(array_append(acc.cur, w), ' ')),
                     'cur', CAST(array() AS ARRAY<STRING>)),
        named_struct('done', acc.done, 'cur', array_append(acc.cur, w))),
      acc -> CASE WHEN size(acc.cur) = 0 THEN acc.done
                  ELSE array_append(acc.done, array_join(acc.cur, ' ')) END)""")
  }

  /** Emit the first arrival of every distinct chunk. `docs` must carry
    * `textCol` and an event-time `tsCol`. Output = input columns minus the
    * text, plus `chunk` and `chunk_sig` (one row per novel chunk).
    * Streaming input: first arrival per signature within the watermark
    * horizon wins, state evicts past it. Batch input: one representative
    * per distinct chunk. */
  def novelChunks(docs: DataFrame, textCol: String, tsCol: String,
                  watermarkDelay: String): DataFrame = {
    def requireCol(c: String): Unit =
      require(docs.columns.contains(c),
        s"novelChunks: input is missing column '$c' (has: ${docs.columns.mkString(", ")})")
    requireCol(textCol); requireCol(tsCol)
    require(!docs.columns.contains("chunk") && !docs.columns.contains("chunk_sig"),
      "novelChunks: input already has a 'chunk'/'chunk_sig' column; rename it")
    // the session's hash family drives BOTH the boundary rule and the
    // signature (the LshPairsStream rule: streamed chunks must agree with
    // batch p73 under whichever family the deployment runs)
    val hf = graft.pipeline.PipelineOps.hashFamily(docs.sparkSession)
    val sig =
      if (hf == "xxhash64") F.expr("CAST(xxhash64(chunk) AS STRING)")
      else F.md5(F.col("chunk"))
    val chunked = docs
      .withColumn("chunk", F.explode(chunks(textCol, hf)))
      .withColumn("chunk_sig", sig)
      .drop(textCol)
    if (docs.isStreaming)
      chunked.withWatermark(tsCol, watermarkDelay)
        .dropDuplicatesWithinWatermark("chunk_sig")
    else chunked.dropDuplicates("chunk_sig")
  }
}
