package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Streaming exact deduplication — the unbounded counterpart of the p01
  * batch operator (VERDICT r6 #4). Keeps the FIRST arrival of each
  * canonical content hash (`md5(lower(trim(text)))` — p01's md5-family
  * key) and drops later copies.
  *
  * The state contract is the whole point: `dropDuplicatesWithinWatermark`
  * keeps one state entry per distinct hash seen inside the watermark
  * horizon and EVICTS entries once the watermark passes their event time
  * plus the delay — so state is O(distinct content within the horizon),
  * independent of stream length. Plain `dropDuplicates` on a stream would
  * keep every hash forever — the unbounded-state anti-pattern this module
  * exists to avoid. The trade is explicit and inherent to bounded state: a
  * duplicate arriving AFTER its original's state is evicted is re-emitted
  * (exact-once dedup within the horizon, at-least-once beyond it — the
  * right direction for a training-data feed, where a missed dup costs a
  * little redundancy, not correctness).
  *
  * On a static DataFrame the same function degrades to
  * `dropDuplicates(content_hash)` — an exact batch dedup keeping one
  * arbitrary representative per hash; StreamingDedupSpec uses p01 over the
  * same rows as the oracle for the KEPT KEY SET (hash set and count are
  * representative-independent) and drives a MemoryStream to prove the
  * in-horizon drop and the post-eviction re-admission.
  *
  * At 100 TB feed scale: one shuffle on the hash; per-partition state
  * bounded by the horizon's distinct-content count; watermark-driven
  * cleanup runs inside the state store, no driver action.
  */
object DedupStream {

  /** Canonical content hash used as the dedup key (identical to p01's). */
  def contentHash(textCol: String): org.apache.spark.sql.Column =
    F.md5(F.lower(F.trim(F.col(textCol))))

  /** Deduplicate `docs` by canonical text content. `docs` must carry
    * `textCol` and an event-time `tsCol` (timestamp). Streaming input:
    * first arrival per hash within the watermark horizon wins, state is
    * evicted past the horizon. Batch input: exact dedup, one
    * representative per hash. Output = input columns + `content_hash`. */
  def dedupByContent(docs: DataFrame, textCol: String, tsCol: String,
                     watermarkDelay: String): DataFrame = {
    def requireCol(c: String): Unit =
      require(docs.columns.contains(c),
        s"dedupByContent: input is missing column '$c' (has: ${docs.columns.mkString(", ")})")
    requireCol(textCol); requireCol(tsCol)
    require(!docs.columns.contains("content_hash"),
      "dedupByContent: input already has a 'content_hash' column; rename it")
    val hashed = docs.withColumn("content_hash", contentHash(textCol))
    if (docs.isStreaming)
      hashed.withWatermark(tsCol, watermarkDelay)
        .dropDuplicatesWithinWatermark("content_hash")
    else hashed.dropDuplicates("content_hash")
  }
}
