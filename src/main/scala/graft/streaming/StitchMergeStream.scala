package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{DataFrame, Row}

/** Streaming boundary-stitch merge — batch p76 behind a `foreachBatch`
  * consumer of [[BoundaryOverlapStream]]'s pair output (VERDICT r10 #4:
  * p76 was the one r10 operator whose upstream had a stream but which
  * itself had none; the stitch pair is precisely what a crawl-ingest
  * pipeline wants repaired on arrival).
  *
  * Shape: the docs stream feeds BoundaryOverlapStream's per-gram-key
  * pairing state (same horizon, caps, and hash family); each micro-batch
  * of completed stitch pairs then joins back to `docStore` — the
  * batch-readable view of the ingested corpus (the sink this same
  * pipeline writes) — and [[graft.pipeline.PipelineOps.p76MergeOn]]
  * applies p76's EXACT tie gate and merge arithmetic within the batch.
  * The merged text never ships: output is (a_id, b_id, merged_sig,
  * merged_words), p76's checksum discipline.
  *
  * CROSS-BATCH TIE SEMANTICS (the documented divergence from batch p76,
  * the DedupStream trade): batch p76 picks each doc's global minimum
  * continuation / predecessor; a stream cannot wait for a better partner,
  * so FIRST-SEEN WINS WITHIN THE HORIZON — an endpoint claimed by an
  * earlier micro-batch is excluded from later gates (the claim filter
  * runs BEFORE the double-rank, so a claimed endpoint no longer blocks
  * new contenders), and claims EXPIRE once the claim horizon passes
  * (mirroring the pairing state's eviction: past the horizon the same
  * page re-presented may stitch again, exactly as BoundaryOverlapStream
  * re-admits). Within one micro-batch the gate is p76's simultaneous
  * double-rank — deterministic, not arrival-ordered.
  *
  * Driver-state contract: the claim table lives on the driver —
  * O(merges within the claim horizon) entries of (id → last ts), the
  * same bounded class as DecontamStream's capped eval-gram collect; the
  * per-batch `collect()` is the merge OUTPUT (o(batch pairs) after the
  * gate), which the driver must see anyway to update claims. A
  * production deployment at larger merge rates would move the claim into
  * a state-store stage; the semantics documented here are what that
  * stage must preserve. */
object StitchMergeStream {

  private val PairsView = "graft_sm_pairs"
  private val StoreView = "graft_sm_store"

  /** Batch degradation: exact p76 (plant-free) over a static (idCol,
    * textCol) relation — rendered through the SAME PipelineOps fragments
    * as the batch operator, so the two cannot drift. */
  def mergedBatch(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    val hf = graft.pipeline.PipelineOps.hashFamily(spark)
    docs.selectExpr(s"$idCol AS doc_id", s"$textCol AS text")
      .createOrReplaceTempView(StoreView)
    spark.sql(graft.pipeline.PipelineOps.p76SparkOn(StoreView, hf))
  }

  /** Start the streaming consumer. `docs` must be a streaming frame with
    * (idCol, textCol, event-time tsCol); `docStore` is re-read each batch
    * (it grows as the pipeline ingests). Each emitted micro-batch of
    * merges — columns (a_id, b_id, merged_sig, merged_words) — goes to
    * `sink`. `claimHorizonMs` bounds claim memory and defines re-admit;
    * align it with `watermarkDelay`. */
  def start(docs: DataFrame, textCol: String, idCol: String, tsCol: String,
            watermarkDelay: String, docStore: () => DataFrame,
            claimHorizonMs: Long, sink: DataFrame => Unit): StreamingQuery = {
    require(docs.isStreaming, "StitchMergeStream.start needs a streaming input; " +
      "use mergedBatch for static relations")
    require(claimHorizonMs > 0, s"claimHorizonMs must be positive, got $claimHorizonMs")
    val spark = docs.sparkSession
    val hf = graft.pipeline.PipelineOps.hashFamily(spark)
    // id -> completion ts of the claim; evicted past the claim horizon
    val claimedA = scala.collection.mutable.Map.empty[Long, Long]
    val claimedB = scala.collection.mutable.Map.empty[Long, Long]
    var maxTsMs = Long.MinValue
    val pairs = BoundaryOverlapStream
      .pairsWithTime(docs, textCol, idCol, tsCol, watermarkDelay)
      .select("a_id", "b_id", "ts_ms")
    pairs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sess = batch.sparkSession
        // advance the horizon clock and EXPIRE stale claims before the
        // claim filter runs — otherwise a claim would outlive the horizon
        // by one batch and block a legitimate re-admit (the pairing state
        // already evicted its side by then)
        val batchMax = batch.agg(org.apache.spark.sql.functions.max("ts_ms")).head()
        if (!batchMax.isNullAt(0) && batchMax.getLong(0) > maxTsMs)
          maxTsMs = batchMax.getLong(0)
        if (maxTsMs != Long.MinValue) {
          val cut = maxTsMs - claimHorizonMs
          claimedA.filterInPlace((_, ts) => ts >= cut)
          claimedB.filterInPlace((_, ts) => ts >= cut)
        }
        // claim filter BEFORE the gate (see the header contract)
        val aSet = claimedA.keySet.toSeq
        val bSet = claimedB.keySet.toSeq
        val open0 = if (aSet.isEmpty) batch
          else batch.filter(!batch("a_id").isInCollection(aSet))
        val open = if (bSet.isEmpty) open0
          else open0.filter(!open0("b_id").isInCollection(bSet))
        open.createOrReplaceTempView(PairsView)
        // the store frame comes from the DRIVER session; the micro-batch
        // runs in a cloned session with its own temp-view catalog, so the
        // store must cross via the global_temp database
        docStore().selectExpr(s"$idCol AS doc_id", s"$textCol AS text")
          .createOrReplaceGlobalTempView(StoreView)
        val winners = sess.sql(
          graft.pipeline.PipelineOps.p76MergeOn(PairsView, s"global_temp.$StoreView", hf))
          .collect() // the merge output — the driver needs it for claims
        winners.foreach { r =>
          val ts = r.getLong(4)
          claimedA(r.getLong(0)) = ts
          claimedB(r.getLong(1)) = ts
        }
        val out = sess.createDataFrame(
          sess.sparkContext.parallelize(winners.toSeq.map(r =>
            Row(r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))), 1),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("a_id", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("b_id", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("merged_sig", org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("merged_words", org.apache.spark.sql.types.LongType))))
        sink(out)
      }
      .start()
  }
}
