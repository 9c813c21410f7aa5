package graft.streaming

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, functions => F}

/** Streaming SRP-LSH embedding near-dup pairs — the unbounded counterpart
  * of the p22 batch candidate stage: dedup-on-ingest for the EMBEDDING
  * modality, completing the pair with [[LshPairsStream]] (text).
  *
  * The interesting contrast with the text stream: embeddings are SMALL
  * (64 floats), so bucket state can hold the actual vectors and the
  * verify is EXACT cosine — the same `graft_dot`-order left-fold double
  * arithmetic as batch p08/p22, not an estimator. Candidates come from
  * the same deterministic SRP plane matrix (`graft_srp_keys`, registered
  * at an explicit (r, b) via PipelineOps.registerSrpAt): a streamed
  * vector lands in the band buckets its batch self would at that
  * geometry. Batch p08/p22 DERIVE geometry from the corpus count; a
  * stream has no count, so the caller pins (r, b) — match
  * `chooseSrpGeometry` of the expected corpus scale to stay aligned with
  * batch runs. Unlike p08's deterministic per-bucket candidate cap, the
  * stream's bucket load is bounded by the WATERMARK horizon instead —
  * the state contract: residents = (vec_id, ts, vector) rows inside the
  * horizon per bucket, evicted by event time on arrival and via
  * EventTimeTimeout when a bucket goes quiet.
  *
  * Emission: one row per (band bucket, unordered pair) with exact cosine
  * >= `minCos`, both residents co-horizon — multi-band pairs emit per
  * shared bucket (consumers dedupe on ids), identical to the batch band
  * self-join replica the static path runs and the spec compares against.
  */
object SrpPairsStream {

  final case class BandRow(bkey: Int, vec_id: Long, ts: java.sql.Timestamp,
                           emb: Seq[Float])
  final case class CandPair(bkey: Int, ida: Long, idb: Long, cos: Double)
  /** Horizon resident; public for the state encoder. */
  final case class Resident(vec_id: Long, tsMs: Long, emb: Seq[Float])
  final case class BucketState(docs: List[Resident])

  /** graft_dot's exact arithmetic: strict left fold, float operands
    * widened to double per term. Norms are the self-dot, as in batch. */
  private def dot(a: Seq[Float], b: Seq[Float]): Double = {
    var acc = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }
  /** Zero-norm vectors have no direction: cosine is 0/0 = NaN, which the
    * Scala compare (`NaN >= minCos` = false) drops but Spark SQL's NaN
    * ordering (NaN > everything) would KEEP — so both paths guard norms
    * explicitly to stay row-identical on degenerate input. */
  private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    val na = dot(a, a); val nb = dot(b, b)
    if (na <= 0.0 || nb <= 0.0) Double.NaN
    else dot(a, b) / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Candidate near-dup pairs over `vecs` (idCol, embCol array<float>,
    * event-time tsCol). Streaming: band-bucket state within
    * `watermarkDelay`; batch: the band self-join replica. */
  def pairs(vecs: DataFrame, embCol: String, idCol: String, tsCol: String,
            watermarkDelay: String = "1 hour", minCos: Double = 0.4,
            srpBits: Int = 4, bands: Int = 8): Dataset[CandPair] = {
    def requireCol(c: String): Unit =
      require(vecs.columns.contains(c),
        s"SrpPairsStream.pairs: input is missing column '$c' (has: ${vecs.columns.mkString(", ")})")
    requireCol(embCol); requireCol(idCol); requireCol(tsCol)
    require(minCos >= -1.0 && minCos <= 1.0,
      s"SrpPairsStream.pairs: minCos must be in [-1, 1], got $minCos")
    val spark = vecs.sparkSession
    import spark.implicits._
    graft.pipeline.PipelineOps.registerSrpAt(spark, srpBits, bands)
    // id-less / clock-less vectors cannot enter band state (ts.getTime in
    // the stateful fold): routed out and COUNTED (NullGuard) pre-branch
    val guarded = NullGuard(vecs, "srp_pairs", Seq(idCol, tsCol))
    val banded = guarded
      .withColumn("vec_id", F.col(idCol).cast("long"))
      .withColumn("ts", F.col(tsCol).cast("timestamp"))
      .withColumn("bkey", F.explode(F.expr(s"graft_srp_keys($embCol)")))
      .select($"bkey", $"vec_id", $"ts", F.col(embCol).as("emb"))
    if (vecs.isStreaming) {
      banded.withWatermark("ts", watermarkDelay)
        .as[BandRow]
        .groupByKey(_.bkey)
        .flatMapGroupsWithState[BucketState, CandPair](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
          (_, rows, state: GroupState[BucketState]) =>
            if (state.hasTimedOut) { state.remove(); Iterator.empty }
            else {
              val wm = state.getCurrentWatermarkMs()
              var residents = state.getOption.map(_.docs).getOrElse(Nil)
                .filter(_.tsMs >= wm)
              val out = Seq.newBuilder[CandPair]
              rows.toSeq.sortBy(r => (r.ts.getTime, r.vec_id)).foreach { r =>
                residents.foreach { s =>
                  if (s.vec_id != r.vec_id) {
                    val c = cosine(s.emb, r.emb)
                    if (!c.isNaN && c >= minCos)
                      out += CandPair(r.bkey, math.min(s.vec_id, r.vec_id),
                        math.max(s.vec_id, r.vec_id), c)
                  }
                }
                residents ::= Resident(r.vec_id, r.ts.getTime, r.emb)
              }
              state.update(BucketState(residents))
              // the watermark already lags max event time by the delay, so
              // the timeout is the newest resident itself (LshPairsStream's
              // double-count lesson)
              state.setTimeoutTimestamp(residents.map(_.tsMs).max + 1)
              out.result().iterator
            }
        }
    } else {
      banded.createOrReplaceTempView("graft_srp_stream_bands")
      spark.sql(s"""
        SELECT bkey, ida, idb, cos FROM (
          SELECT a.bkey AS bkey, a.vec_id AS ida, b.vec_id AS idb,
            graft_dot(a.emb, b.emb) /
              (sqrt(graft_dot(a.emb, a.emb)) * sqrt(graft_dot(b.emb, b.emb))) AS cos
          FROM graft_srp_stream_bands a JOIN graft_srp_stream_bands b
            ON a.bkey = b.bkey AND a.vec_id < b.vec_id
            AND graft_dot(a.emb, a.emb) > 0 AND graft_dot(b.emb, b.emb) > 0)
        WHERE cos >= $minCos AND NOT isnan(cos)""").as[CandPair]
    }
  }
}
