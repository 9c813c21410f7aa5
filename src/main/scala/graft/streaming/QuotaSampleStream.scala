package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{functions => F}

/** Streaming per-group quota sampling — the unbounded counterpart of the
  * p24 mixture sampler. Batch p24 knows the whole corpus's group counts up
  * front and derives keep RATES; a stream cannot know final counts, so the
  * honest streaming semantics is a per-group QUOTA: each group keeps its
  * first `quota` documents (by doc_id order within each micro-batch) and
  * drops everything after — the per-source cap a streaming ingest applies
  * before the expensive downstream stages.
  *
  * State is ONE counter per group (`flatMapGroupsWithState` over the taken
  * count) — bounded by the group-domain size, not the stream length. The
  * group domain here (languages, sources) is small and closed, so no
  * timeout is configured; a deployment sampling an OPEN domain (URLs,
  * user ids) must add a state timeout or the counter map grows with the
  * domain — that variant changes semantics (quota per timeout window) and
  * is deliberately not this operator.
  *
  * On a static DataFrame the same function degrades to the deterministic
  * batch quota sample: each group's `quota` lowest doc_ids (state starts
  * empty, one invocation per group) — cross-checked in
  * StreamingQuotaSampleSpec against a window row_number oracle.
  *
  * At feed scale: one shuffle on the group key; per-batch per-group rows
  * pass through an iterator sorted once (the micro-batch is the unit of
  * arrival order — deterministic given batch boundaries, which the spec
  * pins with MemoryStream).
  */
object QuotaSampleStream {

  final case class In(group: String, doc_id: Long)
  /** taken_rank is the 1-based admission index within the group's quota —
    * stable across batches (state carries the running count). */
  final case class Kept(group: String, doc_id: Long, taken_rank: Long)

  def quotaSample(docs: DataFrame, groupCol: String, idCol: String,
                  quota: Long): Dataset[Kept] = {
    def requireCol(c: String): Unit =
      require(docs.columns.contains(c),
        s"quotaSample: input is missing column '$c' (has: ${docs.columns.mkString(", ")})")
    requireCol(groupCol); requireCol(idCol)
    require(quota >= 1, s"quotaSample: quota must be >= 1, got $quota")
    val spark = docs.sparkSession
    import spark.implicits._
    val typed = docs
      .select(F.col(groupCol).cast("string").as("group"), F.col(idCol).cast("long").as("doc_id"))
      .as[In]
    typed.groupByKey(_.group)
      .flatMapGroupsWithState[Long, Kept](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (g, it, state) =>
        val taken = state.getOption.getOrElse(0L)
        if (taken >= quota) { it.foreach(_ => ()); Iterator.empty }
        else {
          // doc_id order within the batch — the deterministic tiebreak for
          // simultaneous arrivals
          val keep = it.toSeq.sortBy(_.doc_id).take((quota - taken).toInt)
          state.update(taken + keep.length)
          keep.iterator.zipWithIndex.map { case (d, i) =>
            Kept(g, d.doc_id, taken + i + 1)
          }
        }
      }
  }
}
