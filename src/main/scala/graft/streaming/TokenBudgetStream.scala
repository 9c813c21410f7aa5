package graft.streaming

import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.{functions => F}

/** Streaming per-group TOKEN-budget admission — the unbounded counterpart
  * of the p44 batch operator, and [[QuotaSampleStream]]'s big sibling:
  * the cap is a token budget (what a training run buys), not a document
  * count. Each group admits documents while its running token sum stays
  * within the budget, under p44's exact `cum <= budget` STRICT-PREFIX
  * rule: the running sum accumulates over every document seen (admitted
  * or not), so the first overflow closes the group — no first-fit
  * back-filling with later smaller documents, which would make the
  * assembled set order-sensitive in a way the batch operator is not.
  *
  * State is ONE running token count per group, bounded by the group
  * domain like the quota sampler's counter (same closed-domain caveat:
  * an open key domain needs a state timeout, which changes semantics and
  * is deliberately not this operator).
  *
  * On a static DataFrame the same call degrades to p44's greedy prefix in
  * doc_id order (state starts empty, one invocation per group) — the spec
  * cross-checks it against the operator's own running-sum window rule.
  * Admission order within a micro-batch is doc_id (the deterministic
  * tiebreak for simultaneous arrivals); across batches it is arrival
  * order, which IS the streaming semantics — a feed cannot reorder the
  * past, so the budget binds on what arrived first.
  *
  * At feed scale: one shuffle on the group key per micro-batch; the
  * admitted stream carries tok_cum so downstream can observe budget
  * consumption without re-aggregating.
  */
object TokenBudgetStream {

  final case class In(group: String, doc_id: Long, n_tok: Long)
  /** tok_cum = the group's running token sum INCLUDING this document. */
  final case class Admitted(group: String, doc_id: Long, n_tok: Long, tok_cum: Long)

  def admitByTokenBudget(docs: DataFrame, groupCol: String, idCol: String,
                         tokCol: String, budget: Long): Dataset[Admitted] = {
    def requireCol(c: String): Unit =
      require(docs.columns.contains(c),
        s"admitByTokenBudget: input is missing column '$c' (has: ${docs.columns.mkString(", ")})")
    requireCol(groupCol); requireCol(idCol); requireCol(tokCol)
    require(budget >= 1, s"admitByTokenBudget: budget must be >= 1, got $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    // a row with no id or token count cannot be budgeted (n_tok is a
    // primitive at the encoder boundary): routed out and COUNTED
    // (NullGuard); a null group is a VALID group key and stays
    val typed = NullGuard(docs, "token_budget", Seq(idCol, tokCol)).select(
      F.col(groupCol).cast("string").as("group"),
      F.col(idCol).cast("long").as("doc_id"),
      F.col(tokCol).cast("long").as("n_tok")).as[In]
    typed.groupByKey(_.group)
      .flatMapGroupsWithState[Long, Admitted](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (g, it, state) =>
        var cum = state.getOption.getOrElse(0L)
        val out = Seq.newBuilder[Admitted]
        it.toSeq.sortBy(_.doc_id).foreach { d =>
          cum += d.n_tok // accumulates over drops too: p44's strict prefix
          if (cum <= budget) out += Admitted(g, d.doc_id, d.n_tok, cum)
        }
        state.update(cum)
        out.result().iterator
      }
  }
}
