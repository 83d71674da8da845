package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable Misra–Gries heavy-hitters summary as a typed Spark
  * `Aggregator` — the UDAF rung of the extension ladder (SURVEY §2.11):
  * a bounded-memory candidate set for "which items exceed n/k of the
  * stream" that never shuffles the full key domain.
  *
  * Why this exists when groupBy+count is one line: at 100 TB the token
  * domain can be billions of keys, and an exact global groupBy shuffles
  * ALL of them to find the handful of frequent ones. The MG summary is
  * a CONSTANT-SIZE (≤ k entries) per-partition partial that Spark's
  * partial-aggregation machinery merges like any other partial state —
  * the shuffle carries at most k counters per partition regardless of
  * the key domain. The classical guarantees (Misra & Gries 1982;
  * mergeability per Agarwal et al., "Mergeable Summaries", PODS 2012):
  *
  *  - estimated count undercounts by at most n/(k+1);
  *  - therefore EVERY item with true frequency > n/(k+1) is present in
  *    the final candidate map (the superset guarantee);
  *  - the summary is mergeable: merging per-partition summaries (sum
  *    counts, then decrement by the (k+1)-th largest to re-bound the
  *    size) preserves the error bound — merge ORDER changes the
  *    estimates but never evicts a qualifying item.
  *
  * The candidate set is therefore merge-order-dependent (NOT
  * hash-stable) — so the engine's oracle-checked query
  * (q_llm_heavy_hitters) uses the sketch only as a PRUNER and recounts
  * the ≤ k candidates exactly; the final output (items with
  * freq·k > n, exact counts) is deterministic and engine-independent.
  * The per-row buffer update uses an immutable Map — allocation per
  * row is acceptable for the partial-agg path (each partition folds
  * locally before any shuffle); a hot 100 TB deployment would swap in
  * a TypedImperativeAggregate with a mutable open-addressing buffer,
  * same algebra.
  */
object HeavyHitters {

  /** MG summary with capacity k over a string column. */
  class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k > 0)

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], term: String): Map[String, Long] =
      // SQL aggregate null semantics: skip null inputs rather than
      // tracking a null map key (r9 advice)
      if (term == null) b
      else b.get(term) match {
        case Some(c) => b.updated(term, c + 1L)
        case None if b.size < k => b.updated(term, 1L)
        case None =>
          // full and unseen: decrement every counter (the MG step that
          // charges one occurrence of each tracked item and the new one)
          b.flatMap { case (t, c) => if (c > 1L) Some(t -> (c - 1L)) else None }
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val summed = b.foldLeft(a) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c)
      }
      if (summed.size <= k) summed
      else {
        // re-bound: subtract the (k+1)-th largest count from all
        // (Agarwal et al. §3.2) — evicts at least size-k entries while
        // keeping the aggregate undercount within the MG bound
        val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
        summed.flatMap { case (t, c) =>
          if (c > cut) Some(t -> (c - cut)) else None
        }
      }
    }

    override def finish(b: Map[String, Long]): Map[String, Long] = b

    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Column function: MG candidate map (term → estimated count). */
  def mgSketch(k: Int)(c: Column): Column = udaf(new MisraGries(k)).apply(c)
}
