package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries frequent-items summary as a mergeable Spark `Aggregator`
  * — the bounded-state candidate pass of the heavy-hitters pattern
  * (d55): a SINGLE scan with at most `capacity` counters per partial
  * aggregate finds every token that could exceed the frequency
  * threshold; a cheap exact recount of just those candidates then makes
  * the result exact and deterministic, so the sketch's internal
  * nondeterminism (partition order, merge order) never reaches the
  * output.
  *
  * Guarantee (Misra & Gries '82; merges preserve the bound, Agarwal et
  * al., "Mergeable Summaries", PODS'12): after any reduce/merge tree
  * over N items, every item with true count > N/(capacity+1) has a
  * surviving counter, and each counter undercounts by at most
  * N/(capacity+1). HeavyHittersSpec checks both properties on
  * adversarial splits.
  *
  * Reference behavior analog: the per-shard aggregation the reference's
  * consumers do before publishing (KinesisGraphStage.scala:19 batches),
  * re-expressed as a Spark partial aggregate with constant state.
  */
object HeavyHitters {

  /** One Misra-Gries counter update — shared by the batch Aggregator
    * and the streaming gate (s21) so the two paths cannot drift. */
  def add(b: Map[String, Long], t: String, capacity: Int): Map[String, Long] =
    b.get(t) match {
      case Some(v) => b.updated(t, v + 1L)
      case None if b.size < capacity => b.updated(t, 1L)
      // full and unseen: decrement all counters, drop the zeros
      // (the arriving item's own +1 and one −1 cancel)
      case None => b.flatMap { case (k, v) =>
        if (v > 1L) Some(k -> (v - 1L)) else None
      }
    }

  final class MisraGries(capacity: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(capacity > 0)

    def zero: Map[String, Long] = Map.empty

    def reduce(b: Map[String, Long], t: String): Map[String, Long] =
      add(b, t, capacity)

    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val summed = b.foldLeft(a) { case (m, (k, v)) =>
        m.updated(k, m.getOrElse(k, 0L) + v)
      }
      if (summed.size <= capacity) summed
      else {
        // subtract the (capacity+1)-th largest counter from every
        // counter and drop the non-positives: ≤ capacity survive, and
        // the subtraction is bounded by the merged streams' combined
        // error allowance (Mergeable Summaries, Fig. 1)
        val cut = summed.values.toIndexedSeq.sorted(Ordering[Long].reverse)(capacity)
        summed.flatMap { case (k, v) =>
          if (v > cut) Some(k -> (v - cut)) else None
        }
      }
    }

    def finish(r: Map[String, Long]): Map[String, Long] = r
    def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  }

  /** Column aggregate: `df.agg(HeavyHitters.sketch(col, 15))` →
    * map<string,long> of ≤ 15 surviving counters. */
  def sketch(col: Column, capacity: Int): Column =
    udaf(new MisraGries(capacity)).apply(col)
}
