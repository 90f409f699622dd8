package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (candidate id, score) entry of a bounded top-k buffer. */
final case class ScoredId(id: Long, score: Double)

/** Bounded top-k typed aggregate — the per-partition bounded priority
  * queue (SURVEY §7.5): keeps the k highest-scoring entries (id ASC on
  * score ties, the ranking convention every gate in this repo uses)
  * through partial aggregation.
  *
  * WHY an Aggregator and not a window: `row_number().over(partitionBy
  * (query))` must SHUFFLE every scored (query, candidate) pair — at a
  * 100 TB corpus that is n·q rows on the wire per search. A typed
  * Aggregator partial-aggregates map-side, so each partition ships at
  * most k entries per query: the exchange carries q·k·partitions rows,
  * independent of corpus size. Spark plans it as ObjectHashAggregate
  * (partial → final merge), the same physical shape as collect_list but
  * with a bounded buffer.
  *
  * The buffer invariant (sorted best-first, length ≤ k) makes reduce
  * O(k) per row and merge O(k); k is small (10–100), so buffers stay
  * kilobytes. Determinism: (score DESC, id ASC) is a total order, so
  * partial/merge composition order cannot change the result.
  */
final class TopK(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  require(k > 0, s"k must be positive, got $k")

  private val ord: Ordering[ScoredId] =
    Ordering.by((s: ScoredId) => (-s.score, s.id))

  override def zero: Seq[ScoredId] = Vector.empty

  override def reduce(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] = {
    // Fast reject: buffer full and the newcomer is no better than the
    // current worst — the overwhelmingly common case on a big corpus.
    if (b.length >= k && ord.gteq(a, b.last)) b
    else ((b :+ a).sorted(ord)).take(k)
  }

  override def merge(b1: Seq[ScoredId], b2: Seq[ScoredId]): Seq[ScoredId] =
    ((b1 ++ b2).sorted(ord)).take(k)

  override def finish(b: Seq[ScoredId]): Seq[ScoredId] = b

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}
