package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (score, id) candidate for a top-k selection. */
final case class ScoredId(score: Long, id: Long)

/** Typed `Aggregator` keeping the k largest (score desc, id asc) pairs per
  * group.
  *
  * The window formulation (`rank() over (partition by g order by score)
  * <= k`) must sort every group in full; this aggregator keeps an O(k)
  * buffer per group and merges partially on the map side — at 100 TB the
  * shuffle carries k rows per group instead of the whole group. The ordering
  * (score desc, then id asc) is total, so results are deterministic and equal
  * to the `row_number`-based formulation.
  */
class TopKAggregator(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  require(k > 0)

  private val ordering: Ordering[ScoredId] = Ordering.by(e => (-e.score, e.id))

  private def insert(buf: Seq[ScoredId], x: ScoredId): Seq[ScoredId] = {
    // buf stays sorted by (score desc, id); bounded at k elements
    if (buf.size >= k && ordering.gteq(x, buf.last)) buf
    else ((buf :+ x).sorted(ordering)).take(k)
  }

  override def zero: Seq[ScoredId] = Seq.empty
  override def reduce(buf: Seq[ScoredId], x: ScoredId): Seq[ScoredId] = insert(buf, x)
  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
    b.foldLeft(a)(insert)
  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r
  override def bufferEncoder: Encoder[Seq[ScoredId]] = TopKAggregator.seqEncoder
  override def outputEncoder: Encoder[Seq[ScoredId]] = TopKAggregator.seqEncoder
}

object TopKAggregator {
  val seqEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
  val scoredIdEncoder: Encoder[ScoredId] = Encoders.product[ScoredId]
}
