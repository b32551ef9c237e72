package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items summary with `s` counters, as a mergeable
  * typed `Aggregator`.
  *
  * Guarantee (Misra & Gries 1982; mergeability per Agarwal et al.,
  * "Mergeable Summaries", PODS'12): after summarizing N items with s
  * counters — in any partitioning, any merge order — every item with true
  * frequency > N/(s+1) still holds a counter. The surviving KEY SET is
  * order-dependent, but the superset guarantee is not, so an exact recount
  * of the candidates turns the sketch into a DETERMINISTIC exact
  * heavy-hitters algorithm: sketch pass (O(s) state per partition, merged
  * on the driver or map-side) -> candidate set (≤ s keys) -> one filtered
  * recount pass. At 100 TB this never shuffles the full key cardinality —
  * the only wide exchange carries rows matching ≤ s candidate keys.
  *
  * reduce: hit -> +1; room -> insert at 1; full -> decrement ALL by 1 and
  * drop zeros (the classic s-way cancellation). merge: sum counters, then
  * subtract the (s+1)-th largest count from all and drop non-positives —
  * the same cancellation applied in bulk, preserving the error bound
  * err ≤ (N_a + N_b)/(s+1).
  */
class MisraGriesAggregator(s: Int)
    extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(s > 0)

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], x: String): Map[String, Long] =
    m.get(x) match {
      case Some(c) => m.updated(x, c + 1L)
      case None if m.size < s => m.updated(x, 1L)
      case None =>
        m.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
    if (sum.size <= s) sum
    else {
      // (s+1)-th largest value is the bulk-cancellation amount
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(s)
      sum.view.mapValues(_ - cut).filter(_._2 > 0L).toMap
    }
  }

  override def finish(m: Map[String, Long]): Seq[String] = m.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] = MisraGriesAggregator.mapEncoder
  override def outputEncoder: Encoder[Seq[String]] = MisraGriesAggregator.seqEncoder
}

object MisraGriesAggregator {
  val mapEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  val seqEncoder: Encoder[Seq[String]] = ExpressionEncoder()
}
