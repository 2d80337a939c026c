package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k typed aggregator (SURVEY.md §7.4's "one justified custom
  * piece"): keeps at most k (score, id) pairs per group in the buffer.
  *
  * Versus `Window.orderBy.row_number <= k`, which sorts every group's full
  * row set, the buffer here is O(k) per group through both partial and
  * merge phases — the difference between shuffling a group's millions of
  * rows and shuffling k of them. Ordering: score desc, id asc (ties), the
  * same contract as the window-ranked queries.
  */
case class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[Long]] {

  private val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  override def zero: List[(Double, Long)] = Nil

  private def trim(xs: List[(Double, Long)]): List[(Double, Long)] =
    xs.sorted(ord).take(k)

  override def reduce(buf: List[(Double, Long)], a: (Double, Long)): List[(Double, Long)] =
    trim(a :: buf)

  override def merge(b1: List[(Double, Long)], b2: List[(Double, Long)]): List[(Double, Long)] =
    trim(b1 ::: b2)

  override def finish(buf: List[(Double, Long)]): Seq[Long] =
    buf.sorted(ord).map(_._2)

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
