package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** One posting: document id + in-document count. */
case class Posting(doc: Long, cnt: Long)

/** Typed bounded top-k posting accumulator (SURVEY §7 Phase 3): the
  * aggregation BUFFER never holds more than k postings, ranked by
  * (cnt desc, doc asc) — the skew-proof alternative to
  * `collect_list` + `slice`, whose buffer grows with the full group.
  * A stop-word-scale term at 100 TB aggregates in O(k) memory per
  * partial, and partials merge in O(k).
  *
  * Replaces the reference reducer's unbounded ArrayList accumulation
  * (/root/reference/src/InvertedIndexer.java:167-168,197-200).
  *
  * Register with `functions.udaf(new BoundedTopK(k), Encoders.product)`
  * and feed `struct(doc, cnt)`.
  */
class BoundedTopK(k: Int)
    extends Aggregator[Posting, Seq[Posting], Seq[Posting]] {
  require(k > 0, "k must be positive")

  private def rank(p: Posting): (Long, Long) = (-p.cnt, p.doc)
  private val ord: Ordering[Posting] = Ordering.by(rank)

  override def zero: Seq[Posting] = Vector.empty

  override def reduce(buf: Seq[Posting], p: Posting): Seq[Posting] = {
    // buf is kept sorted; skip fast when p can't enter a full buffer
    if (buf.size >= k && ord.gteq(p, buf.last)) buf
    else {
      val i = buf.indexWhere(q => ord.gt(q, p)) match {
        case -1 => buf.size
        case n  => n
      }
      val ins = (buf.take(i) :+ p) ++ buf.drop(i)
      if (ins.size > k) ins.take(k) else ins
    }
  }

  override def merge(a: Seq[Posting], b: Seq[Posting]): Seq[Posting] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[Posting]): Seq[Posting] = buf

  override def bufferEncoder: Encoder[Seq[Posting]] =
    ExpressionEncoder[Seq[Posting]]()
  override def outputEncoder: Encoder[Seq[Posting]] =
    ExpressionEncoder[Seq[Posting]]()
}

object BoundedTopK {
  /** Input encoder for `functions.udaf` registration. */
  val inputEncoder: Encoder[Posting] = Encoders.product[Posting]
}
