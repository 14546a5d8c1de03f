package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** One sketch entry: item + lower-bound counter. */
case class HHEntry(item: String, est: Long)

/** Misra–Gries heavy-hitters sketch as a typed Aggregator — a
  * MERGEABLE summary (Agarwal et al., "Mergeable Summaries", PODS'12):
  * each partition builds an O(k) sketch map-side and partials merge in
  * O(k), so finding frequent tokens over 100 TB never shuffles the
  * full (token, count) stream — only |partitions| × k entries move.
  *
  * Guarantees (for stream length n, sketch size k):
  *   - every item with true frequency > n/(k+1) is IN the sketch;
  *   - each reported estimate satisfies true − n/(k+1) ≤ est ≤ true.
  *
  * The precise sketch CONTENTS depend on encounter order, so the
  * operator is deliberately oracle-free (the driver's rows-only check
  * applies, like q23's HLL) — the error bound itself is pinned by
  * `HeavyHittersSpec` against exact counts.
  *
  * Classic decrement step, implemented on merge as the mergeable-
  * summaries reduction: combine counters, then subtract the (k+1)-th
  * largest counter from all and drop the non-positive.
  */
class HeavyHitters(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[HHEntry]] {
  require(k > 0, "k must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1)
      case None if buf.size < k => buf.updated(item, 1L)
      case None => // decrement all, drop zeros (the Misra–Gries step)
        buf.flatMap { case (i, c) => if (c > 1) Some(i -> (c - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (i, c)) =>
      m.updated(i, m.getOrElse(i, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest counter; ≤ k survivors remain
      val cut = sum.valuesIterator.toSeq.sorted(Ordering[Long].reverse)(k)
      sum.flatMap { case (i, c) => if (c > cut) Some(i -> (c - cut)) else None }
    }
  }

  override def finish(buf: Map[String, Long]): Seq[HHEntry] =
    buf.toSeq.sortBy { case (i, c) => (-c, i) }
      .map { case (i, c) => HHEntry(i, c) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[HHEntry]] =
    ExpressionEncoder[Seq[HHEntry]]()
}

/** Merge-only twin of [[HeavyHitters]]: aggregates already-built MG
  * sketch MAPS (e.g. the per-batch row-sets of a sketch ledger)
  * instead of raw items, using the same pairwise merge. Mergeable
  * summaries hold over ANY merge tree, so the executor-side partial/
  * final merge order never weakens the n/(k+1) bounds — this is what
  * lets a serve path run as a standard Spark aggregation instead of a
  * driver-side fold. */
class SketchMerge(k: Int)
    extends Aggregator[Map[String, Long], Map[String, Long], Map[String, Long]] {
  private val hh = new HeavyHitters(k)

  override def zero: Map[String, Long] = hh.zero
  override def reduce(buf: Map[String, Long],
                      sketch: Map[String, Long]): Map[String, Long] =
    hh.merge(buf, sketch)
  override def merge(a: Map[String, Long],
                     b: Map[String, Long]): Map[String, Long] =
    hh.merge(a, b)
  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
