package graft.functions

import org.apache.spark.sql.{Encoder, TypedColumn}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a typed `Aggregator` — the
  * sketch-then-verify pattern for finding frequent items in one
  * bounded-memory pass at any scale (Misra & Gries 1982; merge rule from
  * Agarwal et al., "Mergeable Summaries", PODS 2012):
  *
  *  - each partition keeps at most k counters; an unmatched item beyond
  *    capacity decrements ALL counters (dropping zeros) instead of
  *    entering;
  *  - partials merge by summing counters then subtracting the (k+1)-th
  *    largest count from every counter (keeping positives) — the same
  *    bounded-memory guarantee survives arbitrary merge trees;
  *  - GUARANTEE: every item with true count > n/(k+1) is in the final
  *    counter set. Counts are approximate and merge-order-dependent —
  *    the candidate SET is what the sketch delivers, so callers verify
  *    candidates with one exact (tiny, k-key) counting pass and filter
  *    on the exact threshold. The verified output is deterministic even
  *    though the intermediate sketch is not.
  */
object HeavyHitters {

  type Counts = Map[String, Long]

  private[graft] def add(buf: Counts, item: String, k: Int): Counts =
    buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1)
      case None if buf.size < k => buf.updated(item, 1L)
      case None => buf.flatMap { case (i, c) =>
        if (c > 1) Some(i -> (c - 1)) else None
      }
    }

  private[graft] def mergeCounts(b1: Counts, b2: Counts, k: Int): Counts = {
    val sum = b2.foldLeft(b1) { case (acc, (i, c)) =>
      acc.updated(i, acc.getOrElse(i, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      val cut = sum.values.toSeq.sortBy(-_).apply(k) // (k+1)-th largest
      sum.flatMap { case (i, c) => if (c > cut) Some(i -> (c - cut)) else None }
    }
  }

  /** (candidate items sorted for stable downstream plans, total item
    * count): the candidates are a superset of everything with frequency
    * > n/(k+1), and n rides along in the buffer so callers get the
    * threshold denominator from the SAME pass instead of re-scanning.
    */
  def sketch(k: Int): Aggregator[String, (Counts, Long), (Seq[String], Long)] =
    new Aggregator[String, (Counts, Long), (Seq[String], Long)] {
      def zero: (Counts, Long) = (Map.empty, 0L)
      def reduce(b: (Counts, Long), a: String): (Counts, Long) =
        (add(b._1, a, k), b._2 + 1)
      def merge(b1: (Counts, Long), b2: (Counts, Long)): (Counts, Long) =
        (mergeCounts(b1._1, b2._1, k), b1._2 + b2._2)
      def finish(r: (Counts, Long)): (Seq[String], Long) =
        (r._1.keys.toSeq.sorted, r._2)
      def bufferEncoder: Encoder[(Counts, Long)] = ExpressionEncoder()
      def outputEncoder: Encoder[(Seq[String], Long)] = ExpressionEncoder()
    }

  def candidates(k: Int): TypedColumn[String, (Seq[String], Long)] =
    sketch(k).toColumn
}
