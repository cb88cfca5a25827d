package graft.functions

import org.apache.spark.sql.{Encoder, TypedColumn}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact top-k accumulator as a typed `Aggregator` (SURVEY §2.3 UDAF
  * tier): a bounded max-heap per partition, merged pairwise — top-k per
  * GROUP without sorting the group. Spark's own `orderBy().limit(k)`
  * (TakeOrderedAndProject) already covers global top-k; this aggregator
  * is for top-k-per-key at large key counts, where a per-key window sort
  * (`row_number <= k`) would sort every group fully:
  *
  * {{{
  * ds.groupByKey(_.label).agg(TopK.byScore(k).name("top"))
  * }}}
  *
  * Buffer is a Seq (encodable); the heap property is maintained by
  * keeping the worst element first for O(1) threshold checks at insert.
  * Ties break on id ascending — deterministic regardless of partition
  * merge order (SURVEY §2.4 rule 2).
  */
object TopK {

  /** (id, score) pair — score descending, id ascending on ties. */
  type Entry = (Long, Double)

  private def better(a: Entry, b: Entry): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  /** Insert keeping at most k entries; `buf` holds entries sorted
    * worst-first so the cutoff test is the head.
    */
  private[graft] def insert(buf: List[Entry], e: Entry, k: Int): List[Entry] =
    if (buf.sizeIs < k) (e :: buf).sortWith((x, y) => better(y, x))
    else if (better(e, buf.head)) (e :: buf.tail).sortWith((x, y) => better(y, x))
    else buf

  def topK(k: Int): Aggregator[Entry, List[Entry], Seq[Entry]] =
    new Aggregator[Entry, List[Entry], Seq[Entry]] {
      def zero: List[Entry] = Nil
      def reduce(b: List[Entry], a: Entry): List[Entry] = insert(b, a, k)
      def merge(b1: List[Entry], b2: List[Entry]): List[Entry] =
        b2.foldLeft(b1)((acc, e) => insert(acc, e, k))
      def finish(r: List[Entry]): Seq[Entry] =
        r.sortWith(better) // best-first output
      def bufferEncoder: Encoder[List[Entry]] = ExpressionEncoder()
      def outputEncoder: Encoder[Seq[Entry]] = ExpressionEncoder()
    }

  /** Column form for `Dataset[(Long, Double)].groupByKey(...).agg(...)`. */
  def byScore(k: Int): TypedColumn[Entry, Seq[Entry]] = topK(k).toColumn
}
