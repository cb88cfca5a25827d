package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the payload of the latest right
  * row with the same key and rightTime <= leftTime (inclusive).
  *
  * Implementation is the scalable merge-carry-forward, not the naive
  * equi-join + range filter: both sides union into one keyed stream,
  * sorted within each key partition by (time, side), and the right
  * payload is carried forward with `last(_, ignoreNulls)` over an
  * unbounded-preceding frame. Cost is one shuffle + sort of |L|+|R| —
  * the naive form degenerates to |L|·|R| per key before its filter,
  * which is exactly the shuffle that kills a 100 TB range join.
  *
  * Ties: a right row at exactly leftTime wins (side orders right-before-
  * left), matching inclusive as-of semantics (DuckDB `ASOF JOIN ... ON
  * l.t >= r.t` — the oracle for q_asof_join). Callers must pre-dedupe
  * the right side to one row per (key, time) for a deterministic winner.
  */
object AsOfJoin {

  def asOf(left: DataFrame, leftKey: String, leftTime: String,
           right: DataFrame, rightKey: String, rightTime: String,
           payload: Seq[String]): DataFrame =
    asOfImpl(left, leftKey, leftTime, right, rightKey, rightTime, payload,
      forward = false)

  /** Forward as-of: attach the payload of the EARLIEST right row with the
    * same key and rightTime >= leftTime (inclusive) — the "next
    * scheduled event" lookup. Same one-shuffle merge-carry as backward,
    * mirrored: the right side sorts AFTER left at equal times (so a tie
    * is in the frame) and the payload is pulled back with
    * `first(_, ignoreNulls)` over a current-row..unbounded-FOLLOWING
    * frame.
    */
  def asOfForward(left: DataFrame, leftKey: String, leftTime: String,
                  right: DataFrame, rightKey: String, rightTime: String,
                  payload: Seq[String]): DataFrame =
    asOfImpl(left, leftKey, leftTime, right, rightKey, rightTime, payload,
      forward = true)

  private def asOfImpl(left: DataFrame, leftKey: String, leftTime: String,
                       right: DataFrame, rightKey: String, rightTime: String,
                       payload: Seq[String], forward: Boolean): DataFrame = {
    val reserved = Set("_k", "_t", "_side", "_p") ++ payload
    val collisions = left.columns.toSet & reserved
    require(collisions.isEmpty,
      s"asOf: left columns collide with payload/internal names: $collisions")
    // All payload fields travel in ONE struct carried by a single
    // last/first(ignoreNulls) — so every field of a stitched result comes
    // from the SAME matched right row. (Per-column carries would mix
    // fields from different right rows whenever a payload cell is
    // genuinely NULL, and would resurrect stale values in its place.) The
    // struct itself is non-null for every right row even when all its
    // fields are null, so ignoreNulls skips exactly the left-side filler
    // rows. Tie handling is the side ordering: backward puts right BEFORE
    // left at equal _t (right lands in the preceding frame), forward puts
    // it AFTER (right lands in the following frame) — inclusive both ways.
    val rightSide = if (forward) 2 else 0
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c).copy(nullable = true)))
    val leftAug = left.withColumn("_k", col(leftKey))
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_p", lit(null).cast(payloadType))
    val rightSel = right.select(col(rightKey).as("_k"), col(rightTime).as("_t"),
      lit(rightSide).as("_side"), struct(payload.map(col): _*).as("_p"))
    val unioned = leftAug.unionByName(rightSel, allowMissingColumns = true)
    val base = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_side").asc)
    val carried =
      if (forward) unioned.withColumn("_p", first(col("_p"), ignoreNulls = true)
        .over(base.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      else unioned.withColumn("_p", last(col("_p"), ignoreNulls = true)
        .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    carried.where(col("_side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        payload.map(c => col("_p").getField(c).as(c)): _*)
  }
}
