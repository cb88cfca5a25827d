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
           payload: Seq[String]): DataFrame = {
    val reserved = Set("_k", "_t", "_side", "_p") ++ payload
    val collisions = left.columns.toSet & reserved
    require(collisions.isEmpty,
      s"asOf: left columns collide with payload/internal names: $collisions")
    // All payload fields travel in ONE struct carried by a single
    // last(ignoreNulls) — so every field of a stitched result comes from
    // the SAME matched right row. (Per-column carries would mix fields
    // from different right rows whenever a payload cell is genuinely
    // NULL, and would resurrect stale values in its place.) The struct
    // itself is non-null for every right row even when all its fields are
    // null, so ignoreNulls skips exactly the left-side filler rows.
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c).copy(nullable = true)))
    val leftAug = left.withColumn("_k", col(leftKey))
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_p", lit(null).cast(payloadType))
    val rightSel = right.select(col(rightKey).as("_k"), col(rightTime).as("_t"),
      lit(0).as("_side"), struct(payload.map(col): _*).as("_p"))
    val unioned = leftAug.unionByName(rightSel, allowMissingColumns = true)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("_p", last(col("_p"), ignoreNulls = true).over(w))
    carried.where(col("_side") === 1)
      .select(left.columns.map(col) ++
        payload.map(c => col("_p").getField(c).as(c)): _*)
  }
}
