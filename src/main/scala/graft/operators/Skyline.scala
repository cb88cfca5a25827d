package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto skyline (minimize x, maximize y) — the non-dominated
  * frontier, e.g. "cheapest part at every size level". Skyline is
  * algebraic: skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B)), which
  * gives the distributed plan its shape:
  *
  *   1. collapse to distinct (x, y) points (one map-side-combined
  *      aggregate — dominance only depends on the point, and distinct
  *      points make the sweep rule exact: after dedup, an earlier point
  *      in (x asc, y desc) order with the same y must have strictly
  *      smaller x, hence dominates);
  *   2. block-local sweep: points hash into `blocks` deterministic
  *      buckets; within each, sorted by (x asc, y desc), a point
  *      survives iff its y exceeds the running max y — per-block
  *      non-dominated sets, computed by one key-shuffled window;
  *   3. global sweep over the union of block survivors — at most
  *      blocks · |frontier| rows (each block keeps only points
  *      non-dominated within the block, a set the true frontier prunes
  *      to at most its own size per block), so the single-partition
  *      window here is bounded by the answer size, not the data size.
  */
object Skyline {

  /** `df` → skyline points (x, y, rep = min id among ties, cnt = rows
    * collapsed into the point). Duplicated (x, y) rows are one frontier
    * point (dominance is irreflexive: duplicates never dominate each
    * other).
    */
  def skyline2d(df: DataFrame, x: Column, y: Column, id: Column,
      blocks: Int = 32): DataFrame = {
    val pts = df.select(x.as("x"), y.as("y"), id.as("id"))
      .groupBy(col("x"), col("y"))
      .agg(min(col("id")).as("rep"), count(lit(1)).as("cnt"))
    def sweep(in: DataFrame, w: org.apache.spark.sql.expressions.WindowSpec): DataFrame =
      in.withColumn("_pm",
          max(col("y")).over(w.orderBy(col("x").asc, col("y").desc)
            .rowsBetween(Window.unboundedPreceding, -1)))
        .where(col("_pm").isNull || col("y") > col("_pm"))
        .drop("_pm")
    val local = sweep(
      pts.withColumn("_blk", pmod(hash(col("x"), col("y")), lit(blocks))),
      Window.partitionBy(col("_blk"))).drop("_blk")
    sweep(local, Window.partitionBy())
  }
}
