package graft.operators

import graft.Determinism._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-moment z-score gating, shared by the batch query
  * (`queries.Stats.anomalyZscore`) and the streaming gate
  * (`streaming.EventStreams.anomalyGate`) so the two can never diverge.
  *
  * The |x−μ| > 3σ test runs as the algebraically equivalent inequality
  * (n·x−S)²·(n−1) > 9·n·(n·Q−S²) over exact decimal moments S=Σx, Q=Σx²
  * surfaced as doubles: stddev_samp itself is not cross-engine stable
  * (accumulation-order drift), but identical-input IEEE arithmetic is.
  */
object AnomalyGate {

  /** Per-key moments (n, s, q) of `valueCol` — one partial-aggregated
    * pass, a tiny output (one row per key). Compute once; callers that
    * reuse it across jobs or micro-batches should `.cache()` it.
    */
  def moments(df: DataFrame, key: String, valueCol: String): DataFrame =
    df.groupBy(col(key))
      .agg(count(lit(1)).as("n"), dsum(col(valueCol)).as("s"),
        sum(dec2(col(valueCol)) * dec2(col(valueCol))).cast("double").as("q"))

  /** Rows of `rows` whose `valueCol` deviates from their key's mean by
    * more than 3 sample stddevs; moments broadcast, filter map-side,
    * moment columns dropped. Keys absent from `moments` drop (inner).
    * The positive-variance guard handles the σ=0 group: with all values
    * equal, double rounding can make n·Q−S² come out a hair negative
    * while the left side rounds to a hair positive, flagging EVERY row
    * of a constant group — but σ=0 means no row deviates, so such
    * groups must never flag.
    */
  def gate(rows: DataFrame, moments: DataFrame, key: String,
           valueCol: String): DataFrame = {
    val dev = col("n") * col(valueCol) - col("s")
    val variance = col("n") * col("q") - col("s") * col("s")
    rows.join(broadcast(moments), Seq(key))
      .where(variance > lit(0.0) &&
        dev * dev * (col("n") - lit(1)) > lit(9.0) * col("n") * variance)
      .drop("n", "s", "q")
  }
}
