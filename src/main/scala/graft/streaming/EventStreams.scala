package graft.streaming

import graft.Determinism._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming analytics over the `events` shape (SURVEY.md §7
  * M5). Every aggregation is written once against a plain DataFrame so
  * the SAME function serves batch (oracle-checked via q_hourly_window)
  * and streaming (`readStream`/MemoryStream) inputs — batch-parity is the
  * correctness argument for the streaming path, which has no DuckDB
  * oracle (SURVEY §7 risk e).
  *
  * Scale notes: watermarks bound state; tumbling/session windows key the
  * state store by (window, keys) — the shuffle is on the group key exactly
  * as in batch. `dropDuplicatesWithinWatermark` bounds the dedup state to
  * the watermark horizon.
  */
object EventStreams {

  /** Tumbling 1-hour window: count + decimal-exact value sum. Works on
    * both batch and streaming inputs (batch twin: Relational.hourlyWindow).
    */
  def hourlyStats(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("n"), col("sum_value"))

  /** Streaming form with a watermark bounding state and late data. */
  def hourlyStatsStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("n"), col("sum_value"))

  /** Sliding windows (1 hour window, 15 min slide) per event type. */
  def slidingTypeCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** Session windows per user with an inactivity gap. */
  def userSessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Streaming session windows (requires a watermark to close sessions). */
  def userSessionsStream(events: DataFrame, gap: String = "30 minutes",
                         watermark: String = "2 hours"): DataFrame =
    userSessions(events.withWatermark("ts", watermark), gap)

  /** Streaming exact dedup by event_id with state bounded by watermark. */
  def dedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: purchases within `window` after the
    * same user's signup. Both sides carry watermarks so the join state
    * is bounded (Spark drops a side's state once its watermark passes
    * the interval bound). Works on batch inputs identically.
    */
  def signupToPurchase(signups: DataFrame, purchases: DataFrame,
                       window: String = "1 hour",
                       watermark: String = "2 hours"): DataFrame = {
    val s = signups.withWatermark("ts", watermark)
      .select(col("user_id").as("s_user"), col("ts").as("signup_ts"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
    s.join(p,
      col("s_user") === col("p_user") &&
        col("purchase_ts") >= col("signup_ts") &&
        col("purchase_ts") <= col("signup_ts") + expr(s"INTERVAL $window"))
      .select(col("s_user").as("user_id"), col("signup_ts"),
        col("purchase_ts"), col("purchase_value"))
  }

  /** Stream-static enrichment: join each micro-batch against a static
    * dimension (user → attributes). The static side re-plans as an
    * ordinary batch relation every micro-batch — no streaming state, no
    * watermark; `broadcast` keeps the stream side shuffle-free, the same
    * dim-join discipline as the batch queries. Left join so unknown
    * users pass through with NULL attributes rather than vanishing.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left")

  /** Per-attribute running counts over the enriched stream (complete
    * mode downstream) — enrichment feeding a keyed aggregate.
    */
  def countsByDim(events: DataFrame, dim: DataFrame, attr: String): DataFrame =
    enrichWithDim(events, dim)
      .groupBy(col(attr))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))

  /** Streaming anomaly gate — the serving twin of the batch
    * `Stats.anomalyZscore`, sharing `operators.AnomalyGate` so the two
    * inequalities can never diverge: offline per-type moments join the
    * live stream as a broadcast static side and outliers are flagged
    * map-side per micro-batch. No streaming state, no watermark, no
    * stream-side shuffle. The static side re-plans EVERY micro-batch —
    * pass `moments.cache()`d (or a read of the persisted moment table),
    * never the raw corpus aggregation, or each batch re-scans the corpus.
    */
  def anomalyGate(events: DataFrame, moments: DataFrame): DataFrame =
    graft.operators.AnomalyGate.gate(events, moments, "event_type", "value")
      .select(col("event_id"), col("event_type"), col("value"))
}
