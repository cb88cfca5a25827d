package graft.streaming

import graft.queries.Retrieval
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Continuous data-mixture drift monitoring — the streaming form of
  * `q_source_drift`: each micro-batch of (doc_id, text, source)
  * documents is scored per source against the distribution of EVERYTHING
  * ingested before it (L1 ppm distance, `Retrieval.l1DriftPpm`), then
  * folded into the reference. The monitor fires exactly when a corpus
  * pipeline needs it to: a new crawl whose vocabulary the corpus has
  * never seen scores near the 2M ppm ceiling on arrival; a steady
  * source's batches settle toward 0 as the reference absorbs them. The
  * very first batch scores each source by its own total mass (~1M ppm,
  * the "everything is new" floor) rather than dividing by an empty
  * reference.
  *
  * State = word counts at vocab grain, partitioned by batch
  * (`stateDir/counts/batch_id=N`, append-only, summed at read) behind
  * the same commit-marker gate as DedupStream — a torn write from a
  * crash mid-batch is invisible on restart. Replay determinism needs
  * one extra rule the dedup stream doesn't: a replayed batch must score
  * against the reference AS OF its first run, so reads exclude the
  * batch's OWN committed partition (`upTo = batchId`) — re-running a
  * committed batch reproduces byte-identical output and state.
  *
  * Scale: per-batch cost tracks the batch (one tokenize collapsing
  * map-side to (source, word) grain) plus the committed reference at
  * VOCAB grain — the corpus's documents are never re-read; a production
  * deployment periodically compacts the count partitions, which the
  * append discipline makes a pure concatenation.
  */
object DriftStream {

  private val countsSchema = StructType(Seq(
    StructField("w", StringType), StructField("c_w", LongType)))

  /** Reference word counts visible to batch `batchId`: all committed
    * batches strictly before it, summed to (w, c_w).
    */
  private def referenceCounts(s: SparkSession, stateDir: String,
      batchId: Long): DataFrame =
    StreamState.readCommitted(s, stateDir, "counts", countsSchema, upTo = batchId)
      .groupBy(col("w")).agg(sum(col("c_w")).as("c_w"))

  /** One micro-batch: score `batch` per source against the pre-batch
    * reference, write (source, n_tokens, l1_ppm) to `outDir/batch_id=N`
    * and the batch's word counts to the state (both overwrite-by-batch-
    * id), then commit. `autoCompactEvery > 0` triggers
    * [[compactState]] once more than that many committed batches have
    * accumulated since the last base — reads stay O(base + ≤N batches)
    * with no manual compaction call, same crash contract
    * (StreamState.maybeCompact). Exposed for direct testing.
    */
  def processBatch(batch: Dataset[Row], batchId: Long, stateDir: String,
      outDir: String, autoCompactEvery: Int = 0): Unit = {
    val s = batch.sparkSession
    val sw = Retrieval.sourceWordCounts(
        batch.select(col("source"), col("text")))
      .localCheckpoint() // feeds the drift score and the state fold
    Retrieval.l1DriftPpm(sw, referenceCounts(s, stateDir, batchId))
      .orderBy(col("source").asc)
      .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
    sw.groupBy(col("w")).agg(sum(col("c_sw")).as("c_w"))
      .write.mode("overwrite").parquet(s"$stateDir/counts/batch_id=$batchId")
    // marker LAST: a crash anywhere above leaves batchId uncommitted
    StreamState.commitMarker(s, stateDir, batchId)
    StreamState.maybeCompact(s, stateDir, autoCompactEvery)(compactState(s, stateDir))
  }

  // ---- thresholded alert surface -----------------------------------

  private val alertStateSchema = StructType(Seq(
    StructField("source", StringType), StructField("alerting",
      org.apache.spark.sql.types.BooleanType), StructField("b", LongType)))

  private def alertRoot(stateDir: String) = s"$stateDir/alerts"

  /** Hysteresis alert decision for ONE batch of drift scores
    * (source, n_tokens, l1_ppm): a source ENTERS alert when its score
    * reaches `base_ppm + enterPpm`, and LEAVES only when it falls below
    * `base_ppm + exitPpm` (exit < enter — the band between holds the
    * previous state, so a score oscillating around one threshold cannot
    * flap the signal). `baseline` is the per-source expected drift
    * (source, base_ppm) — a tiny dimension, broadcast; sources without a
    * baseline use 0 (a NEW source is pure drift, which is exactly when
    * the 2M-ppm new-crawl signal should fire). `prevAlerting` is the
    * previous decision per source (source, alerting). Pure function —
    * the batch and streaming forms share it, so they cannot diverge.
    */
  def alertDecide(scores: DataFrame, baseline: DataFrame,
      prevAlerting: DataFrame, enterPpm: Long, exitPpm: Long): DataFrame = {
    require(exitPpm <= enterPpm, s"hysteresis needs exit ($exitPpm) <= enter ($enterPpm)")
    scores
      .join(broadcast(baseline.select(col("source"), col("base_ppm"))),
        Seq("source"), "left")
      .join(broadcast(prevAlerting.select(col("source"), col("alerting").as("was"))),
        Seq("source"), "left")
      .withColumn("base", coalesce(col("base_ppm"), lit(0L)))
      .select(col("source"), col("n_tokens"), col("l1_ppm"),
        when(col("l1_ppm") >= col("base") + lit(enterPpm), lit(true))
          .when(col("l1_ppm") < col("base") + lit(exitPpm), lit(false))
          .otherwise(coalesce(col("was"), lit(false))).as("alerting"))
  }

  /** Latest committed alert state per source visible to `batchId`
    * (a source keeps its state until it reappears). Tiny: one row per
    * source per batch, reduced by max_by on the batch stamp.
    */
  private def prevAlertState(s: SparkSession, stateDir: String,
      batchId: Long): DataFrame =
    StreamState.readCommitted(s, alertRoot(stateDir), "state", alertStateSchema,
        upTo = batchId)
      .groupBy(col("source"))
      .agg(max_by(col("alerting"), col("b")).as("alerting"))

  /** One micro-batch of the ALERTING monitor: the drift step of
    * [[processBatch]] plus the hysteresis decision, written to
    * `alertDir/batch_id=N` as (source, n_tokens, l1_ppm, alerting) — the
    * boolean a pipeline gates on. Alert state lives under its own
    * commit-gated root (`stateDir/alerts`), marker LAST, replays
    * excluded via `upTo` — the same effectively-once discipline as the
    * count state, torn writes invisible.
    */
  def processAlertBatch(batch: Dataset[Row], batchId: Long, stateDir: String,
      outDir: String, alertDir: String, baseline: DataFrame,
      enterPpm: Long = 500_000L, exitPpm: Long = 300_000L,
      autoCompactEvery: Int = 0): Unit = {
    val s = batch.sparkSession
    val sw = Retrieval.sourceWordCounts(
        batch.select(col("source"), col("text")))
      .localCheckpoint()
    val scores = Retrieval.l1DriftPpm(sw, referenceCounts(s, stateDir, batchId))
      .orderBy(col("source").asc)
      .localCheckpoint() // feeds the score sink and the alert decision
    scores.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
    sw.groupBy(col("w")).agg(sum(col("c_sw")).as("c_w"))
      .write.mode("overwrite").parquet(s"$stateDir/counts/batch_id=$batchId")
    StreamState.commitMarker(s, stateDir, batchId)
    val decided = alertDecide(scores,
        baseline, prevAlertState(s, stateDir, batchId), enterPpm, exitPpm)
      .orderBy(col("source").asc)
      .localCheckpoint()
    decided.write.mode("overwrite").parquet(s"$alertDir/batch_id=$batchId")
    decided.select(col("source"), col("alerting"), lit(batchId).as("b"))
      .write.mode("overwrite")
      .parquet(s"${alertRoot(stateDir)}/state/batch_id=$batchId")
    StreamState.commitMarker(s, alertRoot(stateDir), batchId)
    // each root compacts on its own committed-batch count
    StreamState.maybeCompact(s, stateDir, autoCompactEvery)(compactState(s, stateDir))
    StreamState.maybeCompact(s, alertRoot(stateDir), autoCompactEvery)(
      compactAlertState(s, stateDir))
  }

  /** Start the alerting monitor: [[driftMonitor]] plus the per-source
    * hysteresis boolean at `alertDir`.
    */
  def alertMonitor(docs: DataFrame, stateDir: String, outDir: String,
      alertDir: String, checkpointDir: String, baseline: DataFrame,
      enterPpm: Long = 500_000L, exitPpm: Long = 300_000L,
      autoCompactEvery: Int = 16): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processAlertBatch(batch, batchId, stateDir, outDir, alertDir,
          baseline, enterPpm, exitPpm, autoCompactEvery)
      }
      .start()

  /** Compact the alert-state root (latest decision per source survives;
    * the count state compacts separately via [[compactState]]).
    */
  def compactAlertState(s: SparkSession, stateDir: String): Option[Long] =
    StreamState.compact(s, alertRoot(stateDir), Seq(
      ("state", alertStateSchema, (df: DataFrame) =>
        df.groupBy(col("source"))
          .agg(max_by(col("alerting"), col("b")).as("alerting"),
            max(col("b")).as("b"))
          .select(col("source"), col("alerting"), col("b")))))

  /** Compact the monitor's committed word-count state: fold all but the
    * newest committed batch into one base partition, RE-AGGREGATED to
    * vocab grain — exactly the sum `referenceCounts` computes at read, so
    * every subsequent score is unchanged while the reference read drops
    * from O(batches × vocab) rows to O(vocab) + the newest batch. Safe to
    * run between (or concurrent with) batches: the commit-gate protocol
    * makes a killed compaction invisible (see StreamState.compact).
    */
  def compactState(s: SparkSession, stateDir: String): Option[Long] =
    StreamState.compact(s, stateDir, Seq(
      ("counts", countsSchema,
        (df: DataFrame) => df.groupBy(col("w")).agg(sum(col("c_w")).as("c_w")))))

  /** Start the monitor over a streaming (doc_id, text, source) frame.
    * Readers see per-batch drift scores as one partitioned parquet table
    * at `outDir`.
    *
    * `autoCompactEvery` defaults to 16 on the long-running entry points
    * ([[driftMonitor]], [[alertMonitor]]): reference reads stay
    * O(base + ≤16 batch dirs) for the life of the stream with zero
    * operator intervention, under the same crash contract
    * (StreamState.maybeCompact). 0 disables; the per-batch primitives
    * ([[processBatch]], [[processAlertBatch]]) keep 0 for test isolation.
    */
  def driftMonitor(docs: DataFrame, stateDir: String, outDir: String,
      checkpointDir: String, autoCompactEvery: Int = 16): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch, batchId, stateDir, outDir, autoCompactEvery)
      }
      .start()
}
