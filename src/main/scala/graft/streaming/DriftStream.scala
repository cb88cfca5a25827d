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
    * id), then commit. Exposed for direct testing.
    */
  def processBatch(batch: Dataset[Row], batchId: Long, stateDir: String,
      outDir: String): Unit = {
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
  }

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
    */
  def driftMonitor(docs: DataFrame, stateDir: String, outDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch, batchId, stateDir, outDir)
      }
      .start()
}
