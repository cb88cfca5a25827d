package graft.streaming

import graft.operators.{TextAnalysis => TA}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming corpus intake: the batch curation gates applied to an
  * unbounded (ts, doc_id, text) document stream — the shape a continuous
  * ingestion pipeline (crawl feed, upload queue) runs before documents
  * reach the corpus.
  *
  * Exact dedup keys the state store on the 128-bit content fingerprint,
  * NOT the text (state size is bounded by watermark horizon × 16 bytes +
  * key overhead, never by document length); the language/quality gates
  * are stateless per-row expressions — the SAME expressions the oracled
  * batch queries use (`q_lang_id`, `q_quality_score`, `q_curate`), so
  * batch parity is the correctness argument exactly as in EventStreams.
  */
object DocStreams {

  /** Deduped + gated document stream. Works only on streaming inputs
    * (dropDuplicatesWithinWatermark requires a watermark); the batch
    * twin for parity tests is `curateDocsBatch`.
    */
  def curateDocs(docs: DataFrame, watermark: String = "1 hour",
                 keepLangs: Seq[String] = Seq("en"),
                 minQuality: Double = 0.45): DataFrame =
    docs
      .withColumn("fp", md5(col("text").cast("binary")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
      .where(TA.langId(col("text")).isInCollection(keepLangs) &&
        TA.qualityScore(col("text")) >= minQuality)
      .select(col("ts"), col("doc_id"), col("text"))

  /** Batch twin: identical gates, dedup = keep the earliest (ts, doc_id)
    * row per fingerprint — what the stream emits when every duplicate
    * arrives within the watermark horizon.
    */
  def curateDocsBatch(docs: DataFrame,
                      keepLangs: Seq[String] = Seq("en"),
                      minQuality: Double = 0.45): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("fp")).orderBy(col("ts").asc, col("doc_id").asc)
    docs
      .withColumn("fp", md5(col("text").cast("binary")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .where(TA.langId(col("text")).isInCollection(keepLangs) &&
        TA.qualityScore(col("text")) >= minQuality)
      .select(col("ts"), col("doc_id"), col("text"))
  }
}
