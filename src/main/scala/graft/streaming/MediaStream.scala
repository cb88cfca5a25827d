package graft.streaming

import graft.sources.Multimodal
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Continuous multimodal ingestion — the streaming form of the
  * q_media_curate front half, completing the media family's streaming
  * story (every other north-star family already has one: DedupStream
  * for near-dup text, DriftStream for mixture monitoring). Each
  * micro-batch of canonical media rows (media_id, modality, bytes,
  * meta) is:
  *
  *  1. header-parsed to typed metadata (the [[Multimodal]] parsers —
  *     REAL container parsing, same stages as the batch query);
  *  2. hygiene-gated: rows whose bytes fail their container parse, or
  *     whose extension dispatched to no modality, go to a quarantine
  *     output `rejectDir/batch_id=N` (with a `reason` column) instead
  *     of silently vanishing — a curation stream must account for
  *     every input;
  *  3. exact-dedup'd on content digest, first within the batch (keep
  *     the lowest media_id per digest — ids are a monotone ingestion
  *     sequence, same contract as DedupStream) and then against the
  *     PERSISTED digest table (anti-join: new↔new and new↔existing
  *     only — the existing corpus is never re-scanned);
  *  4. appended to the corpus at `outDir/batch_id=N`; kept digests
  *     append to the state table.
  *
  * Replay-idempotent on the DedupStream discipline: every write is
  * keyed by batch id and overwrites its own directory, the per-batch
  * COMMIT MARKER (written last, via [[StreamState]]) gates what
  * restarts may read, and a replayed committed batch reproduces the
  * same kept set (its own state rows are superseded by overwrite, its
  * dedup decisions by the anti-join against STRICTLY EARLIER committed
  * batches being deterministic).
  *
  * Scale shape: per-batch cost tracks the BATCH — one narrow parse
  * pass, one digest per row, one digest-keyed anti-join probing the
  * committed state (equi-join, never pairwise). State is (digest,
  * media_id) pairs in plain parquet — 48 B/row regardless of blob
  * size — folded by [[StreamState.maybeCompact]] so reads stay
  * O(base + few batch dirs) forever.
  */
object MediaStream {

  private val digestsSchema = StructType(Seq(
    StructField("digest", StringType), StructField("media_id", LongType)))

  /** One micro-batch of canonical media rows (the [[Multimodal]]
    * schema). Exposed for direct testing like DedupStream.processBatch.
    */
  def processBatch(batch: Dataset[Row], batchId: Long, stateDir: String,
      outDir: String, rejectDir: String, autoCompactEvery: Int = 0): Unit = {
    val ann = annotateMedia(batch.toDF())
    quarantineRows(ann)
      .write.mode("overwrite").parquet(s"$rejectDir/batch_id=$batchId")
    dedupAndAppend(ann.filter(isWellFormed), batch.select(col("media_id")),
      batchId, stateDir, outDir, autoCompactEvery)
  }

  /** Typed-metadata annotation over whatever `bytes` the rows carry
    * (full blobs or bounded heads — the parsers only read header bytes
    * either way). Checkpointed: parsed once, feeds gate + quarantine.
    */
  private def annotateMedia(batch: DataFrame): DataFrame =
    Multimodal.withVideoMeta(
      Multimodal.withAudioMeta(Multimodal.withImageMeta(batch))
        .withColumnRenamed("duration_ms", "audio_duration_ms"))
      .withColumn("format",
        coalesce(col("img_format"), col("audio_format"), col("video_format")))
      .withColumn("duration_ms",
        coalesce(col("audio_duration_ms"), col("duration_ms")))
      .localCheckpoint()

  private def isWellFormed =
    col("modality") =!= "unknown" && col("format").isNotNull

  /** The quarantine rows, with the reason a pipeline operator triages
    * by.
    */
  private def quarantineRows(ann: DataFrame): DataFrame = ann
    .filter(col("modality") === "unknown" || col("format").isNull)
    .select(col("media_id"), col("modality"),
      when(col("modality") === "unknown", "unmapped_extension")
        .otherwise("container_parse_failed").as("reason"))

  /** The dedup-and-append back half over gate survivors whose `bytes`
    * column carries FULL blobs (the digest and the corpus row are
    * whole-blob by definition). `batchIds` = this batch's media_ids,
    * for the replay-supersede anti-join.
    */
  private def dedupAndAppend(wellFormed: DataFrame, batchIds: DataFrame,
      batchId: Long, stateDir: String, outDir: String,
      autoCompactEvery: Int): Unit = {
    val s = wellFormed.sparkSession
    // within-batch exact dedup: monotone ids, keep the earliest
    val firstInBatch = wellFormed
      .withColumn("digest", md5(col("bytes")))
      .groupBy(col("digest"))
      .agg(min_by(
        struct(wellFormed.columns.map(col): _*), col("media_id")).as("keep"))
      .select(col("digest"), col("keep.*"))
    // cross-batch: drop digests an EARLIER committed batch already kept.
    // A replayed committed batch finds its OWN digests in the state —
    // supersede those by media_id (this batch's rows re-claim their
    // digests) so replay reproduces the original kept set instead of
    // dropping everything; the DedupStream anti-join discipline.
    val existing = StreamState.readCommitted(s, stateDir, "digests", digestsSchema)
      .join(batchIds, Seq("media_id"), "left_anti")
    val novel = firstInBatch
      .join(existing.select(col("digest")), Seq("digest"), "left_anti")
      .localCheckpoint() // one computation feeds corpus + state writes
    novel.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
    novel.select(col("digest"), col("media_id"))
      .write.mode("overwrite").parquet(s"$stateDir/digests/batch_id=$batchId")
    // marker LAST: a crash above leaves batchId uncommitted, its partial
    // directories unread on restart
    StreamState.commitMarker(s, stateDir, batchId)
    StreamState.maybeCompact(s, stateDir, autoCompactEvery)(compactState(s, stateDir))
  }

  /** HEAD-GATED ingestion batch — the two-phase shape of
    * [[processBatch]] for a discovery batch of (path, length) rows
    * (no blob bytes shipped by the source at all):
    *
    *  1. phase 1 reads only the first `headBytes` of each discovered
    *     file ([[Multimodal.withHeadBytes]]) and runs the parse +
    *     quarantine gates on those heads — a 4 GiB junk blob costs 64
    *     KiB to reject;
    *  2. phase 2 re-reads ONLY gate survivors in full
    *     ([[Multimodal.withFullBytes]]) for the whole-blob stages:
    *     content-digest dedup and the corpus append.
    *
    * Same commit discipline, same state/corpus/quarantine layout, same
    * replay idempotence as [[processBatch]] (all phases are
    * deterministic functions of the discovered file set). Per-batch
    * blob I/O is head-capped discovery + bounded tail reads for the
    * head-undecidable rows + survivor bytes, instead of the full-read
    * source's every-blob materialization — the streaming mirror of
    * q_media_curate_head. Quarantine rows are decided on bounded
    * windows wherever that is exact (front-loaded metadata from the
    * head; trailing-moov MP4 / Opus duration / provably-absent `ftyp`
    * from head+tail); only window-undecidable rows pay a full read to
    * be decided.
    */
  def processBatchHead(paths: Dataset[Row], batchId: Long, stateDir: String,
      outDir: String, rejectDir: String, headBytes: Int = 65536,
      autoCompactEvery: Int = 0, tailBytes: Int = 65536): Unit = {
    val heads = annotateMedia(toCanonical(
      Multimodal.withHeadBytes(
        paths.select(col("path"), col("length")), "path", headBytes)
        .withColumnRenamed("bytes", "content")))
    // a file LARGER than the cap whose container did not parse from
    // its head is UNDECIDABLE there (trailing-moov MP4, SOF-past-EXIF
    // JPEG) — quarantining it on the head parse would be wrong. Opus
    // is undecidable even when the head PARSES: duration lives in the
    // LAST Ogg page's granule, so a head parse under-reports it and
    // the under-reported value must never reach the corpus (the same
    // predicate as Media.curateRowsHead).
    //
    // Gate the whole tail branch on a METADATA-ONLY precondition
    // first: no file over the head cap with a media extension → no row
    // can be undecidable, and the predicate folds to false so Catalyst
    // propagates an empty relation through the branch — its
    // localCheckpoint, tail reads, and re-reads all collapse to
    // zero-I/O instead of paying a second head scan of the batch.
    // The check reads only the discovery rows' (path, length).
    val overCapExists = !paths
      .where(col("length") > headBytes && col("path").rlike(Multimodal.mediaExtRe))
      .isEmpty
    val undecidable = if (!overCapExists) lit(false) else
      element_at(col("meta"), "length").cast("long") > headBytes &&
        col("modality") =!= "unknown" &&
        (col("format").isNull || col("format") === "opus")
    val decided = heads.filter(!undecidable)
    // head-undecidable rows take a bounded TAIL read next: the
    // two-window parsers decide tail-anchored A/V metadata exactly
    // (trailing-moov MP4 box walk across the gap, Opus last-page
    // granule by validated re-sync). Decided-unparseable rows
    // quarantine at head+tail cost — a full parse would fail on the
    // same bytes; only window-undecidable rows (mid-file moov,
    // non-Ogg audio, JPEG SOF past the cap) pay a full re-read +
    // re-annotation BEFORE the quarantine decision. Junk extensions
    // stay head-only however large.
    val htUdf = udf(Multimodal.headTailAvMeta _)
    val withTail = Multimodal.withTailBytes(
        heads.filter(undecidable)
          .withColumn("path", element_at(col("meta"), "path")),
        "path", tailBytes)
      .withColumn("ht", htUdf(col("modality"), col("bytes"), col("tail_bytes"),
        element_at(col("meta"), "length").cast("long")))
      .localCheckpoint()
    val isA = col("modality") === "audio"
    val isV = col("modality") === "video"
    val tailDecided = withTail.filter(col("ht").isNotNull)
      .withColumn("format", col("ht._2"))
      .withColumn("duration_ms", when(col("ht._1"), col("ht._5")))
      .withColumn("audio_duration_ms",
        when(col("ht._1") && isA, col("ht._5")).otherwise(col("audio_duration_ms")))
      // the two-window decision re-derives rate/channels exactly, so a
      // decided audio row whose HEAD parse failed (e.g. header pages
      // carrying granule -1) still lands in the corpus with the values
      // a full read would have produced — mirror the duration handling
      .withColumn("sample_rate",
        when(col("ht._1") && isA, col("ht._3")).otherwise(col("sample_rate")))
      .withColumn("channels",
        when(col("ht._1") && isA, col("ht._4")).otherwise(col("channels")))
      .withColumn("audio_format",
        when(col("ht._1") && isA, col("ht._2")).otherwise(col("audio_format")))
      .withColumn("video_format",
        when(col("ht._1") && isV, col("ht._2")).otherwise(col("video_format")))
      .drop("ht", "tail_bytes", "path")
    val redone = annotateMedia(
      Multimodal.withFullBytes(
          withTail.filter(col("ht").isNull)
            .select(col("media_id"), col("modality"), col("meta"), col("path")),
          "path")
        .drop("path"))
    quarantineRows(decided).unionByName(quarantineRows(tailDecided))
      .unionByName(quarantineRows(redone))
      .write.mode("overwrite").parquet(s"$rejectDir/batch_id=$batchId")
    // phase 2: head- and tail-decided survivors swap the head slice for
    // the full blob; re-read survivors already carry theirs
    val decidedSurvivors = Multimodal.withFullBytes(
      decided.filter(isWellFormed).drop("bytes")
        .withColumn("path", element_at(col("meta"), "path")),
      "path").drop("path")
    val tailSurvivors = Multimodal.withFullBytes(
      tailDecided.filter(isWellFormed).drop("bytes")
        .withColumn("path", element_at(col("meta"), "path")),
      "path").drop("path")
    val survivors = decidedSurvivors
      .unionByName(tailSurvivors.select(decidedSurvivors.columns.map(col).toSeq: _*))
      .unionByName(redone.filter(isWellFormed)
        .select(decidedSurvivors.columns.map(col).toSeq: _*))
    dedupAndAppend(survivors,
      paths.select(xxhash64(col("path")).as("media_id")), batchId,
      stateDir, outDir, autoCompactEvery)
  }

  /** Fold the committed digest state under one marker (identity merge:
    * each digest's first keeper lives in exactly one committed
    * partition — a replayed batch overwrites its own).
    */
  def compactState(s: SparkSession, stateDir: String): Option[Long] =
    StreamState.compact(s, stateDir, Seq(
      ("digests", digestsSchema, (df: DataFrame) => df)))

  /** Start the ingestion stream over a streaming canonical media frame
    * (e.g. a file-source stream wrapped by [[Multimodal]]'s schema, or
    * a MemoryStream in tests). Readers see the growing deduplicated
    * corpus as one partitioned parquet table at `outDir` and the
    * quarantine at `rejectDir`.
    */
  def dedupIngest(media: DataFrame, stateDir: String, outDir: String,
      rejectDir: String, checkpointDir: String,
      autoCompactEvery: Int = 16): StreamingQuery =
    media.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch, batchId, stateDir, outDir, rejectDir, autoCompactEvery)
      }
      .start()

  /** Watch a directory for newly arriving blob files (Spark's
    * `binaryFile` FILE STREAM source — exactly-once file discovery via
    * the checkpoint's file log) and run the full ingestion over each
    * discovery batch. media_id = xxhash64(path): content-stable, and
    * the monotone-arrival dedup contract holds per digest because a
    * given digest's FIRST arrival commits before later ones are probed
    * against state (same-batch ties break by id, deterministically).
    *
    * This is the single-phase form: every arriving blob is fully
    * materialized by the source before the gates run. Prefer
    * [[watchDirectoryHead]] in production — survivors must be fully
    * read for the digest and the corpus append either way, but
    * REJECTED blobs should only ever cost a head read.
    */
  def watchDirectory(spark: SparkSession, dir: String, stateDir: String,
      outDir: String, rejectDir: String, checkpointDir: String,
      autoCompactEvery: Int = 16): StreamingQuery = {
    // the file STREAM source requires an explicit schema; binaryFile's
    // is fixed by the format
    val binaryFileSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
      StructField("length", LongType),
      StructField("content", org.apache.spark.sql.types.BinaryType)))
    val files = spark.readStream.format("binaryFile")
      .schema(binaryFileSchema).load(dir)
    dedupIngest(toCanonical(files), stateDir, outDir, rejectDir,
      checkpointDir, autoCompactEvery)
  }

  /** (path, length, content) file rows → the canonical media schema;
    * modality is dispatched on file extension (reference
    * format-dispatch analog, `utils.py:12-19`).
    */
  private def toCanonical(files: DataFrame): DataFrame =
    Multimodal.toCanonical(files)

  /** HEAD-GATED [[watchDirectory]]: the file stream source ships only
    * (path, length) — `binaryFile`'s reader materializes a column only
    * when it is required, so dropping `content` from the projection
    * keeps blob bytes out of the source entirely — and each discovery
    * batch runs [[processBatchHead]]: gates on bounded head reads, full
    * reads deferred to gate survivors. This replaces the full-read
    * source the r14 brief flagged: the old note that "files must be
    * hashed anyway" only holds for SURVIVORS — quarantined blobs (junk
    * extensions, corrupt containers) were paying a full read to be
    * dropped.
    */
  def watchDirectoryHead(spark: SparkSession, dir: String, stateDir: String,
      outDir: String, rejectDir: String, checkpointDir: String,
      headBytes: Int = 65536, autoCompactEvery: Int = 16,
      tailBytes: Int = 65536): StreamingQuery = {
    val binaryFileSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
      StructField("length", LongType),
      StructField("content", org.apache.spark.sql.types.BinaryType)))
    val paths = spark.readStream.format("binaryFile")
      .schema(binaryFileSchema).load(dir)
      .select(col("path"), col("length"))
    paths.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatchHead(batch, batchId, stateDir, outDir, rejectDir,
          headBytes, autoCompactEvery, tailBytes)
      }
      .start()
  }
}
