package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support for a training-data pipeline: image/audio/
  * video travel as opaque `BINARY` columns with typed metadata, and
  * decode / feature-extract / frame-sample run as batched per-partition
  * transforms over the bytes.
  *
  * The Spark-side plumbing here is real and tested — schemas, batched
  * mapPartitions shape, deterministic partitioning, explode semantics for
  * frame sampling. The codec itself is STUBBED (this container has no
  * image/audio libraries): `decodeStub` derives deterministic pseudo
  * features from the bytes. Swapping in a real decoder changes only the
  * function passed to the executor, not the pipeline shape.
  *
  * Sources: `spark.read.format("binaryFile")` yields exactly this shape
  * ((path, modificationTime, length, content BINARY)) for real blob
  * directories; `fromBytes` builds the same schema from in-memory fixtures.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** In-memory media table with the canonical schema. */
  def fromBytes(spark: SparkSession,
                rows: Seq[(Long, String, Array[Byte], Map[String, String])]): DataFrame = {
    val data = rows.map { case (id, m, b, meta) => Row(id, m, b, meta) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, math.max(1, rows.size / 64 + 1)),
      mediaSchema)
  }

  /** Wrap a binaryFile scan into the canonical media schema; modality is
    * dispatched on file extension (reference format-dispatch analog,
    * `utils.py:12-19`).
    */
  def fromBinaryFiles(spark: SparkSession, glob: String): DataFrame =
    spark.read.format("binaryFile").load(glob)
      .select(
        xxhash64(col("path")).as("media_id"),
        when(col("path").rlike("(?i)\\.(png|jpe?g|gif|bmp)$"), "image")
          .when(col("path").rlike("(?i)\\.(wav|mp3|flac|ogg)$"), "audio")
          .when(col("path").rlike("(?i)\\.(mp4|avi|mkv|webm)$"), "video")
          .otherwise("unknown").as("modality"),
        col("content").as("bytes"),
        map(lit("path"), col("path"), lit("length"), col("length").cast("string")).as("meta"))

  /** STUB decoder: deterministic pseudo feature vector from bytes (md5
    * expansion). Replace with a real codec (`??? -> libjpeg/ffmpeg`) to
    * productionize; the surrounding plumbing is unchanged.
    */
  def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val base = md.digest(if (bytes == null) Array.emptyByteArray else bytes)
    Array.tabulate(dim) { i =>
      val b = base((i * 7) % base.length)
      ((b & 0xFF) - 128) / 128.0f
    }
  }

  /** Batched feature extraction: media rows → (media_id, modality,
    * features ARRAY<FLOAT>). Batches of `batchSize` per partition mirror
    * how a real vectorized decode (GPU/SIMD codec) is driven; the stub
    * decodes per item inside the batch.
    */
  def extractFeatures(df: DataFrame, dim: Int, batchSize: Int = 32): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = true)))
    val idIdx = df.schema.fieldIndex("media_id")
    val moIdx = df.schema.fieldIndex("modality")
    val byIdx = df.schema.fieldIndex("bytes")
    implicit val enc = Encoders.row(schema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = if (r.isNullAt(byIdx)) null else r.getAs[Array[Byte]](byIdx)
          Row(r.getLong(idIdx), r.getString(moIdx),
            if (bytes == null) null else decodeStub(bytes, dim).toSeq)
        }
      }
    }
  }

  /** Frame sampling for video rows: emit one row per sampled frame index
    * (every `everyNth` of `n_frames` from metadata), with a per-frame
    * pseudo feature. Non-video rows pass through with frame_no = 0.
    */
  def sampleFrames(df: DataFrame, everyNth: Int, dim: Int): DataFrame = {
    val frames = when(col("modality") === "video",
      sequence(lit(0),
        greatest(coalesce(element_at(col("meta"), "n_frames").cast("int"), lit(1)) - 1, lit(0)),
        lit(everyNth)))
      .otherwise(array(lit(0)))
    val withFrame = df.select(col("media_id"), col("modality"), col("bytes"),
      explode(frames).as("frame_no"))
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = true)))
    val idIdx = 0; val byIdx = 2; val frIdx = 3
    implicit val enc = Encoders.row(schema)
    withFrame.mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.isNullAt(byIdx)) null else r.getAs[Array[Byte]](byIdx)
        val frame = r.getInt(frIdx)
        Row(r.getLong(idIdx), frame,
          if (bytes == null) null
          else decodeStub(bytes :+ frame.toByte, dim).toSeq)
      }
    }
  }
}
