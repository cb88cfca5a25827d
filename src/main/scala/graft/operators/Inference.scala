package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Batch-inference plug (SURVEY.md C3/C12): the reference calls an
  * embedding model / LLM per request in-process; the Spark shape is a
  * `mapPartitions` that groups rows into batches and invokes a pluggable
  * model function once per batch — amortizing per-call overhead exactly
  * like the reference's one-batched-LLM-call-per-resume optimization
  * (`rag_model.py:69-81`).
  *
  * The model function is deliberately `Seq[String] => Seq[String]`
  * (serializable, executor-side): in production it wraps an HTTP client or
  * an in-process model (one client per executor, initialized lazily inside
  * the partition — the reference's module-level singleton, distributed);
  * in tests it is a deterministic stand-in. Inference never sits on an
  * oracle-checked path (SURVEY §7 risk f).
  */
object Inference {

  /** Apply `model` to `inCol` in batches of `batchSize`, appending the
    * result as string column `outCol`. Row order within partitions is
    * preserved; no shuffle.
    */
  def mapBatches(df: DataFrame, inCol: String, outCol: String, batchSize: Int)
                (model: Seq[String] => Seq[String]): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(outCol, StringType, nullable = true))
    val inIdx = df.schema.fieldIndex(inCol)
    implicit val enc = Encoders.row(schema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val outs = model(batch.map(r => r.getString(inIdx)))
        require(outs.size == batch.size,
          s"model returned ${outs.size} outputs for ${batch.size} inputs")
        batch.lazyZip(outs).map { (r, o) => Row.fromSeq(r.toSeq :+ o) }
      }
    }
  }

  /** Deterministic embedding stand-in: text → dim-length float array
    * derived from md5 (stable across engines/runs). Stands in for the
    * MiniLM embedder (`constants.py:5`) wherever tests need a real
    * vector column without model weights.
    */
  def pseudoEmbedding(text: String, dim: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { i =>
      val h = md.digest(s"$i:$text".getBytes("UTF-8"))
      // first 4 bytes → int → [-1, 1)
      val x = ((h(0) & 0xFF) << 24) | ((h(1) & 0xFF) << 16) | ((h(2) & 0xFF) << 8) | (h(3) & 0xFF)
      (x / 2147483648.0).toFloat
    }
  }
}
