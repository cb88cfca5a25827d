package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Commit-gated parquet state shared by the streaming operators
  * (DedupStream, DriftStream): every per-batch state write lands in its
  * own `table/batch_id=N` directory, and an empty marker file under
  * `stateDir/_committed/N` — written LAST — gates what restarts may
  * read. A crash mid-batch leaves no marker, so its partial directories
  * are invisible garbage until the replay overwrites them; a replayed
  * COMMITTED batch overwrites byte-identical state, so reads stay
  * consistent either way (effectively-once on top of at-least-once).
  */
private[streaming] object StreamState {

  private def hadoopFs(s: SparkSession, dir: String) = {
    val path = new org.apache.hadoop.fs.Path(dir)
    (path.getFileSystem(s.sparkContext.hadoopConfiguration), path)
  }

  /** Batch ids whose state writes fully committed, ascending. */
  def committedIds(s: SparkSession, stateDir: String): Seq[Long] = {
    val (fs, dir) = hadoopFs(s, s"$stateDir/_committed")
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .flatMap(st => scala.util.Try(st.getPath.getName.toLong).toOption)
      .sorted
  }

  def commitMarker(s: SparkSession, stateDir: String, batchId: Long): Unit = {
    val (fs, dir) = hadoopFs(s, s"$stateDir/_committed")
    fs.mkdirs(dir)
    fs.create(new org.apache.hadoop.fs.Path(dir, batchId.toString), true).close()
  }

  /** Read a state table restricted to COMMITTED batch partitions — the
    * only truth a restart may trust. `upTo` (exclusive) lets a replayed
    * batch exclude its OWN earlier commit, keeping the replay's
    * reference state identical to the original run's. No qualifying
    * markers reads as the empty relation; the explicit schema means an
    * empty-but-existing committed dir reads as zero rows instead of
    * failing schema inference, while a corrupt footer in a COMMITTED
    * partition still aborts at scan time.
    */
  def readCommitted(s: SparkSession, stateDir: String, table: String,
      schema: StructType, upTo: Long = Long.MaxValue): DataFrame = {
    val dirs = committedIds(s, stateDir)
      .filter(_ < upTo)
      .map(id => s"$stateDir/$table/batch_id=$id")
    if (dirs.isEmpty) s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
    else s.read.schema(schema).parquet(dirs: _*)
      .select(schema.fieldNames.map(col).toSeq: _*)
  }
}
