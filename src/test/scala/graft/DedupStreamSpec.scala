package graft

import graft.operators.{Dedup, TextAnalysis => TA}
import graft.streaming.DedupStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming near-dup-gated ingestion: cumulative output across
  * micro-batches and a kill/restart equals the batch twin over all rows
  * seen, state growth is bounded by the kept rows, and a replayed batch
  * overwrites instead of appending.
  */
class DedupStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 20-distinct-token texts; a one-token substitution keeps Jaccard at
  // 19/21 ≈ 0.905 (near-dup at the 0.9 threshold), different bases are
  // fully disjoint
  private def text(base: String): String =
    (1 to 20).map(i => s"$base$i").mkString(" ")
  private def variant(base: String): String =
    ((1 to 19).map(i => s"$base$i") :+ s"${base}sub").mkString(" ")

  private val waves = Seq(
    Seq((1L, text("alpha")), (2L, variant("alpha")), (3L, text("beta"))),
    Seq((4L, text("alpha")), (5L, text("gamma")), (6L, variant("gamma"))))
  private val expectKept = Set(1L, 3L, 5L)

  test("near-dup ingest across batches and a restart equals the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val stateDir = java.nio.file.Files.createTempDirectory("graft_dds_state").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_dds_out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft_dds_ck").toString
    // one source (offsets continue across restarts, as a real replayable
    // source's would), but a FRESH query per wave: kill + restart on the
    // same checkpoint between waves
    val mem = MemoryStream[(Long, String)]
    def runWave(rows: Seq[(Long, String)]): Unit = {
      val q = DedupStream.nearDupIngest(mem.toDF().toDF("doc_id", "text"),
        stateDir, outDir, ckDir)
      try {
        mem.addData(rows: _*)
        q.processAllAvailable()
      } finally q.stop()
    }
    waves.foreach(runWave)
    val kept = spark.read.parquet(outDir).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(kept.length == kept.distinct.length, "duplicate corpus rows")
    assert(kept.toSet == expectKept)
    // batch twin: drop every pair's id_b over ALL rows seen
    val all = waves.flatten.toDF("doc_id", "text")
    val droppedTwin = Dedup.minhashNearDup(all, "doc_id",
        array_distinct(TA.tokens(col("text"))), bands = 8, rowsPerBand = 2,
        threshold = 0.9)
      .select(col("id_b")).distinct().collect().map(_.getLong(0)).toSet
    assert(kept.toSet == waves.flatten.map(_._1).toSet -- droppedTwin)
    // state grew by exactly the kept rows
    val setIds = spark.read.parquet(s"$stateDir/sets").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(setIds == expectKept)
  }

  test("replaying a batch against existing state reproduces it (idempotent)") {
    implicit val sqlCtx = spark.sqlContext
    val stateDir = java.nio.file.Files.createTempDirectory("graft_dds2_state").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_dds2_out").toString
    def replay(batchId: Long, rows: Seq[(Long, String)]): Unit =
      DedupStream.processBatch(rows.toDF("doc_id", "text"), batchId,
        stateDir, outDir, bands = 8, rowsPerBand = 2, threshold = 0.9)
    replay(0L, waves(0))
    replay(1L, waves(1))
    replay(1L, waves(1)) // crash-after-write, replay of batch 1
    val kept = spark.read.parquet(outDir).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(kept.length == kept.distinct.length, "replay appended duplicates")
    assert(kept.toSet == expectKept)
    val setIds = spark.read.parquet(s"$stateDir/sets").select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(setIds.length == setIds.distinct.length)
    assert(setIds.toSet == expectKept)
  }

  test("torn state write (crash mid-batch, no commit marker) is ignored on replay") {
    implicit val sqlCtx = spark.sqlContext
    val stateDir = java.nio.file.Files.createTempDirectory("graft_dds3_state").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_dds3_out").toString
    def run(batchId: Long, rows: Seq[(Long, String)]): Unit =
      DedupStream.processBatch(rows.toDF("doc_id", "text"), batchId,
        stateDir, outDir, bands = 8, rowsPerBand = 2, threshold = 0.9)
    run(0L, waves(0))
    // simulate a crash DURING batch 1's state write: the sets directory
    // exists but holds only an uncommitted _temporary subdir and a torn
    // (non-parquet) part file; no commit marker was written
    val torn = java.nio.file.Paths.get(stateDir, "sets", "batch_id=1")
    java.nio.file.Files.createDirectories(torn.resolve("_temporary"))
    java.nio.file.Files.write(torn.resolve("part-00000-torn.snappy.parquet"),
      Array[Byte](1, 2, 3, 4))
    // the replay must neither read the torn bytes as state nor wedge on
    // schema inference — it recomputes batch 1 and overwrites the debris
    run(1L, waves(1))
    val kept = spark.read.parquet(outDir).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(kept.length == kept.distinct.length)
    assert(kept.toSet == expectKept)
    val setIds = spark.read.parquet(s"$stateDir/sets").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(setIds == expectKept)
  }

  test("corrupt COMMITTED state aborts the batch instead of admitting duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val stateDir = java.nio.file.Files.createTempDirectory("graft_dds4_state").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_dds4_out").toString
    def run(batchId: Long, rows: Seq[(Long, String)]): Unit =
      DedupStream.processBatch(rows.toDF("doc_id", "text"), batchId,
        stateDir, outDir, bands = 8, rowsPerBand = 2, threshold = 0.9)
    run(0L, waves(0))
    // clobber batch 0's COMMITTED sets partition with non-parquet bytes:
    // this is damaged truth, not an uncommitted leftover — reading it as
    // empty would silently disable dedup, so the batch must fail
    val dir = java.nio.file.Paths.get(stateDir, "sets", "batch_id=0")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .foreach(p => java.nio.file.Files.write(p, Array[Byte](9, 9, 9, 9)))
    assertThrows[Exception] { run(1L, waves(1)) }
  }
}
