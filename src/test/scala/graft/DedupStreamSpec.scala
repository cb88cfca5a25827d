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
}
