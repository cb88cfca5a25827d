package graft

import graft.queries.Retrieval
import graft.streaming.DriftStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming source-drift monitor: per-batch scores equal the batch twin
  * computed against everything ingested before, the first batch hits the
  * "everything is new" floor, an alien source fires near the ceiling, a
  * replayed committed batch is byte-idempotent (its own state partition
  * is excluded from its reference), and a torn uncommitted state write
  * is invisible on restart.
  */
class DriftStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dirs() = (
    java.nio.file.Files.createTempDirectory("graft_drift_state").toString,
    java.nio.file.Files.createTempDirectory("graft_drift_out").toString,
    java.nio.file.Files.createTempDirectory("graft_drift_ck").toString)

  private val wave1 = Seq((1L, "a b c a", "web"), (2L, "c d a b", "web"))
  private val wave2 = Seq((3L, "a b c d", "web"), (4L, "zz qq zz", "alien"))

  private def drift(outDir: String, batchId: Long): Map[String, Long] =
    spark.read.parquet(s"$outDir/batch_id=$batchId")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap

  test("per-batch scores: first-batch floor, then batch-vs-prefix twin parity") {
    implicit val sqlCtx = spark.sqlContext
    val (stateDir, outDir, ckDir) = dirs()
    val mem = MemoryStream[(Long, String, String)]
    def runWave(rows: Seq[(Long, String, String)]): Unit = {
      val q = DriftStream.driftMonitor(
        mem.toDF().toDF("doc_id", "text", "source"), stateDir, outDir, ckDir)
      try { mem.addData(rows: _*); q.processAllAvailable() } finally q.stop()
    }
    runWave(wave1)
    // empty reference: each source scores its own mass — exactly 1M ppm
    // here (8 tokens: a:3,b:2,c:2,d:1 → 375000+250000+250000+125000)
    assert(drift(outDir, 0L) == Map("web" -> 1_000_000L))
    runWave(wave2)
    // batch twin: wave2 scored against wave1's distribution
    val twin = Retrieval.l1DriftPpm(
        Retrieval.sourceWordCounts(wave2.toDF("doc_id", "text", "source")),
        wave1.toDF("doc_id", "text", "source")
          .select(explode(graft.operators.TextAnalysis.tokens(col("text"))).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("c_w")))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val got = drift(outDir, 1L)
    assert(got == twin, s"stream $got != batch twin $twin")
    // the alien source's vocabulary is entirely novel → near the ceiling;
    // the steady source has settled far below it
    assert(got("alien") > 1_900_000L, s"alien drift ${got("alien")}")
    assert(got("web") < got("alien") / 2, s"web drift ${got("web")}")
  }

  test("replaying a COMMITTED batch is byte-idempotent (own state excluded)") {
    val (stateDir, outDir, _) = dirs()
    val b0 = wave1.toDF("doc_id", "text", "source")
    val b1 = wave2.toDF("doc_id", "text", "source")
    DriftStream.processBatch(b0, 0L, stateDir, outDir)
    DriftStream.processBatch(b1, 1L, stateDir, outDir)
    val first = drift(outDir, 1L)
    // crash AFTER commit, replay batch 1: reference must exclude batch
    // 1's own committed counts or the replay would see its own words
    DriftStream.processBatch(b1, 1L, stateDir, outDir)
    assert(drift(outDir, 1L) == first, "replay changed a committed batch's output")
    // state holds each batch's counts exactly once (overwritten, not doubled)
    val aCount = spark.read.parquet(s"$stateDir/counts")
      .where(col("w") === "a").agg(sum("c_w")).collect()(0).getLong(0)
    assert(aCount == 4L, s"'a' counted $aCount times across state, expected 4")
  }

  test("a torn uncommitted state write is invisible to the next batch") {
    val (stateDir, outDir, _) = dirs()
    DriftStream.processBatch(wave1.toDF("doc_id", "text", "source"), 0L, stateDir, outDir)
    // simulate a crash mid-batch-1: state directory written, NO marker
    Seq(("zz", 100L)).toDF("w", "c_w")
      .write.mode("overwrite").parquet(s"$stateDir/counts/batch_id=1")
    // batch 2 must score against batch 0 only — if the torn write were
    // read, 'zz' would be a known word and the alien drift would drop
    DriftStream.processBatch(wave2.toDF("doc_id", "text", "source"), 2L, stateDir, outDir)
    val twin = Retrieval.l1DriftPpm(
        Retrieval.sourceWordCounts(wave2.toDF("doc_id", "text", "source")),
        wave1.toDF("doc_id", "text", "source")
          .select(explode(graft.operators.TextAnalysis.tokens(col("text"))).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("c_w")))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(drift(outDir, 2L) == twin, "torn uncommitted state leaked into the reference")
  }
}
