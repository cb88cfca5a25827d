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

  test("alertDecide: enter/exit thresholds with a hold band (hysteresis truth table)") {
    val baseline = Seq(("web", 200_000L)).toDF("source", "base_ppm")
    // enter = base+500k, exit = base+300k → web band is [500k, 700k);
    // unbaselined sources band is [300k, 500k)
    val prev = Seq(("web", true), ("hold_f", false)).toDF("source", "alerting")
    val scores = Seq(
      ("web", 10L, 600_000L),     // in band, was true  → stays true
      ("hold_f", 10L, 400_000L),  // in band, was false → stays false
      ("enter", 10L, 500_000L),   // >= enter, no prev  → true
      ("exit", 10L, 299_999L),    // < exit             → false
      ("fresh", 10L, 100_000L))   // below band, no prev→ false
      .toDF("source", "n_tokens", "l1_ppm")
    val got = streaming.DriftStream.alertDecide(scores, baseline, prev,
        enterPpm = 500_000L, exitPpm = 300_000L)
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(got == Map("web" -> true, "hold_f" -> false, "enter" -> true,
      "exit" -> false, "fresh" -> false))
  }

  test("alert monitor: streamed decisions equal an independent hysteresis fold; " +
    "a new crawl fires on arrival; replay is idempotent") {
    val (stateDir, outDir, _) = dirs()
    val alertDir = java.nio.file.Files.createTempDirectory("graft_drift_alert").toString
    val baseline = Seq(("web", 100_000L)).toDF("source", "base_ppm")
    val waves = Seq(
      Seq((1L, "a b c a", "web"), (2L, "c d a b", "web")),
      Seq((3L, "a b c d", "web"), (4L, "zz qq zz", "alien")),
      Seq((5L, "a c b d", "web"), (6L, "zz qq zz", "alien")),
      Seq((7L, "b a d c", "web"), (8L, "zz qq zz qq", "alien")))
    def run(i: Long): Unit = streaming.DriftStream.processAlertBatch(
      waves(i.toInt).toDF("doc_id", "text", "source"), i, stateDir, outDir,
      alertDir, baseline, enterPpm = 1_500_000L, exitPpm = 400_000L)
    (0L to 3L).foreach(run)
    def alertsOf(b: Long) = spark.read.parquet(s"$alertDir/batch_id=$b")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    // independent fold: plain-Scala hysteresis over the written SCORES
    val base = Map("web" -> 100_000L)
    var state = Map.empty[String, Boolean]
    val expect = (0L to 3L).map { b =>
      val scores = spark.read.parquet(s"$outDir/batch_id=$b")
        .collect().map(r => (r.getString(0), r.getLong(2))).sortBy(_._1)
      scores.map { case (src, l1) =>
        val bb = base.getOrElse(src, 0L)
        val next =
          if (l1 >= bb + 1_500_000L) true
          else if (l1 < bb + 400_000L) false
          else state.getOrElse(src, false)
        state += (src -> next); (src, next)
      }.toMap
    }
    (0L to 3L).foreach { b =>
      val got = alertsOf(b).map(t => t._1 -> t._3).toMap
      assert(got == expect(b.toInt), s"batch $b: $got != fold ${expect(b.toInt)}")
    }
    // semantics worth pinning: the alien crawl fires the moment it appears
    // (its vocabulary is pure drift), and the steady source never does
    assert(alertsOf(1L).collect { case ("alien", _, al) => al }.toSeq == Seq(true))
    assert((0L to 3L).forall(b =>
      alertsOf(b).collect { case ("web", _, al) => al }.forall(!_)))
    // crash-after-commit replay of the last batch: byte-idempotent
    val before = alertsOf(3L)
    run(3L)
    assert(alertsOf(3L).toSeq == before.toSeq, "replay changed the alert output")
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
