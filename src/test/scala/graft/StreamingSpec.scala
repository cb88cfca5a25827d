package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Batch-vs-stream parity + watermark behavior (SURVEY §5.4 / §7 M5).
  * Streaming has no DuckDB oracle; parity with the oracle-checked batch
  * form is the correctness argument.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val rows = Seq(
    (1L, ts("2024-01-01 00:05:00"), 10.0),
    (2L, ts("2024-01-01 00:55:00"), 20.0),
    (3L, ts("2024-01-01 01:10:00"), 30.0),
    (4L, ts("2024-01-01 02:00:00"), 40.0),
    (5L, ts("2024-01-01 02:59:59"), 50.0))

  test("hourlyStats: stream over MemoryStream equals batch over same rows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val stream = mem.toDF().toDF("event_id", "ts", "value")
    val q = EventStreams.hourlyStatsStream(stream)
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("complete").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("hourly_out")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSet
      val batchRows = EventStreams.hourlyStats(rows.toDF("event_id", "ts", "value"))
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(streamed == batchRows.toSet)
      assert(batchRows.map(_._2).sum == 5)
    } finally q.stop()
  }

  test("watermark drops data later than the horizon (append mode)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val stream = mem.toDF().toDF("event_id", "ts", "value")
    val q = EventStreams.hourlyStatsStream(stream, watermark = "30 minutes")
      .writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts("2024-01-01 00:10:00"), 1.0))
      q.processAllAvailable()
      mem.addData((2L, ts("2024-01-01 03:00:00"), 2.0)) // advances watermark to 02:30
      q.processAllAvailable()
      mem.addData((3L, ts("2024-01-01 00:20:00"), 4.0)) // late beyond watermark → dropped
      q.processAllAvailable()
      mem.addData((4L, ts("2024-01-01 05:00:00"), 8.0)) // closes hour-0 and hour-3 windows
      q.processAllAvailable()
      val out = spark.table("late_out")
        .collect().map(r => r.getTimestamp(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      // hour 00 window emitted with only the on-time row (late row dropped)
      assert(out(ts("2024-01-01 00:00:00")) == ((1L, 1.0)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups repeated event_ids") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val stream = mem.toDF().toDF("event_id", "ts", "value")
    val q = EventStreams.dedupStream(stream)
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts("2024-01-01 00:00:01"), 1.0),
        (1L, ts("2024-01-01 00:00:02"), 1.0),
        (2L, ts("2024-01-01 00:00:03"), 2.0))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)
    } finally q.stop()
  }

  test("stream-stream interval join matches purchases to prior signups") {
    implicit val sqlCtx = spark.sqlContext
    val sm = MemoryStream[(Long, Timestamp, Double)]
    val pm = MemoryStream[(Long, Timestamp, Double)]
    val signups = sm.toDF().toDF("user_id", "ts", "value")
    val purchases = pm.toDF().toDF("user_id", "ts", "value")
    val q = EventStreams.signupToPurchase(signups, purchases)
      .writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      sm.addData((1L, ts("2024-01-01 00:00:00"), 0.0),
        (2L, ts("2024-01-01 00:00:00"), 0.0))
      pm.addData(
        (1L, ts("2024-01-01 00:30:00"), 9.99),  // within 1h of signup → match
        (2L, ts("2024-01-01 02:30:00"), 5.0),   // 2.5h later → no match
        (3L, ts("2024-01-01 00:10:00"), 1.0))   // no signup → no match
      q.processAllAvailable()
      val rows = spark.table("ss_join")
        .collect().map(r => (r.getLong(0), r.getDouble(3))).toSet
      assert(rows == Set((1L, 9.99)))
    } finally q.stop()
  }

  test("stream-static join enriches micro-batches; unknown users keep NULL dim") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "segment")
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val stream = mem.toDF().toDF("user_id", "ts", "value")
    val q = EventStreams.countsByDim(stream, dim, "segment")
      .writeStream.format("memory").queryName("dim_counts")
      .outputMode("complete").start()
    try {
      mem.addData((1L, ts("2024-01-01 00:05:00"), 10.0),
        (1L, ts("2024-01-01 00:06:00"), 5.0),
        (2L, ts("2024-01-01 00:07:00"), 2.0),
        (9L, ts("2024-01-01 00:08:00"), 1.0)) // not in dim → NULL segment
      q.processAllAvailable()
      val out = spark.table("dim_counts")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(out == Set(("gold", 2L, 15.0), ("silver", 1L, 2.0), (null, 1L, 1.0)))
      // batch twin over the same rows must agree
      val batch = EventStreams.countsByDim(
          Seq((1L, ts("2024-01-01 00:05:00"), 10.0),
            (1L, ts("2024-01-01 00:06:00"), 5.0),
            (2L, ts("2024-01-01 00:07:00"), 2.0),
            (9L, ts("2024-01-01 00:08:00"), 1.0)).toDF("user_id", "ts", "value"),
          dim, "segment")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(batch == out)
    } finally q.stop()
  }

  test("anomaly gate: batch moments flag stream outliers; equals batch twin") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import graft.Determinism._
    // offline corpus: tight cluster around 10 → sd small, 100 is >3σ out
    val corpus = (Seq.tabulate(20)(i => ("click", 9.0 + (i % 3))) :+ ("click", 100.0))
      .toDF("event_type", "value")
    // cache: the static side of a stream-static join re-plans per
    // micro-batch — uncached, every batch would re-aggregate the corpus
    val moments = graft.operators.AnomalyGate
      .moments(corpus, "event_type", "value").cache()
    val mem = MemoryStream[(Long, String, Double)]
    val stream = mem.toDF().toDF("event_id", "event_type", "value")
    val q = EventStreams.anomalyGate(stream, moments)
      .writeStream.format("memory").queryName("anomaly_gate")
      .outputMode("append").start()
    try {
      mem.addData((1L, "click", 10.0), (2L, "click", 100.0),
        (3L, "click", 9.5), (4L, "other", 1e9)) // unknown type: no moments → dropped
      q.processAllAvailable()
      val out = spark.table("anomaly_gate").collect().map(_.getLong(0)).toSet
      assert(out == Set(2L), s"expected only the 100.0 outlier, got $out")
      // batch twin over the same rows must agree
      val batch = EventStreams.anomalyGate(
          Seq((1L, "click", 10.0), (2L, "click", 100.0),
            (3L, "click", 9.5), (4L, "other", 1e9))
            .toDF("event_id", "event_type", "value"),
          moments)
        .collect().map(_.getLong(0)).toSet
      assert(batch == out)
    } finally q.stop()
  }

  test("anomaly gate: zero-variance (constant) group never flags") {
    import org.apache.spark.sql.functions._
    // all values equal → σ=0 → no row deviates; without the positive-
    // variance guard, double rounding of S and Q can flip the inequality
    // and flag EVERY row of the constant group. 0.1 is the classic
    // non-representable double that makes the rounding bite.
    val const = Seq.fill(7)(("flat", 0.1)) ++ Seq.fill(3)(("flat", 0.1))
    val corpus = const.toDF("event_type", "value")
    val moments = graft.operators.AnomalyGate
      .moments(corpus, "event_type", "value")
    val flagged = graft.operators.AnomalyGate
      .gate(corpus.withColumn("event_id", monotonically_increasing_id()),
        moments, "event_type", "value")
      .count()
    assert(flagged == 0L)
  }

  test("C14 feedback post-process trims and falls back") {
    import graft.operators.ScoreParser
    val out = Seq(Some("  good resume  "), Some(""), None)
      .toDF("resp")
      .select(ScoreParser.feedback(col("resp")))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("good resume",
      "Could not extract feedback.", "Could not extract feedback."))
  }

  test("flatMapGroupsWithState accumulates per-user state across micro-batches") {
    import graft.streaming.Stateful
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val events = mem.toDS().map { case (u, v) => Stateful.UserEvent(u, v) }(
      Stateful.eventEnc)
    val q = Stateful.runningUserStats(events)
      .writeStream.format("memory").queryName("state_out")
      .outputMode("append").start()
    try {
      mem.addData((1L, 10.0), (1L, 5.0), (2L, 1.0))
      q.processAllAvailable()
      mem.addData((1L, 1.0)) // second micro-batch: state must carry
      q.processAllAvailable()
      val rows = spark.table("state_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains((1L, 2L, 15.0))) // after batch 1
      assert(rows.contains((1L, 3L, 16.0))) // after batch 2 — accumulated
      assert(rows.contains((2L, 1L, 1.0)))
    } finally q.stop()
  }

  test("transformWithState firstSeen: dedups in-batch and across micro-batches") {
    import graft.streaming.Stateful
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // state-store partition count is fixed at query start = shuffle
    // partitions; one native RocksDB instance per partition per batch is
    // the whole cost here, so keep it tiny for the fixture
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    val mem = MemoryStream[(Long, Long)]
    val docs = mem.toDS().map { case (fp, id) => Stateful.FpDoc(fp, id) }(
      Stateful.fpDocEnc)
    val q = Stateful.firstSeen(docs)
      .writeStream.format("memory").queryName("first_seen_out")
      .outputMode("append").start()
    try {
      mem.addData((10L, 1L), (10L, 2L), (20L, 3L)) // in-batch dup of fp 10
      q.processAllAvailable()
      mem.addData((10L, 4L), (30L, 5L)) // cross-batch dup of fp 10
      q.processAllAvailable()
      val rows = spark.table("first_seen_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((10L, 1L), (20L, 3L), (30L, 5L)))
    } finally {
      q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("userSessionsStream: late events merge in-watermark, drop beyond; equals batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val stream = mem.toDF().toDF("user_id", "ts", "value")
    val q = EventStreams.userSessionsStream(stream, gap = "30 minutes", watermark = "1 hour")
      .writeStream.format("memory").queryName("sess_stream_out")
      .outputMode("append").start()
    try {
      mem.addData(
        (7L, ts("2024-01-01 00:00:00"), 1.0),
        (7L, ts("2024-01-01 00:10:00"), 2.0),
        (8L, ts("2024-01-01 00:05:00"), 5.0))
      q.processAllAvailable()
      // arrives a micro-batch later but within the watermark: must MERGE
      // into user 7's open session, not start a new one
      mem.addData((7L, ts("2024-01-01 00:25:00"), 3.0))
      q.processAllAvailable()
      // far-future event pushes the watermark past both session ends,
      // closing and emitting them
      mem.addData((9L, ts("2024-01-02 00:00:00"), 0.0))
      q.processAllAvailable()
      // now BEYOND the watermark (2024-01-01 23:00): must be dropped, not
      // resurrect user 8's already-emitted session
      mem.addData((8L, ts("2024-01-01 00:40:00"), 99.0))
      q.processAllAvailable()
      val streamed = spark.table("sess_stream_out").collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSet
      // batch twin over exactly the accepted rows (user 9's session is
      // still open in the stream, so it is not in the append output)
      val accepted = Seq(
        (7L, ts("2024-01-01 00:00:00"), 1.0),
        (7L, ts("2024-01-01 00:10:00"), 2.0),
        (8L, ts("2024-01-01 00:05:00"), 5.0),
        (7L, ts("2024-01-01 00:25:00"), 3.0))
      val batch = EventStreams.userSessions(accepted.toDF("user_id", "ts", "value"))
        .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSet
      assert(streamed == batch)
      assert(streamed.exists { case (_, _, u, n, v) => u == 7L && n == 3L && v == 6.0 })
    } finally q.stop()
  }

  test("session windows split on inactivity gap (batch form)") {
    val events = Seq(
      (7L, ts("2024-01-01 00:00:00"), 1.0),
      (7L, ts("2024-01-01 00:10:00"), 1.0), // same session (gap 30m)
      (7L, ts("2024-01-01 01:30:00"), 1.0)  // new session
    ).toDF("user_id", "ts", "value")
    val sessions = EventStreams.userSessions(events.withColumn("user_id", col("user_id")))
      .collect()
    assert(sessions.length == 2)
    assert(sessions.map(_.getLong(3)).sorted.toSeq == Seq(1L, 2L))
  }

  test("curateDocs: streaming dedup+gate equals the batch twin") {
    import graft.streaming.DocStreams
    implicit val sqlCtx = spark.sqlContext
    // en/high-quality texts (pass the gate) and a Spanish one (gated out);
    // doc 3 duplicates doc 1's text and must be dropped by fingerprint.
    // Arrival order equals (ts, doc_id) order so the stream's
    // first-arrival-wins dedup coincides with the batch twin's
    // earliest-(ts, doc_id) rule.
    // ≥100 tokens so the length term of the quality score saturates
    val en = "the quick brown fox jumps over the lazy dog and the cat " * 10
    val es = "el perro y el gato que corren en la casa de la abuela " * 10
    val docs = Seq(
      (ts("2024-01-01 00:00:00"), 1L, en),
      (ts("2024-01-01 00:10:00"), 2L, en + "extra tail tokens here"),
      (ts("2024-01-01 00:20:00"), 3L, en),           // dup of doc 1
      (ts("2024-01-01 00:30:00"), 4L, es))           // gated out (lang)
    val mem = MemoryStream[(Timestamp, Long, String)]
    val q = DocStreams.curateDocs(mem.toDF().toDF("ts", "doc_id", "text"))
      .writeStream.format("memory").queryName("curated_docs")
      .outputMode("append").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      mem.addData((ts("2024-01-01 03:00:00"), 9L, "watermark advancer " * 20))
      q.processAllAvailable()
      val streamed = spark.table("curated_docs")
        .collect().map(_.getLong(1)).toSet
      val batch = DocStreams.curateDocsBatch(docs.toDF("ts", "doc_id", "text"))
        .collect().map(_.getLong(1)).toSet
      assert(streamed.intersect(Set(1L, 2L, 3L, 4L)) == batch)
      assert(batch == Set(1L, 2L))
    } finally q.stop()
  }

  test("curateDocs: kill/restart between waves keeps fingerprint state (restart-equivalence)") {
    // DedupStream's wave-restart shape applied to DocStreams: one source
    // whose offsets continue across restarts, a FRESH query per wave on
    // the same checkpoint, and the cumulative output must equal the
    // batch twin over all rows seen — i.e. the dropDuplicatesWithin-
    // Watermark state store survives the restart.
    import graft.streaming.{DocStreams, Sinks}
    implicit val sqlCtx = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("graft_dcs_out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft_dcs_ck").toString
    val en = "the quick brown fox jumps over the lazy dog and the cat " * 10
    val en2 = "a completely different english document about rivers and streams " * 10
    val mem = MemoryStream[(Timestamp, Long, String)]
    def runWave(rows: Seq[(Timestamp, Long, String)]): Unit = {
      val q = Sinks.idempotentParquet(
        DocStreams.curateDocs(mem.toDF().toDF("ts", "doc_id", "text")), outDir, ckDir)
      try { mem.addData(rows: _*); q.processAllAvailable() } finally q.stop()
    }
    val wave1 = Seq((ts("2024-01-01 00:00:00"), 1L, en),
      (ts("2024-01-01 00:10:00"), 2L, en2))
    // wave 2 AFTER the kill: doc 3 duplicates doc 1 from before the
    // restart (within watermark) and must be dropped by recovered state
    val wave2 = Seq((ts("2024-01-01 00:20:00"), 3L, en),
      (ts("2024-01-01 00:30:00"), 4L, en2 + "extra tail tokens here"))
    runWave(wave1)
    runWave(wave2)
    val got = spark.read.parquet(outDir).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(got.length == got.distinct.length, "restart re-emitted rows")
    val batch = DocStreams.curateDocsBatch((wave1 ++ wave2).toDF("ts", "doc_id", "text"))
      .collect().map(_.getLong(1)).toSet
    assert(got.toSet == batch)
    assert(got.toSet == Set(1L, 2L, 4L))
  }

  test("file-source curate + idempotent sink: kill, forced replay, restart is exactly-once") {
    import graft.streaming.{DocStreams, Sinks}
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val srcDir = Files.createTempDirectory("graft_fsrc").toString
    val outDir = Files.createTempDirectory("graft_fout").toString
    val ckDir = Files.createTempDirectory("graft_fck").toString
    val en = "the quick brown fox jumps over the lazy dog and the cat " * 10
    val en2 = "a completely different english document about rivers and streams " * 10
    val es = "el perro y el gato que corren en la casa de la abuela " * 10
    def wave(name: String, rows: Seq[(String, Long, String)]): Unit =
      Files.write(Paths.get(srcDir, name), rows.map { case (t, id, x) =>
        s"""{"ts":"$t","doc_id":$id,"text":"$x"}"""
      }.asJava)
    def start() = Sinks.idempotentParquet(
      DocStreams.curateDocs(spark.readStream
        .schema("ts TIMESTAMP, doc_id LONG, text STRING").json(srcDir)),
      outDir, ckDir)
    // wave 1: two distinct en docs, an exact dup, a Spanish doc
    wave("w1.json", Seq(("2024-01-01T00:00:00", 1L, en),
      ("2024-01-01T00:10:00", 2L, en + "extra tail tokens here"),
      ("2024-01-01T00:20:00", 3L, en), ("2024-01-01T00:30:00", 4L, es)))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop() // kill mid-stream
    // simulate crash-BEFORE-commit: drop the newest commit marker so the
    // restarted query must REPLAY that batch against the same sink dir
    val commits = Paths.get(ckDir, "commits")
    val latest = Files.list(commits).iterator().asScala
      .filter(p => p.getFileName.toString.forall(_.isDigit))
      .maxBy(_.getFileName.toString.toLong)
    Files.delete(latest)
    // also the local-FS checksum sibling: a stale .crc makes the replayed
    // commit write fail and masquerade as a concurrent-query conflict
    Files.deleteIfExists(
      commits.resolve("." + latest.getFileName.toString + ".crc"))
    // wave 2: a late duplicate of doc 1 (state must survive the restart)
    // and one genuinely new doc
    wave("w2.json", Seq(("2024-01-01T00:40:00", 5L, en),
      ("2024-01-01T00:50:00", 6L, en2)))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(outDir).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    // exactly-once: the replayed batch overwrote itself, the dedup state
    // survived the restart, and the result equals the batch twin's
    assert(got.sorted == Seq(1L, 2L, 6L), s"got $got")
    val batchTwin = DocStreams.curateDocsBatch(
      Seq((ts("2024-01-01 00:00:00"), 1L, en),
        (ts("2024-01-01 00:10:00"), 2L, en + "extra tail tokens here"),
        (ts("2024-01-01 00:20:00"), 3L, en), (ts("2024-01-01 00:30:00"), 4L, es),
        (ts("2024-01-01 00:40:00"), 5L, en), (ts("2024-01-01 00:50:00"), 6L, en2))
        .toDF("ts", "doc_id", "text"))
      .collect().map(_.getLong(1)).toSet
    assert(got.toSet == batchTwin)
  }

  test("idempotent foreachBatch sink: replayed batch overwrites, not appends") {
    import graft.streaming.Sinks
    implicit val sqlCtx = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("graft_sink_out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft_sink_ck").toString
    val mem = MemoryStream[(Long, Double)]
    val q = Sinks.idempotentParquet(mem.toDF().toDF("id", "v"), outDir, ckDir)
    try {
      mem.addData((1L, 1.0), (2L, 2.0))
      q.processAllAvailable()
      mem.addData((3L, 3.0))
      q.processAllAvailable()
      val all = spark.read.parquet(outDir)
      assert(all.count() == 3)
      assert(all.columns.contains("batch_id"))
      // simulate a replay of batch 0 after failure: same id, same rows
      val replay = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
      Sinks.writeBatchIdempotent(replay, 0L, outDir)
      Sinks.writeBatchIdempotent(replay, 0L, outDir)
      assert(spark.read.parquet(outDir).count() == 3) // no duplicates
    } finally q.stop()
  }
}
