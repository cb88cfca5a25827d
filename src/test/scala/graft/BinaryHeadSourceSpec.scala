package graft

import graft.sources.{BinaryHeadSource, MediaCorpus, Multimodal}
import org.apache.hadoop.fs.FileSystem
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The head-bytes DSv2 scan: bounded per-file reads (the 100 TB
  * metadata-ingest fix over `binaryFile`'s full-blob materialization),
  * column pruning that skips file opens entirely, and metadata parity
  * with the full-read media path on the fixture corpus.
  */
class BinaryHeadSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Sum of bytesRead across all Hadoop FileSystem statistics in this
    * JVM (local mode: driver + executors share it). Coarse — other
    * concurrently-running suites add reads — so assertions compare
    * against margins far wider than any sibling suite's I/O.
    */
  private def fsBytesRead(): Long = {
    import scala.jdk.CollectionConverters._
    FileSystem.getGlobalStorageStatistics.iterator().asScala
      .flatMap(s => Option(s.getLong("bytesRead")).map(_.longValue()))
      .sum
  }

  private def bigFileDir(): (String, String, Long) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_head_big")
    // a 64 MiB "PNG": valid signature + IHDR prefix (enough for
    // imageDims), then zero padding — the header parser never needs
    // the tail, and the head scan must never read it
    val out = new java.io.FileOutputStream(dir.resolve("huge.png").toFile)
    val ihdr = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x04, 0x00, // width 1024
      0, 0, 0x02, 0x00, // height 512
      8, 2, 0, 0, 0)
    out.write(ihdr)
    val zeros = new Array[Byte](1 << 20)
    (0 until 64).foreach(_ => out.write(zeros))
    out.close()
    val f = dir.resolve("huge.png").toFile
    (dir.toString, f.getPath, f.length())
  }

  test("head column holds exactly min(head, length) leading bytes") {
    val (dir, _, len) = bigFileDir()
    val rows = spark.read.format("binary-head").option("head", 65536)
      .load(dir + "/*").collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[Long]("length") == len)
    val head = r.getAs[Array[Byte]]("head")
    assert(head.length == 65536, "head must be truncated to the cap")
    assert(head(1) == 'P' && head(2) == 'N' && head(3) == 'G')
    // and a file smaller than the cap arrives whole
    val mediaDir = MediaCorpus.ensure()
    val small = spark.read.format("binary-head").option("head", 1 << 20)
      .load(mediaDir + "/photo.png")
      .select(col("head"), col("length")).head()
    assert(small.getAs[Array[Byte]]("head").length == small.getAs[Long]("length"))
  }

  test("bytes read from disk stay near the head cap, far below file size") {
    val (dir, _, len) = bigFileDir()
    val before = fsBytesRead()
    val metas = spark.read.format("binary-head").option("head", 65536)
      .load(dir + "/*")
      .select(col("path"), col("length"), col("head")).collect()
    val delta = fsBytesRead() - before
    assert(metas.length == 1)
    // 64 MiB file; a full-blob scan would push delta past len. Allow a
    // generous 8 MiB for buffer readahead + sibling-suite noise.
    assert(delta < len / 8,
      s"head scan read $delta bytes of a $len-byte file — not bounded")
  }

  test("pruned scan (path/length only) opens no files at all") {
    val (dir, _, _) = bigFileDir()
    val df = spark.read.format("binary-head").option("head", 65536)
      .load(dir + "/*").select(col("path"), col("length"))
    val before = fsBytesRead()
    val n = df.collect().length
    val delta = fsBytesRead() - before
    assert(n == 1)
    // listing metadata only: no open() should occur, so any delta here
    // is sibling-suite noise — bound it well under the head cap itself
    assert(delta < 65536, s"pruned scan still read $delta bytes")
  }

  test("greedy planning balances skewed file sizes across splits") {
    // 1 big + many small files in one dir; cap ABOVE all sizes so cost
    // = length. Greedy LPT must land max/min split cost within 2x even
    // though one file is 10x every other.
    val dir = java.nio.file.Files.createTempDirectory("graft_head_skew")
    java.nio.file.Files.write(dir.resolve("big.bin"), new Array[Byte](10000))
    (0 until 9).foreach(i =>
      java.nio.file.Files.write(dir.resolve(f"s$i.bin"), new Array[Byte](1000)))
    val df = spark.read.format("binary-head")
      .option("head", 1 << 20).option("partitions", 3).load(dir.toString + "/*")
    // packing follows the PRUNED read cost, so the scan must actually
    // read heads for size-based LPT to apply (a path/length-only scan
    // correctly packs by file count instead)
    val perPart = df.select(spark_partition_id().as("pid"), col("length"),
        octet_length(col("head")).as("hb"))
      .groupBy("pid").agg(sum("length").as("bytes"), sum("hb")).collect()
      .map(_.getAs[Long]("bytes"))
    assert(perPart.length == 3)
    // LPT isolates the dominant file (its split gets nothing else — the
    // makespan lower bound) and deals the small tail evenly elsewhere
    val sorted = perPart.sorted.toSeq
    assert(sorted.last == 10000L, s"big file not isolated: ${perPart.toSeq}")
    assert(sorted(1) - sorted(0) <= 1000L, s"small tail unbalanced: ${perPart.toSeq}")
    assert(perPart.sum == 19000L)
  }

  test("tail option adds a bounded tail column: exactly the last " +
    "min(tail, length) bytes, pruned like head") {
    val dir = java.nio.file.Files.createTempDirectory("graft_head_tail")
    val bytes = Array.tabulate(10000)(i => (i * 13 + 5).toByte)
    java.nio.file.Files.write(dir.resolve("blob.bin"), bytes)
    java.nio.file.Files.write(dir.resolve("tiny.bin"), bytes.take(50))
    val rows = spark.read.format("binary-head")
      .option("head", 128).option("tail", 256)
      .load(dir.toString + "/*").collect()
      .map(r => (r.getAs[String]("path").split('/').last,
        r.getAs[Array[Byte]]("head").toSeq, r.getAs[Array[Byte]]("tail").toSeq))
      .sortBy(_._1).toSeq
    assert(rows.map(_._1) == Seq("blob.bin", "tiny.bin"))
    assert(rows(0)._2 == bytes.take(128).toSeq)
    assert(rows(0)._3 == bytes.takeRight(256).toSeq)
    // a file smaller than both caps arrives whole in both columns
    assert(rows(1)._2 == bytes.take(50).toSeq)
    assert(rows(1)._3 == bytes.take(50).toSeq)
    // without the option the schema stays the classic 3 columns
    val classic = spark.read.format("binary-head").option("head", 128)
      .load(dir.toString + "/*")
    assert(classic.schema.fieldNames.toSeq == Seq("path", "length", "head"))
  }

  test("sharded dir-stripe planning yields identical rows to the exact " +
    "per-file mode, and a huge dir splits across partitions") {
    val base = java.nio.file.Files.createTempDirectory("graft_head_stripe")
    // one HUGE shard (40 files) among small ones: the stripe planner
    // must split it instead of serializing it into one task
    (0 until 6).foreach { d =>
      val sub = base.resolve(f"shard=$d%02d")
      java.nio.file.Files.createDirectories(sub)
      val n = if (d == 0) 40 else 3
      (0 until n).foreach { i =>
        java.nio.file.Files.write(sub.resolve(f"f$i%02d.bin"),
          Array.tabulate(100 + d + i)(j => (j * 7 + d).toByte))
      }
    }
    def scan(thresh: Int) = spark.read.format("binary-head")
      .option("head", 64).option("partitions", 8)
      .option("distributedListingDirs", thresh)
      .load(base.toString + "/*")
    val striped = scan(4)   // 6 dirs >= 4 → dir-stripe mode
    val exact = scan(100)   // driver loop → exact per-file mode
    def rowsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("path"), r.getAs[Long]("length"),
        r.getAs[Array[Byte]]("head").toSeq)).toSet
    assert(rowsOf(striped) == rowsOf(exact))
    assert(rowsOf(striped).size == 55)
    // the dominant shard's rows must span more than one partition
    val hugePerPart = striped
      .where(col("path").contains("shard=00"))
      .select(spark_partition_id().as("pid"))
      .distinct().count()
    assert(hugePerPart > 1,
      s"the 40-file shard should stripe across partitions, got $hugePerPart")
  }

  test("zero-byte files survive the head scan (binaryFile drops them)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_head_zero")
    java.nio.file.Files.write(dir.resolve("empty.bin"), Array.emptyByteArray)
    java.nio.file.Files.write(dir.resolve("one.bin"), Array[Byte](42))
    val rows = spark.read.format("binary-head").option("head", 1024)
      .load(dir.toString + "/*").collect()
      .map(r => (r.getAs[String]("path").split('/').last,
        r.getAs[Long]("length"), r.getAs[Array[Byte]]("head").length))
      .sortBy(_._1).toSeq
    assert(rows == Seq(("empty.bin", 0L, 0), ("one.bin", 1L, 1)))
    // contrast: the built-in full-read source plans the empty file away
    val full = spark.read.format("binaryFile").load(dir.toString + "/*").count()
    assert(full == 1L, "binaryFile keeps empty files now — revisit junk.xyz fixture note")
  }

  test("listFiles skips hidden/marker files and expands one dir level") {
    val dir = java.nio.file.Files.createTempDirectory("graft_head_list")
    java.nio.file.Files.write(dir.resolve("a.bin"), Array[Byte](1, 2))
    java.nio.file.Files.write(dir.resolve("_MARKER"), Array[Byte](1))
    java.nio.file.Files.write(dir.resolve(".hidden"), Array[Byte](1))
    val conf = new org.apache.hadoop.conf.Configuration()
    val listed = BinaryHeadSource.listFiles(dir.toString + "/*", conf)
      .map(_._1.split('/').last)
    assert(listed == Seq("a.bin"))
    val viaDir = BinaryHeadSource.listFiles(dir.toString, conf)
      .map(_._1.split('/').last)
    assert(viaDir == Seq("a.bin"))
  }

  test("distributed listing over a many-subdir corpus equals the driver " +
    "loop and the scan reads every file once") {
    val base = java.nio.file.Files.createTempDirectory("graft_head_shard")
    (0 until 12).foreach { d =>
      val sub = base.resolve(f"shard=$d%02d")
      java.nio.file.Files.createDirectories(sub)
      (0 until 5).foreach { i =>
        java.nio.file.Files.write(sub.resolve(f"f$i%02d.bin"),
          Array.tabulate(16 + d + i)(j => (j + d).toByte))
      }
      // hidden/marker junk must be skipped on executors too
      java.nio.file.Files.write(sub.resolve("_MARKER"), Array[Byte](1))
    }
    val conf = spark.sessionState.newHadoopConf()
    // 12 matched dirs >= threshold 4 → executor fan-out; threshold 100
    // → the driver loop; identical sorted listings
    val dist = BinaryHeadSource.listFiles(base.toString + "/*", conf, 4)
    val local = BinaryHeadSource.listFiles(base.toString + "/*", conf, 100)
    assert(dist == local)
    assert(dist.size == 60)
    // the scan itself over the sharded layout: one row per file, head
    // bytes faithful (drives the broadcast-conf reader path end to end)
    val rows = spark.read.format("binary-head").option("head", 8)
      .load(base.toString + "/*").collect()
      .map(r => (r.getAs[String]("path").split('/').takeRight(2).mkString("/"),
        r.getAs[Long]("length"), r.getAs[Array[Byte]]("head").toSeq))
    assert(rows.length == 60)
    val d3f2 = rows.find(_._1 == "shard=03/f02.bin").get
    assert(d3f2._2 == 21L)
    assert(d3f2._3 == (0 until 8).map(j => (j + 3).toByte).toSeq)
  }

  test("reported statistics reflect the pruned read, not blob sizes") {
    val (dir, _, len) = bigFileDir()
    def stats(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val relation = df.queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
      }.get
      val s = relation.scan.asInstanceOf[
        org.apache.spark.sql.connector.read.SupportsReportStatistics]
        .estimateStatistics()
      (s.numRows().getAsLong, s.sizeInBytes().getAsLong)
    }
    val full = spark.read.format("binary-head").option("head", 65536)
      .load(dir + "/*")
    val (rows, size) = stats(full.select(col("path"), col("length"), col("head")))
    assert(rows == 1L)
    assert(size >= 65536L && size < 2L * 65536,
      s"head-projected size should be ~the cap, got $size (file is $len)")
    val (rows2, size2) = stats(full.select(col("path"), col("length")))
    assert(rows2 == 1L)
    // pruned scan: metadata-only estimate, far under the cap — this is
    // what lets Catalyst broadcast a listing join over huge blob dirs
    assert(size2 < 4096L, s"pruned size should be metadata-only, got $size2")
  }

  test("head scan yields identical media metadata to the full-read scan") {
    val dir = MediaCorpus.ensure()
    val full = queries.Media.ingestRows(
      Multimodal.fromBinaryFiles(spark, dir + "/*")).collect().toSeq
    val head = queries.Media.ingestRows(
      Multimodal.fromBinaryFilesHead(spark, dir + "/*")).collect().toSeq
    assert(head == full)
    assert(head.nonEmpty)
  }

  test("tail-projected statistics count the bounded tail term; packing " +
    "costs follow the pruned schema") {
    val (dir, _, len) = bigFileDir()
    def stats(df: org.apache.spark.sql.DataFrame): Long = {
      val relation = df.queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
      }.get
      relation.scan.asInstanceOf[
        org.apache.spark.sql.connector.read.SupportsReportStatistics]
        .estimateStatistics().sizeInBytes().getAsLong
    }
    val scan = spark.read.format("binary-head")
      .option("head", 65536).option("tail", 32768).load(dir + "/*")
    // head+tail projected: both bounded terms count
    val both = stats(scan.select(col("path"), col("head"), col("tail")))
    assert(both >= 65536L + 32768L && both < 2L * (65536 + 32768),
      s"head+tail size should be ~the two caps, got $both (file is $len)")
    // only the tail projected: the head term must NOT inflate the scan
    val tailOnly = stats(scan.select(col("path"), col("tail")))
    assert(tailOnly >= 32768L && tailOnly < 2L * 32768,
      s"tail-only size should be ~the tail cap, got $tailOnly")
    // neither projected: metadata only
    assert(stats(scan.select(col("path"))) < 4096L)
  }

  test("dir-stripe reader fails loudly when the directory changes " +
    "between split planning and reading") {
    val base = java.nio.file.Files.createTempDirectory("graft_head_fp")
    (0 until 3).foreach { d =>
      val sub = base.resolve(s"shard=$d")
      java.nio.file.Files.createDirectories(sub)
      (0 until 4).foreach { i =>
        java.nio.file.Files.write(sub.resolve(s"f$i.bin"),
          Array.tabulate(64)(j => (j + d + i).toByte))
      }
    }
    val df = spark.read.format("binary-head").option("head", 64)
      .option("distributedListingDirs", 2) // 3 dirs -> stripe mode
      .load(base.toString + "/*")
    // force split planning NOW (listing fingerprints captured)...
    val rdd = df.queryExecution.toRdd
    assert(rdd.partitions.nonEmpty)
    // ...then mutate one directory before the read executes
    java.nio.file.Files.write(base.resolve("shard=1").resolve("late.bin"),
      Array[Byte](1, 2, 3))
    val e = intercept[org.apache.spark.SparkException] { rdd.count() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("changed between split planning")),
      s"expected the fingerprint mismatch error, got: ${messages(e)}")
    // a fresh scan over the settled directory state works again
    val again = spark.read.format("binary-head").option("head", 64)
      .option("distributedListingDirs", 2)
      .load(base.toString + "/*")
    assert(again.count() == 13L)
  }
}
