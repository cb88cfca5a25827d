package graft.sources

import java.util
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 head-bytes binary scan —
  * `spark.read.format("binary-head").option("head", n).load(glob)`
  * yields `(path STRING, length LONG, head BINARY)` where `head` is the
  * FIRST min(n, length) bytes of each file, read with a bounded
  * `read(...)` loop and closed immediately.
  *
  * This is the metadata-ingest answer to the scale defect in riding
  * `binaryFile` for header-only parsing: that source materializes every
  * blob's ENTIRE `content` column, so a container-header scan over
  * 100 TB of video reads ~100 TB to use a few MB. Here the per-file I/O
  * is capped at `head` bytes (default 64 KiB) regardless of blob size —
  * the dominant cost becomes the file-open round-trip, which is the
  * floor any per-file metadata pass pays.
  *
  * Scale design, mirroring the [[SynthSource]] DSv2 patterns:
  *  - column pruning is pushed INTO the reader
  *    (`SupportsPushDownRequiredColumns`): a scan that only references
  *    `path`/`length` — a count, an extension histogram, a partition
  *    listing — never OPENS a single file; the listing alone answers it;
  *  - the driver plans size-striped splits: files are sorted by length
  *    descending and dealt round-robin across `partitions` splits, so a
  *    few huge blobs cannot skew one task while the long tail idles;
  *  - rows depend only on the listing, so the scan is deterministic for
  *    a fixed directory state.
  *
  * Executor-side filesystem access uses the DRIVER's session Hadoop
  * configuration, shipped once per scan as a broadcast
  * `SerializableConfiguration` in the reader factory — so credentials /
  * fs.* settings configured on the session reach the executors, the
  * cluster-correct seam (a fresh executor-side `Configuration` would
  * only cover default `file:`-scheme paths).
  *
  * Listing scales past the driver: the glob itself is one driver-side
  * metadata call, but when it matches many DIRECTORIES (the
  * 100M-file layout is prefix-sharded dirs), the one-level expansion
  * of those directories fans out to executors — per-prefix `listStatus`
  * calls in parallel, results collected as (path, length) pairs (tens
  * of bytes per file, the listing a driver must hold to plan splits
  * regardless). `distributedListingDirs` (default 4) sets the
  * fan-out threshold; small scans keep the zero-overhead driver loop.
  *
  * Reference analogue: the upload loaders at
  * `/root/reference/utils.py:11-19` read whole files because they run
  * per-upload on one machine; at the contract's 100 TB design point the
  * same file→typed-rows capability must be a bounded-read scan.
  */
class BinaryHeadSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "binary-head"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BinaryHeadSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new BinaryHeadTable(
      path = Option(properties.get("path")).getOrElse(
        throw new IllegalArgumentException("binary-head: missing path")),
      headBytes = Option(properties.get("head")).map(_.toInt).getOrElse(65536),
      partitions = Option(properties.get("partitions")).map(_.toInt).getOrElse(32),
      distListDirs = Option(properties.get("distributedListingDirs"))
        .map(_.toInt).getOrElse(4))
}

object BinaryHeadSource {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("length", LongType, nullable = false),
    StructField("head", BinaryType, nullable = true)))

  /** Listing: glob expansion (one driver metadata call), directories
    * expanded one level (non-recursive, like `binaryFile` given a
    * dir-slash-star glob), hidden files skipped. When the glob matches
    * at least `distListDirs` directories, their expansion fans out to
    * executors (per-prefix `listStatus` in parallel) — the
    * prefix-sharded-bucket layout where a driver-only loop serializes
    * millions of RPC round-trips. Output is sorted, so both paths
    * yield the identical listing.
    */
  private[graft] def listFiles(path: String, conf: Configuration,
      distListDirs: Int = 4): Seq[(String, Long)] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val matched: Array[FileStatus] =
      Option(fs.globStatus(p)).getOrElse(Array.empty)
    val (dirs, files) = matched.partition(_.isDirectory)
    val session = org.apache.spark.sql.SparkSession.getActiveSession
    val expanded: Seq[(String, Long)] =
      if (dirs.length >= distListDirs && session.isDefined) {
        val sc = session.get.sparkContext
        val sconf = new org.apache.spark.util.SerializableConfiguration(conf)
        val bc = sc.broadcast(sconf)
        sc.parallelize(dirs.map(_.getPath.toString).toSeq,
            math.min(dirs.length, 64))
          .flatMap { d =>
            val dp = new Path(d)
            dp.getFileSystem(bc.value.value).listStatus(dp)
              .filter(_.isFile).map(st => (st.getPath.toString, st.getLen))
          }
          .collect().toSeq
      } else dirs.toSeq.flatMap(d =>
        fs.listStatus(d.getPath).filter(_.isFile)
          .map(st => (st.getPath.toString, st.getLen)))
    (expanded ++ files.map(st => (st.getPath.toString, st.getLen)))
      .filter { case (pth, _) =>
        val name = pth.substring(pth.lastIndexOf('/') + 1)
        !name.startsWith(".") && !name.startsWith("_")
      }
      .sortBy(_._1)
  }
}

private[sources] class BinaryHeadTable(path: String, headBytes: Int,
    partitions: Int, distListDirs: Int)
    extends Table with SupportsRead {
  override def name(): String = s"binary_head($path)"
  override def schema(): StructType = BinaryHeadSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BinaryHeadScanBuilder(path, headBytes, partitions, distListDirs)
}

private[sources] class BinaryHeadScanBuilder(path: String, headBytes: Int,
    partitions: Int, distListDirs: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = BinaryHeadSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan =
    new BinaryHeadScan(path, headBytes, partitions, distListDirs, required)
}

private[sources] case class BinaryHeadSplit(files: Seq[(String, Long)])
  extends InputPartition

private[sources] class BinaryHeadScan(path: String, headBytes: Int,
    partitions: Int, distListDirs: Int, required: StructType)
    extends Scan with Batch
    with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // the driver's SESSION Hadoop conf: fs.*/credential settings reach
  // the listing AND (via broadcast) the executor-side readers
  private lazy val hadoopConf =
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
  // real statistics from the listing, so Catalyst/AQE can make
  // broadcast decisions against this scan: row count = file count, and
  // sizeInBytes reflects the PRUNED read (min(head, length) per file
  // only when `head` is projected; ~48 B/row of path+length metadata
  // otherwise) — a metadata-only scan of a petabyte directory reports
  // as broadcastable, which is exactly how it behaves
  // one listing per scan, shared by stats + split planning
  private lazy val listed: Seq[(String, Long)] =
    BinaryHeadSource.listFiles(path, hadoopConf, distListDirs)
  override def estimateStatistics(): Statistics = new Statistics {
    private val metaBytes = listed.map(f => 48L + f._1.length).sum
    private val headTotal =
      if (required.fieldNames.contains("head"))
        listed.map(f => math.min(headBytes.toLong, f._2)).sum
      else 0L
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(metaBytes + headTotal)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(listed.size.toLong)
  }
  override def planInputPartitions(): Array[InputPartition] = {
    // greedy longest-processing-time packing on the ACTUAL per-file
    // read cost min(head, length): files sorted by cost descending,
    // each dealt to the currently lightest split — balanced work even
    // when file sizes are wildly skewed (a round-robin deal can leave
    // one split ~2x the lightest on descending size runs)
    val files = listed
      .sortBy { case (p, len) => (-math.min(headBytes.toLong, len), p) }
    if (files.isEmpty) return Array.empty
    val n = math.min(partitions, files.size)
    val buckets = Array.fill(n)(Vector.newBuilder[(String, Long)])
    val loads = new Array[Long](n)
    files.foreach { case f @ (_, len) =>
      var best = 0
      var i = 1
      while (i < n) { if (loads(i) < loads(best)) best = i; i += 1 }
      buckets(best) += f
      loads(best) += math.min(headBytes.toLong, len) + 1 // +1: count ties toward file-count balance
    }
    buckets.map(b => BinaryHeadSplit(b.result()): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory = {
    // ship the driver conf ONCE per scan; each reader rehydrates it
    val bc = org.apache.spark.sql.SparkSession.active.sparkContext
      .broadcast(new org.apache.spark.util.SerializableConfiguration(hadoopConf))
    new BinaryHeadReaderFactory(headBytes, required, bc)
  }
}

private[sources] class BinaryHeadReaderFactory(headBytes: Int,
    required: StructType,
    confBc: org.apache.spark.broadcast.Broadcast[
      org.apache.spark.util.SerializableConfiguration])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val files = p.asInstanceOf[BinaryHeadSplit].files
    new PartitionReader[InternalRow] {
      private val conf = confBc.value.value
      private var i = -1
      override def next(): Boolean = { i += 1; i < files.size }
      override def get(): InternalRow = {
        val (pathStr, len) = files(i)
        val cols: Array[Any] = required.fields.map(_.name match {
          case "path" => UTF8String.fromString(pathStr)
          case "length" => len
          case "head" =>
            // bounded read: min(head, length) bytes then close — the
            // ONLY place file contents are touched; a scan pruned down
            // to path/length never reaches here
            val want = math.min(headBytes.toLong, len).toInt
            val buf = new Array[Byte](want)
            val hp = new Path(pathStr)
            val in = hp.getFileSystem(conf).open(hp)
            try {
              var off = 0
              var eof = false
              while (off < want && !eof) {
                val n = in.read(buf, off, want - off)
                if (n < 0) eof = true else off += n
              }
              MediaIo.recordHead(off)
              if (off == want) buf else java.util.Arrays.copyOf(buf, off)
            } finally in.close()
          case other =>
            throw new IllegalArgumentException(s"unknown column $other")
        })
        InternalRow.fromSeq(cols.toSeq)
      }
      override def close(): Unit = ()
    }
  }
}
