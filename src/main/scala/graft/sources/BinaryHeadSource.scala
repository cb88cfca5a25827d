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
  * Executor-side filesystem access re-derives a fresh Hadoop
  * `Configuration` (defaults cover `file:`-scheme paths, which is what
  * this single-JVM harness exercises); a cluster deployment would ship
  * the driver conf via a broadcast `SerializableConfiguration` in the
  * reader factory — the only seam that changes.
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
      partitions = Option(properties.get("partitions")).map(_.toInt).getOrElse(32))
}

object BinaryHeadSource {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("length", LongType, nullable = false),
    StructField("head", BinaryType, nullable = true)))

  /** Driver-side listing: glob expansion, directories expanded one
    * level (non-recursive, like `binaryFile` given a dir-slash-star
    * glob), hidden files skipped.
    */
  private[graft] def listFiles(path: String): Seq[(String, Long)] = {
    val conf = new Configuration()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val matched: Array[FileStatus] =
      Option(fs.globStatus(p)).getOrElse(Array.empty)
    matched.flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).filter(_.isFile)
      else Array(st)
    }.filter(st => !st.getPath.getName.startsWith(".") &&
        !st.getPath.getName.startsWith("_"))
      .map(st => (st.getPath.toString, st.getLen)).toSeq
  }
}

private[sources] class BinaryHeadTable(path: String, headBytes: Int, partitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"binary_head($path)"
  override def schema(): StructType = BinaryHeadSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BinaryHeadScanBuilder(path, headBytes, partitions)
}

private[sources] class BinaryHeadScanBuilder(path: String, headBytes: Int,
    partitions: Int) extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = BinaryHeadSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new BinaryHeadScan(path, headBytes, partitions, required)
}

private[sources] case class BinaryHeadSplit(files: Seq[(String, Long)])
  extends InputPartition

private[sources] class BinaryHeadScan(path: String, headBytes: Int,
    partitions: Int, required: StructType) extends Scan with Batch
    with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // real statistics from the driver listing, so Catalyst/AQE can make
  // broadcast decisions against this scan: row count = file count, and
  // sizeInBytes reflects the PRUNED read (min(head, length) per file
  // only when `head` is projected; ~48 B/row of path+length metadata
  // otherwise) — a metadata-only scan of a petabyte directory reports
  // as broadcastable, which is exactly how it behaves
  // one driver-side listing per scan, shared by stats + split planning
  private lazy val listed: Seq[(String, Long)] = BinaryHeadSource.listFiles(path)
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
  override def createReaderFactory(): PartitionReaderFactory =
    new BinaryHeadReaderFactory(headBytes, required)
}

private[sources] class BinaryHeadReaderFactory(headBytes: Int, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val files = p.asInstanceOf[BinaryHeadSplit].files
    new PartitionReader[InternalRow] {
      private val conf = new Configuration()
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
