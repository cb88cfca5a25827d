package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 synthetic-corpus generator —
  * `spark.read.format("graft-synth").option("rows", n)` yields a
  * deterministic `documents`-shaped table (doc_id, text, source) with no
  * input files at all: each of `partitions` input splits generates its
  * own doc_id range executor-side, so a 10^12-row benchmark corpus
  * "reads" with zero I/O and perfect parallelism. Rows depend only on
  * (seed, doc_id) — the same table contents on every run, every
  * partitioning, every cluster size.
  *
  * Column pruning is pushed INTO generation
  * (SupportsPushDownRequiredColumns): a `count(*)` or doc_id-only scan
  * never synthesizes text — the same contract a parquet scan honors via
  * ReadSchema, honored here by the generator itself.
  */
class SynthSource extends TableProvider with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-synth"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SynthSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthTable(
      rows = Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      partitions = Option(properties.get("partitions")).map(_.toInt).getOrElse(8),
      seed = Option(properties.get("seed")).map(_.toLong).getOrElse(42L))
}

object SynthSource {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("source", StringType, nullable = false)))

  private val vocab: Array[String] = Array(
    "scan", "filter", "join", "hash", "merge", "sort", "shuffle", "batch",
    "row", "column", "vector", "index", "probe", "build", "spill", "page")

  /** splitmix64 — the standard 64-bit finalizer; full avalanche, cheap. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def textOf(seed: Long, id: Long): String = {
    val h = mix(seed ^ id)
    val n = 8 + (Math.floorMod(h, 25L)).toInt // 8..32 tokens
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(vocab(Math.floorMod(mix(h + i), vocab.length.toLong).toInt))
      i += 1
    }
    sb.toString
  }

  def sourceOf(seed: Long, id: Long): String =
    "src" + Math.floorMod(mix(seed ^ id ^ 0x5bf03635L), 20L)
}

private[sources] class SynthTable(rows: Long, partitions: Int, seed: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft_synth($rows)"
  override def schema(): StructType = SynthSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, partitions, seed)
}

private[sources] class SynthScanBuilder(rows: Long, partitions: Int, seed: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = SynthSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new SynthScan(rows, partitions, seed, required)
}

private[sources] case class SynthRange(start: Long, end: Long) extends InputPartition

private[sources] class SynthScan(rows: Long, partitions: Int, seed: Long,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + partitions - 1) / partitions)
    (0L until rows by per).map(s => SynthRange(s, math.min(s + per, rows))).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(seed, required)
}

private[sources] class SynthReaderFactory(seed: Long, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[SynthRange]
    // one generator per required column, bound at reader build time —
    // pruned columns cost nothing per row
    val gens: Array[Long => Any] = required.fields.map(_.name match {
      case "doc_id" => (id: Long) => id
      case "text" => (id: Long) => UTF8String.fromString(SynthSource.textOf(seed, id))
      case "source" => (id: Long) => UTF8String.fromString(SynthSource.sourceOf(seed, id))
      case other => throw new IllegalArgumentException(s"unknown column $other")
    })
    new PartitionReader[InternalRow] {
      private var cur = r.start - 1
      override def next(): Boolean = { cur += 1; cur < r.end }
      override def get(): InternalRow = InternalRow.fromSeq(gens.map(_(cur)).toSeq)
      override def close(): Unit = ()
    }
  }
}
