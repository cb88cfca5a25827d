package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout techniques for scale (SURVEY §4 / builder north star):
  *
  *  - **salted join**: for a hot key whose rows exceed one executor's
  *    share, split the stream side across `buckets` sub-keys and
  *    replicate the build side once per bucket — the classic manual
  *    skew-join. (Spark's AQE skew handling covers most cases at
  *    runtime; the manual form is for deterministic layouts and for
  *    engines/configs where AQE is off.)
  *  - **salted aggregation**: two-phase groupBy for skewed group keys —
  *    partial aggregate on (key, salt), final on key. Spark's hash
  *    aggregate already does map-side partials per task; explicit salt
  *    matters when a single reduce-side key still overwhelms one task
  *    (e.g. count-distinct state).
  *  - **bucketed tables**: `writeBucketed` persists a table pre-shuffled
  *    on the join key; joins between co-bucketed tables skip their
  *    Exchange entirely (asserted in LayoutSpec).
  *  - **partitioned writes**: directory partitioning for coarse keys —
  *    scans with a partition predicate read only matching directories
  *    (PartitionFilters in the scan, asserted in LayoutSpec).
  */
object Layout {

  /** Deterministic salt in [0, buckets) derived from a distributor
    * column (any high-cardinality column of the row).
    */
  def saltOf(distributor: Column, buckets: Int): Column =
    pmod(hash(distributor), lit(buckets))

  /** Skew-safe equi-join: `big` is salted by `distributor`, `small` is
    * replicated `buckets` times. Result equals `big.join(small, key)`.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 buckets: Int, distributor: Column): DataFrame = {
    val bigSalted = big.withColumn("_salt", saltOf(distributor, buckets))
    val smallRepl = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    bigSalted.join(smallRepl, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase salted count+sum aggregation per key. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     buckets: Int, distributor: Column): DataFrame =
    df.withColumn("_salt", saltOf(distributor, buckets))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
      .groupBy(col(key))
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("sum_value"))

  /** Persist `df` bucketed (and sorted) on `key` as managed table `name`
    * — the co-location layout for repeated joins/aggregations on `key`.
    */
  def writeBucketed(df: DataFrame, name: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(name)

  /** Persist `df` directory-partitioned by `partCol` at `path`. */
  def writePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partCol).parquet(path)

  /** Morton (Z-order) interleave of two non-negative integer columns:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1, for the
    * low `bits` bits of each. The chain of shift/mask/OR terms is pure
    * codegen'd arithmetic — no UDF.
    */
  def mortonCode(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val al = a.cast("long"); val bl = b.cast("long")
    // Negative inputs would interleave two's-complement bits and destroy
    // locality silently — fail the task instead. The guard folds to a
    // single codegen'd conditional seeding the accumulator with 0.
    val seed = when(al < 0 || bl < 0,
      raise_error(concat(lit("mortonCode requires non-negative inputs, got ("),
        al, lit(", "), bl, lit(")")))).otherwise(lit(0L))
    (0 until bits).foldLeft(seed) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(al.bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(bl.bitwiseAND(lit(1L << i)), i + 1))
    }
  }

  /** Driver-local mirror of [[mortonCode]] — used for property tests and
    * for planning range boundaries without a Spark job.
    */
  def mortonLocal(a: Long, b: Long, bits: Int = 16): Long = {
    require(a >= 0 && b >= 0,
      s"mortonLocal requires non-negative inputs, got ($a, $b)")
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | ((a & (1L << i)) << i) | ((b & (1L << i)) << (i + 1))
    }
  }

  /** Z-order clustering: range-partition on the Morton code of (a, b)
    * and sort within partitions, so every output file covers a compact
    * BOX in (a, b) space instead of a stripe in one dimension. Parquet
    * min/max row-group stats on BOTH columns then become selective —
    * a filter on either dimension (or a box on both) skips most files,
    * which single-column sorting can only offer for its leading column.
    * The range partitioner samples the code column once; no shuffle
    * beyond the one the layout write pays anyway.
    */
  def zorderBy(df: DataFrame, a: Column, b: Column, nFiles: Int,
      bits: Int = 16): DataFrame = {
    // Collision-free temp column: never silently clobber a user column.
    val z = Iterator.from(0).map(i => s"_z$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(z, mortonCode(a, b, bits))
      .repartitionByRange(nFiles, col(z))
      .sortWithinPartitions(col(z))
      .drop(z)
  }

  /** Persist `df` Z-ordered on (a, b) at `path`, one file per range
    * partition.
    */
  def writeZOrdered(df: DataFrame, path: String, a: Column, b: Column,
      nFiles: Int, bits: Int = 16): Unit =
    zorderBy(df, a, b, nFiles, bits).write.mode("overwrite").parquet(path)
}
