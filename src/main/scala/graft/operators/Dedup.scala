package graft.operators

import graft.functions.VectorOps
import graft.operators.TextAnalysis._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline, each designed for
  * the 100 TB shape:
  *
  *  - exact: one shuffle on a 128-bit content hash — never compares text;
  *  - item-set Jaccard: pairwise only *within blocks* (cheap blocking key),
  *    never a global cross join;
  *  - MinHash+LSH: shingle → seeded-minhash signature → band buckets →
  *    bucket-equijoin for candidates → exact Jaccard verify. Candidate
  *    generation is an equi-join on band keys (shuffle on key, no n²);
  *  - SimHash: one 60-bit fingerprint per doc (TextAnalysis.simhash), near
  *    dups = small hamming distance;
  *  - embedding cosine: near-dup pairs above a cosine threshold within
  *    blocks (the MLlib LSH path for unblocked scale lives in AnnSearch).
  *
  * All hashes derive from md5, so every operator here is reproducible in
  * the DuckDB oracle bit-for-bit. Item sets (unigram tokens, n-gram
  * shingles) are passed as array columns — see TextAnalysis.tokens /
  * TextAnalysis.shingles.
  */
object Dedup {

  /** Exact duplicate groups by content hash; canonical row = min id. */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("text_md5"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Jaccard similarity of two already-distinct item arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    when(union === 0.0, 0.0).otherwise(inter / union)
  }

  /** Near-dup pairs (id_a < id_b) with item-set Jaccard >= threshold,
    * restricted to pairs sharing `blockCol` — blocking keeps this an
    * equi-join (block key = shuffle key at scale).
    * `items` maps the input row to its distinct item array.
    */
  def jaccardPairs(df: DataFrame, idCol: String, blockCol: String,
                   items: Column, threshold: Double): DataFrame = {
    val toks = df.select(col(blockCol).as("block"), col(idCol).as("id"), items.as("items"))
    val a = toks.select(col("block"), col("id").as("id_a"), col("items").as("items_a"))
    val b = toks.select(col("block"), col("id").as("id_b"), col("items").as("items_b"))
    a.join(b, Seq("block"))
      .where(col("id_a") < col("id_b"))
      .withColumn("jaccard", jaccard(col("items_a"), col("items_b")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Seeded minhash signature over a distinct item array: element i is
    * min over items of md5-60bit(i + ":" + item).
    */
  def minhashSignature(items: Column, nHashes: Int): Column =
    transform(sequence(lit(0), lit(nHashes - 1)),
      i => array_min(transform(items, t => md5Hash60Seeded(t, i))))

  /** LSH band key for band b: md5 of "b:" + the band's signature slice.
    * Docs sharing any band key become candidate pairs.
    */
  def bandKey(sig: Column, band: Column, rowsPerBand: Int): Column =
    md5(concat(band.cast("string"), lit(":"),
      concat_ws(",", transform(
        slice(sig, band * rowsPerBand + 1, lit(rowsPerBand)),
        x => x.cast("string")))).cast("binary"))

  /** MinHash+LSH near-dup pairs: signature → band buckets → bucket
    * equi-join (distinct id pairs) → exact Jaccard verification.
    * nHashes = bands * rowsPerBand. The candidate join shuffles on the
    * band key only; item arrays are joined back for verification.
    */
  def minhashNearDup(df: DataFrame, idCol: String, items: Column,
                     bands: Int, rowsPerBand: Int, threshold: Double): DataFrame = {
    val n = bands * rowsPerBand
    val sets = df.select(col(idCol).as("id"), items.as("items"))
    val sigs = sets.select(col("id"), minhashSignature(col("items"), n).as("sig"))
    val banded = sigs
      .select(col("id"), col("sig"), explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .select(col("id"), bandKey(col("sig"), col("band"), rowsPerBand).as("bkey"))
    val cand = banded.select(col("bkey"), col("id").as("id_a"))
      .join(banded.select(col("bkey"), col("id").as("id_b")), Seq("bkey"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    cand
      .join(sets.select(col("id").as("id_a"), col("items").as("items_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("items").as("items_b")), Seq("id_b"))
      .withColumn("jaccard", jaccard(col("items_a"), col("items_b")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Embedding near-dup pairs: cosine >= threshold within blocks. */
  def cosinePairs(df: DataFrame, idCol: String, embCol: String,
                  blockCol: String, threshold: Double): DataFrame = {
    val v = df.select(col(blockCol).as("block"), col(idCol).as("id"),
      VectorOps.toDoubleArr(col(embCol)).as("v"))
    val a = v.select(col("block"), col("id").as("id_a"), col("v").as("v_a"))
    val b = v.select(col("block"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("block"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cos", VectorOps.cosine(col("v_a"), col("v_b")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
