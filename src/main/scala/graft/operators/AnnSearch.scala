package graft.operators

import graft.functions.VectorOps._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`ARRAY<FLOAT>`).
  *
  * Three tiers, mirroring how a 100 TB corpus is actually served:
  *  1. brute-force exact top-k — distributed scan + TakeOrderedAndProject;
  *     the baseline and the reference's own algorithm (FAISS IndexFlatL2,
  *     `vectorDB.py:12,38`);
  *  2. deterministic IVF-flat — coarse quantizer = the first `nCells`
  *     vectors by id (a deterministic stand-in for k-means training, which
  *     would be model-state); every vector assigned to its nearest centroid
  *     once (one narrow pass over the data), queries probe only the
  *     `nProbe` cells nearest the query vector. Recall < 1, cost ~nProbe/
  *     nCells of the full scan — the classic FAISS IVF trade re-expressed
  *     relationally, and fully oracle-checkable because "training" is
  *     deterministic;
  *  3. MLlib LSH (BucketedRandomProjectionLSH / MinHashLSH) — the library
  *     scale path; hash-model state is seeded but engine-specific, so these
  *     are ScalaTest-verified (recall vs exact) rather than oracle-hashed.
  */
object AnnSearch {

  /** Exact cosine top-k to a fixed query vector. */
  def cosineTopK(df: DataFrame, q: Seq[Double], k: Int): DataFrame =
    df.select(col("vec_id"), cosineToQuery(col("embedding"), q).as("cos_raw"))
      .orderBy(col("cos_raw").desc, col("vec_id").asc)
      .limit(k)

  /** Exact squared-L2 top-k (the reference's search). */
  def l2TopK(df: DataFrame, q: Seq[Double], k: Int): DataFrame =
    df.select(col("vec_id"), squaredL2ToQuery(col("embedding"), q).as("dist_raw"))
      .orderBy(col("dist_raw").asc, col("vec_id").asc)
      .limit(k)

  /** Cell assignment for IVF: nearest centroid id per vector (centroids =
    * vec_id < nCells). Returns (vec_id, embedding, cell). Broadcast join —
    * centroids are tiny by construction.
    */
  def ivfAssign(emb: DataFrame, nCells: Int): DataFrame = {
    val cents = emb.where(col("vec_id") < nCells)
      .select(col("vec_id").as("cell"), col("embedding").as("cvec"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cdist").asc, col("cell").asc)
    emb.crossJoin(broadcast(cents))
      .withColumn("cdist", squaredL2(col("embedding"), col("cvec")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cell"))
  }

  /** IVF probe phase: distances of every vector in the `nProbe` cells
    * nearest to `q` — the caller applies its own top-k order/limit.
    */
  def ivfCandidates(emb: DataFrame, q: Seq[Double], nCells: Int, nProbe: Int): DataFrame = {
    val cents = emb.where(col("vec_id") < nCells)
      .select(col("vec_id").as("cell"), col("embedding").as("cvec"))
    val probed = cents
      .withColumn("qdist", squaredL2(col("cvec"), typedLit(q)))
      .orderBy(col("qdist").asc, col("cell").asc)
      .limit(nProbe)
      .select(col("cell"))
    ivfAssign(emb, nCells)
      .join(broadcast(probed), "cell")
      .select(col("vec_id"), squaredL2ToQuery(col("embedding"), q).as("dist_raw"))
  }

  /** IVF-flat search: exact top-k of the probed subset. */
  def ivfSearch(emb: DataFrame, q: Seq[Double], nCells: Int, nProbe: Int, k: Int): DataFrame =
    ivfCandidates(emb, q, nCells, nProbe)
      .orderBy(col("dist_raw").asc, col("vec_id").asc)
      .limit(k)

  // ---- deterministic random-hyperplane LSH (oracle-checkable, like the
  // IVF tier: "training" is md5-derived, so the DuckDB oracle regenerates
  // the identical hyperplanes and codes) ----

  /** md5-derived 60-bit hash of a string on the JVM — same value as the
    * columnar TextAnalysis.md5Hash60 / the oracle's
    * `CAST('0x'||substr(md5(s),1,15) AS BIGINT)`.
    */
  private def md5Hash60Jvm(s: String): Long = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      dig.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  /** Deterministic pseudo-random hyperplanes: component (p, j) =
    * (md5("rp:p:j") mod 2001 − 1000) / 1000 ∈ [−1, 1]. Not Gaussian, but
    * symmetric around 0 — sign-of-dot hashing only needs direction
    * diversity, and determinism buys an exact cross-engine oracle.
    */
  def rpPlanes(nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim)((p, j) =>
      (md5Hash60Jvm(s"rp:$p:$j") % 2001 - 1000) / 1000.0)

  /** Sign-bit code column: bit p set iff dot(v, plane_p) > 0. Narrow
    * per-row work (nPlanes codegen'd dot products), no shuffle.
    */
  def rpCode(emb: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (plane, p) =>
      when(dot(emb, typedLit(plane.toSeq)) > 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Driver-side code of a query vector (identical fold order: 0.0-init
    * left-to-right dot, strict `> 0`).
    */
  def rpCodeOf(q: Seq[Double], planes: Array[Array[Double]]): Long =
    planes.zipWithIndex.map { case (plane, p) =>
      val d = plane.indices.foldLeft(0.0)((acc, i) => acc + q(i) * plane(i))
      if (d > 0.0) 1L << p else 0L
    }.sum

  /** RP-LSH search: exact cosine top-k restricted to the query's code
    * bucket. One narrow scan computing the code + a pushable equality
    * filter — at scale the code is a precomputed partition/bucket column
    * and the filter prunes partitions before any vector math runs.
    * Top-k selection (raw cosine desc, vec_id asc tie-break) happens HERE
    * — a TakeOrderedAndProject over the bucket, so only k rows leave the
    * operator; callers round/re-order only for presentation.
    */
  def rpLshSearch(emb: DataFrame, q: Seq[Double], nPlanes: Int, k: Int): DataFrame = {
    val planes = rpPlanes(nPlanes, q.length)
    val qcode = rpCodeOf(q, planes)
    emb.withColumn("code", rpCode(col("embedding"), planes))
      .where(col("code") === lit(qcode))
      .select(col("vec_id"), cosineToQuery(col("embedding"), q).as("cos_raw"))
      .orderBy(col("cos_raw").desc, col("vec_id").asc)
      .limit(k)
  }

  // ---- MLlib LSH scale path (seeded; hash model is engine-specific so
  // these are spec-verified by recall against the exact scan, not
  // oracle-hashed) ----

  /** Euclidean ANN via BucketedRandomProjectionLSH: returns (vec_id,
    * dist) of the approximate k nearest neighbors of `q`.
    */
  def brpLshNeighbors(emb: DataFrame, q: Seq[Double], k: Int,
                      bucketLength: Double = 2.0, numTables: Int = 4,
                      seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.ml.linalg.Vectors
    val df = emb.withColumn("features",
      array_to_vector(toDoubleArr(col("embedding"))))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numTables).setSeed(seed)
    val model = lsh.fit(df)
    model.approxNearestNeighbors(df, Vectors.dense(q.toArray), k)
      .select(col("vec_id"), col("distCol").as("dist"))
  }

  /** Jaccard near-dup pairs via MLlib MinHashLSH over hashed binary
    * item vectors (HashingTF). `threshold` is on Jaccard *similarity*
    * (MLlib's distance = 1 - similarity).
    */
  def minhashLshMllib(df: DataFrame, idCol: String, items: Column,
                      threshold: Double, numTables: Int = 8,
                      numFeatures: Int = 1 << 18, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
    val sets = df.select(col(idCol).as("id"), items.as("items"))
    val tf = new HashingTF().setInputCol("items").setOutputCol("features")
      .setNumFeatures(numFeatures).setBinary(true)
    val vecs = tf.transform(sets).where(size(col("items")) > 0)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numTables).setSeed(seed)
    val model = lsh.fit(vecs)
    model.approxSimilarityJoin(vecs, vecs, 1.0 - threshold, "jaccard_dist")
      .select(col("datasetA.id").as("id_a"), col("datasetB.id").as("id_b"),
        (lit(1.0) - col("jaccard_dist")).as("jaccard"))
      .where(col("id_a") < col("id_b"))
  }
}
