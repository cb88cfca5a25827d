package graft.queries

import graft.Tables
import graft.functions.VectorOps._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector-search queries over `embeddings` (SURVEY.md §2.4, M0/M3).
  *
  * The reference's FAISS `IndexFlatL2` brute-force scan (`vectorDB.py:12,38`)
  * becomes a distributed column scan + codegen'd distance expression +
  * TakeOrderedAndProject top-k: no index build, no driver-side loop, and the
  * probe vector is embedded in the plan as a literal (broadcast-equivalent,
  * SURVEY C4). At 100 TB the same plan holds — each partition computes
  * distances locally and only k rows per partition reach the driver merge.
  */
object VectorQ {

  /** Exact global top-10 by squared L2 to the `vec_id=0` vector (C7). */
  def l2Topk(s: SparkSession, d: String): DataFrame = {
    val q = queryVector(s, d, 0L)
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        round(squaredL2ToQuery(col("embedding"), q), 4).as("dist"))
      .orderBy(col("dist").asc, col("vec_id").asc)
      .limit(10)
  }

  /** Per-label nearest neighbor (C6 per-group arg-min): window top-1 over
    * unrounded distance, rounded only at output.
    */
  def knnPerLabel(s: SparkSession, d: String): DataFrame = {
    val q = queryVector(s, d, 0L)
    val w = Window.partitionBy(col("label"))
      .orderBy(col("dist_raw").asc, col("vec_id").asc)
    Tables.embeddings(s, d)
      .select(col("label"), col("vec_id"),
        squaredL2ToQuery(col("embedding"), q).as("dist_raw"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("label"), col("vec_id"), round(col("dist_raw"), 4).as("dist"))
      .orderBy(col("label").asc)
  }

  /** Reference score normalization over the top-10 (C8):
    * `round(10/(1+d), 2)` with d = squared L2 (`rag_model_mass.py:13-15`).
    * Selection and presentation both order by (rounded dist, vec_id) — a
    * total order computed identically in both engines.
    */
  def scoreNormalize(s: SparkSession, d: String): DataFrame = {
    val q = queryVector(s, d, 0L)
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        squaredL2ToQuery(col("embedding"), q).as("dist_raw"))
      .withColumn("dist", round(col("dist_raw"), 4))
      .orderBy(col("dist").asc, col("vec_id").asc)
      .limit(10)
      .select(col("vec_id"), col("dist"),
        round(score(col("dist_raw")), 2).as("score"))
      .orderBy(col("dist").asc, col("vec_id").asc)
  }

  /** Batch multi-query top-k — the serving shape for scoring MANY probe
    * vectors in one pass: the query set broadcasts (tiny by definition),
    * every corpus row computes its distance to each query in a single
    * scan, and a per-query window keeps k. One corpus scan regardless of
    * query count, vs. one scan PER query in the single-probe form.
    */
  def multiQueryTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val probes = emb.where(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("dist_raw").asc, col("vec_id").asc)
    emb.crossJoin(broadcast(probes))
      .select(col("qid"), col("vec_id"),
        squaredL2(col("embedding"), col("qvec")).as("dist_raw"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("qid"), col("rn").cast("long").as("rk"),
        col("vec_id"), round(col("dist_raw"), 4).as("dist"))
      .orderBy(col("qid").asc, col("rk").asc)
  }

  /** Hard-negative mining for contrastive/embedding training: for each
    * probe, the top-3 nearest corpus vectors whose label DIFFERS from
    * the probe's — the near-but-wrong examples a triplet/InfoNCE loss
    * wants. Same one-scan batch shape as `multiQueryTopK` (broadcast
    * probe set, per-qid window top-k); the label-mismatch predicate
    * filters the distance stream before ranking, so negatives never
    * compete with same-class rows for the k slots. At 100 TB: probes
    * broadcast, the corpus scan partitions freely, and only k rows per
    * (partition, qid) survive the window's rank cutoff.
    */
  def hardNegatives(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val probes = emb.where(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        col("embedding").as("qvec"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("dist_raw").asc, col("vec_id").asc)
    emb.crossJoin(broadcast(probes))
      .where(col("label") =!= col("qlabel"))
      .select(col("qid"), col("vec_id"), col("label"),
        squaredL2(col("embedding"), col("qvec")).as("dist_raw"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("qid"), col("rn").cast("long").as("rk"),
        col("vec_id"), col("label"), round(col("dist_raw"), 4).as("dist"))
      .orderBy(col("qid").asc, col("rk").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_l2_topk" -> l2Topk,
    "q_knn_per_label" -> knnPerLabel,
    "q_score_normalize" -> scoreNormalize,
    "q_multi_query_topk" -> multiQueryTopK,
    "q_hard_negatives" -> hardNegatives,
  )

  /** DuckDB squared-L2: identical left-to-right double fold via
    * list_reduce over index range (1-based list indexing). Shared with
    * Advanced's LSH envelope oracle, which re-derives the same exact
    * top-k the recall assertion is computed against.
    */
  private[queries] val distExpr: String =
    """list_reduce(list_transform(range(1, len(e.embedding) + 1),
      |    i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(q.qe[i] AS DOUBLE))
      |       * (CAST(e.embedding[i] AS DOUBLE) - CAST(q.qe[i] AS DOUBLE))),
      |  (acc, v) -> acc + v)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_multi_query_topk" ->
      s"""WITH probes AS (SELECT vec_id AS qid, embedding AS qe
         |  FROM embeddings WHERE vec_id < 3),
         |dists AS (SELECT q.qid, e.vec_id, $distExpr AS dist_raw
         |  FROM embeddings e CROSS JOIN probes q),
         |ranked AS (SELECT qid, vec_id, dist_raw,
         |    ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY dist_raw ASC, vec_id ASC) AS rk
         |  FROM dists)
         |SELECT qid, rk, vec_id, ROUND(dist_raw, 4) AS dist
         |FROM ranked WHERE rk <= 3 ORDER BY qid ASC, rk ASC""".stripMargin,
    "q_l2_topk" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, ROUND(dist_raw, 4) AS dist FROM (
         |  SELECT e.vec_id, $distExpr AS dist_raw
         |  FROM embeddings e CROSS JOIN q)
         |ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin,
    "q_knn_per_label" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |dists AS (
         |  SELECT e.label, e.vec_id, $distExpr AS dist_raw
         |  FROM embeddings e CROSS JOIN q)
         |SELECT label, vec_id, ROUND(dist_raw, 4) AS dist FROM (
         |  SELECT label, vec_id, dist_raw,
         |    ROW_NUMBER() OVER (PARTITION BY label
         |      ORDER BY dist_raw ASC, vec_id ASC) AS rn
         |  FROM dists) WHERE rn = 1 ORDER BY label ASC""".stripMargin,
    "q_score_normalize" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, ROUND(dist_raw, 4) AS dist,
         |  ROUND(10.0 / (1.0 + dist_raw), 2) AS score FROM (
         |  SELECT e.vec_id, $distExpr AS dist_raw
         |  FROM embeddings e CROSS JOIN q)
         |ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin,
    "q_hard_negatives" ->
      s"""WITH probes AS (SELECT vec_id AS qid, label AS qlabel,
         |    embedding AS qe FROM embeddings WHERE vec_id < 3),
         |dists AS (SELECT q.qid, e.vec_id, e.label, $distExpr AS dist_raw
         |  FROM embeddings e CROSS JOIN probes q
         |  WHERE e.label <> q.qlabel),
         |ranked AS (SELECT qid, vec_id, label, dist_raw,
         |    ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY dist_raw ASC, vec_id ASC) AS rk
         |  FROM dists)
         |SELECT qid, rk, vec_id, label, ROUND(dist_raw, 4) AS dist
         |FROM ranked WHERE rk <= 3 ORDER BY qid ASC, rk ASC""".stripMargin,
  )
}
