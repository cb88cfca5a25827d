package graft.queries

import graft.Tables
import graft.functions.{TopK, VectorOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed-API queries: the TopK Aggregator and an element-wise centroid —
  * both oracle-checked.
  */
object Typed {

  /** Top-3 vectors per label by cosine to the query vector, computed with
    * the bounded-heap TopK Aggregator (typed groupByKey path) instead of
    * a window sort. Exercises Dataset[T] + Aggregator through the driver
    * gate; the oracle is the equivalent window query.
    */
  def topkPerLabel(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val q = VectorOps.queryVector(s, d, 0L)
    val scored = Tables.embeddings(s, d)
      .select(col("label"), col("vec_id"),
        VectorOps.cosineToQuery(col("embedding"), q).as("cos"))
      .as[(Int, Long, Double)]
    scored
      .groupByKey(_._1)
      .mapValues { case (_, id, cos) => (id, cos) }
      .agg(TopK.byScore(3).name("top"))
      .flatMap { case (label, top) =>
        top.zipWithIndex.map { case ((id, cos), i) => (label, i + 1, id, cos) }
      }
      .toDF("label", "rank", "vec_id", "cos")
      .select(col("label"), col("rank"), col("vec_id"), round(col("cos"), 4).as("cos"))
      .orderBy(col("label").asc, col("rank").asc)
  }

  /** Per-label embedding centroid: element-wise mean via posexplode +
    * aggregation — the distributed mean-pooling shape (no per-group
    * collect). Sums go through DECIMAL(25,10) so partition merge order
    * cannot perturb the result (doubles would), then the mean is double
    * division, rounded for output. Emitted as scalar (label, pos, m)
    * rows — one row per centroid dimension — so the result is hashable
    * by any columnar checker (an ARRAY output column is not).
    */
  def centroidByLabel(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(round(sum(col("v").cast("double").cast("decimal(25,10)")).cast("double") /
        count(lit(1)), 6).as("m"))
      .orderBy(col("label").asc, col("pos").asc)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_topk_per_label" -> topkPerLabel,
    "q_centroid_by_label" -> centroidByLabel,
  )

  private val cosine =
    """(CASE WHEN sqrt(list_reduce(list_transform(range(1, len(e.embedding)+1),
      |    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)), (x,y) -> x+y))
      |  * sqrt(list_reduce(list_transform(range(1, len(q.qe)+1),
      |    i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)), (x,y) -> x+y)) = 0.0
      |THEN 0.0
      |ELSE list_reduce(list_transform(range(1, len(e.embedding)+1),
      |    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)), (x,y) -> x+y)
      |  / (sqrt(list_reduce(list_transform(range(1, len(e.embedding)+1),
      |    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)), (x,y) -> x+y))
      |  * sqrt(list_reduce(list_transform(range(1, len(q.qe)+1),
      |    i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)), (x,y) -> x+y))) END)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_topk_per_label" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |scored AS (SELECT e.label, e.vec_id, $cosine AS cos
         |  FROM embeddings e CROSS JOIN q)
         |SELECT label, rank, vec_id, ROUND(cos, 4) AS cos FROM (
         |  SELECT label, vec_id, cos, ROW_NUMBER() OVER (PARTITION BY label
         |    ORDER BY cos DESC, vec_id ASC) AS rank
         |  FROM scored) WHERE rank <= 3
         |ORDER BY label ASC, rank ASC""".stripMargin,
    "q_centroid_by_label" ->
      """WITH expl AS (
        |  SELECT label, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS v
        |  FROM embeddings CROSS JOIN LATERAL (
        |    SELECT unnest(range(1, len(embedding) + 1)) AS i))
        |SELECT label, CAST(pos AS INTEGER) AS pos,
        |  ROUND(CAST(SUM(CAST(v AS DECIMAL(25,10))) AS DOUBLE) / COUNT(*), 6) AS m
        |FROM expl GROUP BY label, pos ORDER BY label ASC, pos ASC""".stripMargin,
  )
}
