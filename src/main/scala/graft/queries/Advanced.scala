package graft.queries

import graft.Determinism._
import graft.Tables
import graft.operators.{AnnSearch, AsOfJoin}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Advanced relational/ANN coverage: as-of join, CUBE, exact percentiles,
  * HLL sketches, MLlib LSH. ALL oracle-checked: the sketch/LSH queries
  * (engine-specific internals) hash deterministic ENVELOPES — exact
  * anchors plus boolean error-bound/recall assertions — rather than the
  * raw sketch estimates or hash buckets.
  */
object Advanced {

  /** Latest order at-or-before each event for the same user (as-of join,
    * merge-carry-forward — see AsOfJoin). Orders pre-deduped to one row
    * per (custkey, orderdate) with max orderkey, so the as-of winner is
    * deterministic in both engines.
    */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey").desc)
    val orders = Tables.orders(s, d)
      .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
    AsOfJoin.asOf(
      Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts")),
      "user_id", "ts",
      orders, "o_custkey", "o_orderdate",
      Seq("o_orderkey", "o_totalprice"))
      .select(col("event_id"), col("user_id"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("event_id").asc)
  }

  /** Earliest order at-or-after each event for the same user — the
    * forward as-of ("next scheduled" lookup), same one-shuffle
    * merge-carry as q_asof_join mirrored to a following frame.
    */
  def asofForward(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey").desc)
    val orders = Tables.orders(s, d)
      .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
    AsOfJoin.asOfForward(
      Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts")),
      "user_id", "ts",
      orders, "o_custkey", "o_orderdate",
      Seq("o_orderkey", "o_totalprice"))
      .select(col("event_id"), col("user_id"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("event_id").asc)
  }

  /** CUBE over (event_type, day): all 4 grouping combinations. */
  def cubeDaily(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .cube(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy(col("event_type").asc_nulls_first, col("day").asc_nulls_first)

  /** Exact interpolated percentiles (median, p90) of value per type. */
  def percentiles(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"))
      .orderBy(col("event_type").asc)

  /** HLL / approx-percentile sketches vs exact, per type — oracled on
    * ERROR-BOUND assertions, not the estimates: each engine's sketch
    * internals differ (Spark HLL++ vs DuckDB HLL, KLL vs t-digest), but
    * both must land inside the published bound, so the boolean columns
    * |hll − exact|/exact < 0.05 and p40 ≤ approx_p50 ≤ p60 hash
    * identically (all true) while still exercising the sketch path
    * end-to-end. `exact_users` stays as an exactly-hashed anchor.
    */
  def approxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.02).as("hll"),
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("ap50"),
        expr("percentile(value, 0.4)").as("p40"),
        expr("percentile(value, 0.6)").as("p60"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("hll") - col("exact_users")) / col("exact_users") < 0.05)
          .as("hll_ok"),
        (col("ap50") >= col("p40") && col("ap50") <= col("p60")).as("p50_ok"))
      .orderBy(col("event_type").asc)

  /** MLlib BucketedRandomProjectionLSH ANN over embeddings, as a fully
    * ORACLED envelope query (the pattern `q_approx_distinct` set for
    * engine-specific sketches): the hashable output rows are the EXACT
    * squared-L2 top-10 — which DuckDB recomputes bit-for-bit — and each
    * row carries `recall_ok`, the boolean recall@10 ≥ 0.9 of the seeded
    * MLlib LSH result against that exact set, computed in-flow (one
    * broadcast of the ≤10-row LSH id set — no driver collect). The
    * oracle asserts `TRUE AS recall_ok`, so a degraded LSH tier flips
    * the hash and fails CORRECTNESS loudly, while MLlib's internal hash
    * model (which has no cross-engine twin) never reaches the hashed
    * bytes. Exact recall values are additionally asserted in
    * AnnSearchSpec. Reference semantics: exact-scan parity of
    * `rag_model_mass.py:37`.
    */
  def lshBrpTopk(s: SparkSession, d: String): DataFrame = {
    val q = graft.functions.VectorOps.queryVector(s, d, 0L)
    val k = 10
    val exact = AnnSearch.l2TopK(Tables.embeddings(s, d), q, k)
      .select(col("vec_id"), round(col("dist_raw"), 4).as("dist"))
    val lshIds = AnnSearch.brpLshNeighbors(Tables.embeddings(s, d), q, k = k)
      .select(col("vec_id"))
    val recall = exact.join(broadcast(lshIds), Seq("vec_id"), "left_semi")
      .agg((count(lit(1)) / k.toDouble).as("recall"))
    exact.crossJoin(broadcast(recall))
      .select(col("vec_id"), col("dist"), (col("recall") >= 0.9).as("recall_ok"))
      .orderBy(col("dist").asc, col("vec_id").asc)
  }

  /** Pareto frontier of parts — cheapest price at every size level that
    * no bigger-or-equal size beats (minimize p_retailprice, maximize
    * p_size) via the two-phase distributed skyline (operators.Skyline):
    * block-local dominance prune, then a global sweep bounded by the
    * frontier size. Oracle is the NOT EXISTS dominance definition.
    */
  def skyline(s: SparkSession, d: String): DataFrame =
    graft.operators.Skyline.skyline2d(Tables.part(s, d),
        x = col("p_retailprice"), y = col("p_size").cast("long"), id = col("p_partkey"))
      .select(col("y").as("p_size"), col("x").as("p_retailprice"),
        col("rep").as("p_partkey"), col("cnt"))
      .orderBy(col("p_size").asc)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_skyline" -> skyline,
    "q_asof_join" -> asofJoin,
    "q_asof_forward" -> asofForward,
    "q_cube_daily" -> cubeDaily,
    "q_percentiles" -> percentiles,
    "q_approx_distinct" -> approxDistinct,
    "q_lsh_brp_topk" -> lshBrpTopk,
  )

  val oracleSql: Map[String, String] = Map(
    "q_skyline" ->
      """WITH pts AS (SELECT p_retailprice AS x, CAST(p_size AS BIGINT) AS y,
        |    MIN(p_partkey) AS rep, COUNT(*) AS cnt
        |  FROM part GROUP BY p_retailprice, p_size)
        |SELECT y AS p_size, x AS p_retailprice, rep AS p_partkey, cnt
        |FROM pts a WHERE NOT EXISTS (SELECT 1 FROM pts b
        |  WHERE b.x <= a.x AND b.y >= a.y AND (b.x < a.x OR b.y > a.y))
        |ORDER BY p_size ASC""".stripMargin,
    "q_asof_join" ->
      """WITH o2 AS (SELECT * FROM orders
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
        |    ORDER BY o_orderkey DESC) = 1)
        |SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice
        |FROM events e ASOF LEFT JOIN o2 o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id ASC""".stripMargin,
    "q_asof_forward" ->
      """WITH o2 AS (SELECT * FROM orders
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
        |    ORDER BY o_orderkey DESC) = 1)
        |SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice
        |FROM events e ASOF LEFT JOIN o2 o
        |  ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
        |ORDER BY e.event_id ASC""".stripMargin,
    "q_cube_daily" ->
      """SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY CUBE(event_type, date_trunc('day', ts))
        |ORDER BY event_type ASC NULLS FIRST, day ASC NULLS FIRST""".stripMargin,
    "q_percentiles" ->
      """SELECT event_type,
        |  ROUND(quantile_cont(value, 0.5), 4) AS p50,
        |  ROUND(quantile_cont(value, 0.9), 4) AS p90
        |FROM events GROUP BY event_type ORDER BY event_type ASC""".stripMargin,
    // Sketch estimates are engine-specific; the ORACLE asserts the error
    // bounds (each engine checks its own sketch against its own exact
    // values — identical TRUEs hash identically).
    "q_approx_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
        |  abs(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
        |    / CAST(COUNT(DISTINCT user_id) AS DOUBLE) < 0.05 AS hll_ok,
        |  approx_quantile(value, 0.5)
        |    BETWEEN quantile_cont(value, 0.4) AND quantile_cont(value, 0.6)
        |    AS p50_ok
        |FROM events GROUP BY event_type ORDER BY event_type ASC""".stripMargin,
    // Envelope oracle: the exact top-10 (recomputed here) is the hashed
    // content; recall_ok is the Spark-side LSH-vs-exact assertion, which
    // must be uniformly TRUE for the hash to match.
    "q_lsh_brp_topk" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, ROUND(dist_raw, 4) AS dist, TRUE AS recall_ok FROM (
         |  SELECT e.vec_id, ${VectorQ.distExpr} AS dist_raw
         |  FROM embeddings e CROSS JOIN q)
         |ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin,
  )
}
