package graft.queries

import graft.Determinism._
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core (SURVEY.md §2.4, M1): joins, aggregation, windows,
  * rollup, set ops, JSON, date buckets — all pure built-ins so Catalyst
  * gets pushdown/pruning/AQE for free.
  *
  * Scale notes (100 TB design intent, verified on the local plans):
  *  - dimension joins (`region`, `nation`) are explicitly `broadcast()` —
  *    at 1000 executors the fact side never shuffles for them;
  *  - every aggregate is a hash aggregate with map-side partial (free);
  *  - top-k is `orderBy().limit()` → planner's TakeOrderedAndProject
  *    (per-partition heap + driver merge, no global sort);
  *  - every query ends in a total order with a unique tiebreak
  *    (SURVEY.md §2.4 rule 2) so output row order is engine-independent.
  */
object Relational {

  /** Global top-N customers by balance (C7 analog on relational data). */
  def topnGlobal(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      .limit(5)

  /** customer ⋈ nation ⋈ region with both dims broadcast; count per nation. */
  def joinGeo(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .where(r("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_name").asc)
  }

  /** Customers with at least one order (left semi = EXISTS). */
  def semiJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey").asc)
  }

  /** Bloom-pruned semi aggregation: order counts + decimal price sums per
    * priority, restricted to orders from high-balance customers
    * (c_acctbal > 9000). A bloom filter over the qualifying customer keys
    * is built once and applied as a pre-filter on the orders scan, so the
    * fact rows that reach the exact semi-join shuffle are already ~the
    * selectivity of the dimension predicate; the exact left-semi then
    * removes bloom false positives, making the result bit-identical to
    * the plain EXISTS the oracle runs. This is the hand-rolled twin of
    * AQE runtime filtering: at 100 TB the sketch (a few KB for millions
    * of keys) ships inside the task binary and prunes at the scan,
    * cutting shuffle volume by the join selectivity; the UDF is justified
    * because Spark exposes its bloom sketch only via
    * `org.apache.spark.util.sketch.BloomFilter`, not a SQL builtin.
    */
  def bloomPrune(s: SparkSession, d: String): DataFrame = {
    val hi = Tables.customer(s, d).where(col("c_acctbal") > 9000.0)
      .select(col("c_custkey"))
    // Size the sketch from the actual qualifying-key count (one cheap
    // dimension-side pass) so the false-positive rate stays at the
    // configured fpp at every scale factor instead of degrading once the
    // key count outgrows a hardcoded capacity.
    val nKeys = math.max(hi.count(), 1L)
    val bf = hi.stat.bloomFilter("c_custkey", nKeys, 0.03)
    val might = udf((k: Long) => bf.mightContain(k))
    val o = Tables.orders(s, d).where(might(col("o_custkey")))
    o.join(hi, o("o_custkey") === hi("c_custkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec2(col("o_totalprice"))).cast("double").as("sum_price"))
      .orderBy(col("o_orderpriority").asc)
  }

  /** The Z-order (Morton) clustering key over two part dimensions — the
    * layout column `Layout.zorderBy` range-partitions on, declared as a
    * query so the bit-interleave itself is cross-engine hash-checked (the
    * partition-extent behavior it buys is pinned in LayoutSpec). Pure
    * codegen'd shift/mask arithmetic; the oracle mirrors every term with
    * DuckDB's bitwise operators.
    */
  def zorderCode(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"),
        graft.operators.Layout.mortonCode(
          col("p_size"), pmod(col("p_partkey"), lit(64)), bits = 8).as("zcode"))
      .orderBy(col("p_partkey").asc)

  /** Customers with no high-value order (left anti = NOT EXISTS); the
    * 400k threshold keeps the result non-empty at every scale factor.
    */
  def antiJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .where(col("o_totalprice") > 400000.0).select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey").asc)
  }

  /** TPC-H Q1 shape: pricing summary over lineitem (decimal-exact sums). */
  def aggPricing(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1).cast(Dec) - dec2(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag").asc, col("l_linestatus").asc)

  /** Top order per customer: row_number over (custkey, totalprice desc). */
  def windowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey").asc)
  }

  /** ROLLUP(o_orderpriority, o_orderstatus) counts; explicit NULLS FIRST
    * ordering (Spark's asc default) spelled out in the oracle SQL too,
    * since DuckDB defaults to NULLS LAST.
    */
  def rollupStatus(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority").asc_nulls_first, col("o_orderstatus").asc_nulls_first)

  /** Mean event value by type (C10 analog): deterministic decimal-sum avg. */
  def meanByType(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(davg(col("value")).as("avg_value"), count(lit(1)).as("n"))
      .orderBy(col("event_type").asc)

  /** Users who purchased EXCEPT chronically-erroring users (≥10 errors —
    * threshold keeps the result non-empty at every scale factor).
    */
  def setOps(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val purchasers = e.where(col("event_type") === "purchase").select(col("user_id"))
    val errored = e.where(col("event_type") === "error")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_err"))
      .where(col("n_err") >= 10).select(col("user_id"))
    purchasers.except(errored).orderBy(col("user_id").asc)
  }

  /** Sum of JSON prop `k` per event type (`props` is a `{"k": int}` string). */
  def jsonProps(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
      .orderBy(col("event_type").asc)

  /** Events per UTC day (date_trunc; ns parquet timestamps truncate ≥1s so
    * Spark µs vs DuckDB ns precision is not observable — SURVEY §7 risk c).
    */
  def dateBuckets(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("day").asc)

  /** Tumbling 1-hour window, batch form (streaming batch-parity twin lives
    * in graft.streaming): window().start == date_trunc('hour').
    */
  def hourlyWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("n"), col("sum_value"))
      .orderBy(col("hour_start").asc)

  /** Users who both purchased and signed up (INTERSECT — distinct set op). */
  def intersectUsers(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    e.where(col("event_type") === "purchase").select(col("user_id"))
      .intersect(e.where(col("event_type") === "signup").select(col("user_id")))
      .orderBy(col("user_id").asc)
  }

  /** Analytic window frames: running decimal-exact sum per user over time
    * plus the delta to the previous event (lag). Output omits ts (ns vs µs
    * across engines) — the sort key stays deterministic because (user_id,
    * ts, event_id) has a unique tiebreak.
    */
  def runningTotal(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("running_value",
        sum(dec2(col("value"))).over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double"))
      .withColumn("delta_prev",
        (dec2(col("value")) - dec2(lag(col("value"), 1).over(w))).cast("double"))
      .select(col("user_id"), col("event_id"), col("running_value"), col("delta_prev"))
      .orderBy(col("user_id").asc, col("event_id").asc)
  }

  /** FULL OUTER join of two monthly series — orders placed vs lineitems
    * shipped per calendar month. Ship months extend past the last order
    * month, so genuinely unmatched rows appear and surface as NULL
    * counts (kept as NULLs — the outer-join semantics under test).
    * Plan: two map-side-combined pre-aggregates (one row per month each)
    * full-outer-joined on the month key — aggregate-then-join, never
    * join-then-aggregate, so the outer join touches hundreds of rows
    * regardless of fact size.
    */
  def fullOuter(s: SparkSession, d: String): DataFrame = {
    val om = Tables.orders(s, d)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("mon"))
      .agg(count(lit(1)).as("n_orders"))
    val sm = Tables.lineitem(s, d)
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("mon"))
      .agg(count(lit(1)).as("n_shipped"))
    om.join(sm, Seq("mon"), "full_outer")
      .select(col("mon"), col("n_orders"), col("n_shipped"))
      .orderBy(col("mon").asc)
  }

  /** Schema-evolution union: a "legacy" orders feed (no priority column)
    * unioned with the current feed via `unionByName(allowMissingColumns)`
    * — the schema-drift case every long-lived 100 TB table hits (new
    * columns appear; old partitions lack them). Spark aligns by NAME and
    * null-fills the missing column; a positional `union` would silently
    * mis-bind. Aggregated so the null-fill is observable per bucket.
    */
  def unionEvolution(s: SparkSession, d: String): DataFrame = {
    val legacy = Tables.orders(s, d)
      .where(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_totalprice"))
    val current = Tables.orders(s, d)
      .where(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    legacy.unionByName(current, allowMissingColumns = true)
      .groupBy(coalesce(col("o_orderpriority"), lit("(legacy)")).as("priority"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
      .orderBy(col("priority").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_union_evolution" -> unionEvolution,
    "q_full_outer" -> fullOuter,
    "q_intersect" -> intersectUsers,
    "q_running_total" -> runningTotal,
    "q_topn_global" -> topnGlobal,
    "q_join_geo" -> joinGeo,
    "q_semi_join" -> semiJoin,
    "q_anti_join" -> antiJoin,
    "q_bloom_prune" -> bloomPrune,
    "q_zorder_code" -> zorderCode,
    "q_agg_pricing" -> aggPricing,
    "q_window_rank" -> windowRank,
    "q_rollup_status" -> rollupStatus,
    "q_mean_by_type" -> meanByType,
    "q_set_ops" -> setOps,
    "q_json_props" -> jsonProps,
    "q_date_buckets" -> dateBuckets,
    "q_hourly_window" -> hourlyWindow,
  )

  val oracleSql: Map[String, String] = Map(
    "q_union_evolution" ->
      """WITH u AS (
        |  SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, o_orderpriority
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
        |SELECT COALESCE(o_orderpriority, '(legacy)') AS priority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM u GROUP BY 1 ORDER BY priority ASC""".stripMargin,
    "q_full_outer" ->
      """WITH om AS (SELECT strftime(o_orderdate, '%Y-%m') AS mon,
        |    COUNT(*) AS n_orders FROM orders GROUP BY 1),
        |sm AS (SELECT strftime(l_shipdate, '%Y-%m') AS mon,
        |    COUNT(*) AS n_shipped FROM lineitem GROUP BY 1)
        |SELECT COALESCE(om.mon, sm.mon) AS mon, om.n_orders, sm.n_shipped
        |FROM om FULL OUTER JOIN sm ON om.mon = sm.mon
        |ORDER BY mon ASC""".stripMargin,
    "q_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |INTERSECT SELECT user_id FROM events WHERE event_type = 'signup'
        |ORDER BY user_id ASC""".stripMargin,
    "q_running_total" ->
      """SELECT user_id, event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id
        |    ORDER BY ts ASC, event_id ASC ROWS UNBOUNDED PRECEDING) AS DOUBLE)
        |    AS running_value,
        |  CAST(CAST(value AS DECIMAL(18,2)) - CAST(lag(value, 1) OVER (
        |    PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |    AS DECIMAL(18,2)) AS DOUBLE) AS delta_prev
        |FROM events ORDER BY user_id ASC, event_id ASC""".stripMargin,
    "q_topn_global" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 5""".stripMargin,
    "q_join_geo" ->
      """SELECT n_name, COUNT(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' GROUP BY n_name ORDER BY n_name ASC""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey ASC""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey ASC""".stripMargin,
    "q_zorder_code" -> {
      // mirror of Layout.mortonCode(p_size, p_partkey % 64, bits = 8):
      // bit i of a -> 2i, bit i of b -> 2i+1
      val terms = (0 until 8).flatMap { i =>
        Seq(s"((p_size & ${1L << i}) << $i)",
          s"(((p_partkey % 64) & ${1L << i}) << ${i + 1})")
      }.mkString(" | ")
      s"""SELECT p_partkey, CAST($terms AS BIGINT) AS zcode
         |FROM part ORDER BY p_partkey ASC""".stripMargin
    },
    "q_bloom_prune" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM customer
        |  WHERE c_custkey = o_custkey AND c_acctbal > 9000.0)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority ASC""".stripMargin,
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag ASC, l_linestatus ASC""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn = 1 ORDER BY o_custkey ASC""".stripMargin,
    "q_rollup_status" ->
      """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n FROM orders
        |GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
        |ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin,
    "q_mean_by_type" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value,
        |  COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type ASC""".stripMargin,
    "q_set_ops" ->
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |EXCEPT SELECT user_id FROM events WHERE event_type = 'error'
        |  GROUP BY user_id HAVING COUNT(*) >= 10
        |ORDER BY user_id ASC""".stripMargin,
    "q_json_props" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |  COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type ASC""".stripMargin,
    "q_date_buckets" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, COUNT(*) AS n
        |FROM events GROUP BY 1 ORDER BY day ASC""".stripMargin,
    "q_hourly_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY hour_start ASC""".stripMargin,
  )
}
