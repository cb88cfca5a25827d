package graft.queries

import graft.Determinism._
import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical / reshaping / time-series coverage: pivot, grouping
  * sets, ntile-family windows, exact-sum moment statistics
  * (corr/covar/stddev), single-pass column profiling, salted skew join
  * and aggregation, cohort retention, ordered funnel, transition matrix,
  * histogram, gap filling, map roundtrip, and MERGE/upsert application.
  * All oracled.
  *
  * Float rule (SURVEY §2.4): every aggregate feeding a float formula is
  * an exact DECIMAL sum cast to DOUBLE; the closed-form formulas then run
  * the same IEEE double ops left-to-right in both engines, so results are
  * bit-identical without engine-native corr/stddev (whose merge order is
  * partition-dependent in Spark).
  */
object Stats {

  /** Order counts per month pivoted across status values — Spark
    * `.pivot` with an explicit value list (no extra distinct-values job,
    * and the output schema is fixed at plan time, a requirement for any
    * production pipeline). Missing combinations coalesce to 0 to match
    * SQL's `FILTER` counts.
    */
  def pivotStatus(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(month(col("o_orderdate")).cast("long").as("mon"), col("o_orderstatus"))
      .groupBy(col("mon"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("mon"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))
      .orderBy(col("mon").asc)

  /** GROUPING SETS with grouping flags — the general form rollup/cube
    * specialize. SQL surface (spark.sql over a temp view) because the
    * Dataset API only exposes rollup/cube; the plan is the same single
    * Expand + partial-aggregated HashAggregate. Explicit NULLS FIRST on
    * both engines (Spark defaults ASC→NULLS FIRST, DuckDB →NULLS LAST).
    */
  def groupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("graft_li_gs")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM graft_li_gs
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY g_rf ASC, g_ls ASC, l_returnflag ASC NULLS FIRST,
        |  l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  /** ntile / percent_rank / cume_dist over a per-segment account-balance
    * ordering. The window order is total (balance, custkey) so rank-based
    * fractions are engine-independent; percent_rank and cume_dist are
    * small-int divisions — identical IEEE results.
    */
  def ntileWindows(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    Tables.customer(s, d).select(
        col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy(col("c_mktsegment").asc, col("c_custkey").asc)
  }

  /** Correlation / population covariance / population stddev of
    * (l_quantity, l_extendedprice) per return flag, from exact decimal
    * moment sums (n, Σx, Σy, Σx², Σy², Σxy) — one map-side-combined
    * aggregation pass; the closed forms run in double on exact inputs.
    * Spark's built-in corr/stddev use a streaming merge whose float
    * result depends on partition order — unusable for a bit-exact gate
    * (and the exact-sums form is also what a 1000-executor run wants:
    * six decimal partials, no second pass).
    */
  def statsMoments(s: SparkSession, d: String): DataFrame = {
    val x = dec2(col("l_quantity"))
    val y = dec2(col("l_extendedprice"))
    // Decimal → STRING → double: the square/cross sums exceed 2^53 in
    // scaled-integer magnitude, and each engine's direct decimal→double
    // path double-rounds differently (1-ulp divergence observed). Both
    // engines' string→double parses are correctly rounded, so converting
    // through the exact digit string makes the formula inputs
    // bit-identical.
    def viaStr(c: Column): Column = c.cast("string").cast("double")
    val agg = Tables.lineitem(s, d).groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        viaStr(sum(x)).as("sx"), viaStr(sum(y)).as("sy"),
        viaStr(sum(x * x)).as("sxx"), viaStr(sum(y * y)).as("syy"),
        viaStr(sum(x * y)).as("sxy"))
    val n = col("n").cast("double")
    val (sx, sy, sxx, syy, sxy) = (col("sx"), col("sy"), col("sxx"), col("syy"), col("sxy"))
    agg.select(col("l_returnflag"), col("n"),
        ((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))).as("corr_qp"),
        ((n * sxy - sx * sy) / (n * n)).as("covar_pop_qp"),
        (sqrt(n * sxx - sx * sx) / n).as("std_qty"),
        (sqrt(n * syy - sy * sy) / n).as("std_price"))
      .orderBy(col("l_returnflag").asc)
  }

  /** Single-pass column profiling of `orders`: per column non-null
    * count, distinct count, numeric min/max (timestamps as epoch
    * seconds, strings profile counts only). The multi-distinct plan is
    * one scan with an Expand (one grouping per distinct aggregate) — at
    * warehouse scale the distinct counts would switch to
    * approx_count_distinct to drop the Expand entirely.
    */
  def profile(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).agg(
        count(col("o_orderkey")).as("nn_ok"), countDistinct(col("o_orderkey")).as("nd_ok"),
        min(col("o_orderkey")).cast("double").as("mn_ok"), max(col("o_orderkey")).cast("double").as("mx_ok"),
        count(col("o_custkey")).as("nn_ck"), countDistinct(col("o_custkey")).as("nd_ck"),
        min(col("o_custkey")).cast("double").as("mn_ck"), max(col("o_custkey")).cast("double").as("mx_ck"),
        count(col("o_totalprice")).as("nn_tp"), countDistinct(col("o_totalprice")).as("nd_tp"),
        min(col("o_totalprice")).as("mn_tp"), max(col("o_totalprice")).as("mx_tp"),
        count(col("o_orderdate")).as("nn_od"), countDistinct(col("o_orderdate")).as("nd_od"),
        // NTZ has no direct double cast; via TIMESTAMP (session tz UTC) →
        // epoch seconds, matching the oracle's epoch().
        min(col("o_orderdate")).cast("timestamp").cast("double").as("mn_od"),
        max(col("o_orderdate")).cast("timestamp").cast("double").as("mx_od"),
        count(col("o_orderstatus")).as("nn_os"), countDistinct(col("o_orderstatus")).as("nd_os"),
        count(col("o_orderpriority")).as("nn_op"), countDistinct(col("o_orderpriority")).as("nd_op"))
      .selectExpr(
        """stack(6,
          |  'o_custkey',       nn_ck, nd_ck, mn_ck, mx_ck,
          |  'o_orderdate',     nn_od, nd_od, mn_od, mx_od,
          |  'o_orderkey',      nn_ok, nd_ok, mn_ok, mx_ok,
          |  'o_orderpriority', nn_op, nd_op, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
          |  'o_orderstatus',   nn_os, nd_os, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
          |  'o_totalprice',    nn_tp, nd_tp, mn_tp, mx_tp)
          |AS (col_name, n_nonnull, n_distinct, min_val, max_val)""".stripMargin)
      .orderBy(col("col_name").asc)

  /** Brand revenue via an explicitly SALTED join: the part side is
    * replicated across 8 salt values, the lineitem side hashes its salt
    * from l_orderkey, and the join key becomes (p_partkey, salt) — a hot
    * part key's rows now land on 8 shuffle partitions instead of one.
    * The shuffle-hash hint keeps the demonstration honest (the dimension
    * would otherwise broadcast at this SF and no salt would be needed —
    * at 100 TB both sides of a skewed fact-fact join shuffle). Result is
    * salt-invariant: the oracle is the PLAIN join, proving equivalence.
    */
  def saltedJoin(s: SparkSession, d: String): DataFrame = {
    val nSalts = 8
    val li = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .withColumn("salt", pmod(col("l_orderkey"), lit(nSalts.toLong)).cast("int"))
    val p = Tables.part(s, d).select(col("p_partkey"), col("p_brand"))
      .withColumn("salt", explode(array((0 until nSalts).map(lit): _*)))
    li.hint("shuffle_hash")
      .join(p, li("l_partkey") === p("p_partkey") && li("salt") === p("salt"))
      .groupBy(col("p_brand"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1).cast(Dec) - dec2(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("p_brand").asc)
  }

  /** Cohort retention over the event stream table: users grouped by
    * first-seen day, distinct actives per (cohort_day, activity_day).
    * Two aggregations (first-seen, then the retention matrix) and one
    * self-join on user_id — each shuffle keys on user or the compact
    * (cohort, day) pair; at 100 TB the distinct count would switch to
    * approx_count_distinct per cell.
    */
  def cohortRetention(s: SparkSession, d: String): DataFrame = {
    // days as ISO strings: a DATE output column arrives as datetime.date
    // from Spark parquet but midnight datetime64 from DuckDB — strings
    // compare identically in the gate.
    val e = graft.Tables.events(s, d)
      .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
    val firstDay = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    e.join(firstDay, Seq("user_id"))
      .groupBy(col("cohort_day"), col("day"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day").asc, col("day").asc)
  }

  /** Two-phase SALTED aggregation: partials on (key, salt) — 16 shuffle
    * cells per hot key instead of one — then an exact decimal merge. The
    * oracle is the plain single-phase groupBy, proving the decomposition
    * is lossless; this is the explicit form of what map-side partial
    * aggregation does implicitly, needed when one group key dominates a
    * partition even after partials (the aggregation twin of
    * q_salted_join).
    */
  def skewAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_quantity"), col("l_orderkey"))
      .withColumn("salt", pmod(col("l_orderkey"), lit(16L)).cast("int"))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(sum(dec2(col("l_quantity"))).as("pq"), count(lit(1)).as("pn"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("pq")).cast("double").as("sum_qty"), sum(col("pn")).as("n"))
      .orderBy(col("l_returnflag").asc)

  /** Map-column roundtrip: per document, a MAP(language → marker-word
    * hit count) built with `map`, then `explode`d back to scalar rows
    * the gate can hash — the map-functions surface exercised inside an
    * oracled query (the oracle computes the same counts relationally;
    * markers are the q_lang_id vocabulary, so hits are guaranteed).
    */
  private[queries] val markerPatterns: Seq[(String, String)] = Seq(
    "en" -> "(the|a|of|and|to)",
    "es" -> "(el|la|de|que|y)",
    "de" -> "(der|die|und|ist|das)",
    "fr" -> "(le|les|et|des|une)")

  def mapMarkers(s: SparkSession, d: String): DataFrame = {
    val entries = markerPatterns.flatMap { case (key, pat) =>
      Seq(lit(key), regexp_count(lower(col("text")), lit(s"\\b$pat\\b")).cast("long"))
    }
    Tables.documents(s, d)
      .select(col("doc_id"), explode(map(entries: _*)).as(Seq("lang_family", "n_markers")))
      .where(col("n_markers") > 0)
      .orderBy(col("doc_id").asc, col("lang_family").asc)
  }

  /** Time-series gap filling: daily revenue per status regularized onto
    * the complete (status × day) grid — `sequence` generates the day
    * spine from the data's own bounds, missing days left-join to NULL,
    * and a carry-forward window (`last` ignoreNulls over day order)
    * fills them, flagged in `is_filled`. The spine is tiny
    * (statuses × days) so its cross join broadcasts; the only real
    * shuffle is the daily aggregate.
    */
  def gapFill(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val daily = o
      .groupBy(col("o_orderstatus"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
      .agg(sum(dec2(col("o_totalprice"))).cast("double").as("rev"))
    val days = o
      .agg(to_date(min(col("o_orderdate"))).as("mn"), to_date(max(col("o_orderdate"))).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"))).as("dt"))
      .select(date_format(col("dt"), "yyyy-MM-dd").as("day"))
    val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    o.select(col("o_orderstatus")).distinct()
      .crossJoin(days)
      .join(daily, Seq("o_orderstatus", "day"), "left")
      .withColumn("rev_filled",
        coalesce(last(col("rev"), ignoreNulls = true).over(w), lit(0.0)))
      .withColumn("is_filled", col("rev").isNull)
      .select(col("o_orderstatus"), col("day"), col("rev_filled"), col("is_filled"))
      .orderBy(col("o_orderstatus").asc, col("day").asc)
  }

  /** MERGE semantics over the customer dimension: a deterministic CDC
    * set derived from orders (each ordering customer's balance becomes
    * their exact-decimal order total; every 10th key is a delete) is
    * applied with operators.Merge — updates overwrite, deletes drop,
    * untouched rows pass through. The oracle is the equivalent
    * LEFT JOIN + CASE + anti-delete filter.
    */
  def mergeUpsert(s: SparkSession, d: String): DataFrame = {
    val changes = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(sum(dec2(col("o_totalprice"))).cast("double").as("c_acctbal"))
      .withColumn("op",
        when(pmod(col("c_custkey"), lit(10L)) === 0, "D").otherwise("U"))
    graft.operators.Merge.applyChanges(
        Tables.customer(s, d).select(col("c_custkey"), col("c_name"),
          col("c_acctbal"), col("c_mktsegment")),
        changes, "c_custkey")
      .orderBy(col("c_custkey").asc)
  }

  /** Ordered event funnel: users reaching view → click-after-view →
    * purchase-after-click, with per-stage user counts. Each stage is an
    * aggregate on user_id (first qualifying timestamp) feeding the next
    * — three key-shuffled aggregations + joins, no window over the full
    * event stream, and stage relations shrink monotonically.
    */
  def funnel(s: SparkSession, d: String): DataFrame = {
    val e = graft.Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
    val v = e.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val c = e.where(col("event_type") === "click")
      .join(v, Seq("user_id")).where(col("ts") >= col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val p = e.where(col("event_type") === "purchase")
      .join(c, Seq("user_id")).where(col("ts") >= col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    v.agg(count(lit(1)).as("n_users")).select(lit("1_view").as("stage"), col("n_users"))
      .unionByName(c.agg(count(lit(1)).as("n_users"))
        .select(lit("2_click").as("stage"), col("n_users")))
      .unionByName(p.agg(count(lit(1)).as("n_users"))
        .select(lit("3_purchase").as("stage"), col("n_users")))
      .orderBy(col("stage").asc)
  }

  /** Fixed-width histogram of order totals: bucket = floor(v / 25000)
    * (identical double division + floor in both engines), count and
    * exact decimal sum per bucket.
    */
  def histogram(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(floor(col("o_totalprice") / 25000.0).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("o_totalprice"))).cast("double").as("sum_price"))
      .orderBy(col("bucket").asc)

  /** Event transition matrix: per-user next-event pairs (lead over the
    * total (ts, event_id) order) aggregated into (from, to, n) — the
    * Markov-chain view of the event stream. One window shuffle on
    * user_id, then a tiny aggregate.
    */
  def transitions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    graft.Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .where(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type").asc, col("next_type").asc)
  }

  /** rank vs dense_rank with genuine ties: part sizes repeat within a
    * brand, so the two functions diverge (gaps vs no gaps) — the tie
    * semantics row_number-based queries can't exercise. Output order is
    * total (brand, partkey) so ties don't destabilize row order.
    */
  def rankDense(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand")).orderBy(col("p_size").asc)
    Tables.part(s, d).select(
        col("p_brand"), col("p_partkey"), col("p_size"),
        rank().over(w).cast("long").as("rk"),
        dense_rank().over(w).cast("long").as("drk"))
      .orderBy(col("p_brand").asc, col("p_partkey").asc)
  }

  /** Half-life-decayed value sum per event type (1-week half-life,
    * anchored at the newest event) — the recency weighting a feedback/
    * engagement pipeline applies. Bit-exact float discipline: decay
    * factors are powers of two (2^-k, k = whole weeks of age), so each
    * term is `exact-weekly-sum / (1L << k)` — an EXACT double scaling,
    * no pow/exp anywhere; and the final per-type sum folds the ≤
    * week-count terms in k order via a sorted-array aggregate, pinning
    * the float addition order that a parallel SUM would leave to
    * partition luck. Weekly sums are one map-side-combined decimal
    * aggregate; the fold input is bounded by the calendar, not the data.
    */
  def timeDecay(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"), col("value"),
      datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")).as("day"))
    val anchor = ev.agg(max(col("day")).as("anchor"))
    val weekly = ev.crossJoin(broadcast(anchor))
      .withColumn("k", expr("(anchor - day) div 7"))
      .groupBy(col("event_type"), col("k"))
      .agg(dsum(col("value")).as("wsum"))
    weekly
      // k clamps at 62: JVM shiftleft wraps mod 64 (DuckDB's << does not),
      // so an event ≥ 64 weeks old would divide by a wrong (even negative)
      // power. Beyond 2^-62 the term is below double noise anyway, so the
      // clamp is semantics-free — but it must be applied in BOTH engines.
      .withColumn("term",
        expr("wsum / cast(shiftleft(1L, cast(least(k, 62) AS int)) AS double)"))
      .groupBy(col("event_type"))
      .agg(
        aggregate(sort_array(collect_list(struct(col("k"), col("term")))),
          lit(0.0), (acc, x) => acc + x.getField("term")).as("decayed"),
        count(lit(1)).as("n_weeks"))
      .orderBy(col("event_type").asc)
  }

  /** Per-type 3σ anomaly flags over `events.value`, without stddev: the
    * z-score test |x−μ| > 3σ is evaluated as the equivalent integer-free
    * inequality (n·x−S)²·(n−1) > 9·n·(n·Q−S²) on exact decimal moments
    * S=Σx, Q=Σx² surfaced as doubles — stddev_samp itself is NOT
    * cross-engine stable (Welford vs naive accumulation drift), but
    * identical-input IEEE arithmetic is. Two passes over the fact: one
    * partial-aggregated moment scan (5 rows out), then a broadcast of
    * those moments back into a flagging scan — at 100 TB this beats a
    * per-type window (which would shuffle the whole fact) because the
    * second pass is map-side only.
    */
  def anomalyZscore(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(col("event_id"), col("event_type"), col("value"))
    val g = graft.operators.AnomalyGate.moments(e, "event_type", "value")
    graft.operators.AnomalyGate.gate(e, g, "event_type", "value")
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy(col("event_id").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_anomaly_zscore" -> anomalyZscore,
    "q_time_decay" -> timeDecay,
    "q_funnel" -> funnel,
    "q_transitions" -> transitions,
    "q_rank_dense" -> rankDense,
    "q_histogram" -> histogram,
    "q_pivot" -> pivotStatus,
    "q_cohort_retention" -> cohortRetention,
    "q_skew_agg" -> skewAgg,
    "q_map_markers" -> mapMarkers,
    "q_gap_fill" -> gapFill,
    "q_merge_upsert" -> mergeUpsert,
    "q_grouping_sets" -> groupingSets,
    "q_ntile" -> ntileWindows,
    "q_stats_moments" -> statsMoments,
    "q_profile" -> profile,
    "q_salted_join" -> saltedJoin,
  )

  val oracleSql: Map[String, String] = Map(
    "q_anomaly_zscore" ->
      """WITH g AS (SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))
        |      * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS q
        |  FROM events GROUP BY event_type)
        |SELECT event_id, e.event_type, value
        |FROM events e JOIN g ON e.event_type = g.event_type
        |WHERE (n * q - s * s) > 0
        |  AND (n * value - s) * (n * value - s) * (n - 1)
        |    > 9.0 * n * (n * q - s * s)
        |ORDER BY event_id ASC""".stripMargin,
    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |v AS (SELECT user_id, MIN(ts) AS t_view FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.ts) AS t_click FROM e JOIN v
        |  ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= v.t_view GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase FROM e JOIN c
        |  ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= c.t_click GROUP BY e.user_id)
        |SELECT stage, n_users FROM (
        |  SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
        |  UNION ALL SELECT '2_click', COUNT(*) FROM c
        |  UNION ALL SELECT '3_purchase', COUNT(*) FROM p)
        |ORDER BY stage ASC""".stripMargin,
    "q_time_decay" ->
      """WITH e AS (SELECT event_type, value,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '1970-01-01' AS day
        |  FROM events),
        |a AS (SELECT MAX(day) AS anchor FROM e),
        |w AS (SELECT event_type, (a.anchor - day) // 7 AS k,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS wsum
        |  FROM e CROSS JOIN a GROUP BY event_type, (a.anchor - day) // 7),
        |t AS (SELECT event_type, k,
        |    wsum / CAST(CAST(1 AS BIGINT) << LEAST(k, 62) AS DOUBLE) AS term FROM w)
        |SELECT event_type,
        |  list_reduce(list(term ORDER BY k), (x, y) -> x + y) AS decayed,
        |  CAST(COUNT(*) AS BIGINT) AS n_weeks
        |FROM t GROUP BY event_type ORDER BY event_type ASC""".stripMargin,
    "q_rank_dense" ->
      """SELECT p_brand, p_partkey, p_size,
        |  RANK() OVER w AS rk, DENSE_RANK() OVER w AS drk
        |FROM part
        |WINDOW w AS (PARTITION BY p_brand ORDER BY p_size ASC)
        |ORDER BY p_brand ASC, p_partkey ASC""".stripMargin,
    "q_transitions" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    CAST(ts AS TIMESTAMP) AS ts FROM events),
        |p AS (SELECT event_type,
        |    LEAD(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, event_id ASC) AS next_type
        |  FROM e)
        |SELECT event_type, next_type, COUNT(*) AS n FROM p
        |WHERE next_type IS NOT NULL
        |GROUP BY event_type, next_type
        |ORDER BY event_type ASC, next_type ASC""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bucket,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1 ORDER BY bucket ASC""".stripMargin,
    "q_skew_agg" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag ASC""".stripMargin,
    "q_map_markers" -> {
      val branches = markerPatterns.map { case (k, pat) =>
        s"SELECT doc_id, '$k' AS lang_family, " +
          s"len(regexp_extract_all(lower(text), '\\b$pat\\b')) AS n_markers FROM documents"
      }.mkString("\nUNION ALL ")
      s"""SELECT doc_id, lang_family, n_markers FROM (
         |$branches)
         |WHERE n_markers > 0 ORDER BY doc_id ASC, lang_family ASC""".stripMargin
    },
    "q_merge_upsert" ->
      """WITH ch AS (SELECT o_custkey AS c_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS new_bal,
        |    CASE WHEN o_custkey % 10 = 0 THEN 'D' ELSE 'U' END AS op
        |  FROM orders GROUP BY o_custkey)
        |SELECT c.c_custkey, c.c_name,
        |  CASE WHEN ch.op = 'U' THEN ch.new_bal ELSE c.c_acctbal END AS c_acctbal,
        |  c.c_mktsegment
        |FROM customer c LEFT JOIN ch ON c.c_custkey = ch.c_custkey
        |WHERE ch.op IS NULL OR ch.op <> 'D'
        |ORDER BY c.c_custkey ASC""".stripMargin,
    "q_gap_fill" ->
      """WITH b AS (SELECT MIN(CAST(o_orderdate AS DATE)) AS mn,
        |    MAX(CAST(o_orderdate AS DATE)) AS mx FROM orders),
        |days AS (SELECT strftime(d, '%Y-%m-%d') AS day
        |  FROM b CROSS JOIN LATERAL (SELECT unnest(generate_series(mn, mx,
        |    INTERVAL 1 DAY)) AS d)),
        |st AS (SELECT DISTINCT o_orderstatus FROM orders),
        |daily AS (SELECT o_orderstatus, strftime(o_orderdate, '%Y-%m-%d') AS day,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        |  FROM orders GROUP BY 1, 2),
        |grid AS (SELECT st.o_orderstatus, days.day, daily.rev
        |  FROM st CROSS JOIN days
        |  LEFT JOIN daily ON daily.o_orderstatus = st.o_orderstatus
        |    AND daily.day = days.day)
        |SELECT o_orderstatus, day,
        |  coalesce(last_value(rev IGNORE NULLS) OVER (PARTITION BY o_orderstatus
        |    ORDER BY day ASC ROWS UNBOUNDED PRECEDING), 0.0) AS rev_filled,
        |  (rev IS NULL) AS is_filled
        |FROM grid ORDER BY o_orderstatus ASC, day ASC""".stripMargin,
    "q_cohort_retention" ->
      """WITH e AS (SELECT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events),
        |f AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id)
        |SELECT f.cohort_day, e.day, COUNT(DISTINCT e.user_id) AS n_users
        |FROM e JOIN f ON e.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY cohort_day ASC, day ASC""".stripMargin,
    "q_pivot" ->
      """SELECT CAST(month(o_orderdate) AS BIGINT) AS mon,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY 1 ORDER BY mon ASC""".stripMargin,
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
        |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY g_rf ASC, g_ls ASC, l_returnflag ASC NULLS FIRST,
        |  l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_ntile" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
        |  PERCENT_RANK() OVER w AS pr,
        |  CUME_DIST() OVER w AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)
        |ORDER BY c_mktsegment ASC, c_custkey ASC""".stripMargin,
    "q_stats_moments" ->
      """WITH m AS (SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(CAST(SUM(x) AS VARCHAR) AS DOUBLE) AS sx,
        |    CAST(CAST(SUM(y) AS VARCHAR) AS DOUBLE) AS sy,
        |    CAST(CAST(SUM(x*x) AS VARCHAR) AS DOUBLE) AS sxx,
        |    CAST(CAST(SUM(y*y) AS VARCHAR) AS DOUBLE) AS syy,
        |    CAST(CAST(SUM(x*y) AS VARCHAR) AS DOUBLE) AS sxy
        |  FROM (SELECT l_returnflag,
        |      CAST(l_quantity AS DECIMAL(18,2)) AS x,
        |      CAST(l_extendedprice AS DECIMAL(18,2)) AS y
        |    FROM lineitem)
        |  GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  (CAST(n AS DOUBLE)*sxy - sx*sy) /
        |    sqrt((CAST(n AS DOUBLE)*sxx - sx*sx) * (CAST(n AS DOUBLE)*syy - sy*sy)) AS corr_qp,
        |  (CAST(n AS DOUBLE)*sxy - sx*sy) / (CAST(n AS DOUBLE)*CAST(n AS DOUBLE)) AS covar_pop_qp,
        |  sqrt(CAST(n AS DOUBLE)*sxx - sx*sx) / CAST(n AS DOUBLE) AS std_qty,
        |  sqrt(CAST(n AS DOUBLE)*syy - sy*sy) / CAST(n AS DOUBLE) AS std_price
        |FROM m ORDER BY l_returnflag ASC""".stripMargin,
    "q_profile" ->
      """WITH a AS (SELECT
        |    COUNT(o_orderkey) AS nn_ok, COUNT(DISTINCT o_orderkey) AS nd_ok,
        |    CAST(MIN(o_orderkey) AS DOUBLE) AS mn_ok, CAST(MAX(o_orderkey) AS DOUBLE) AS mx_ok,
        |    COUNT(o_custkey) AS nn_ck, COUNT(DISTINCT o_custkey) AS nd_ck,
        |    CAST(MIN(o_custkey) AS DOUBLE) AS mn_ck, CAST(MAX(o_custkey) AS DOUBLE) AS mx_ck,
        |    COUNT(o_totalprice) AS nn_tp, COUNT(DISTINCT o_totalprice) AS nd_tp,
        |    MIN(o_totalprice) AS mn_tp, MAX(o_totalprice) AS mx_tp,
        |    COUNT(o_orderdate) AS nn_od, COUNT(DISTINCT o_orderdate) AS nd_od,
        |    epoch(MIN(o_orderdate)) AS mn_od, epoch(MAX(o_orderdate)) AS mx_od,
        |    COUNT(o_orderstatus) AS nn_os, COUNT(DISTINCT o_orderstatus) AS nd_os,
        |    COUNT(o_orderpriority) AS nn_op, COUNT(DISTINCT o_orderpriority) AS nd_op
        |  FROM orders)
        |SELECT col_name, n_nonnull, n_distinct, min_val, max_val FROM (
        |  SELECT 'o_custkey' AS col_name, nn_ck AS n_nonnull, nd_ck AS n_distinct,
        |    mn_ck AS min_val, mx_ck AS max_val FROM a
        |  UNION ALL SELECT 'o_orderdate', nn_od, nd_od, mn_od, mx_od FROM a
        |  UNION ALL SELECT 'o_orderkey', nn_ok, nd_ok, mn_ok, mx_ok FROM a
        |  UNION ALL SELECT 'o_orderpriority', nn_op, nd_op, NULL, NULL FROM a
        |  UNION ALL SELECT 'o_orderstatus', nn_os, nd_os, NULL, NULL FROM a
        |  UNION ALL SELECT 'o_totalprice', nn_tp, nd_tp, mn_tp, mx_tp FROM a)
        |ORDER BY col_name ASC""".stripMargin,
    "q_salted_join" ->
      """SELECT p_brand,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand ASC""".stripMargin,
  )
}
