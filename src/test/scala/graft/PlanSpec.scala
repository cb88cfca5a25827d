package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{ExplainMode, FormattedMode}
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regressions: SCALE.md's claims about scan pushdown,
  * broadcast dimensions, top-k compilation, and salted-join shape are
  * pinned here so an optimizer-hostile refactor (a UDF slipping into a
  * filter, a lost hint, an accidental global window) fails the suite
  * instead of silently degrading the 100 TB story.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  test("document scan pushes predicates and prunes columns") {
    val plan = formatted(graft.queries.Text.queries("q_doc_scan_filter")(spark, TestSpark.sf0001))
    assert(plan.contains("PushedFilters"), "no pushed filters on the parquet scan")
    assert(plan.contains("EqualTo(lang,en)") || plan.contains("EqualTo(lang, en)"),
      s"lang filter not pushed:\n${plan.take(2000)}")
    assert(!plan.contains("text"), "text column should be pruned from the scan")
  }

  test("geo join broadcasts both dimension tables") {
    val plan = formatted(graft.queries.Relational.queries("q_join_geo")(spark, TestSpark.sf0001))
    assert("BroadcastExchange".r.findAllIn(plan).size >= 2,
      "nation/region should both broadcast")
  }

  test("global top-n compiles to TakeOrderedAndProject (no global sort)") {
    val plan = formatted(graft.queries.Relational.queries("q_topn_global")(spark, TestSpark.sf0001))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("salted join stays a shuffled hash join on the salted key") {
    val plan = formatted(graft.queries.Stats.queries("q_salted_join")(spark, TestSpark.sf0001))
    assert(plan.contains("ShuffledHashJoin"), "salt demo must not broadcast")
    assert(plan.contains("salt"), "join key must include the salt column")
  }

  test("pack_sequences runs its data window hash-partitioned by part") {
    val plan = formatted(graft.queries.Analysis.queries("q_pack_sequences")(spark, TestSpark.sf0001))
    assert(plan.contains("hashpartitioning(part"),
      "per-partition cumsum window must partition by part, not run globally")
  }

  test("Q18: one lineitem aggregate, qualifying keys reach the joins, top-100 via TakeOrdered") {
    val plan = formatted(graft.queries.Tpch.queries("q_tpch_q18")(spark, TestSpark.sf0001))
    assert("(?s)HashAggregate.*l_orderkey".r.findFirstIn(plan).isDefined,
      "lineitem must aggregate on l_orderkey")
    assert(plan.contains("TakeOrderedAndProject"), "top-100 must not global-sort")
    // the HAVING filter must run on the aggregate, before the joins fan out
    assert("(?s)Filter.*sum_qty_d".r.findFirstIn(plan).isDefined ||
      plan.contains("(sum(l_quantity"), "threshold filter missing from the aggregate side")
  }

  test("Q20: semi-join keeps the supplier dim lean and the nation dim broadcasts") {
    val plan = formatted(graft.queries.Tpch.queries("q_tpch_q20")(spark, TestSpark.sf0001))
    assert(plan.contains("LeftSemi"), "supplier filter must stay a semi-join")
    assert(plan.contains("BroadcastExchange"), "nation dim should broadcast")
  }

  test("Q6: all three predicates push to the lineitem scan; no join, no wide shuffle") {
    val plan = formatted(graft.queries.Tpch.queries("q_tpch_q6")(spark, TestSpark.sf0001))
    assert(plan.contains("PushedFilters"), "scan must carry pushed filters")
    assert("GreaterThanOrEqual\\(l_discount".r.findFirstIn(plan).isDefined,
      s"discount band not pushed:\n${plan.take(2000)}")
    assert("LessThan\\(l_quantity".r.findFirstIn(plan).isDefined, "quantity cap not pushed")
    assert(!plan.contains("Join"), "Q6 is scan+agg only")
  }

  test("Q19: Catalyst extracts each side's projection of the disjunction into its scan") {
    val plan = formatted(graft.queries.Tpch.queries("q_tpch_q19")(spark, TestSpark.sf0001))
    // part side: OR over (brand,size) bands must reach the part scan filter;
    // lineitem side: OR over quantity bands must prune the fact scan.
    assert("(?s)Filter.*p_brand.*Brand#12.*Brand#23".r.findFirstIn(plan).isDefined,
      "part-side disjunction not extracted below the join")
    assert("(?s)Filter.*l_quantity.*l_quantity".r.findFirstIn(plan).isDefined,
      "lineitem-side quantity disjunction not extracted below the join")
  }

  test("Q22: scalar threshold broadcasts; inactivity check stays an anti-join") {
    val plan = formatted(graft.queries.Tpch.queries("q_tpch_q22")(spark, TestSpark.sf0001))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "one-row avg must broadcast, not shuffle")
    assert(plan.contains("LeftAnti"), "no-recent-orders must be an anti-join")
  }

  test("anomaly flags: moments broadcast back into the fact; no whole-fact window") {
    val plan = formatted(graft.queries.Stats.queries("q_anomaly_zscore")(spark, TestSpark.sf0001))
    assert(plan.contains("BroadcastExchange"), "per-type moments must broadcast")
    assert(!plan.contains("Window"), "flagging must not run as a whole-fact window")
  }

  test("union evolution: drift union aggregates with a map-side partial, one shuffle") {
    val plan = formatted(graft.queries.Relational.queries("q_union_evolution")(spark, TestSpark.sf0001))
    assert(plan.contains("Union"), "feeds must combine as a Union, not a join")
    assert("partial_(sum|count)".r.findFirstIn(plan).isDefined,
      "aggregate must keep its map-side partial below the union")
  }

  test("heavy hitters: candidates broadcast into a semi-join; no vocabulary-wide shuffle before it") {
    val plan = formatted(graft.queries.Analysis.queries("q_heavy_hitters")(spark, TestSpark.sf0001))
    assert(plan.contains("LeftSemi"), "exact pass must semi-join the candidate set")
    assert(plan.contains("BroadcastExchange"), "candidate set must broadcast")
  }
}
