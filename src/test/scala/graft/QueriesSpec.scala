package graft

import org.scalatest.funsuite.AnyFunSuite

/** Integration net: every declared query runs at sf0.001 and (except the
  * documented empty-capable ones) returns rows; every query has oracle
  * SQL; column names stay aligned between Spark results and the oracle
  * (the driver sorts columns by name before hashing).
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Round 8: the set is EMPTY — every declared query now has oracle SQL.
    * q_approx_distinct graduated to an error-bound oracle in round 6;
    * q_lsh_brp_topk graduated to the same envelope pattern in round 8
    * (exact top-k rows + in-flow recall_ok boolean). Kept as a named set
    * so a future genuinely non-SQL-expressible query has a documented
    * escape hatch.
    */
  val rowsOnly: Set[String] = Set.empty

  test("every declared query has oracle SQL (or is explicitly rows-only)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("entry returns rows (driver t1 smoke shape)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001 and returns rows") {
      val n = fn(spark, TestSpark.sf0001).count()
      assert(n > 0, s"$name returned no rows at sf0.001")
    }
  }

  test("q_lsh_brp_topk self-assertion: recall_ok holds on every row") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.Advanced.queries("q_lsh_brp_topk")(spark, TestSpark.sf0001)
    assert(rows.where(not(col("recall_ok"))).count() == 0)
    assert(rows.count() > 0)
  }

  test("q_hard_negatives: every mined negative has a label unlike its probe's") {
    import org.apache.spark.sql.functions._
    val d = TestSpark.sf0001
    val probeLabels = Tables.embeddings(spark, d).where(col("vec_id") < 3)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val rows = graft.queries.VectorQ.queries("q_hard_negatives")(spark, d).collect()
    assert(rows.nonEmpty)
    // exactly 3 negatives per probe, ranks 1..3, distances non-decreasing
    rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L))
      val dists = rs.sortBy(_.getLong(1)).map(_.getDouble(4))
      assert(dists.toSeq == dists.sorted.toSeq)
      rs.foreach(r => assert(r.getInt(3) != probeLabels(qid),
        s"qid=$qid mined a SAME-label row ${r.getLong(2)}"))
    }
  }

  test("q_knn_graph: no self-edges, ranks 1..k, neighbors share the vector's cell") {
    import org.apache.spark.sql.functions._
    val d = TestSpark.sf0001
    val cellOf = graft.operators.AnnSearch
      .ivfAssign(Tables.embeddings(spark, d), nCells = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val rows = graft.queries.Analysis.queries("q_knn_graph")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (v, rk, nbr) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(v != nbr, s"self-edge at $v")
      assert(rk >= 1 && rk <= 3)
      assert(cellOf(v) == cellOf(nbr), s"$v -> $nbr crosses cells (blocking broken)")
    }
    // distances non-decreasing within each vector's adjacency list
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val dists = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(dists.toSeq == dists.sorted.toSeq)
    }
  }

  test("q_lsh_incremental equals full LSH pairs restricted to a new side") {
    import org.apache.spark.sql.functions._
    val d = TestSpark.sf0001
    val full = graft.queries.Analysis.queries("q_minhash_lsh")(spark, d)
      .where(col("id_a") % 5 === 0 || col("id_b") % 5 === 0)
    val inc = graft.queries.Analysis.queries("q_lsh_incremental")(spark, d)
    assert(inc.count() > 0)
    assert(inc.exceptAll(full).count() == 0 && full.exceptAll(inc).count() == 0)
  }

  test("anomaly flags agree with a naive mean/stddev z-score (guard-banded)") {
    import org.apache.spark.sql.functions._
    val d = TestSpark.sf0001
    val flagged = graft.queries.Stats.queries("q_anomaly_zscore")(spark, d)
      .collect().map(r => r.getLong(0)).toSet
    val stats = Tables.events(spark, d)
      .groupBy(col("event_type"))
      .agg(avg(col("value")).as("mu"), stddev_samp(col("value")).as("sd"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val rows = Tables.events(spark, d)
      .select(col("event_id"), col("event_type"), col("value")).collect()
    rows.foreach { r =>
      val (mu, sd) = stats(r.getString(1))
      val z = math.abs(r.getDouble(2) - mu) / sd
      val id = r.getLong(0)
      // guard bands keep the check away from the float knife-edge at z=3
      if (z > 3.01) assert(flagged.contains(id), s"missed anomaly id=$id z=$z")
      if (z < 2.99) assert(!flagged.contains(id), s"false flag id=$id z=$z")
    }
    assert(flagged.nonEmpty)
  }

  test("mixture rebalance keeps ~n_min per language (binomial bound)") {
    import org.apache.spark.sql.functions._
    val d = TestSpark.sf0001
    val kept = graft.queries.Analysis.queries("q_mixture_rebalance")(spark, d)
      .groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val counts = Tables.documents(spark, d)
      .groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMin = counts.values.min
    counts.foreach { case (lang, n) =>
      val k = kept.getOrElse(lang, 0L)
      assert(k <= n, s"$lang kept more than it has")
      // E[kept] = n_min for every language; 5-sigma binomial band
      assert(math.abs(k - nMin) <= 5 * math.sqrt(nMin.toDouble) + 1,
        s"$lang kept $k, expected ~$nMin of $n")
    }
  }

  test("time-decay shiftleft clamp: k >= 63 stays positive and saturates at 2^-62") {
    // unclamped, k=63 divides by 1L<<63 = Long.MIN_VALUE (negative term)
    // and k=100 by the mod-64-wrapped 1<<36 — the clamp pins both to 2^-62
    import spark.implicits._
    val terms = Seq((0L, 1.0), (62L, 1.0), (63L, 1.0), (100L, 1.0))
      .toDF("k", "wsum")
      .withColumn("term", org.apache.spark.sql.functions.expr(
        "wsum / cast(shiftleft(1L, cast(least(k, 62) AS int)) AS double)"))
      .orderBy("k").collect().map(_.getDouble(2))
    assert(terms.forall(_ > 0.0))
    assert(terms(0) == 1.0)
    assert(terms(1) == terms(2) && terms(2) == terms(3))
  }
}
