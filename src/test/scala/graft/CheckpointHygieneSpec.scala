package graft

import org.scalatest.funsuite.AnyFunSuite

/** Long-lived-session hygiene: the multi-branch queries that used to pin
  * corpus-sized localCheckpoint blocks (knnGraph self-join, MMR
  * candidate sets) must leave NO persistent RDD blocks behind after they
  * complete — knnGraph through AQE exchange reuse (the self-join's two
  * identical shuffles materialize once), the MMR family through
  * algorithm-bounded LocalRelations (Iterate.boundedLocal).
  */
class CheckpointHygieneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("knnGraph / mmrTopk / mmrBatch leave no persistent RDD blocks") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    for (name <- Seq("q_knn_graph", "q_mmr_topk", "q_mmr_batch")) {
      val n = queries.Analysis.queries(name)(spark, TestSpark.sf0001).collect().length
      assert(n > 0, s"$name returned no rows")
    }
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"queries left persistent RDD blocks: $leaked")
  }

  test("knnGraph self-join reuses one shuffle for both sides at runtime") {
    val df = queries.Analysis.queries("q_knn_graph")(spark, TestSpark.sf0001)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("ReusedQueryStage") || finalPlan.contains("ReusedExchange"),
      s"expected AQE to reuse the assignment shuffle; final plan:\n$finalPlan")
  }

  test("boundedLocal is loud when the declared bound is violated") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("x")
    intercept[IllegalArgumentException] {
      operators.Iterate.boundedLocal(df, maxRows = 2)
    }
    assert(operators.Iterate.boundedLocal(df, maxRows = 3)
      .queryExecution.analyzed.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
  }
}
