package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Throwaway diagnostic: how many propagation rounds does the sf0.1
  * dup graph actually need? (not part of the suite narrative — delete
  * freely)
  */
class CCRoundProbe extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("probe: propagation round count on the sf0.1 dup graph") {
    val d = "/root/testdata/sf0.1"
    val pairs = graft.queries.Analysis.queries("q_jaccard_neardup")(spark, d)
      .select(col("id_a"), col("id_b"))
    val nodes = Tables.documents(spark, d).select(col("doc_id").as("id"))
    val adj = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint()
    var labels = nodes.select(col("id"), col("id").as("cluster_id")).localCheckpoint()
    var round = 0
    var changed = 1L
    while (changed > 0 && round < 30) {
      val nbrMin = adj
        .join(labels.select(col("id").as("src"), col("cluster_id").as("nl")), Seq("src"))
        .groupBy(col("dst").as("id")).agg(min(col("nl")).as("nbr_min"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id"))).as("cluster_id"),
          col("cluster_id").as("prev")).localCheckpoint()
      changed = next.where(col("cluster_id") =!= col("prev")).limit(1).count()
      labels = next.select(col("id"), col("cluster_id"))
      round += 1
      info(s"round $round changed=$changed")
    }
    info(s"converged after $round rounds (last round observes the fixpoint)")
    assert(changed == 0)
  }
}
