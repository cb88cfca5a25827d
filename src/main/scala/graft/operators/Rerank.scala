package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance (MMR) rerank — the diversification pass a
  * vector-serving pipeline runs AFTER candidate generation: greedily pick
  * k items maximizing `rel − λ·max_sim(item, already-picked)`, trading
  * relevance against redundancy (Carbonell & Goldstein 1998).
  *
  * Scale shape: candidate generation is the distributed part (top-N scan
  * / IVF probe); MMR itself is O(k·N²) on N ≤ a few hundred candidates.
  * It is still expressed as dataflow (pairwise-sim relation + k
  * argmax-join rounds, localCheckpoint'd like the other iterative
  * operators) rather than a driver-side loop over collected rows, so the
  * same code serves one query or a whole batch of queries partitioned by
  * query id.
  */
object Rerank {

  /** `cand`: (id, rel, pairwise-similarity source column already joined —
    * see `sims`). `sims`: (ia, ib, sim) complete pairwise similarity over
    * the candidate ids. Returns (pick 1..k, id, rel, mmr) where the first
    * pick's mmr equals its rel (no penalty yet). Ties at every argmax
    * break on ascending id; rel/sim are expected pre-rounded by the
    * caller if cross-engine determinism matters.
    */
  def mmrSelect(cand: DataFrame, sims: DataFrame, k: Int,
      lambda: Double): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val c = cand.select(col("id"), col("rel")).localCheckpoint()
    val p = sims.localCheckpoint()
    var selected = c.orderBy(col("rel").desc, col("id").asc).limit(1)
      .select(lit(1L).as("pick"), col("id"), col("rel"), col("rel").as("mmr"))
      .localCheckpoint()
    for (i <- 2 to k) {
      val maxSim = p.join(selected.select(col("id").as("ib")), Seq("ib"))
        .groupBy(col("ia")).agg(max(col("sim")).as("msim"))
        .withColumnRenamed("ia", "id")
      val next = c
        .join(selected.select(col("id")), Seq("id"), "left_anti")
        .join(maxSim, Seq("id"))
        .select(lit(i.toLong).as("pick"), col("id"), col("rel"),
          (col("rel") - lit(lambda) * col("msim")).as("mmr"))
        .orderBy(col("mmr").desc, col("id").asc).limit(1)
      selected = selected.unionAll(next).localCheckpoint()
    }
    selected
  }
}
