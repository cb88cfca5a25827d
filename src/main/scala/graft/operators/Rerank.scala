package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance (MMR) rerank — the diversification pass a
  * vector-serving pipeline runs AFTER candidate generation: greedily pick
  * k items maximizing `rel − λ·max_sim(item, already-picked)`, trading
  * relevance against redundancy (Carbonell & Goldstein 1998).
  *
  * Scale shape: candidate generation is the distributed part (top-N scan
  * / IVF probe); MMR itself is O(k·N²) on N ≤ a few hundred candidates
  * PER QUERY. The batch form (`mmrSelectBatch`) is the real serving
  * shape: every greedy round is ONE dataflow job whose argmax is a
  * per-query-id window `row_number`, so k rounds serve an arbitrary
  * number of concurrent queries — round count never depends on the
  * probe-set size, and each round shuffles on the compact (qid, id) key.
  * The single-query `mmrSelect` is the batch form with one constant qid.
  */
object Rerank {

  /** Batched MMR over many queries at once. `cand`: (qid, id, rel) — each
    * query id's candidate list. `sims`: (qid, ia, ib, sim) — complete
    * pairwise similarity within each qid's candidates. Returns
    * (qid, pick 1..k, id, rel, mmr); the first pick's mmr equals its rel
    * (no penalty yet). Ties at every per-qid argmax break on ascending
    * id; rel/sim are expected pre-rounded by the caller if cross-engine
    * determinism matters. A qid with fewer than k candidates simply stops
    * contributing rows once exhausted.
    *
    * `boundedDeltas = Some(n)`: every capped relation — the candidate
    * list, the pairwise sims (≤ nQids·N², the dominant term for n), and
    * each round's one-row-per-qid delta — materializes as a driver
    * LocalRelation via [[Iterate.boundedLocal]] instead of a
    * checkpoint, so SMALL-BATCH serving (where the algorithm bounds all
    * of them) leaves zero executor-cached blocks behind, loudly guarded
    * by n. Large fan-out batches keep the default checkpoint caps,
    * where these relations stay distributed.
    */
  def mmrSelectBatch(cand: DataFrame, sims: DataFrame, k: Int,
      lambda: Double, checkpointDir: Option[String] = None,
      boundedDeltas: Option[Int] = None): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val ck: DataFrame => DataFrame = boundedDeltas match {
      case Some(n) => Iterate.boundedLocal(_, n)
      case None => Iterate.cap(checkpointDir)
    }
    val c = ck(cand.select(col("qid"), col("id"), col("rel")))
    val p = ck(sims)
    val w1 = Window.partitionBy(col("qid"))
      .orderBy(col("rel").desc, col("id").asc)
    val first = ck(c.withColumn("rn", row_number().over(w1))
      .where(col("rn") === 1)
      .select(col("qid"), lit(1L).as("pick"), col("id"), col("rel"),
        col("rel").as("mmr")))
    // Each round materializes only its DELTA (one row per qid); the
    // running selection is a lazy union of the already-checkpointed
    // deltas, so lineage stays flat without re-materializing a growing
    // relation every round (round 5's slowest query was exactly that
    // re-checkpoint overhead).
    val picks = scala.collection.mutable.ListBuffer(first)
    for (i <- 2 to k) {
      val selected = picks.reduce(_ unionAll _)
      val maxSim = p
        .join(selected.select(col("qid"), col("id").as("ib")), Seq("qid", "ib"))
        .groupBy(col("qid"), col("ia")).agg(max(col("sim")).as("msim"))
        .withColumnRenamed("ia", "id")
      val wi = Window.partitionBy(col("qid"))
        .orderBy(col("mmr").desc, col("id").asc)
      val next = c
        .join(selected.select(col("qid"), col("id")), Seq("qid", "id"), "left_anti")
        .join(maxSim, Seq("qid", "id"))
        .select(col("qid"), col("id"), col("rel"),
          (col("rel") - lit(lambda) * col("msim")).as("mmr"))
        .withColumn("rn", row_number().over(wi))
        .where(col("rn") === 1)
        .select(col("qid"), lit(i.toLong).as("pick"), col("id"), col("rel"),
          col("mmr"))
      picks += ck(next)
    }
    picks.reduce(_ unionAll _)
  }

  /** Single-query MMR: `cand`: (id, rel); `sims`: (ia, ib, sim) complete
    * pairwise similarity over the candidate ids. Returns
    * (pick 1..k, id, rel, mmr). Delegates to `mmrSelectBatch` with one
    * constant query id.
    */
  def mmrSelect(cand: DataFrame, sims: DataFrame, k: Int,
      lambda: Double, boundedDeltas: Option[Int] = None): DataFrame =
    mmrSelectBatch(
      cand.select(lit(0L).as("qid"), col("id"), col("rel")),
      sims.select(lit(0L).as("qid"), col("ia"), col("ib"), col("sim")),
      k, lambda, boundedDeltas = boundedDeltas)
      .select(col("pick"), col("id"), col("rel"), col("mmr"))
}
