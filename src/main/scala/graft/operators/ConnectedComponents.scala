package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list — the
  * missing step between near-dup PAIR detection (Dedup.*) and actual
  * deduplication: pairs form a graph, a dedup group is a connected
  * component, and the keep-row is the component's canonical (minimum) id.
  *
  * Algorithm: minimum-label propagation (the same scheme as GraphX /
  * Pregel connectedComponents). Every node starts labeled with its own
  * id; each round every node takes the min of its own label and its
  * neighbors' labels; fixpoint = components labeled by their min id.
  *
  * Scale shape (the 100 TB question):
  *  - each round is ONE equi-join of the edge list against the label
  *    relation (shuffle on node id) plus ONE groupBy(node) min — both
  *    partial-aggregated map-side; nothing is ever collected to the
  *    driver, and the driver-side `while` loops over ROUNDS, not rows;
  *  - rounds needed = graph diameter. Near-dup graphs are extremely
  *    shallow — LSH/banding candidates form near-cliques within blocks,
  *    so diameter is small and bounded in practice (3–5 observed). For
  *    adversarial long-chain graphs the alternating large-star/small-star
  *    scheme (Kiveris et al., "Connected Components in MapReduce and
  *    Beyond", SoCC'14) drops rounds to O(log n); the loop below is the
  *    drop-in site for it;
  *  - every round `localCheckpoint`s the label relation: iterative plans
  *    otherwise nest the full lineage once per round and Catalyst
  *    re-optimizes/re-executes an exponentially growing tree. On a real
  *    cluster this would be `checkpoint` against reliable storage.
  *
  * Convergence is detected with a `limit(1)` existence probe on changed
  * labels (short-circuits; no full count), and `maxRounds` is a safety
  * valve that THROWS rather than silently returning a partially-merged
  * labeling.
  */
object ConnectedComponents {

  /** Assign every node its component's minimum id.
    *
    * @param nodes single-column relation of node ids (name `id`); nodes
    *              absent from `edges` come out as their own singleton
    *              component
    * @param edges two-column relation (`id_a`, `id_b`) of undirected
    *              edges; ids must be non-null
    * @return (`id`, `cluster_id`) with one row per input node
    */
  def assign(nodes: DataFrame, edges: DataFrame, maxRounds: Int = 25): DataFrame = {
    // Symmetrize once: propagation below only follows src -> dst.
    val adj = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint()

    var labels = nodes.select(col("id"), col("id").as("cluster_id")).localCheckpoint()
    var round = 0
    while (round < maxRounds) {
      // Min label among each node's in-neighbors (absent for isolated nodes).
      val nbrMin = adj
        .join(labels.select(col("id").as("src"), col("cluster_id").as("nl")), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("nl")).as("nbr_min"))
      // Carry the previous label through the checkpoint so convergence
      // detection is a scan of the materialized relation, not another
      // join against the prior round.
      val next = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
            .as("cluster_id"),
          col("cluster_id").as("prev"))
        .localCheckpoint()
      val changed = next.where(col("cluster_id") =!= col("prev")).limit(1).count()
      labels = next.select(col("id"), col("cluster_id"))
      if (changed == 0L) return labels
      round += 1
    }
    throw new IllegalStateException(
      s"connected components did not converge in $maxRounds rounds — " +
        "graph diameter exceeds the bound; raise maxRounds or switch the " +
        "propagation loop to alternating large-star/small-star")
  }
}
