package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting over an undirected edge list — the
  * standard clustering/cohesion primitive for relationally-derived
  * graphs (here: which trade partners also trade with each other).
  *
  * Scale shape: the naive wedge join (every node pairs all its
  * neighbors) is O(Σ deg²) — a single hub node with 10M neighbors
  * enumerates 10¹⁴ wedges. The fix is the classic degree orientation
  * (Cohen, "Graph Twiddling in a MapReduce World", CiSE'09; also the
  * GraphX `TriangleCount` scheme): direct every edge from its
  * lower-(degree, id) endpoint to the higher one, and only build wedges
  * out of a node's OUT-neighbors. Every node's out-degree is then
  * O(√m), so wedge volume is bounded by O(m^1.5) regardless of skew,
  * and each triangle is emitted exactly once — at its unique vertex
  * with two out-edges.
  *
  * Both phases are plain equi-joins (shuffle on node id / canonical
  * pair), so AQE and map-side partial aggregation apply; nothing is
  * collected to the driver.
  */
object Triangles {

  /** Count the triangles each node participates in.
    *
    * @param nodes single-column relation (`id`); nodes in no triangle
    *              come out with `n_tri = 0`
    * @param edges two-column relation (`id_a`, `id_b`) of undirected
    *              edges; self-loops and duplicate/reversed edges are
    *              canonicalized away
    * @return (`id`, `n_tri`) with one row per input node
    */
  def perNode(nodes: DataFrame, edges: DataFrame): DataFrame = {
    // Canonical undirected edge set: a < b, distinct.
    val und = edges.where(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .distinct()
      .localCheckpoint() // consumed by three branches below
    val deg = und.select(col("a").as("id"))
      .union(und.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    // Orient low-(deg, id) -> high-(deg, id); struct comparison gives the
    // lexicographic tiebreak that makes the orientation acyclic.
    val oriented = und
      .join(deg.select(col("id").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("deg").as("db")), Seq("b"))
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("a")).otherwise(col("b")).as("src"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("b")).otherwise(col("a")).as("dst"))
    // Wedges at each pivot's out-neighborhood (dst1 < dst2 dedups the
    // unordered pair), closed against the canonical edge set.
    val triangles = oriented.select(col("src"), col("dst").as("y"))
      .join(oriented.select(col("src"), col("dst").as("z")), Seq("src"))
      .where(col("y") < col("z"))
      .join(und, least(col("y"), col("z")) === col("a") &&
        greatest(col("y"), col("z")) === col("b"), "left_semi")
    val perNodeCounts = triangles
      .select(explode(array(col("src"), col("y"), col("z"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_tri"))
    nodes.select(col("id"))
      .join(perNodeCounts, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }
}
