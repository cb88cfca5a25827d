package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lloyd k-means over an embedding column in scaled-integer arithmetic —
  * the clustering primitive a SemDeDup-style semantic-dedup pipeline runs
  * first (cluster the corpus, then prune near-identical vectors inside
  * each cluster instead of all-pairs over the corpus).
  *
  * Reference analogue: the reference's only vector structure is a flat
  * FAISS index (/root/reference/vectorDB.py:12,38 — no clustering, no IVF
  * training); k-means is the capability that turns that flat scan into a
  * trained coarse quantizer at 100 TB, and SURVEY §2.3 commits the engine
  * to the scale path the reference lacks.
  *
  * Determinism contract (the whole point of the integer design): every
  * quantity compared or stored is exact.
  *   - input vectors are scaled once: v_d = floor(x_d · 10^6) as BIGINT
  *     (float widens to double exactly; ×10^6 and floor are identical
  *     IEEE ops in Spark and DuckDB);
  *   - distances are BIGINT sums of squared BIGINT diffs (|v_d| ≤ ~10^7
  *     ⇒ per-dim square ≤ 10^14, ×64 dims ≪ 2^63 — no overflow);
  *   - centroid updates divide exactly once per (cluster, dim):
  *     c_d = floor(double(Σ v_d) / n). Σ v_d ≤ 10^7·|cluster| stays well
  *     under 2^53, so the double quotient and its floor are bit-identical
  *     cross-engine;
  *   - assignment ties break on the lower centroid id.
  *
  * Scale shape (100 TB): centroids are k·d integers — broadcast to every
  * task (the assign step is a broadcast nested-loop over a BOUNDED k,
  * i.e. a map-side argmin, no shuffle of the corpus). The update step is
  * one partial-aggregated shuffle of at most k·d cells (posexplode →
  * groupBy (cid, pos) rides map-side combine, so the shuffle carries
  * k·d·partitions rows, independent of corpus size). Iterations multiply
  * cost linearly; k grows ∝ √N for IVF training and the broadcast stays
  * tiny.
  */
object KMeansOp {

  /** floor(x·10^6) per element, BIGINT — the shared integer scale. */
  def intVec(emb: Column): Column =
    graft.functions.VectorFoldExpression.intVec(emb)

  /** Integer squared L2 between two equal-length BIGINT array columns.
    * Compiled native (r21): the previous HOF spelling
    * (`aggregate(zip_with(a,b,(x,y)⇒(x−y)²), 0L, acc+v)`) ran
    * interpreted per element on the hottest loop of the integer-ANN
    * tier — IntVectorSpec pins bit-equality between the two forms,
    * null/length edges included.
    */
  def intDist(a: Column, b: Column): Column =
    graft.functions.VectorFoldExpression.intSquaredL2(a, b)

  /** Nearest-centroid assignment: one row per vector with its winning
    * (cluster id, integer distance). `vecs` must have (vec_id, v);
    * `cents` must have (cid, c). k is bounded ⇒ the crossJoin is an
    * explicit broadcast (map-side argmin, no shuffle of `vecs`); the
    * argmin itself is a partial-aggregable min over a (dist, cid, v)
    * struct — (dist, cid) is unique per group, so the trailing v rides
    * along without influencing the order.
    */
  def assign(vecs: DataFrame, cents: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(cents))
      .select(col("vec_id"),
        struct(intDist(col("v"), col("c")).as("dist"),
          col("cid"), col("v")).as("cand"))
      .groupBy(col("vec_id"))
      .agg(min(col("cand")).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"),
        col("m.dist").as("dist"), col("m.v").as("v"))

  /** [[assign]] for callers that need only the CLUSTER (and its
    * distance), not the vector back: the argmin struct carries just
    * (dist, cid), so the N·k candidate rows flowing through the
    * aggregate are 16 B each instead of hauling a copy of the d-dim
    * vector per candidate — at k = ⌈√N⌉ that payload was the dominant
    * cost of the full-corpus assignment (N·k·d·8 B of transient array
    * churn). Same (dist, cid) tie-break, identical cluster decisions.
    */
  def assignCells(vecs: DataFrame, cents: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(cents))
      .select(col("vec_id"),
        struct(intDist(col("v"), col("c")).as("dist"), col("cid")).as("cand"))
      .groupBy(col("vec_id"))
      .agg(min(col("cand")).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"), col("m.dist").as("dist"))

  /** Recompute centroids from an assignment: per (cluster, dim) exact
    * integer mean, floor-divided through an exact double (see contract).
    * Emits (cid, c); clusters that lost every member simply disappear.
    */
  def update(assigned: DataFrame): DataFrame =
    assigned.select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("cid"), col("pos"))
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
      .withColumn("cv", floor(col("sx").cast("double") / col("n")).cast("long"))
      .groupBy(col("cid"))
      .agg(array_sort(collect_list(struct(col("pos"), col("cv")))).as("arr"))
      .select(col("cid"), transform(col("arr"), s => s.getField("cv")).as("c"))

  /** Full Lloyd loop: seed centroids = the vectors with the k LOWEST ids
    * (identical to the id<k convention of AnnSearch.ivfAssign when ids are
    * dense from 0, but well-defined for any id space), run `iters`
    * assign→update rounds, return the FINAL assignment
    * (vec_id, cluster, dist_scaled).
    *
    * Centroids are materialized to the DRIVER between rounds (k·d BIGINTs
    * — bounded by the algorithm, not the data; the same pattern as
    * VectorOps.queryVector and MLlib's own KMeans). This is the scale
    * decision, not a convenience: lazy chaining would nest every previous
    * round inside the final plan, re-scanning the corpus
    * (iters+1)·(iters+2)/2 times in one job; collected centroids truncate
    * the lineage so each round is exactly ONE corpus pass, and the next
    * assign broadcasts a LocalRelation. Values are unchanged (the integer
    * contract makes the roundtrip exact).
    */
  def lloyd(emb: DataFrame, idCol: String, embCol: Column,
      k: Int, iters: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs = emb.select(col(idCol).as("vec_id"), intVec(embCol).as("v"))
    val cents = lloydCentroidsLocal(emb, idCol, embCol, k, iters)
    assignCells(vecs, cents.toDF("cid", "c"))
      .select(col("vec_id"), col("cid").as("cluster"),
        col("dist").as("dist_scaled"))
  }

  /** The trained centroids themselves, as driver-local values — the
    * coarse quantizer an IVF index keeps after training. k·d BIGINTs,
    * bounded by the algorithm; exactly the per-round materialization
    * `lloyd` performs anyway, surfaced so search-time code can pick probe
    * cells without another corpus pass.
    */
  def lloydCentroidsLocal(emb: DataFrame, idCol: String, embCol: Column,
      k: Int, iters: Int): Seq[(Long, Seq[Long])] =
    lloydCentroidsLocalInt(
      emb.select(col(idCol).as("vec_id"), intVec(embCol).as("v")), k, iters)

  /** [[lloydCentroidsLocal]] over ALREADY-SCALED integer vectors
    * (vec_id, v BIGINT array) — the entry point for quantizing derived
    * integer spaces (e.g. IVFADC residuals), where re-applying the
    * float→int scale would be wrong.
    */
  def lloydCentroidsLocalInt(vecs: DataFrame,
      k: Int, iters: Int): Seq[(Long, Seq[Long])] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    var cents = vecs.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("cid"), col("v").as("c"))
      .as[(Long, Seq[Long])].collect().toSeq
    require(cents.size == k,
      s"k-means needs k=$k seed vectors but the input has only ${cents.size}")
    for (_ <- 1 to iters)
      cents = update(assign(vecs, cents.toDF("cid", "c")))
        .select(col("cid"), col("c"))
        .as[(Long, Seq[Long])].collect().toSeq
    cents
  }

  /** Integer squared L2 between two driver-local vectors (probe-cell
    * selection against the bounded centroid set).
    */
  def intDistLocal(a: Seq[Long], b: Seq[Long]): Long =
    a.iterator.zip(b.iterator).map { case (x, y) => (x - y) * (x - y) }.sum

  /** The `n` nearest coarse cells to a driver-local query vector —
    * THE probe-cell selection convention, in one place: order by
    * (distance, cid) ascending, ties to the LOWER cid (the shared
    * engine/oracle contract every IVF query and the DuckDB `rn <= n`
    * chains encode). Bounded: |cents| entries, driver-side.
    */
  def nearestCells(cents: Seq[(Long, Seq[Long])], query: Seq[Long],
      n: Int): Seq[Long] =
    cents.map { case (cid, c) => (cid, intDistLocal(c, query)) }
      .sortBy { case (cid, d) => (d, cid) }
      .take(n).map(_._1)

  /** [[lloydCentroidsLocalInt]] computed entirely IN MEMORY over an
    * already-collected point set — bit-identical semantics (seed = the
    * k lowest ids, assignment min by (dist, cid), update = floor of
    * the exact-double per-dim mean, empty clusters disappear), so the
    * DuckDB oracle chains replay it unchanged.
    *
    * This is how production IVF builds actually train (FAISS runs
    * k-means on a bounded in-memory sample on one node, then assigns
    * the corpus): when the training set is algorithm-bounded — e.g.
    * the 16·⌈√N⌉ hash-ranked sample of the √N quantizer, 16·√N·d·8 B ≈
    * 3.7 MB at the 100× probe and ~260 MB at N = 10^9 — a distributed
    * Lloyd round pays S·k row materialization + a shuffle per round
    * for work a single JVM does in milliseconds. The corpus-sized
    * stages (the sample ranking and the final full assignment) stay
    * distributed.
    */
  def lloydCentroidsInMemory(pts: Seq[(Long, Seq[Long])], k: Int,
      iters: Int): Seq[(Long, Seq[Long])] = {
    val sorted = pts.sortBy(_._1).map { case (id, v) => (id, v.toArray) }
    require(sorted.size >= k,
      s"k-means needs k=$k seed vectors but the input has only ${sorted.size}")
    def dist(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    var cents: Seq[(Long, Array[Long])] =
      sorted.take(k).map { case (id, v) => (id, v.clone()) }
    for (_ <- 1 to iters) {
      val assigned = sorted.map { case (_, v) =>
        var bestCid = 0L; var bestDist = Long.MaxValue
        cents.foreach { case (cid, c) =>
          val dd = dist(v, c)
          if (dd < bestDist || (dd == bestDist && cid < bestCid)) {
            bestDist = dd; bestCid = cid
          }
        }
        (bestCid, v)
      }
      cents = assigned.groupBy(_._1).toSeq.map { case (cid, members) =>
        val dim = members.head._2.length
        cid -> Array.tabulate(dim) { j =>
          var s = 0L
          members.foreach(m => s += m._2(j))
          // exact LONG sum through one exact double division, floored —
          // identical to update()'s floor(double(Σ) / n)
          math.floor(s.toDouble / members.length).toLong
        }
      }.sortBy(_._1)
    }
    cents.map { case (cid, c) => (cid, c.toSeq) }
  }
}
