package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage cap for iterative dataflows (connected components, PageRank,
  * MMR): every round must materialize its relation, or Catalyst
  * re-optimizes and re-executes a plan tree that nests once per round.
  *
  * Two strategies, chosen by the caller per run:
  *   - `checkpointDir = None` (default): `localCheckpoint()` — blocks
  *     cached on the executors that computed them. Fast (no FS round
  *     trip), but the truncated lineage means a lost executor's blocks
  *     cannot be recomputed and the job dies with it — the test/local
  *     path.
  *   - `checkpointDir = Some(dir)`: reliable `checkpoint()` against a
  *     fault-tolerant filesystem (HDFS/object store). The 100 TB path:
  *     iteration state survives executor loss; lineage is truncated the
  *     same way.
  */
private[graft] object Iterate {

  /** Materialize `df` and truncate its lineage per the chosen strategy.
    * Setting the SparkContext checkpoint dir is idempotent; distinct
    * concurrent dirs on one context are not supported (last wins), which
    * matches SparkContext semantics.
    */
  def cap(dir: Option[String])(df: DataFrame): DataFrame = dir match {
    case Some(d) =>
      val sc = df.sparkSession.sparkContext
      if (!sc.getCheckpointDir.contains(d)) sc.setCheckpointDir(d)
      df.checkpoint()
    case None => df.localCheckpoint()
  }
}
