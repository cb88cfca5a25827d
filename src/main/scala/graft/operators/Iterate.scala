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

  /** Reliable-checkpoint directory from the environment: set
    * `SPARK_GRAFT_CKPT_DIR` and every iterative declared query
    * (q_dup_clusters, q_corpus_build, q_pagerank) switches from
    * `localCheckpoint` to reliable `checkpoint` — the production path is
    * one env var, no code change.
    *
    * Cleanup contract: reliable checkpoints write one file set per round
    * per operator and Spark does NOT delete them at job end
    * (`spark.cleaner.referenceTracking.cleanCheckpoints` only cleans on
    * GC of the RDD reference — timing-dependent, not a guarantee). The
    * directory is scratch space scoped to the run: the job owner deletes
    * it after the application completes, e.g. a per-run subdirectory
    * removed by the orchestrator.
    */
  def envDir: Option[String] = sys.env.get("SPARK_GRAFT_CKPT_DIR")

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
