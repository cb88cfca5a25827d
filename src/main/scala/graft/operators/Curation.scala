package graft.operators

import graft.operators.{TextAnalysis => TA}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation — the composed 100 TB pipeline the
  * north star asks for, built entirely from the tested operator pieces:
  *
  *  1. exact dedup: keep the min-id canonical per md5(text);
  *  2. near-dup removal: MinHash+LSH over 3-gram shingles; for every
  *     verified pair (id_a < id_b) drop the higher id — greedy,
  *     deterministic, order-free (a transitive cluster loses everything
  *     but its least id unless a kept doc's only link was through a
  *     dropped one — the standard greedy approximation);
  *  3. quality gating: language-ID and the composite quality score.
  *
  * Each stage is a shuffle on a compact key (hash / id) — text bodies
  * move at most once per stage; nothing collects to the driver.
  */
object Curation {

  /** Curate (doc_id, text, ...) rows: returns the surviving docs with
    * their language prediction and quality score.
    *
    * `sharedSets`: an optional prebuilt `(id, hsorted)` shingle-hash
    * relation (Dedup.hashedSets) covering at least the input docs — e.g.
    * a cached signature table shared with a standalone LSH pass. Extra
    * ids are ignored (the relation is semi-joined down to the exact-dedup
    * survivors, and a doc's signature depends only on its own text, so
    * restriction ≡ recomputation). Passing one avoids re-running the
    * shingle→md5 pass per plan branch.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             keepLangs: Seq[String], minQuality: Double,
             bands: Int = 4, rowsPerBand: Int = 3,
             nearDupThreshold: Double = 0.5,
             sharedSets: Option[DataFrame] = None): DataFrame = {
    val ids = docs.select(col(idCol), col(textCol))
    // 1. exact dedup
    val canonical = ids
      .groupBy(md5(col(textCol).cast("binary")).as("h"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    val exactKept = ids.join(canonical, Seq(idCol), "left_semi")
    // 2. near-dup drop (higher id of each verified pair)
    val sets = sharedSets
      .map(_.join(exactKept.select(col(idCol).as("id")), Seq("id"), "left_semi"))
      .getOrElse(Dedup.hashedSets(exactKept, idCol, TA.shingles(col(textCol), 3)))
    val drops = Dedup.minhashNearDupFromSets(sets, bands, rowsPerBand, nearDupThreshold)
      .select(col("id_b").as(idCol)).distinct()
    val nearKept = exactKept.join(drops, Seq(idCol), "left_anti")
    // 3. quality gate
    nearKept
      .withColumn("lang_pred", TA.langId(col(textCol)))
      .withColumn("quality", TA.qualityScore(col(textCol)))
      .where(col("lang_pred").isInCollection(keepLangs) &&
        col("quality") >= minQuality)
      .select(col(idCol), col("lang_pred"), col("quality"))
  }
}
