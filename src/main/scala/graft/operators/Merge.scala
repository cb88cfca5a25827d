package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD-1-style change application (the MERGE statement's semantics)
  * without a lake format: one left join of base against the change set
  * on the key — updates overwrite their payload columns, deletes drop
  * the row, untouched rows pass through unchanged.
  *
  * Scale shape: ONE equi-join shuffled on the merge key (changes are
  * normally ≪ base, so AQE broadcasts them); no row of the base is
  * rewritten unless keyed by a change — the classic copy-on-write merge
  * a table format would do per-file, expressed relationally.
  *
  * Inserts (op 'I') are a disjoint concern — rows not present in the
  * base by definition don't join; append them with
  * `result.unionByName(inserts)` after an anti-join guard.
  */
object Merge {

  /** Apply (key, op, payload...) changes to `base`. `changes` must have
    * the key column, `opCol` with values 'U' (update) or 'D' (delete),
    * and payload columns NAMED AS IN BASE — each is overwritten on 'U'.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCol: String,
                   opCol: String = "op"): DataFrame = {
    val payload = changes.columns.filterNot(c => c == keyCol || c == opCol)
    // The join below injects __op/__n_changes/__u_* working columns; a
    // base or change schema that already uses one of those names would
    // otherwise surface as an opaque ambiguous-reference AnalysisException
    // deep in the plan — reject it as a contract error up front.
    val internal = Set("__op", "__n_changes") ++ payload.map("__u_" + _)
    val clash = (base.columns ++ changes.columns).toSet.intersect(internal)
    require(clash.isEmpty,
      s"column(s) ${clash.mkString(",")} collide with Merge's internal " +
        "working columns (__op, __n_changes, __u_<payload>)")
    require(payload.forall(base.columns.contains),
      s"change payload columns ${payload.mkString(",")} must exist in base")
    // SQL MERGE's single-match invariant: a key with >1 change row would
    // fan out the join and silently duplicate base rows — raise at
    // runtime instead (the count is a cheap aggregate over the small
    // change set, evaluated with the change row itself).
    val dupGuard = changes.groupBy(col(keyCol)).agg(count(lit(1)).as("__n_changes"))
    val chg = changes.join(dupGuard, Seq(keyCol)).select(
      (col(keyCol) +:
        when(col("__n_changes") > 1,
          raise_error(concat(lit("multiple change rows for merge key "), col(keyCol))))
          .otherwise(col(opCol)).as("__op") +:
        payload.map(c => col(c).as("__u_" + c))).toIndexedSeq: _*)
    base.join(chg, Seq(keyCol), "left")
      .where(col("__op").isNull || col("__op") =!= "D")
      .select(base.columns.toIndexedSeq.map { c =>
        if (payload.contains(c))
          when(col("__op") === "U", col("__u_" + c)).otherwise(col(c)).as(c)
        else col(c)
      }: _*)
  }
}
