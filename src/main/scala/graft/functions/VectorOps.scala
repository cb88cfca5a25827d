package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vector math over `ARRAY<FLOAT>` embedding columns, built purely from
  * codegen'd higher-order functions (`transform`/`zip_with`/`aggregate`) —
  * no UDFs, so the expressions stay inside whole-stage codegen and the
  * column scan still prunes/pushes down.
  *
  * Semantics follow the reference's FAISS `IndexFlatL2` usage: distance is
  * **squared** L2 (no sqrt) over unnormalized vectors
  * (reference `vectorDB.py:12,38`, `rag_model_mass.py:37`), and the 0–10
  * score is `10 / (1 + d)` (reference `rag_model_mass.py:13-15`).
  *
  * Determinism (SURVEY.md §2.4 rule 3): elements are cast to DOUBLE before
  * any arithmetic and folds are strict left-to-right (`aggregate` is a
  * sequential fold), so Spark and the DuckDB oracle (`list_reduce`) produce
  * bit-identical doubles.
  */
object VectorOps {

  /** `ARRAY<FLOAT>` → `ARRAY<DOUBLE>` (rule: cast before arithmetic). */
  def toDoubleArr(a: Column): Column = transform(a, x => x.cast("double"))

  /** Left-to-right sum fold of a double array. */
  private def foldSum(a: Column): Column =
    aggregate(a, lit(0.0), (acc, v) => acc + v)

  /** Squared L2 distance between two DOUBLE arrays. */
  def squaredL2(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => (x - y) * (x - y)))

  /** Squared L2 distance of a FLOAT-array column to a fixed query vector. */
  def squaredL2ToQuery(emb: Column, q: Seq[Double]): Column =
    squaredL2(toDoubleArr(emb), typedLit(q))

  /** Dot product of two DOUBLE arrays. */
  def dot(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => x * y))

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two DOUBLE arrays (0 when either norm is 0). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = l2Norm(a) * l2Norm(b)
    when(n === 0.0, 0.0).otherwise(d / n)
  }

  def cosineToQuery(emb: Column, q: Seq[Double]): Column =
    cosine(toDoubleArr(emb), typedLit(q))

  /** Reference score normalization: squared-L2 distance → 0–10
    * (`rag_model_mass.py:13-15`). Rounding left to the caller (rule 3).
    */
  def score(dist: Column): Column = lit(10.0) / (lit(1.0) + dist)

  /** Fetch one embedding as a driver-side Seq[Double] to broadcast as a
    * literal (SURVEY.md C4: compute once on driver, embed in the plan).
    * One tiny lookup per query build — pushed down to a `vec_id = id` scan.
    */
  def queryVector(spark: SparkSession, sfDir: String, id: Long = 0L): Seq[Double] = {
    val row = graft.Tables.embeddings(spark, sfDir)
      .where(col("vec_id") === id).select(col("embedding")).head()
    row.getSeq[Float](0).map(_.toDouble).toSeq
  }
}
