package graft

import graft.queries.Clustering
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClusteringSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("int8 quantization: codes bounded, reconstruction error <= scale/2") {
    val q = Clustering.quantizeEmbeddings(spark, TestSpark.sf0001)
    val orig = Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
    val joined = q.join(orig, Seq("vec_id", "pos"))
      .select(col("qval"), col("scale"), col("x").cast("double").as("x"))
    val bad = joined.where(abs(col("qval")) > 127).count()
    assert(bad == 0, s"$bad codes outside [-127, 127]")
    val worst = joined
      .where(col("scale") > 0.0)
      .select(max(abs(col("qval") * col("scale") - col("x")) / col("scale")).as("m"))
      .head().getDouble(0)
    assert(worst <= 0.5 + 1e-9, s"max reconstruction error $worst * scale exceeds scale/2")
  }

  test("train split is exhaustive, deterministic, and ~80/10/10") {
    val a = Clustering.trainSplit(spark, TestSpark.sf0001)
      .groupBy(col("split")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Clustering.trainSplit(spark, TestSpark.sf0001)
      .groupBy(col("split")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
    val total = a.values.sum
    assert(a.keySet == Set("train", "val", "test"))
    assert(a("train") > total / 2)
  }
}
