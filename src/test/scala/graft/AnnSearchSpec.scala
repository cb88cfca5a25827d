package graft

import graft.functions.VectorOps
import graft.operators.AnnSearch
import org.scalatest.funsuite.AnyFunSuite

class AnnSearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val emb = Tables.embeddings(spark, TestSpark.sf0001)
  lazy val q = VectorOps.queryVector(spark, TestSpark.sf0001, 0L)

  test("exact L2 top-k: query vector itself ranks first with distance 0") {
    val top = AnnSearch.l2TopK(emb, q, 5).collect()
    assert(top.head.getLong(0) == 0L && top.head.getDouble(1) == 0.0)
    val dists = top.map(_.getDouble(1)).toSeq
    assert(dists == dists.sorted)
  }

  test("cosine top-k: query vector itself has cosine 1") {
    val top = AnnSearch.cosineTopK(emb, q, 5).collect()
    assert(top.head.getLong(0) == 0L)
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-12)
  }

  test("IVF assignment: every vector lands in exactly one valid cell") {
    val assign = AnnSearch.ivfAssign(emb, nCells = 8)
    val n = emb.count()
    assert(assign.count() == n)
    val cells = assign.select("cell").distinct().collect().map(_.getLong(0))
    assert(cells.forall(c => c >= 0 && c < 8))
    // centroids assign to themselves (distance 0 to own cell)
    val selfCells = assign.where(org.apache.spark.sql.functions.col("vec_id") < 8)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(selfCells.forall { case (v, c) => v == c })
  }

  test("IVF search: subset of exact results, decent recall, query found") {
    val k = 10
    val exact = AnnSearch.l2TopK(emb, q, k).collect().map(_.getLong(0)).toSet
    val approx = AnnSearch.ivfSearch(emb, q, nCells = 16, nProbe = 4, k = k)
      .collect().map(_.getLong(0)).toSet
    assert(approx.contains(0L))
    val recall = (exact & approx).size.toDouble / k
    assert(recall >= 0.3, s"IVF recall $recall unexpectedly low even for nProbe=4/16")
  }

  test("MLlib BRP-LSH: finds the query vector, reasonable recall vs exact") {
    val k = 10
    val exact = AnnSearch.l2TopK(emb, q, k).collect().map(_.getLong(0)).toSet
    val lsh = AnnSearch.brpLshNeighbors(emb, q, k).collect()
    assert(lsh.length == k)
    val ids = lsh.map(_.getLong(0)).toSet
    assert(ids.contains(0L)) // the query vector itself
    assert((exact & ids).size >= k / 2, s"LSH recall under 50% vs exact")
  }

  test("rpLshSearch returns at most k rows, in raw-cosine order") {
    val all = AnnSearch.rpLshSearch(emb, q, nPlanes = 2, k = 1000).collect()
    assert(all.length > 1, "2-plane bucket should hold several vectors")
    val k = math.max(all.length - 1, 1)
    val top = AnnSearch.rpLshSearch(emb, q, nPlanes = 2, k = k).collect()
    assert(top.length == k)
    assert(top.map(_.getLong(0)).toSeq == all.take(k).map(_.getLong(0)).toSeq)
    val cos = top.map(_.getDouble(1)).toSeq
    assert(cos == cos.sorted.reverse)
  }

  test("MLlib MinHashLSH approxSimilarityJoin finds near-identical docs") {
    import spark.implicits._
    val base = (1 to 40).map("t" + _)
    val docs = Seq(
      (1L, base), (2L, base.updated(3, "x")), (3L, (100 to 140).map("z" + _))
    ).toDF("id", "items")
    val pairs = AnnSearch.minhashLshMllib(docs, "id",
        org.apache.spark.sql.functions.col("items"), threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }
}
