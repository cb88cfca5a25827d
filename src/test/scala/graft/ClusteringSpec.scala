package graft

import graft.queries.Clustering
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClusteringSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("canonIds: a mid-session documents-table content rewrite evicts " +
    "the cached derivation (content fingerprint, not dir, is the key)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_canon").toString
    def write(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
    write(Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "entirely different words occupy this one")))
    val first = Clustering.canonIds(spark, dir)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(first == Seq(1L, 3L), s"exact dup must collapse: $first")
    // rewrite IN PLACE: doc 2 becomes unique — a dir-keyed cache would
    // still return the stale {1, 3}
    write(Seq((1L, "alpha beta gamma delta"), (2L, "now a unique survivor text"),
      (3L, "entirely different words occupy this one")))
    val second = Clustering.canonIds(spark, dir)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(second == Seq(1L, 2L, 3L),
      s"content rewrite must invalidate the canon cache: $second")
  }

  test("bandTable/bucket-union property (ScalaCheck): empty sets never " +
    "band and stay singletons; identical sets share a cluster; star " +
    "edges give exactly the full same-bucket components") {
    import spark.implicits._
    import graft.operators.{ConnectedComponents, Dedup}
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.propBoolean
    // families mix the degenerate shapes: empty sets (sub-shingle-length
    // docs), single-item sets, a recurring identical set (exact-dup
    // block), and small random sets over a tight universe so bucket
    // collisions actually occur
    val genFamily: Gen[List[(Long, List[Long])]] = for {
      n <- Gen.choose(2, 9)
      sets <- Gen.listOfN(n, Gen.frequency(
        2 -> Gen.const(List.empty[Long]),
        2 -> Gen.choose(1L, 5L).map(List(_)),
        2 -> Gen.const(List(11L, 12L, 13L)),
        3 -> Gen.listOf(Gen.choose(1L, 8L)).map(_.distinct.sorted)))
    } yield sets.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val prop = Prop.forAllNoShrink(genFamily) { fam =>
      val sets = fam.toDF("id", "hsorted")
      val banded = Dedup.bandTable(sets, bands = 4, rowsPerBand = 3)
        .localCheckpoint()
      val bandedIds = banded.select("id").distinct().as[Long].collect().toSet
      val emptyIds = fam.filter(_._2.isEmpty).map(_._1).toSet
      val nodes = sets.select(col("id"))
      val anchors = banded.groupBy(col("bkey")).agg(min(col("id")).as("anchor"))
      val star = banded.join(anchors, Seq("bkey"))
        .where(col("id") =!= col("anchor"))
        .select(col("anchor").as("id_a"), col("id").as("id_b")).distinct()
      val full = banded.select(col("bkey"), col("id").as("id_a"))
        .join(banded.select(col("bkey"), col("id").as("id_b")), Seq("bkey"))
        .where(col("id_a") < col("id_b")).distinct()
      def comp(edges: org.apache.spark.sql.DataFrame) =
        ConnectedComponents.assignAdaptive(nodes, edges)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val cs = comp(star)
      val okEmptyNoBand = emptyIds.intersect(bandedIds).isEmpty
      val okEmptySingleton = emptyIds.forall(i => cs(i) == i)
      val okIdentShareCluster = fam.filter(_._2.nonEmpty).groupBy(_._2)
        .values.forall(g => g.map(x => cs(x._1)).toSet.size == 1)
      val okStarEqualsFull = cs == comp(full)
      Prop.all(
        okEmptyNoBand :| "empty set produced band rows",
        okEmptySingleton :| "empty set merged into a cluster",
        okIdentShareCluster :| "identical sets split across clusters",
        okStarEqualsFull :| "star edges diverged from full bucket cliques")
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("componentEdgesBySet: contracted edges give EXACTLY the components " +
    "of the full pair relation (adversarial fixture + real corpus)") {
    import spark.implicits._
    import graft.operators.{ConnectedComponents, Dedup}
    // fixture: two same-set cliques (one bridged to a near-dup set),
    // a cross-block same-set NON-pair, and singletons
    def set(xs: Long*) = xs.sorted
    val sets = Seq(
      ("b1", 1L, set(1, 2, 3, 4, 5, 6, 7, 8, 9, 10)),
      ("b1", 2L, set(1, 2, 3, 4, 5, 6, 7, 8, 9, 10)), // same set as 1
      ("b1", 3L, set(1, 2, 3, 4, 5, 6, 7, 8, 9, 10)), // same set as 1
      ("b1", 4L, set(1, 2, 3, 4, 5, 6, 7, 8, 20, 21)), // J≤0.73 vs all — separate
      ("b1", 5L, set(1, 2, 3, 4, 5, 6, 7, 8, 9)),     // J=9/10=0.9 vs 1 — bridges
      ("b1", 6L, set(1, 2, 3, 4, 5, 6, 7, 8, 9)),     // same set as 5
      ("b2", 7L, set(1, 2, 3, 4, 5, 6, 7, 8, 9, 10)), // same set, OTHER block
      ("b2", 8L, set(100)),                           // singleton
      ("b1", 9L, set()),                              // EMPTY set — Jaccard 0
      ("b1", 10L, set())                              // with everything, incl. 9
    ).toDF("block", "id", "items")
    val nodes = sets.select(col("id"))
    def clusters(edges: org.apache.spark.sql.DataFrame) =
      ConnectedComponents.assignAdaptive(nodes, edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = clusters(
      Dedup.jaccardPairsHashedFromSets(sets, 0.9).select(col("id_a"), col("id_b")))
    val contracted = clusters(Dedup.componentEdgesBySet(sets, 0.9))
    assert(contracted == full, "contracted components diverged")
    assert(full(2L) == 1L && full(5L) == 1L && full(6L) == 1L,
      "clique + bridge must share cluster 1")
    assert(full(4L) == 4L && full(7L) == 7L && full(8L) == 8L,
      "sub-threshold, cross-block, and singleton stay separate")
    assert(full(9L) == 9L && full(10L) == 10L,
      "empty sets have Jaccard 0 with everything — must stay singletons")
    // edge count: the full relation pairs the 3-clique (3 edges) + the
    // 2-clique (1) + bridges; contraction must emit FEWER edges here
    val nFull = Dedup.jaccardPairsHashedFromSets(sets, 0.9).count()
    val nContracted = Dedup.componentEdgesBySet(sets, 0.9).count()
    assert(nContracted < nFull, s"expected contraction to shrink edges " +
      s"($nContracted vs $nFull)")
    // and on the real corpus: q_dup_clusters (now contracted) must equal
    // the full-pair CC assignment
    val d = TestSpark.sf0001
    val docs = Tables.documents(spark, d)
    // same construction as Analysis.tokenSets (private[queries])
    val corpusSets = docs.select(col("source").as("block"),
      col("doc_id").as("id"),
      array_sort(array_distinct(transform(
        graft.operators.TextAnalysis.tokens(col("text")),
        t => graft.operators.TextAnalysis.md5Hash60(t)))).as("items"))
    val fullCorpus = ConnectedComponents.assignAdaptive(
        docs.select(col("doc_id").as("id")),
        Dedup.jaccardPairsHashedFromSets(corpusSets, 0.9)
          .select(col("id_a"), col("id_b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Clustering.dupClusters(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == fullCorpus, "q_dup_clusters diverged from full-pair components")
  }

  test("dupClustersLsh: every VERIFIED minhash pair shares a component; " +
    "edge input stays O(N·bands)") {
    val d = TestSpark.sf0001
    val comp = Clustering.dupClustersLsh(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = Tables.documents(spark, d)
    assert(comp.size == docs.count())
    // by construction: a verified pair shared a band bucket → one star
    val verified = graft.queries.Analysis.queries("q_minhash_lsh")(spark, d)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(verified.nonEmpty, "fixture should contain verified near-dups")
    for ((a, b) <- verified)
      assert(comp(a) == comp(b), s"verified pair ($a,$b) split across components")
    // scale shape: star edges are bounded by rows of the band table
    val banded = graft.operators.Dedup.bandTable(
      graft.operators.Dedup.hashedSets(docs, "doc_id",
        graft.operators.TextAnalysis.shingles(col("text"), 3)),
      bands = 4, rowsPerBand = 3)
    val anchors = banded.groupBy(col("bkey")).agg(min(col("id")).as("anchor"))
    val nEdges = banded.join(anchors, Seq("bkey"))
      .where(col("id") =!= col("anchor")).count()
    assert(nEdges <= docs.count() * 4, s"edges $nEdges exceed N·bands")
  }

  test("corpus builds compose: v3's kept docs ⊆ exact build's; lsh build " +
    "never keeps both sides of a verified near-dup pair") {
    val d = TestSpark.sf0001
    def keptDocs(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select(col("doc_id")).distinct().collect().map(_.getLong(0)).toSet
    val base = keptDocs(Clustering.corpusBuild(spark, d))
    val v3 = keptDocs(Clustering.corpusBuildV3(spark, d))
    assert(v3.subsetOf(base),
      "the √N SemDeDup stage may only REMOVE docs from the exact build")
    assert(v3.nonEmpty, "v3 must keep a non-trivial corpus")
    // the capped build refines the SAME k=8 quantizer's clusters into
    // ≤16-member buckets, so its prune pairs ⊆ v2's — it may only KEEP
    // MORE than v2 (and still only remove from the exact build)
    val v2 = keptDocs(Clustering.corpusBuildV2(spark, d))
    val capped = keptDocs(Clustering.corpusBuildCapped(spark, d))
    assert(v2.subsetOf(capped),
      "the capped prune dropped a doc the uncapped k=8 prune kept")
    assert(capped.subsetOf(base),
      "the capped SemDeDup stage may only REMOVE docs from the exact build")
    val lsh = keptDocs(Clustering.corpusBuildLsh(spark, d))
    assert(lsh.nonEmpty)
    // a verified minhash pair shares a band bucket → one LSH component →
    // at most one of the two can be its component's canonical rep
    val exactSurvivors = Tables.documents(spark, d)
      .groupBy(md5(col("text").cast("binary")))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val verified = graft.queries.Analysis.queries("q_minhash_lsh")(spark, d)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => exactSurvivors(a) && exactSurvivors(b) }
    assert(verified.nonEmpty, "fixture should contain verified near-dups")
    for ((a, b) <- verified)
      assert(!(lsh(a) && lsh(b)),
        s"verified near-dup pair ($a,$b) both survived the LSH build")
  }

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
