package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-probe harness: materialize a 10×-rows sf1 dataset from the
  * sf0.1 driver tables, run the heaviest queries once at each scale,
  * and report per-query wall-clock scaling ratios. The point is the
  * cheapest possible tripwire for accidentally-superlinear stages
  * before a real 100× scale-up would hit them: with 10× rows, a
  * linear-with-data query should land near 10× (modulo fixed overheads
  * pulling it DOWN and log factors pushing it UP); anything well past
  * ~12× is flagged for a plan audit.
  *
  * sf1 construction (deterministic, seeded by (id, copy, position)):
  * ten key-shifted copies of every fact table, with the two content
  * tables perturbed so duplicate-structure does not explode
  * artificially:
  *  - `documents` copies 1-9 RESAMPLE each token from the sf0.1
  *    corpus's empirical word distribution (same Zipf mass, same
  *    per-doc token counts, new texts — near-dup rates stay
  *    representative instead of every doc gaining 9 exact twins);
  *  - `embeddings` copies 1-9 add small deterministic noise
  *    (±5e-3 per dim) so vectors are distinct but the cluster
  *    geometry is preserved;
  *  - TPC-H facts shift every join key by copy·(max+1) consistently
  *    (orders ↔ lineitem ↔ customer/part/supplier), so join fan-outs
  *    are exactly the sf0.1 ones, 10× over; `nation`/`region` stay
  *    unscaled (dimensions, as in TPC-H's own scaling rules).
  */
object ScaleProbe {

  /** Median of reps — the ONE spelling every probe main shares
    * (ScaleProbe, ScaleProbe100, MediaProbe, LshDriftProbe; review
    * r20: four drifting copies collapsed to this).
    */
  private[graft] def medianOf(xs: Seq[Double]): Double = {
    val s = xs.sorted; val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** The heaviest queries by the medians artifact, plus the scale-path
    * corpus builds (v3 = √N SemDeDup, lsh = bucket-union components)
    * whose ratios gate the round-11 composition work.
    */
  val heavy: Seq[String] = Seq(
    "q_bigram_lm", "q_corpus_build_v2", "q_collocations", "q_corpus_build",
    "q_dup_gram_ppm", "q_decontaminate", "q_edit_distance_dedup",
    "q_dup_clusters", "q_dup_clusters_lsh", "q_vocab_growth", "q_tpch_q21", "q_tpch_q20",
    "q_repeated_spans", "q_tpch_q2", "q_interval_join", "q_mmr_batch",
    "q_semdedup_scaled", "q_semdedup_sampled", "q_corpus_build_v3", "q_corpus_build_lsh",
    // round 12: every remaining >1 s-median query — the pairwise dedup
    // relations especially, whose boundedness was previously argued
    // from the CC family's measurements rather than measured
    "q_jaccard_neardup", "q_simhash_neardup", "q_curate", "q_tfidf",
    "q_pagerank", "q_profile", "q_match_single", "q_mmr_topk",
    "q_tpch_q7", "q_tpch_q16", "q_tpch_q18", "q_interval_agg",
    // round 14: the PQ tier — training is ~iters·m bounded-aggregate
    // corpus passes, encode is one shuffle-free projection, ADC reads
    // codes only; all three should land near-linear in rows
    "q_pq_codes", "q_ann_pq", "q_ann_ivfpq", "q_ann_ivfpq_res",
    "q_ann_pq_batch",
    // round 14: BPE trainer — rounds run over the DISTINCT-word vocab,
    // which grows Heaps-sublinearly in corpus size (the probe corpus
    // resamples from the same word distribution, so vocab growth is
    // the realistic new-tail rate); apply is corpus-linear
    // (the r15 _vocab/_floor variants are prefix views of the same
    // cached schedule — q_bpe_train's row IS their scaling story)
    "q_bpe_train", "q_bpe_train_apply",
    // round 15: coarse-filtered batch ADC serving + its recall monitor
    // — one indexProjection scan, broadcast cell/LUT joins, one
    // aggregation; the recall adds one exact broadcast-probe scan
    "q_ann_ivfpq_batch", "q_recall_ivfpq_batch",
    // round 16: the reference's shortlist served from the compressed
    // index — probed-cells ADC top-5 + score projection, near-linear —
    // and batch serving over the residual encoding (same scan shape as
    // q_ann_ivfpq_batch plus the residual projection)
    "q_shortlist_ann", "q_ann_ivfpq_res_batch",
    // round 17: serving-tier completion — the partitioned-index probe
    // (directory-pruned scan: rows-per-cell grow 10×, so ~linear with a
    // smaller constant than the filter-everything scan), the exact
    // refine (ADC scan + a 10-row broadcast fetch — the fetch is
    // fixed-cost, the scan linear), and the SQ8 code-space scan
    // (one projection, linear)
    "q_ann_ivfpq_part", "q_ann_ivfpq_rerank", "q_sq8_topk",
    // IVF_SQ8: the probed-cell scan over scalar codes — linear in the
    // probed fraction, fixed costs dominating at these sizes
    "q_ann_ivf_sq8",
    // round 18: the persisted-partitioned serving tiers (directory-
    // pruned reads of pre-built indexes — the index writes are
    // derivations, pre-built below), the per-dim SQ8 scan, batch
    // IVF_SQ8, the capped SemDeDup (pairwise Σ|bucket|² ≤ N·cap —
    // should land ~linear where scaled/sampled are N^1.5), and the CDC
    // recall monitor over the pre-built lifecycle state
    "q_ann_ivfpq_res_part", "q_ann_ivf_sq8_part", "q_ann_ivf_sq8_batch",
    "q_sq8_dim", "q_semdedup_capped", "q_recall_cdc",
    "q_ann_ivfpq_batch_part", "q_ann_ivfpq_res_batch_part",
    "q_corpus_build_capped",
    // round 19: the per-dim SQ8 persisted/batch tiers (directory-pruned
    // reads; the index write is a derivation below), the SQ8 CDC
    // recall monitor over its pre-built lifecycle state, and the OPQ
    // ADC scan (one code projection + map-literal lookups — the
    // q_ann_pq shape over permuted slices, expected near-linear)
    "q_sq8_dim_part", "q_sq8_dim_batch", "q_recall_cdc_sq8", "q_ann_opq",
    // round 19, late: the per-dim SQ8 CDC recall monitor over its
    // pre-built lifecycle state (same probed-cell live-scan shape as
    // q_recall_cdc_sq8, decode instead of query-encode)
    "q_recall_cdc_sq8dim",
    // round 20: the OPQ serving tiers (directory-pruned reads of the
    // pre-built permuted index — the same _part/_batch shapes as the
    // plain-PQ tiers) and the OPQ CDC recall monitor over its
    // pre-built lifecycle state
    "q_ann_opq_part", "q_ann_opq_batch", "q_recall_cdc_opq")

  private def mix(a: Long, b: Long, c: Long): Long = {
    var h = a * 0x9E3779B97F4A7C15L + b * 0xC2B2AE3D27D4EB4FL + c * 0x165667B19E3779F9L
    h ^= (h >>> 33); h *= 0xFF51AFD7ED558CCDL; h ^= (h >>> 33)
    h
  }

  private def maxOf(df: DataFrame, c: String): Long =
    df.agg(max(col(c))).head().getLong(0) + 1

  /** Write the two CONTENT tables (documents resampled from the source
    * corpus's empirical word distribution, embeddings with small
    * deterministic noise) scaled `copies`× under `dst` — shared by the
    * full sf1 build and the docs-only sf10 build.
    */
  private def writeDocsEmb(spark: SparkSession, src: String, dst: String,
      copies: Int): Unit = {
    def copied(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until copies).map(i => f(df, i)).reduce(_ unionAll _)

    // documents: resample tokens from the empirical word distribution
    val docs = Tables.documents(spark, src)
    val wordCum: Array[(String, Long)] = {
      val counts = docs.select(explode(split(col("text"), " ")).as("w"))
        .where(col("w") =!= "").groupBy("w").count()
        .orderBy(col("w")).collect().map(r => (r.getString(0), r.getLong(1)))
      var acc = 0L
      counts.map { case (w, c) => acc += c; (w, acc) }
    }
    val totalW = wordCum.last._2
    val resample = udf((text: String, docId: Long, copy: Int) =>
      if (copy == 0) text
      else {
        val n = text.split(" ").length
        val sb = new StringBuilder
        var p = 0
        while (p < n) {
          val u = java.lang.Long.remainderUnsigned(mix(docId, copy.toLong, p.toLong), totalW)
          var lo = 0; var hi = wordCum.length - 1
          while (lo < hi) {
            val m = (lo + hi) / 2
            if (wordCum(m)._2 > u) hi = m else lo = m + 1
          }
          if (p > 0) sb.append(' ')
          sb.append(wordCum(lo)._1)
          p += 1
        }
        sb.toString
      })
    val nd = maxOf(docs, "doc_id")
    copied(docs) { (df, i) =>
      df.select((col("doc_id") + lit(i * nd)).as("doc_id"),
        resample(col("text"), col("doc_id"), lit(i)).as("text"),
        col("lang"), col("source"))
    }.withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    // embeddings: deterministic per-dim noise for copies > 0
    val emb = Tables.embeddings(spark, src)
    val nv = maxOf(emb, "vec_id")
    val perturb = udf((e: Seq[Float], vecId: Long, copy: Int) =>
      if (copy == 0) e
      else e.zipWithIndex.map { case (x, dim) =>
        x + ((java.lang.Long.remainderUnsigned(
          mix(vecId, copy.toLong, dim.toLong), 1001L) - 500L) * 1e-5f)
      })
    copied(emb) { (df, i) =>
      df.select((col("vec_id") + lit(i * nv)).as("vec_id"),
        perturb(col("embedding"), col("vec_id"), lit(i)).as("embedding"),
        col("label"))
    }.write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
  }

  /** Documents+embeddings-only scaled dir (idempotent) — the sf10 probe
    * input: the probed linear content paths read nothing else, and
    * skipping the TPC-H facts keeps a 100× build cheap.
    */
  def buildDocsOnly(spark: SparkSession, src: String, dst: String, copies: Int): Unit = {
    val okPath = java.nio.file.Paths.get(dst, "_GENERATED_OK")
    if (java.nio.file.Files.exists(okPath)) return
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dst))
    writeDocsEmb(spark, src, dst, copies)
    java.nio.file.Files.createFile(okPath)
  }

  /** Build the sf1 tables under `dst` (idempotent via an _OK marker). */
  def buildSf1(spark: SparkSession, src: String, dst: String, copies: Int = 10): Unit = {
    val okPath = java.nio.file.Paths.get(dst, "_GENERATED_OK")
    if (java.nio.file.Files.exists(okPath)) return
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dst))
    writeDocsEmb(spark, src, dst, copies)

    def copied(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until copies).map(i => f(df, i)).reduce(_ unionAll _)

    // TPC-H facts: consistent key shifts
    val cust = Tables.table(spark, src, "customer")
    val supp = Tables.table(spark, src, "supplier")
    val part = Tables.table(spark, src, "part")
    val ord = Tables.table(spark, src, "orders")
    val li = Tables.table(spark, src, "lineitem")
    val (ncst, nsup, nprt, nord) =
      (maxOf(cust, "c_custkey"), maxOf(supp, "s_suppkey"),
        maxOf(part, "p_partkey"), maxOf(ord, "o_orderkey"))
    copied(cust) { (df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i * ncst))
    }.write.mode("overwrite").parquet(s"$dst/customer.parquet")
    copied(supp) { (df, i) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(i * nsup))
    }.write.mode("overwrite").parquet(s"$dst/supplier.parquet")
    copied(part) { (df, i) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(i * nprt))
    }.write.mode("overwrite").parquet(s"$dst/part.parquet")
    copied(ord) { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * nord))
        .withColumn("o_custkey", col("o_custkey") + lit(i * ncst))
    }.write.mode("overwrite").parquet(s"$dst/orders.parquet")
    copied(li) { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * nord))
        .withColumn("l_partkey", col("l_partkey") + lit(i * nprt))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * nsup))
    }.write.mode("overwrite").parquet(s"$dst/lineitem.parquet")

    // events: shift ids/users, keep the time axis (10× density)
    val ev = Tables.events(spark, src)
    val (nev, nus) = (maxOf(ev, "event_id"), maxOf(ev, "user_id"))
    copied(ev) { (df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * nev))
        .withColumn("user_id", col("user_id") + lit(i * nus))
    }.write.mode("overwrite").parquet(s"$dst/events.parquet")

    // dimensions: unscaled copies
    for (t <- Seq("nation", "region"))
      Tables.table(spark, src, t)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")

    java.nio.file.Files.createFile(okPath)
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val outFile = if (args.length > 2) args(2) else "BENCH_SF1_PROBE.json"
    // args 4+ restrict the probe to the named queries (re-probe after a fix)
    val selected = if (args.length > 3) heavy.filter(args.drop(3).contains) else heavy
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    buildSf1(spark, src, dst)
    // warm both table sets (footers, codegen)
    for (d <- Seq(src, dst); t <- Tables.names) {
      try {
        val df = if (t == "events") Tables.events(spark, d) else Tables.table(spark, d, t)
        df.limit(1).count()
      } catch { case _: Throwable => () }
    }
    // pre-build the session-cached trained artifacts per dir (the
    // ScaleProbe100 discipline), RECORDING each build's wall time into
    // the artifact ("derivations_sec", r18 verdict #3/#4): without the
    // pre-build, whichever ANN query runs FIRST at each dir is charged
    // for quantizer training — and q_ann_ivfpq_part for its one-time
    // partitionBy(cell) index write — inflating its ratio into the
    // >12x tripwire this harness exists to keep trustworthy; without
    // the STAMP, a derivation regression hides in whichever rep ran
    // first (q_bpe_train probed 31.7x at r18 precisely because the
    // merge-schedule build was unstamped here while Bench stamps it)
    val derivSecs: Seq[(String, Double)] = (for {
      (tag, d) <- Seq("base" -> src, "probe" -> dst)
      (dn, f) <- Seq[(String, () => Unit)](
        // r20: q_vocab_growth now consumes the shared shingle-set
        // signature relation (like the LSH queries always did here) —
        // pre-build it so no probed row is charged the build
        "shingle_sets" -> (() => { queries.Analysis.shingleSets(spark, d).count(); () }),
        "quantizer_fixed_k" -> (() => { queries.SemanticQ.trainedCentroids(spark, d); () }),
        "pq_codebooks" -> (() => { queries.SemanticQ.pqCodebooks(spark, d); () }),
        // resCodebooks EXPLICITLY, not only via the index build: a
        // _SUCCESS-cached index dir skips its build closure, and the
        // first residual query of the session would then be charged
        // the codebook training (a build-time derivation)
        "res_codebooks" -> (() => { queries.SemanticQ.resCodebooks(spark, d); () }),
        "ivfpq_part_index" -> (() => { queries.SemanticQ.partitionedCodesPath(spark, d); () }),
        "ivfpqres_part_index" -> (() => { queries.SemanticQ.partitionedResCodesPath(spark, d); () }),
        "ivfsq8_index" -> (() => { queries.SemanticQ.sq8IndexPath(spark, d); () }),
        "sq8dim_index" -> (() => { queries.SemanticQ.sq8DimIndexPath(spark, d); () }),
        "cdc_lifecycle" -> (() => { queries.SemanticQ.cdcLifecycleDir(spark, d); () }),
        "cdc_lifecycle_sq8" -> (() => { queries.SemanticQ.cdcLifecycleSq8Dir(spark, d); () }),
        "cdc_lifecycle_sq8dim" -> (() => { queries.SemanticQ.cdcLifecycleSq8DimDir(spark, d); () }),
        "opq_books" -> (() => { queries.SemanticQ.opqBooks(spark, d); () }),
        "ivfopq_part_index" -> (() => { queries.SemanticQ.partitionedOpqCodesPath(spark, d); () }),
        "cdc_lifecycle_opq" -> (() => { queries.SemanticQ.cdcLifecycleOpqDir(spark, d); () }),
        "bpe_merges" -> (() => { queries.Analysis.cachedMergeSchedule(spark, d); () }),
        "bigram_mult" -> (() => { queries.Retrieval.bigramDocMult(spark, d).count(); () }),
        "bigram_score" -> (() => { queries.Retrieval.bigramScore(spark, d).count(); () }))
    } yield {
      val t0 = System.nanoTime()
      try f() catch { case _: Throwable => () }
      s"$dn.$tag" -> (System.nanoTime() - t0) / 1e9
    })
    // Timing executes a noop-format WRITE, not .count(): a count lets
    // Catalyst prune unreferenced projections and drop sorts, so a
    // projection-only stage (BPE counts, cosine projections) would be
    // optimized out of the probed plan and its superlinearity would go
    // unmeasured. The noop sink materializes every output column through
    // the full plan — the same work Verify's parquet write executes,
    // minus the IO.
    def time(name: String, d: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // reps medians (SPARK_GRAFT_PROBE_REPS, default 1): single-shot sf1
    // ratios varied up to 2x across runs — the flagged tail re-probes at
    // reps=3 so round-over-round ratio deltas are trustworthy.
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "1").toInt.max(1)
    val rows = selected.map { name =>
      // base twice per rep (take the min: cheap insurance against a
      // stall window), probe `reps` times with the median reported —
      // the 10× runs are the expensive part
      val base = ScaleProbe.medianOf((1 to reps).map(_ => math.min(time(name, src), time(name, src))))
      val probe = medianOf((1 to reps).map(_ => time(name, dst)))
      val ratio = if (base > 0) probe / base else -1.0
      println(f"[probe] $name%-24s base=$base%7.2fs probe=$probe%8.2fs ratio=$ratio%6.2fx")
      (name, base, probe, ratio)
    }
    val djson = derivSecs.map { case (k, v) => s"${Jsons.escape(k)}:$v" }
      .mkString(",")
    val json = rows.map { case (n, b, p, r) =>
      s"${Jsons.escape(n)}:{" + s""""base_sec":$b,"probe_sec":$p,"ratio":$r}"""
    }.mkString(
      s"""{"probe":"sf1","rows_ratio":10,"base":${Jsons.escape(src)},""" +
        s""""probe_dir":${Jsons.escape(dst)},"cpus":$cpus,"reps":$reps,""" +
        s""""timing":"noop_write","derivations_sec":{$djson},"queries":{""",
      ",", "}}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    println(json)
  }
}

/** 100×-rows probe of the LINEAR content paths — the measured answer to
  * "would this hold at 100× the data", not an extrapolation from 10×.
  * Builds docs-only dirs at 10× and 100× the sf0.1 content tables (the
  * probed queries read documents/embeddings exclusively) and reports
  * each query's wall at 1×/10×/100× with both ratios.
  *
  * `q_corpus_build_v3` is deliberately NOT here: its near-dup canon
  * stage is the pinned EXACT contract (intrinsic Ω(pairs); the probe
  * corpus's near-dup quasi-clique grows the true pair set ∝ N², so at
  * 500k docs that stage alone is billions of pairs) — the bucket-union
  * LSH build in this list is the composition that replaces it at scale,
  * which is exactly the claim this probe measures. SemDeDup at k=⌈√N⌉
  * is N^1.5 by design (train + within-cluster pairs both ~N·√N) — it is
  * probed to MEASURE that exponent, with sub-N² expected, not ~10×.
  *
  * Shared session-cached derivations (shingle sets, the √N quantizer)
  * are pre-built per dir with their wall time recorded in the artifact
  * ("derivations_sec"), so per-query numbers are marginal-cost numbers
  * with the derivation cost visible beside them instead of buried in
  * whichever rep ran first.
  */
object ScaleProbe100 {

  val linear: Seq[String] = Seq(
    "q_corpus_build_lsh", "q_dup_clusters_lsh", "q_semdedup_scaled", "q_bm25_topk",
    // round 17: the sample-trained sibling whose training derivation
    // is the point of the rerun — quantizer_sqrt_n_sampled should be
    // near-linear where quantizer_sqrt_n was ~72x at 100x rows
    "q_semdedup_sampled",
    // round 14: the most expensive bench query (~5.8 s median) had sf1
    // evidence only — reads documents exclusively, so the docs-only
    // probe dirs cover it; expected ~linear (distinct-bigram growth is
    // sub-linear in occurrences by Zipf, joins run on compressed grain)
    "q_bigram_lm",
    // round 17: the serving tier at 100× rows — embeddings-only, so the
    // docs-only dirs cover them. The partitioned-index probe should
    // track |probed cells|/k of the 100× code table (the quantizers and
    // the one-time index write are derivations, recorded separately);
    // SQ8 and the refine are one corpus scan + fixed work
    "q_sq8_topk", "q_ann_ivfpq_part", "q_ann_ivfpq_rerank",
    // round 18: the capped SemDeDup (the linear replacement for the
    // N^1.5 scaled/sampled prune — this probe measures exactly that
    // claim), the residual + SQ8 partitioned serving tiers (index
    // writes are derivations below), and the per-dim SQ8 scan
    "q_semdedup_capped", "q_ann_ivfpq_res_part", "q_ann_ivf_sq8_part",
    "q_sq8_dim",
    // round 19: the per-dim SQ8 persisted tier — should track
    // |probed cells|/k of the 100× code table like the other _part
    // queries (the index write is a derivation below)
    "q_sq8_dim_part",
    // round 20 (r19 verdict #6): the CDC recall monitors at 100× rows
    // (the lifecycle fixtures are pre-built derivations below — the
    // monitors then pay the probed-cell LIVE scan + the exact
    // broadcast-probe scan, both linear) and the OPQ serving tiers
    // (the same directory-pruned _part/_batch shapes as plain PQ;
    // allocation + permuted books + index write are derivations)
    "q_recall_cdc", "q_recall_cdc_sq8", "q_recall_cdc_sq8dim",
    "q_recall_cdc_opq", "q_ann_opq", "q_ann_opq_part", "q_ann_opq_batch")

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mid = if (args.length > 1) args(1) else "/tmp/graft_sf10_mid"
    val dst = if (args.length > 2) args(2) else "/tmp/graft_sf10"
    val outFile = if (args.length > 3) args(3) else "BENCH_SF10_PROBE.json"
    val selected = if (args.length > 4) linear.filter(args.drop(4).contains) else linear
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ScaleProbe.buildDocsOnly(spark, src, mid, copies = 10)
    ScaleProbe.buildDocsOnly(spark, src, dst, copies = 100)
    val dirs = Seq("base" -> src, "mid" -> mid, "probe" -> dst)
    for ((_, d) <- dirs; t <- Seq("documents", "embeddings"))
      try graft.Tables.table(spark, d, t).limit(1).count()
      catch { case _: Throwable => () }
    // pre-build the session-cached derivations per dir, recording wall
    val derivSecs: Seq[(String, Double)] = (for {
      (tag, d) <- dirs
      (dn, f) <- Seq[(String, () => Unit)](
        "shingle_sets" -> (() => { queries.Analysis.shingleSets(spark, d).count(); () }),
        "quantizer_sqrt_n" -> (() => { queries.SemanticQ.scaledCentroids(spark, d); () }),
        "quantizer_sqrt_n_sampled" -> (() => { queries.SemanticQ.sampledCentroids(spark, d); () }),
        // the serving-tier trained artifacts: the fixed-k coarse
        // quantizer + PQ codebooks (bounded Lloyd fits, linear corpus
        // passes) and the ONE-TIME cell-partitioned index write the
        // q_ann_ivfpq_part probe then serves from
        "quantizer_fixed_k" -> (() => { queries.SemanticQ.trainedCentroids(spark, d); () }),
        "pq_codebooks" -> (() => { queries.SemanticQ.pqCodebooks(spark, d); () }),
        // explicit, not only via the index build: a _SUCCESS-cached
        // index skips its build closure, and the first residual query
        // would otherwise be charged the codebook training
        "res_codebooks" -> (() => { queries.SemanticQ.resCodebooks(spark, d); () }),
        "bigram_mult" -> (() => { queries.Retrieval.bigramDocMult(spark, d).count(); () }),
        "bigram_score" -> (() => { queries.Retrieval.bigramScore(spark, d).count(); () }),
        "ivfpq_part_index" -> (() => { queries.SemanticQ.partitionedCodesPath(spark, d); () }),
        "ivfpqres_part_index" -> (() => { queries.SemanticQ.partitionedResCodesPath(spark, d); () }),
        "ivfsq8_index" -> (() => { queries.SemanticQ.sq8IndexPath(spark, d); () }),
        "sq8dim_index" -> (() => { queries.SemanticQ.sq8DimIndexPath(spark, d); () }),
        // round 20: the OPQ artifacts and every CDC lifecycle fixture —
        // the monitors' state builds are derivations, so their 100×
        // rows measure the SERVING scan, not the fixture drive (the
        // r19 _SUCCESS-cache lesson: an unbuilt fixture charges its
        // whole lifecycle to the first timed rep)
        "opq_books" -> (() => { queries.SemanticQ.opqBooks(spark, d); () }),
        "ivfopq_part_index" -> (() => { queries.SemanticQ.partitionedOpqCodesPath(spark, d); () }),
        "cdc_lifecycle" -> (() => { queries.SemanticQ.cdcLifecycleDir(spark, d); () }),
        "cdc_lifecycle_sq8" -> (() => { queries.SemanticQ.cdcLifecycleSq8Dir(spark, d); () }),
        "cdc_lifecycle_sq8dim" -> (() => { queries.SemanticQ.cdcLifecycleSq8DimDir(spark, d); () }),
        "cdc_lifecycle_opq" -> (() => { queries.SemanticQ.cdcLifecycleOpqDir(spark, d); () }))
    } yield {
      val t0 = System.nanoTime()
      try f() catch { case _: Throwable => () }
      s"$dn.$tag" -> (System.nanoTime() - t0) / 1e9
    })
    def time(name: String, d: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "1").toInt.max(1)
    val rows = selected.map { name =>
      val base = ScaleProbe.medianOf((1 to reps).map(_ => math.min(time(name, src), time(name, src))))
      val m = ScaleProbe.medianOf((1 to reps).map(_ => time(name, mid)))
      val p = ScaleProbe.medianOf((1 to reps).map(_ => time(name, dst)))
      val rm = if (base > 0) m / base else -1.0
      val rp = if (base > 0) p / base else -1.0
      println(f"[probe100] $name%-22s base=$base%7.2fs mid=$m%8.2fs (${rm}%6.2fx) " +
        f"probe=$p%9.2fs (${rp}%7.2fx)")
      (name, base, m, p, rm, rp)
    }
    val qjson = rows.map { case (n, b, m, p, rm, rp) =>
      s"${Jsons.escape(n)}:{" +
        s""""base_sec":$b,"mid_sec":$m,"probe_sec":$p,""" +
        s""""ratio_mid":$rm,"ratio_probe":$rp}"""
    }.mkString(",")
    val djson = derivSecs.map { case (k, v) => s"${Jsons.escape(k)}:$v" }.mkString(",")
    val json =
      s"""{"probe":"sf10","rows_ratio_mid":10,"rows_ratio_probe":100,""" +
        s""""base":${Jsons.escape(src)},"mid_dir":${Jsons.escape(mid)},""" +
        s""""probe_dir":${Jsons.escape(dst)},"cpus":$cpus,"reps":$reps,""" +
        s""""timing":"noop_write","derivations_sec":{$djson},"queries":{$qjson}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    println(json)
  }
}
