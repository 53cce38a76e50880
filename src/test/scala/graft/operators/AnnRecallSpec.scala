package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Measured quality of the approximate ANN paths against the exact
  * brute-force baseline: recall@5 over the same query set. IVF's
  * exactness-within-probed-cells means recall is the tuning knob (cells
  * probed × centroid count) — this spec pins a floor so a regression in
  * cell assignment or probing silently degrading the index shows up as
  * a failing number, not as user-visible bad neighbors at 100 TB.
  */
class AnnRecallSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", 8)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", false)
    .appName("ann-recall-spec").getOrCreate()

  private def recallAt5(dir: String): Double = {
    val bf = SimilarityQueries.queries("ann_brute_topk")(spark, dir)
      .select(col("qid"), col("vec_id"))
    val ivf = SimilarityQueries.queries("ann_ivf")(spark, dir)
      .select(col("qid"), col("vec_id"))
    val hits = bf.intersect(ivf).count().toDouble
    hits / bf.count().toDouble
  }

  test("IVF recall@5 vs brute force stays above the floor") {
    val r = recallAt5("/root/testdata/sf0.001")
    info(f"IVF recall@5 sf0.001 = $r%.3f")
    // measured 0.96 on the pinned testdata; 0.8 leaves headroom for
    // data drift while still catching a real indexing regression
    assert(r >= 0.8, f"IVF recall@5 degraded to $r%.3f")
  }

  test("salted shuffle serve path is row-identical to the broadcast path") {
    // ivfPqServe pivots from the broadcast plan to a salted shuffle
    // join when the query batch exceeds graft.ann.maxBroadcastQueries
    // (the r9 fix for the 100× delta = N/2 broadcast blow-up). Forcing
    // the pivot on the tiny SF proves the two physical strategies
    // produce the same rows — only the plan may differ.
    val dir = "/root/testdata/sf0.001"
    def run(): Array[String] =
      SimilarityQueries.queries("ann_ivfpq")(spark, dir)
        .collect().map(_.toString).sorted
    val viaBroadcast = run()
    // ann_ivfpq's 4-query set is far smaller than its 200-row code
    // side, so the r10 smaller-side pick salts the CODES and
    // replicates the query/LUT frame ×64; ann_incr's delta = N/2
    // shape (|Q|·nprobe = 400 > 100 code rows) drives the OTHER
    // branch — codes replicated, queries hash-salted. Both must be
    // row-identical to their broadcast plans.
    def runIncr(): Array[String] =
      SimilarityQueries.queries("ann_incr")(spark, dir)
        .collect().map(_.toString).sorted
    val incrBroadcast = runIncr()
    spark.conf.set("graft.ann.maxBroadcastQueries", "0")
    try {
      val viaSalted = run()
      assert(viaSalted.length == viaBroadcast.length &&
        viaSalted.sameElements(viaBroadcast),
        "salted serve path (codes-salted branch) diverged from broadcast")
      val incrSalted = runIncr()
      assert(incrSalted.length == incrBroadcast.length &&
        incrSalted.sameElements(incrBroadcast),
        "salted serve path (codes-replicated branch) diverged from broadcast")
    } finally spark.conf.unset("graft.ann.maxBroadcastQueries")
  }

  /** Recall@5 of the scaled-rule serve vs the exact brute top-5 over
    * the same query set. Returns (mean recall, trained kC).
    */
  private def scaledRecall(e0: org.apache.spark.sql.DataFrame,
      queryMod: Int): (Double, Int) = {
    import graft.functions.VectorFunctions._
    import org.apache.spark.sql.expressions.Window
    val e = e0.persist()
    val n = e.count()
    val index = SimilarityQueries.trainIvfPqScaled(spark, e, 8, Some(n))
    val kC = index.coarse(0).length
    val expect = SimilarityQueries.scaledCellCount(n)
    // the seed rule CAPS selection at the target (so kC <= expect is
    // structural, not luck); Lloyd drops empty cells, so trained kC
    // can sit under the target but must stay corpus-scaled
    assert(kC <= expect && kC >= expect / 2,
      s"scaled kC $kC not in (${expect / 2}, $expect] for n=$n")
    val queries = e.filter(col("vec_id") % queryMod === 0)
    val qn = queries.count()
    val served = SimilarityQueries.ivfPqSearch(index, e, e, queries,
        SimilarityQueries.scaledNprobe(
          SimilarityQueries.scaledCellCount(n), n), k = 5,
        knownBatch = Some(qn), knownCodes = Some(n),
        rerank = SimilarityQueries.scaledRerank(n))
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val qs = queries.select(col("vec_id").as("qid"),
      col("q").as("qq"), col("n2").as("qn2"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    val truth = e.join(broadcast(qs), col("vec_id") =!= col("qid"))
      .withColumn("cos",
        cosineFromQ(dotQ(col("qq"), col("q")), col("qn2"), col("n2")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val recalls = truth.map { case (q, t) =>
      served.getOrElse(q, Set.empty[Long]).intersect(t).size.toDouble / t.size }
    e.unpersist(blocking = false)
    (recalls.sum / recalls.size, kC)
  }

  test("scaled coarse quantizer (kC ~ sqrt(N)) serves above the recall floor") {
    // the production cell rule: kC ≈ √N with the N/64 min-points-per-
    // cell clamp, nprobe ≈ √kC with the ~2048 min-points-PROBED floor,
    // and the min(N, 2048) exact-re-rank budget (all r12) — probed
    // fraction shrinks as the corpus grows so the serve wall stays
    // near-flat (the 2 k/20 k/200 k receipts in BASELINE.md), while a
    // thin corpus degrades to BRUTE-FORCE-EXACT serving: at
    // N = 2 000 ≤ 2 048 every cell is probed AND every probed row
    // re-ranks at full precision, so the result must EQUAL the exact
    // top-5 (same tie order). The r11 rule measured 0.47 here; the
    // probe floor alone 0.57 (PQ top-100 capped the candidates); the
    // full ladder reads 1.000 by construction.
    val (mean, kC) = scaledRecall(
      SimilarityQueries.quantized(spark, "/root/testdata/sf0.1"), 100)
    info(f"scaled-kC recall@5 sf0.1 = $mean%.3f (kC=$kC)")
    assert(mean >= 0.99, f"scaled-quantizer recall@5 degraded to $mean%.3f")
  }

  test("scaled quantizer holds recall >= 0.9 at the 20k corpus") {
    // the 20 k corpus where partial probing is REAL (kC = 141,
    // nprobe = 15 — the min-points-probed floor binds just above the
    // √kC term): 10 deterministically jittered copies of the sf0.1
    // embeddings, the same construction as tools/gen_emb10x.py's
    // BASELINE.md sweep fixture, synthesized in-session so the spec
    // does not depend on a /tmp fixture existing.
    import graft.functions.VectorFunctions._
    val base = spark.read
      .parquet("/root/testdata/sf0.1/embeddings.parquet")
    val e20k = base.crossJoin(spark.range(0, 10).toDF("k"))
      .select((col("vec_id") + col("k") * 2000).as("vec_id"),
        expr("transform(embedding, x -> cast(x + 0.0001d * k * " +
          "(cast(vec_id % 13 as double) - 6.0d) as float))")
          .as("embedding"))
      .select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("n2", normQ2(col("q")))
    val (mean, kC) = scaledRecall(e20k, 1000)
    info(f"scaled-kC recall@5 20k = $mean%.3f (kC=$kC)")
    assert(mean >= 0.9, f"scaled-quantizer 20k recall@5 degraded to $mean%.3f")
  }

  test("k-means-refined IVF recall@5 stays above the floor") {
    // refinement re-balances cells around the data (the skew story);
    // recall at fixed nprobe measured 0.88 on the r8 20-seed set and
    // 0.78 after r9 bounded the seed rule to 16 corpus-independent
    // seeds (fewer, coarser cells at fixed nprobe ⟹ slightly lower
    // recall at this tiny SF — the production knob is raising the
    // fixed k, not growing it with the corpus). The floor catches a
    // broken training loop (≤ random would be ~0.05)
    val dir = "/root/testdata/sf0.001"
    val bf = SimilarityQueries.queries("ann_brute_topk")(spark, dir)
      .select(col("qid"), col("vec_id"))
    def recall(name: String): Double = {
      val got = SimilarityQueries.queries(name)(spark, dir)
        .select(col("qid"), col("vec_id"))
      bf.intersect(got).count().toDouble / bf.count().toDouble
    }
    val seedIvf = recall("ann_ivf")
    val kmIvf = recall("ann_ivf_kmeans")
    info(f"IVF recall@5: sampled seeds $seedIvf%.3f, k-means refined $kmIvf%.3f")
    assert(kmIvf >= 0.7, f"refined IVF recall degraded to $kmIvf%.3f")
  }

  test("PQ-ADC two-stage recall@5 vs brute force stays above the floor") {
    // measured at sf0.01: the %25 seeding gives 20 centroids per
    // subspace there, a real codebook — sf0.001's 50 vectors yield only
    // 2 per subspace (16 distinct reconstructions for the whole corpus),
    // which measures the corpus size, not the operator (0.42 there).
    val dir = "/root/testdata/sf0.01"
    val bf = SimilarityQueries.queries("ann_brute_topk")(spark, dir)
      .select(col("qid"), col("vec_id"))
    val pq = SimilarityQueries.queries("ann_pq_adc")(spark, dir)
      .select(col("qid"), col("vec_id"))
    val r = bf.intersect(pq).count().toDouble / bf.count().toDouble
    info(f"PQ-ADC recall@5 sf0.01 = $r%.3f")
    // r8 operating point: M = 8 subspaces, k = 16, candidate width
    // 100 before the exact re-rank — measured 0.92 here (the full
    // M × width trade table is in BASELINE.md; width is the efSearch
    // analogue and the re-rank is exact, so recall rises directly
    // with it). A broken codebook or LUT would land near random
    // (~0.01); 0.85 catches any regression of the shipped point.
    assert(r >= 0.85, f"PQ-ADC recall@5 degraded to $r%.3f")
  }

  test("IVF-PQ composed recall@5 stays above the floor") {
    // nprobe = 4 of 16 coarse cells composed with the PQ-ADC width-100
    // candidate stage: measured 0.84 at sf0.01 — the probe misses cost
    // ~0.08 vs flat PQ-ADC's 0.92, the standard IVF trade (nprobe is
    // the knob). 0.75 catches a broken cell assignment or probe set.
    val dir = "/root/testdata/sf0.01"
    val bf = SimilarityQueries.queries("ann_brute_topk")(spark, dir)
      .select(col("qid"), col("vec_id"))
    val iv = SimilarityQueries.queries("ann_ivfpq")(spark, dir)
      .select(col("qid"), col("vec_id"))
    val r = bf.intersect(iv).count().toDouble / bf.count().toDouble
    info(f"IVF-PQ recall@5 sf0.01 = $r%.3f")
    assert(r >= 0.75, f"IVF-PQ recall@5 degraded to $r%.3f")
  }

  test("SQ8 two-stage recall@5 vs brute force stays above the floor") {
    val dir = "/root/testdata/sf0.001"
    val bf = SimilarityQueries.queries("ann_brute_topk")(spark, dir)
      .select(col("qid"), col("vec_id"))
    val sq = SimilarityQueries.queries("ann_sq8")(spark, dir)
      .select(col("qid"), col("vec_id"))
    val r = bf.intersect(sq).count().toDouble / bf.count().toDouble
    info(f"SQ8 recall@5 sf0.001 = $r%.3f")
    // the exact re-rank stage means a miss requires the true neighbor
    // to fall outside the approximate top-20; measured 1.0 on the
    // pinned testdata — 0.9 still catches a broken quantizer
    assert(r >= 0.9, f"SQ8 recall@5 degraded to $r%.3f")
  }

  test("IVF-PQ index survives a parquet roundtrip: save -> load -> probe == direct") {
    // the production lifecycle the ivfPqIncr scaladoc claims: codebooks
    // + code rows persist to the lakehouse at build time; a later delta
    // batch loads them and probes WITHOUT re-training or re-encoding
    // the corpus. The loaded-index probe must equal the direct
    // (train-in-memory) probe exactly.
    val dir = "/root/testdata/sf0.001"
    val e = SimilarityQueries.quantized(spark, dir)
    val corpus = e.filter(col("vec_id") % 2 === 0)
    val delta = e.filter(col("vec_id") % 2 === 1)
    val index = SimilarityQueries.trainIvfPq(spark, corpus, 8,
      col("vec_id") % 50 === 0 && col("vec_id") < 800)
    val codesSrc = corpus.select(col("vec_id"), col("q"))
    val direct = SimilarityQueries
      .ivfPqSearch(index, corpus, codesSrc, delta, nprobe = 4)
    val path = java.nio.file.Files.createTempDirectory("ivfpqidx").toString
    SimilarityQueries.saveIvfPqIndex(spark, index, codesSrc, path)
    val (loaded, codes) = SimilarityQueries.loadIvfPqIndex(spark, path)
    assert(loaded === index, "codebooks must round-trip exactly")
    val fromDisk = SimilarityQueries
      .ivfPqSearchPrecoded(loaded, corpus, codes, delta, nprobe = 4)
    assert(fromDisk.exceptAll(direct).count() === 0 &&
      direct.exceptAll(fromDisk).count() === 0,
      "parquet-roundtripped index diverges from the in-memory index")
    assert(fromDisk.count() > 0, "no probe results - vacuous roundtrip")
  }
}
