package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler (not part of the driver contract): times one or
  * more named SparkEntry queries through the noop sink, twice each (cold
  * + warm), for hot-spot attribution between bench runs.
  *
  * Usage: tools/run.sh Profile <query> [query ...]
  *
  * Findings log (kept so future rounds don't re-try dead ends):
  *  - dedup_ngram: broadcast-join + packed-long-pair hash agg
  *    beats per-shingle collect_list + native pair generation ~4×
  *    (5.4 s vs 20-23 s at sf0.1) — Generate over huge arrays and the
  *    931-group skew dominate; keep the join formulation.
  *  - parquet testdata is one row group per table → single-partition
  *    scans; Tables.tablePar normalizes (no-op on real inputs).
  *  - ann_pq_adc (r7): an interpreted HOF in a broadcast-side projection
  *    gets projection-collapsed INTO the per-pair scan (64-el transform
  *    ran per candidate row: 54 s at the 10× point) — materialize the
  *    tiny frame before broadcast(). And keep wide arrays OUT of a
  *    high-volume aggregate's input (the 64-long query vector riding
  *    through the 8 M-row heap agg measured 35 s; re-joining it onto
  *    the 8 k-row candidate list is one tiny broadcast). Array-valued
  *    GROUP BY keys cost ~3× (UnsafeRow array hashing per row) — group
  *    on primitive keys, carry arrays via first().
  *  - text_bm25 (r7 late): persisting the token frame so postings +
  *    corpus stats share ONE tokenize pass cut the 10× steady state
  *    3.1 → 2.5 s (the second scan+tokenize was ~20% of wall); the
  *    query-term postings slice is the frame worth caching — it is
  *    query-bounded, while full postings are corpus-sized.
  *  - floor attribution (r7 s3): AQE re-planning is NOT the floor —
  *    PROFILE_NO_AQE measured q_having/q_topk/text_quality/q1_agg
  *    within ±0.05 s of the AQE-on warm numbers. The ~0.4-1.0 s
  *    per-query floor is scheduler + codegen + scan latency, i.e.
  *    structural to a Spark job, not a config to shave.
  *  - temporal family at 10× events (1 M rows): per-key window
  *    formulations track DuckDB within 1.1-1.7× in-memory; DuckDB's
  *    IEJoin wins the banded range join on constant factor at this
  *    scale — the banded equi-join shape is kept because it partitions
  *    (IEJoin is a single-node sort structure).
  *  - dedup_ngram/dedup_contain (r9): re-formulating the pair
  *    generation as grouped postings (collect_list per shingle) + an
  *    in-kernel C(df,2) pair emitter measured ~1.5× SLOWER than the
  *    posting-list self-JOIN (6.0/5.0 s vs 4.2/4.2 s isolated at
  *    sf0.1) despite halving pair rows and saving two exchanges —
  *    the Generate over df-sized arrays serializes on the skewed
  *    shingle groups, same failure mode as the r-early collect_list
  *    attempt above. Reverted; the join formulation stays, and the
  *    100 TB route for both remains the capped/star LSH path.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      // split-per-core scan normalization (see Tables.autoSplitBytes) —
      // parity with the Bench/Verify sessions so profiled walls match
      .config("spark.sql.files.maxPartitionBytes",
        Tables.autoSplitBytes(dir, 32))
      .config("spark.sql.session.timeZone", "UTC")
      // parity with Verify/Bench sessions: profile THROUGH the
      // TopKRewrite extension, not past it
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // PROFILE_NO_AQE=1: measure a query without adaptive re-planning
      // (attribution only — Verify/Bench always run with AQE on);
      // only "1"/"true" disable it, so PROFILE_NO_AQE=0 stays AQE-on
      .config("spark.sql.adaptive.enabled",
        (!Set("1", "true").contains(
          sys.env.getOrElse("PROFILE_NO_AQE", "").toLowerCase)).toString)
      // PROFILE_BYPASS=n: probe spark.shuffle.sort.bypassMergeThreshold
      // (default 200 = stock). Below the threshold the bypass writer
      // opens one file PER REDUCE PARTITION per map task — on slow-
      // metadata filesystems the opens dominate small shuffles
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("PROFILE_BYPASS", "200"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("dedup_ngram")
    names.foreach { name =>
      // "bpe_train:N" — time the BpeTrainer loop (N merges) over the
      // dir's documents token stream; not a SparkEntry query, so it
      // gets its own arm (reports merges + wall, nothing else)
      // "jac_capped:B" — time the bucket-capped LSH-verified exact
      // Jaccard (the duplicate-density guard) over the dir's documents
      if (name.startsWith("jac_capped:")) {
        val b = name.split(':')(1).toInt
        val hashes = graft.operators.DedupQueries
          .docShingleHashes(spark, dir)
          .filter(org.apache.spark.sql.functions.size(
            org.apache.spark.sql.functions.col("hs")) > 0).persist()
        val t0 = System.nanoTime()
        val out = graft.operators.DedupQueries
          .jaccardOnCandidates(hashes, maxBucket = Some(b))
        out.write.format("noop").mode("overwrite").save()
        println(f"$name ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        hashes.unpersist(blocking = false)
      } else if (name.startsWith("shham_capped:")) {
        // capped simhash-hamming sweep (the duplicate-density guard)
        val b = name.split(':')(1).toInt
        val t0 = System.nanoTime()
        graft.operators.DedupQueries
          .simhashHamming(spark, dir, maxBucket = Some(b))
          .write.format("noop").mode("overwrite").save()
        println(f"$name ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      } else if (name == "lsh_parts") {
        // stage attribution for the LSH dedup pair: cache populate vs
        // candidate generation vs exact verify
        import org.apache.spark.sql.functions.{col, size}
        (1 to 2).foreach { pass =>
          spark.sharedState.cacheManager.clearCache()
          val t0 = System.nanoTime()
          val hashes = graft.operators.DedupQueries.docShingleHashes(spark, dir).persist()
          val n = hashes.count()
          val t1 = System.nanoTime()
          val cand = graft.operators.DedupQueries
            .lshCandidatePairs(hashes.filter(size(col("hs")) > 0)).count()
          val t2 = System.nanoTime()
          graft.operators.DedupQueries
            .jaccardOnCandidates(hashes.filter(size(col("hs")) > 0))
            .write.format("noop").mode("overwrite").save()
          val t3 = System.nanoTime()
          hashes.unpersist(blocking = true)
          println(f"lsh_parts pass$pass docs=$n cands=$cand " +
            f"cache=${(t1 - t0) / 1e9}%5.2f cand=${(t2 - t1) / 1e9}%5.2f " +
            f"jac=${(t3 - t2) / 1e9}%5.2f")
        }
      } else if (name == "winnow_parts") {
        // the dedup_winnow receipt: same corpus, same LSH+verify path,
        // full shingle sets vs winnowed fingerprint sets — set volume,
        // candidate volume, and end-to-end wall side by side
        import org.apache.spark.sql.functions.{col, size, sum}
        import graft.functions.TextFunctions.{tokens, shingleHashes}
        import graft.functions.TextHashExpressions.winnow
        import graft.operators.DedupQueries.{lshCandidatePairs, jaccardOnCandidates}
        (1 to 2).foreach { pass =>
          spark.sharedState.cacheManager.clearCache()
          Seq(
            "full" -> graft.Tables.documents(spark, dir)
              .select(col("doc_id"), shingleHashes(tokens(col("text")), 3).as("hs"))
              .filter(size(col("hs")) > 0),
            "winnow" -> graft.Tables.documents(spark, dir)
              .select(col("doc_id"), shingleHashes(tokens(col("text")), 3).as("g"))
              .filter(size(col("g")) >= 4)
              .select(col("doc_id"), winnow(col("g"), 4).as("hs"))
          ).foreach { case (label, frame) =>
            val hashes = frame.persist()
            val t0 = System.nanoTime()
            val vol = hashes.agg(sum(size(col("hs")))).collect()(0).getLong(0)
            val t1 = System.nanoTime()
            val cand = lshCandidatePairs(hashes).count()
            val t2 = System.nanoTime()
            jaccardOnCandidates(hashes)
              .write.format("noop").mode("overwrite").save()
            val t3 = System.nanoTime()
            hashes.unpersist(blocking = true)
            println(f"winnow_parts pass$pass $label%6s setvol=$vol cands=$cand " +
              f"cache=${(t1 - t0) / 1e9}%5.2f cand=${(t2 - t1) / 1e9}%5.2f " +
              f"jac=${(t3 - t2) / 1e9}%5.2f")
          }
        }
      } else if (name.startsWith("ann_serve:")) {
        // bounded-batch serving receipt: the IVF-PQ index is trained and
        // persisted ONCE over the dir's full corpus, then a FIXED-size
        // query batch (corpus-independent — the production micro-batch
        // shape, vs the ann_incr gate's delta = N/2 conformance
        // formulation) probes the loaded index. Serve wall vs corpus
        // size with |Q| pinned is the 100 TB serving receipt.
        import graft.operators.SimilarityQueries._
        val batch = name.split(':')(1).toInt
        // GRAFT_SERVE_MAXB overrides the broadcast-pivot bound (set 0
        // to force the salted-shuffle path — the past-the-ceiling
        // receipt at corpus sizes whose query batches can't reach it).
        // Saved + restored after the block (AnnRecallSpec's try/finally
        // convention): the session conf would otherwise leak the
        // override into every later profiled section's pivot decision.
        val priorMaxB = spark.conf.getOption("graft.ann.maxBroadcastQueries")
        sys.env.get("GRAFT_SERVE_MAXB").foreach(v =>
          spark.conf.set("graft.ann.maxBroadcastQueries", v))
        try {
        val e = quantized(spark, dir).persist()
        val n = e.count()
        val step = math.max(1L, n / batch)
        // pmod === 0 (not 1): at step = 1 (batch ≥ corpus) residue 1
        // matches nothing and the arm would time an EMPTY batch
        val queries = e.filter(pmod(col("vec_id"), lit(step)) === 0)
          .limit(batch)
        val qn = queries.count()
        require(qn > 0, s"ann_serve: empty query batch (n=$n batch=$batch)")
        val t0 = System.nanoTime()
        val index = trainIvfPq(spark, e, 8,
          col("vec_id") % 25 === 0 && col("vec_id") < 400)
        val path = java.nio.file.Files.createTempDirectory("annserve").toString
        saveIvfPqIndex(spark, index, e.select(col("vec_id"), col("q")), path)
        val t1 = System.nanoTime()
        val (idx2, codes) = loadIvfPqIndex(spark, path)
        (1 to 2).foreach { pass =>
          val s0 = System.nanoTime()
          ivfPqSearchPrecoded(idx2, e, codes, queries, 4,
              knownBatch = Some(qn))
            .write.format("noop").mode("overwrite").save()
          println(f"$name pass$pass n=$n batch=$batch qn=$qn " +
            f"build=${(t1 - t0) / 1e9}%6.2f s " +
            f"serve=${(System.nanoTime() - s0) / 1e9}%6.2f s")
        }
        e.unpersist(blocking = false)
        } finally priorMaxB match {
          case Some(v) => spark.conf.set("graft.ann.maxBroadcastQueries", v)
          case None => spark.conf.unset("graft.ann.maxBroadcastQueries")
        }
      } else if (name.startsWith("ann_serve_sc:")) {
        // scaled-quantizer serving receipt (r11): same harness as
        // ann_serve but the coarse codebook follows the PRODUCTION
        // cell rule kC ≈ √N (trainIvfPqScaled) with nprobe ≈ √kC —
        // the receipt that shows the serve wall near-flat across a
        // 100× corpus sweep where fixed kC = 16 grows linearly. Also
        // measures recall@5 of the scaled serve against the brute
        // exact top-5 for the same batch, so the wall receipt carries
        // its accuracy cost alongside.
        import graft.operators.SimilarityQueries._
        import org.apache.spark.sql.expressions.Window
        val batch = name.split(':')(1).toInt
        val e = quantized(spark, dir).persist()
        val n = e.count()
        val step = math.max(1L, n / batch)
        val queries = e.filter(pmod(col("vec_id"), lit(step)) === 0)
          .limit(batch)
        val qn = queries.count()
        require(qn > 0, s"ann_serve_sc: empty query batch (n=$n batch=$batch)")
        val t0 = System.nanoTime()
        val index = trainIvfPqScaled(spark, e, 8, knownN = Some(n))
        // nprobe from the RULE's cell count, exactly as the
        // ann_ivfpq_scaled gate derives it — the TRAINED count
        // (index.coarse(0).length) can shrink when Lloyd drops empty
        // cells, which would profile a different serve shape than the
        // gate whose receipts this arm produces
        val kC = scaledCellCount(n)
        val np = scaledNprobe(kC, n)
        val path = java.nio.file.Files.createTempDirectory("annservesc").toString
        saveIvfPqIndex(spark, index, e.select(col("vec_id"), col("q")), path)
        val t1 = System.nanoTime()
        val rr = scaledRerank(n)
        val (idx2, codes) = loadIvfPqIndex(spark, path)
        (1 to 2).foreach { pass =>
          val s0 = System.nanoTime()
          ivfPqSearchPrecoded(idx2, e, codes, queries, np,
              knownBatch = Some(qn), knownCodes = Some(n), rerank = rr)
            .write.format("noop").mode("overwrite").save()
          println(f"$name pass$pass n=$n kC=$kC nprobe=$np rerank=$rr qn=$qn " +
            f"build=${(t1 - t0) / 1e9}%6.2f s " +
            f"serve=${(System.nanoTime() - s0) / 1e9}%6.2f s")
        }
        // recall@5 vs the exact brute top-5 of the same batch
        val served = ivfPqSearchPrecoded(idx2, e, codes, queries, np,
            knownBatch = Some(qn), knownCodes = Some(n), rerank = rr)
          .select(col("qid"), col("vec_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
          .view.mapValues(_.map(_._2).toSet).toMap
        import graft.functions.VectorFunctions._
        val qs = queries.select(col("vec_id").as("qid"),
          col("q").as("qq"), col("n2").as("qn2"))
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("cos").desc, col("vec_id"))
        val truth = e.join(org.apache.spark.sql.functions.broadcast(qs),
            col("vec_id") =!= col("qid"))
          .withColumn("cos",
            cosineFromQ(dotQ(col("qq"), col("q")), col("qn2"), col("n2")))
          .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("qid"), col("vec_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
          .view.mapValues(_.map(_._2).toSet).toMap
        val recalls = truth.map { case (q, t) =>
          served.getOrElse(q, Set.empty[Long]).intersect(t).size.toDouble / t.size }
        println(f"$name recall@5=${recalls.sum / recalls.size}%.3f over ${recalls.size} queries")
        e.unpersist(blocking = false)
      } else if (name == "incr_parts") {
        // stage attribution for pipe_incr: bench collect, the two
        // stage16 passes, base near-dedup, union near-dedup
        import graft.operators.{PipelineQueries => PQ, DedupQueries => DQ}
        import graft.functions.TextFunctions.shingleHashes
        (1 to 2).foreach { pass =>
          spark.sharedState.cacheManager.clearCache()
          val t0 = System.nanoTime()
          val bench = PQ.benchShingles(spark, dir)
          val t1 = System.nanoTime()
          val b16 = PQ.stage16(spark, dir, bench, col("doc_id") % 2 === 0).persist()
          val nb = b16.count()
          val t2 = System.nanoTime()
          val bKeep = b16.groupBy(col("digest"))
            .agg(org.apache.spark.sql.functions.min(col("doc_id")).as("doc_id"))
          val bHashes = b16.join(bKeep, Seq("digest", "doc_id"))
            .select(col("doc_id"), col("digest"),
              shingleHashes(col("toks"), 2).as("hs")).persist()
          val bDrops = DQ.jaccardOnCandidates(
              bHashes.filter(org.apache.spark.sql.functions.size(col("hs")) > 0),
              maxBucket = Some(8))
            .select(col("ib")).distinct()
          val nd = bDrops.count()
          val t3 = System.nanoTime()
          val d16 = PQ.stage16(spark, dir, bench, col("doc_id") % 2 === 1).persist()
          val ndd = d16.count()
          val t4 = System.nanoTime()
          val bSurv = bHashes.join(
            org.apache.spark.sql.functions.broadcast(bDrops),
            bHashes("doc_id") === bDrops("ib"), "left_anti")
          val dKeep = d16.groupBy(col("digest"))
            .agg(org.apache.spark.sql.functions.min(col("doc_id")).as("doc_id"))
          val dAdm = d16.join(dKeep, Seq("digest", "doc_id"))
            .join(bSurv.select(col("digest")), Seq("digest"), "left_anti")
          val uHashes = bSurv.select(col("doc_id"), col("hs"))
            .unionByName(dAdm.select(col("doc_id"),
              shingleHashes(col("toks"), 2).as("hs"))).persist()
          val nu = uHashes.count()
          val t5 = System.nanoTime()
          val np = DQ.jaccardOnCandidates(
            uHashes.filter(org.apache.spark.sql.functions.size(col("hs")) > 0),
            maxBucket = Some(8)).count()
          val t6 = System.nanoTime()
          println(f"incr_parts pass$pass bench=${(t1 - t0) / 1e9}%5.2f " +
            f"b16($nb)=${(t2 - t1) / 1e9}%5.2f bjac($nd)=${(t3 - t2) / 1e9}%5.2f " +
            f"d16($ndd)=${(t4 - t3) / 1e9}%5.2f union($nu)=${(t5 - t4) / 1e9}%5.2f " +
            f"ujac($np)=${(t6 - t5) / 1e9}%5.2f")
          Seq(b16, bHashes, d16, uHashes).foreach(_.unpersist(blocking = true))
        }
      } else if (name == "idx_parts") {
        // stage attribution for pipe_incr_idx: artifact load, delta
        // stage pass, admission, delta-internal near-dup, index probe
        import graft.operators.{PipelineQueries => PQ, DedupQueries => DQ}
        import graft.functions.TextFunctions.shingleHashes
        import org.apache.spark.sql.functions.{broadcast, size, min, length}
        (1 to 2).foreach { pass =>
          spark.sharedState.cacheManager.clearCache()
          val t0 = System.nanoTime()
          val path = PQ.ensureCuratedBase(spark, dir)
          val bench = spark.read.parquet(s"$path/bench")
            .collect().map(_.getLong(0)).sorted
          val manifest = spark.read.parquet(s"$path/manifest")
          val (bands, sets) = DQ.loadBandIndex(spark, s"$path/index")
          val t1 = System.nanoTime()
          val d16 = PQ.stage16(spark, dir, bench, col("doc_id") % 2 === 1).persist()
          val nd = d16.count()
          val t2 = System.nanoTime()
          val dKeep = d16.groupBy(col("digest")).agg(min(col("doc_id")).as("doc_id"))
          val dAdm = d16.join(dKeep, Seq("digest", "doc_id"))
            .join(manifest.select(col("digest")), Seq("digest"), "left_anti")
            .select(col("doc_id"), col("source"), col("n_tok"), col("q"),
              length(col("norm")).as("norm_len"),
              shingleHashes(col("toks"), 2).as("hs"))
            .localCheckpoint(true)
          val na = dAdm.count()
          val t3 = System.nanoTime()
          val dHashes = dAdm.select(col("doc_id"), col("hs"))
            .filter(size(col("hs")) > 0)
          // checkpoint so the fin stage reuses THIS probe result —
          // a lazy re-reference would re-run the whole probe inside
          // fin and double-count it in the attribution
          val drops = DQ.batchAdmissionDrops(bands, sets, dHashes)
            .localCheckpoint(true)
          val ndd = drops.count()
          val t4 = System.nanoTime()
          val nOut = dAdm.join(broadcast(drops),
              dAdm("doc_id") === col("vid"), "left_anti")
            .select(col("doc_id"), col("source"), col("n_tok"), col("q"),
              col("norm_len"))
            .orderBy(col("doc_id")).localCheckpoint(true).count()
          val t5 = System.nanoTime()
          println(f"idx_parts pass$pass load=${(t1 - t0) / 1e9}%5.2f " +
            f"d16($nd)=${(t2 - t1) / 1e9}%5.2f adm($na)=${(t3 - t2) / 1e9}%5.2f " +
            f"drops($ndd)=${(t4 - t3) / 1e9}%5.2f fin($nOut)=${(t5 - t4) / 1e9}%5.2f")
          d16.unpersist(blocking = true)
        }
      } else if (name == "pq_phases") {
        // phase attribution for ann_pq_adc: the builder runs its two
        // driver collects + the qs1 checkpoint eagerly, so timing the
        // builder vs the final action splits train+LUT from scan+rerank
        (1 to 2).foreach { pass =>
          val t0 = System.nanoTime()
          val df = graft.operators.SimilarityQueries.pqAdc(spark, dir, 8,
            trace = Some(l => println(f"pq_phases pass$pass $l")))
          val t1 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          val t2 = System.nanoTime()
          println(f"pq_phases pass$pass build=${(t1 - t0) / 1e9}%6.2f s " +
            f"action=${(t2 - t1) / 1e9}%6.2f s")
        }
      } else if (name.startsWith("mm_micro:")) {
        // single-threaded GIF codec attribution: encode (syntheticGif)
        // vs frame decode (reader.read) vs per-pixel extraction
        // (getRGB loop vs raster+palette LUT) — run twice so the second
        // take is JIT-warm
        val n = name.split(':')(1).toInt
        (1 to 2).foreach { pass =>
          val t0 = System.nanoTime()
          val payloads = (0 until n).map(i =>
            graft.functions.Multimodal.syntheticGif(i.toLong)).toArray
          val t1 = System.nanoTime()
          val reader = javax.imageio.ImageIO
            .getImageReadersByFormatName("gif").next()
          var px1 = 0L
          payloads.foreach { p =>
            val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(p))
            reader.setInput(iis)
            val nf = reader.getNumImages(true)
            (0 until nf by 3).foreach { f =>
              val img = reader.read(f)
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  px1 += img.getRGB(x, y) & 0xff; x += 1
                }
                y += 1
              }
            }
            reader.setInput(null); iis.close()
          }
          val t2 = System.nanoTime()
          var px2 = 0L
          payloads.foreach { p =>
            val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(p))
            reader.setInput(iis)
            val nf = reader.getNumImages(true)
            (0 until nf by 3).foreach { f =>
              val img = reader.read(f)
              val r = img.getRaster
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  px2 += r.getSample(x, y, 0); x += 1
                }
                y += 1
              }
            }
            reader.setInput(null); iis.close()
          }
          val t3 = System.nanoTime()
          println(f"$name pass$pass clips=$n " +
            f"encode=${(t1 - t0) / 1e9}%6.2f s " +
            f"decode+getRGB=${(t2 - t1) / 1e9}%6.2f s " +
            f"decode+raster=${(t3 - t2) / 1e9}%6.2f s px1=$px1 px2=$px2")
        }
      } else if (name.startsWith("mm_micro_mt:")) {
        // the 32-thread version of mm_micro's encode half: if per-clip
        // encode cost explodes relative to the single-threaded arm, the
        // JDK GIF write path is serializing on a shared lock
        val parts = name.split(':')
        val n = parts(1).toInt
        val threads = if (parts.length > 2) parts(2).toInt else 32
        (1 to 2).foreach { pass =>
          val t0 = System.nanoTime()
          val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
          val per = n / threads
          val futs = (0 until threads).map { t =>
            pool.submit(new java.util.concurrent.Callable[Long] {
              def call(): Long = {
                var bytes = 0L
                var i = t * per
                while (i < (t + 1) * per) {
                  bytes += graft.functions.Multimodal.syntheticGif(i.toLong).length
                  i += 1
                }
                bytes
              }
            })
          }
          val total = futs.map(_.get()).sum
          pool.shutdown()
          println(f"$name pass$pass clips=$n threads=$threads " +
            f"encode=${(System.nanoTime() - t0) / 1e9}%6.2f s bytes=$total")
        }
      } else if (name.startsWith("mm_micro_e2e:")) {
        // the full mm_scenecut kernel (encode → decode every 3rd frame →
        // per-pixel extract) across N threads — the gate's per-task work
        // without Spark around it
        val parts = name.split(':')
        val n = parts(1).toInt
        val threads = if (parts.length > 2) parts(2).toInt else 32
        (1 to 2).foreach { pass =>
          val t0 = System.nanoTime()
          val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
          val per = n / threads
          val futs = (0 until threads).map { t =>
            pool.submit(new java.util.concurrent.Callable[Long] {
              def call(): Long = {
                val reader = javax.imageio.ImageIO
                  .getImageReadersByFormatName("gif").next()
                var acc = 0L
                var i = t * per
                while (i < (t + 1) * per) {
                  val p = graft.functions.Multimodal.syntheticGif(i.toLong)
                  val iis =
                    new javax.imageio.stream.MemoryCacheImageInputStream(
                      new java.io.ByteArrayInputStream(p))
                  reader.setInput(iis)
                  val nf = reader.getNumImages(true)
                  (0 until nf by 3).foreach { f =>
                    val img = reader.read(f)
                    var y = 0
                    while (y < img.getHeight) {
                      var x = 0
                      while (x < img.getWidth) {
                        acc += img.getRGB(x, y) & 0xff; x += 1
                      }
                      y += 1
                    }
                  }
                  reader.setInput(null); iis.close()
                  i += 1
                }
                acc
              }
            })
          }
          val total = futs.map(_.get()).sum
          pool.shutdown()
          println(f"$name pass$pass clips=$n threads=$threads " +
            f"e2e=${(System.nanoTime() - t0) / 1e9}%6.2f s px=$total")
        }
      } else if (name.startsWith("sij_wall:")) {
        // wall receipt for the §2.63 STREAMING interval-join twin (the
        // r15 verdict's BASELINE-hygiene item): drive the exact
        // StreamingIntervalJoinSpec pipeline — watermarked stream-stream
        // range join — over the dir's events in N event-time-ordered
        // chunks and print rows in/pairs out/wall
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import org.apache.spark.sql.functions.{col, timestamp_micros, expr}
        val nChunks = name.split(':')(1).toInt
        implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
        import spark.implicits._
        val evs = graft.Tables.events(spark, dir)
          .filter(col("event_type").isin("error", "purchase"))
          .select(col("event_id"), col("user_id"),
            graft.Tables.tsMicros.as("t"), col("event_type"))
          .orderBy(col("t"), col("event_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getString(3)))
        val chunks = evs.grouped(
          math.max(1, evs.length / nChunks + 1)).toSeq
        val input = MemoryStream[(Long, Long, Long, String)]
        val df = input.toDS()
          .toDF("eventId", "userId", "tsMicros", "typ")
          .withColumn("t", timestamp_micros(col("tsMicros")))
        val a = df.filter(col("typ") === "error")
          .select(col("eventId").as("a_id"), col("userId").as("a_user"),
            col("t").as("ta"))
          .withWatermark("ta", "0 seconds")
        val b = df.filter(col("typ") === "purchase")
          .select(col("eventId").as("b_id"), col("userId").as("b_user"),
            col("t").as("tb"))
          .withWatermark("tb", "0 seconds")
        val joined = a.join(b,
          expr("a_user = b_user AND tb > ta - INTERVAL 2 HOURS " +
            "AND tb < ta + INTERVAL 6 HOURS"))
          .select(col("a_id"), col("b_id"))
        val q = joined.writeStream.format("memory")
          .queryName("sij_wall_out").outputMode("append").start()
        try {
          val t0 = System.nanoTime()
          chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
          val n = spark.table("sij_wall_out").count()
          println(f"$name rows=${evs.length} chunks=${chunks.size} " +
            f"pairs=$n wall=${(System.nanoTime() - t0) / 1e9}%6.2f s")
        } finally q.stop()
      } else if (name == "curate_parts") {
        // stage attribution for pipe_curate: bench shingles vs stage16
        // force vs exact-dedup vs shingle force vs capped-LSH drops vs
        // the final anti-join+checkpoint — each boundary forced so its
        // jobs are isolated (attribution only; the gate itself runs ONE
        // materializing job over the lazy tree). NOTE: this arm
        // RESTATES curate's stage bodies (keep-min rule, shingle n = 2,
        // maxBucket = 8, broadcast anti-join) so it can force each
        // boundary — keep it in lockstep with PipelineQueries.curate or
        // its attribution silently profiles a different pipeline
        import org.apache.spark.sql.functions.{broadcast, col, count, lit, min, size}
        import graft.functions.TextFunctions.shingleHashes
        (1 to 2).foreach { pass =>
          val t0 = System.nanoTime()
          val bench = graft.operators.PipelineQueries.benchShingles(spark, dir)
          val t1 = System.nanoTime()
          val survivors = graft.operators.PipelineQueries
            .stage16(spark, dir, bench, lit(true)).persist()
          val n16 = survivors.count()
          val t2 = System.nanoTime()
          val keep = survivors.groupBy(col("digest"))
            .agg(min(col("doc_id")).as("doc_id"))
          val exact = survivors.join(keep, Seq("digest", "doc_id"))
          val hashes = exact
            .select(col("doc_id"), shingleHashes(col("toks"), 2).as("hs"))
            .persist()
          val nh = hashes.count()
          val t3 = System.nanoTime()
          val drops = graft.operators.DedupQueries.jaccardOnCandidates(
              hashes.filter(size(col("hs")) > 0), maxBucket = Some(8))
            .select(col("ib")).distinct().persist()
          val nd = drops.count()
          val t4 = System.nanoTime()
          val out = exact.join(broadcast(drops),
              exact("doc_id") === drops("ib"), "left_anti")
            .select(col("doc_id")).localCheckpoint(true)
          val no = out.count()
          val t5 = System.nanoTime()
          drops.unpersist(blocking = false)
          hashes.unpersist(blocking = false)
          survivors.unpersist(blocking = false)
          println(f"curate_parts pass$pass bench=${(t1 - t0) / 1e9}%5.2f " +
            f"stage16=${(t2 - t1) / 1e9}%5.2f (n=$n16) " +
            f"exact+sh=${(t3 - t2) / 1e9}%5.2f (n=$nh) " +
            f"lsh=${(t4 - t3) / 1e9}%5.2f (n=$nd) " +
            f"anti+ckpt=${(t5 - t4) / 1e9}%5.2f (n=$no)")
        }
      } else if (name == "rrf_parts") {
        // stage attribution for retr_rrf: sparse arm vs dense arm vs
        // fused total (each pass repeated so warm cost is visible)
        (1 to 2).foreach { pass =>
          val t0 = System.nanoTime()
          graft.operators.RetrievalQueries.bm25(spark, dir)
            .write.format("noop").mode("overwrite").save()
          val t1 = System.nanoTime()
          graft.operators.RetrievalQueries.denseTop10(spark, dir)
            .write.format("noop").mode("overwrite").save()
          val t2 = System.nanoTime()
          graft.SparkEntry.queries("retr_rrf")(spark, dir)
            .write.format("noop").mode("overwrite").save()
          val t3 = System.nanoTime()
          println(f"rrf_parts pass$pass bm25=${(t1 - t0) / 1e9}%5.2f " +
            f"dense=${(t2 - t1) / 1e9}%5.2f full=${(t3 - t2) / 1e9}%5.2f")
        }
      } else if (name.startsWith("lazy_explain:")) {
        // dump the LAZY (materialize = false) plan of a gate whose entry
        // form ends in an eager localCheckpoint — the gate explain would
        // show only the checkpoint's RDD scan (the r16 plans/NOTES.md
        // convention: pagerank_explain's reason, generalized)
        val g = name.split(':')(1)
        val df = g match {
          case "text_lm_score" =>
            graft.operators.RetrievalQueries.lmScore(spark, dir, materialize = false)
          case "text_bm25" =>
            graft.operators.RetrievalQueries.bm25(spark, dir, materialize = false)
          case "pipe_curate" =>
            graft.operators.PipelineQueries.curate(spark, dir, materialize = false)
          case "retr_rrf" =>
            graft.operators.RetrievalQueries.rrf(spark, dir, materialize = false)
          case other => sys.error(s"no lazy form wired for $other")
        }
        df.explain("formatted")
        spark.sharedState.cacheManager.clearCache()
      } else if (name == "pagerank_explain") {
        // dump the 2-superstep lazy plan: which join strategy does the
        // contrib (ranks ⋈ deg) join get, and does the edge side stay
        // on the cached partitioning?
        import org.apache.spark.sql.functions.{col, get_json_object}
        val pairs = graft.Tables.events(spark, dir)
          .select(col("user_id").as("u"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .filter(col("k").isNotNull).distinct()
        val off = 1L << 40
        val edges = pairs
          .select(col("u").as("src"), (col("k") + off).as("dst"))
          .unionAll(pairs
            .select((col("k") + off).as("src"), col("u").as("dst")))
          .repartition(col("dst")).persist()
        edges.count()
        println(graft.operators.GraphQueries.pageRank(edges, 2)
          .queryExecution.executedPlan.toString)
        edges.unpersist(blocking = false)
      } else if (name == "pagerank_parts") {
        // stage attribution for q_pagerank: edges build+persist vs the
        // 5-superstep chain vs per-superstep walls (each superstep
        // checkpointed so its jobs are isolated)
        import org.apache.spark.sql.functions.{col, get_json_object}
        (1 to 2).foreach { pass =>
          spark.sharedState.cacheManager.clearCache()
          val t0 = System.nanoTime()
          val pairs = graft.Tables.events(spark, dir)
            .select(col("user_id").as("u"),
              get_json_object(col("props"), "$.k").cast("long").as("k"))
            .filter(col("k").isNotNull)
            .distinct()
          val off = 1L << 40
          val edges = pairs
            .select(col("u").as("src"), (col("k") + off).as("dst"))
            .unionAll(pairs
              .select((col("k") + off).as("src"), col("u").as("dst")))
            .repartition(col("dst"))
            .persist()
          val ne = edges.count()
          val t1 = System.nanoTime()
          val out = graft.operators.GraphQueries.pageRank(edges, 5)
            .orderBy(col("node")).localCheckpoint(true)
          val t2 = System.nanoTime()
          // per-superstep walls: checkpoint between supersteps
          val deg = edges.groupBy(col("src").as("node"))
            .agg(org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("d"))
          var ranks = deg.select(col("node"),
            org.apache.spark.sql.functions.lit(1000000L).as("r"))
            .localCheckpoint(true)
          val steps = (1 to 5).map { _ =>
            val s0 = System.nanoTime()
            val contrib = ranks.join(deg, "node")
              .select(col("node").as("src"),
                org.apache.spark.sql.functions.expr("r div d").as("c"))
            ranks = edges.join(
                org.apache.spark.sql.functions.broadcast(contrib), "src")
              .groupBy(col("dst").as("node"))
              .agg(org.apache.spark.sql.functions.sum(col("c")).as("cin"))
              .select(col("node"),
                (org.apache.spark.sql.functions.lit(150000L) +
                  org.apache.spark.sql.functions.expr("85 * cin div 100"))
                  .as("r"))
              .localCheckpoint(true)
            (System.nanoTime() - s0) / 1e9
          }
          edges.unpersist(blocking = true)
          println(f"pagerank_parts pass$pass edges($ne)=${(t1 - t0) / 1e9}%5.2f " +
            f"chain5=${(t2 - t1) / 1e9}%5.2f steps=" +
            steps.map(s => f"$s%4.2f").mkString(","))
        }
      } else if (name.startsWith("bpe_train:")) {
        import org.apache.spark.sql.functions.{col, explode}
        import graft.functions.TextFunctions.tokens
        val n = name.stripSuffix(":").split(':')(1).toInt
        val words = graft.Tables.documents(spark, dir)
          .select(explode(tokens(col("text"))).as("t"))
        val t0 = System.nanoTime()
        val merges = graft.operators.BpeTrainer.learn(spark, words, n)
        println(f"$name ${(System.nanoTime() - t0) / 1e9}%8.2f s " +
          s"merges=${merges.map { case ((a, b), c) => s"$a+$b:$c" }.mkString(",")}")
      } else {
      if (sys.env.contains("PROFILE_EXPLAIN"))
        SparkEntry.queries(name)(spark, dir).explain("formatted")
      (1 to 2).foreach { pass =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        println(f"$name pass$pass ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
      }
    }
    spark.stop()
  }
}
