package graft

/** Benchmark main. Prints ONE JSON line with per-query seconds.
  *
  * Timing discipline: the suite is executed as TWO FULL PASSES (pass A runs
  * every query once, then pass B runs every query once) and the ADOPTED time
  * per query is the min across passes. Running the passes back-to-back per
  * query (the old min-of-2) left both samples of a query inside the same
  * sandbox stall window: under gVisor, disk/writeback throughput can degrade
  * 3-9x for minutes at a time, and rounds 3, 4 and 7 all produced driver
  * artifacts with phantom regressions (round 7: +824% on a comment-only diff)
  * that judge re-runs of the same HEAD disproved. Separating the two samples
  * by a full suite pass decorrelates them from any single stall.
  *
  * The artifact is additionally self-diagnosing: a fixed health probe
  * (q_a1_scan_filter, a light scan+filter whose clean time is ~0.6 s under
  * noop-sink timing — it materializes its ~27k-row output; ~0.2-0.3 s under
  * the old count() timing) is
  * run at the start of each pass and after every [[probeEvery]] queries, and
  * the full probe series is emitted per pass (`probes`). A degraded window
  * shows up as elevated probe times bracketing the affected queries, so a
  * slow sample can be attributed to the environment from the JSON alone.
  * Both raw runs are emitted (`queries_raw`, pass order) alongside the
  * adopted numbers (`queries`) so the record stays honest about what was
  * measured.
  *
  * Each query is materialized through the `noop` sink (full physical plan,
  * rows discarded at the writer), not `count()`: a counted plan lets
  * Catalyst's EliminateSorts drop the terminal global orderBy and prune the
  * emit projections, under-measuring what a user actually pays (`"sink"`
  * field in the JSON records this).
  */
object Bench {
  private val ProbeName = "q_a1_scan_filter"
  private val probeEvery = 4

  /** `SPARK_GRAFT_TIER=headline` — the documented flagship subset for a
    * budget-constrained driver run: every operator family's flagship(s)
    * plus the historically most expensive bench rows, so a headline run
    * still exercises each scale story (relational DECIMAL pipelines,
    * the event skew dispatch pair, all four stored-index lifecycles,
    * trainer cold paths, the CC-fixpoint capstones, the calibration
    * sweeps and the multimodal chain). The default tier (`full`) runs
    * every registered query and emits an artifact byte-compatible with
    * prior rounds (plus the `tier` field). BenchTierSpec pins that this
    * list stays a subset of the registry.
    */
  private[graft] val HeadlineTier: Set[String] = Set(
    // relational core + the heaviest DECIMAL pipelines
    "q_a1_scan_filter", "q_a2_agg", "q_a4_join_broadcast", "q_a13_topk",
    "q_a19_math",
    // event surface (both sides of the measured skew dispatch)
    "q_b1_tumbling_window", "q_b3_sessionize", "q_b3_sessionize_salted",
    "q_b4_asof_join", "q_b9_interval_join",
    // dedup flagships + exact bases + family fixpoint consumers
    "q_b5_dedup_exact", "q_b6_jaccard_neardup", "q_c1_minhash_lsh",
    "q_c2_simhash", "q_c3_ngram_jaccard", "q_c48_substr_dedup",
    "q_c13_dup_clusters", "q_c19_neardup_retained",
    // similarity + the four stored-index lifecycles
    "q_b7_cosine_topk", "q_c9_ann_ivf", "q_c29_semantic_dedup",
    "q_c12_bm25", "q_c45_bm25_stored", "q_c66_minhash_stored",
    "q_c103_phrase_search", "q_c130_ivf_compacted",
    // filtering / scoring / loader scheduling
    "q_b8_percentiles", "q_c24_decontaminate", "q_c25_sequence_pack",
    "q_c30_quality_classifier", "q_c31_rules_filter", "q_c36_dsir_resample",
    "q_c44_bigram_logprob", "q_c47_fuzzy_decontaminate",
    "q_c49_quality_ensemble",
    // trainers + LM statistics (the job-heavy cold class)
    "q_c33_bpe_train", "q_c80_kn_bigram_lm", "q_c87_kn_trigram_ppl",
    "q_c110_tokenizer_fertility", "q_c137_classifier_train",
    "q_c138_classifier_scores", "q_c139_classifier_holdout",
    "q_c143_model_drift",
    // calibration + capstones (the most expensive bench rows)
    "q_c85_candidate_agreement", "q_c95_winnow_calibration",
    "q_c105_family_diameter", "q_c117_pipeline_funnel",
    "q_c118_funnel_corpus", "q_c119_quality_funnel_corpus",
    "q_c120_lsh_band_grid", "q_c132_ivf_nprobe_frontier",
    "q_c133_segment_retirement",
    // multimodal chain
    "q_c10_multimodal_stats", "q_c11_media_features", "q_c41_media_neardup")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to the full local[32] harness (driver contract); shuffle
    // partitions match so tiny-SF stages don't fan out beyond cores
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.local(cpus.toInt, cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM (codegen, shuffle machinery, parquet reader) so the
    // first measured query doesn't absorb one-time session cost
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    // optional comma-separated name-substring filter for targeted iteration
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSeq)
    // diagnostic-only: SPARK_GRAFT_SINK=count restores the old count() timing
    // for same-window A/B attribution (noop-vs-count delta vs sandbox drift).
    // The default — and what every driver artifact uses — is the noop sink.
    val sinkMode = sys.env.getOrElse("SPARK_GRAFT_SINK", "noop")
    // SPARK_GRAFT_TIER=headline runs the documented flagship subset
    // (see [[HeadlineTier]]); the default full tier is artifact-parity
    // with prior rounds. An unknown tier value fails fast rather than
    // silently benching the wrong set.
    val tier = sys.env.getOrElse("SPARK_GRAFT_TIER", "full")
    val tierFilter: String => Boolean = tier match {
      case "full"     => _ => true
      case "headline" => HeadlineTier.contains
      case other => sys.error(
        s"SPARK_GRAFT_TIER=$other: expected 'full' or 'headline'")
    }
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (name, _) =>
      tierFilter(name) && only.forall(_.exists(name.contains))
    }
    // an empty selection (e.g. SPARK_GRAFT_ONLY naming a query outside the
    // headline tier) must fail loudly, not print a 0-second artifact
    if (selected.isEmpty) sys.error(
      s"no queries selected: tier=$tier only=${only.getOrElse(Nil).mkString(",")}")

    // Per-query JOB COUNTS (round 10): wall time alone hides scheduler-
    // overhead regressions — under gVisor each job costs ~2 s fixed, so an
    // operator that silently grows an extra action per round (the round-8
    // star-CC bug class) regresses total time without any single stage
    // slowing down. A SparkListener counts job starts; snapshots bracket
    // each query. The listener bus is async, so each snapshot polls until
    // the counter is stable (outside the timed section — the poll costs
    // ~40 ms and never touches the measured interval).
    val jobCounter = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobCounter.incrementAndGet(); ()
      }
    })
    def stableJobCount(): Int = {
      var prev = jobCounter.get()
      var same = 0
      while (same < 2) {
        Thread.sleep(20)
        val c = jobCounter.get()
        if (c == prev) same += 1 else { prev = c; same = 0 }
      }
      prev
    }

    def time(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
             name: String): (Double, Option[Throwable], Int) = {
      val jobs0 = stableJobCount()
      val t0 = System.nanoTime()
      // Materialize the FULL result through a noop sink rather than count():
      // counting lets EliminateSorts delete a query's terminal global orderBy
      // and column pruning drop the emit-cast projections, so the measured
      // plan was cheaper than what a user pays. The noop write executes the
      // complete physical plan (sorts, final projections, row serialization)
      // and discards rows at the sink — the honest end-to-end number.
      val err = try {
        val df = fn(spark, sfDir)
        if (sinkMode == "count") df.count()
        else df.write.format("noop").mode("overwrite").save()
        None
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] FAILED $name: ${e.getClass.getName}: ${e.getMessage}")
          Some(e)
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      (elapsed, err, stableJobCount() - jobs0)
    }

    val probeFn = SparkEntry.queries.get(ProbeName)

    // One full pass: run every selected query once, probing the environment
    // at the start and after every `probeEvery` queries. Returns per-query
    // (time, error) plus the probe time series for the pass.
    def pass(): (Map[String, (Double, Option[Throwable], Int)], Seq[Double]) = {
      val probes = scala.collection.mutable.ArrayBuffer.empty[Double]
      def probe(): Unit = probeFn.foreach { fn => probes += time(fn, s"$ProbeName[probe]")._1 }
      probe()
      val out = selected.zipWithIndex.map { case ((name, fn), i) =>
        val r = time(fn, name)
        // release plan-build-time RDD caches (rarity-rank vocabs) so a long
        // bench session doesn't accumulate executor storage
        graft.core.CachedRdds.drain()
        if ((i + 1) % probeEvery == 0 && i + 1 < selected.size) probe()
        name -> r
      }.toMap
      probe()
      (out, probes.toSeq)
    }

    val (passA, probesA) = pass()
    val (passB, probesB) = pass()

    val results = selected.map { case (name, _) =>
      val (tA, eA, jA) = passA(name)
      val (tB, eB, jB) = passB(name)
      val oks = Seq((tA, eA), (tB, eB)).collect { case (t, None) => t }
      val adopted = if (oks.nonEmpty) oks.min else math.min(tA, tB)
      // a query that errored in EITHER pass is a failure (parity with the
      // old harness): a nondeterministic crash must not ship as a clean
      // number just because the other pass survived
      (name, Seq(tA, tB), adopted, eA.isEmpty && eB.isEmpty, Seq(jA, jB))
    }

    def fmt(d: Double): String = f"$d%.4f"
    val qs = results.map { case (k, _, adopted, _, _) => s"\"" + k + "\":" + fmt(adopted) }
      .mkString("{", ",", "}")
    val raw = results.map { case (k, runs, _, _, _) =>
      s"\"" + k + "\":" + runs.map(fmt).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // per-pass job counts; pass B can legitimately differ from pass A
    // (memo-warm queries skip their build jobs; AQE stage planning can
    // drift by one), so BOTH are recorded rather than an adopted scalar
    val jobsJson = results.map { case (k, _, _, _, js) =>
      s"\"" + k + "\":" + js.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, _, false, _) => k }
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val probesJson =
      s"""{"passA":${probesA.map(fmt).mkString("[", ",", "]")},"passB":${probesB.map(fmt).mkString("[", ",", "]")}}"""
    // pin the approximate query's QUALITY next to its wall time — recall@5
    // vs exact brute force AND the MEASURED scanned-corpus fraction, on
    // BOTH fixtures (the rows-only correctness check can't see quality
    // regressions, and recall without its scanned fraction can't separate
    // structure from fan-out):
    //  - uniform: the shipped q_c9 operating point (nprobe = k/2 — this
    //    corpus's near-uniform embeddings cluster weakly, so recall there
    //    is bought with fan-out; documented since round 9), and
    //  - clustered: the deterministic planted-cluster corpus at the
    //    structural nprobe = √k, where the probed cells blanket the
    //    query's own cluster and the scanned fraction is ≪ 50 %.
    val quality: Option[String] =
      if (selected.exists(_._1 == "q_c9_ann_ivf")) {
        try {
          val sq = graft.operators.SimilarityQueries
          val base = sq.ivfCorpus(spark, sfDir)
          val (uR, uF, uK, uN) = sq.ivfQuality(spark, base, k => math.max(2, k / 2))
          graft.core.CachedRdds.drain()
          // int8-stage-1 + exact rerank at the same fan-out (round 12):
          // identical row-scanned fraction, ~4x fewer stage-1 BYTES at
          // scale (1-byte elements); the recall delta vs exact stage 1 is
          // the quantization loss the over-fetch must absorb (measured 0)
          val (rR, _, _, _) = sq.ivfQuality(spark, base, k => math.max(2, k / 2),
            search = (e, fn, np) => sq.ivfSearchRerank(e, fn, np))
          graft.core.CachedRdds.drain()
          val (cR, cF, cK, cN) =
            sq.ivfQuality(spark, sq.clusteredCorpus(spark, base), sq.sqrtNprobe)
          graft.core.CachedRdds.drain()
          Some(
            s""","quality":{"q_c9_recall_at_5":${fmt(uR)},"q_c9_scanned_fraction":${fmt(uF)},"q_c9_nprobe":$uN,"q_c9_cells":$uK,"q_c9_rerank_recall_at_5":${fmt(rR)},"q_c9_clustered_recall_at_5":${fmt(cR)},"q_c9_clustered_scanned_fraction":${fmt(cF)},"q_c9_clustered_nprobe":$cN,"q_c9_clustered_cells":$cK}""")
        } catch {
          case e: Throwable =>
            // never let the quality probe sink the bench, but the artifact
            // must record that the probe was ATTEMPTED and crashed — a
            // silently absent key is indistinguishable from "not applicable"
            System.err.println(
              s"[bench] quality computation failed: ${e.getClass.getName}: ${e.getMessage}")
            Some(""","quality":{"q_c9_recall_at_5":null}""")
        }
      } else None
    val total = if (results.nonEmpty) results.map(_._3).sum else 0.0
    val jsonLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","timing":"min_of_2_passes","sink":"$sinkMode","tier":"$tier","queries":$qs,"queries_raw":$raw,"jobs":$jobsJson,"probes":$probesJson,"failed":$failedJson${quality.getOrElse("")},"sf":"$sfDir"}"""
    println(jsonLine)
    // durable copy of the SAME line: the driver's BENCH_r{N}.json keeps
    // only a truncated stdout tail, so for two straight rounds the
    // adopted per-query numbers survived nowhere parseable (judge r16).
    // SPARK_GRAFT_BENCH_OUT overrides the path; default bench_out.json
    // in the cwd. Best-effort — an unwritable path must not sink a
    // finished bench.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), jsonLine + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
