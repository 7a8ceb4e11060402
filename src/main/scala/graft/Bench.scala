package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Each query is forced end-to-end with a noop write
  * (count() alone would let Catalyst prune the computed columns away).
  */
object Bench {
  // Headline set: one per operator family, weighted toward the shapes that
  // dominate at scale (join+agg pipeline, windows, dedup, similarity).
  val headline: Seq[String] = Seq(
    "q01_scan_project", "q04_groupby_sum", "q06_join_inner",
    "q12_multiway_join", "q13_household", "q18_window_rank",
    "q21_rollup", "q30_above_avg", "q57_tpch1",
    "d01_dedup_exact", "d03_minhash_lsh", "d04_simhash",
    "d07_dedup_clusters",
    // round-3 scale paths: bucketed embedding near-dup, capped-candidate
    // jaccard, star clustering — timed alongside their exact baselines
    "d09_lsh_neardup", "d10_ngram_capped", "d11_dedup_clusters_star",
    // round-3 corpus-prep: broadcast decontamination, two-pass LM scoring
    "d12_decontaminate", "t09_unigram_lm",
    "t02_text_quality", "s01_ann_topk", "s03_ann_ivf",
    "e01_tumbling_agg", "e02_sessionize", "e03_asof_join",
    "e06_session_window",
    // round-4: segment dedup (fingerprint-keyed shuffle), Bloom-prefilter
    // decontamination, warehouse maintenance, funnel, deep TPC-H join,
    // pair mining
    "d14_segment_dedup", "d15_decontam_bloom", "q68_incremental_agg",
    "q69_scd2", "q70_funnel", "q72_tpch5", "s05_pair_mining",
    "t14_heavy_hitters",
    // round-4 part 2: k-means clustering (trains per call — worst case),
    // fused expectations report, perplexity tiers, z-score anomalies
    "s06_kmeans_clusters", "q76_expectations", "t15_perplexity_buckets",
    "q74_anomaly",
    // iterative graph rounds + the time-series window family
    "g01_pagerank", "q78_rolling_stats",
    // customer analytics (3 global quintile sorts) + outer interval join
    "q84_rfm", "e11_interval_left",
    // round-4 part 3: CDC diff (one full-outer shuffle), order-bounded
    // co-purchase self-join, corpus-count collocations, contamination
    // report, quality-ranked cluster dedup, int8-coarse two-stage ANN,
    // wedge-close triangles, gaps-and-islands streaks
    "q86_snapshot_diff", "q91_copurchase", "t17_bigram_pmi",
    "t18_contamination_frac", "d16_cluster_best", "s07_ann_refine",
    "g02_triangles", "q92_streaks",
    // round-4 part 4: CDC apply, PSI drift, BM25, lone-late-supplier
    // aggregation, fixed-point centroids, two-phase global index
    "q96_cdc_apply", "q97_psi_drift", "t19_bm25", "q100_tpch21",
    "s08_label_centroids", "q102_global_index",
    // the non-associative per-key fold (flatMapGroups) + exact-cents
    // Pareto deciles
    "q104_capped_balance", "q105_pareto",
    // composed corpus pipeline + the widest classic join (Q9)
    "t23_corpus_e2e", "q108_tpch9",
    // round-4 part 5: prefix-filtering similarity join (the AllPairs
    // candidate scheme vs d02/d10's inverted index), iterative k-core
    // peel, shuffle-free Poisson bootstrap, point-in-time SCD2 lookup
    "d18_prefix_filter", "g03_kcore", "q121_bootstrap",
    "q120_scd2_lookup",
    // round-4 part 6: cross-source shingle overlap (heaviest self-join
    // shape), bigram LM (lag window + bigram-keyed shuffle), broadcast
    // prefix-dim scoring, pure-window CUSUM, first-occurrence novelty
    "t33_source_overlap", "t36_bigram_lm", "s12_prefix_recall",
    "q139_cusum", "t34_novelty",
    // round-4 part 7: REAL streaming executions (file source → watermark
    // state → sink, timed end-to-end incl. micro-batch scheduling),
    // codegen Jaro-Winkler neighbor pairing, Bellman-Ford rounds,
    // window-only exact stats, broadcast-codebook product quantization
    "e21_streamed_snapshot", "e22_streamed_hourly",
    "d20_jaro_neighbors", "g05_shortest_path", "q151_weighted_median",
    "q152_ewma", "q155_interval_coverage", "s13_pq_codes",
    "q158_filter_clause", "q160_share_of_total",
    // round-4 part 8: source-surface round-trips — JDBC sink+scan with
    // pushdown (embedded Derby) and the binaryFile multimodal front door
    "q161_jdbc_roundtrip", "m07_binary_files",
    // round-5: DSIR importance scoring (two corpus passes + broadcast
    // weight table), SemDeDup cluster-bounded cosine dedup, the linear
    // quality classifier, and blocked Fellegi-Sunter linkage scoring
    "t44_dsir_weights", "d22_semdedup", "t46_quality_classifier",
    "q189_fellegi_sunter", "g09_hits", "t48_dataset_manifest", "t49_count_min",
    "e29_stream_budget_fill", "g10_ppr", "m08_keyframes", "q190_band_join",
    "t52_lang_confusion", "e31_stream_countmin", "t53_pair_evidence",
    "q191_null_semantics", "q192_grouped_mode", "t54_ngram_coverage",
    "s15_embedding_profile",
    "t47_token_budget_mix",
    // state-store introspection: full streaming run + state-file read-back
    "e25_state_reader",
    // round-4 part 9: two-sample tests over the orders×customer join
    // (distinct-value window ECDFs), iterative LPA rounds, soundex
    // vocabulary blocking, per-user journey window, stream-stream outer
    // join with eviction-gated emission, XML round-trip (write + read)
    "q175_ks_test", "g06_label_prop", "t41_soundex_block",
    "q181_journeys", "e27_stream_leftouter", "q179_xml_roundtrip",
    // round-6: scale modes for the global-window family (exact ntile via
    // range-partitioned rank; rank-join sorted neighborhood), the
    // warm-quantizer IVF search (s03's amortized production shape), and
    // real WAV PCM decode
    "q95s_equidepth_scale", "q84s_rfm_scale", "q134s_deciles_scale",
    "d23_sorted_neighbors_scale", "s16_ann_ivf_warm", "m09_wav_energy",
    // hybrid RRF retrieval fusion, deterministic 64-register HLL, and
    // exact global quantiles with no single-task sort
    "s17_hybrid_rrf", "q193_hll_distinct", "q194_quantiles_scale",
    // round-6 part 3: substring-span dedup (gram-keyed shuffles + per-doc
    // interval union), distributed BPE training (6 rounds over the
    // vocabulary), MAD outliers (two exact-quantile passes)
    "d24_dup_substring", "d25_dup_span_coverage", "t56_bpe_merges",
    "q195_mad_outliers",
    // MMR diverse retrieval (k sequential argmax scans), per-group
    // exact quantiles on the grouped range-partitioned rank, and the
    // streamed bucketed median (2 forced micro-batches of grid state)
    "s18_mmr_select", "q196_group_quantiles", "e32_stream_median",
    // index-reuse incremental near-dup (batch + its stream-static twin)
    // and PQ-ADC search
    "d26_incremental_neardup", "s19_pq_adc", "e33_stream_neardup",
    // round-7: scale modes for the residual global-window family (Pareto
    // ntile, KS/Mann-Whitney prefix-sum ECDFs, skyline prefix-min) and
    // the reliable-checkpoint PageRank variant (quantifies executor-loss
    // survivability overhead vs g01)
    "q105s_pareto_scale", "q175s_ks_scale", "q178s_mw_scale",
    "q188s_skyline_scale", "g01c_pagerank_ckpt",
    // real BMP synth → javax.imageio pixel decode → thumbnail embedding
    "m10_image_embed",
    // hashed-shuffle production twins (xxhash64 gram keys) timed against
    // their string-keyed baselines d02(bench d10)/t54
    "d27_ngram_jaccard_hashed", "d28_ngram_capped_hashed",
    "t60_ngram_coverage_hashed",
    // cluster-aware split (leakage-proof by construction) + the
    // deterministic range-partitioned epoch shuffle
    "d29_cluster_split", "q198_global_shuffle",
    // the declared salted skew join (all-hot path on 5-key event_type)
    "q199_salted_join",
    // the whole curation path composed end-to-end in one query, plus
    // domain caps and semantic eval decontamination
    "t61_pretrain_pipeline", "t62_domain_cap", "d30_semantic_decontam",
    // round-8: real multi-frame GIF decode, the banded scale mode of
    // semantic decontamination, the reliable-checkpoint Index twin
    // (durability overhead vs q194, the g01c playbook), and the
    // combined n-gram + semantic decontamination audit
    "m11_gif_frames", "d31_semantic_decontam_lsh", "q194c_quantiles_ckpt",
    "t63_decontam_audit", "q201_quantile_cont_scale",
    // round-8 part 5: wedge-join link prediction, mergeable-sketch corpus
    // overlap, interpolated Kneser-Ney scoring, audio frame features
    "g11_link_predict", "t64_corpus_overlap_hll", "t65_kneser_ney",
    "m13_wav_features",
    // round-8 part 6: hub-weighted link prediction, grouped-HLL NDV,
    // silence segmentation
    "g12_adamic_adar", "t66_domain_ndv_hll", "m14_audio_segments",
    // round-8 part 7: live streamed HLL, incremental aggregate merge
    "e34_stream_hll", "q202_incremental_agg",
    // round-8 part 9: distributed linear algebra (Gramian + top PC)
    "s20_gram_matrix", "s21_top_pc",
    // round-8 part 10: live streamed Gramian, migration fingerprint
    "e35_stream_gram", "q203_table_fingerprint",
    // round-8 part 11: PCA projection leg, distributed eigencentrality
    "s22_pc_projection", "g13_eigen_centrality",
    // round-8 part 12: image-dedup capstone, soft dedup weighting
    "m15_image_dedup", "d32_softdedup_weights",
    // round-8 part 16: KMV bottom-k sketches (NDV + pairwise overlap)
    "s23_kmv_ndv", "t67_kmv_overlap",
    // round-8 part 17: streamed KMV state, cross-table key-overlap audit
    "e36_stream_kmv", "q204_key_overlap",
    // round-8 part 18: PII scrub, batch + streamed
    "t68_pii_scrub", "e37_stream_pii",
    // round-8 part 19: Z-order layout quality
    "q205_zorder_layout",
    // round-8 part 20: bloom-pruned join, CM join-size estimate
    "q206_bloom_join", "q207_join_size_cm",
    // round-8 part 21: streamed join-size stat, degree assortativity
    "e38_stream_join_size", "g14_assortativity",
    // round-8 part 22: deterministic histogram quantile sketch
    "q208_hist_quantiles",
    // round-8 part 23: video near-dup dedup capstone
    "m16_video_dedup",
    // round-8 part 24: ANN recall audit
    "s24_ann_recall",
    // round-8 part 25: join-key skew diagnostics
    "q209_skew_profile",
    // round-8 part 26: single-pass ANALYZE stats manifest
    "q210_analyze_stats",
    // round-8 part 31: merged-partial stats maintenance
    "q211_analyze_merge",
    // round-8 part 33: audio near-dup dedup (multimodal trio complete)
    "m17_audio_dedup",
    // round-8 part 34: local clustering coefficient
    "g15_clustering_coeff",
    // round-8 part 36: live streamed ANALYZE manifest
    "e39_stream_analyze",
    // round-9: stats-driven planning (manifest consumption)
    "q212_stats_broadcast_join", "q213_stats_join_order",
    // round-9: archive-shard ingestion (WebDataset shape)
    "m18_tar_shards", "m19_zip_shards",
    // round-9: zone-map file skipping + streamed shard ingestion
    "q214_stats_file_skip", "e40_stream_shards",
    // round-9: selectivity-aware broadcast, WebDataset samples,
    // upsert-sink oracle
    "q215_stats_filter_broadcast", "m20_webdataset_samples",
    "e41_stream_upsert", "q216_stats_range_broadcast",
    // round-10: injected-rule join reorder, date-range selectivity,
    // zone-skip scan path + metadata table, streamed tar walk
    "q217_stats_join_reorder", "q218_stats_date_broadcast",
    "q219_zone_skip_plain", "q220_zone_metadata", "m21_tar_shard_stream",
    "q221_lakehouse_capstone", "q222_zone_incremental",
    "e42_stream_zone_ingest", "q223_zone_skip_partitioned",
    "q224_stats_agg_broadcast",
    // round-11: self-maintaining sink metadata, sink + append-table
    // compaction, histogram selectivity, string predicates, multi-root
    // zone pruning
    "e43_sink_zone_skip", "q226_hist_selectivity",
    "q227_string_stats_zones", "q228_sink_compaction",
    "q229_zone_multiroot", "q230_zone_table_compaction",
    // round-11 (second wave): dictionary zones, snapshot time travel,
    // stats-driven skew salting
    "q231_dict_zone_skip", "q232_time_travel", "q233_skew_salted",
    "q234_in_list_skip", "q235_in_broadcast", "e44_sink_point_lookup",
    "q236_heavy_equality", "q237_sink_delete",
    "q238_sink_schema_evolution", "q239_snapshot_cdc_travel",
    "e45_stream_dict_ingest",
    // round-12: optimistic concurrency, Bloom point skipping past the
    // dictionary cap, lossless type widening, time-travel retention,
    // and the deterministic fixed-shard Misra-Gries promotion
    "q240_concurrent_writers", "q241_bloom_point_skip",
    "q242_sink_type_widening", "q243_time_travel_retention",
    "t20_misra_gries", "e46_sink_bloom_lookup",
    "q244_sink_constraints", "q245_sink_history",
    // round-13: the Jaro sorted-neighborhood scale twin (rank equi-join
    // candidates — the last global-window candidate path closed), the
    // t25 companion that oracles the compression invariants, and
    // merge-on-read DELETE via deletion vectors
    "d33_jaro_neighbors_scale", "t69_compression_invariants",
    "q246_sink_delete_vectors", "q247_sink_merge",
    "q248_sink_drop_column", "q249_sink_rebucket", "q250_sink_changes",
    "q251_sink_zorder_skip")

  /** The DRIVER FLOOR: the set the default (driver-mode) run times and
    * warms — sized to what the driver can actually consume. The driver
    * keeps ~2000 chars of stdout tail and kills the run at a wall cap;
    * the 246-entry headline at adaptive reps costs ~1850 s of sbt wall
    * and prints a line no fallback could fit, so rounds 8-12 produced
    * ZERO driver-side perf signal (VERDICT r12 task 1: time exactly
    * what the printed JSON can carry). Composition: the first 100
    * headline entries (the r07-era prefix — the oldest, most
    * cross-round-comparable floors, incl. the q13 flagship and every
    * pre-r07 family) plus one representative per post-r07 family
    * (sketches, linear algebra, multimodal dedup, streamed state,
    * stats-driven planning, shard ingestion, zone/dict/Bloom skipping,
    * lakehouse sink lifecycle, OCC). ~122 entries ≈ 1480 chars at
    * short keys — inside the 1700-char budget with headroom. The FULL
    * surface sweep lives behind SPARK_GRAFT_BENCH_ALL=1 →
    * bench_full.json (run locally every round; the per-round rotation
    * slice this replaces is subsumed by it).
    */
  val driverFloor: Seq[String] = headline.take(100) ++ Seq(
    "s20_gram_matrix", "g12_adamic_adar", "t64_corpus_overlap_hll",
    "s23_kmv_ndv", "t68_pii_scrub", "q208_hist_quantiles",
    "m15_image_dedup", "e34_stream_hll",
    "q212_stats_broadcast_join", "m18_tar_shards", "q214_stats_file_skip",
    "q219_zone_skip_plain", "q221_lakehouse_capstone",
    "q222_zone_incremental",
    "e43_sink_zone_skip", "q231_dict_zone_skip", "q232_time_travel",
    "q237_sink_delete", "q240_concurrent_writers",
    "q241_bloom_point_skip", "e46_sink_bloom_lookup", "t20_misra_gries")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.session(appName = "graft-bench")
    val qs = SparkEntry.queries
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    // streaming work-time telemetry: e-family wall times are dominated by
    // forced micro-batch SCHEDULING floors (trigger waits, stream start),
    // not data work — so streaming regressions must be judged on the sum
    // of per-micro-batch triggerExecution ms, recorded alongside wall.
    // The listener bus is async, so work is keyed by runId and the drain
    // BLOCKS until every run started during the rep has delivered its
    // termination event (per-run events are FIFO on the bus: termination
    // delivered ⇒ that run's progress events are already in its bucket) —
    // a fixed sleep could credit a late event to the next rep or, under
    // the shuffled timed order, to the next e-query entirely. The wait is
    // harness work — untimed.
    val runWork = new java.util.concurrent.ConcurrentHashMap[java.util.UUID, java.lang.Long]()
    val started = java.util.concurrent.ConcurrentHashMap.newKeySet[java.util.UUID]()
    val terminated = java.util.concurrent.ConcurrentHashMap.newKeySet[java.util.UUID]()
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryStartedEvent): Unit = { started.add(e.runId); () }
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryProgressEvent): Unit = {
          val d = Option(e.progress.durationMs.get("triggerExecution"))
            .map(_.longValue).getOrElse(0L)
          runWork.merge(e.progress.runId, d, (a, b) => a + b)
          ()
        }
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryTerminatedEvent): Unit = { terminated.add(e.runId); () }
      })
    def drainStreamMs(): Long = {
      // every stream a query runs has already awaitTermination'd by now —
      // only the listener-bus delivery lag remains (bounded backstop: 5 s)
      val deadline = System.nanoTime() + 5000000000L
      while (!terminated.containsAll(started) && System.nanoTime() < deadline)
        Thread.sleep(10)
      val w = {
        import scala.jdk.CollectionConverters._
        started.asScala.toSeq
          .map(id => Option(runWork.get(id)).map(_.longValue).getOrElse(0L)).sum
      }
      started.clear(); terminated.clear(); runWork.clear()
      w
    }
    def once(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try qs(name)(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        failed += name // a failed query must not masquerade as a fast one
      }
      val elapsed = (System.nanoTime() - t0) / 1e9 // before cache teardown
      // drop persist() leftovers so cached blocks never accumulate across
      // queries (memory creep would distort later measurements); the
      // teardown itself is harness work, not query work — untimed
      spark.catalog.clearCache()
      elapsed
    }
    // SPARK_GRAFT_BENCH_ALL=1: the full-surface sweep — every declared
    // query joins the timed set (VERDICT-r8 task 6: one committed floor
    // for the whole surface), with reps dialed down (default 2: one
    // past the warm-up pass) since the goal is coverage, not a
    // cross-round floor. The stdout shedding chain already handles the
    // larger map; bench_full.json carries everything as always.
    val benchAll = sys.env.get("SPARK_GRAFT_BENCH_ALL").contains("1")
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS").map(_.toInt)
      .getOrElse(if (benchAll) 2 else 5)
    // driver mode times ONLY the driver floor (what the parsed stdout
    // line can carry, within the driver's wall cap); benchAll times the
    // whole declared surface. "rotation" = the beyond-the-floor tail,
    // shed FIRST from stdout (bench_full.json always carries it).
    val rotation =
      if (benchAll) qs.keys.toSeq.filterNot(driverFloor.contains).sorted
      else Seq.empty[String]
    val declared = driverFloor.filter(qs.contains) ++ rotation
    // JIT/codegen warm-up AT THE TARGET SCALE FACTOR: AQE picks different
    // physical shapes (broadcast vs shuffle joins, coalesced readers) per
    // data size, so warming at a smaller sf compiles the WRONG codegen and
    // the first timed run still pays janino (measured 4-18x inflation cold).
    // The warm-up wall also prices each entry: 1 s+ entries get their
    // reps cut to 2 below — the floor-hunting value of reps 3-5 is
    // negligible against the wall they burn (the round-11/12 driver
    // benches ran past the cap on exactly this).
    // Shared fixtures are prebuilt FIRST so the build lands on no entry's
    // warm-up wall: without this, whichever sink-family query warms first
    // (e43 in headline order) absorbs the ~10 s fixture build, classifies
    // as slow, and loses reps its steady-state (0.4 s) deserves.
    try { Queries95.sharedMaintainedSink(spark, sfDir); () }
    catch { case e: Throwable =>
      System.err.println(s"[bench] shared fixture prebuild failed: $e") }
    val warmWall = declared.map(n => n -> once(n, sfDir)).toMap
    drainStreamMs() // warm-up streams must not pollute the first bucket
    // SEEDED-shuffled timed order: with declared order, residual
    // front-of-run warm-up (JIT tiering, code-cache churn) polluted the
    // SAME entries every round (q01/q04/q06 drifted 1.3-2.1x r5→r6 at
    // unchanged code, adjudicated as bench-context noise by the 12-rep
    // protocol — PLANS.md round 7). A fixed seed keeps runs reproducible
    // while decoupling a query's measurement from its list position.
    val timedOrder = new scala.util.Random(20260814L).shuffle(declared)
    // best-of-5: the container shares CPU with the harness, so timed
    // passes can be polluted by minutes-long transient external load
    // (round-1 recorded 3-18x inflation on individual queries from this)
    val workMs = scala.collection.mutable.Map.empty[String, Long]
    val timed = timedOrder.map { name =>
      // adaptive floor-hunting: sub-second entries keep their 5 reps
      // (cheap, and they ARE the cross-round floor set); anything at
      // 1 s+ gets 2 — with the warm pass that is 3 observations, and
      // the 12-rep graft.Time protocol adjudicates drift when needed.
      // Budget: ~390 s of reps + ~200 s warm for the 122-entry driver
      // floor, safely inside the driver's wall cap (r11/r12 rc 124
      // were uniform-reps over 246 entries). An explicit
      // SPARK_GRAFT_BENCH_REPS overrides all.
      val wm = warmWall.getOrElse(name, 0.0)
      val nReps =
        if (sys.env.contains("SPARK_GRAFT_BENCH_REPS") || benchAll) reps
        else if (wm > 1.0) math.min(reps, 2)
        else reps
      val repTimes = (1 to nReps).map { _ =>
        val t = once(name, sfDir)
        // drain after ANY query that started streams, keyed to THIS
        // query: the round-11 sink q-entries (q228/q232/q237/q238) run
        // streaming fixtures too, and the old e-prefix gate let their
        // trigger ms leak into the next e-named query's bucket
        // (bench_full r11: e02 credited 87.8 s against a 0.485 s wall)
        if (!started.isEmpty) {
          val w = drainStreamMs()
          // keep the smallest positive work sum: the same floor-hunting
          // best-of logic as the wall min (0 = no progress event seen)
          if (w > 0L) workMs.updateWith(name) {
            case Some(prev) => Some(math.min(prev, w))
            case None => Some(w)
          }
        }
        t
      }
      name -> repTimes.min
    }.toMap
    val results = declared.map(n => n -> timed(n))
    // a failed query's (typically fast) elapsed time must not feed the
    // headline: report it only in "failed", keep value = sum of successes
    val ok = results.filterNot { case (k, _) => failed.contains(k) }
    val total = ok.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // the driver stores only the last ~2000 chars of stdout and parses the
    // JSON line out of that tail: with 78+ queries the full-name map blows
    // past the window and the head of the line gets clipped (BENCH_r04
    // "parsed": null). The printed line therefore uses the unique id
    // prefix per query ("q01", "d14", ... — the spec's own "q1":sec
    // shape); the full-name map goes to bench_full.json alongside.
    def short(n: String): String =
      n.indexOf('_') match { case -1 => n; case i => n.substring(0, i) }
    val collision = ok.map(t => short(t._1)).groupBy(identity)
      .exists(_._2.size > 1)
    val key: String => String = if (collision) identity else short
    // stdout rides 2 decimals (10 ms — plenty for seconds-scale entries)
    // to keep 160+ queries inside the driver's tail window; the 3-decimal
    // map lives in bench_full.json
    def qmap(entries: Seq[(String, Double)]): String =
      entries.map { case (k, v) => "\"" + key(k) + f"\":$v%.2f" }
        .mkString("{", ",", "}")
    val qjson = qmap(ok)
    // headline-only fallback map: the stable cross-round set, which must
    // never be crowded out of the parse window by the rotation slice
    val qjsonHead = qmap(ok.filterNot { case (k, _) => rotation.contains(k) })
    val fullJson = ok.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    // per-micro-batch work time (triggerExecution ms summed over the
    // run's batches, best-of-reps) for the e-family: wall minus this is
    // the scheduling floor, so regressions are judged on work, not waits.
    // stdout uses the compact "sw" key (the driver's ~2000-char tail
    // window is the constraint — see the short-key note above); the full
    // "stream_work_ms" map lives in bench_full.json
    val workJson = ok.collect {
      case (k, _) if workMs.contains(k) => "\"" + key(k) + s"""\":${workMs(k)}"""
    }.mkString("{", ",", "}")
    val workFullJson = ok.collect {
      case (k, _) if workMs.contains(k) => "\"" + k + s"""\":${workMs(k)}"""
    }.mkString("{", ",", "}")
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_full.json"),
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$fullJson,"stream_work_ms":$workFullJson,"failed":$failedJson,"sf":"$sfDir"}%n"""
        .getBytes("UTF-8"))
    catch { case _: Throwable => () } // best effort; the stdout line rules
    val withSw = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qjson,"sw":$workJson,"failed":$failedJson,"sf":"$sfDir"}"""
    // the driver keeps only the LAST ~2000 stdout chars and parses the
    // JSON line out of that tail — a line longer than the window gets its
    // HEAD clipped and parses as null. Shed detail in order until the
    // line fits: drop "sw" first, then the rotation slice (the stable
    // headline map must always parse for cross-round comparison), then
    // the per-query map itself (bench_full.json always carries all of it).
    val noSw = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qjson,"failed":$failedJson,"sf":"$sfDir"}"""
    val headOnly = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qjsonHead,"n_rot":${rotation.count(r => ok.exists(_._1 == r))},"failed":$failedJson,"sf":"$sfDir"}"""
    // once even the headline map outgrows the window (184+ timed queries
    // as of round 8), emit the largest PREFIX of it that fits: headline
    // order is append-only across rounds, so the prefix is exactly the
    // oldest, most cross-round-comparable entries, and "n_more" says how
    // many spilled into bench_full.json (which always carries everything)
    def headPrefix(): String = {
      val headEntries = ok.filterNot { case (k, _) => rotation.contains(k) }
      def line(p: Int): String =
        f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${qmap(headEntries.take(p))},"n_more":${ok.size - p},"failed":$failedJson,"sf":"$sfDir"}"""
      val p = (headEntries.size to 0 by -1).find(line(_).length <= 1700)
        .getOrElse(0)
      line(p)
    }
    val totalsOnly = f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${ok.size},"failed":$failedJson,"sf":"$sfDir"}"""
    // budget ≤ 1700, not ~1950: the driver parses the JSON out of only
    // the LAST ~2000 stdout chars, and sbt appends its own
    // "[success] Total time: ..." trailer (~60 chars) plus a blank line
    // after our println — at 1950 the trailer pushed the line's HEAD out
    // of the window and BENCH_r{08..10} all parsed null (VERDICT r11
    // task 2). 1700 leaves real headroom for harness framing drift.
    println(
      if (withSw.length <= 1700) withSw
      else if (noSw.length <= 1700) noSw
      else if (headOnly.length <= 1700) headOnly
      else if (headPrefix().length <= 1700) headPrefix()
      else totalsOnly)
    spark.stop()
  }
}
