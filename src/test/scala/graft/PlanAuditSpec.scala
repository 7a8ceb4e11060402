package graft

/** Physical-plan shape pins for the round-4 session operators: the
  * scale arguments in the scaladocs ("bounded by the equality key",
  * "never all-pairs", "vocabulary broadcasts") must be visible in the
  * executed plan, not just claimed. Complements ScaleInfraSpec.
  */
class PlanAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("d18 prefix filtering joins on equality keys, never all-pairs") {
    val p = plan("d18_prefix_filter")
    assert(!p.contains("CartesianProduct"), p.linesIterator.take(5).mkString)
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q118 self-join extracts the custkey equality key") {
    val p = plan("q118_rapid_repeat")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q120 point-in-time lookup is an equi-join with interval residual") {
    val p = plan("q120_scd2_lookup")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("t24 vocabulary joins back as a broadcast") {
    val p = plan("t24_oov_rate")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q121 bootstrap plan has no join at all — pure map + 32-group agg") {
    val p = plan("q121_bootstrap")
    assert(!p.toLowerCase.contains("join"))
  }

  test("t33 source overlap joins only on the shared shingle, never source × source") {
    val p = plan("t33_source_overlap")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("s11 cluster quality broadcasts the centroids") {
    val p = plan("s11_cluster_quality")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q161 JDBC read pushes the filter into Derby; nation joins broadcast") {
    val p = plan("q161_jdbc_roundtrip")
    assert(p.contains("Scan JDBCRelation"), p.linesIterator.take(3).mkString)
    assert(p.contains("GreaterThanOrEqual(n_cust,10)"))  // in PushedFilters
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q162 SQL UDF bodies inline — no UDF node survives in the physical plan") {
    val p = plan("q162_sql_udf")
    assert(!p.toLowerCase.contains("udf"), p.linesIterator.take(5).mkString)
    assert(p.contains("HashAggregate"))
  }

  test("q163 bound parameters fold into parquet pushdown like literals") {
    val p = plan("q163_param_sql")
    assert(p.contains("PushedFilters"))
    // the plan string elides the filter list tail — pin the first bound
    // param (the timestamp) reaching the parquet scan
    assert(p.contains("GreaterThanOrEqual(l_shipdate,1995-01-01T00:00"), p)
  }

  test("d20 jaro neighbor pairing is window-based — no join of any kind") {
    val p = plan("d20_jaro_neighbors")
    assert(!p.toLowerCase.contains("join"))
  }

  test("s13 PQ assignment broadcasts the codebook; corpus never all-pairs") {
    val p = plan("s13_pq_codes")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q151/q155 weighted median and interval coverage are join-free window plans") {
    assert(!plan("q151_weighted_median").toLowerCase.contains("join"))
    assert(!plan("q155_interval_coverage").toLowerCase.contains("join"))
  }

  test("q160 share-of-total windows run over the 25-row aggregate, lineitem joins broadcast") {
    val p = plan("q160_share_of_total")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("s12 prefix recall broadcasts the query side; corpus never shuffles for scoring") {
    val p = plan("s12_prefix_recall")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q139 CUSUM is join-free — windows over one user-keyed shuffle") {
    val p = plan("q139_cusum")
    assert(!p.toLowerCase.contains("join"))
  }

  test("t34 novelty joins shingle-keyed then doc-keyed, never doc × doc") {
    val p = plan("t34_novelty")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("t36 bigram LM: unigram table broadcasts; no cartesian anywhere") {
    val p = plan("t36_bigram_lm")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q141 partitioned read prunes to the one selected day") {
    val df = SparkEntry.queries("q141_partition_prune")(spark, sfDir)
    val scans = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val pruned = scans.exists(s =>
      s.contains("PartitionFilters") && s.contains("2024-01-15"))
    assert(pruned, scans.mkString("\n").take(500))
  }

  // ------------------------------------------------------------- round 5

  test("t44 DSIR: weight table broadcasts; the corpus never self-joins") {
    val p = plan("t44_dsir_weights")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin"), "corpus-sized join would SMJ")
  }

  test("q189 multi-pass blocking extracts fine equi-keys — no nation-only block") {
    val p = plan("q189_fellegi_sunter")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // each pass must join on (nat, blockfield), not nat alone: the fine
    // key appears in the join condition of every join node
    val joins = p.linesIterator.filter(_.contains("Join")).toSeq
    assert(joins.nonEmpty)
    assert(joins.forall(j => j.contains("balb") || j.contains("cc") ||
                             j.contains("nm3")),
      joins.mkString("\n"))
  }

  test("t49 count-min: counter table broadcasts back for point queries") {
    val p = plan("t49_count_min")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("t47 budget mix is join-free — one window over the source key") {
    val p = plan("t47_token_budget_mix")
    assert(!p.toLowerCase.contains("join"))
    assert(p.contains("Window"))
  }

  test("m08 keyframes is join-free — windows over the doc key") {
    val p = plan("m08_keyframes")
    assert(!p.toLowerCase.contains("join"))
    assert(p.contains("Window"))
  }

  // ------------------------------------------------------------- round 6

  test("q151 windows consume the pre-aggregated (g,v) domain, not raw lineitem") {
    val p = plan("q151_weighted_median")
    // plan trees print top-down, so the domain pre-aggregation (the
    // groupBy(g,v).sum(w) that bounds the window input to ~150 rows)
    // must appear BELOW the last Window operator
    val lastWindow = p.lastIndexOf("Window")
    val lastAgg = p.lastIndexOf("HashAggregate")
    assert(lastWindow >= 0, "expected window operators in the plan")
    assert(lastAgg > lastWindow,
      "expected a HashAggregate beneath the windows (distinct-domain pre-agg)\n" + p)
  }

  test("scale-mode ntile queries have no single-task stage anywhere") {
    // the exact forms deliberately use a global window (Exchange
    // SinglePartition below the Window); the scale modes' entire point
    // is that no stage funnels through one task
    for (n <- Seq("q95s_equidepth_scale", "q134s_deciles_scale",
                  "q84s_rfm_scale", "q194_quantiles_scale",
                  "q201_quantile_cont_scale")) {
      val p = plan(n)
      assert(!p.contains("SinglePartition"),
        s"$n funnels through one task:\n" + p.take(800))
    }
  }

  test("d23 scale sorted-neighborhood: rank equi-join, no single-task sort") {
    val p = plan("d23_sorted_neighbors_scale")
    assert(!p.contains("SinglePartition"), p.take(800))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("d33 Jaro scale sorted-neighborhood: same rank equi-join shape") {
    val p = plan("d33_jaro_neighbors_scale")
    assert(!p.contains("SinglePartition"), p.take(800))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("substring-span dedup joins windows on the gram key — no cartesian") {
    for (n <- Seq("d24_dup_substring", "d25_dup_span_coverage")) {
      val p = plan(n)
      assert(!p.contains("CartesianProduct"), n)
      assert(!p.contains("BroadcastNestedLoopJoin"), n)
      assert(!p.contains("Exchange SinglePartition"), n)
    }
  }

  test("quantile-rank queries never funnel through one task") {
    // q195 carries two BroadcastNestedLoopJoin Cross against broadcast
    // 1-ROW aggregates (the med/mad attach — the accepted bounded-side
    // pattern), so only the single-task marker is pinned there
    for (n <- Seq("q195_mad_outliers", "q196_group_quantiles")) {
      val p = plan(n)
      assert(!p.contains("Exchange SinglePartition"), n)
      assert(!p.contains("CartesianProduct"), n)
    }
    assert(!plan("q196_group_quantiles").contains("BroadcastNestedLoopJoin"))
  }

  test("curriculum interleave has no per-source window funnel") {
    val p = plan("q197_curriculum_interleave")
    assert(!p.contains("Exchange SinglePartition"), p.take(800))
    assert(!p.contains("CartesianProduct"))
  }

  // ------------------------------------------------------------- round 7

  test("pareto/skyline scale twins have no single-task stage anywhere") {
    for (n <- Seq("q105s_pareto_scale", "q188s_skyline_scale")) {
      val p = plan(n)
      assert(!p.contains("SinglePartition"),
        s"$n funnels through one task:\n" + p.take(800))
      assert(!p.contains("CartesianProduct"), n)
    }
  }

  test("ECDF scale twins: SinglePartition only under partial-protected aggregates") {
    // q175s/q178s end in a global 1-row aggregate, whose final merge
    // legitimately crosses a SinglePartition exchange — but it moves
    // only #partitions PARTIAL rows (map-side combine). The scale claim
    // is that no Sort/Window ever does: walk each SinglePartition
    // exchange up to its parent operator and require an Aggregate.
    def opIndent(l: String): Int = l.indexWhere(c => !" :+-".contains(c))
    for (n <- Seq("q175s_ks_scale", "q178s_mw_scale")) {
      val p = plan(n)
      assert(!p.contains("CartesianProduct"), n)
      val lines = p.linesIterator.toVector
      for (i <- lines.indices if lines(i).contains("Exchange SinglePartition")) {
        val my = opIndent(lines(i))
        val parent = (i - 1 to 0 by -1).iterator.map(lines)
          .find(l => opIndent(l) >= 0 && opIndent(l) < my)
        assert(parent.exists(l => l.contains("Aggregate")),
          s"$n: SinglePartition feeds a non-aggregate: " +
            parent.getOrElse("<root>") + "\n" + p.take(1200))
      }
      // and the windows themselves are partition-local (pid-keyed)
      assert(!lines.exists(l => l.contains("Window") &&
               l.contains("windowspecdefinition(") &&
               !l.contains("__graft_pid")),
        s"$n carries a non-partition-local window:\n" + p.take(1200))
    }
  }

  test("q198 epoch shuffle has no single-task stage (range-partitioned rank)") {
    val p = plan("q198_global_shuffle")
    assert(!p.contains("SinglePartition"), p.take(800))
    assert(!p.contains("CartesianProduct"))
  }

  test("d29 cluster split joins components back — no cartesian, no single task") {
    val p = plan("d29_cluster_split")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("Exchange SinglePartition"), p.take(800))
  }

  test("q199 salted join: both paths equi-keyed, hot side salted") {
    val p = plan("q199_salted_join")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("Exchange SinglePartition"), p.take(800))
    // the salted path's join key must include the salt column
    assert(p.contains("__salt"), "expected the salted sub-key in the plan")
  }

  test("t61 composed pipeline inherits the pinned shapes — no cartesian") {
    val p = plan("t61_pretrain_pipeline")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("Exchange SinglePartition"), p.take(800))
  }

  test("q190 band join is equi-keyed on the price bucket — no cartesian") {
    val p = plan("q190_band_join")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    val joins = p.linesIterator.filter(_.contains("Join")).toSeq
    assert(joins.nonEmpty && joins.forall(j =>
      j.contains("probe") && j.contains("bucket")), joins.mkString("\n"))
  }

  // ------------------------------------------------------------- round 8

  test("d30 decontam: the eval side is the BROADCAST side — train streams once") {
    // the bounded-eval contract made visible: train × eval materializes
    // as a nested-loop over a broadcast eval (BuildRight — the
    // crossJoin(broadcast(eval)) side), never a shuffled join keyed on
    // train or a train-side cartesian; the only train shuffle is the
    // per-train-id best-match window over the CONTAMINATED subset
    val p = plan("d30_semantic_decontam")
    assert(p.contains("BroadcastNestedLoopJoin BuildRight"), p.take(800))
    assert(!p.contains("CartesianProduct"))
  }

  test("t62 domain cap: the per-source rank limit is pushed below the shuffle") {
    // WindowGroupLimit in Partial mode = each scan partition forwards at
    // most 20 rows per source into the exchange — the reason no domain,
    // however large, funnels its documents through one stage
    val p = plan("t62_domain_cap")
    assert(p.contains("WindowGroupLimit"), p.take(800))
    assert(p.linesIterator.exists(l =>
      l.contains("WindowGroupLimit") && l.contains("Partial")), p.take(1200))
  }

  test("d31 banded decontam joins only on (table, bucket) — never all-pairs") {
    val p = plan("d31_semantic_decontam_lsh")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("t63 audit: both evidence channels broadcast their bounded side") {
    // n-gram channel: bench shingles broadcast into a hash join;
    // semantic channel: eval vectors broadcast into the nested-loop
    // scan (d30's pinned shape); the corpus/train sides stream once and
    // meet in one doc-keyed outer shuffle — no cartesian anywhere
    val p = plan("t63_decontam_audit")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(p.contains("BroadcastNestedLoopJoin BuildRight"), p.take(800))
    assert(!p.contains("CartesianProduct"))
  }

  test("g11/g12 link prediction: wedge equi-joins, top-k never a global sort") {
    // candidates come from hash equi-joins on the shared middle node and
    // the (u, w) anti-join key — no all-pairs operator anywhere — and
    // the declared top-100 runs as TakeOrderedAndProject (per-partition
    // heaps + driver merge), not a SinglePartition sort of the full
    // candidate set
    for (q <- Seq("g11_link_predict", "g12_adamic_adar")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), q)
      assert(!p.contains("BroadcastNestedLoopJoin"), q)
      assert(p.contains("TakeOrderedAndProject"), q)
    }
  }

  test("t64/t66 HLL sketches: the only wide ops are register-key aggregates") {
    // the sketch path aggregates onto <= 64 rows per corpus/source by
    // (group, register) key — map-side combining makes the shuffle
    // carry registers, not shingles; the 1-row estimate exhibits meet
    // by broadcast, never a CartesianProduct
    for (q <- Seq("t64_corpus_overlap_hll", "t66_domain_ndv_hll")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), q)
      assert(p.contains("HashAggregate"), q)
    }
  }

  test("t65 Kneser-Ney: fan-in/type-count model tables broadcast") {
    // the bigram-type table joins its vocab-sized n1b / 1-row nt
    // statistics by broadcast; the only shuffled joins key on the
    // (w_prev, w) type — nothing all-pairs
    val p = plan("t65_kneser_ney")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("CartesianProduct"))
  }

  test("m13/m14 audio kernels are join-free single-scan plans") {
    for (q <- Seq("m13_wav_features", "m14_audio_segments"))
      assert(!plan(q).toLowerCase.contains("join"), q)
  }

  test("q202 incremental merge rescans only the delta, never history") {
    // exactly ONE parquet scan (the delta slice); the base side enters
    // as the materialized partial aggregate (Scan ExistingRDD from the
    // checkpoint) — the "never rescan history" contract in the plan
    val p = plan("q202_incremental_agg")
    assert(p.linesIterator.count(_.contains("Scan parquet")) == 1, p.take(1200))
    assert(p.contains("Scan ExistingRDD"), p.take(1200))
  }

  test("s22 projection is a join-free single scan after the bounded fit") {
    // the eigensolve collects only dimension-sized cells; the
    // transform leg itself must be one scan + codegen'd HOF fold —
    // no join, no extra shuffle beyond the declared output sort
    val p = plan("s22_pc_projection")
    assert(!p.toLowerCase.contains("join"), p.take(800))
  }

  test("g13 eigencentrality truncates lineage every round") {
    // after 8 rounds the visible plan must be the LAST round's
    // checkpoint scan + output sort — a plan that grew with the
    // iteration count would show the whole join chain here
    val p = plan("g13_eigen_centrality")
    assert(p.contains("Scan ExistingRDD"), p.take(800))
    assert(!p.toLowerCase.contains("join"), p.take(800))
  }

  test("s23 KMV sketch merges through a real partial ObjectHashAggregate") {
    // the bottom-k partial (<= 1024 longs per partition) must sit BELOW
    // the exchange — the shuffle carries sketches, never row hashes;
    // the 1-row exact exhibit meets by broadcast
    val p = plan("s23_kmv_ndv")
    assert(p.linesIterator.count(_.contains("ObjectHashAggregate")) == 2,
      p.take(1200))
    assert(p.contains("BroadcastExchange"), p.take(1200))
  }

  test("q204 key-overlap audit: sketches partial-aggregate below the exchange") {
    // two independent bottom-k sketches (partial+final ObjectHashAggregate
    // each = 4 nodes), met by BROADCAST 1-row algebra — the raw key
    // tables never join for the estimates; the only key-keyed join is
    // the exact exhibit's left-semi
    val p = plan("q204_key_overlap")
    assert(p.linesIterator.count(_.contains("ObjectHashAggregate")) == 4,
      p.take(1500))
    assert(p.contains("BroadcastExchange"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("t68 PII scrub is one codegen'd map stage + one 20-group agg") {
    // detection, Luhn gating and masking must all inline into the scan
    // stage: no UDF node, no join; the only exchanges are the source
    // agg and the final 20-row sort
    val p = plan("t68_pii_scrub")
    assert(!p.toLowerCase.contains("join"), p.take(1200))
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      p.take(1200))
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      p.take(1200))
    assert(p.linesIterator.count(_.contains("Exchange rangepartitioning")) == 1,
      p.take(1200))
  }

  test("q205 zorder layout: broadcast maxes, no window, no data-row join") {
    // the normalization maxes meet the scan by 1-row broadcast; each
    // layout is a 64-group aggregate — a window or sort-merge join here
    // would mean the layout audit itself doesn't scale
    val p = plan("q205_zorder_layout")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(1200))
    assert(!p.contains("Window"), p.take(1200))
  }

  test("q206 bloom join: might_contain filters the probe below the join") {
    // the Bloom test must run as a plain filter in the probe's scan
    // stage — if it showed up above the join (or not at all) the
    // pruning wouldn't shed the probe shuffle
    val p = plan("q206_bloom_join")
    assert(p.contains("might_contain"), p.take(1500))
    val filterLine = p.linesIterator.indexWhere(_.contains("might_contain"))
    val joinLine = p.linesIterator.indexWhere(_.contains("Join"))
    assert(filterLine > joinLine, s"filter@$filterLine join@$joinLine")
  }

  test("q207 CM join-size: sketch tables meet by broadcast, never raw keys") {
    val p = plan("q207_join_size_cm")
    // the sketch-side join is broadcast (≤4096 rows); the only
    // key-keyed shuffle join is the exact exhibit
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("g14 assortativity: degree joins are equi-keyed, no cartesian") {
    val p = plan("g14_assortativity")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    assert(!p.contains("Window"), p.take(1200))
  }

  test("q208 histogram quantiles: one bounded-domain window, ranks broadcast") {
    // the only window runs over the <=65536-bucket table (the
    // months/days bounded-domain precedent); the rank and exact-side
    // lookups meet by broadcast, and the raw cents never globally sort
    val p = plan("q208_hist_quantiles")
    assert(p.linesIterator.count(_.contains("Window")) >= 1, p.take(1200))
    assert(p.contains("BroadcastExchange"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("m16 video dedup: pairing is an inverted-index equi-join on the frame key") {
    val p = plan("m16_video_dedup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("s24 recall audit: no cartesian; assignment argmax is join-free map work") {
    val p = plan("s24_ann_recall")
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q209 skew profile: no single-task global sort of the raw counts") {
    // top-5 is a TakeOrdered; quantiles ride the range-partitioned
    // index — the only windows are over bounded domains (5-row top,
    // per-range-partition index)
    val p = plan("q209_skew_profile")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q210 analyze stats: one wide sketch aggregate, zero joins") {
    // six KMV buffers + min/max/count ride ONE ObjectHashAggregate
    // partial/final pair over ONE scan — the single-pass ANALYZE shape
    val p = plan("q210_analyze_stats")
    assert(p.linesIterator.count(_.contains("ObjectHashAggregate")) == 2,
      p.take(1500))
    assert(!p.toLowerCase.contains("join"), p.take(1500))
    assert(p.linesIterator.count(_.contains("Scan parquet")) == 1,
      p.take(1500))
  }

  test("t67 overlap matrix: sketch algebra joins only 20-row sides") {
    // the pair matrix is a bounded 20x20 nested-loop over BROADCAST
    // sketch rows (non-equi src_a < src_b — deliberate; the sketch agg
    // itself is behind the localCheckpoint, pinned via s23's twin); the
    // only shuffle joins are the exact-Jaccard exhibit keyed on the gram
    val p = plan("t67_kmv_overlap")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("m17 audio dedup pairs via the fingerprint inverted index, never all-pairs") {
    val p = plan("m17_audio_dedup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("g15 clustering coefficient closes wedges by equi-join, never all-pairs") {
    val p = plan("g15_clustering_coeff")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("q211 merge path scans each half once and never rescans the base table") {
    // two half-manifests (one scan each) merged by PURE algebra: the
    // only join is the 1-row × 1-row broadcast cross of the two stats
    // rows — no third scan, no shuffle join
    val p = plan("q211_analyze_merge")
    assert(p.linesIterator.count(_.contains("Scan parquet")) == 2,
      p.take(1500))
    assert(p.linesIterator.count(_.contains("ObjectHashAggregate")) == 4,
      p.take(1500))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(1500))
  }

  test("q212 stats decision plans the broadcast it declares") {
    // the manifest says supplier fits under threshold → the emitted
    // strategy column says broadcast_right AND the plan shows it
    val df = SparkEntry.queries("q212_stats_broadcast_join")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(df.select("strategy").head.getString(0) == "broadcast_right")
  }

  test("q215 selectivity-discounted side plans the broadcast it declares") {
    val df = SparkEntry.queries("q215_stats_filter_broadcast")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(df.select("strategy").head.getString(0) == "broadcast_left")
  }

  test("q216 range-discounted estimate plans the broadcast it declares") {
    // at sf0.001 orders itself fits the 256 KiB threshold and is the
    // smaller ESTIMATE (broadcast_right); from sf0.01 up only the
    // range-discounted lineitem side fits (broadcast_left) — either
    // way the decision is a broadcast and the plan must show it
    val df = SparkEntry.queries("q216_stats_range_broadcast")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(df.select("strategy").head.getString(0)
      .startsWith("broadcast_"))
  }

  test("q217 injected rule reorders the user's chain to the stats order " +
       "and broadcasts both dims") {
    // the user writes supplier-first; the manifests dictate part-first
    // (5/50 of p_size survives vs 13/25 of s_nationkey) — the OPTIMIZED
    // tree must follow the manifest, and the emitted order column is
    // read off that tree, so the driver's oracle replays the same flip
    val df = SparkEntry.queries("q217_stats_join_reorder")(spark, sfDir)
    assert(df.select("join_order").head.getString(0) == "part,supplier")
    val p = df.queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2,
      p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q218 date-discounted estimate plans the broadcast it declares") {
    // shipdate >= 2001-06-01 discounts lineitem to ~6% of its raw
    // size: under the 1 MiB threshold only the date interval
    // arithmetic finds the broadcast at this scale
    val df = SparkEntry.queries("q218_stats_date_broadcast")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(df.select("strategy").head.getString(0) == "broadcast_left")
  }

  test("q221 capstone: zone skip + reorder + broadcast compose on one " +
       "unmodified plan") {
    val df = SparkEntry.queries("q221_lakehouse_capstone")(spark, sfDir)
    val row = df.head()
    assert(row.getAs[String]("join_order") == "part,supplier")
    assert(row.getAs[Long]("n_files_kept") == 2L)
    assert(row.getAs[Long]("n_files_total") == 7L)
    val p = df.queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2,
      p.take(1500))
  }

  test("q213 stats-ordered star join broadcasts both small dims") {
    val p = plan("q213_stats_join_order")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2,
      p.take(1500))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("SortMergeJoin"), p.take(1500))
  }
}
