package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape regressions (SURVEY §4): the properties that make the
  * registered queries survive a 100× scale-up are plan facts, not timings —
  * filters reaching the parquet reader, pruned read schemas, dimension joins
  * broadcasting, bounded top-k planning as TakeOrderedAndProject, and map-only
  * pipelines staying shuffle-free. Asserting them here means a refactor that
  * silently trades one of these away fails the suite, not the next bench.
  *
  * All assertions run against the STATIC plan (AdaptiveSparkPlanExec's input
  * plan, before any runtime re-optimization): scan pushdown/pruning, the
  * broadcast-hint join selection, and TakeOrderedAndProject are all decided
  * statically, and exchange counts can only go DOWN under AQE (shuffle→
  * broadcast conversion), so the static count is the conservative bound.
  * Shuffle counting goes through Layout.countExchanges, which walks into the
  * adaptive leaf correctly.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private def staticPlan(name: String): String =
    SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString

  /** Pin how many times `table`.parquet is scanned in a query's static plan.
    * Multi-branch queries regress silently when a shared subtree stops being
    * shared (the "diamond": each reference re-executes the whole branch up
    * to and including the fact scan) — the scan count is the cheapest
    * observable that catches it.
    */
  private def assertScanCount(name: String, table: String,
      expected: Int): Unit = {
    val scans = s"$table\\.parquet".r.findAllIn(staticPlan(name)).length
    assert(scans == expected,
      s"$name: expected $expected $table scans in the static plan, got $scans")
  }

  test("m4 pushes all three scan filters into the parquet reader") {
    val plan = staticPlan("m4_tpch_q6")
    assert(plan.contains("PushedFilters: ["), s"no pushdown section:\n$plan")
    // only the bracketed filter list — the ReadSchema that follows on the
    // same scan line would otherwise make per-column checks vacuous
    val pushed = plan.split("PushedFilters: \\[")(1).split("\\]")(0)
    Seq("l_shipdate", "l_quantity", "l_discount").foreach { c =>
      assert(pushed.contains(c), s"$c not pushed: [$pushed]")
    }
  }

  test("m4 prunes the read schema to the four referenced columns") {
    val plan = staticPlan("m4_tpch_q6")
    val readSchema = plan.split("ReadSchema: ")(1).split("\n")(0)
    Seq("l_shipdate", "l_quantity", "l_discount", "l_extendedprice")
      .foreach(c => assert(readSchema.contains(c), s"$c missing: $readSchema"))
    // the 7 other lineitem columns must NOT be read
    Seq("l_orderkey", "l_partkey", "l_returnflag", "l_tax")
      .foreach(c => assert(!readSchema.contains(c), s"$c read: $readSchema"))
  }

  test("m7 joins the part dimension via broadcast, not a shuffle") {
    val plan = staticPlan("m7_tpch_q14")
    assert(plan.contains("BroadcastHashJoin"), s"no BHJ:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ:\n$plan")
  }

  test("m1 plans its bounded top-10 as TakeOrderedAndProject (no global sort)") {
    val plan = staticPlan("m1_tpch_q3")
    assert(plan.contains("TakeOrderedAndProject"), s"global sort:\n$plan")
  }

  test("f5 keyset page prunes to a top-50 heap where f4 offset hauls top-150") {
    // The deep-pagination differential: offset(n).limit(k) must plan a
    // bounded top-(n+k) (150 here) because every page-n request re-ranks
    // the first n rows, while the keyset predicate resumes AFTER the
    // anchor and only ever heaps k (50) — the per-request cost that stays
    // constant as the page number grows. Both must stay
    // TakeOrderedAndProject (never a global sort).
    val f4 = staticPlan("f4_limit_offset")
    val f5 = staticPlan("f5_keyset_page")
    assert(f4.contains("TakeOrderedAndProject(limit=150"), s"f4 plan:\n$f4")
    assert(f5.contains("TakeOrderedAndProject(limit=50,"), s"f5 plan:\n$f5")
    // the registered query computes its anchor inline (a 1-row top-150,
    // output=[ap, ak]) to stay self-contained; a paging API passes the
    // anchor as a literal. The PAGE side must never heap past 50: any
    // limit=150 node may only be the anchor subtree.
    f5.linesIterator
      .filter(_.contains("TakeOrderedAndProject(limit=150"))
      .foreach(l => assert(l.contains("output=[ap"),
        s"non-anchor top-150 in the keyset page plan:\n$f5"))
  }

  test("j22 vocab top-k plans as TakeOrderedAndProject over the token agg") {
    val plan = staticPlan("j22_vocab_topk")
    assert(plan.contains("TakeOrderedAndProject"), s"global sort:\n$plan")
  }

  test("j20 quantization is map-only: no exchange except the output sort") {
    val df = SparkEntry.queries("j20_embed_quantize")(spark, d)
    val exchanges = graft.layout.Layout.countExchanges(df)
    // exactly one exchange — the rangepartitioning for the deterministic
    // ORDER BY; the quantization math itself must not shuffle
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges")
    assert(staticPlan("j20_embed_quantize").contains("rangepartitioning"),
      "missing output sort")
  }

  test("j31 repetition scoring is map-only: no exchange except the output sort") {
    val df = SparkEntry.queries("j31_dup_ngram_ratio")(spark, d)
    val exchanges = graft.layout.Layout.countExchanges(df)
    // all the trigram/dup math is per-row array work — the two exchanges
    // are the Tables.spread parallelism floor (round-robin, fires on this
    // single-row-group fixture; a no-op on real multi-file tables) and
    // the rangepartitioning for the deterministic ORDER BY. No KEYED
    // exchange may appear: the dup math itself must never shuffle.
    assert(exchanges <= 2, s"expected ≤2 exchanges, got $exchanges")
    assert(!staticPlan("j31_dup_ngram_ratio").contains("hashpartitioning"),
      "per-row dup math must not introduce a keyed exchange")
    assertScanCount("j31_dup_ngram_ratio", "documents", 1)
  }

  test("j65 HTML strip is map-only: no exchange except the output sort") {
    val df = SparkEntry.queries("j65_html_strip")(spark, d)
    val exchanges = graft.layout.Layout.countExchanges(df)
    // wrap → strip → hash is per-row string work; the single exchange is
    // the rangepartitioning for the deterministic ORDER BY — the shape
    // that runs at ingest wire speed at 100 TB
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges")
    assertScanCount("j65_html_strip", "documents", 1)
  }

  test("j32 mixture sampling filters map-side: one keyed agg + output sort") {
    val df = SparkEntry.queries("j32_mixture_sample")(spark, d)
    val exchanges = graft.layout.Layout.countExchanges(df)
    // the keep-decision must never shuffle the corpus — only the per-source
    // yield summary (hash exchange) and its ORDER BY (range) may exchange
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges")
    assertScanCount("j32_mixture_sample", "documents", 1)
  }

  test("j33 seq-len histogram aggregates the corpus once; windows run post-agg") {
    val df = SparkEntry.queries("j33_seqlen_hist")(spark, d)
    val exchanges = graft.layout.Layout.countExchanges(df)
    // bucket agg (hash) + single-partition window + final sort — the
    // windows must sit ABOVE the aggregate, so ≤3 exchanges total and the
    // corpus is scanned exactly once
    assert(exchanges <= 3, s"expected ≤3 exchanges, got $exchanges")
    assertScanCount("j33_seqlen_hist", "documents", 1)
  }

  test("j34 packing windows and aggregates on ONE (source, shard) exchange") {
    val df = SparkEntry.queries("j34_seq_packing")(spark, d)
    val exchanges = graft.layout.Layout.countExchanges(df)
    // running-sum window partitions on (source, shard); the per-pack
    // rollup's keys are a superset, so the agg must REUSE that exchange —
    // only the window hash + the output sort range may appear
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges")
    assertScanCount("j34_seq_packing", "documents", 1)
  }

  test("j35 drift derives everything from ONE materialized token-count table") {
    val df = SparkEntry.queries("j35_unigram_drift")(spark, d)
    val exchanges = graft.layout.Layout.countExchanges(df)
    // source totals, global counts, corpus total, and the top-50 all roll
    // up from the lineage-truncated (source, tok) count table; the final
    // plan must contain NO documents scan (the explode ran exactly once at
    // materialization) and only vocabulary-sized exchanges above it
    assert(exchanges == 5, s"expected 5 exchanges, got $exchanges")
    assertScanCount("j35_unigram_drift", "documents", 0)
  }

  test("j36 split tags map-side: one audit agg + audit window + sort") {
    val df = SparkEntry.queries("j36_data_split")(spark, d)
    val exchanges = graft.layout.Layout.countExchanges(df)
    // the LCG tag itself must never shuffle the corpus — the exchanges are
    // the (lang, split) audit agg, the per-lang window over the 15-row
    // audit table, and the output sort
    assert(exchanges == 3, s"expected 3 exchanges, got $exchanges")
    assertScanCount("j36_data_split", "documents", 1)
  }

  test("j37 skip-gram pairs generate map-side and plan a bounded top-k") {
    val plan = staticPlan("j37_skipgram_pmi")
    // pair generation must be per-row array math feeding ONE keyed count —
    // a positional self-join on doc_id would show as a join on the corpus
    // side; only the broadcast joins against the tiny unigram/total tables
    // may appear, and the top-20 must not global-sort
    assert(plan.contains("TakeOrderedAndProject"), s"global sort:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus-side SMJ:\n$plan")
  }

  test("j38 BM25 filters the token stream before its only corpus shuffle") {
    val df = SparkEntry.queries("j38_bm25_topk")(spark, d)
    val exchanges = graft.layout.Layout.countExchanges(df)
    // the tf table is lineage-truncated once; the visible exchanges are the
    // corpus-stats agg and the df re-agg of the materialized tf table (both
    // single-row), with the top-10 as TakeOrderedAndProject
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges")
    assert(staticPlan("j38_bm25_topk").contains("TakeOrderedAndProject"),
      "global sort for a bounded top-10")
    assertScanCount("j38_bm25_topk", "documents", 1)
  }

  test("j40 incremental probe reads only the materialized shingle table") {
    val plan = staticPlan("j40_incremental_neardup")
    // the shingle table materializes once and feeds the signature build
    // AND both verify sides — the final plan must never re-scan documents
    // (at scale the index's band keys are precomputed; re-scanning the
    // corpus per reference is exactly the regression this pins against)
    assertScanCount("j40_incremental_neardup", "documents", 0)
    assert(plan.contains("TakeOrderedAndProject") ||
      plan.contains("rangepartitioning"), "missing deterministic output sort")
  }

  test("j39 temperature weights touch the corpus only at materialization") {
    val df = SparkEntry.queries("j39_mixture_temperature")(spark, d)
    val exchanges = graft.layout.Layout.countExchanges(df)
    // the per-source token counts materialize once (per-row size(split) —
    // no explode); above that everything is source-cardinality: the
    // ordered-fold normalizer agg and the output sort
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges")
    assertScanCount("j39_mixture_temperature", "documents", 0)
  }

  test("d15 mode chain is single-shuffle: subset partitioning feeds count AND rank") {
    val df = SparkEntry.queries("d15_mode_agg")(spark, d)
    // one hash exchange (the explicit user_id repartition serves both the
    // (user_id, event_type) aggregation and the user_id window) plus the
    // rangepartitioning for the output ORDER BY
    val exchanges = graft.layout.Layout.countExchanges(df)
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges")
  }

  test("m9 single data shuffle feeds both the distinct and the argmin window") {
    val df = SparkEntry.queries("m9_tpch_q2")(spark, d)
    // one hash exchange (the explicit l_partkey repartition) + the output
    // sort's rangepartitioning; supplier and part join via broadcast
    val exchanges = graft.layout.Layout.countExchanges(df)
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges")
  }

  test("i5 timeout shadow is single-data-shuffle: user_id partitioning serves all stages") {
    val df = SparkEntry.queries("i5_timeout_shadow")(spark, d)
    // one hash exchange on user_id feeds the lag window, the running-sum
    // window, the (user_id, session_id) aggregate (subset partitioning
    // satisfies the clustered distribution), AND the last-session window;
    // + the output sort's rangepartitioning
    val exchanges = graft.layout.Layout.countExchanges(df)
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges")
  }

  test("j27 bigram PMI: broadcast unigram joins, top-20 as TakeOrderedAndProject") {
    val plan = staticPlan("j27_bigram_pmi")
    assert(plan.contains("TakeOrderedAndProject"), "top-20 must not global-sort")
    assert(plan.contains("BroadcastHashJoin"), "unigram counts must broadcast")
    assert(!plan.contains("SortMergeJoin"),
      "no wide join may touch the bigram stream")
  }

  test("j28 surprisal joins the unigram model via broadcast only") {
    val plan = staticPlan("j28_unigram_surprisal")
    assert(plan.contains("BroadcastHashJoin"), "unigram table must broadcast")
    assert(!plan.contains("SortMergeJoin"),
      "the token stream must not shuffle-join the model")
  }

  test("j29 decontamination probes a broadcast eval-gram set, never a wide join") {
    val plan = staticPlan("j29_decontaminate")
    assert(plan.contains("BroadcastHashJoin"), "eval gram set must broadcast")
    assert(!plan.contains("SortMergeJoin"),
      "the training stream must be probed map-side, not shuffle-joined " +
        "against the eval set")
  }

  test("m20 Q21 scans lineitem exactly once (no self-join for the double correlation)") {
    val plan = staticPlan("m20_tpch_q21")
    val scans = "lineitem\\.parquet".r.findAllIn(plan).length
    assert(scans == 1,
      s"expected 1 lineitem scan (per-order stats, not self-joins), got $scans")
  }

  test("m21 Q8 has at most one non-broadcast join (the fact-fact exchange)") {
    val plan = staticPlan("m21_tpch_q8")
    assert(plan.contains("BroadcastHashJoin"), "dimension sides must broadcast")
    val wide = "SortMergeJoin".r.findAllIn(plan).length +
      "ShuffledHashJoin".r.findAllIn(plan).length
    assert(wide <= 1, s"expected ≤1 wide join (lineitem⋈orders), got $wide")
  }

  test("n1 funnel scans events once: the stage chain is windows, not rejoins") {
    assertScanCount("n1_funnel", "events", 1)
    // one user_id hash exchange feeds all three stage windows AND the
    // per-user collapse (subset partitioning); + the output sort
    val df = SparkEntry.queries("n1_funnel")(spark, d)
    val exchanges = graft.layout.Layout.countExchanges(df)
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges")
  }

  test("n2 retention scans events once: first-week is a window over the dedup") {
    assertScanCount("n2_retention", "events", 1)
    // user_id repartition serves the (user_id, week) dedup AND the min-week
    // window; + the cohort-group exchange over the tiny dedup'd set + the
    // output sort
    val df = SparkEntry.queries("n2_retention")(spark, d)
    val exchanges = graft.layout.Layout.countExchanges(df)
    assert(exchanges == 3, s"expected 3 exchanges, got $exchanges")
  }

  test("n3 anomaly scans events once: stats are windows over the daily agg") {
    assertScanCount("n3_anomaly_days", "events", 1)
    // the (event_type, day) count exchange + the event_type window exchange
    // (moves only the tiny daily table) + the output sort
    val df = SparkEntry.queries("n3_anomaly_days")(spark, d)
    val exchanges = graft.layout.Layout.countExchanges(df)
    assert(exchanges == 3, s"expected 3 exchanges, got $exchanges")
  }

  test("j89 triangles close wedges by equi-join on the truncated edge table") {
    val plan = staticPlan("j89_dup_triangles")
    // the shingle/banding machinery ran once into the truncated pair
    // table; all three join roles read THAT — a reappearing documents
    // scan means an edge role re-derives the pairs
    val scans = "documents\\.parquet".r.findAllIn(plan).length
    assert(scans == 0,
      s"expected 0 documents scans above the truncation, got $scans:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"triangle closing degenerated to all-pairs:\n$plan")
  }

  test("j91 Heaps curve: one corpus scan; checkpoints ride an 8-row broadcast") {
    // the trigram explode feeds the first-occurrence aggregate directly
    // (one documents scan); the per-doc length table is truncated so the
    // checkpoint derivation and the cumulative join read the materialized
    // table, not two more text scans
    assertScanCount("j91_heaps_law", "documents", 1)
    val plan = staticPlan("j91_heaps_law")
    // the fd < c theta join must sit on a BROADCAST of the 8-row panel —
    // a CartesianProduct here means the broadcast hint was lost and the
    // V×8 work became a real shuffle-pair plan
    assert(!plan.contains("CartesianProduct"),
      s"checkpoint join degenerated to a cartesian:\n$plan")
  }

  test("j92 novelty reads documents zero times above the truncated grams") {
    // the trigram explode is truncated ONCE and serves both the
    // min(doc_id) first-occurrence aggregate and the per-gram rejoin — a
    // reappearing documents scan means the diamond is back (each branch
    // re-tokenizing the corpus)
    assertScanCount("j92_ngram_novelty", "documents", 0)
    val plan = staticPlan("j92_ngram_novelty")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"gram rejoin degenerated to all-pairs:\n$plan")
  }

  test("n5 gap-fill: calendar via distributed explode, fact scan truncated once") {
    val plan = staticPlan("n5_gapfill_ffill")
    // the ONE events scan lives inside the lineage-truncated per-minute
    // aggregate (it is referenced by both the spans derivation and the
    // join); the final plan must read only the truncated table — a
    // reappearing events scan is the diamond regression
    val scans = "events\\.parquet".r.findAllIn(plan).length
    assert(scans == 0,
      s"expected 0 events scans above the truncation, got $scans:\n$plan")
    // the minute calendar is sequence()+explode per type row — distributed,
    // never a driver-built range table cross-joined against types
    assert(plan.contains("explode"), s"no distributed calendar:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"calendar join degenerated to all-pairs:\n$plan")
  }

  test("n8 interpolation: truncated scan, two prefix-frame window nodes, no O(n²) frame") {
    val plan = staticPlan("n8_gapfill_interp")
    val scans = "events\\.parquet".r.findAllIn(plan).length
    assert(scans == 0,
      s"expected 0 events scans above the truncation, got $scans:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"calendar join degenerated to all-pairs:\n$plan")
    // the anchors ride exactly TWO window nodes (ASC prefix pair, DESC
    // prefix pair — WindowExec groups by partition+order); and neither may
    // be an unboundedfollowing frame: Spark re-aggregates that frame's
    // tail per row — O(rows²) per partition, measured as a 17-minute
    // single-core burn on the 43k-row type partitions before the rewrite
    // to the DESC running form
    val windows = "(?m)Window \\[".r.findAllIn(plan).length
    assert(windows == 2, s"expected 2 window nodes, got $windows:\n$plan")
    assert(!plan.contains("unboundedfollowing"),
      s"O(rows²) unbounded-following frame is back:\n$plan")
  }

  test("n6 EWMA scans events once: the fold happens inside the row") {
    assertScanCount("n6_ewma", "events", 1)
    // one user_id exchange for the series collect + the output sort
    val df = SparkEntry.queries("n6_ewma")(spark, d)
    val exchanges = graft.layout.Layout.countExchanges(df)
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges")
  }

  test("n9 Holt scans events once: the struct-accumulator fold is in the row") {
    assertScanCount("n9_holt_trend", "events", 1)
    // one user_id exchange for the series collect + the output sort
    val df = SparkEntry.queries("n9_holt_trend")(spark, d)
    val exchanges = graft.layout.Layout.countExchanges(df)
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges")
  }

  test("n7 pattern match scans events once: the regex runs on the per-user row") {
    assertScanCount("n7_seq_pattern", "events", 1)
    // one user_id exchange for the symbol-string collect + the output sort
    val df = SparkEntry.queries("n7_seq_pattern")(spark, d)
    val exchanges = graft.layout.Layout.countExchanges(df)
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges")
  }

  test("j10 SimHash pairs via the banded equi-join, never an all-pairs scan") {
    val plan = staticPlan("j10_simhash_neardup")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs BNLJ back in the SimHash pairing:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"cartesian pairing in the SimHash plan:\n$plan")
    // the signature table is lineage-truncated before the self-join: the
    // token-stream aggregation must not re-execute per join side
    assertScanCount("j10_simhash_neardup", "documents", 0)
  }

  test("j11 cosine pairs via the band equi-join, never an all-pairs scan") {
    // round-10 rewrite: candidates come from the 8×4-plane band equi-join
    // (the j12 pattern family), exact dot verify touches candidates only —
    // the quadratic `vid_a < vid_b` range join is gone
    val plan = staticPlan("j11_cosine_neardup")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs BNLJ back in the cosine pairing:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"cartesian pairing in the cosine plan:\n$plan")
    // the 32-plane signature pass is lineage-truncated (runs once, n×8 tiny
    // rows); embeddings is scanned only by the two vector re-attach joins
    assertScanCount("j11_cosine_neardup", "embeddings", 2)
  }

  test("probe panels are plan-bounded below every ANN broadcast") {
    // broadcast build sides must be structurally capped (limit=512), not a
    // data-dependent fraction of the collection — the difference between
    // O(N·512) and O(N·M) at 100 TB. Applies to the exact kNN join AND all
    // three bucketed ANN paths (their probe sides were the same disease).
    for (q <- Seq("j4_knn_join", "j12_ann_lsh_bucket", "j16_ivf_ann",
        "j46_ivf_multiprobe")) {
      val plan = staticPlan(q)
      assert(plan.contains("limit=512"),
        s"no bounded probe panel in the $q plan:\n$plan")
    }
  }

  test("j61 audit probe panel is plan-bounded like the ANN family") {
    // j61's exact-kNN audit pass broadcasts the probe side; the panel must
    // be structurally capped (limit=64) so the broadcast can never grow
    // with the collection — same invariant as the j4/j16 probe pins.
    val plan = staticPlan("j61_ivf_train_audit")
    assert(plan.contains("limit=64"),
      s"no bounded probe panel in the j61 plan:\n$plan")
  }

  test("j63 PQ encoding is one data pass + one pushed codebook read") {
    // 2 static embeddings scans: the full-collection subspace split and the
    // 128-row subspace codebook whose vec_id < 16 filter reaches the
    // parquet reader (row-group pruned at scale)
    assertScanCount("j63_pq_encode", "embeddings", 2)
    val pushed = staticPlan("j63_pq_encode")
      .split("PushedFilters: \\[").drop(1).map(_.split("\\]")(0))
    assert(pushed.count(_.contains("LessThan(vec_id,16)")) == 1,
      s"codebook read must push vec_id < 16: ${pushed.mkString(" | ")}")
  }

  test("j64 ADC probe panel is plan-bounded and ranks without raw vectors") {
    val plan = staticPlan("j64_ivfpq_adc")
    // probe panel structurally capped like j4/j12/j16 — the broadcast side
    // can never grow with the collection
    assert(plan.contains("limit=64"),
      s"no bounded probe panel in the j64 plan:\n$plan")
    // the point of ADC: the ranking join touches only the truncated code
    // and cell tables plus broadcast lookup tables — the final plan reads
    // the raw embeddings ZERO times
    assertScanCount("j64_ivfpq_adc", "embeddings", 0)
  }

  test("j13 final plan reads only the truncated label table, no fact re-scan") {
    assertScanCount("j13_dedup_clusters", "documents", 0)
  }

  test("j30 star-contraction output joins truncated roots — one scan for ids") {
    // the singleton left-join reads documents once for the id universe; the
    // pair graph and every contraction round live in truncated lineage
    assertScanCount("j30_cc_bigstar", "documents", 1)
  }

  test("j2 shingle table is materialized once across signature + verify sides") {
    // the shingle explode feeds the MinHash pipeline AND both exact-verify
    // join sides — truncated, or it re-executes 4× (measured -1 s at sf0.1)
    assertScanCount("j2_minhash_neardup", "documents", 0)
  }

  test("j9/j24 posting-list gram table is materialized once") {
    // ng feeds both inverted-index join sides and the per-doc sizes
    assertScanCount("j9_ngram_jaccard", "documents", 0)
    assertScanCount("j24_ngram_containment", "documents", 0)
  }

  test("j1/j17/j26 single-pass dedups scan documents exactly once") {
    assertScanCount("j1_exact_dedup", "documents", 1)
    assertScanCount("j17_chunk_dedup", "documents", 1)
    // the e2e pipeline's whole clean→filter→dedup→yield chain rides one scan
    assertScanCount("j26_pipeline_e2e", "documents", 1)
  }

  test("j18 lang-id recomputes the trigram explode per branch — exactly 2 scans") {
    // deliberately 2, not 1: materializing the shared extraction measured
    // slower at every scale (see the j18 comment); the pin catches a third
    // branch sneaking in, not the measured two-pass design
    assertScanCount("j18_langid_ngram", "documents", 2)
  }

  test("j14 tf-idf derives df from the truncated tf table: no explode re-run") {
    // 1 visible scan: the count-only corpus-size read. The token explode
    // feeding tf runs inside the truncated subtree (a LogicalRDD in this
    // plan), and BOTH the df aggregate and the score join read that
    // materialization — df re-deriving the explode would show as a second
    // documents scan. (Round 10 moved df from a count-window-over-word —
    // one task per stopword posting list — to a combinable groupBy + join,
    // the skew-mitigable shape.)
    assertScanCount("j14_tfidf_topk", "documents", 1)
  }

  test("j16 IVF assigns cells with two data passes + two pushed centroid reads") {
    // 4 static embeddings scans: full-collection assignment, probe-subset
    // assignment, and per assignment one 16-row centroid read whose
    // vec_id < 16 filter is pushed to the parquet reader (row-group pruned
    // at scale) — truncating `assigned` and filtering probes from it was
    // measured 3.2× slower (the table carries the embedding vectors; see
    // the in-code negative), so the 4-scan shape is the pinned winner
    assertScanCount("j16_ivf_ann", "embeddings", 4)
    val pushed = staticPlan("j16_ivf_ann")
      .split("PushedFilters: \\[").drop(1).map(_.split("\\]")(0))
    assert(pushed.count(_.contains("LessThan(vec_id,16)")) == 2,
      s"centroid reads must push vec_id < 16: ${pushed.mkString(" | ")}")
  }

  test("j29 training grams stream through one pipelined documents pass") {
    // the training side is a single scan → explode (per-doc
    // array_distinct — no corpus-wide gram distinct, no materialized
    // gram table) → broadcast probe → per-doc agg; the eval-gram set
    // lives in a lineage-truncated tiny table (no extra scan)
    assertScanCount("j29_decontaminate", "documents", 1)
    val df = SparkEntry.queries("j29_decontaminate")(spark, d)
    // single keyed aggregate computes totals AND hits off the broadcast
    // probe — no totals/hits diamond, so exactly the doc_id agg exchange
    // + the output sort + the Tables.spread parallelism floor on the
    // training scan (round-robin; no-op on real multi-file tables)
    val exchanges = graft.layout.Layout.countExchanges(df)
    assert(exchanges <= 3, s"expected ≤3 exchanges, got $exchanges")
  }

  test("m16/m19 materialize the keyed aggregate once for the global-stat branch") {
    // both queries cross-join a 1-row reduction of their own keyed
    // aggregate back against it; AQE exchange reuse does NOT collapse the
    // diamond (the join side's isnotnull pushdown makes the branches
    // canonically different — verified empirically), so the aggregate is
    // lineage-truncated and the fact table must not appear in the final
    // plan at all
    assertScanCount("m16_tpch_q15", "lineitem", 0)
    assertScanCount("m19_tpch_q11", "lineitem", 0)
  }

  test("m8 reuses the l_orderkey aggregation partitioning for its join") {
    val df = SparkEntry.queries("m8_tpch_q18")(spark, d)
    // the grouped HAVING subquery and the orders join both key on the order
    // key: the aggregate's shuffle output must feed the join directly —
    // lineitem exchanges once, orders once; customer broadcasts at this SF
    // and the top-100 output avoids a range exchange entirely
    val exchanges = graft.layout.Layout.countExchanges(df)
    assert(exchanges <= 2,
      s"extra shuffle below the Q18 join (got $exchanges exchanges)")
  }

  test("j41 CMS derives sketch + candidates from ONE materialized count table") {
    val df = SparkEntry.queries("j41_cms_heavyhitters")(spark, d)
    // the token explode and its keyed count run exactly once at
    // materialization: the final plan must contain NO documents scan, the
    // 1,024-cell sketch side must broadcast into the 80-row probe join,
    // and only vocabulary-sized exchanges may remain above the truncation
    assertScanCount("j41_cms_heavyhitters", "documents", 0)
    assert(df.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"), "sketch cells must broadcast")
  }

  test("j42 bottom-k is one window shuffle on source + the output sort") {
    val df = SparkEntry.queries("j42_bottomk_sample")(spark, d)
    val exchanges = graft.layout.Layout.countExchanges(df)
    // the priority hash is map-side; the window's source hash exchange and
    // the deterministic ORDER BY range exchange are the only shuffles
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges")
    assertScanCount("j42_bottomk_sample", "documents", 1)
  }

  test("j43 bloom probes broadcast-only above the materialized gram table") {
    val df = SparkEntry.queries("j43_bloom_decontaminate")(spark, d)
    // the training side is ONE pipelined documents pass: scan → explode
    // (per-doc array_distinct, no corpus-wide gram distinct or gram-table
    // materialization — that shape measured 4× slower at 500k docs) → the
    // bit-set probes (one per hash function) and the exact eval set all
    // BROADCAST into the stream (the whole 100-TB point: the training
    // gram table is never materialized and never wide-joins), leaving the
    // per-doc keyed aggregate as the only pre-sort hash exchange; the
    // eval slice lives in lineage-truncated tiny tables (no extra scan)
    assertScanCount("j43_bloom_decontaminate", "documents", 1)
    val plan = df.queryExecution.executedPlan.toString
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(nBroadcast == 4, s"expected 4 broadcast joins, got $nBroadcast")
    val exchanges = graft.layout.Layout.countExchanges(df)
    // ≤3: per-doc agg + output sort + the Tables.spread parallelism floor
    // on the training scan; the gram stream itself still never shuffles
    // (no keyed exchange below the aggregate — the broadcast pins above)
    assert(exchanges <= 3,
      s"training stream must not shuffle before the per-doc agg " +
        s"(got $exchanges exchanges)")
  }

  test("j44 sketch folds map-side: no per-token keyed exchange anywhere") {
    // The Aggregator's execution shape IS the claim: the token stream
    // reduces into a fixed 1,024-cell array inside each partition
    // (partial agg), and the only exchanges are the SinglePartition merge
    // of one sketch row per partition and the deterministic output sort —
    // never a per-distinct-token shuffle (that is j41's exact path).
    val df = SparkEntry.queries("j44_cms_sketch")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("keys=[tok"),
      s"per-token keyed aggregate in the sketch path:\n$plan")
    val exchanges = graft.layout.Layout.countExchanges(df)
    assert(exchanges <= 2,
      s"expected sketch-merge + output sort only, got $exchanges exchanges")
    assertScanCount("j44_cms_sketch", "documents", 1)
    // partial+final typed aggregation actually present (the map-side fold)
    assert("Aggregate".r.findAllIn(plan).length >= 2,
      s"no partial/final aggregate pair:\n$plan")
  }

  test("j45 bounded heap plans with NO window and no pre-agg sort") {
    // j42's shape is Window(row_number) over a full per-source sort; the
    // heap replaces it with partial/final typed aggregation whose buffers
    // are ≤k entries — the plan must show no Window operator at all and
    // only the keyed agg exchange + the deterministic output sort.
    val df = SparkEntry.queries("j45_bottomk_heap")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window sneaked back in:\n$plan")
    val exchanges = graft.layout.Layout.countExchanges(df)
    assert(exchanges <= 2,
      s"expected source-agg + output sort only, got $exchanges exchanges")
    assertScanCount("j45_bottomk_heap", "documents", 1)
  }

  test("j47 HLL folds map-side: no per-token keyed exchange anywhere") {
    // Same execution-shape claim as j44's CMS: tokens reduce into a fixed
    // 256-register array inside each partition, and the only exchanges
    // are the SinglePartition sketch merge and the output sort — never a
    // per-distinct-token shuffle (that is d2's exact path).
    val df = SparkEntry.queries("j47_hll_registers")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("keys=[tok"),
      s"per-token keyed aggregate in the sketch path:\n$plan")
    val exchanges = graft.layout.Layout.countExchanges(df)
    assert(exchanges <= 2,
      s"expected sketch-merge + output sort only, got $exchanges exchanges")
    assertScanCount("j47_hll_registers", "documents", 1)
    assert("Aggregate".r.findAllIn(plan).length >= 2,
      s"no partial/final aggregate pair:\n$plan")
  }

  test("j48 grouped HLL shuffles sketch rows keyed by source only") {
    // the grouped sketch's whole point: the keyed exchange carries one
    // 256-register row per (partition, source), never the distinct
    // (source, token) pairs the exact formulation shuffles
    val df = SparkEntry.queries("j48_hll_by_source")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("keys=[tok"),
      s"per-token keyed aggregate in the grouped sketch path:\n$plan")
    val exchanges = graft.layout.Layout.countExchanges(df)
    assert(exchanges <= 2,
      s"expected source-keyed agg + output sort only, got $exchanges")
    assertScanCount("j48_hll_by_source", "documents", 1)
  }

  test("j49 weighted sample is a TakeOrdered heap merge, not a global sort") {
    // orderBy+limit must compile to TakeOrderedAndProject (per-partition
    // bounded heaps merged at the driver) — a full sort exchange here
    // would be the classic sample-at-scale mistake
    val df = SparkEntry.queries("j49_weighted_sample")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject:\n$plan")
    assert(!plan.contains("Window"), s"window in the sample path:\n$plan")
    val exchanges = graft.layout.Layout.countExchanges(df)
    assert(exchanges == 0,
      s"weighted sample should not shuffle at all, got $exchanges exchanges")
    assertScanCount("j49_weighted_sample", "documents", 1)
  }

  test("d17 column profile reads the table once for all eight columns") {
    // the ANALYZE contract: one scan feeds every column's statistics (the
    // multi-count-distinct goes through a single Expand); a per-column
    // scan would multiply the 100 TB read cost by the column count
    assertScanCount("d17_column_profile", "lineitem", 1)
  }

  test("d16 HDR sketch shuffles sketch rows, never observations") {
    // the sketch-family contract (same pin as j44/j48): the typed fold's
    // exchange carries one fixed-size sketch row per (partition, key) —
    // a per-observation keyed exchange would defeat the sketch's purpose
    val df = SparkEntry.queries("d16_hdr_quantiles")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("keys=[v#") && !plan.contains("keys=[cents"),
      s"per-observation keyed exchange in the sketch path:\n$plan")
    val exchanges = graft.layout.Layout.countExchanges(df)
    assert(exchanges <= 4,
      s"expected keyed fold + cell unpivot/windows + sort, got $exchanges")
    assertScanCount("d16_hdr_quantiles", "orders", 1)
  }

  test("j55 strip is three linear keyed exchanges over one chunk table") {
    val df = SparkEntry.queries("j55_boilerplate_strip")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"non-equi pairing in the strip path:\n$plan")
    val exchanges = graft.layout.Layout.countExchanges(df)
    // chunk count + frequent-span join + doc regroup + output sort; the
    // lineage-truncated chunk table contributes no scan to this plan
    assert(exchanges <= 4,
      s"expected <= 4 linear exchanges, got $exchanges")
    assertScanCount("j55_boilerplate_strip", "documents", 0)
  }

  test("j57 overlap matrix is a posting-list join, never a cartesian") {
    val df = SparkEntry.queries("j57_source_overlap")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"pairing must go through the chunk-hash equi-join:\n$plan")
    // the lineage-truncated hash table feeds both join sides and the size
    // aggregate — the documents scan happens once, at materialize time
    assertScanCount("j57_source_overlap", "documents", 0)
  }

  test("j62 span join is a gram-hash equi-join, never a cartesian") {
    // The Lee-et-al. exact-substring pass pairs docs ONLY through the
    // positional-gram inverted index (cost sum df^2) — a cartesian or BNLJ
    // here is the n^2-over-docs failure mode the method exists to avoid.
    val df = SparkEntry.queries("j62_substring_dedup")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"span pairing must go through the gram equi-join:\n$plan")
    // the truncated gram table feeds both join sides — documents scans
    // happen at materialize time, not per side
    assertScanCount("j62_substring_dedup", "documents", 0)
  }

  test("j54 upsert never shuffles the snapshot: broadcast anti + map union") {
    // the CDC merge's 100 TB contract: survivors come from a broadcast
    // LEFT ANTI against the (small) delta keys — a SortMergeJoin here
    // would shuffle the whole snapshot per refresh; the only exchange is
    // the output sort's range partitioning
    val df = SparkEntry.queries("j54_snapshot_upsert")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast left-anti join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"snapshot-side shuffle join in the upsert path:\n$plan")
    val exchanges = graft.layout.Layout.countExchanges(df)
    assert(exchanges <= 1,
      s"expected only the output-sort exchange, got $exchanges")
    // 1 scan: the snapshot side; the delta is derived once and
    // lineage-truncated (a real refresh's delta arrives materialized)
    assertScanCount("j54_snapshot_upsert", "documents", 1)
  }

  test("j60 KMV pairwise stage runs on the materialized sketch, not the corpus") {
    // The per-source sketch (heap-built, ≤K entries — j45's pinned shape)
    // is materialized ONCE and the three pairwise references (source
    // list ×2 + membership join) read the checkpoint: the final plan
    // must contain ZERO documents scans — without the truncation each
    // reference re-ran the corpus scan + distinct + heap agg (measured:
    // 3 scans). The Windows that remain rank ≤K·sources sketch rows.
    val df = SparkEntry.queries("j60_kmv_overlap")(spark, d)
    assertScanCount("j60_kmv_overlap", "documents", 0)
    // and nothing in the pairwise stage re-aggregates corpus-scale data:
    // every operator below the windows reads the tiny ExistingRDD
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD") || plan.contains("LocalTableScan"),
      s"no materialized sketch table in the plan:\n$plan")
  }

  test("j67 multi-index assignment: four pruned scans, pushed half-codebook reads") {
    // per half: one collection scan + one vec_id<4 half-codebook scan
    // whose filter reaches the parquet reader (row-group pruned at
    // scale). The k = kHalf² product codebook is never materialized —
    // cells exist only as (lo, hi) argmin pairs, which is the whole
    // multi-index trick (2·kHalf evals, not kHalf²).
    assertScanCount("j67_imi_cells", "embeddings", 4)
    val pushed = staticPlan("j67_imi_cells")
      .split("PushedFilters: \\[").drop(1).map(_.split("\\]")(0))
    assert(pushed.count(_.contains("LessThan(vec_id,4)")) == 2,
      s"both half-codebook reads must push vec_id < 4: " +
        s"${pushed.mkString(" | ")}")
  }

  test("j68 IMI search: vectors never shuffle — codebook reads pushed, rest truncated") {
    // embeddings appears exactly 3×: the two pushed half-codebook scans
    // (probe-side distance tables) and ONE scan feeding the candidate
    // re-rank join. The collection-sized cell table and the probe panel
    // are truncated, so no stage re-derives them, and the re-rank join
    // keys candidates to vectors without a vector-carrying shuffle (the
    // candidate side is broadcast-sized: 64 probes × probed cells).
    assertScanCount("j68_imi_search", "embeddings", 3)
    val pushed = staticPlan("j68_imi_search")
      .split("PushedFilters: \\[").drop(1).map(_.split("\\]")(0))
    assert(pushed.count(_.contains("LessThan(vec_id,4)")) == 2,
      s"both half-codebook reads must push vec_id < 4: " +
        s"${pushed.mkString(" | ")}")
  }

  /** Window lines in a plan string, split UNPARTITIONED (the
    * single-task shape) vs keyed. WindowExec prints up to three
    * top-level bracket lists — `Window [fns], [part], [order]` — and
    * omits empty ones, so the classes are:
    *   `Window [fns], [part], [order]`  → keyed (3 lists)
    *   `Window [fns], [part]`           → keyed, unordered
    *                                      (whole-partition aggregate)
    *   `Window [fns], [order]`          → UNPARTITIONED, ordered
    *   `Window [fns]`                   → UNPARTITIONED, unordered
    * A 2-list line is ordered (not a partition spec) iff its SECOND list
    * carries sort directions — the fns list also contains ASC/DESC text
    * inside windowspecdefinition, so only the second list is inspected.
    * AQE wraps the tree in AdaptiveSparkPlanExec (which `collect` does
    * not descend through), so the string is the robust observable here.
    */
  private def windowLines(plan: String): (Seq[String], Seq[String]) = {
    val lines = plan.split("\n").filter(_.contains("Window ["))
    def isGlobal(l: String): Boolean = {
      val parts = l.substring(l.indexOf("Window [")).split("\\], \\[")
      parts.length match {
        case 1 => true // no partition, no order
        case 2 => parts(1).contains(" ASC") || parts(1).contains(" DESC")
        case _ => false
      }
    }
    (lines.filter(isGlobal).toSeq, lines.filterNot(isGlobal).toSeq)
  }

  test("j71 budget-select: no unpartitioned window anywhere near the corpus") {
    // The operator's whole scale claim: the global-order cumsum runs ONLY
    // over the ≤101-row bucket histogram, which is materialized before
    // the registered plan — so the plan the driver executes must carry
    // ZERO unpartitioned windows, and the only per-doc window is the
    // boundary refinement PARTITIONED BY bucket. A corpus-sized
    // single-partition window here is the classic scale-killer timing at
    // sf would never catch.
    val plan = staticPlan("j71_budget_select")
    val (global, keyed) = windowLines(plan)
    assert(global.isEmpty,
      s"unpartitioned window leaked into the registered plan:\n" +
        global.mkString("\n"))
    assert(keyed.nonEmpty && keyed.forall(_.contains("bucket")),
      s"per-doc windows must be partitioned by bucket:\n" +
        keyed.mkString("\n"))
    assert(plan.contains("BroadcastHashJoin"),
      "the histogram must reach the docs via a broadcast join")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "the 1-row budget must attach via a broadcast cross join")
  }

  test("j72 interleave: corpus window keyed by source; global only on the source list") {
    val plan = staticPlan("j72_curriculum_interleave")
    val (global, keyed) = windowLines(plan)
    assert(global.size == 1,
      s"expected exactly 1 unpartitioned window (the ≤sources-row " +
        s"index), got ${global.size}:\n${global.mkString("\n")}")
    // that one global window must sit directly over the distinct-source
    // aggregate, never corpus rows: in the plan text the lines after THE
    // GLOBAL window line (not the keyed one, which prints first) are the
    // HashAggregate pair that implements distinct()
    val lines = plan.split("\n")
    val gIdx = lines.indexWhere(l => l.contains("Window [") &&
      "\\], \\[".r.findAllIn(l).length == 1)
    assert(gIdx >= 0, "global window line not found")
    assert(lines.slice(gIdx + 1, gIdx + 5).exists(_.contains("HashAggregate")),
      s"global window must consume the DISTINCT source list:\n" +
        lines.slice(gIdx, gIdx + 5).mkString("\n"))
    assert(keyed.nonEmpty && keyed.forall(_.contains("source")),
      s"the per-doc ranking must window PARTITIONED BY source:\n" +
        keyed.mkString("\n"))
  }

  test("j73 projection is a pure map stage: broadcast matrix, no wide exchange") {
    // The whole point of the sketch: 16 projections per vector computed
    // in the scan's map stage against a broadcast 16-row sign matrix —
    // the plan must carry NO hash exchange at all (nothing groups,
    // nothing joins on a key) and exactly one range exchange, the output
    // sort. Any hashpartitioning here means the projection stopped being
    // map-only and would shuffle the corpus at 100 TB.
    val plan = staticPlan("j73_random_projection")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "sign matrix must attach via a broadcast cross join")
    assert(!plan.contains("hashpartitioning"),
      s"projection grew a wide exchange:\n$plan")
    assert("rangepartitioning".r.findAllIn(plan).length == 1,
      "exactly one exchange expected — the output sort")
    val (global, keyed) = windowLines(plan)
    assert(global.isEmpty && keyed.isEmpty, "projection needs no window")
  }

  test("j74 hard negatives: one vector scan, per-anchor group-limit top-k") {
    // j68's discipline applied to mining: cells and anchors come in
    // truncated (no embeddings re-derivation), candidate ids form on the
    // cell equi-join, and embeddings.parquet is scanned exactly ONCE —
    // the per-candidate vector fetch. The top-4 must compile to
    // WindowGroupLimit (rank pushed into a partial group-limit BEFORE
    // the anchor exchange — per-partition heaps, not a full sort of the
    // band), and every window is PARTITIONED BY anchor_id.
    assertScanCount("j74_hard_negatives", "embeddings", 1)
    val plan = staticPlan("j74_hard_negatives")
    assert(plan.contains("WindowGroupLimit"),
      "top-k must push down to a group-limit")
    val (global, keyed) = windowLines(plan)
    assert(global.isEmpty, s"unpartitioned window leaked:\n$plan")
    assert(keyed.nonEmpty && keyed.forall(_.contains("anchor_id")),
      s"ranking must window per anchor:\n${keyed.mkString("\n")}")
  }

  test("j76 contract: one fused pass per table, FK via broadcast anti-join") {
    // 9 constraints must not mean 9 scans: the conditional sums fuse into
    // ONE aggregate pass over documents and ONE over events (the FK
    // anti-join is the only second events scan), and customer attaches
    // as a broadcast — at 100 TB the contract costs two fact scans flat
    assertScanCount("j76_data_contract", "documents", 1)
    assertScanCount("j76_data_contract", "events", 2)
    val plan = staticPlan("j76_data_contract")
    assert(plan.contains("BroadcastHashJoin LeftAnti") ||
      plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("LeftAnti, BuildRight"),
      s"FK check must be a broadcast anti-join:\n$plan")
    val (global, keyed) = windowLines(plan)
    assert(global.isEmpty && keyed.isEmpty, "contract needs no window")
  }

  test("j75 rewrite: window-free; argmin and rewrite share the chunk-hash key") {
    // "Globally first occurrence" without global order: min(struct) is a
    // map-side-combinable argmin, so the plan has ZERO windows; its wide
    // exchanges are exactly the chunk-hash key (argmin + rewrite join
    // live on the same key) and doc_id (the per-doc rebuild) — nothing
    // else, and in particular no corpus-ordered operator anywhere.
    val plan = staticPlan("j75_chunk_rewrite")
    val (global, keyed) = windowLines(plan)
    assert(global.isEmpty && keyed.isEmpty,
      s"rewrite must be window-free:\n$plan")
    val hashKeys = "hashpartitioning\\(([a-z_]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(hashKeys.subsetOf(Set("ck", "doc_id")) && hashKeys("doc_id"),
      s"wide exchanges must key on ck/doc_id only, got $hashKeys")
    assert("rangepartitioning".r.findAllIn(plan).length == 1,
      "exactly one range exchange — the output sort")
  }

  test("j77 bigram LM reads documents twice; grams and docs are the only wide keys") {
    // the truncated unigram table must absorb BOTH its consumers (context
    // join + V) — an untruncated diamond would re-scan the corpus per
    // reference and show 4 scans here
    assertScanCount("j77_bigram_lm_score", "documents", 2)
    val plan = staticPlan("j77_bigram_lm_score")
    val (global, keyed) = windowLines(plan)
    assert(global.isEmpty && keyed.isEmpty,
      s"the LM score needs no window:\n$plan")
    // wide exchanges: the bigram count aggregate keys on the gram (prints
    // its first column `a`) and the per-doc regroup on doc_id — nothing
    // else; V's 1-row aggregate is a SinglePartition exchange, not a
    // hashpartitioning
    val hashKeys = "hashpartitioning\\(([a-z_]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(hashKeys.subsetOf(Set("a", "doc_id")) && hashKeys("doc_id"),
      s"wide exchanges must key on gram/doc_id only, got $hashKeys")
    assert("rangepartitioning".r.findAllIn(plan).length == 1,
      "exactly one range exchange — the output sort")
  }

  test("j78 SCD2 builds the whole history on ONE custkey exchange") {
    // lag, the island filter, lead, and row_number all share the
    // (custkey)(ts, ok) sort order: the filter preserves partitioning and
    // ordering, so the second Window reuses the first's exchange — the
    // static plan carries exactly one hashpartitioning (custkey) plus the
    // output range sort, and every window is keyed (no global window near
    // the fact table)
    assertScanCount("j78_scd2_history", "orders", 1)
    val plan = staticPlan("j78_scd2_history")
    val hashes = "hashpartitioning\\(([a-z_]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(hashes == Seq("custkey"),
      s"expected exactly one custkey exchange, got $hashes")
    val (global, keyed) = windowLines(plan)
    assert(global.isEmpty, s"no global window allowed:\n$plan")
    assert(keyed.nonEmpty, "expected keyed window operators")
    assert("rangepartitioning".r.findAllIn(plan).length == 1,
      "exactly one range exchange — the output sort")
  }

  test("j79 PIT join: no window or argmax near the facts — intervals do the as-of") {
    // the as-of mechanics ride the SCD2 chain law: an equi-join on
    // custkey + the interval filter replaces the per-fact-row argmax a
    // naive PIT join would window over — the ONLY windows in the plan are
    // the history derivation's custkey-keyed ones, and lineitem is
    // scanned exactly once (orders twice: the custkey map + the history)
    assertScanCount("j79_pit_dimension_join", "lineitem", 1)
    assertScanCount("j79_pit_dimension_join", "orders", 2)
    val plan = staticPlan("j79_pit_dimension_join")
    val (global, keyed) = windowLines(plan)
    assert(global.isEmpty, s"no global window allowed:\n$plan")
    assert(keyed.forall(_.contains("custkey")),
      s"every window must key on custkey (the history derivation only)")
  }

  test("j80 snapshot diff: fingerprints shuffle, text never does") {
    // each snapshot projects to (doc_id, source, md5, length) BEFORE the
    // full-outer join — the text column must die at the scan's project,
    // so the only wide keys are the join's doc_id and the final tiny
    // aggregate's source, with no window anywhere
    assertScanCount("j80_snapshot_diff", "documents", 2)
    val plan = staticPlan("j80_snapshot_diff")
    val (global, keyed) = windowLines(plan)
    assert(global.isEmpty && keyed.isEmpty, s"diff needs no window:\n$plan")
    val hashKeys = "hashpartitioning\\(([a-z_]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(hashKeys.subsetOf(Set("doc_id", "source")) && hashKeys("doc_id"),
      s"wide exchanges must key on doc_id/source only, got $hashKeys")
    assert(plan.contains("FullOuter"),
      s"snapshot diff must plan a full-outer join:\n$plan")
  }

  test("j81 winnow join runs entirely on the materialized fingerprint index") {
    // the posting table is truncated ONCE (it IS the inverted index) —
    // the final static plan reads documents ZERO times: df cap, both
    // self-join sides, and the pair count all consume the index, and the
    // only wide keys are the fingerprint (cap + join) and the pair group
    // (whose partition expression prints the pre-alias doc_id attr)
    assertScanCount("j81_winnow_neardup", "documents", 0)
    val plan = staticPlan("j81_winnow_neardup")
    val (global, keyed) = windowLines(plan)
    assert(global.isEmpty && keyed.isEmpty,
      s"the pair join needs no window:\n$plan")
    val hashKeys = "hashpartitioning\\(([a-z_]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(hashKeys.subsetOf(Set("fp", "doc_id")),
      s"wide exchanges must key on fp / the pair group only, got $hashKeys")
  }

  test("j82 refresh merges two slice aggregates on one keyed join, no rescan of the union") {
    // merge(agg(base), agg(delta)): exactly two events scans (one per
    // slice — at production the base states are a stored table and the
    // corpus is never rescanned), a full-outer merge join keyed on the
    // aggregate key, and zero windows anywhere
    assertScanCount("j82_incremental_agg_refresh", "events", 2)
    val plan = staticPlan("j82_incremental_agg_refresh")
    assert(plan.contains("FullOuter"),
      s"state merge must be a full-outer join:\n$plan")
    val (global, keyed) = windowLines(plan)
    assert(global.isEmpty && keyed.isEmpty, "refresh needs no window")
    val hashKeys = "hashpartitioning\\(([a-z_]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(hashKeys == Set("event_type"),
      s"only the aggregate key may exchange, got $hashKeys")
  }

  test("j83 funnel is one scan, no explode, and windows only post-aggregate") {
    // the whole rule battery — including the per-doc repetition statistic —
    // must stay INSIDE the row (sorted-run fold), so the plan is one
    // documents scan, zero Generate (explode) operators, and exactly three
    // shuffles: the (source, verdict) aggregate, the share-of-source window
    // over the ALREADY-AGGREGATED table, and the output sort
    assertScanCount("j83_filter_funnel", "documents", 1)
    val plan = staticPlan("j83_filter_funnel")
    assert(!plan.contains("Generate"),
      s"repetition statistic exploded out of the row:\n$plan")
    val df = SparkEntry.queries("j83_filter_funnel")(spark, d)
    val exchanges = graft.layout.Layout.countExchanges(df)
    assert(exchanges == 3, s"expected agg+window+sort = 3 shuffles, " +
      s"got $exchanges:\n$plan")
    // partial aggregation runs map-side before the one doc-sized exchange
    val firstExchange = plan.indexOf("Exchange")
    val firstAgg = plan.indexOf("HashAggregate")
    assert(firstAgg >= 0 && firstAgg > firstExchange,
      "no partial aggregate below the exchange (plan prints top-down, " +
        s"so the map-side agg must appear AFTER the exchange line):\n$plan")
  }

  test("j84 survivor election is a window, not the agg+join-back diamond") {
    // doc-linear output: the agg + join-back form re-executes the
    // cluster⋈quality subtree per reference (two documents scans); the
    // partition-only window form is one scan, one cluster_id exchange,
    // one output sort, and no join after the cluster⋈quality attach
    assertScanCount("j84_dedup_survivor", "documents", 1)
    val df = SparkEntry.queries("j84_dedup_survivor")(spark, d)
    val exchanges = graft.layout.Layout.countExchanges(df)
    assert(exchanges == 2,
      s"expected window+sort = 2 shuffles, got $exchanges")
    val plan = staticPlan("j84_dedup_survivor")
    assert("SortMergeJoin".r.findAllIn(plan).isEmpty,
      s"survivor join-back diamond is back:\n$plan")
    // partition-only window (no ORDER BY ⇒ only one bracket group, so
    // windowLines' global/keyed split doesn't apply): assert the
    // partition spec carries cluster_id directly
    val wins = plan.split("\n").filter(_.contains("Window ["))
    assert(wins.length == 1, s"expected one Window:\n${wins.mkString("\n")}")
    assert(wins.head.contains("windowspecdefinition(cluster_id"),
      s"survivor window not partitioned by cluster_id:\n${wins.head}")
  }

  test("a4 DSv2 scan narrows its range, prunes columns, reports pushed stats") {
    val plan = staticPlan("a4_dsv2_pushdown")
    // the doc_id bounds reached the source: the scan's own description
    // carries the narrowed generation interval (5k of 10k configured rows)
    assert(plan.contains("range=[2500,7500)"),
      s"doc_id range not pushed into the generator:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(doc_id,2500)")
      && plan.contains("LessThan(doc_id,7500)"),
      s"pushed filter list missing the doc_id bounds:\n$plan")
    // column pruning reached generation: source/quality_ppm never produced
    assert(plan.contains("cols=[doc_id,lang,n_chars]"),
      s"required-column pruning did not reach the source:\n$plan")
    // the residual lang predicate is evaluated ABOVE the scan, not pushed
    assert(!plan.contains("EqualTo(lang"),
      s"lang must stay residual (the source only handles doc_id):\n$plan")
    assert(plan.contains("Filter"), s"residual filter vanished:\n$plan")
    // post-pushdown statistics: the optimizer sees the narrowed count
    val pushed = spark.read.format("graft-docgen")
      .option("rows", "10000").option("partitions", "8").load()
      .filter(org.apache.spark.sql.functions.expr(
        "doc_id >= 2500 AND doc_id < 7500"))
    val stats = pushed.queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(5000)),
      s"expected post-pushdown rowCount 5000, got ${stats.rowCount}")
    // partition planning honors the requested parallelism
    val raw = spark.read.format("graft-docgen")
      .option("rows", "10000").option("partitions", "8").load()
    assert(raw.rdd.getNumPartitions == 8,
      s"expected 8 input partitions, got ${raw.rdd.getNumPartitions}")
  }

  test("a6 aggregate pushdown: no HashAggregate, closed forms in the scan") {
    val plan = staticPlan("a6_agg_pushdown")
    // complete pushdown means Spark's own Aggregate node is GONE — the
    // scan answers count/min/max/sum from interval arithmetic
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      s"aggregate was not completely pushed:\n$plan")
    assert(plan.contains("PushedAggregates: [COUNT"),
      s"scan does not advertise the pushed aggregation:\n$plan")
    // filter∘aggregate composition: the closed forms run over the range the
    // pushed doc_id bounds narrowed, not the configured total
    assert(plan.contains("range=[12345,90000000)"),
      s"aggregation did not compose with the pushed filter range:\n$plan")
  }

  test("c10 binned range join plans as an equi-join, not a nested loop") {
    val plan = staticPlan("c10_join_range_binned")
    // the whole point of the bin rewrite: the O(n·m) plan shapes must be
    // absent, the join must key on the bin
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated to BNL:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"range join degenerated to a cross product:\n$plan")
    val gens = plan.split("\n").count(_.contains("Generate explode"))
    assert(gens == 1, s"expected exactly one explode (orders→bins), " +
      s"got $gens:\n$plan")
  }

  test("j87/j88 typo joins read documents zero times (index truncated)") {
    // the posting table is lineage-truncated once — the self-join and the
    // j88 cap groupBy must consume the materialized index, never re-run
    // the tokenize→explode subtree (which would scan documents twice)
    Seq("j87_typo_candidates", "j88_typo_capped").foreach { q =>
      val plan = staticPlan(q)
      val scans = "documents\\.parquet".r.findAllIn(plan).length
      assert(scans == 0,
        s"$q: expected the truncated index, got $scans documents scans")
    }
  }

  test("binned-range-join rule turns a naive window join into an equi-join") {
    import org.apache.spark.sql.functions._
    def naivePlan(): String = {
      val epoch = lit("1995-01-01").cast("date")
      val o = Tables.orders(spark, d).select(col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"), epoch).as("o_day"))
      val l = Tables.lineitem(spark, d).select(
        datediff(col("l_shipdate").cast("date"), epoch).as("l_day"))
      o.join(l, col("l_day") >= col("o_day") &&
          col("l_day") < col("o_day") + 7)
        .queryExecution.executedPlan.toString
    }
    val rewritten = naivePlan()
    assert(rewritten.contains("__graft_bin"),
      s"rule did not fire on the naive window join:\n$rewritten")
    assert(!rewritten.contains("BroadcastNestedLoopJoin") &&
      !rewritten.contains("CartesianProduct"),
      s"rewritten join still plans as a nested loop:\n$rewritten")
    // kill switch restores the (sanctioned-for-tiny-sides) BNL plan
    spark.conf.set("spark.graft.binnedRangeJoin", "false")
    val off = try naivePlan()
    finally spark.conf.unset("spark.graft.binnedRangeJoin")
    assert(!off.contains("__graft_bin") &&
      off.contains("BroadcastNestedLoopJoin"),
      s"kill switch did not restore the naive plan:\n$off")
  }

  test("c11 bloom probe sits on the fact side below the semi join") {
    val plan = staticPlan("c11_join_bloom_reduced")
    // the probe expression must appear as a Filter in the lineitem branch
    // — that's the shuffle-volume reduction the pattern exists for
    assert(plan.contains("graft_bloom_maybe"),
      s"bloom prefilter missing from the physical plan:\n$plan")
    assert(plan.contains("LeftSemi"),
      s"exact semi join missing (the FP-removal stage):\n$plan")
    val probeLine = plan.split("\n").find(_.contains("graft_bloom_maybe"))
      .getOrElse("")
    assert(probeLine.contains("Filter"),
      s"probe not planned as a Filter:\n$probeLine")
  }

  test("a5 catalog SQL pushes the same bounds as the DataFrame path") {
    // the TableCatalog route resolves to the same ScanBuilder, so SQL text
    // over graft.docgen_* must show the identical narrowed range — and the
    // pruning here is TIGHTER than a4's: both doc_id predicates are fully
    // pushed, so doc_id itself is never generated (cols = group key + sum
    // input only; lang/quality_ppm/doc_id all dropped)
    val plan = staticPlan("a5_catalog_sql")
    assert(plan.contains("range=[2500,7500)"),
      s"catalog path lost the doc_id pushdown:\n$plan")
    assert(plan.contains("cols=[source,n_chars]"),
      s"catalog path lost column pruning:\n$plan")
  }

  test("j85 LM tables are built once: two documents scans, no window") {
    // the count tables are the LM — c2 feeds BOTH the (a,b)-context and
    // (b,c)-backoff lookups and c1 both unigram lookups + the totals, so
    // without the lineage truncation each reference would re-derive its
    // table from parquet (six-plus documents scans); truncated, the plan
    // reads documents exactly twice (train trigram counts + eval probes)
    // and the reused tables enter as checkpoint scans
    assertScanCount("j85_trigram_backoff", "documents", 2)
    val plan = staticPlan("j85_trigram_backoff")
    val (global, keyed) = windowLines(plan)
    assert(global.isEmpty && keyed.isEmpty,
      s"the backoff cascade needs no window:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      "count tables stopped entering via checkpoint — diamond risk")
  }

  test("j85 FORCES exactly one broadcast: the 1-row totals, never the vocabulary") {
    // the unigram-count table c1 is corpus-VOCABULARY-sized — 10^8-10^9
    // types on 100 TB of text by Heaps' law, unbroadcastable. A pinned
    // broadcast() HINT there forces the build regardless of size — the
    // scale-killer the r14 verdict flagged. Size-ESTIMATED broadcasts
    // (static stats or AQE runtime) are fine: they shrink away as the
    // corpus grows. So the pin is on hints, not exchanges: the analyzed
    // plan must carry exactly one ResolvedHint, and its child must be
    // the 1-row totals scalar — nothing vocabulary-shaped.
    val analyzed = SparkEntry.queries("j85_trigram_backoff")(spark, d)
      .queryExecution.analyzed
    val hints = analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.length == 1,
      s"expected exactly 1 broadcast hint (totals), got ${hints.length}")
    assert(hints.head.child.output.map(_.name).toSet == Set("n_tok", "v"),
      s"the forced broadcast is not the totals scalar: " +
        hints.head.child.output.map(_.name).mkString(","))
  }

  test("i7 prefix scan: per-bucket window keyed, the only global window is the ≤32-row summary") {
    // the r16 verdict's one `weak`: the late-data running max must never
    // single-partition the events table. Two-pass shape: the per-event
    // window keys on the bucket tag; exactly one global window survives
    // and it consumes the per-bucket HashAggregate (≤32 rows), which the
    // broadcast then ships back.
    val plan = staticPlan("i7_late_data")
    val (global, keyed) = windowLines(plan)
    assert(keyed.nonEmpty && keyed.forall(_.contains("__pid")),
      s"per-event window must key on the bucket tag:\n${keyed.mkString("\n")}")
    assert(global.size == 1,
      s"expected exactly 1 global window (the bucket summary):\n$plan")
    val lines = plan.split("\n")
    val gIdx = lines.indexWhere(l => l.contains("Window [") &&
      "\\], \\[".r.findAllIn(l).length == 1)
    assert(lines.slice(gIdx + 1, gIdx + 6).exists(_.contains("HashAggregate")),
      s"global window must consume the per-bucket aggregate:\n" +
        lines.slice(gIdx, gIdx + 6).mkString("\n"))
    assert(plan.contains("BroadcastHashJoin"),
      "bucket summary must return via a broadcast join")
  }

  test("e5 prefix scan: rank assembly windows key on the bucket tag") {
    val plan = staticPlan("e5_ntile_pctl")
    val (global, keyed) = windowLines(plan)
    assert(keyed.nonEmpty && keyed.forall(_.contains("__pid")),
      s"local rank must key on the bucket tag:\n${keyed.mkString("\n")}")
    // offset + total ride ONE global pass over the ≤32-row count table
    // (two window functions, same spec ⇒ may print as 1 or 2 lines; all
    // of them must sit over the per-bucket aggregate)
    assert(global.nonEmpty, s"expected the bucket-count global window:\n$plan")
    val lines = plan.split("\n")
    val gIdx = lines.indexWhere(l => l.contains("Window [") &&
      "\\], \\[".r.findAllIn(l).length == 1)
    assert(lines.slice(gIdx + 1, gIdx + 8).exists(_.contains("HashAggregate")),
      s"global window must consume the per-bucket count table:\n" +
        lines.slice(gIdx, gIdx + 8).mkString("\n"))
    assert(plan.contains("BroadcastHashJoin"),
      "bucket offsets must return via a broadcast join")
  }

  test("NO registered plan carries an unpartitioned window outside the bounded allowlist") {
    // The r16 verdict's generalization ask: a global-order window is the
    // one plan shape that silently serializes a 100 TB input onto a
    // single task, so EVERY registered query is swept, not just the ones
    // with dedicated shape tests. The allowlist names each sanctioned
    // global window and why its input is bounded by something other than
    // the data size (bucket counts / value spaces / the ≤32-row prefix
    // summaries) — every allowlisted entry also has its own dedicated
    // test above pinning that the bounded input is what the window
    // actually consumes.
    val bounded = Map(
      "e5_ntile_pctl" -> "≤32-row per-bucket count table (prefix scan)",
      "i7_late_data" -> "≤32-row per-bucket max table (prefix scan)",
      "j33_seqlen_hist" -> "≤value-space-bucket histogram rows",
      "j72_curriculum_interleave" -> "distinct source list")
    val offenders = SparkEntry.all.flatMap { q =>
      val (global, _) = windowLines(staticPlan(q.name))
      if (global.nonEmpty && !bounded.contains(q.name))
        Some(q.name -> global.mkString(" | "))
      else None
    }
    assert(offenders.isEmpty,
      offenders.map { case (n, w) => s"$n: $w" }
        .mkString("unpartitioned windows outside the allowlist:\n", "\n", ""))
    // and the allowlist can only shrink: an entry whose query stopped
    // planning a global window is stale documentation
    bounded.keys.foreach { n =>
      assert(windowLines(staticPlan(n))._1.nonEmpty,
        s"$n no longer plans a global window — drop it from the allowlist")
    }
  }
}
