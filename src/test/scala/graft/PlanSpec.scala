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
}
