package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape regressions (SURVEY §4): the properties that make the
  * registered queries survive a 100× scale-up are plan facts, not timings —
  * filters reaching the parquet reader, pruned read schemas, dimension joins
  * broadcasting, bounded top-k planning as TakeOrderedAndProject, and map-only
  * pipelines staying shuffle-free. Asserting them here means a refactor that
  * silently trades one of these away fails the suite, not the next bench.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  /** Full formatted physical plan AFTER execution (AQE finalizes the plan on
    * first run, so explain before an action would show the undecided form).
    */
  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, d)
    df.count()
    df.queryExecution.executedPlan.toString
  }

  test("m4 pushes all three scan filters into the parquet reader") {
    val plan = executedPlan("m4_tpch_q6")
    assert(plan.contains("PushedFilters: ["), s"no pushdown section:\n$plan")
    assert(!plan.contains("PushedFilters: []"), s"empty pushdown:\n$plan")
    // the pushable conjuncts: shipdate range, quantity bound, discount range
    Seq("l_shipdate", "l_quantity", "l_discount").foreach { c =>
      assert(plan.split("PushedFilters")(1).contains(c),
        s"$c not pushed:\n$plan")
    }
  }

  test("m4 prunes the read schema to the four referenced columns") {
    val plan = executedPlan("m4_tpch_q6")
    val readSchema = plan.split("ReadSchema: ")(1).split("\n")(0)
    Seq("l_shipdate", "l_quantity", "l_discount", "l_extendedprice")
      .foreach(c => assert(readSchema.contains(c), s"$c missing: $readSchema"))
    // the 7 other lineitem columns must NOT be read
    Seq("l_orderkey", "l_partkey", "l_returnflag", "l_tax")
      .foreach(c => assert(!readSchema.contains(c), s"$c read: $readSchema"))
  }

  test("m7 joins the part dimension via broadcast, not a shuffle") {
    val plan = executedPlan("m7_tpch_q14")
    assert(plan.contains("BroadcastHashJoin"), s"no BHJ:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ:\n$plan")
  }

  test("m1 plans its bounded top-10 as TakeOrderedAndProject (no global sort)") {
    val plan = executedPlan("m1_tpch_q3")
    assert(plan.contains("TakeOrderedAndProject"), s"global sort:\n$plan")
  }

  test("j22 vocab top-k plans as TakeOrderedAndProject over the token agg") {
    val plan = executedPlan("j22_vocab_topk")
    assert(plan.contains("TakeOrderedAndProject"), s"global sort:\n$plan")
  }

  test("j20 quantization is map-only: no exchange except the output sort") {
    val plan = executedPlan("j20_embed_quantize")
    val exchanges = "(?m)^.*Exchange".r.findAllIn(plan).size
    // exactly one rangepartitioning exchange for the deterministic ORDER BY;
    // the quantization math itself must not shuffle
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
    assert(plan.contains("rangepartitioning"), s"missing output sort:\n$plan")
  }

  test("m8 reuses the l_orderkey aggregation partitioning for its join") {
    val plan = executedPlan("m8_tpch_q18")
    // the grouped HAVING subquery and the orders join both key on the order
    // key: the aggregate's shuffle output must feed the join directly —
    // lineitem is exchanged exactly once (plus one exchange for the orders
    // side; customer broadcasts at this SF)
    val exchanges = "(?m)hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2,
      s"extra shuffle below the Q18 join (got $exchanges hash exchanges):\n$plan")
  }
}
