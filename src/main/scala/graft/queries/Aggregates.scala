package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** SURVEY §2 category D — aggregation surface.
  *
  * All shapes compile to partial (map-side) + final HashAggregateExec pairs,
  * so at 100 TB the shuffle carries one row per (partition × group), not per
  * input row. Money sums go through integer cents (Q.cents) — exact and
  * order-independent, immune to the cross-engine double-summation divergence
  * measured in SURVEY [E7].
  */
object Aggregates {

  val queries: Seq[Q] = Seq(
    // TPC-H Q1 shape — the flagship grouped aggregate.
    Q("d1_hash_agg",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 1).as("sum_qty"),
          sum(Q.cents(col("l_extendedprice"))).as("base_cents"),
          sum(Q.cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("disc_cents"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 2).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
                     round(SUM(l_quantity), 1) AS sum_qty,
                     CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT))
                       AS BIGINT) AS base_cents,
                     CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100)
                       AS BIGINT)) AS BIGINT) AS disc_cents,
                     round(AVG(l_quantity), 4) AS avg_qty,
                     round(AVG(l_extendedprice), 2) AS avg_price,
                     COUNT(*) AS count_order
              FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
              GROUP BY l_returnflag, l_linestatus
              ORDER BY l_returnflag, l_linestatus""")),

    Q("d2_count_distinct",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust,
                     COUNT(*) AS n_orders
              FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // HLL++ sketch — mergeable, constant memory per group; the 100 TB
    // replacement for exact distinct. No DuckDB oracle (different sketch);
    // bounds-checked against d2 in the test suite instead (SURVEY §5).
    Q("d3_hll_approx",
      (s, d) => Tables.events(s, d)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type"),
      None),

    Q("d4_rollup",
      (s, d) => Tables.orders(s, d)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(Q.cents(col("o_totalprice"))).as("total_cents"))
        .select(
          coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("n"), col("total_cents"))
        .orderBy("status", "priority"),
      Some("""SELECT COALESCE(o_orderstatus, '(all)') AS status,
                     COALESCE(o_orderpriority, '(all)') AS priority,
                     COUNT(*) AS n,
                     CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT))
                       AS BIGINT) AS total_cents
              FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
              ORDER BY status, priority""")),

    Q("d5_cube",
      (s, d) => Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
          coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
          col("n"))
        .orderBy("rf", "ls"),
      Some("""SELECT COALESCE(l_returnflag, '(all)') AS rf,
                     COALESCE(l_linestatus, '(all)') AS ls,
                     COUNT(*) AS n
              FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
              ORDER BY rf, ls""")),

    // Pivot with a fixed value list (determinism — dynamic pivot would probe
    // the data for values). Oracle = manual CASE WHEN columns.
    Q("d6_pivot",
      (s, d) => Tables.orders(s, d)
        .withColumn("cents", Q.cents(col("o_totalprice")))
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .sum("cents")
        .toDF("o_orderstatus", "p_urgent", "p_high", "p_medium", "p_notspec",
          "p_low")
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus,
                     CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                       THEN CAST(round(o_totalprice*100) AS BIGINT) END)
                       AS BIGINT) AS p_urgent,
                     CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH'
                       THEN CAST(round(o_totalprice*100) AS BIGINT) END)
                       AS BIGINT) AS p_high,
                     CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM'
                       THEN CAST(round(o_totalprice*100) AS BIGINT) END)
                       AS BIGINT) AS p_medium,
                     CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
                       THEN CAST(round(o_totalprice*100) AS BIGINT) END)
                       AS BIGINT) AS p_notspec,
                     CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'
                       THEN CAST(round(o_totalprice*100) AS BIGINT) END)
                       AS BIGINT) AS p_low
              FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Set/list aggregate — collect_list order is nondeterministic, so the
    // result is sorted before leaving the aggregate (SURVEY §5.3 rule 5).
    // The sorted set is projected to a CSV scalar: the driver's compare
    // harness cannot sort array-valued columns (round-1 ADVICE), and a
    // distinct-set projection keeps this row distinct from d10's list agg.
    Q("d7_collect_sorted",
      (s, d) => Tables.events(s, d)
        .groupBy("user_id")
        .agg(concat_ws(",",
          array_distinct(sort_array(collect_list(col("event_type")))))
          .as("type_set_csv"),
          count(lit(1)).as("n"))
        .orderBy("user_id"),
      Some("""SELECT user_id,
                     string_agg(DISTINCT event_type, ',' ORDER BY event_type)
                       AS type_set_csv,
                     COUNT(*) AS n
              FROM events GROUP BY user_id ORDER BY user_id"""))
  )
}
