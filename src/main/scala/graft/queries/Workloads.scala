package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composite flagship workloads — classic TPC-H shapes (Q3/Q5/Q10 adapted to
  * this generator's columns) that exercise several inventory operators in one
  * realistic plan: selective dim filters feeding broadcast joins, one
  * fact-fact shuffle, partial+final aggregation, bounded top-k output.
  * These are the queries a consumer of the engine actually runs; each is
  * oracle-verified end-to-end like every other §2 row.
  *
  * Scale shape shared by all three: filters push into every scan, dimension
  * sides broadcast, the lineitem⋈orders join is the single big shuffle, and
  * the final ORDER BY ... LIMIT plans as TakeOrderedAndProject (per-partition
  * top-k, no global sort).
  */
object Workloads {

  /** m1's query text, shared verbatim by the DataFrame form's oracle and
    * the m1_sql registration — ONE string proves the SQL-text surface:
    * what DuckDB runs as the oracle is exactly what `spark.sql` runs.
    */
  val M1Sql: String =
    """SELECT l_orderkey,
              CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100)
                AS BIGINT)) AS BIGINT) AS rev_cents,
              o_orderdate
       FROM customer
       JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON o_orderkey = l_orderkey
       WHERE c_mktsegment = 'BUILDING'
         AND o_orderdate < TIMESTAMP '1998-01-01'
         AND l_shipdate > TIMESTAMP '1998-01-01'
       GROUP BY l_orderkey, o_orderdate
       ORDER BY rev_cents DESC, l_orderkey LIMIT 10"""

  /** m2's shared query text — see [[M1Sql]]. The 5-way join: proves the
    * SQL-text path re-derives the broadcast/shuffle split from statistics
    * alone (no broadcast() hints exist in SQL text).
    */
  val M2Sql: String =
    """SELECT n_name,
              CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100)
                AS BIGINT)) AS BIGINT) AS rev_cents
       FROM customer
       JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON o_orderkey = l_orderkey
       JOIN supplier ON l_suppkey = s_suppkey
                    AND c_nationkey = s_nationkey
       JOIN nation ON s_nationkey = n_nationkey
       WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate < TIMESTAMP '1997-01-01'
       GROUP BY n_name ORDER BY rev_cents DESC, n_name"""

  /** m6's shared query text — see [[M1Sql]]. */
  val M6Sql: String =
    """SELECT l_returnflag,
              CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
              CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
       FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         AND l_shipdate < TIMESTAMP '1997-01-01'
       GROUP BY l_returnflag ORDER BY l_returnflag"""

  val queries: Seq[Q] = Seq(
    // TPC-H Q3 (shipping priority): unshipped high-value BUILDING orders.
    Q("m1_tpch_q3",
      (s, d) => Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(sum(Q.cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("rev_cents"))
        .select("l_orderkey", "rev_cents", "o_orderdate")
        .orderBy(col("rev_cents").desc, col("l_orderkey"))
        .limit(10),
      Some(M1Sql)),

    // TPC-H Q5 (local supplier volume): revenue where the supplier serves a
    // customer of its own nation, per nation, one order-date year.
    Q("m2_tpch_q5",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum(Q.cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("rev_cents"))
        .orderBy(col("rev_cents").desc, col("n_name")),
      Some(M2Sql)),

    // TPC-H Q10 (returned items): customers who returned the most value in
    // a quarter-year window, top 20.
    Q("m3_tpch_q10",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_returnflag") === "R")
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(sum(Q.cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("rev_cents"))
        .select("c_custkey", "c_name", "rev_cents", "n_name")
        .orderBy(col("rev_cents").desc, col("c_custkey"))
        .limit(20),
      Some("""SELECT c_custkey, c_name,
                     CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100)
                       AS BIGINT)) AS BIGINT) AS rev_cents,
                     n_name
              FROM customer
              JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
              JOIN nation ON c_nationkey = n_nationkey
              WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                AND o_orderdate < TIMESTAMP '1996-04-01'
                AND l_returnflag = 'R'
              GROUP BY c_custkey, c_name, n_name
              ORDER BY rev_cents DESC, c_custkey LIMIT 20""")),

    // TPC-H Q6 (forecast revenue change): the pure scan→filter→aggregate
    // shape — no join, no grouping — that measures predicate pushdown +
    // whole-stage codegen in isolation. All three filters reach the parquet
    // reader (PushedFilters); the agg is a two-phase partial/final over
    // whatever partitions the scan produced.
    Q("m4_tpch_q6",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(sum(Q.cents(col("l_extendedprice") * col("l_discount")))
          .as("revenue_cents")),
      Some("""SELECT CAST(SUM(CAST(round(l_extendedprice*l_discount*100)
                       AS BIGINT)) AS BIGINT) AS revenue_cents
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1997-01-01'
                AND l_discount BETWEEN 0.05 AND 0.07
                AND l_quantity < 24""")),

    // TPC-H Q4 (order-priority checking), adapted: this generator's lineitem
    // has no commit/receipt dates, so the EXISTS probe is "order has a
    // returned line". The shape is the point: a date-filtered fact scan
    // gated by an EXISTS that Catalyst plans as a left-semi join — at scale
    // the semi join shuffles only the two key columns, never widens rows.
    Q("m5_tpch_q4",
      (s, d) => Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
        .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, count(*) AS order_count
              FROM orders
              WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                AND o_orderdate < TIMESTAMP '1996-07-01'
                AND EXISTS (SELECT 1 FROM lineitem
                            WHERE l_orderkey = o_orderkey
                              AND l_returnflag = 'R')
              GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // TPC-H Q12 (shipping modes / priority split), adapted: l_returnflag
    // stands in for l_shipmode. Conditional integer sums (the CASE pivot)
    // ride the same partial/final aggregation as plain counts — no second
    // pass over the join output.
    Q("m6_tpch_q12",
      (s, d) => Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))
        .orderBy("l_returnflag"),
      Some(M6Sql)),

    // TPC-H Q14 (promotion effect): part is the broadcast side of the join;
    // the promo share is a ratio of two exact integer-cents sums, so the
    // only double op is one division (IEEE-identical across engines) before
    // a 4-dp round.
    Q("m7_tpch_q14",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-02-01").cast("timestamp"))
        .join(broadcast(Tables.part(s, d)),
          col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO",
            Q.cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .otherwise(0L)).as("promo_cents"),
          sum(Q.cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("total_cents"))
        .select(col("promo_cents"), col("total_cents"),
          round(lit(100.0) * col("promo_cents") / col("total_cents"), 4)
            .as("promo_share")),
      Some("""WITH agg AS (
                SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                         THEN CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS promo_cents,
                       CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100)
                         AS BIGINT)) AS BIGINT) AS total_cents
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1996-02-01')
              SELECT promo_cents, total_cents,
                     round(CAST(100 AS DOUBLE) * promo_cents / total_cents, 4)
                       AS promo_share
              FROM agg""")),

    // TPC-H Q18 (large-volume customers): the HAVING subquery is a grouped
    // aggregate over the fact table reused as a semi-join filter — one
    // shuffle on l_orderkey feeds both the qualifying-key set and the final
    // per-order quantity sum. l_quantity values are integer-valued doubles,
    // so the sums are exact and the >180 threshold cannot knife-edge.
    Q("m8_tpch_q18",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val bigOrders = li.groupBy("l_orderkey")
          .agg(sum("l_quantity").as("sum_qty"))
          .filter(col("sum_qty") > 180)
        Tables.customer(s, d)
          .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
          .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
          .select(col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
            Q.cents(col("o_totalprice")).as("price_cents"),
            col("sum_qty").cast("long").as("sum_qty"))
          .orderBy(col("price_cents").desc, col("o_orderkey"))
          .limit(100)
      },
      Some("""SELECT c_custkey, o_orderkey, o_orderdate,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
                     CAST(sum_qty AS BIGINT) AS sum_qty
              FROM customer
              JOIN orders ON c_custkey = o_custkey
              JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
                    FROM lineitem GROUP BY l_orderkey
                    HAVING sum(l_quantity) > 180) big
                ON o_orderkey = big.l_orderkey
              ORDER BY price_cents DESC, o_orderkey LIMIT 100""")),

    // TPC-H Q2 shape (min-cost supplier), adapted: no partsupp table in
    // this generator, so the part↔supplier relation comes from observed
    // lineitem shipments. The explicit repartition on l_partkey makes the
    // chain single-data-shuffle (the d15 subset-partitioning pattern,
    // pinned in PlanSpec): HashPartitioning(l_partkey) satisfies both the
    // (l_partkey, l_suppkey) distinct's clustering and the per-part argmin
    // window's. Supplier and part joins broadcast.
    Q("m9_tpch_q2",
      (s, d) => {
        val w = Window.partitionBy("l_partkey")
          .orderBy(col("bal_cents"), col("s_suppkey"))
        Tables.lineitem(s, d)
          .select("l_partkey", "l_suppkey")
          .repartition(col("l_partkey"))
          .distinct()
          .join(broadcast(Tables.supplier(s, d)),
            col("l_suppkey") === col("s_suppkey"))
          .withColumn("bal_cents", Q.cents(col("s_acctbal")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .join(broadcast(Tables.part(s, d)),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_partkey"), col("p_name"), col("s_suppkey"),
            col("s_name"), col("bal_cents"))
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey, p_name, s_suppkey, s_name, bal_cents FROM (
                SELECT ps.l_partkey, s_suppkey, s_name,
                       CAST(round(s_acctbal * 100) AS BIGINT) AS bal_cents,
                       row_number() OVER (PARTITION BY ps.l_partkey
                         ORDER BY CAST(round(s_acctbal * 100) AS BIGINT),
                                  s_suppkey) AS rn
                FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
                JOIN supplier ON l_suppkey = s_suppkey)
              JOIN part ON l_partkey = p_partkey
              WHERE rn = 1 ORDER BY p_partkey""")),

    // ---- SQL-text surface for the TPC-H tranche ---------------------------
    // The raw-SQL client path (a3, widened): the ONE query string that
    // DuckDB executes as the oracle is handed verbatim to `spark.sql` over
    // the registered views — proving a SQL-only consumer runs the TPC-H
    // tranche with zero translation. Catalyst plans the text identically
    // to the DataFrame form (same pushdown/broadcast/TakeOrdered shapes);
    // QueriesSpec pins m1_sql ≡ m1 / m6_sql ≡ m6 row-for-row.
    Q("m1_sql",
      (s, d) => { Tables.registerAllViews(s, d); s.sql(M1Sql) },
      Some(M1Sql)),

    Q("m2_sql",
      (s, d) => { Tables.registerAllViews(s, d); s.sql(M2Sql) },
      Some(M2Sql)),

    Q("m6_sql",
      (s, d) => { Tables.registerAllViews(s, d); s.sql(M6Sql) },
      Some(M6Sql))
  )
}
