package graft.queries

import graft.{Q, Tables}
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
      Some("""SELECT l_orderkey,
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
              ORDER BY rev_cents DESC, l_orderkey LIMIT 10""")),

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
      Some("""SELECT n_name,
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
              GROUP BY n_name ORDER BY rev_cents DESC, n_name""")),

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
                AND l_quantity < 24"""))
  )
}
