package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Second tranche of composite TPC-H-shape workloads (SURVEY §2.M), covering
  * the plan shapes the first tranche (m1–m9) does not: outer-join-driven
  * distribution (Q13), count-distinct with an anti-joined exclusion list
  * (Q16), correlated-average gating (Q17), disjunctive multi-column
  * predicates (Q19), scalar-average threshold + anti join (Q22), symmetric
  * nation-pair volume (Q7), argmax-by-scalar-subquery (Q15), aggregate-driven
  * semi join (Q20), multi-dim profit rollup (Q9), and a global-share
  * threshold (Q11). Adaptations to this generator's columns (no
  * partsupp/comment/phone/shipmode) are noted per query; the plan shape —
  * what actually matters at 100 TB — is preserved.
  *
  * Scale notes shared by the tranche: every dimension side is explicitly
  * `broadcast()`; the lone fact-fact shuffle (lineitem⋈orders where present)
  * is the only wide exchange; scalar-subquery thresholds are 1-row broadcast
  * cross joins, never driver-side collects.
  */
object Workloads2 {

  val queries: Seq[Q] = Seq(
    // TPC-H Q13 (customer order distribution): LEFT join with a join-side
    // filter (the comment NOT LIKE analogue is an o_orderpriority exclusion
    // — it must sit IN the join condition, not a WHERE, to keep orderless
    // customers). First agg groups on the join key itself, so the SMJ
    // output's hash partitioning is reused — one shuffle serves join+agg;
    // the second agg is over ≤|distinct counts| rows, negligible.
    Q("m10_tpch_q13",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderpriority") =!= "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc),
      Some("""SELECT c_count, count(*) AS custdist FROM (
                SELECT c_custkey, count(o_orderkey) AS c_count
                FROM customer LEFT JOIN orders
                  ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
                GROUP BY c_custkey)
              GROUP BY c_count ORDER BY custdist DESC, c_count DESC""")),

    // TPC-H Q16 (parts/supplier relationship): the part↔supplier relation is
    // reconstructed from observed shipments (no partsupp in this generator);
    // the "complaint" supplier exclusion is a broadcast LEFT ANTI join on
    // the negative-balance suppliers. count(DISTINCT supplier) per part
    // descriptor expands then de-dups in one partial/final pass.
    Q("m11_tpch_q16",
      (s, d) => Tables.lineitem(s, d)
        .select("l_partkey", "l_suppkey").distinct()
        .join(broadcast(Tables.part(s, d)
          .filter(col("p_brand") =!= "Brand#1" &&
            col("p_size").isin(1, 4, 9, 16, 25, 36, 49))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, d).filter(col("s_acctbal") < 0)),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size")),
      Some("""SELECT p_brand, p_size,
                     CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
              FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
              JOIN part ON p_partkey = l_partkey
              WHERE p_brand <> 'Brand#1' AND p_size IN (1,4,9,16,25,36,49)
                AND l_suppkey NOT IN
                  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
              GROUP BY p_brand, p_size
              ORDER BY supplier_cnt DESC, p_brand, p_size""")),

    // TPC-H Q17 (small-quantity-order revenue): the correlated per-part
    // average is a whole-partition window over the already-joined rows (the
    // brand filter is on part attributes only, so every lineitem row of a
    // qualifying part survives the join — the window average equals the
    // correlated subquery exactly, without a second scan of lineitem).
    // l_quantity is integer-valued, so avg() is exact in both engines and
    // the 0.2× threshold cannot knife-edge.
    Q("m12_tpch_q17",
      (s, d) => Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
          .filter(col("p_brand") === "Brand#23")),
          col("l_partkey") === col("p_partkey"))
        .withColumn("avg_qty",
          avg(col("l_quantity")).over(Window.partitionBy("l_partkey")))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(sum(Q.cents(col("l_extendedprice"))).as("rev_cents"),
          count(lit(1)).as("n_small")),
      Some("""WITH j AS (
                SELECT l_quantity, l_extendedprice,
                       avg(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
                FROM lineitem JOIN part ON p_partkey = l_partkey
                WHERE p_brand = 'Brand#23')
              SELECT CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT))
                       AS BIGINT) AS rev_cents,
                     count(*) AS n_small
              FROM j WHERE l_quantity < 0.2 * avg_qty""")),

    // TPC-H Q19 (discounted revenue, disjunctive predicates): three
    // OR-branches each constraining both sides of the join. Catalyst
    // extracts the per-side common disjunctions (brand∈{...} to the part
    // scan, quantity ≤ 30 to the lineitem scan) so both scans prune before
    // the broadcast join; the residual OR evaluates post-join.
    Q("m13_tpch_q19",
      (s, d) => Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)),
          col("l_partkey") === col("p_partkey") && (
            (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
              col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#24" && col("p_size").between(1, 15) &&
              col("l_quantity").between(20, 30))))
        .agg(sum(Q.cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("rev_cents"),
          count(lit(1)).as("n_lines")),
      Some("""SELECT CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100)
                       AS BIGINT)) AS BIGINT) AS rev_cents,
                     count(*) AS n_lines
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                       AND l_quantity BETWEEN 1 AND 11)
                 OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                       AND l_quantity BETWEEN 10 AND 20)
                 OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
                       AND l_quantity BETWEEN 20 AND 30)""")),

    // TPC-H Q22 (global sales opportunity): customers above the positive-
    // balance average with no orders, grouped by nation (the phone-prefix
    // country code analogue). The average is computed over integer cents
    // (exact sum, single IEEE division — identical across engines) and
    // joins in as a 1-row broadcast; the "no orders" gate is a LEFT ANTI
    // join that shuffles only the key column.
    Q("m14_tpch_q22",
      (s, d) => {
        val cust = Tables.customer(s, d)
          .withColumn("bal_cents", Q.cents(col("c_acctbal")))
        val avgPos = cust.filter(col("c_acctbal") > 0)
          .agg(avg(col("bal_cents")).as("avg_cents"))
        cust.crossJoin(broadcast(avgPos))
          .filter(col("bal_cents") > col("avg_cents"))
          .join(Tables.orders(s, d),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("numcust"),
            sum(col("bal_cents")).as("totacctbal_cents"))
          .orderBy("c_nationkey")
      },
      Some("""SELECT c_nationkey, count(*) AS numcust,
                     CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT)
                       AS totacctbal_cents
              FROM customer
              WHERE CAST(round(c_acctbal*100) AS BIGINT) >
                      (SELECT avg(CAST(round(c_acctbal*100) AS BIGINT))
                       FROM customer WHERE c_acctbal > 0)
                AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
              GROUP BY c_nationkey ORDER BY c_nationkey""")),

    // TPC-H Q7 (volume shipping between two nations): both directions of the
    // NATION_1↔NATION_2 pair. The nation filter lands on the 25-row dims
    // FIRST, shrinking supplier and customer to ~2/25 before they broadcast
    // into the facts — the lineitem⋈orders shuffle is again the only wide
    // exchange, and it runs on pre-filtered orders (customer side applied
    // before the fact-fact join).
    Q("m15_tpch_q7",
      (s, d) => {
        val pair = Seq("NATION_1", "NATION_2")
        val n1 = Tables.nation(s, d).filter(col("n_name").isin(pair: _*))
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        val n2 = Tables.nation(s, d).filter(col("n_name").isin(pair: _*))
          .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
        val supp = Tables.supplier(s, d)
          .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        val cust = Tables.customer(s, d)
          .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d)
            .join(broadcast(cust), col("o_custkey") === col("c_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .filter(
            (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
            (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast(LongType).as("l_year"))
          .agg(sum(Q.cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("rev_cents"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                     year(l_shipdate) AS l_year,
                     CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100)
                       AS BIGINT)) AS BIGINT) AS rev_cents
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
              WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                 OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
              GROUP BY supp_nation, cust_nation, l_year
              ORDER BY supp_nation, cust_nation, l_year""")),

    // TPC-H Q15 (top supplier): the max-revenue scalar subquery re-reads the
    // same grouped aggregate — expressed once, lineage-truncated (the join's
    // isnotnull pushdown makes the two branches canonically different, so
    // AQE exchange reuse does NOT collapse the diamond and the lineitem
    // scan+shuffle would run twice), and joined against its own 1-row max
    // (broadcast). The materialized aggregate is one row per supplier —
    // the cheapest node in the query. Integer cents make the = max()
    // equality exact.
    Q("m16_tpch_q15",
      (s, d) => {
        val rev = Q.truncateLineage(Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .groupBy("l_suppkey")
          .agg(sum(Q.cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("total_cents")))
        rev.crossJoin(broadcast(rev.agg(max(col("total_cents")).as("max_cents"))))
          .filter(col("total_cents") === col("max_cents"))
          .join(broadcast(Tables.supplier(s, d)),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_cents"))
          .orderBy("s_suppkey")
      },
      Some("""WITH rev AS (
                SELECT l_suppkey,
                       CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100)
                         AS BIGINT)) AS BIGINT) AS total_cents
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1996-04-01'
                GROUP BY l_suppkey)
              SELECT s_suppkey, s_name, total_cents
              FROM supplier JOIN rev ON s_suppkey = l_suppkey
              WHERE total_cents = (SELECT max(total_cents) FROM rev)
              ORDER BY s_suppkey""")),

    // TPC-H Q20 (excess-inventory suppliers), adapted: suppliers that
    // shipped > 2500 total units of 'small%' parts (the availqty > ½·qty
    // analogue). The inner aggregate drives a LEFT SEMI join against the
    // 100-row supplier dim — the expensive side collapses to qualifying
    // keys before touching supplier.
    Q("m17_tpch_q20",
      (s, d) => {
        val qual = Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)
            .filter(col("p_name").startsWith("small"))),
            col("l_partkey") === col("p_partkey"))
          .groupBy("l_suppkey")
          .agg(sum(col("l_quantity")).as("qty"))
          .filter(col("qty") > 2500)
        Tables.supplier(s, d)
          .join(qual, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select("s_suppkey", "s_name")
          .orderBy("s_suppkey")
      },
      Some("""SELECT s_suppkey, s_name FROM supplier
              WHERE s_suppkey IN (
                SELECT l_suppkey FROM lineitem
                JOIN part ON l_partkey = p_partkey
                WHERE p_name LIKE 'small%'
                GROUP BY l_suppkey HAVING sum(l_quantity) > 2500)
              ORDER BY s_suppkey""")),

    // TPC-H Q9 (product-type profit), adapted: supply cost proxied by
    // p_retailprice per unit (no partsupp). Profit stays in exact integer
    // cents — the per-unit cost multiplies a cast-to-long quantity, never a
    // double. Two broadcast dims + the one fact-fact shuffle; grouped by
    // supplier nation × order year.
    Q("m18_tpch_q9",
      (s, d) => Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
          .filter(col("p_name").contains("red"))),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"),
          year(col("o_orderdate")).cast(LongType).as("o_year"))
        .agg(sum(
          Q.cents(col("l_extendedprice") * (lit(1) - col("l_discount"))) -
            col("l_quantity").cast(LongType) * Q.cents(col("p_retailprice")))
          .as("profit_cents"))
        .orderBy("n_name", "o_year"),
      Some("""SELECT n_name, year(o_orderdate) AS o_year,
                     CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100)
                         AS BIGINT)
                       - CAST(l_quantity AS BIGINT)
                         * CAST(round(p_retailprice*100) AS BIGINT))
                       AS BIGINT) AS profit_cents
              FROM lineitem
              JOIN part ON l_partkey = p_partkey
              JOIN orders ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              WHERE p_name LIKE '%red%'
              GROUP BY n_name, o_year ORDER BY n_name, o_year""")),

    // TPC-H Q11 (important stock), adapted: per-part shipped value with a
    // global-share threshold (value > Σvalue / 2000). The global total is
    // the second-level reduction of the same per-part aggregate, which is
    // lineage-truncated first — AQE cannot dedupe the two branches (the
    // cross-join side carries no isnotnull pushdown, so their canonical
    // plans differ) and the fact scan would otherwise run twice. The
    // materialized aggregate is one row per part; the total rejoins as a
    // 1-row broadcast. All-integer compare: exact on both engines even
    // though ~half the uniform parts sit near the threshold. The share
    // predicate is multiplied through (value·2000 > Σvalue ⟺
    // value > Σvalue div 2000 for nonnegative integers) so BOTH engines
    // compare pure integers with no division of any kind — a floor of a
    // double quotient would knife-edge once Σcents passes ~2^52 (double
    // ulp > 1/2000), and DuckDB's // is not Spark-parsable; the product
    // stays far from BIGINT overflow (per-part cents × 2000 « 2^63).
    Q("m19_tpch_q11",
      (s, d) => {
        val perPart = Q.truncateLineage(Tables.lineitem(s, d)
          .groupBy("l_partkey")
          .agg(sum(Q.cents(col("l_extendedprice"))).as("value_cents")))
        perPart
          .crossJoin(broadcast(
            perPart.agg(sum(col("value_cents")).as("total_cents"))))
          .filter(col("value_cents") * 2000 > col("total_cents"))
          .select("l_partkey", "value_cents")
          .orderBy(col("value_cents").desc, col("l_partkey"))
      },
      Some("""SELECT l_partkey,
                     CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT))
                       AS BIGINT) AS value_cents
              FROM lineitem GROUP BY l_partkey
              HAVING value_cents * 2000 >
                (SELECT SUM(CAST(round(l_extendedprice*100) AS BIGINT))
                 FROM lineitem)
              ORDER BY value_cents DESC, l_partkey""")),

    // TPC-H Q21 (suppliers who kept orders waiting), adapted: no
    // receipt/commit dates in this generator, so "late" = shipped more
    // than 90 days after the order date. A NATION_3 supplier is charged
    // with an order iff the order has ≥2 distinct suppliers, exactly one
    // distinct LATE supplier, and it is that one — the classic
    // EXISTS/NOT-EXISTS double correlation, which textbook plans answer
    // with TWO lineitem self-joins. Here lineitem is scanned ONCE
    // (plan-test-pinned): the fact⋈orders hash partitioning on the order
    // key satisfies the (l_orderkey, l_suppkey) per-supplier aggregate
    // (subset clustering) AND the per-order window that derives
    // (n_supp, n_late) — no diamond reuse, no second scan, no extra
    // exchange. Supplier dim broadcasts; top-20 is TakeOrderedAndProject.
    // Integer counts end to end.
    Q("m20_tpch_q21",
      (s, d) => {
        val perSupp = Tables.lineitem(s, d)
          .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .withColumn("late",
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY"))
          .groupBy("l_orderkey", "l_suppkey")
          .agg(max(col("late")).as("late"))
        val w = Window.partitionBy("l_orderkey")
        perSupp
          .withColumn("n_supp", count(lit(1)).over(w))
          .withColumn("n_late",
            sum(when(col("late"), 1L).otherwise(0L)).over(w))
          .filter(col("late") && col("n_supp") >= 2 && col("n_late") === 1)
          .join(broadcast(Tables.supplier(s, d)
            .join(broadcast(Tables.nation(s, d)
              .filter(col("n_name") === "NATION_3")),
              col("s_nationkey") === col("n_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy("s_name")
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(20)
      },
      Some("""WITH li AS (
                SELECT l_orderkey, l_suppkey,
                       (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
              stats AS (
                SELECT l_orderkey,
                       COUNT(DISTINCT l_suppkey) AS n_supp,
                       COUNT(DISTINCT CASE WHEN late THEN l_suppkey END)
                         AS n_late
                FROM li GROUP BY l_orderkey
                HAVING n_supp >= 2 AND n_late = 1),
              lateline AS (
                SELECT DISTINCT l_orderkey, l_suppkey FROM li WHERE late)
              SELECT s_name, COUNT(*) AS numwait
              FROM lateline
              JOIN stats USING (l_orderkey)
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              WHERE n_name = 'NATION_3'
              GROUP BY s_name
              ORDER BY numwait DESC, s_name LIMIT 20""")),

    // TPC-H Q8 (national market share): NATION_5's share of PROMO-part
    // revenue among ASIA-region customers, per order year. Plan shape:
    // part is filtered THEN broadcast (the filter collapses it to ~1/6),
    // customer→nation→region prune to the ASIA fifth before broadcasting,
    // supplier+its nation broadcast for the numerator tag — the single
    // wide exchange is again lineitem⋈orders. The share is a ratio of two
    // exact integer-cents sums per year: one IEEE division then a 6-dp
    // round, knife-edge-free across engines.
    Q("m21_tpch_q8",
      (s, d) => {
        val asiaCust = Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d)
            .filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select("c_custkey")
        val suppNat = Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)
            .withColumnRenamed("n_name", "supp_nation")),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "supp_nation")
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)
            .filter(col("p_type") === "PROMO")),
            col("l_partkey") === col("p_partkey"))
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(
            sum(when(col("supp_nation") === "NATION_5",
              Q.cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
              .otherwise(0L)).as("nation_cents"),
            sum(Q.cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
              .as("total_cents"))
          .select(col("o_year"),
            col("nation_cents"), col("total_cents"),
            round(col("nation_cents").cast("double") / col("total_cents"), 6)
              .as("mkt_share"))
          .orderBy("o_year")
      },
      Some("""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                     CAST(SUM(CASE WHEN sn.n_name = 'NATION_5' THEN
                       CAST(round(l_extendedprice*(1-l_discount)*100)
                         AS BIGINT) ELSE 0 END) AS BIGINT) AS nation_cents,
                     CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100)
                       AS BIGINT)) AS BIGINT) AS total_cents,
                     round(CAST(SUM(CASE WHEN sn.n_name = 'NATION_5' THEN
                         CAST(round(l_extendedprice*(1-l_discount)*100)
                           AS BIGINT) ELSE 0 END) AS DOUBLE)
                       / SUM(CAST(round(l_extendedprice*(1-l_discount)*100)
                           AS BIGINT)), 6) AS mkt_share
              FROM lineitem
              JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation cn ON c_nationkey = cn.n_nationkey
              JOIN region ON cn.n_regionkey = r_regionkey
                AND r_name = 'ASIA'
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation sn ON s_nationkey = sn.n_nationkey
              GROUP BY 1 ORDER BY o_year"""))
  )
}
