package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY §2 category C — the join surface.
  *
  * Scale notes (100 TB): dimension tables (region/nation/supplier/part at
  * TPC-H ratios) are always broadcast — `broadcast()` hints pin the plan so
  * a stats misestimate can never demote them to a shuffle. Fact-fact joins
  * (lineitem⋈orders) shuffle on the join key and rely on AQE for skew
  * splitting. The as-of join is expressed as equi-join + per-key window so
  * it partitions by the equi key — no cross product, scales linearly in
  * matched pairs.
  */
object Joins {

  val queries: Seq[Q] = Seq(
    Q("c1_join_bhj",
      (s, d) => Tables.lineitem(s, d)
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(
          sum(Q.cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("revenue_cents"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name"),
      Some("""SELECT n_name,
                     CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100)
                       AS BIGINT)) AS BIGINT) AS revenue_cents,
                     COUNT(*) AS n_items
              FROM lineitem
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              GROUP BY n_name ORDER BY n_name""")),

    Q("c2_join_smj",
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
          round(sum("l_quantity"), 1).as("sum_qty"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, COUNT(*) AS n_lines,
                     round(SUM(l_quantity), 1) AS sum_qty
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    Q("c3_join_outer",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"),
          "left")
        .groupBy("c_custkey", "c_name")
        .agg(count(col("o_orderkey")).as("n_orders"),
          sum(Q.cents(coalesce(col("o_totalprice"), lit(0.0))))
            .as("spend_cents"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
                     CAST(SUM(CAST(round(COALESCE(o_totalprice, 0)*100)
                       AS BIGINT)) AS BIGINT) AS spend_cents
              FROM customer LEFT JOIN orders ON c_custkey = o_custkey
              GROUP BY c_custkey, c_name ORDER BY c_custkey""")),

    Q("c4_join_semi_anti",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), lit("has_orders").as("tag"))
        val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), lit("no_orders").as("tag"))
        semi.unionByName(anti).orderBy("tag", "c_custkey")
      },
      Some("""SELECT c_custkey, 'has_orders' AS tag FROM customer
              WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
              UNION ALL
              SELECT c_custkey, 'no_orders' AS tag FROM customer
              WHERE NOT EXISTS
                (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
              ORDER BY tag, c_custkey""")),

    // Theta/band join: equi key carries the shuffle, the range predicate is a
    // cheap post-join residual — never a cross product.
    Q("c5_join_theta_range",
      (s, d) => Tables.part(s, d)
        .join(Tables.lineitem(s, d),
          col("p_partkey") === col("l_partkey") &&
            col("l_extendedprice").between(
              col("p_retailprice") * 0.9, col("p_retailprice") * 1.1))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_matches"),
          round(avg("l_quantity"), 4).as("avg_qty"))
        .orderBy("p_brand"),
      Some("""SELECT p_brand, COUNT(*) AS n_matches,
                     round(AVG(l_quantity), 4) AS avg_qty
              FROM part JOIN lineitem
                ON p_partkey = l_partkey
               AND l_extendedprice BETWEEN p_retailprice*0.9
                                       AND p_retailprice*1.1
              GROUP BY p_brand ORDER BY p_brand""")),

    // As-of join (events self-join): for every purchase, the latest click by
    // the same user at-or-before the purchase. Equi-join on user_id +
    // row_number over (purchase, click-ts desc) — the standard Spark-native
    // as-of formulation.
    Q("c6_join_asof",
      (s, d) => {
        val ev = Tables.events(s, d)
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
            col("ts").as("p_ts"))
        val c = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
            col("ts").as("c_ts"))
        val w = Window.partitionBy("p_id")
          .orderBy(col("c_ts").desc, col("c_id").desc)
        p.join(c, col("p_user") === col("c_user") && col("c_ts") <= col("p_ts"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select("p_id", "p_user", "p_ts", "c_id", "c_ts")
          .orderBy("p_id")
      },
      Some("""SELECT p_id, p_user, p_ts, c_id, c_ts FROM (
                SELECT p.event_id AS p_id, p.user_id AS p_user, p.ts AS p_ts,
                       c.event_id AS c_id, c.ts AS c_ts,
                       row_number() OVER (PARTITION BY p.event_id
                         ORDER BY c.ts DESC, c.event_id DESC) AS rk
                FROM events p JOIN events c
                  ON p.user_id = c.user_id AND c.ts <= p.ts
                WHERE p.event_type = 'purchase' AND c.event_type = 'click')
              WHERE rk = 1 ORDER BY p_id""")),

    Q("c7_join_cross",
      (s, d) => Tables.region(s, d)
        .crossJoin(Tables.nation(s, d))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name"),
      Some("""SELECT r_name, n_name FROM region CROSS JOIN nation
              ORDER BY r_name, n_name""")),

    // Pure non-equi band join (no equi key at all) — the one join shape that
    // plans as BroadcastNestedLoopJoin: each order lands in the 100k-wide
    // price band derived from the 5-row region table (top band open-ended,
    // so the bands partition [0, ∞) and every order matches exactly once).
    // Scale note: BNLJ is only sane with a tiny broadcast side like this; a
    // large banded dimension would instead be rewritten as an equi-join on
    // a computed band key (floor(price/width)), which IS the c1 shape.
    Q("c8_join_bnl_band",
      (s, d) => Tables.orders(s, d)
        .join(broadcast(Tables.region(s, d)),
          col("o_totalprice") >= col("r_regionkey") * 100000.0 &&
            (col("o_totalprice") < (col("r_regionkey") + 1) * 100000.0 ||
              col("r_regionkey") === 4))
        .select(col("o_orderkey"),
          col("r_regionkey").cast("long").as("price_tier"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
                     CAST(r_regionkey AS BIGINT) AS price_tier
              FROM orders JOIN region
                ON o_totalprice >= r_regionkey * 100000.0
               AND (o_totalprice < (r_regionkey + 1) * 100000.0
                    OR r_regionkey = 4)
              ORDER BY o_orderkey""")),

    // Salted skew join: the manual skew-mitigation pattern for when one join
    // key dominates a shuffle (a hot orderkey at 100 TB would put its whole
    // payload in one task). Fact side gets a deterministic salt in [0, 4)
    // derived from a non-key column; the other side is replicated once per
    // salt value; the join key becomes (key, salt), spreading a hot key over
    // 4 tasks. Each fact row matches exactly the one replica carrying its
    // salt, so the result provably equals the unsalted join — which is what
    // the oracle checks. At cluster scale AQE's skew-join split does this
    // adaptively (only for skewed partitions); the manual form is for
    // engines/paths where AQE can't see the skew (e.g. streaming-static).
    Q("c9_join_skew_salted",
      (s, d) => {
        // reuse the repo's canonical salted-join helper (same-named join key
        // required, so both sides rename theirs to "jk"; the key itself is
        // not in the output)
        val fact = Tables.lineitem(s, d)
          .withColumnRenamed("l_orderkey", "jk")
        val dim = Tables.orders(s, d)
          .withColumnRenamed("o_orderkey", "jk")
        graft.layout.Layout.saltedJoin(
            fact, dim, "jk",
            probeSaltExpr = pmod(col("l_linenumber"), lit(4)), nSalts = 4)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_lines"),
            sum(Q.cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
              .as("rev_cents"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n_lines,
                     CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100)
                       AS BIGINT)) AS BIGINT) AS rev_cents
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // Binned range join (round 14): a pure time-range join with NO equi key —
    // per order, the global shipment activity (count + quantity of ALL
    // lineitems, any order) in the 7 days from its order date. Written
    // naively ("l_shipdate BETWEEN o_orderdate AND +7d") Spark can only plan
    // a BroadcastNestedLoopJoin — O(n·m) predicate evaluations, the classic
    // 100 TB scale-killer (c8 is the sanctioned tiny-side demo of that
    // plan). TWO rewrites compose here, and both are load-bearing:
    //
    //  1. EAGER AGGREGATION: the aggregate only reads (l_day, l_quantity),
    //     and count/sum are decomposable — so lineitem collapses to ONE
    //     partial row per day (≤ 2500 here) BEFORE the join. Without this
    //     the join materializes every (order, lineitem) match — ~250M rows
    //     at sf0.1, measured 56 s in the sweep; with it the join touches
    //     orders × ≤7 day-partials (~1M) and the same query runs in ~2 s.
    //     At 100 TB this is THE difference: join volume is bounded by
    //     |orders|·window, independent of lineitem count.
    //  2. BIN EQUI-JOIN (what BinnedRangeJoinRule automates for the raw
    //     shape): quantize to 7-day bins, explode each order to the ≤2 bins
    //     its window can touch (window length = bin width ⇒ never more),
    //     equi-join on the bin, exact interval predicate as residual. Each
    //     day-partial has exactly ONE bin, so no match can duplicate.
    //
    // Final per-order totals are sums of per-day partials: count = Σ day
    // counts (exact integers), quantity = Σ day sums (integer-valued
    // doubles, ≤7 addends — order-insensitive, SURVEY §5.3). The oracle is
    // the NAIVE range join (DuckDB plans it as an IEJoin), so the hash
    // match proves BOTH rewrites exact, bins and partials included. Both
    // engines compare naive TIMESTAMP values day-quantized via an integer
    // day index (UTC session, wall-clock dates identical by [E10]).
    Q("c10_join_range_binned",
      (s, d) => {
        val W = 7 // bin width = window length, right-open [o_day, o_day + 7)
        val epoch = lit("1995-01-01").cast("date")
        val o = Tables.orders(s, d).select(
          col("o_orderkey"),
          datediff(col("o_orderdate").cast("date"), epoch).as("o_day"))
        // NOT spread: measured 2.12→3.47 s with the parallelism floor —
        // the per-day partial aggregate collapses 600k rows to ~2.5k
        // in-task, so the extra exchange moves more than it parallelizes
        val lByDay = Tables.lineitem(s, d)
          .select(datediff(col("l_shipdate").cast("date"), epoch)
            .as("l_day"), col("l_quantity"))
          .groupBy("l_day")
          .agg(count(lit(1)).as("day_n"), sum("l_quantity").as("day_qty"))
        val oBins = o.withColumn("bin",
          explode(sequence(floor(col("o_day") / W),
            floor((col("o_day") + (W - 1)) / W))))
        val lBins = lByDay.withColumn("bin", floor(col("l_day") / W))
        oBins.join(lBins, Seq("bin"))
          .where(col("l_day") >= col("o_day") &&
            col("l_day") < col("o_day") + W)
          .groupBy("o_orderkey")
          .agg(sum("day_n").as("n_ship"),
            round(sum("day_qty"), 1).as("ship_qty"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, COUNT(*) AS n_ship,
                     round(SUM(l_quantity), 1) AS ship_qty
              FROM orders JOIN lineitem
                ON l_shipdate >= o_orderdate
               AND l_shipdate < o_orderdate + INTERVAL 7 DAY
              GROUP BY o_orderkey ORDER BY o_orderkey""")),

    // Bloom semi-join reduction (round 14): the explicit runtime-filter
    // pattern. A semi-join of a 100 TB fact table against a mid-query
    // FILTERED dimension (high-value orders) normally shuffles EVERY fact
    // row to the join — including the ~96% that can't match. Build a Bloom
    // filter over the dim keys instead (mergeable Aggregator: fixed 16 KiB
    // per partition OR-merged, driver state bounded by construction — the
    // IVF-codebook exception), ship it back as a BinaryType literal inside
    // the codegen'd `graft_bloom_maybe` probe, and the fact scan drops
    // non-candidates BEFORE the exchange: shuffle volume falls from |fact|
    // to |matches| + the FP trickle. No false negatives is the Bloom law
    // (spec-pinned), so the exact semi-join after the prefilter returns
    // precisely the unfiltered result — which is what the oracle's plain
    // EXISTS checks. Spark's AQE does this automatically where it can
    // (InjectRuntimeFilter); the explicit form covers mid-query dims and
    // streaming-static prefilters AQE can't see.
    Q("c11_join_bloom_reduced",
      (s, d) => {
        import s.implicits._
        graft.functions.BloomMightContain.register(s)
        val hot = Tables.orders(s, d)
          .filter(col("o_totalprice") > 480000.0)
          .select(col("o_orderkey"))
        val bits: Array[Byte] = hot.as[Long]
          .select(new graft.functions.BloomAggregator[Long](identity)
            .toColumn).head()
        Tables.lineitem(s, d)
          .where(call_function("graft_bloom_maybe",
            col("l_orderkey"), lit(bits),
            lit(graft.functions.Bloom.DefaultHashes)))
          .join(hot, col("l_orderkey") === col("o_orderkey"), "left_semi")
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_lines"),
            sum(Q.cents(col("l_extendedprice"))).as("price_cents"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n_lines,
                     CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT))
                       AS BIGINT) AS price_cents
              FROM lineitem
              WHERE EXISTS (SELECT 1 FROM orders
                            WHERE o_orderkey = l_orderkey
                              AND o_totalprice > 480000.0)
              GROUP BY l_returnflag ORDER BY l_returnflag"""))
  )
}
