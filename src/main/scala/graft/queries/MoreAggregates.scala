package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Inventory extension (SURVEY §2 D/E continued): exact quantiles,
  * statistical aggregates, ordered string aggregation, positional window
  * values, and FILTER-style conditional aggregates — the remaining
  * aggregate-function families a consumer of an analytics engine expects.
  */
object MoreAggregates {

  val queries: Seq[Q] = Seq(
    // Exact interpolated percentiles (DuckDB quantile_cont uses the same
    // p*(n-1) linear interpolation over the sorted multiset; identical
    // doubles, rounded anyway). The sketch-based variant of this family is
    // d3's HLL (approx_percentile shares its no-oracle rationale).
    // Quartiles projected to one scalar column each: the driver's compare
    // harness cannot sort array-valued output (round-1 ADVICE), and the
    // multi-quantile array form is still exercised by computing all three
    // from a single percentile(..., array(...)) pass.
    Q("d8_percentiles",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(expr("percentile(o_totalprice, array(0.25D, 0.5D, 0.75D))")
          .as("qs"),
          count(lit(1)).as("n"))
        .select(col("o_orderstatus"),
          round(element_at(col("qs"), 1), 2).as("p25"),
          round(element_at(col("qs"), 2), 2).as("p50"),
          round(element_at(col("qs"), 3), 2).as("p75"),
          col("n"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus,
                     round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
                     round(quantile_cont(o_totalprice, 0.50), 2) AS p50,
                     round(quantile_cont(o_totalprice, 0.75), 2) AS p75,
                     COUNT(*) AS n
              FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Sketch-family quantiles (KLL-style): approx_percentile shares d3's
    // no-oracle rationale — the sketch differs from DuckDB's — so the
    // driver records a rows-only check and QueriesSpec asserts the
    // approximation against the exact d8 quartiles. At 100 TB this is THE
    // quantile path: mergeable fixed-size sketches, no global sort.
    Q("d13_approx_percentile",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(expr(
          "approx_percentile(o_totalprice, array(0.25D, 0.5D, 0.75D), 10000)")
          .as("qs"),
          count(lit(1)).as("n"))
        .select(col("o_orderstatus"),
          round(element_at(col("qs"), 1), 2).as("ap25"),
          round(element_at(col("qs"), 2), 2).as("ap50"),
          round(element_at(col("qs"), 3), 2).as("ap75"),
          col("n"))
        .orderBy("o_orderstatus"),
      None),

    // Pearson correlation / sample covariance / stddev / variance — both
    // engines accumulate co-moments; low bits differ, so round.
    Q("d9_stats_agg",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 6)
          .as("qty_price_corr"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2)
            .as("qty_price_covar"),
          round(stddev_samp(col("l_extendedprice")), 2).as("price_sd"),
          round(var_samp(col("l_quantity")), 4).as("qty_var"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
                     round(corr(l_quantity, l_extendedprice), 6)
                       AS qty_price_corr,
                     round(covar_samp(l_quantity, l_extendedprice), 2)
                       AS qty_price_covar,
                     round(stddev_samp(l_extendedprice), 2) AS price_sd,
                     round(var_samp(l_quantity), 4) AS qty_var
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Ordered string aggregation — sort before concatenation (collect_list
    // order is nondeterministic, §5.3 rule 5).
    Q("d10_string_agg",
      (s, d) => Tables.events(s, d)
        .groupBy("user_id")
        .agg(concat_ws(",", sort_array(collect_list(col("event_type"))))
          .as("types_csv"))
        .orderBy("user_id"),
      Some("""SELECT user_id,
                     string_agg(event_type, ',' ORDER BY event_type)
                       AS types_csv
              FROM events GROUP BY user_id ORDER BY user_id""")),

    // FILTER-style conditional aggregates.
    Q("d11_filtered_agg",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(count_if(col("o_orderstatus") === "F").as("n_finished"),
          bool_or(col("o_orderstatus") === "O").as("any_open"),
          bool_and(col("o_totalprice") > 0).as("all_priced"),
          sum(when(col("o_orderstatus") === "F",
            Q.cents(col("o_totalprice")))).as("finished_cents"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
                     COUNT(*) FILTER (WHERE o_orderstatus = 'F')
                       AS n_finished,
                     bool_or(o_orderstatus = 'O') AS any_open,
                     bool_and(o_totalprice > 0) AS all_priced,
                     CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT))
                       FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
                       AS finished_cents
              FROM orders GROUP BY o_orderpriority
              ORDER BY o_orderpriority""")),

    // Explicit GROUPING SETS (the general form rollup/cube specialize).
    // Absent grouping columns come back NULL in both engines; the ORDER BY
    // pins NULLS FIRST because Spark and DuckDB default null ordering
    // differently (ASC: Spark NULLS FIRST, DuckDB NULLS LAST).
    Q("d12_grouping_sets",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders")
        s.sql("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
                        CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT))
                          AS BIGINT) AS cents
                 FROM orders
                 GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                   ())
                 ORDER BY o_orderstatus NULLS FIRST,
                          o_orderpriority NULLS FIRST""")
      },
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
                     CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT))
                       AS BIGINT) AS cents
              FROM orders
              GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
              ORDER BY o_orderstatus NULLS FIRST,
                       o_orderpriority NULLS FIRST""")),

    // Positional window values over an explicit full-partition frame (both
    // engines default last_value to the growing frame — pin it).
    Q("e6_first_last_nth",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            first(col("o_orderkey")).over(w).as("top_order"),
            last(col("o_orderkey")).over(w).as("bottom_order"),
            nth_value(col("o_orderkey"), 2).over(w).as("second_order"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
                     first_value(o_orderkey) OVER w AS top_order,
                     last_value(o_orderkey) OVER w AS bottom_order,
                     nth_value(o_orderkey, 2) OVER w AS second_order
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
              ORDER BY o_orderkey""")),

    // Arg-max/arg-min aggregates (Spark max_by/min_by ≡ DuckDB arg_max/
    // arg_min): the per-group "which row wins" primitive that avoids a
    // window + filter pass. Ties on o_totalprice are broken by folding the
    // unique o_orderkey into the ordering value — cents × 2³² + key, which
    // is injective for keys < 2³² and stays exact in int64 (cents ≤ ~5e7
    // here, 5e7 × 2³² ≈ 2.1e17 < 2⁶³) — because both engines pick an
    // arbitrary row on bare ties.
    Q("d14_argmax",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(
          expr("""max_by(o_orderkey,
                 CAST(round(o_totalprice*100) AS BIGINT) * 4294967296
                   + o_orderkey)""").as("best_order"),
          max(Q.cents(col("o_totalprice"))).as("best_cents"),
          expr("""min_by(o_orderkey,
                 CAST(round(o_totalprice*100) AS BIGINT) * 4294967296
                   + o_orderkey)""").as("worst_order"))
        .orderBy("o_custkey"),
      Some("""SELECT o_custkey,
                     arg_max(o_orderkey,
                       CAST(round(o_totalprice*100) AS BIGINT) * 4294967296
                         + o_orderkey) AS best_order,
                     CAST(max(CAST(round(o_totalprice*100) AS BIGINT))
                       AS BIGINT) AS best_cents,
                     arg_min(o_orderkey,
                       CAST(round(o_totalprice*100) AS BIGINT) * 4294967296
                         + o_orderkey) AS worst_order
              FROM orders GROUP BY o_custkey ORDER BY o_custkey""")),

    // Mode (most frequent value) per group — built from count + rank rather
    // than the engines' mode() functions, whose tie choice is arbitrary and
    // engine-specific. Ties break to the lexicographically smallest type,
    // making the answer total. The explicit repartition on user_id makes the
    // chain single-shuffle: HashPartitioning(user_id) satisfies BOTH the
    // (user_id, event_type) aggregation's clustering (subset partitioning
    // co-locates every group) and the window's — without it Spark shuffles
    // once for the count and again for the rank.
    Q("d15_mode_agg",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("cnt").desc, col("event_type"))
        Tables.events(s, d)
          .repartition(col("user_id"))
          .groupBy("user_id", "event_type")
          .agg(count(lit(1)).as("cnt"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type").as("top_type"),
            col("cnt"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, event_type AS top_type, cnt FROM (
                SELECT user_id, event_type, count(*) AS cnt,
                       row_number() OVER (PARTITION BY user_id
                         ORDER BY count(*) DESC, event_type) AS rn
                FROM events GROUP BY user_id, event_type)
              WHERE rn = 1 ORDER BY user_id""")),

    // HDR-histogram quantile sketch — the ORACLE-CHECKABLE mergeable
    // quantile path (d13's approx_percentile is a no-oracle row because its
    // sketch cut points are arrival-order-dependent; the HDR cell function
    // is pure integer math on each observation, so DuckDB derives every
    // cell exactly and the hash match proves the distributed fold
    // cell-for-cell). Per-priority sketch of exact order cents via the
    // mergeable functions.HdrHistogramByKey Aggregator: partitions fold
    // locally, the shuffle carries one 1,024-cell row per (partition, key)
    // — at 100 TB the exact d8 path must sort every group, this pays a
    // constant. Estimates = the crossing cell's lower bound at ranks
    // ceil(p·n), guaranteed within 1/16 relative error (bounds-tested in
    // QueriesSpec); the cells_md5 fingerprint pins the full cell table
    // without widening the output.
    Q("d16_hdr_quantiles",
      (s, d) => {
        import s.implicits._
        val ds = Tables.orders(s, d)
          .select(col("o_orderpriority").as("key"),
            graft.Q.cents(col("o_totalprice")).as("v"))
          .as[graft.functions.KeyVal]
        val sk = ds.groupByKey(_.key)
          .agg(graft.functions.HdrHistogramByKey.toColumn.name("sk"))
          .toDF("prio", "sk")
        val cells = sk
          .select(col("prio"), posexplode(col("sk.cells")).as(Seq("i", "cnt")))
          .filter(col("cnt") > 0)
        val wCum = Window.partitionBy("prio").orderBy("i")
        val cum = cells
          .withColumn("cum", sum(col("cnt")).over(wCum))
          .withColumn("lb", expr(
            """CASE WHEN i < 16 THEN CAST(i AS BIGINT)
               ELSE shiftleft(CAST(16 + i % 16 AS BIGINT),
                              CAST(i DIV 16 AS INT) - 4) END"""))
          .withColumn("n",
            sum(col("cnt")).over(Window.partitionBy("prio")))
        cum.groupBy("prio")
          .agg(max(col("n")).as("n"),
            min(when(expr("cum >= (n + 1) DIV 2"), col("lb")))
              .as("est_p50"),
            min(when(expr("cum >= (9 * n + 9) DIV 10"), col("lb")))
              .as("est_p90"),
            min(when(expr("cum >= (99 * n + 99) DIV 100"), col("lb")))
              .as("est_p99"),
            md5(concat_ws(",", expr(
              """transform(array_sort(collect_list(struct(i, cnt))),
                 s -> concat(CAST(s.i AS STRING), ':',
                             CAST(s.cnt AS STRING)))""")))
              .as("cells_md5"))
          .orderBy("prio")
      },
      Some("""WITH v AS (
                SELECT o_orderpriority AS prio,
                       CAST(round(o_totalprice * 100) AS BIGINT) AS v
                FROM orders),
              cellv AS (
                SELECT prio,
                       CASE WHEN v < 16 THEN v
                       ELSE (length(printf('%b', v)) - 1) * 16
                            + ((v >> (length(printf('%b', v)) - 5)) & 15)
                       END AS i
                FROM v),
              cells AS (SELECT prio, CAST(i AS INT) AS i,
                               CAST(count(*) AS BIGINT) AS cnt
                        FROM cellv GROUP BY 1, 2),
              cum AS (
                SELECT prio, i, cnt,
                       sum(cnt) OVER (PARTITION BY prio ORDER BY i) AS cum,
                       CASE WHEN i < 16 THEN CAST(i AS BIGINT)
                       ELSE CAST(16 + i % 16 AS BIGINT) << (i // 16 - 4)
                       END AS lb,
                       sum(cnt) OVER (PARTITION BY prio) AS n
                FROM cells)
              SELECT prio, CAST(max(n) AS BIGINT) AS n,
                     CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN lb END)
                       AS BIGINT) AS est_p50,
                     CAST(min(CASE WHEN cum >= (9 * n + 9) // 10 THEN lb END)
                       AS BIGINT) AS est_p90,
                     CAST(min(CASE WHEN cum >= (99 * n + 99) // 100 THEN lb
                       END) AS BIGINT) AS est_p99,
                     md5(string_agg(i || ':' || cnt, ',' ORDER BY i))
                       AS cells_md5
              FROM cum GROUP BY prio ORDER BY prio""")),

    // ANALYZE-style column profiler — the statistics pass every warehouse
    // and training pipeline runs over new data (CBO inputs, data-quality
    // monitors, dataset cards): per column null count, exact NDV, min/max.
    // ONE table scan computes every column's statistics in a single
    // aggregate (the multi-count-distinct plans as one Expand + one
    // partial/final pair — the standard ANALYZE shape; PlanSpec pins the
    // single scan), then the 1-row result unpivots map-side via stack().
    // Doubles profile as exact integer cents (§5.3); at 100 TB the exact
    // NDV swaps for the j47 HLL Aggregator behind the same output schema —
    // exact here because the oracle must hash-match.
    Q("d17_column_profile",
      (s, d) => columnProfile(s, d, exactNdv = true),
      Some {
        val branch: String => String = c =>
          s"""SELECT '$c' AS col_name,
                     CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
                     CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
                     CAST(min($c) AS BIGINT) AS min_v,
                     CAST(max($c) AS BIGINT) AS max_v
              FROM lineitem"""
        val centsBranch: String => String = c =>
          s"""SELECT '$c', CAST(count(*) - count($c) AS BIGINT),
                     CAST(count(DISTINCT CAST(round($c * 100) AS BIGINT))
                       AS BIGINT),
                     CAST(round(min($c) * 100) AS BIGINT),
                     CAST(round(max($c) * 100) AS BIGINT)
              FROM lineitem"""
        (Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
          .map(branch) ++
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
            .map(centsBranch))
          .mkString("", " UNION ALL ", " ORDER BY col_name")
      }),

    // Weighted median (round 16) — the aggregate SQL engines rarely ship
    // natively because it's ORDER-dependent (a plain median treats a
    // 50-unit line like a 1-unit line; revenue-per-unit questions need the
    // quantity-weighted one). Distributed form: collapse to per-(group,
    // value) weight sums (the one keyed exchange, map-side combined —
    // at 100 TB this is value-space-sized, not row-sized), then one
    // linear PREFIX-frame cumulative weight over the sorted values, and
    // the lower weighted median is min v with 2·cum ≥ total — exact
    // integers throughout (cents values, rounded long weights), identical
    // tie rule in both engines. The conditional-min rides the same
    // aggregate as the total, so the group table is scanned once.
    Q("d18_weighted_median",
      (s, d) => {
        import graft.operators.PrefixScan
        val b = Tables.lineitemSpread(s, d).select(
          col("l_returnflag").as("flag"),
          expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)")
            .as("v"),
          expr("CAST(round(l_quantity) AS BIGINT)").as("w"))
        val g = b.groupBy("flag", "v").agg(sum(col("w")).as("w"))
        // Two-pass prefix scan (r17) instead of flag-partitioned running
        // windows: `flag` has 3 values, so the old plan sorted the whole
        // near-row-sized (flag, v) table on 3 tasks — StageProfile
        // measured the two window stages at 1.2–1.5 s of CPU on 3 tasks,
        // the d-family's last data-sized low-cardinality window. The
        // order-preserving bucket tag (PrefixScan.tagEquiWidth on v)
        // restores full parallelism: local running sums per (flag,
        // bucket), and a ≤ 3×32-row per-(flag, bucket) summary carries
        // the preceding-buckets offset and the per-flag total. Exact
        // same cum/tot per (flag, v) — the bucket is monotone in v, so
        // prefix(flag, v) = local-prefix + lower-buckets offset.
        val tagged = PrefixScan.tagEquiWidth(g, 32, col("v"))
        val wLoc = Window.partitionBy(col("flag"), col(PrefixScan.PidCol))
          .orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wPrior = Window.partitionBy("flag")
          .orderBy(col(PrefixScan.PidCol))
          .rowsBetween(Window.unboundedPreceding, -1)
        val wAll = Window.partitionBy("flag")
          .rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)
        val summary = tagged
          .groupBy(col("flag"), col(PrefixScan.PidCol))
          .agg(sum("w").as("bw"))
          .select(col("flag"), col(PrefixScan.PidCol),
            coalesce(sum("bw").over(wPrior), lit(0L)).as("offset"),
            sum("bw").over(wAll).as("tot"))
        tagged
          .withColumn("lcum", sum("w").over(wLoc))
          .join(broadcast(summary), Seq("flag", PrefixScan.PidCol))
          .withColumn("cum", col("lcum") + col("offset"))
          .groupBy("flag")
          .agg(min(col("tot")).as("total_w"),
            min(when(lit(2) * col("cum") >= col("tot"), col("v")))
              .as("wmedian_cents"))
          .orderBy("flag")
      },
      Some("""WITH b AS (
                SELECT l_returnflag AS flag,
                       CAST(round(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT) AS v,
                       CAST(round(l_quantity) AS BIGINT) AS w
                FROM lineitem),
              g AS (SELECT flag, v, CAST(sum(w) AS BIGINT) AS w
                    FROM b GROUP BY 1, 2),
              c AS (SELECT flag, v, w,
                           sum(w) OVER (PARTITION BY flag ORDER BY v
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum,
                           sum(w) OVER (PARTITION BY flag) AS tot
                    FROM g)
              SELECT flag, CAST(min(tot) AS BIGINT) AS total_w,
                     CAST(min(CASE WHEN 2 * cum >= tot THEN v END)
                       AS BIGINT) AS wmedian_cents
              FROM c GROUP BY flag ORDER BY flag"""))
  )

  /** d17's single-scan profiler, shared by the registered exact query and
    * its 100 TB sketch twin: per column null count, NDV, min/max computed
    * in ONE aggregate over one table scan. `exactNdv = true` is the
    * oracle-checkable form (multi-count-distinct plans as one Expand +
    * partial/final pair); `false` swaps every NDV for Spark's
    * `approx_count_distinct` (HLL++) behind the SAME output schema — the
    * swap the d17 comment promises at 100 TB, where 8 exact distincts
    * would shuffle 9× the scan. The sketch twin is bounds-tested against
    * the exact profile in QueriesSpec (everything but NDV must be equal;
    * NDV within HLL++ error).
    */
  private[graft] def columnProfile(s: org.apache.spark.sql.SparkSession,
      d: String, exactNdv: Boolean): org.apache.spark.sql.DataFrame = {
    val keyCols =
      Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
    val centsCols =
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    // spread: the multi-NDV Expand multiplies every scanned row ~9× INTO
    // the partial aggregate, all inside the scan stage (d17 5.68→2.99 s
    // with the parallelism floor)
    val li = Tables.lineitemSpread(s, d)
    def ndv(c: org.apache.spark.sql.Column) =
      if (exactNdv) countDistinct(c) else approx_count_distinct(c)
    val aggs =
      keyCols.flatMap(c => Seq(
        (count(lit(1)) - count(col(c))).as(s"nn_$c"),
        ndv(col(c)).as(s"ndv_$c"),
        min(col(c)).cast("long").as(s"min_$c"),
        max(col(c)).cast("long").as(s"max_$c"))) ++
      centsCols.flatMap(c => Seq(
        (count(lit(1)) - count(col(c))).as(s"nn_$c"),
        ndv(graft.Q.cents(col(c))).as(s"ndv_$c"),
        min(graft.Q.cents(col(c))).as(s"min_$c"),
        max(graft.Q.cents(col(c))).as(s"max_$c")))
    val stackArgs = (keyCols ++ centsCols).map(c =>
      s"'$c', nn_$c, ndv_$c, min_$c, max_$c").mkString(", ")
    li.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(8, $stackArgs) AS " +
        "(col_name, n_nulls, n_distinct, min_v, max_v)"))
      .select(col("col_name"), col("n_nulls").cast("long"),
        col("n_distinct").cast("long"), col("min_v"), col("max_v"))
      .orderBy("col_name")
  }
}
