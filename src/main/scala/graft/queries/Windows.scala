package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY §2 category E — window functions.
  *
  * Every window ordering carries a unique tie-break column (§5.3 rule 3) so
  * rank/lag assignments are engine-independent. Windows partition by key —
  * at 100 TB each WindowExec works on one key group at a time after a
  * key-partitioned sort. Even the definitionally-global e5 distribution
  * functions run partition-parallel: the two-pass prefix scan
  * (graft.operators.PrefixScan) turns the total order into a range
  * partition + broadcast offsets, so no registered plan single-partitions
  * a table (PlanSpec pins this across every registered query).
  */
object Windows {

  val queries: Seq[Q] = Seq(
    // Top-k per group — rank + filter, the distributed top-k idiom.
    Q("e1_rank_topk",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, d)
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
          .orderBy("o_custkey", "rk")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       CAST(row_number() OVER (PARTITION BY o_custkey
                         ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT)
                         AS rk
                FROM orders)
              WHERE rk <= 3 ORDER BY o_custkey, rk""")),

    // lag/lead — the kernel inside sessionization ("remember the previous
    // event"), the batch shadow of keyed state.
    Q("e2_lag_lead",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .withColumn("prev_id", lag("event_id", 1).over(w))
          .withColumn("next_id", lead("event_id", 1).over(w))
          .withColumn("gap_us",
            unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
          .select("event_id", "user_id", "prev_id", "next_id", "gap_us")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
                     lag(event_id, 1) OVER w AS prev_id,
                     lead(event_id, 1) OVER w AS next_id,
                     epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS gap_us
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
              ORDER BY event_id""")),

    // Cumulative frame — THE batch-equivalent of updateStateByKey running
    // counts (SURVEY §2 i4); value sums as integer cents for exactness.
    Q("e3_running_agg",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .withColumn("run_cnt", count(lit(1)).over(w))
          .withColumn("run_cents", sum(Q.cents(col("value"))).over(w))
          .select("event_id", "user_id", "run_cnt", "run_cents")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
                     COUNT(*) OVER w AS run_cnt,
                     CAST(SUM(CAST(round(value*100) AS BIGINT)) OVER w
                       AS BIGINT) AS run_cents
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              ORDER BY event_id""")),

    // rangeBetween frame — 1-day trailing revenue per customer. Spark range
    // frames need a numeric ordering key, so order by unix micros; the
    // [-86400e6, 0] micros frame is exactly DuckDB's RANGE INTERVAL 1 DAY
    // PRECEDING.
    Q("e4_range_frame",
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy("ord")
          .rangeBetween(-86400000000L, 0)
        Tables.orders(s, d)
          // o_orderdate is TIMESTAMP_NTZ (parquet ms, no UTC flag); cast to
          // session-TZ timestamp (UTC) for unix_micros.
          .withColumn("ord", unix_micros(col("o_orderdate").cast("timestamp")))
          .withColumn("trail_cents", sum(Q.cents(col("o_totalprice"))).over(w))
          .select("o_custkey", "o_orderkey", "trail_cents")
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
                     CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) OVER
                       (PARTITION BY o_custkey ORDER BY o_orderdate
                        RANGE BETWEEN INTERVAL '1 day' PRECEDING
                          AND CURRENT ROW) AS BIGINT) AS trail_cents
              FROM orders ORDER BY o_orderkey""")),

    // Distribution functions over account balances (unique total order via
    // c_custkey tie-break makes ntile/percent_rank/cume_dist exact rationals
    // — identical doubles in both engines; rounded anyway). Computed as the
    // PARTITION-PARALLEL two-pass prefix scan (r16 verdict task #1 — the
    // engine's own ntile()/percent_rank() over an unpartitioned window
    // move the whole table to one task): global rank = broadcast bucket
    // offset + local row_number keyed by the value-deterministic
    // order-preserving bucket tag (PrefixScan.tagEquiWidth), then
    // ntile/percent_rank/cume_dist are exact arithmetic in (rank, n) —
    // ntile's SQL-standard uneven-bucket split replayed as integer math,
    // percent_rank = (rk−1)/(n−1), cume_dist = rk/n (the order is unique,
    // so rank ≡ row number and there are no tie plateaus). The only
    // global-order window left runs over the ≤32-row per-partition count
    // table. At 100 TB you still reach for the d13 approx-percentile
    // sketch when a sketch suffices; this is the EXACT path, now scale-safe.
    Q("e5_ntile_pctl",
      (s, d) => {
        import graft.operators.PrefixScan
        // integer floor-division as codegen'd column math: operands are
        // non-negative counts/ranks ≪ 2^52, so the double round-trip is
        // exact and floor ≡ the integer quotient
        def idiv(a: Column, b: Column): Column =
          floor(a.cast("double") / b.cast("double")).cast("long")
        val tagged = PrefixScan.tagEquiWidth(
          Tables.customer(s, d).select("c_custkey", "c_acctbal"),
          32, col("c_acctbal"))
        val wLoc = Window.partitionBy(PrefixScan.PidCol)
          .orderBy(col("c_acctbal"), col("c_custkey"))
        val wPrior = Window.orderBy(PrefixScan.PidCol)
          .rowsBetween(Window.unboundedPreceding, -1)
        val counts = tagged.groupBy(PrefixScan.PidCol)
          .agg(count(lit(1)).as("cnt"))
        val prefix = counts.select(col(PrefixScan.PidCol),
          coalesce(sum("cnt").over(wPrior), lit(0L)).as("offset"),
          sum("cnt").over(Window.partitionBy()
            .rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)).as("n"))
        val rk = col("offset") + col("lrk")
        // SQL-standard NTILE(k) over n rows: q = n div k extra-row
        // remainder r = n mod k; the first r buckets carry q+1 rows —
        // rank ≤ (q+1)·r lands in bucket ⌊(rk−1)/(q+1)⌋+1, the rest in
        // r + ⌊(rk−1−(q+1)·r)/q⌋+1 (exactly what WindowExec computes)
        val k = lit(4L)
        val q = idiv(col("n"), k)
        val r = col("n") % k
        val thresh = (q + 1L) * r
        val quartile = when(rk <= thresh, idiv(rk - 1L, q + 1L) + 1L)
          .otherwise(r + idiv(rk - 1L - thresh, q) + 1L)
        tagged
          .withColumn("lrk", row_number().over(wLoc).cast("long"))
          .join(broadcast(prefix), Seq(PrefixScan.PidCol))
          .select(col("c_custkey"),
            quartile.as("quartile"),
            round(when(col("n") === 1L, 0.0)
              .otherwise((rk - 1L).cast("double") /
                (col("n") - 1L).cast("double")), 6).as("pr"),
            round(rk.cast("double") / col("n").cast("double"), 6).as("cd"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
                     CAST(ntile(4) OVER w AS BIGINT) AS quartile,
                     round(percent_rank() OVER w, 6) AS pr,
                     round(cume_dist() OVER w, 6) AS cd
              FROM customer
              WINDOW w AS (ORDER BY c_acctbal, c_custkey)
              ORDER BY c_custkey""")),

    // Bounded rows-frame moving average (4-order trailing window). The
    // frame sums ≤ 4 integer-cents values — exact in both engines — and the
    // long/long average divides identically; rounded anyway.
    Q("e7_moving_avg",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(-3, Window.currentRow)
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"),
            round(avg(Q.cents(col("o_totalprice"))).over(w), 2).as("ma4"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey,
                     round(AVG(CAST(round(o_totalprice*100) AS BIGINT)) OVER
                       (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 2) AS ma4
              FROM orders ORDER BY o_orderkey""")),

    // Ratio-to-report: each order's share of its customer's total spend —
    // the unordered-window (whole-partition aggregate) shape. Both operands
    // of the division are exact integer-cents sums, so the only double op
    // is one IEEE division before the 6-dp round.
    Q("e8_ratio_to_report",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
        Tables.orders(s, d)
          .withColumn("cents", Q.cents(col("o_totalprice")))
          .select(col("o_orderkey"), col("o_custkey"), col("cents"),
            round(col("cents") / sum("cents").over(w), 6).as("share"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey,
                     CAST(round(o_totalprice*100) AS BIGINT) AS cents,
                     round(CAST(round(o_totalprice*100) AS BIGINT) /
                       SUM(CAST(round(o_totalprice*100) AS BIGINT)) OVER
                         (PARTITION BY o_custkey), 6) AS share
              FROM orders ORDER BY o_orderkey"""))
  )
}
