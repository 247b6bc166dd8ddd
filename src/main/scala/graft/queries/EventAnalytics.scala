package graft.queries

import graft.{Q, Tables}
import graft.Q.truncateLineage
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-analytics workloads over the `events` table — the consumer-facing
  * queries a stateful event-analytics engine exists to serve (funnels,
  * cohort retention, time-series densification, EWMA smoothing, CEP
  * pattern counting). All are deterministic: stage/offset/user counts are
  * integers, timestamps compare at exact microseconds, money is integer
  * cents, float folds are order-pinned, output carries a total order.
  *
  * Scale notes: each query scans `events` exactly ONCE (PlanSpec-pinned;
  * n5's single scan lives inside its lineage-truncated per-minute
  * aggregate). The funnel stage chain and the retention first-week
  * derivation are window aggregates over a single user_id exchange — never
  * a per-stage rejoin, which would re-scan the fact table per stage;
  * anomaly stats are windows over the already-aggregated (tiny) daily
  * table; n5's calendar is generated distributed and is calendar-sized,
  * not corpus-sized; n6/n7 fold per-user series inside the row after one
  * user_id exchange, and their StreamOps twins hold O(1) state per key.
  */
object EventAnalytics {

  /** Shared by n5 (locf) and n8 (linear interpolation): the DENSIFIED
    * per-type minute series — every minute from each type's first to last
    * active minute, with n/cents null on the gap rows. The one corpus-sized
    * exchange is the per-minute aggregate, lineage-truncated because both
    * the span derivation and the join reference it; the calendar is
    * sequence()+explode per type row (distributed, calendar-sized).
    */
  private def denseMinutes(s: SparkSession, d: String): DataFrame = {
    val per = truncateLineage(Tables.events(s, d)
      .groupBy(col("event_type"),
        date_trunc("minute", col("ts")).as("m"))
      .agg(count(lit(1)).as("n"),
        sum(Q.cents(col("value"))).as("cents")))
    val buckets = per.groupBy("event_type")
      .agg(min(col("m")).as("lo"), max(col("m")).as("hi"))
      .select(col("event_type"),
        explode(expr("sequence(lo, hi, interval 1 minute)")).as("m"))
    buckets.join(per, Seq("event_type", "m"), "left")
  }

  /** n12/n13's shared input: per event_type the DENSE ≥ 25-hour series
    * (n5's calendar discipline at hour grain, gaps = 0) collected in
    * time order with the l₀ init column — one definition, two queries
    * (the qiTuples discipline), so the smoothing and the anomaly audit
    * cannot drift in series or init semantics.
    */
  private def hwSeries(s: SparkSession, d: String): DataFrame = {
    val perT = truncateLineage(Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n")))
    val cal = perT.groupBy("event_type")
      .agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(col("event_type"),
        explode(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
    cal.join(perT, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("n"), lit(0L)).cast("double").as("x"))
      .groupBy("event_type")
      .agg(expr("transform(sort_array(collect_list(struct(h, x))), r -> r.x)")
        .as("xs"))
      .where(size(col("xs")) >= 25)
      .withColumn("l0",
        expr("""aggregate(slice(xs, 2, 23), element_at(xs, 1),
                  (a, v) -> a + v) / CAST(24 AS DOUBLE)"""))
  }

  // The Holt–Winters step, as SQL-text fragments — ONE definition of the
  // three coupled recurrences for n12's fold AND n13's residual-carrying
  // fold (l_t re-derived textually inside b_t and s_t, the n9 discipline,
  // so every IEEE op runs in the same order everywhere, including the
  // DuckDB recursion which states the same expressions).
  private val HwPos = "CAST(acc.t % 24 + 1 AS INT)"
  private val HwL =
    s"""CAST(0.25 AS DOUBLE) * (x - element_at(acc.s, $HwPos))
        + CAST(0.75 AS DOUBLE) * (acc.l + acc.b)"""
  private val HwB =
    s"""CAST(0.25 AS DOUBLE) * ($HwL - acc.l)
        + CAST(0.75 AS DOUBLE) * acc.b"""
  private val HwS =
    s"""concat(
          slice(acc.s, 1, CAST(acc.t % 24 AS INT)),
          array(CAST(0.25 AS DOUBLE) * (x - ($HwL))
            + CAST(0.75 AS DOUBLE) * element_at(acc.s, $HwPos)),
          slice(acc.s, CAST(acc.t % 24 + 2 AS INT),
            CAST(24 - (acc.t % 24 + 1) AS INT)))"""
  private val HwInit =
    """'l', l0,
       'b', (element_at(xs, 24) - element_at(xs, 1)) / CAST(23 AS DOUBLE),
       's', transform(slice(xs, 1, 24), v -> v - l0),
       't', CAST(24 AS BIGINT)"""

  /** The per…hw recursive CTE stack both n12 and n13 oracles share. */
  private val HwSql =
    """per AS (
         SELECT event_type, date_trunc('hour', ts) AS h,
                count(*) AS n
         FROM events GROUP BY 1, 2),
       span AS (SELECT event_type, min(h) AS lo, max(h) AS hi
                FROM per GROUP BY 1),
       cal AS (SELECT event_type,
                      unnest(generate_series(lo, hi,
                        INTERVAL 1 HOUR)) AS h
               FROM span),
       dense AS (
         SELECT c.event_type, c.h,
                CAST(coalesce(p.n, 0) AS DOUBLE) AS x,
                row_number() OVER (PARTITION BY c.event_type
                  ORDER BY c.h) AS t
         FROM cal c LEFT JOIN per p
           ON p.event_type = c.event_type AND p.h = c.h),
       nh AS (SELECT event_type, max(t) AS tn
              FROM dense GROUP BY 1),
       f24 AS (SELECT de.event_type, list(de.x ORDER BY de.t) AS xs
               FROM dense de JOIN nh
                 ON nh.event_type = de.event_type AND nh.tn >= 25
               WHERE de.t <= 24 GROUP BY de.event_type),
       lvl AS (SELECT event_type,
                      list_reduce(xs, (a, v) -> a + v) / 24.0 AS l0,
                      (xs[24] - xs[1]) / 23.0 AS b0, xs
               FROM f24),
       i2 AS (SELECT event_type, l0, b0,
                     list_transform(xs, v -> v - l0) AS s0
              FROM lvl),
       hw AS (
         SELECT event_type, CAST(24 AS BIGINT) AS t,
                l0 AS l, b0 AS b, s0 AS s
         FROM i2
         UNION ALL
         SELECT h.event_type, d.t,
                0.25 * (d.x - h.s[CAST((d.t - 1) % 24 + 1 AS INT)])
                  + 0.75 * (h.l + h.b),
                0.25 * (0.25 * (d.x
                         - h.s[CAST((d.t - 1) % 24 + 1 AS INT)])
                       + 0.75 * (h.l + h.b) - h.l)
                  + 0.75 * h.b,
                h.s[1:CAST((d.t - 1) % 24 AS INT)]
                  || [0.25 * (d.x - (0.25 * (d.x
                         - h.s[CAST((d.t - 1) % 24 + 1 AS INT)])
                       + 0.75 * (h.l + h.b)))
                      + 0.75 * h.s[CAST((d.t - 1) % 24 + 1 AS INT)]]
                  || h.s[CAST((d.t - 1) % 24 + 2 AS INT):24]
         FROM hw h JOIN dense d
           ON d.event_type = h.event_type AND d.t = h.t + 1)"""

  /** The dense-series CTE both oracle queries share (n5/n8), verbatim. */
  private val DenseSql =
    """per AS (
         SELECT event_type, date_trunc('minute', ts) AS m,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(round(value * 100) AS BIGINT))
                  AS BIGINT) AS cents
         FROM events GROUP BY 1, 2),
       buckets AS (
         SELECT event_type,
                unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS m
         FROM (SELECT event_type, min(m) AS lo, max(m) AS hi
               FROM per GROUP BY 1)),
       dense AS (
         SELECT b.event_type, b.m, n, cents
         FROM buckets b LEFT JOIN per USING (event_type, m))"""

  val queries: Seq[Q] = Seq(
    // Ordered conversion funnel view → click → purchase: per user, the
    // earliest view, the first click strictly after it, the first purchase
    // strictly after that. Emitting the per-user stage (0–3) rather than
    // the 3-row summary keeps the oracle hash strong (one row per user).
    // One user_id exchange serves all three stage windows (each stage is a
    // conditional min over the SAME partitioning — t2/t3 reference the
    // previous stage's window result, so they chain without re-shuffling)
    // AND the final per-user aggregate (subset partitioning). The fact
    // table is scanned once, vs. once per stage slice in the naive
    // filter–aggregate–rejoin formulation.
    Q("n1_funnel",
      (s, d) => {
        val w = Window.partitionBy("user_id")
        Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("ts"))
          .withColumn("t1",
            min(when(col("event_type") === "view", col("ts"))).over(w))
          .withColumn("t2",
            min(when(col("event_type") === "click" && col("ts") > col("t1"),
              col("ts"))).over(w))
          .withColumn("t3",
            min(when(col("event_type") === "purchase" && col("ts") > col("t2"),
              col("ts"))).over(w))
          // t1/t2/t3 are constant within a user partition, so max() just
          // collapses the per-event rows to the per-user stage
          .groupBy("user_id")
          .agg(max(when(col("t3").isNotNull, 3L)
            .when(col("t2").isNotNull, 2L)
            .when(col("t1").isNotNull, 1L)
            .otherwise(0L)).as("stage"))
          .orderBy("user_id")
      },
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
              v AS (SELECT user_id, min(ts) AS t1 FROM events
                    WHERE event_type = 'view' GROUP BY user_id),
              c AS (SELECT e.user_id, min(ts) AS t2 FROM events e
                    JOIN v USING (user_id)
                    WHERE event_type = 'click' AND ts > t1
                    GROUP BY e.user_id),
              p AS (SELECT e.user_id, min(ts) AS t3 FROM events e
                    JOIN c USING (user_id)
                    WHERE event_type = 'purchase' AND ts > t2
                    GROUP BY e.user_id)
              SELECT u.user_id,
                     CAST(CASE WHEN t3 IS NOT NULL THEN 3
                               WHEN t2 IS NOT NULL THEN 2
                               WHEN t1 IS NOT NULL THEN 1
                               ELSE 0 END AS BIGINT) AS stage
              FROM u
              LEFT JOIN v USING (user_id)
              LEFT JOIN c USING (user_id)
              LEFT JOIN p USING (user_id)
              ORDER BY u.user_id""")),

    // Weekly cohort retention: cohort = week of a user's FIRST event;
    // n_users = distinct users of that cohort active in cohort-week +
    // offset. Both week stamps are date_trunc('week') (Monday 00:00 in
    // both engines), so the day difference is an exact multiple of 7 and
    // the integer `div` is exact. One explicit user_id repartition serves
    // BOTH the (user_id, week) dedup (subset partitioning) and the
    // first-week window — date_trunc is monotone, so min(week) ≡
    // week(min ts) and the dedup'd activity set suffices; the naive
    // two-aggregate + rejoin shape scans events twice. Within a user the
    // deduped weeks are distinct and w0 is fixed, so each user contributes
    // at most one row per (cohort_week, week_offset) group and the final
    // count needs no distinct expansion.
    Q("n2_retention",
      (s, d) => {
        val e = Tables.events(s, d)
          // to_date both engines: DuckDB's date_trunc('week') returns DATE
          // while Spark's returns TIMESTAMP — align the output type (the
          // truncated stamp is midnight, so the cast is lossless)
          .select(col("user_id"),
            to_date(date_trunc("week", col("ts"))).as("w"))
          .repartition(col("user_id"))
          .distinct()
          .withColumn("w0", min(col("w")).over(Window.partitionBy("user_id")))
        e.groupBy(col("w0").as("cohort_week"),
            expr("datediff(w, w0) div 7").as("week_offset"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy("cohort_week", "week_offset")
      },
      Some("""WITH firsts AS (
                SELECT user_id, date_trunc('week', min(ts)) AS w0
                FROM events GROUP BY user_id),
              acts AS (
                SELECT DISTINCT user_id, date_trunc('week', ts) AS w
                FROM events)
              SELECT w0 AS cohort_week,
                     CAST(date_diff('day', w0, w) // 7 AS BIGINT)
                       AS week_offset,
                     COUNT(DISTINCT user_id) AS n_users
              FROM acts JOIN firsts USING (user_id)
              GROUP BY w0, week_offset
              ORDER BY cohort_week, week_offset""")),

    // Daily anomaly scoring — the monitoring query of an event engine:
    // per (event_type, day) counts z-scored against that type's daily
    // distribution. Mean/variance are derived from EXACT integer sums
    // (Σn, Σn², day count) with the identical operation order written in
    // both engines — never the engines' own stddev aggregates, whose
    // summation order is nondeterministic — then one sqrt and one division,
    // rounded at 6 dp. The divisor is floored at 1e-30 (identically in both
    // engines): a type seen on one day, or with identical daily counts, has
    // exactly-zero variance (the sums are exact integers), and the exactly-
    // zero numerator then yields z = 0.0 instead of 0/0 = NaN. Stats are
    // windows over `event_type` ON THE DAILY TABLE (≤ types × days rows),
    // so events is scanned once and the second exchange moves only the
    // tiny aggregate — the rejoin formulation scans and shuffles the fact
    // table twice.
    Q("n3_anomaly_days",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"),
            to_date(date_trunc("day", col("ts"))).as("day"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("event_type")
        daily
          .withColumn("s1", sum(col("n")).over(w))
          .withColumn("s2", sum(col("n") * col("n")).over(w))
          .withColumn("k", count(lit(1)).over(w))
          .select(col("event_type"), col("day"), col("n"),
            round(
              (col("n").cast("double") - col("s1").cast("double") / col("k"))
                / greatest(sqrt(
                  (col("s2").cast("double")
                    - col("s1").cast("double") * col("s1") / col("k"))
                    / col("k")), lit(1e-30)), 6).as("z"))
          .orderBy("event_type", "day")
      },
      Some("""WITH daily AS (
                SELECT event_type, CAST(date_trunc('day', ts) AS DATE)
                         AS day, COUNT(*) AS n
                FROM events GROUP BY event_type, day),
              stats AS (
                SELECT event_type, SUM(n) AS s1, SUM(n * n) AS s2,
                       COUNT(*) AS k
                FROM daily GROUP BY event_type)
              SELECT event_type, day, n,
                     round((n::DOUBLE - s1::DOUBLE / k)
                       / greatest(sqrt((s2::DOUBLE - s1::DOUBLE * s1 / k)
                         / k), 1e-30), 6)
                       AS z
              FROM daily JOIN stats USING (event_type)
              ORDER BY event_type, day""")),

    // Event-type transition matrix — the first-order Markov view of user
    // behavior (what follows what, and how often): per user the event
    // stream in (ts, event_id) order yields (prev_type → type) pairs via
    // one lag window; global pair counts normalize to per-prev shares in
    // exact basis points (integer div — §5.3, no float division in
    // output). One user_id exchange for the lag + one pair-keyed count of
    // the 16-row matrix — nothing above event-type² cardinality leaves
    // the first shuffle. The streaming twin of this shape is the funnel
    // state machine (StreamOps) whose state holds the previous event.
    Q("n4_markov_transitions",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val pairs = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .filter(col("prev_type").isNotNull)
          .groupBy("prev_type", "event_type")
          .agg(count(lit(1)).as("n"))
        pairs
          .withColumn("row_total",
            sum(col("n")).over(Window.partitionBy("prev_type")))
          .select(col("prev_type"), col("event_type"), col("n"),
            expr("n * 10000 DIV row_total").as("share_bp"))
          .orderBy("prev_type", "event_type")
      },
      Some("""WITH seq AS (
                SELECT user_id, event_type,
                       lag(event_type) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS prev_type
                FROM events),
              pairs AS (
                SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
                FROM seq WHERE prev_type IS NOT NULL
                GROUP BY prev_type, event_type)
              SELECT prev_type, event_type, n,
                     CAST(n * 10000 // sum(n) OVER (PARTITION BY prev_type)
                       AS BIGINT) AS share_bp
              FROM pairs ORDER BY prev_type, event_type""")),

    // Time-series densification — gap-fill + forward-fill, the operator a
    // metrics store runs before any rate/derivative math (Timescale's
    // time_bucket_gapfill, Flink's windowed fill): per event_type, the
    // COMPLETE minute-bucket series from that type's first to last active
    // minute, empty minutes materialized with n = 0 and the value carried
    // forward from the last non-empty bucket (locf). Money is integer
    // cents (Q.cents per row, then an exact integer sum), so the filled
    // column is hashable. Scale shape: events is scanned ONCE into the
    // per-minute aggregate (map-side combinable; the only corpus-sized
    // exchange), which is lineage-truncated because both the spans and the
    // join reference it — everything above is CALENDAR-sized (types ×
    // minutes, 30 days ≈ 216k rows at every SF), independent of event
    // count: at 100 TB the dense series costs exactly what it costs here.
    // sequence()+explode generates buckets DISTRIBUTED per type row — no
    // driver-side calendar, no range() cross join; the locf window
    // partitions by type over the calendar table (minutes are unique within
    // a type, so the frame is deterministic). The first bucket of each type
    // is its own min, so ff_cents is never null.
    Q("n5_gapfill_ffill",
      (s, d) => {
        val w = Window.partitionBy("event_type").orderBy("m")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        denseMinutes(s, d)
          .select(col("event_type"), col("m"),
            coalesce(col("n"), lit(0L)).as("n"),
            last(col("cents"), ignoreNulls = true).over(w).as("ff_cents"))
          .orderBy("event_type", "m")
      },
      Some(s"""WITH $DenseSql
              SELECT event_type, m,
                     CAST(coalesce(n, 0) AS BIGINT) AS n,
                     last_value(cents IGNORE NULLS) OVER (
                       PARTITION BY event_type ORDER BY m
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS ff_cents
              FROM dense
              ORDER BY event_type, m""")),

    // Linear-interpolation densification — n5's locf sibling (the two fill
    // strategies every gap-filling engine offers): interior gap minutes get
    // the value linearly interpolated between the LAST observed bucket
    // before and the FIRST observed bucket after, in exact integer
    // arithmetic — c_p + (c_n − c_p)·Δ DIV span, truncation toward zero in
    // both engines (verified on negative slopes, which occur whenever the
    // series falls across a gap) — so the hash is exact with no float in
    // sight. Trailing gaps (no next anchor) degrade to locf; leading gaps
    // cannot exist (each type's first bucket is its own min). The NEXT
    // anchor deliberately rides a DESC-ordered RUNNING frame (last over
    // unboundedPreceding..currentRow of the reversed series), NOT the
    // literal `first over currentRow..unboundedFollowing`: Spark's
    // UnboundedFollowing frame re-aggregates the whole tail FOR EVERY
    // ROW — O(rows²) per partition, measured live as a 17-minute
    // single-core burn on this very query's 43k-row type partitions
    // before the rewrite — while running prefix frames fold
    // incrementally in O(rows). Same values, linear cost. Observed
    // buckets interpolate to exactly their own
    // cents (Δ = 0), so the law "li == cents wherever n > 0" is pinned in
    // the spec.
    Q("n8_gapfill_interp",
      (s, d) => {
        val wp = Window.partitionBy("event_type").orderBy("m")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wn = Window.partitionBy("event_type").orderBy(col("m").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        denseMinutes(s, d)
          .withColumn("pos", expr("cast(m as long) div 60"))
          // both directions' anchors in ONE select: WindowExec groups by
          // (partition, order), so this plans as exactly TWO Window nodes
          // (ASC prefix pair, DESC prefix pair) — sequential withColumn
          // would interleave projects and split the groups further
          // (measured: three nodes; PlanSpec pins 2)
          .select(col("event_type"), col("m"), col("n"), col("pos"),
            last(col("cents"), ignoreNulls = true).over(wp).as("c_p"),
            last(when(col("cents").isNotNull, col("pos")),
              ignoreNulls = true).over(wp).as("p_p"),
            last(col("cents"), ignoreNulls = true).over(wn).as("c_n"),
            last(when(col("cents").isNotNull, col("pos")),
              ignoreNulls = true).over(wn).as("p_n"))
          .select(col("event_type"), col("m"),
            coalesce(col("n"), lit(0L)).as("n"),
            when(col("p_n").isNull || col("p_n") === col("p_p"), col("c_p"))
              .otherwise(expr(
                "c_p + ((c_n - c_p) * (pos - p_p)) DIV (p_n - p_p)"))
              .as("li_cents"))
          .orderBy("event_type", "m")
      },
      Some(s"""WITH $DenseSql,
              anch AS (
                SELECT event_type, m, n, cents,
                       epoch(m)::BIGINT // 60 AS pos,
                       last_value(cents IGNORE NULLS) OVER wp AS c_p,
                       last_value(CASE WHEN cents IS NOT NULL
                           THEN epoch(m)::BIGINT // 60 END IGNORE NULLS)
                         OVER wp AS p_p,
                       first_value(cents IGNORE NULLS) OVER wf AS c_n,
                       first_value(CASE WHEN cents IS NOT NULL
                           THEN epoch(m)::BIGINT // 60 END IGNORE NULLS)
                         OVER wf AS p_n
                FROM dense
                WINDOW wp AS (PARTITION BY event_type ORDER BY m
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                wf AS (PARTITION BY event_type ORDER BY m
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
              SELECT event_type, m, CAST(coalesce(n, 0) AS BIGINT) AS n,
                     CASE WHEN p_n IS NULL OR p_n = p_p THEN c_p
                          ELSE c_p + ((c_n - c_p) * (pos - p_p))
                               // (p_n - p_p) END AS li_cents
              FROM anch
              ORDER BY event_type, m""")),

    // Per-user EWMA — THE streaming-native statistic (its recurrence
    // s_i = (1-α)·s_{i-1} + α·x_i needs only the previous smoothed value,
    // which is why every monitoring engine keeps it as O(1) keyed state;
    // the StreamOps twin `ewmaStream` does exactly that and the spec
    // matches it row-for-row). Batch form: one user_id exchange collects
    // each user's (ts, event_id, value) series — bounded by per-user
    // history (≤ ~100 here; at 100 TB key by (user, day) or run the
    // streaming twin, whose state stays O(1) regardless) — and folds it in
    // time order INSIDE the row. α = 1/4 deliberately: 0.25 and 0.75 are
    // exact in binary, each step is two correctly-rounded IEEE ops in the
    // SAME order in both engines (Spark `aggregate` seeded with the first
    // element ≡ DuckDB `list_reduce`, whose init is the first element), so
    // the 6-dp round is safe. Output: per user, series length and final
    // EWMA of the raw value.
    Q("n6_ewma",
      (s, d) => {
        Tables.events(s, d)
          .groupBy("user_id")
          .agg(expr("""transform(
                         sort_array(collect_list(struct(ts, event_id,
                                                        value))),
                         r -> r.value)""").as("vs"))
          .select(col("user_id"),
            size(col("vs")).cast("long").as("n_events"),
            round(expr(
              """aggregate(slice(vs, 2, size(vs) - 1),
                           element_at(vs, 1),
                           (a, x) -> CAST(0.75 AS DOUBLE) * a
                                     + CAST(0.25 AS DOUBLE) * x)"""), 6)
              .as("ewma"))
          .orderBy("user_id")
      },
      Some("""WITH per AS (
                SELECT user_id,
                       list_transform(
                         list_sort(list(struct_pack(ts := ts,
                           eid := event_id, v := value))),
                         r -> r.v) AS vs
                FROM events GROUP BY user_id)
              SELECT user_id, CAST(len(vs) AS BIGINT) AS n_events,
                     round(list_reduce(vs,
                       (a, x) -> 0.75 * a + 0.25 * x), 6) AS ewma
              FROM per ORDER BY user_id""")),

    // Holt linear-trend smoothing — n6's second-order sibling (Holt 1957,
    // the public double-exponential forecasting recurrence): per user,
    // level l and trend b evolve as l_i = αx_i + (1−α)(l_{i−1}+b_{i−1}),
    // b_i = β(l_i − l_{i−1}) + (1−β)b_{i−1}, emitting the final state and
    // the 1-step-ahead forecast l+b. α=β=1/4 (binary-exact, like n6's α);
    // init after two observations (l₂=x₂, b₂=x₂−x₁; a 1-event user gets
    // l=x, b=0). The Spark fold carries a (l, b) STRUCT accumulator —
    // `aggregate` allows it where DuckDB's list_reduce (acc type = element
    // type) cannot, so the ORACLE unrolls the same recurrence as a
    // recursive CTE over (user_id, rn) instead: per-step rows, identical
    // float ops in identical order (b_i's l_i reference is re-derived with
    // the same expression on both sides, so it is the same double), hash-
    // equal after the 6-dp round. Scale: one user_id exchange, fold inside
    // the row (state bounded by per-user history; the streaming twin
    // `holtStream` carries just the two doubles — O(1) per key).
    Q("n9_holt_trend",
      (s, d) => {
        Tables.events(s, d)
          .groupBy("user_id")
          .agg(expr("""transform(
                         sort_array(collect_list(struct(ts, event_id,
                                                        value))),
                         r -> r.value)""").as("vs"))
          .select(col("user_id"),
            size(col("vs")).cast("long").as("n_events"),
            expr("""CASE WHEN size(vs) = 1 THEN
                      named_struct('l', element_at(vs, 1),
                                   'b', CAST(0 AS DOUBLE))
                    ELSE aggregate(slice(vs, 3, size(vs) - 2),
                      named_struct('l', element_at(vs, 2),
                        'b', element_at(vs, 2) - element_at(vs, 1)),
                      (a, x) -> named_struct(
                        'l', CAST(0.25 AS DOUBLE) * x
                             + CAST(0.75 AS DOUBLE) * (a.l + a.b),
                        'b', CAST(0.25 AS DOUBLE)
                               * (CAST(0.25 AS DOUBLE) * x
                                  + CAST(0.75 AS DOUBLE) * (a.l + a.b)
                                  - a.l)
                             + CAST(0.75 AS DOUBLE) * a.b))
                    END""").as("st"))
          .select(col("user_id"), col("n_events"),
            round(col("st.l"), 6).as("level"),
            round(col("st.b"), 6).as("trend"),
            round(col("st.l") + col("st.b"), 6).as("forecast"))
          .orderBy("user_id")
      },
      Some("""WITH RECURSIVE
              seq AS (
                SELECT user_id, value AS x,
                       row_number() OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS rn,
                       count(*) OVER (PARTITION BY user_id) AS n
                FROM events),
              hw AS (
                SELECT s2.user_id, 2 AS rn, s2.x AS l, s2.x - s1.x AS b
                FROM seq s1 JOIN seq s2 ON s1.user_id = s2.user_id
                  AND s1.rn = 1 AND s2.rn = 2
                UNION ALL
                SELECT h.user_id, h.rn + 1,
                       0.25 * s.x + 0.75 * (h.l + h.b),
                       0.25 * (0.25 * s.x + 0.75 * (h.l + h.b) - h.l)
                         + 0.75 * h.b
                FROM hw h JOIN seq s ON s.user_id = h.user_id
                  AND s.rn = h.rn + 1),
              fin AS (
                SELECT h.user_id, t.n, h.l, h.b
                FROM hw h JOIN (SELECT user_id, n FROM seq WHERE rn = 1) t
                  ON h.user_id = t.user_id AND h.rn = t.n
                UNION ALL
                SELECT user_id, 1, x, 0.0 FROM seq WHERE rn = 1 AND n = 1)
              SELECT user_id, CAST(n AS BIGINT) AS n_events,
                     round(l, 6) AS level, round(b, 6) AS trend,
                     round(l + b, 6) AS forecast
              FROM fin ORDER BY user_id""")),

    // Sequence pattern matching — the MATCH_RECOGNIZE / CEP shape (Flink
    // CEP's flagship): per user, the event history compressed to a symbol
    // string (first letter of event_type — the five types are
    // letter-distinct) in (ts, event_id) order, then count non-overlapping
    // matches of view → purchase WITH NO ERROR BETWEEN. The quantifier is
    // LAZY (`v[^e]*?p`, leftmost-shortest) deliberately: lazy semantics ≡
    // the O(1) state machine "arm on v, reset on e, fire+disarm on p" —
    // verified three ways on this corpus (Java regex ≡ RE2 ≡ the machine)
    // — so the StreamOps twin `conversionPatternStream` can hold one
    // boolean + one counter per user instead of a backtracking buffer
    // (greedy would count "vpvp" as ONE match and need lookahead state).
    // Scale: one user_id exchange; the symbol string is per-user-history
    // sized; the regex scan is linear. Unlike n1 (how FAR did each user
    // get, once) this counts REPEATED conversion cycles with reset-on-
    // error — the retention-loop metric.
    Q("n7_seq_pattern",
      (s, d) => {
        Tables.events(s, d)
          .groupBy("user_id")
          .agg(expr("""concat_ws('', transform(
                         sort_array(collect_list(struct(ts, event_id,
                           substring(event_type, 1, 1) AS sym))),
                         r -> r.sym))""").as("seq"))
          .select(col("user_id"), col("seq"),
            length(col("seq")).cast("long").as("n_events"),
            expr("CAST(regexp_count(seq, 'v[^e]*?p') AS BIGINT)")
              .as("conversions"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id,
                     string_agg(substr(event_type, 1, 1), ''
                       ORDER BY ts, event_id) AS seq,
                     CAST(count(*) AS BIGINT) AS n_events,
                     CAST(len(regexp_extract_all(
                       string_agg(substr(event_type, 1, 1), ''
                         ORDER BY ts, event_id), 'v[^e]*?p')) AS BIGINT)
                       AS conversions
              FROM events GROUP BY user_id ORDER BY user_id""")),

    // CUSUM drift alarm (Page 1954, the public sequential change-point
    // recurrence every monitoring engine ships) — per user, the one-sided
    // cumulative sum s_i = max(0, s_{i-1} + x_i − k) with alarm-and-reset
    // when s crosses h: s holds only the evidence ABOVE the reference
    // level k, so a sustained upward shift accumulates while in-control
    // noise drains to 0; crossing h fires an alarm and restarts detection.
    // k=60, h=80 are binary-exact doubles chosen against this corpus's
    // value distribution (mean ≈ 50, max ≈ 327) so alarms are non-vacuous
    // at every SF (74 at sf0.001). Determinism: the fold is in (ts,
    // event_id) order INSIDE the row (n6's discipline), each step is
    // add/subtract/compare in the SAME order in both engines (the oracle's
    // recursive CTE replays rn-by-rn, first step from the same explicit
    // s₀ = 0.0), and max(0, ·) / the h compare are exact — so the 6-dp
    // round on the final s is safe and alarm counts are exact integers.
    // Scale: one user_id exchange, per-key history bounded (~100 here; at
    // 100 TB run the O(1)-state StreamOps twin `cusumStream`, which this
    // fold is the differential oracle for — CUSUM, like EWMA, is
    // streaming-native: its entire memory is one double + one counter).
    Q("n10_cusum_alarm",
      (s, d) => {
        Tables.events(s, d)
          .groupBy("user_id")
          .agg(expr("""transform(
                         sort_array(collect_list(struct(ts, event_id,
                                                        value))),
                         r -> r.value)""").as("vs"))
          .select(col("user_id"),
            size(col("vs")).cast("long").as("n_events"),
            expr("""aggregate(vs,
                      named_struct('s', CAST(0 AS DOUBLE),
                                   'a', CAST(0 AS BIGINT)),
                      (acc, x) -> CASE
                        WHEN greatest(CAST(0 AS DOUBLE),
                               acc.s + x - CAST(60 AS DOUBLE))
                             > CAST(80 AS DOUBLE)
                        THEN named_struct('s', CAST(0 AS DOUBLE),
                                          'a', acc.a + CAST(1 AS BIGINT))
                        ELSE named_struct('s',
                               greatest(CAST(0 AS DOUBLE),
                                 acc.s + x - CAST(60 AS DOUBLE)),
                               'a', acc.a) END)""").as("st"))
          .select(col("user_id"), col("n_events"),
            col("st.a").as("alarms"),
            round(col("st.s"), 6).as("cusum_final"))
          .orderBy("user_id")
      },
      Some("""WITH RECURSIVE
              seq AS (
                SELECT user_id, value AS x,
                       row_number() OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS rn,
                       count(*) OVER (PARTITION BY user_id) AS n
                FROM events),
              cs AS (
                SELECT user_id, rn, n,
                       CASE WHEN greatest(0.0, 0.0 + x - 60.0) > 80.0
                            THEN 0.0
                            ELSE greatest(0.0, 0.0 + x - 60.0) END AS s,
                       CASE WHEN greatest(0.0, 0.0 + x - 60.0) > 80.0
                            THEN 1 ELSE 0 END AS a
                FROM seq WHERE rn = 1
                UNION ALL
                SELECT c.user_id, s.rn, c.n,
                       CASE WHEN greatest(0.0, c.s + s.x - 60.0) > 80.0
                            THEN 0.0
                            ELSE greatest(0.0, c.s + s.x - 60.0) END,
                       c.a + CASE WHEN greatest(0.0, c.s + s.x - 60.0)
                                       > 80.0
                                  THEN 1 ELSE 0 END
                FROM cs c JOIN seq s ON s.user_id = c.user_id
                  AND s.rn = c.rn + 1)
              SELECT user_id, CAST(n AS BIGINT) AS n_events,
                     CAST(a AS BIGINT) AS alarms,
                     round(s, 6) AS cusum_final
              FROM cs WHERE rn = n ORDER BY user_id""")),

    // Mann–Kendall trend test (Mann 1945 / Kendall's S, the public
    // non-parametric monotone-trend statistic every environmental/metrics
    // stack ships) — per user, S = Σ_{i<j} sgn(x_j − x_i) over the
    // time-ordered series plus Kendall's tau in exact basis points
    // (S · 10000 div the pair count; both engines truncate integer
    // division toward zero — the n8-verified parity). EXACT INTEGERS
    // end-to-end: sign comparisons on raw doubles are order-free and
    // tie-stable, so the hash needs no rounding discipline at all —
    // this is the trend test to prefer over n9's float recurrence when
    // the verdict must be reproducible bit-for-bit. Shapes: the Spark
    // side computes S INSIDE the row with a nested aggregate over the
    // collected series (one user_id exchange, ~n²/2 ≈ 5k comparisons per
    // user at this history — never a self-JOIN, which would shuffle the
    // O(n²) pair table; the oracle, unconstrained by shuffle cost, uses
    // exactly that self-join as an independent formulation). The inner
    // sequence is guarded against Spark's descending-sequence trap
    // (sequence(2, 1) steps DOWN — the j87 lesson).
    Q("n11_mann_kendall",
      (s, d) => {
        Tables.events(s, d)
          .groupBy("user_id")
          .agg(expr("""transform(
                         sort_array(collect_list(struct(ts, event_id,
                                                        value))),
                         r -> r.value)""").as("vs"))
          .select(col("user_id"),
            size(col("vs")).cast("long").as("n_events"),
            expr("""CASE WHEN size(vs) < 2 THEN CAST(0 AS BIGINT)
                    ELSE aggregate(sequence(1, size(vs) - 1),
                      CAST(0 AS BIGINT),
                      (acc, i) -> acc +
                        aggregate(sequence(i + 1, size(vs)),
                          CAST(0 AS BIGINT),
                          (a, j) -> a + CASE
                            WHEN element_at(vs, j) > element_at(vs, i)
                              THEN CAST(1 AS BIGINT)
                            WHEN element_at(vs, j) < element_at(vs, i)
                              THEN CAST(-1 AS BIGINT)
                            ELSE CAST(0 AS BIGINT) END)) END""")
              .as("s_stat"))
          .select(col("user_id"), col("n_events"), col("s_stat"),
            expr("""CASE WHEN n_events < 2 THEN CAST(0 AS BIGINT)
                    ELSE (s_stat * CAST(10000 AS BIGINT))
                         div (n_events * (n_events - 1) div 2) END""")
              .as("tau_bp"))
          .orderBy("user_id")
      },
      Some("""WITH seq AS (
                SELECT user_id, value AS x,
                       row_number() OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS rn,
                       count(*) OVER (PARTITION BY user_id) AS n
                FROM events),
              st AS (
                SELECT a.user_id,
                       CAST(sum(CASE WHEN b.x > a.x THEN 1
                                     WHEN b.x < a.x THEN -1
                                     ELSE 0 END) AS BIGINT) AS s_stat
                FROM seq a JOIN seq b
                  ON a.user_id = b.user_id AND b.rn > a.rn
                GROUP BY 1)
              SELECT u.user_id, CAST(u.n AS BIGINT) AS n_events,
                     coalesce(st.s_stat, 0) AS s_stat,
                     CAST(CASE WHEN u.n < 2 THEN 0
                          ELSE (coalesce(st.s_stat, 0) * 10000)
                               // (u.n * (u.n - 1) // 2) END
                       AS BIGINT) AS tau_bp
              FROM (SELECT user_id, n FROM seq WHERE rn = 1) u
                LEFT JOIN st ON u.user_id = st.user_id
              ORDER BY u.user_id""")),

    // Holt–Winters additive seasonal smoothing (Winters 1960) — the
    // forecasting family's capstone over n6 (level) and n9 (level+trend):
    // per event_type, the HOURLY count series (dense, gap hours = 0 —
    // n5's calendar discipline at hour grain) smoothed with level + trend
    // + a 24-slot seasonal profile at α=β=γ=1/4 (binary-exact). Init at
    // t=24: l₀ = first-day mean (left-fold seeded with the first element,
    // the n6 convention both engines share), b₀ = (x₂₄−x₁)/23,
    // s₀ = first-day deviations from l₀; then for t>24
    //   l_t = α(x_t − s_{t−24}) + (1−α)(l_{t−1}+b_{t−1})
    //   b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}
    //   s_t = γ(x_t − l_t) + (1−γ)s_{t−24}
    // The Spark fold carries (l, b, s[24], t) in ONE struct accumulator —
    // the seasonal slot update is a slice‖[new]‖slice value move, zero
    // float ops — and the ORACLE replays the identical recurrence as a
    // recursive CTE whose rows carry the 24-slot LIST (l_t re-derived by
    // the same expression inside b_t and s_t, the n9 discipline), so every
    // IEEE op happens in the same order and the 6-dp round is exact.
    // Scale: everything above one map-side-combinable hourly count is
    // CALENDAR-sized (types × hours ≈ 3.6k at every SF — measured flat);
    // per-type state is 27 doubles, which is why the streaming twin
    // `holtWintersStream` holds O(m) keyed state on an unbounded stream.
    // DOMAIN: a type needs ≥ 25 dense hours (one full season + one step)
    // to register — enforced IDENTICALLY on both sides (Spark's
    // size ≥ 25 filter; the oracle's nh.tn >= 25 join), so a sparse type
    // drops from both rather than hash-diverging.
    Q("n12_holt_winters",
      (s, d) => {
        hwSeries(s, d)
          .withColumn("st0", expr(s"named_struct($HwInit)"))
          .withColumn("fin", expr(
            s"""aggregate(slice(xs, 25, size(xs) - 24), st0,
                 (acc, x) -> named_struct(
                   'l', $HwL,
                   'b', $HwB,
                   's', $HwS,
                   't', acc.t + CAST(1 AS BIGINT)))"""))
          .select(col("event_type"),
            col("fin.t").as("n_hours"),
            round(col("fin.l"), 6).as("level"),
            round(col("fin.b"), 6).as("trend"),
            round(expr(
              """fin.l + fin.b + element_at(fin.s,
                   CAST(fin.t % 24 + 1 AS INT))"""), 6).as("forecast"))
          .orderBy("event_type")
      },
      Some(s"""WITH RECURSIVE $HwSql
              SELECT h.event_type, t AS n_hours,
                     round(l, 6) AS level, round(b, 6) AS trend,
                     round(l + b + s[CAST(t % 24 + 1 AS INT)], 6)
                       AS forecast
              FROM hw h JOIN (SELECT event_type, max(t) mt FROM hw
                              GROUP BY 1) m
                ON m.event_type = h.event_type AND h.t = m.mt
              ORDER BY h.event_type""")),

    // Seasonal-residual anomaly detection — n12 composed with n3's
    // question (the monitoring deployment of a forecaster: alert on what
    // the model did NOT expect): per event_type, the 5 hours whose
    // observed count deviates most from the ONE-STEP-AHEAD Holt–Winters
    // forecast l_{t−1} + b_{t−1} + s_{t−24}. Unlike n3's daily z-scores
    // (which flag any busy day), the HW residual is seasonality- and
    // trend-adjusted — a busy Monday 09:00 is expected, a busy Sunday
    // 03:00 is not. The Spark fold is n12's EXACT step (shared HwL/HwB/
    // HwS fragments — one definition) with a residual log carried in the
    // accumulator (calendar-bounded, ~700 structs/type); the oracle
    // reuses the shared hw recursion, whose per-step rows ARE the
    // forecast history, joined to the next observation. Both sides rank
    // on the bit-identical raw |x − pred| with the hour as tiebreak, so
    // the top-5 per type hash-matches; outputs round at 6 dp.
    Q("n13_hw_anomaly",
      (s, d) => {
        hwSeries(s, d)
          .withColumn("st0", expr(s"""named_struct($HwInit,
            'res', CAST(array() AS
              ARRAY<STRUCT<t: BIGINT, x: DOUBLE, pred: DOUBLE>>))"""))
          .withColumn("fin", expr(
            s"""aggregate(slice(xs, 25, size(xs) - 24), st0,
                 (acc, x) -> named_struct(
                   'l', $HwL,
                   'b', $HwB,
                   's', $HwS,
                   't', acc.t + CAST(1 AS BIGINT),
                   'res', concat(acc.res, array(named_struct(
                     't', acc.t + CAST(1 AS BIGINT),
                     'x', x,
                     'pred', acc.l + acc.b
                             + element_at(acc.s, $HwPos))))))"""))
          .select(col("event_type"), explode(col("fin.res")).as("r"))
          .select(col("event_type"), col("r.t").as("t"),
            col("r.x").as("x"), col("r.pred").as("pred"))
          .withColumn("rk", row_number().over(
            Window.partitionBy("event_type")
              .orderBy(abs(col("x") - col("pred")).desc, col("t"))))
          .filter(col("rk") <= 5)
          .select(col("event_type"), col("t"),
            col("x").cast("long").as("n"),
            round(col("pred"), 6).as("pred"),
            round(col("x") - col("pred"), 6).as("resid"))
          .orderBy("event_type", "t")
      },
      Some(s"""WITH RECURSIVE $HwSql,
              resid AS (
                SELECT h.event_type, d.t, d.x,
                       h.l + h.b + h.s[CAST((d.t - 1) % 24 + 1 AS INT)]
                         AS pred
                FROM hw h JOIN dense d
                  ON d.event_type = h.event_type AND d.t = h.t + 1)
              SELECT event_type, t, CAST(x AS BIGINT) AS n,
                     round(pred, 6) AS pred,
                     round(x - pred, 6) AS resid
              FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                      ORDER BY abs(x - pred) DESC, t) AS rk
                    FROM resid) z
              WHERE rk <= 5 ORDER BY event_type, t"""))
  )
}
