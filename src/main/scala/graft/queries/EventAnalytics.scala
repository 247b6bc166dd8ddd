package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-analytics workloads over the `events` table — the consumer-facing
  * queries a stateful event-analytics engine exists to serve (funnels,
  * cohort retention). All are deterministic: stage/offset/user counts are
  * integers, timestamps compare at exact microseconds, output carries a
  * total order.
  *
  * Scale notes: each query scans `events` exactly ONCE (PlanSpec-pinned).
  * The funnel stage chain and the retention first-week derivation are
  * window aggregates over a single user_id exchange — never a per-stage
  * rejoin, which would re-scan the fact table per stage; anomaly stats are
  * windows over the already-aggregated (tiny) daily table.
  */
object EventAnalytics {

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
              FROM pairs ORDER BY prev_type, event_type"""))
  )
}
