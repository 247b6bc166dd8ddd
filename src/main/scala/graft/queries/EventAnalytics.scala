package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Event-analytics workloads over the `events` table — the consumer-facing
  * queries a stateful event-analytics engine exists to serve (funnels,
  * cohort retention). Both are deterministic: stage/offset/user counts are
  * integers, timestamps compare at exact microseconds, output carries a
  * total order.
  *
  * Scale notes: every stage keys on `user_id`, so after the first shuffle
  * the per-stage joins and aggregates are co-partitioned — the chain costs
  * one wide exchange per event-type slice, never a cross join or a driver
  * collect; cohort counts are plain partial/final distinct aggregates.
  */
object EventAnalytics {

  val queries: Seq[Q] = Seq(
    // Ordered conversion funnel view → click → purchase: per user, the
    // earliest view, the first click strictly after it, the first purchase
    // strictly after that. Emitting the per-user stage (0–3) rather than
    // the 3-row summary keeps the oracle hash strong (one row per user).
    // Each stage is a keyed min-aggregate joined on user_id — co-partitioned
    // after the first shuffle; the event-type filters prune each slice
    // before it shuffles.
    Q("n1_funnel",
      (s, d) => {
        val e = Tables.events(s, d)
        val base = e.select("user_id").distinct()
        val v = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("ts")).as("t1"))
        val c = e.filter(col("event_type") === "click")
          .join(v, "user_id").filter(col("ts") > col("t1"))
          .groupBy("user_id").agg(min(col("ts")).as("t2"))
        val p = e.filter(col("event_type") === "purchase")
          .join(c, "user_id").filter(col("ts") > col("t2"))
          .groupBy("user_id").agg(min(col("ts")).as("t3"))
        base
          .join(v, Seq("user_id"), "left")
          .join(c, Seq("user_id"), "left")
          .join(p, Seq("user_id"), "left")
          .select(col("user_id"),
            when(col("t3").isNotNull, 3L)
              .when(col("t2").isNotNull, 2L)
              .when(col("t1").isNotNull, 1L)
              .otherwise(0L).as("stage"))
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
    // the integer `div` is exact. Two keyed aggregates + one co-partitioned
    // join; counts are partial/final distinct aggregates.
    Q("n2_retention",
      (s, d) => {
        val e = Tables.events(s, d)
        // to_date both engines: DuckDB's date_trunc('week') returns DATE
        // while Spark's returns TIMESTAMP — align the output type (the
        // truncated stamp is midnight, so the cast is lossless)
        val firsts = e.groupBy("user_id")
          .agg(to_date(date_trunc("week", min(col("ts")))).as("w0"))
        val acts = e.select(col("user_id"),
          to_date(date_trunc("week", col("ts"))).as("w")).distinct()
        acts.join(firsts, "user_id")
          .groupBy(col("w0").as("cohort_week"),
            expr("datediff(w, w0) div 7").as("week_offset"))
          .agg(countDistinct(col("user_id")).as("n_users"))
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
    // rounded at 6 dp. The per-type window partitions are tiny (≤ #days);
    // the single wide exchange is the (event_type, day) count.
    Q("n3_anomaly_days",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"),
            to_date(date_trunc("day", col("ts"))).as("day"))
          .agg(count(lit(1)).as("n"))
        val stats = daily.groupBy("event_type")
          .agg(sum(col("n")).as("s1"), sum(col("n") * col("n")).as("s2"),
            count(lit(1)).as("k"))
        daily.join(stats, "event_type")
          .select(col("event_type"), col("day"), col("n"),
            round(
              (col("n").cast("double") - col("s1").cast("double") / col("k"))
                / sqrt(
                  (col("s2").cast("double")
                    - col("s1").cast("double") * col("s1") / col("k"))
                    / col("k")), 6).as("z"))
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
                       / sqrt((s2::DOUBLE - s1::DOUBLE * s1 / k) / k), 6)
                       AS z
              FROM daily JOIN stats USING (event_type)
              ORDER BY event_type, day"""))
  )
}
