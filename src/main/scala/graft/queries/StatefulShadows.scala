package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY §2 category I — batch shadows of the stateful streaming operators.
  *
  * Structured Streaming's semantics are incremental execution of the same
  * logical plan (the SIGMOD'18 model), so each streaming operator in
  * `graft.streaming` has a batch-equivalent formulation registered here for
  * the DuckDB oracle; the streaming forms are differential-tested against
  * these in the test suite (SURVEY §5.2.3). `window()`/`session_window()`
  * work identically on batch DataFrames, so i1/i2 register the *same* code
  * the streaming queries run.
  */
object StatefulShadows {

  private val GapUs = 1800000000L // 30 min session gap, microseconds

  val queries: Seq[Q] = Seq(
    // Tumbling event-time window — batch form of
    // events.withWatermark().groupBy(window($"ts","1 hour"), $"event_type").
    Q("i1_tumbling_window",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(Q.cents(col("value"))).as("val_cents"))
        .select(col("window.start").as("ws"), col("event_type"), col("n"),
          col("val_cents"))
        .orderBy("ws", "event_type"),
      Some("""SELECT date_trunc('hour', ts) AS ws, event_type,
                     COUNT(*) AS n,
                     CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT)
                       AS val_cents
              FROM events GROUP BY 1, 2 ORDER BY ws, event_type""")),

    // Sliding window (1 h / 15 min) — each event lands in 4 overlapping
    // windows; oracle regenerates the 4 starts per row.
    Q("i2_sliding_window",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("ws"), col("n"))
        .orderBy("ws"),
      Some("""SELECT ws, COUNT(*) AS n FROM (
                SELECT time_bucket(INTERVAL '15 minutes', ts)
                         - INTERVAL '15 minutes' * k AS ws
                FROM events
                CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k))
              GROUP BY ws ORDER BY ws""")),

    // Gap-based sessionization, batch form: lag-gap flag → running-sum
    // session id → per-session aggregate. The streaming twin uses
    // session_window(); both are differential-tested.
    Q("i3_session_window",
      (s, d) => {
        val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val wRun = wOrd.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)
        Tables.events(s, d)
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(wOrd))
          .withColumn("new_s",
            when(col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > GapUs, 1)
              .otherwise(0))
          .withColumn("session_id", sum("new_s").over(wRun))
          .groupBy("user_id", "session_id")
          .agg(min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"),
            count(lit(1)).as("n_events"))
          .orderBy("user_id", "session_id")
      },
      Some(s"""SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                      min(ts) AS start_ts, max(ts) AS end_ts,
                      COUNT(*) AS n_events
               FROM (
                 SELECT user_id, ts,
                        SUM(new_s) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          AS session_id
                 FROM (
                   SELECT user_id, ts, event_id,
                          CASE WHEN lag(ts, 1) OVER w IS NULL
                                 OR epoch_us(ts) - lag(epoch_us(ts), 1) OVER w
                                    > $GapUs
                               THEN 1 ELSE 0 END AS new_s
                   FROM events
                   WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)))
               GROUP BY user_id, session_id
               ORDER BY user_id, session_id""")),

    // Running count per (user, event_type) — THE batch equivalent of
    // updateStateByKey / mapGroupsWithState running counts (streaming twin:
    // graft.streaming.RunningCount).
    Q("i4_running_count",
      (s, d) => {
        val w = Window.partitionBy("user_id", "event_type")
          .orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .withColumn("run_cnt", count(lit(1)).over(w))
          .select("event_id", "user_id", "event_type", "run_cnt")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, event_type,
                     COUNT(*) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS run_cnt
              FROM events ORDER BY event_id""")),

    // Streaming dedup's batch shadow: exact distinct over the dedup key set
    // (dropDuplicates keeps an arbitrary row, which can't be oracled — the
    // deterministic projection is what's registered).
    Q("i6_dedup_watermark",
      (s, d) => Tables.events(s, d)
        .select("user_id", "event_type")
        .distinct()
        .orderBy("user_id", "event_type"),
      Some("""SELECT DISTINCT user_id, event_type FROM events
              ORDER BY user_id, event_type"""))
  )
}
