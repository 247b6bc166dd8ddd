package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One registered operator query: the Spark formulation plus (optionally) the
  * DuckDB oracle SQL the driver hash-compares against (SURVEY §2 / §3.4).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Determinism combinators enforcing SURVEY §5.3 — the oracle hash-match
  * rules. Every oracle query must end in a total order over a unique key set,
  * emit no raw double aggregates (round or integer cents), tie-break every
  * window ordering, and keep maps/unsorted collections out of the output.
  */
object Q {
  /** Exact money arithmetic: per-row double → integer cents. The per-row
    * product is IEEE-deterministic and identical across engines; the integer
    * sum is then order-independent, dodging the measured Spark-vs-DuckDB
    * double-summation divergence (SURVEY [E7]). DuckDB equivalent:
    * `CAST(round(x * 100) AS BIGINT)` (round-then-cast — Spark's
    * double→long cast truncates while DuckDB's rounds, so round first).
    */
  def cents(c: Column): Column = round(c * 100).cast("long")

  val centsSql: String => String = x => s"CAST(round(($x) * 100) AS BIGINT)"

  /** Lineage truncation for a shared subtree that is referenced more than
    * once (the "diamond"): Spark re-plans each reference from scratch — and
    * join-side null filters usually break AQE's exchange reuse across the
    * branches, so the whole subtree (fact scan included) executes per
    * reference. Materializing it once is the fix whenever the subtree's
    * OUTPUT is small relative to its input (a keyed aggregate, a signature
    * table). Default: `localCheckpoint` (executor-local blocks — fast, right
    * for local mode). With `spark.graft.reliableCheckpoint=true` AND a
    * checkpoint dir configured via `sparkContext.setCheckpointDir`, switches
    * to a RELIABLE checkpoint: on a 1000-executor cluster an executor lost
    * mid-query would otherwise drop the blocks and the truncated lineage
    * cannot recompute them — reliable checkpoint to distributed storage is
    * the only safe truncation under executor churn.
    */
  def truncateLineage(df: DataFrame): DataFrame =
    if (df.sparkSession.conf
          .getOption("spark.graft.reliableCheckpoint").contains("true"))
      df.checkpoint()
    else df.localCheckpoint()
}
