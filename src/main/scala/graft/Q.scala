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
}
