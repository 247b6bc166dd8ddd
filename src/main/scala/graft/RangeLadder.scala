package graft

import org.apache.spark.sql.functions._

/** Diagnostic main for the binned-range-join path (c10 and the
  * BinnedRangeJoinRule): synthesizes integral day-index tables at growing
  * multipliers and times the NAIVE window join — written exactly as a
  * user would write it, so the measurement exercises the optimizer rule's
  * rewrite, not the hand-binned form. Two claims measured:
  *
  *  1. The rewritten plan costs shuffle(n+m) + MATCHES: when both sides
  *     scale m×, matches grow m² by construction (m× orders, each seeing
  *     m× rows per day), and the measured wall tracks the match count at
  *     a ≈constant sec-per-million-matches — linear in output, which is
  *     the best any plan materializing the matches can be.
  *  2. Eager aggregation (c10's composed form: collapse the point side to
  *     per-day partials BEFORE the join) breaks the m² term — the join
  *     touches orders × ≤7 day-partials, so the same answer at the same
  *     rung costs ≈linear-in-INPUT wall. Measured side by side per rung.
  *  3. The BroadcastNestedLoopJoin both replace is a different cost
  *     CLASS: measured once at a deliberately small size (n·m predicate
  *     evaluations make full-size BNL unrunnable — which is the point),
  *     via the rule's kill switch on the SAME query text.
  *
  * Usage: runMain graft.RangeLadder [mult ...] (default 1 2 4; base size
  * 50k orders × 200k lineitems per mult — the naive text materializes
  * every match, so rungs are sized to stay measurable while still 10×
  * beyond the BNL demo)
  */
object RangeLadder {

  def main(args: Array[String]): Unit = {
    val mults = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 2, 4)
    val spark = LocalSession.build()

    def tables(nO: Long, nL: Long) = {
      val o = spark.range(nO).select(col("id").as("o_id"),
        pmod(hash(col("id"), lit(1)), lit(2400)).cast("long").as("o_day"))
      val l = spark.range(nL).select(
        pmod(hash(col("id"), lit(2)), lit(2500)).cast("long").as("l_day"))
      (o, l)
    }
    // the NAIVE text — the rule must do the binning
    def naiveJoin(o: org.apache.spark.sql.DataFrame,
        l: org.apache.spark.sql.DataFrame) =
      o.join(l, col("l_day") >= col("o_day") &&
          col("l_day") < col("o_day") + 7)
        .groupBy("o_id").agg(count(lit(1)).as("n"))

    // cost-class demo at a small fixed size: same text, rule off vs on
    val (oS, lS) = tables(5000L, 20000L)
    spark.conf.set("spark.graft.binnedRangeJoin", "false")
    val t0 = System.nanoTime()
    val nBnl = naiveJoin(oS, lS).count()
    val bnlSec = (System.nanoTime() - t0) / 1e9
    spark.conf.set("spark.graft.binnedRangeJoin", "true")
    val t1 = System.nanoTime()
    val nRule = naiveJoin(oS, lS).count()
    val ruleSecS = (System.nanoTime() - t1) / 1e9
    require(nBnl == nRule, s"rule changed the result: $nBnl vs $nRule")
    println(s"""{"range_ladder_bnl": {"orders": 5000, "lineitem": 20000, """ +
      s""""bnl_sec": ${MiniJson.num(bnlSec, 2)}, """ +
      s""""rule_sec": ${MiniJson.num(ruleSecS, 2)}, "rows": $nBnl}}""")

    mults.foreach { m =>
      val (o, l) = tables(50000L * m, 200000L * m)
      val t = System.nanoTime()
      val naived = naiveJoin(o, l)
        .agg(count(lit(1)).cast("long").as("g"), sum("n").as("matches"))
        .collect()(0)
      val sec = (System.nanoTime() - t) / 1e9
      // the eager-agg composition (c10's form) on the same tables
      val lByDay = l.groupBy("l_day").agg(count(lit(1)).as("day_n"))
      val t2 = System.nanoTime()
      val aggd = o.join(lByDay, col("l_day") >= col("o_day") &&
          col("l_day") < col("o_day") + 7)
        .groupBy("o_id").agg(sum("day_n").as("n"))
        .agg(count(lit(1)).cast("long").as("g"), sum("n").as("matches"))
        .collect()(0)
      val aggSec = (System.nanoTime() - t2) / 1e9
      require(naived.getLong(1) == aggd.getLong(1),
        s"eager aggregation changed the totals: $naived vs $aggd")
      println(s"""{"range_ladder": {"mult": $m, """ +
        s""""orders": ${50000L * m}, "lineitem": ${200000L * m}, """ +
        s""""matches": ${naived.getLong(1)}, """ +
        s""""naive_rule_sec": ${MiniJson.num(sec, 2)}, """ +
        s""""eager_agg_sec": ${MiniJson.num(aggSec, 2)}}}""")
    }
    spark.stop()
  }
}
