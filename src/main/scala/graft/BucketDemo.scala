package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured bucketed-vs-plain demonstration of the headline fact-fact join
  * (Bench q2: lineitem ⋈ orders → revenue by nation) — the write-side half
  * of the 100 TB story with NUMBERS instead of plan assertions.
  *
  * `Layout.writeBucketed` pre-shuffles both fact tables ONCE on the order
  * key (pay the shuffle at ingest); every subsequent equi-join/aggregate on
  * that key then plans with zero exchange on either fact side — the partial
  * agg runs bucket-local and the join is co-located, so the only remaining
  * shuffle is the 25-row nation rollup. At 100 TB that deletes the dominant
  * cost of the query; `LayoutSpec` proves the plan shape, this main runs
  * both variants on the same corpus and prints one JSON line with wall
  * times, exchange counts, and the one-time bucketing cost so the tradeoff
  * is auditable.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.BucketDemo
  *        (e.g. a `ScaleSynth relational` corpus; defaults to sf0.1)
  */
object BucketDemo {

  /** The q2 join-agg shape over arbitrary lineitem/orders frames —
    * identical logic to Bench.joinAggNation, parameterized by input so the
    * plain and bucketed variants differ ONLY in layout.
    */
  private def joinAgg(li: DataFrame, ord: DataFrame, cust: DataFrame,
      nat: DataFrame): DataFrame =
    li.groupBy("l_orderkey")
      .agg(sum(Q.cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("order_cents"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(col("order_cents")).as("revenue_cents"))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalSession.build(extra = Map(
      "spark.sql.files.maxPartitionBytes" ->
        sys.env.getOrElse("SPARK_GRAFT_SPLIT_BYTES", "1m"),
      "spark.sql.files.openCostInBytes" -> "256k",
      // scratch warehouse per run — managed bucketed tables must not
      // collide with a previous JVM's leftovers (or land in the repo)
      "spark.sql.warehouse.dir" ->
        java.nio.file.Files.createTempDirectory("graft-bucket").toString))

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val li = Tables.lineitem(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
    val nat = Tables.nation(spark, sfDir)

    // warm the inputs like Bench does (footers/pages + JIT)
    Seq(li, ord, cust, nat).foreach(_.count())

    val plain = joinAgg(li, ord, cust, nat)
    val plainEx = graft.layout.Layout.countExchanges(plain)
    plain.count() // warm
    val (_, plainSec) = time(plain.count())

    // one-time layout cost: bucket BOTH facts on the join key
    val (_, bucketSec) = time {
      graft.layout.Layout.writeBucketed(li, "li_b", "l_orderkey")
      graft.layout.Layout.writeBucketed(ord, "ord_b", "o_orderkey")
    }
    val bucketed = joinAgg(spark.table("li_b"), spark.table("ord_b"),
      cust, nat)
    val bucketedEx = graft.layout.Layout.countExchanges(bucketed)
    bucketed.count() // warm
    val (_, bucketedSec) = time(bucketed.count())

    println(s"""{"metric":"bucket_demo","sf":"$sfDir","plain_sec":$plainSec,"bucketed_sec":$bucketedSec,"bucket_write_sec":$bucketSec,"plain_exchanges":$plainEx,"bucketed_exchanges":$bucketedEx}""")
    spark.stop()
  }
}
