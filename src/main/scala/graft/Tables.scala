package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central loaders for the driver's parquet test tables
  * (`/root/testdata/sf*` — see FIXTURES.md). Every graft query reads through
  * these helpers so per-table quirks live in exactly one place.
  *
  * Design note (100 TB): each loader returns a plain parquet scan — no
  * caching, no collect — so Catalyst keeps predicate pushdown / column
  * pruning and the scan parallelism scales with input splits.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.ts` is parquet `timestamp[ns]`, which Spark 4 refuses to read by
    * default (`PARQUET_TYPE_ILLEGAL`). Recipe (SURVEY [E5]/[E6]): read the
    * column as raw long nanoseconds via the legacy conf, then truncate to
    * microseconds with integer division — bit-identical to DuckDB's silent
    * ns→µs truncation, so oracle comparisons line up.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
