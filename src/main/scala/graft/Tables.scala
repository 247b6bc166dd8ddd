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
  /** Every test table except `events` (which needs the adaptive loader).
    * The single source for the SQL-view catalog and Bench's warmup — a
    * new table added here reaches both.
    */
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "documents", "embeddings")

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

  /** Schema-adaptive events reader. The driver has shipped `events.ts` in
    * two physical layouts (regen 2026-08-13 moved ns→µs mid-round-8), so the
    * loader branches on the type Spark infers rather than assuming either:
    *
    *  - parquet `timestamp[ns]` (pre-regen): Spark 4 refuses it by default
    *    (`PARQUET_TYPE_ILLEGAL`); with `nanosAsLong` it arrives as raw long
    *    nanoseconds, which we truncate to µs with integer division —
    *    bit-identical to DuckDB's silent ns→µs truncation (SURVEY [E5]/[E6]).
    *  - parquet `timestamp[us]` (current): inferred as TIMESTAMP_NTZ; cast
    *    to the session-TZ timestamp type. Under the UTC session TZ pinned in
    *    [[LocalSession]] the cast is value-preserving, and downstream
    *    consumers keep seeing the same `TimestampType` as always.
    *
    * `nanosAsLong` is set once at session build ([[LocalSession.build]],
    * which every main AND the test session go through) so BOTH layouts
    * read without this loader mutating shared session conf at
    * query-build time; the ns↔µs equivalence is pinned by a FormatsSpec
    * test on a synthesized ns-long file.
    */
  /** Register every PRESENT test table as a temp view under its own name —
    * the SQL-text client surface: after this, any of the oracle-SQL strings
    * runs verbatim through `spark.sql` (a3's path, widened to the whole
    * catalog). Events goes through the schema-adaptive loader like every
    * other consumer. Absent tables are skipped (same contract as Bench's
    * warmup: a partial synthesized dir or one broken table must only cost
    * the queries that reference it, not the whole SQL tranche — the
    * round-8 events regen made that rule a hard requirement).
    */
  def registerAllViews(s: SparkSession, d: String): Unit = {
    def present(t: String) = new java.io.File(s"$d/$t.parquet").exists()
    names.filter(present)
      .foreach(t => table(s, d, t).createOrReplaceTempView(t))
    if (present("events")) events(s, d).createOrReplaceTempView("events")
  }

  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
}
