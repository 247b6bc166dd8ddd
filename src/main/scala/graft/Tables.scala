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
    raw(spark, dir, name)

  /** The plain parquet scan — what [[table]] returns. Kept as an explicit
    * name so partition-SENSITIVE consumers (f2/f3's seeded Bernoulli
    * samplers draw per-partition RNG streams) document that they must
    * never sit above [[spread]].
    */
  def raw(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Guide-§2.5 parallelism floor ("one huge unsplittable file … otherwise
    * repartition immediately after the read"): the driver's test tables are
    * each ONE parquet file with ONE row group (verified via footers, this
    * round's regen), and parquet cannot split inside a row group — so every
    * scan-stage map (filter, projection math, explode, signature hashing,
    * partial aggregation) runs on ONE task regardless of
    * `spark.sql.files.maxPartitionBytes`, serializing the front of every
    * query on one core of 32 (measured: j2's shingle+MinHash stage 2.0 s
    * in 1 row-bearing task; h3's projection+sort-sample passes ~1.1 s each).
    *
    * The floor is DATA-DERIVED, not environment-tuned: footers are read
    * once per (path, session-parallelism) and the round-robin repartition
    * only fires when the file's natural split units (row groups; files
    * short-circuit the footer walk when numerous) cover less than half the
    * session's cores AND the table is large enough to amortize the
    * exchange (≥ 64 rows per target partition). On a production table —
    * thousands of files × many row groups — `units*2 <= cores` is false
    * and this is a zero-cost no-op; it exists exactly for few-giant-row-
    * group inputs, where one extra metadata-sized exchange buys back the
    * whole cluster's parallelism.
    *
    * NOT applied inside [[table]]: measured over the full 228-query sweep,
    * a blanket floor wins big exactly where the scan stage does heavy
    * per-row work (shingling/MinHash, explodes, multi-NDV Expand, wide
    * math projections: j2 4.17→1.07 s, d17 5.68→2.99, h3 4.18→1.59,
    * j18 4.60→2.40, 21 queries, −32 s total) but TAXES every trivial-map
    * query ~0.4–1.0 s (the 1-task sort+write+read round-trip of the extra
    * exchange buys nothing when the first needed exchange redistributes
    * anyway: 53 queries, +23 s, m-family/g-family/e-family across the
    * board, headline warm total 2.25→4.28 s). So the floor is OPT-IN at
    * the pipelines whose scan-stage compute dominates — the `*Spread`
    * loaders below.
    */
  private val layoutCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, Long)]()

  private def parquetUnits(spark: SparkSession, path: String, cap: Int)
      : (Int, Long) =
    layoutCache.computeIfAbsent(s"$path#$cap", _ => {
      val f = new java.io.File(path)
      val files: Seq[String] =
        if (f.isDirectory)
          f.listFiles().toSeq.map(_.getPath)
            .filter(p => p.endsWith(".parquet") && !p.contains("/_"))
        else Seq(path)
      if (files.size >= cap) (files.size, Long.MaxValue)
      else {
        val conf = spark.sessionState.newHadoopConf()
        var units = 0
        var rows = 0L
        files.foreach { fp =>
          val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(fp), conf))
          try {
            units += rd.getRowGroups.size()
            rows += rd.getRecordCount
          } finally rd.close()
        }
        (units, rows)
      }
    })

  private[graft] def spread(spark: SparkSession, df: DataFrame,
      path: String): DataFrame = {
    val p = spark.sparkContext.defaultParallelism
    val (units, rows) = parquetUnits(spark, path, p)
    if (units * 2 <= p && rows >= 64L * p) df.repartition(p) else df
  }

  /** Parallelism-floored loaders for the scan-compute-heavy pipelines
    * (see [[spread]] for the measured blanket-vs-opt-in trade). Use these
    * where the first stage over the table does real per-row work BEFORE
    * any exchange; keep the plain loaders where the map side is a trivial
    * filter/projection into a needed shuffle.
    */
  def lineitemSpread(s: SparkSession, d: String): DataFrame =
    spread(s, lineitem(s, d), s"$d/lineitem.parquet")
  def documentsSpread(s: SparkSession, d: String): DataFrame =
    spread(s, documents(s, d), s"$d/documents.parquet")
  def embeddingsSpread(s: SparkSession, d: String): DataFrame =
    spread(s, embeddings(s, d), s"$d/embeddings.parquet")
  def eventsSpread(s: SparkSession, d: String): DataFrame =
    spread(s, events(s, d), s"$d/events.parquet")

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
