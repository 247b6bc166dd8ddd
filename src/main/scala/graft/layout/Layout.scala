package graft.layout

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout utilities — the write-side half of the 100 TB story.
  * Joins and aggregations are only as cheap as the layout they read from:
  * bucketing pre-shuffles a fact table ONCE at write time so every
  * subsequent equi-join/aggregate on the bucket key runs shuffle-free, and
  * salting spreads a pathologically hot key across `nSalts` sub-keys when a
  * handful of keys would otherwise pin the whole stage on one task.
  */
object Layout {

  /** Write `df` as a bucketed+sorted managed table. Later equi-joins between
    * tables bucketed the same way (same column, same count) plan with zero
    * Exchange on either side — at 100 TB that deletes the dominant cost of
    * every fact-fact join on the bucket key.
    */
  def writeBucketed(
      df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int = 32): Unit =
    df.write
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .saveAsTable(table)

  /** Salted broadcast-free join for skewed keys: the build side is exploded
    * `nSalts`× (one copy per salt), the probe side picks a deterministic
    * salt from a uniform hash of its row identity, and the join key becomes
    * (key, salt) — hot keys fan out over `nSalts` tasks instead of one.
    * Use when AQE's skew-join split isn't available (e.g. the skew is in a
    * shuffled aggregation input, or the planner missed it).
    *
    * `probeSaltExpr` must be a deterministic expression over probe columns
    * (e.g. `pmod(hash(col("event_id")), lit(nSalts))`) — never rand()
    * (SURVEY §5.3 rule 6).
    */
  def saltedJoin(
      probe: DataFrame, build: DataFrame, key: String,
      probeSaltExpr: org.apache.spark.sql.Column,
      nSalts: Int = 8): DataFrame = {
    val salted = build
      .withColumn("__salt", explode(array((0 until nSalts).map(lit): _*)))
    probe
      .withColumn("__salt", probeSaltExpr)
      .join(salted, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Count Exchange (shuffle) operators in a plan — used by tests to prove
    * a layout made a join shuffle-free.
    */
  def countExchanges(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // AdaptiveSparkPlanExec is a LEAF node — a plain traversal under AQE
    // (the default) never sees the inner exchanges and reports a vacuous 0;
    // recurse into the adaptive CURRENT plan (initially: the static plan
    // AFTER EnsureRequirements — inputPlan is captured BEFORE exchange
    // insertion and would undercount to 0 always)
    def walk(p: SparkPlan): Int = {
      var n = 0
      p.foreach {
        case a: AdaptiveSparkPlanExec => n += walk(a.executedPlan)
        case _: ShuffleExchangeLike => n += 1
        case _ => ()
      }
      n
    }
    walk(df.queryExecution.executedPlan)
  }

  /** Session with a scratch warehouse for bucketed-table demos/tests. */
  def warehouseDir(spark: SparkSession): String =
    spark.conf.get("spark.sql.warehouse.dir")

  /** Small-file compaction — the table-maintenance pass every streaming or
    * incremental-ingest table needs: micro-batches and per-task writers
    * leave thousands of KB-sized files, and at 100 TB the resulting
    * footer/open overhead dominates scan cost (every file is a listing
    * entry, a footer fetch, and a scheduler task). Rewrites `srcDir` into
    * `destDir` with ceil(bytes / targetBytes) output files via an explicit
    * round-robin repartition (size-based, not key-based — compaction must
    * not skew on any column), and returns (filesBefore, filesAfter,
    * bytesBefore). The rewrite is a pure map-side pass plus the one
    * repartition exchange; on a real lakehouse this runs per partition
    * directory, bounded by the partition's own size.
    */
  def compact(
      spark: SparkSession, srcDir: String, destDir: String,
      targetBytes: Long = 128L << 20): (Long, Long, Long) = {
    val files = new java.io.File(srcDir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val bytes = files.map(_.length).sum
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(srcDir)
      .repartition(nOut)
      .write.mode("overwrite").parquet(destDir)
    val after = new java.io.File(destDir).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet")).toLong
    (files.length.toLong, after, bytes)
  }
}
