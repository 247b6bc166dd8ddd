package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Batch source/sink format surface beyond plain parquet: Hive-style
  * date-partitioned parquet (partition pruning — the #1 scan-cost lever at
  * 100 TB: a day-ranged query over years of data must touch only the
  * matching directories), plus CSV and JSON lines interchange with explicit
  * schemas (never inference in production paths).
  *
  * (`format("avro")` needs the spark-avro connector jar, which doesn't ship
  * in this environment; parquet/orc/csv/json/text/binaryFile are the
  * supported formats — ORC via the native `orc-core` that Spark bundles.)
  */
object Formats {

  /** Write events Hive-partitioned by event date: `.../ev_date=2024-01-07/`.
    * At scale the partition column is the dominant pruning axis (date,
    * tenant, source); one directory per value.
    */
  def writeDatePartitioned(events: DataFrame, path: String): Unit =
    events
      .withColumn("ev_date", col("ts").cast("date"))
      .write
      .partitionBy("ev_date")
      .mode(SaveMode.Overwrite)
      .parquet(path)

  /** Read back with partition pruning: a filter on `ev_date` is resolved
    * against directory names only — non-matching partitions are never
    * listed, opened, or scanned.
    */
  def readDateRange(
      spark: SparkSession, path: String,
      fromDate: String, toDate: String): DataFrame =
    spark.read.parquet(path)
      .filter(col("ev_date").between(fromDate, toDate))

  val EventsCsvSchema =
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, " +
      "value DOUBLE, props STRING"

  // default timestampFormat caps at milliseconds — events carry microsecond
  // precision, so write/read with an explicit micros pattern
  private val TsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("timestampFormat", TsFormat)
      .csv(path)

  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(EventsCsvSchema)
      .option("header", "true")
      .option("timestampFormat", TsFormat)
      .csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("timestampFormat", TsFormat)
      .json(path)

  def readJsonLines(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(EventsCsvSchema)
      .option("timestampFormat", TsFormat)
      .json(path)

  /** ORC interchange — the other columnar format Spark reads natively
    * (vectorized, predicate pushdown). Schema travels in the file like
    * parquet; no explicit schema needed on read.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Raw-asset ingestion for the multimodal pipeline: `binaryFile` yields
    * one row per file — (path, modificationTime, length, content BINARY) —
    * the standard lakehouse entry point for media blobs before any decode
    * stage (`graft.multimodal.MediaPipeline` consumes `content` as the
    * opaque payload). `pathGlobFilter` prunes at the LISTING level, so a
    * `*.jpg` ingest over a mixed asset store never opens non-matching
    * files; binary files are never split, one file = one row = one task
    * input, and the codec-free scan parallelizes per file.
    */
  def readBinaryFiles(
      spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)

  /** Count the data files a query would actually scan (post-pruning). */
  def filesScanned(df: DataFrame): Long = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: FileSourceScanExec =>
        f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
          .map(_.files.size.toLong).sum
    }.getOrElse(-1L)
  }
}
