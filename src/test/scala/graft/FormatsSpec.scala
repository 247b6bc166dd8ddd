package graft

import graft.sources.Formats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FormatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("date-partitioned parquet prunes partitions on a date filter") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-part").toString
    Formats.writeDatePartitioned(Tables.events(spark, d), path)
    val all = spark.read.parquet(path)
    val week = Formats.readDateRange(spark, path,
      "2024-01-08", "2024-01-14")
    val allFiles = Formats.filesScanned(all)
    val weekFiles = Formats.filesScanned(week)
    assert(allFiles > 0 && weekFiles > 0)
    assert(weekFiles < allFiles / 2,
      s"pruning ineffective: $weekFiles of $allFiles files scanned")
    // and semantics hold: pruned read == full read + filter
    val expected = Tables.events(spark, d)
      .filter(col("ts").cast("date").between("2024-01-08", "2024-01-14"))
      .count()
    assert(week.count() == expected)
  }

  test("csv roundtrip preserves the events table (explicit schema)") {
    val path = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val events = Tables.events(spark, d)
    Formats.writeCsv(events, path)
    val back = Formats.readCsv(spark, path)
    assert(back.count() == events.count())
    val a = events.agg(sum("event_id"), sum(expr("cast(round(value*100) as bigint)"))).collect()(0)
    val b = back.agg(sum("event_id"), sum(expr("cast(round(value*100) as bigint)"))).collect()(0)
    assert(a == b, "csv roundtrip changed data")
  }

  test("zstd-compressed parquet roundtrips and actually compresses") {
    val path = java.nio.file.Files.createTempDirectory("graft-zstd").toString
    val docs = Tables.documents(spark, d)
    docs.write.option("compression", "zstd").mode("overwrite")
      .parquet(path)
    val back = spark.read.parquet(path)
    assert(back.count() == docs.count())
    assert(back.agg(sum(expr("length(text)"))).collect()(0) ==
      docs.agg(sum(expr("length(text)"))).collect()(0))
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty && files.forall(_.getName.contains("zstd")),
      "zstd codec not applied")
  }

  test("orc roundtrip preserves the events table at full precision") {
    val path = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val events = Tables.events(spark, d)
    Formats.writeOrc(events, path)
    val back = Formats.readOrc(spark, path)
    assert(back.schema == events.schema, "orc changed the schema")
    // µs-exact: compare summed epoch micros, not just counts
    val a = events.agg(sum(expr("unix_micros(ts)")), sum("event_id"))
      .collect()(0)
    val b = back.agg(sum(expr("unix_micros(ts)")), sum("event_id"))
      .collect()(0)
    assert(a == b, "orc roundtrip changed data")
  }

  test("json-lines roundtrip preserves the events table") {
    val path = java.nio.file.Files.createTempDirectory("graft-json").toString
    val events = Tables.events(spark, d)
    Formats.writeJsonLines(events, path)
    val back = Formats.readJsonLines(spark, path)
    assert(back.count() == events.count())
    assert(back.agg(sum("user_id")).collect()(0) ==
      events.agg(sum("user_id")).collect()(0))
  }
}
