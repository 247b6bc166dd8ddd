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

  test("rowsink V2 write commits once, checksum partition-invariant") {
    import graft.sources.RowSinkRegistry
    val t = "fs-happy"
    RowSinkRegistry.clear(t)
    val df = Tables.events(spark, d)
      .select("event_id", "user_id", "event_type", "value")
    df.write.format("graft-rowsink").option("target", t)
      .mode("append").save()
    val first = RowSinkRegistry.get(t).get
    assert(first.rows == df.count(), s"committed ${first.rows} rows")
    // the same data written through a different partitioning must commit
    // the identical checksum — the XOR aggregate is order/partition-free,
    // which is what makes it meaningful under speculation and retries
    RowSinkRegistry.clear(t)
    df.repartition(7).write.format("graft-rowsink").option("target", t)
      .mode("append").save()
    val second = RowSinkRegistry.get(t).get
    assert(second == first,
      s"repartitioned write committed differently: $second vs $first")
    assert(RowSinkRegistry.abortCount(t) == 0)
  }

  test("rowsink commit protocol: duplicate attempt never double-counts") {
    import graft.sources.{RowSinkBatchWrite, RowSinkTaskResult, RowSinkRegistry, RowSinkWriterFactory}
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(StructField("k", LongType)))
    val rows = (1L to 100L).map(v => InternalRow(v))
    val factory = new RowSinkWriterFactory(schema)
    // the attempt race: two writers for the SAME partition (speculation /
    // retry); both run to completion, but the engine delivers only ONE
    // commit message to the driver — that asymmetry, not anything the
    // writers do, is what makes the write exactly-once
    val attempt0 = factory.createWriter(0, taskId = 1L)
    val attempt1 = factory.createWriter(0, taskId = 2L)
    rows.foreach(attempt0.write); rows.foreach(attempt1.write)
    val winner = attempt0.commit().asInstanceOf[RowSinkTaskResult]
    attempt1.abort() // loser attempt: nothing external to undo
    val t = "fs-race"
    RowSinkRegistry.clear(t)
    new RowSinkBatchWrite(t, schema).commit(Array(winner))
    val got = RowSinkRegistry.get(t).get
    assert(got.rows == 100L, s"duplicate attempt double-counted: $got")
    // job-level abort publishes NOTHING (atomicity) and is observable
    val t2 = "fs-abort"
    RowSinkRegistry.clear(t2)
    new RowSinkBatchWrite(t2, schema).abort(Array(winner))
    assert(RowSinkRegistry.get(t2).isEmpty &&
      RowSinkRegistry.abortCount(t2) == 1L)
  }

  test("binaryFile ingests raw blobs with glob pruning into the media pipeline") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bin")
    val payloads = (0 until 4).map { i =>
      val bytes = Array.tabulate[Byte](64 + i)(j => ((i * 31 + j) % 251).toByte)
      val ext = if (i % 2 == 0) "jpg" else "txt"
      java.nio.file.Files.write(dir.resolve(s"asset_$i.$ext"), bytes)
      (s"asset_$i.$ext", bytes)
    }.toMap
    // glob prunes at listing time: only the two .jpg files become rows
    val jpgs = Formats.readBinaryFiles(spark, dir.toString, "*.jpg")
    assert(jpgs.count() == 2)
    val byName = jpgs.select(col("path"), col("length"), col("content"))
      .collect()
      .map(r => (r.getString(0).split('/').last,
        (r.getLong(1), r.getAs[Array[Byte]](2)))).toMap
    byName.foreach { case (name, (len, content)) =>
      assert(payloads(name).sameElements(content) &&
        len == payloads(name).length, s"$name content mismatch")
    }
    // and the blobs flow into the multimodal decode stage unchanged
    val items = jpgs.select(
        expr("cast(regexp_extract(path, 'asset_([0-9]+)', 1) as long)")
          .as("media_id"),
        lit("image/jpeg").as("mime"), col("content").as("payload"))
      .as[graft.multimodal.MediaItem]
    val feats = graft.multimodal.MediaPipeline.extractFeatures(items).collect()
    assert(feats.length == 2 && feats.forall(f =>
      f.features.length == 16 && math.abs(f.features.sum - 1.0) < 1e-9))
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

  test("events reader: ns-long layout reads identically to the µs layout") {
    // The driver's testdata has shipped `events.ts` both as timestamp[ns]
    // (read as raw longs under nanosAsLong) and as timestamp[us] (regen
    // 2026-08-13). Tables.events branches on the inferred type; this pins
    // the two paths row-for-row equal by synthesizing the ns-long layout
    // from the current data and reading it back through the same loader.
    val dir = java.nio.file.Files.createTempDirectory("graft-nsev").toString
    val current = Tables.events(spark, d)
    current
      .withColumn("ts", expr("unix_micros(ts) * 1000L"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val viaNs = Tables.events(spark, dir)
    assert(viaNs.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(viaNs.count() == current.count())
    assert(viaNs.exceptAll(current).count() == 0 &&
      current.exceptAll(viaNs).count() == 0,
      "ns-long recipe diverges from the µs pass-through")
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
