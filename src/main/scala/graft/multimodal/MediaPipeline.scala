package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media item: opaque binary payload + typed metadata, the multimodal
  * column pattern (image/audio/video travel as `binary` with a metadata
  * struct; Spark never interprets the bytes until a decode stage).
  */
final case class MediaItem(
    media_id: Long, mime: String, payload: Array[Byte])

final case class MediaFeatures(
    media_id: Long, mime: String, n_bytes: Long, features: Array[Double])

final case class MediaFrame(
    media_id: Long, frame_no: Int, frame: Array[Byte])

/** Multimodal column plumbing (SURVEY §2 j6 / task-brief "multimodal
  * columns"). The Spark-side mechanics — schema, partition-preserving
  * `mapPartitions`, batched per-partition decode — are real and tested; the
  * decoder itself is a STUB (`fakeDecode`): this container has no image/
  * audio codecs, so it computes a deterministic 16-bin byte histogram where
  * a real deployment would plug libjpeg/ffmpeg/etc. into the same signature.
  *
  * Scale notes (100 TB of media): decode runs per-partition with no shuffle
  * — `mapPartitions` keeps the scan→decode→feature pipeline inside one
  * stage; heavy codecs amortize any per-partition init across the whole
  * partition iterator. Feature vectors then feed the `graft.queries.LlmOps`
  * similarity/dedup operators unchanged.
  */
object MediaPipeline {

  /** STUB decoder — deterministic stand-in for a real codec. Real
    * implementation would decode `payload` (e.g. JPEG → pixels) and emit
    * model-ready features; the 16-bin normalized byte histogram below keeps
    * the contract (payload → fixed-width Array[Double]) testable offline.
    */
  def fakeDecode(payload: Array[Byte]): Array[Double] = {
    val bins = new Array[Double](16)
    payload.foreach(b => bins((b & 0xff) >> 4) += 1.0)
    val total = math.max(payload.length, 1)
    bins.map(_ / total)
  }

  /** Per-partition decode + feature extraction — one stage, no shuffle. */
  def extractFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // per-partition init of a real decoder would go here (amortized)
      it.map { m =>
        MediaFeatures(m.media_id, m.mime, m.payload.length.toLong,
          fakeDecode(m.payload))
      }
    }
  }

  /** STUB resize — keeps the payload→payload contract of an image resize
    * (real impl: decode → scale → re-encode behind this same signature).
    * The deterministic stand-in keeps every `factor`-th byte, so output
    * size ≈ input/factor, mirroring a resolution downscale. Runs
    * per-partition, no shuffle — a resize stage slots into the same
    * scan→transform pipeline stage as decode.
    */
  def fakeResize(payload: Array[Byte], factor: Int): Array[Byte] =
    // O(n/factor) copy, no per-byte boxing — this models the hot path
    Array.tabulate((payload.length + factor - 1) / factor)(k =>
      payload(k * factor))

  def resize(items: Dataset[MediaItem], factor: Int = 2): Dataset[MediaItem] = {
    import items.sparkSession.implicits._
    items.mapPartitions(_.map(m =>
      m.copy(payload = fakeResize(m.payload, factor))))
  }

  /** Frame sampling — the 1:N generate stage of a video pipeline: chop the
    * payload into fixed-size "frames" and keep every `stride`-th one
    * (real impl: ffmpeg keyframe extraction behind the same signature).
    * flatMap keeps it inside one stage; output cardinality is bounded by
    * payload size / (frameBytes × stride), so a skew-heavy video corpus
    * fans out proportionally to bytes, not rows.
    */
  def sampleFrames(
      items: Dataset[MediaItem], frameBytes: Int = 64,
      stride: Int = 4): Dataset[MediaFrame] = {
    import items.sparkSession.implicits._
    items.flatMap(m =>
      m.payload.grouped(frameBytes).zipWithIndex
        .collect { case (f, i) if i % stride == 0 =>
          MediaFrame(m.media_id, i, f) })
  }

  /** Demo source: documents' text bytes as media payloads (the container has
    * no binary media fixtures; the column mechanics are identical).
    */
  def documentsAsMedia(
      spark: SparkSession, dir: String): Dataset[MediaItem] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        lit("text/plain").as("mime"),
        col("text").cast("binary").as("payload"))
      .as[MediaItem]
  }

  /** Streaming media ingest — the streaming twin of
    * `sources.Formats.readBinaryFiles`: watch a directory of raw asset
    * files (`binaryFile` source; new files = new micro-batches,
    * `Trigger.AvailableNow` = bounded-lag backfill over an existing asset
    * store), map each file to a `MediaItem` (id from the trailing digits
    * of the file name, mime from the extension), and feed the same
    * per-partition decode stages as the batch path. `pathGlobFilter`
    * prunes non-matching files at LISTING time, before any bytes move.
    *
    * Naming contract: asset files are `<anything><digits>.<ext>` — the
    * trailing digits are the media id. A file the glob admits but whose
    * name carries no id (e.g. a stray `README.txt` in the asset dir) is
    * SKIPPED with a filter here rather than killing the whole streaming
    * query when NULL hits MediaItem's non-nullable `media_id`.
    */
  def mediaFileStream(
      spark: SparkSession, dir: String,
      glob: String = "*"): Dataset[MediaItem] = {
    import spark.implicits._
    spark.readStream.format("binaryFile")
      .option("pathGlobFilter", glob)
      .schema("path STRING, modificationTime TIMESTAMP, " +
        "length BIGINT, content BINARY")
      .load(dir)
      .select(
        // try_cast: regexp_extract yields '' on no match, and an ANSI
        // cast('') would throw before the null-id filter can skip the row
        expr("""try_cast(regexp_extract(path, '([0-9]+)\\.[^.]+$', 1)
                as long)""").as("media_id"),
        expr("""CASE WHEN path LIKE '%.jpg' THEN 'image/jpeg'
                     WHEN path LIKE '%.wav' THEN 'audio/wav'
                     ELSE 'application/octet-stream' END""").as("mime"),
        col("content").as("payload"))
      .filter(col("media_id").isNotNull)
      .as[MediaItem]
  }
}
