package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Type => PqType}
import org.apache.parquet.schema.LogicalTypeAnnotation.{DateLogicalTypeAnnotation, IntLogicalTypeAnnotation, StringLogicalTypeAnnotation, TimestampLogicalTypeAnnotation, TimeUnit}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The SQL/catalog + streaming surface over [[VersionedTable]] (r15
  * verdict tasks #2/#3): the same MVCC commit-log table, reachable as
  *
  *  - plain SQL text with TIME TRAVEL through a `TableCatalog` plugin —
  *    `SELECT … FROM graft_vlog.`/path/to/table` VERSION AS OF 1` (the
  *    identifier IS the table directory; `loadTable(ident, version)` is
  *    the public DSv2 time-travel hook the parser routes `VERSION AS OF`
  *    to), and
  *  - a streaming SOURCE whose offsets are COMMIT VERSIONS: the
  *    micro-batch for offsets (s, e] reads exactly the files commits
  *    s+1..e appended (IO ∝ new data, the change-feed property), with
  *    `SupportsAdmissionControl` capping each batch by FILE count — the
  *    discipline [[DocGenSource]]'s stream proved, carried to a real
  *    storage-backed table. Offsets replay exactly because commits are
  *    immutable: the checkpointed (s, e] names the same files forever.
  *    A COW commit in range fails LOUDLY (same line `readChanges` draws
  *    — a rewrite's added files are not row-level changes).
  *
  * The batch `Scan` implements both pushdown surfaces: column pruning
  * reaches the parquet readers as a per-file requested projection
  * (columns never decoded — and a projection the file cannot serve at
  * all, e.g. `count(*)` or an all-evolved projection over a
  * pre-evolution file, reads NO data pages: the row count comes from the
  * footer), and range predicates on integral columns prune whole FILES
  * through the commit log's footer-harvested stats before any reader
  * opens (`PushedFileRanges` in explain; the filters stay residual
  * above the scan, so skipping precision is a performance property,
  * never a correctness one — the same contract `readPruned` pins).
  *
  * Scale shape: planning reads the metadata log only (checkpoint +
  * tail); one input partition per data file, each opened independently
  * on its executor; snapshot resolution is pinned once per scan so a
  * concurrent commit cannot tear a query across two versions.
  *
  * Column-type support is the primitive parquet subset the row
  * materializer handles (bool/int8/16/32/64/float/double/string/binary/
  * date/timestamp-micros); an unsupported physical type fails schema
  * derivation with a clear message rather than mis-decoding.
  */
object VlogSchema {

  /** Footer (schema, rowCount), cached per absolute path: staged files
    * are IMMUTABLE (COW never rewrites in place, staging dirs are
    * uuid-named and never reused), so a footer read once is valid
    * forever — and a predicated scan of an N-group file would otherwise
    * parse the same footer once per row-group split just to build its
    * parquet filter (2N parses per file per filtered scan — r17 review).
    * Bounded by wholesale clear (no LRU bookkeeping on the hot path).
    */
  private val footerCache =
    new java.util.concurrent.ConcurrentHashMap[String, (MessageType, Long)]()

  private[sources] def footer(abs: Path): (MessageType, Long) = {
    val k = abs.toString
    val cached = footerCache.get(k)
    if (cached != null) return cached
    val in = HadoopInputFile.fromPath(
      new HPath(abs.toUri), new Configuration())
    val r = ParquetFileReader.open(in)
    try {
      val md = r.getFooter
      val out = (md.getFileMetaData.getSchema,
        md.getBlocks.asScala.map(_.getRowCount).sum)
      if (footerCache.size > 8192) footerCache.clear()
      footerCache.put(k, out)
      out
    } finally r.close()
  }

  /** Byte MIDPOINTS of a file's row groups (startingPos + compressed/2 —
    * exactly the coordinate parquet's own range filter selects blocks
    * by), the split points for row-group-granular scan partitions: a
    * multi-group file becomes one task per group instead of one task
    * per FILE, the difference between a 1 GB file serializing on one
    * core and scanning 8-way (r17 — the native reader splits, so must
    * we).
    */
  private[graft] def rowGroupMidpoints(abs: Path): Seq[Long] = {
    val in = HadoopInputFile.fromPath(
      new HPath(abs.toUri), new Configuration())
    val r = ParquetFileReader.open(in)
    try r.getFooter.getBlocks.asScala.toSeq
      .map(b => b.getStartingPos + b.getCompressedSize / 2)
    finally r.close()
  }

  private def unsupported(f: PqType, why: String): Nothing =
    sys.error(s"graft-vlog cannot serve column '${f.getName}': $why " +
      "(the SQL/stream surface decodes the primitive parquet subset — " +
      "read this table through VersionedTable.read instead)")

  private[sources] def toCatalyst(f: PqType): StructField = {
    if (!f.isPrimitive || f.isRepetition(PqType.Repetition.REPEATED))
      unsupported(f, "nested/repeated types are not supported")
    val p = f.asPrimitiveType()
    val lt = p.getLogicalTypeAnnotation
    val dt: DataType = p.getPrimitiveTypeName match {
      case PrimitiveTypeName.BOOLEAN => BooleanType
      case PrimitiveTypeName.FLOAT => FloatType
      case PrimitiveTypeName.DOUBLE => DoubleType
      case PrimitiveTypeName.INT32 => lt match {
        case null => IntegerType
        case _: DateLogicalTypeAnnotation => DateType
        case i: IntLogicalTypeAnnotation if i.isSigned =>
          i.getBitWidth match {
            case 8 => ByteType
            case 16 => ShortType
            case _ => IntegerType
          }
        case other => unsupported(f, s"INT32 with $other")
      }
      case PrimitiveTypeName.INT64 => lt match {
        case null => LongType
        case i: IntLogicalTypeAnnotation if i.isSigned => LongType
        case t: TimestampLogicalTypeAnnotation
            if t.getUnit == TimeUnit.MICROS =>
          // micros are Catalyst's own internal representation for both
          // timestamp flavors — the value passes through untouched
          if (t.isAdjustedToUTC) TimestampType else TimestampNTZType
        case other => unsupported(f, s"INT64 with $other")
      }
      case PrimitiveTypeName.BINARY => lt match {
        case _: StringLogicalTypeAnnotation => StringType
        case null => BinaryType
        case other => unsupported(f, s"BINARY with $other")
      }
      case other =>
        unsupported(f, s"physical type $other (INT96 timestamps need " +
          "spark.sql.parquet.outputTimestampType=TIMESTAMP_MICROS at " +
          "write time)")
    }
    // nullable across the board: in a multi-file snapshot another file
    // may lack the column entirely (additive evolution), so requiredness
    // of one file's footer proves nothing table-wide
    StructField(f.getName, dt, nullable = true)
  }

  /** The snapshot's merged schema: the union of the live files' footer
    * schemas by name, first occurrence fixing the type (additive
    * evolution appends columns; a TYPE change across files is refused
    * loudly). Footer metadata reads only — one per distinct staged
    * write at 100 TB, never a data scan.
    */
  private[sources] def mergedSchema(dir: String, asOf: Option[Long])
      : StructType =
    mergedSchemaOf(dir, VersionedTable.liveFiles(dir, asOf),
      s"snapshot of $dir")

  /** The by-name footer-schema union of an explicit file list (shared by
    * the snapshot schema above and the `@changes` table, whose schema is
    * the union of the RANGE's files only — matching `readChangeFeed`'s
    * mergeSchema read exactly).
    */
  private[sources] def mergedSchemaOf(dir: String, files: Seq[String],
      what: String): StructType = {
    require(files.nonEmpty, s"$what holds no files")
    val out = scala.collection.mutable.LinkedHashMap.empty[String, StructField]
    files.foreach { f =>
      footer(Paths.get(dir, f))._1.getFields.asScala.foreach { pf =>
        val sf = toCatalyst(pf)
        out.get(sf.name) match {
          case None => out += sf.name -> sf
          case Some(prev) if prev.dataType == sf.dataType => ()
          case Some(prev) =>
            sys.error(s"column '${sf.name}' changes type across the " +
              s"snapshot's files (${prev.dataType} vs ${sf.dataType}) — " +
              "only ADDITIVE evolution is supported")
        }
      }
    }
    StructType(out.values.toSeq)
  }
}

class VlogSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-vlog"

  private def dirOf(opts: CaseInsensitiveStringMap): String = {
    val d = Option(opts.get("path")).orElse(Option(opts.get("dir")))
    require(d.nonEmpty, "graft-vlog needs .option(\"path\", <table dir>) " +
      "or .load(<table dir>)")
    d.get
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    VlogSchema.mergedSchema(dirOf(options),
      Option(options.get("version")).map(_.toLong))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new VlogTable(dirOf(opts),
      Option(opts.get("version")).map(_.toLong),
      Option(opts.get("maxFilesPerBatch")).map(_.toInt)
        .getOrElse(VlogTable.DefaultMaxFilesPerBatch),
      Option(opts.get("startingVersion")).map(_.toLong).getOrElse(0L))
  }
}

final class VlogTable(dir: String, asOf: Option[Long],
    maxFilesPerBatch: Int, startingVersion: Long)
    extends Table
    with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {
  override def name(): String =
    s"graft-vlog($dir${asOf.map(v => s"@v$v").getOrElse("")})"
  // computed once per Table instance (Spark loads a fresh Table per
  // query): analysis calls schema() several times, and each merge pass
  // reads every live file's footer — r16 review
  private lazy val mergedOnce: StructType =
    VlogSchema.mergedSchema(dir, asOf)
  override def schema(): StructType = mergedOnce
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new VlogScanBuilder(dir, asOf, schema(), maxFilesPerBatch,
      startingVersion)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    require(asOf.isEmpty,
      "cannot write INTO a time-travel snapshot — writes go to the head")
    new VlogWriteBuilder(dir, info)
  }

  /** SQL MERGE INTO / UPDATE (and DELETEs whose predicates the metadata
    * path declines) — group-based copy-on-write through the commit
    * protocol, with runtime group filtering bounding the rewrite to the
    * files that actually hold matched rows. See [[VlogRowLevelOperation]].
    */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    require(asOf.isEmpty,
      "cannot run row-level SQL against a time-travel snapshot")
    new VlogRowLevelBuilder(dir, info)
  }

  /** `_file` — the data file a row lives in: the group identity the
    * runtime group filter prunes row-level rewrites by (and a useful
    * audit column in its own right, the Iceberg convention).
    */
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    VlogTable.MetaCols

  /** `DELETE FROM graft_vlog.`/dir`` WHERE …` — the filters translate to
    * one Column predicate and route through [[VersionedTable.delete]]'s
    * file-granular COW (probe finds the touched files, only those
    * rewrite, one atomic version), with the filters' range envelopes
    * passed as probe-prune hints so a clustered-key DELETE never even
    * probes non-overlapping files. `canDeleteWhere` declines any filter
    * outside the translatable set, so Spark reports "cannot delete"
    * instead of this table guessing at semantics. SQL three-valued
    * logic: DELETE removes only rows where the condition is TRUE, while
    * the Column API's delete counts NULL as matched — so the translated
    * predicate is wrapped `coalesce(cond, false)` (r16 review: the
    * unwrapped routing silently deleted NULL-evaluating rows).
    */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    asOf.isEmpty && filters.forall(f => VlogTable.toColumn(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    // no filters = DELETE FROM t (delete everything): lit(true)
    val cond = filters.flatMap(VlogTable.toColumn)
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    VersionedTable.delete(spark, dir,
      org.apache.spark.sql.functions.coalesce(cond,
        org.apache.spark.sql.functions.lit(false)),
      VlogTable.filterRanges(filters))
  }
}

object VlogTable {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col, lit, not}

  /** Streaming admission default: files per micro-batch. */
  val DefaultMaxFilesPerBatch = 16

  /** The `_file` metadata column: absolute path of the row's data file. */
  val FileCol = "_file"

  /** Change-feed metadata columns (Delta CDF's contract), served as
    * per-partition constants by the readers when the partition carries a
    * commit version (the `@changes` table).
    */
  val CommitVersionCol = "_commit_version"
  val ChangeTypeCol = "_change_type"

  /** The constant columns a partition's reader serves itself (never
    * decoded from parquet): `_file` always; the CDF pair when the
    * partition is a change-feed member.
    */
  private[sources] def metaConstants(
      p: VlogInputPartition): Map[String, Any] =
    if (p.commitVersion >= 0)
      Map(FileCol -> p.absPath, CommitVersionCol -> p.commitVersion,
        ChangeTypeCol -> "insert")
    else Map(FileCol -> p.absPath)

  private[sources] val MetaCols
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = FileCol
      override def dataType(): org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.StringType
      override def isNullable: Boolean = false
      override def comment(): String =
        "absolute path of the data file the row lives in"
    })

  /** Intersect an existing envelope map with the constraints of more
    * filters — the incremental form of [[filterRanges]] (sound for the
    * same reason: intersecting over-approximations over-approximates
    * the intersection).
    */
  private[sources] def mergeRanges(base: Map[String, (Long, Long)],
      filters: Array[Filter]): Map[String, (Long, Long)] = {
    val add = filterRanges(filters)
    (base.keySet ++ add.keySet).map { k =>
      val (l0, h0) = base.getOrElse(k, (Long.MinValue, Long.MaxValue))
      val (l1, h1) = add.getOrElse(k, (Long.MinValue, Long.MaxValue))
      k -> (math.max(l0, l1), math.min(h0, h1))
    }.toMap
  }

  /** DSv2 Filter → Column, for the translatable subset (None = decline
    * the whole DELETE — never approximate a predicate that rewrites
    * data). NULL-semantics note: [[VersionedTable.delete]] treats a
    * NULL-valued predicate as matched, which coincides with SQL DELETE
    * for these filters because IsNull/IsNotNull are the only NULL-aware
    * members and both are two-valued.
    */
  private[sources] def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(c, v) => Some(col(c) === lit(v))
    case GreaterThan(c, v) => Some(col(c) > lit(v))
    case GreaterThanOrEqual(c, v) => Some(col(c) >= lit(v))
    case LessThan(c, v) => Some(col(c) < lit(v))
    case LessThanOrEqual(c, v) => Some(col(c) <= lit(v))
    case org.apache.spark.sql.sources.In(c, vs) =>
      Some(col(c).isin(vs.toIndexedSeq: _*))
    case org.apache.spark.sql.sources.IsNull(c) => Some(col(c).isNull)
    case org.apache.spark.sql.sources.IsNotNull(c) => Some(col(c).isNotNull)
    case org.apache.spark.sql.sources.And(l, r) =>
      for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
    case org.apache.spark.sql.sources.Or(l, r) =>
      for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
    case org.apache.spark.sql.sources.Not(x) => toColumn(x).map(not)
    case _ => None
  }

  /** A filter value as the exact integer the footer stats envelope is in
    * (r16 verdict task #2 — time-typed skipping): integrals pass through;
    * timestamps map to their epoch-MICROS (exactly the INT64 value
    * parquet stores for both timestamp flavors — Instant/Timestamp for
    * TIMESTAMP, LocalDateTime for TIMESTAMP_NTZ, which is TZ-free by
    * definition), dates to epoch DAYS (the INT32 value). All conversions
    * are exact, so the envelope stays a sound over-approximation.
    */
  private[sources] def statLong(v: Any): Option[Long] = {
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    v match {
      case l: Long => Some(l)
      case i: Int => Some(i.toLong)
      case s: Short => Some(s.toLong)
      case b: Byte => Some(b.toLong)
      case t: java.sql.Timestamp => Some(DateTimeUtils.fromJavaTimestamp(t))
      case i: java.time.Instant => Some(DateTimeUtils.instantToMicros(i))
      case dt: java.time.LocalDateTime =>
        Some(DateTimeUtils.localDateTimeToMicros(dt))
      case d: java.sql.Date => Some(DateTimeUtils.fromJavaDate(d).toLong)
      case d: java.time.LocalDate => Some(d.toEpochDay)
      case _ => None
    }
  }

  /** Conservative per-column [lo, hi] envelopes from a CONJUNCTION of
    * filters (deleteWhere's array is implicitly ANDed): each simple
    * integral/temporal comparison narrows its column's envelope; Or/Not/
    * complex members contribute nothing (no constraint). Sound as
    * probe-prune hints because every envelope CONTAINS its filter's
    * matching set and intersecting over-approximations
    * over-approximates the intersection.
    */
  private[sources] def filterRanges(
      filters: Array[Filter]): Map[String, (Long, Long)] = {
    def long(v: Any): Option[Long] = statLong(v)
    var ranges = Map.empty[String, (Long, Long)]
    def note(c: String, lo: Long, hi: Long): Unit = {
      val (l0, h0) = ranges.getOrElse(c, (Long.MinValue, Long.MaxValue))
      ranges += c -> (math.max(l0, lo), math.min(h0, hi))
    }
    filters.foreach {
      case EqualTo(c, v) => long(v).foreach(l => note(c, l, l))
      case GreaterThan(c, v) => long(v).foreach(l => note(c, l, Long.MaxValue))
      case GreaterThanOrEqual(c, v) =>
        long(v).foreach(l => note(c, l, Long.MaxValue))
      case LessThan(c, v) => long(v).foreach(l => note(c, Long.MinValue, l))
      case LessThanOrEqual(c, v) =>
        long(v).foreach(l => note(c, Long.MinValue, l))
      case _ => ()
    }
    ranges
  }
}

final class VlogScanBuilder(dir: String, asOf: Option[Long],
    full: StructType, maxFilesPerBatch: Int, startingVersion: Long)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {

  private var required: StructType = full
  private var accepted: Array[Filter] = Array.empty
  // per-column conservative [lo, hi] envelopes for FILE skipping
  private var ranges: Map[String, (Long, Long)] = Map.empty
  // point-lookup conjuncts (=, IN) for executor-side ROW-GROUP skipping
  // through parquet's stats/dictionary/bloom filtering
  private var points: Seq[VlogPointPred] = Seq.empty
  private var pushedAgg
      : Option[org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation] = None

  // integrals pass through; timestamps/dates map to the exact
  // micros/days integers the footer stats are in (VlogTable.statLong)
  private def long(v: Any): Option[Long] = VlogTable.statLong(v)

  /** EVERY filter stays residual (Spark re-evaluates above the scan);
    * integral AND temporal range predicates are ADDITIONALLY recorded as
    * conservative per-column envelopes that prune whole files through the log stats —
    * sound by construction because a recorded envelope always CONTAINS
    * the filter's matching set (GreaterThan keeps the closed bound: one
    * extra boundary file beats an overflow bug), and stats-less files
    * are never skipped.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def note(col: String, lo: Long, hi: Long): Unit = {
      val (l0, h0) = ranges.getOrElse(col, (Long.MinValue, Long.MaxValue))
      ranges += col -> (math.max(l0, lo), math.min(h0, hi))
    }
    accepted = filters.filter {
      case EqualTo(c, v) =>
        long(v).exists { l => note(c, l, l); true } || (v match {
          // string equality has no integer envelope, but parquet's
          // dictionary/bloom row-group filtering can serve it
          // executor-side — record it as a point conjunct
          case s: String =>
            points :+= VlogPointPred(c, Seq.empty, Seq(s)); true
          case _ => false
        })
      case GreaterThan(c, v) =>
        long(v).exists { l => note(c, l, Long.MaxValue); true }
      case GreaterThanOrEqual(c, v) =>
        long(v).exists { l => note(c, l, Long.MaxValue); true }
      case LessThan(c, v) =>
        long(v).exists { l => note(c, Long.MinValue, l); true }
      case LessThanOrEqual(c, v) =>
        long(v).exists { l => note(c, Long.MinValue, l); true }
      case In(c, vs) if vs.nonEmpty =>
        // NULL members can never equal — dropping them only shrinks the
        // OR toward the true matching set
        val nn = vs.filter(_ != null)
        val ls = nn.flatMap(long(_))
        if (nn.nonEmpty && ls.length == nn.length) {
          // integral/temporal IN: the value-set envelope prunes FILES
          // through the log stats, the exact point set prunes ROW
          // GROUPS through parquet stats + blooms. Oversized sets keep
          // only the envelope (VlogFilters.MaxPointValues — the point
          // set rides every task's serialization)
          note(c, ls.min, ls.max)
          if (ls.length <= VlogFilters.MaxPointValues)
            points :+= VlogPointPred(c, ls.toSeq, Seq.empty)
          true
        } else if (nn.nonEmpty && nn.forall(_.isInstanceOf[String]) &&
            nn.length <= VlogFilters.MaxPointValues) {
          points :+= VlogPointPred(c, Seq.empty,
            nn.toSeq.map(_.asInstanceOf[String]))
          true
        } else false
      case IsNull(c) =>
        // exact from per-group NULL COUNTS: skips every fully-populated
        // group (the "which rows still lack the evolved column" audit)
        points :+= VlogPointPred.isNull(c, test = true); true
      case IsNotNull(c) =>
        points :+= VlogPointPred.isNull(c, test = false); true
      case _ => false
    }
    filters // all residual — skipping is an optimization, never semantics
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Footer-answered aggregates ([[VlogAggScanImpl]]): accepted only for
    * ungrouped count/count(col)/min/max requests — and, defensively,
    * only when NO filter reached this builder (vlog filters are all
    * residual, so Spark's own postScanFilters gate already blocks the
    * filtered case; a future engine that pushed both would silently
    * over-count without this guard). `supportCompletePushDown` stays
    * false on purpose: the scan returns per-bundle PARTIAL rows so the
    * footer walk fans across executors and Spark's final aggregate
    * folds them — complete pushdown would serialize 100k footer opens
    * on the driver.
    */
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Boolean = false

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Boolean = {
    val ok = accepted.isEmpty && ranges.isEmpty && points.isEmpty &&
      VlogAggScan.supported(agg, full)
    if (ok) pushedAgg = Some(agg)
    ok
  }

  override def build(): Scan = pushedAgg match {
    case Some(agg) =>
      new VlogAggScanImpl(dir, asOf, agg.aggregateExpressions, full)
    case None =>
      new VlogScan(dir, asOf, required, full, ranges, points,
        maxFilesPerBatch, startingVersion)
  }
}

final class VlogScan(dir: String, asOf: Option[Long], required: StructType,
    full: StructType,
    ranges: Map[String, (Long, Long)], points: Seq[VlogPointPred],
    maxFilesPerBatch: Int,
    startingVersion: Long) extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {

  // snapshot pinned ONCE per scan: a concurrent commit between explain,
  // planInputPartitions, and a re-plan must not tear the query across
  // two versions (batch path only; the stream pins per micro-batch)
  private lazy val pinned: Long =
    asOf.getOrElse(VersionedTable.currentVersion(dir))

  // runtime-narrowed copies of the planning-time hints: a join's small
  // side delivers its key values here (SupportsRuntimeFiltering — the
  // Iceberg dynamic-file-pruning shape), narrowing BOTH the file-level
  // log-stats prune and the executor-side row-group skip
  @volatile private var rtRanges: Map[String, (Long, Long)] = ranges
  @volatile private var rtPoints: Seq[VlogPointPred] = points
  @volatile private var keptCache: Seq[String] = null
  @volatile private var splitsCache: Array[InputPartition] = null

  /** Any column of the scan's OUTPUT can carry a runtime filter (file
    * pruning falls back to "keep" for unstatted keys, and the
    * reader-side parquet filter serves the rest — both conservative).
    * `required`, NOT `full`: Spark resolves these refs against the
    * pruned scan output and throws on a column the projection dropped.
    */
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    required.fields.map(f =>
      org.apache.spark.sql.connector.expressions.Expressions.column(f.name))

  /** Runtime filters are PRUNING-ONLY hints (the join re-evaluates its
    * own condition exactly, the same contract as every pushed filter
    * here): fold the deliverable shapes, drop the rest, and invalidate
    * the file/split caches so the next planInputPartitions re-prunes.
    */
  override def filter(filters: Array[Filter]): Unit = {
    def narrow(c: String, lo: Long, hi: Long): Unit = {
      val (l0, h0) = rtRanges.getOrElse(c, (Long.MinValue, Long.MaxValue))
      rtRanges += c -> (math.max(l0, lo), math.min(h0, hi))
    }
    filters.foreach {
      case In(c, vs) if vs != null && vs.nonEmpty =>
        val nn = vs.filter(_ != null)
        val ls = nn.flatMap(v => VlogTable.statLong(v))
        if (nn.nonEmpty && ls.length == nn.length) {
          narrow(c, ls.min, ls.max)
          // a broadcast dim can deliver 100k+ keys — over the cap the
          // envelope alone prunes (task serialization carries the set)
          if (ls.length <= VlogFilters.MaxPointValues)
            rtPoints :+= VlogPointPred(c, ls.toSeq, Seq.empty)
        } else if (nn.nonEmpty && nn.forall(_.isInstanceOf[String]) &&
            nn.length <= VlogFilters.MaxPointValues)
          rtPoints :+= VlogPointPred(c, Seq.empty,
            nn.toSeq.map(_.asInstanceOf[String]))
      case EqualTo(c, v) =>
        VlogTable.statLong(v) match {
          case Some(l) =>
            narrow(c, l, l)
            rtPoints :+= VlogPointPred(c, Seq(l), Seq.empty)
          case None => v match {
            case s: String =>
              rtPoints :+= VlogPointPred(c, Seq.empty, Seq(s))
            case _ => ()
          }
        }
      case _ => () // pruning is optional; an undeliverable shape skips nothing
    }
    keptCache = null
    splitsCache = null
  }

  // ONE log replay serves every envelope check (each pruneFiles call
  // replays the log itself — r16 review); a file survives iff every
  // hinted key's stats overlap, unstatted keys never skip. Cached with
  // invalidation (not lazy) because a runtime filter must re-prune.
  private def keptFiles: Seq[String] = {
    var k = keptCache
    if (k == null) {
      val rs = rtRanges
      k = VersionedTable.liveEntriesReplaying(dir, Some(pinned))._1
        .filter { case (_, sts) =>
          rs.forall { case (key, (lo, hi)) =>
            sts.get(key).forall(st => st.max >= lo && st.min <= hi)
          }
        }.map(_._1)
      keptCache = k
    }
    k
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = {
    val rs = ranges.toSeq.sortBy(_._1)
      .map { case (k, (lo, hi)) => s"$k∈[$lo,$hi]" }.mkString(", ")
    val ps = points.map { p =>
      p.nullTest match {
        case Some(t) => s"${p.col} IS ${if (t) "" else "NOT "}NULL"
        case None => s"${p.col}∈{${(
          p.longs.map(_.toString) ++ p.strs).take(8).mkString(",")}}"
      }
    }.mkString(", ")
    s"graft-vlog $dir version=$pinned files=${keptFiles.size} " +
      s"cols=[${required.fieldNames.mkString(",")}] " +
      s"PushedFileRanges: [$rs] PushedGroupPoints: [$ps]"
  }

  /** One partition per ROW GROUP, not per file (r17): a multi-group
    * file scans group-parallel exactly like the native reader's splits
    * — each split selects its group by byte midpoint through parquet's
    * own range filter, so groups partition exactly once. Single-group
    * files (the common clustered-write case) keep the whole-file
    * partition with zero extra footer cost at read time; the planning
    * footers are driver-side metadata, the same class of read the
    * schema merge already pays — cached per scan, not recomputed per
    * planInputPartitions call (re-planning would repeat the serial
    * footer walk — r17 review); a runtime filter invalidates the cache
    * so the re-plan prunes on the delivered join keys.
    */
  private def splits: Array[InputPartition] = {
    var s = splitsCache
    if (s == null) {
      s = keptFiles.flatMap { f =>
        val abs = Paths.get(dir, f)
        val mids = VlogSchema.rowGroupMidpoints(abs)
        if (mids.size <= 1)
          Seq(VlogInputPartition(abs.toString): InputPartition)
        else mids.map(m =>
          VlogInputPartition(abs.toString, -1L, m, m + 1): InputPartition)
      }.toArray
      splitsCache = s
    }
    s
  }

  override def planInputPartitions(): Array[InputPartition] = splits

  override def createReaderFactory(): PartitionReaderFactory =
    new VlogReaderFactory(required, rtRanges, rtPoints)

  /** POST-pruning statistics from filesystem metadata (Files.size of the
    * kept files — no footer opens, no data reads): without this a DSv2
    * scan defaults to "unknown = huge" and a small vlog dimension table
    * could NEVER be broadcast in a join, forcing a shuffle the optimizer
    * had every right to avoid (PlanSpec-shape test pins the BHJ).
    * Raw parquet bytes are scaled by `spark.sql.sources.fileCompressionFactor`
    * — exactly the expansion Spark's own FileScan applies — so a table
    * several times the broadcast threshold IN MEMORY cannot masquerade
    * as broadcast-sized through compression (r16 advice).
    */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      private val factor = org.apache.spark.sql.internal.SQLConf.get
        .fileCompressionFactor
      private val bytes = (keptFiles.map { f =>
        try Files.size(Paths.get(dir, f)) catch {
          case scala.util.control.NonFatal(_) => 0L }
      }.sum * factor).toLong
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }

  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream = {
    require(asOf.isEmpty,
      "cannot stream FROM a time-travel snapshot — use " +
        "startingVersion to begin the stream at an old commit instead")
    new VlogMicroBatchStream(dir, startingVersion, maxFilesPerBatch,
      required, full)
  }
}

/** `commitVersion` ≥ 0 marks a CHANGE-FEED partition: the reader then
  * serves the `_commit_version`/`_change_type` metadata columns as
  * per-partition constants (the version that added this file; the only
  * row-level change an append-shaped commit carries is "insert").
  * `rangeStart` ≥ 0 marks a ROW-GROUP SPLIT: the reader serves only the
  * row groups whose byte midpoint falls in [rangeStart, rangeEnd) —
  * parquet's own block-selection coordinate, so splits partition a
  * file's groups exactly once with no overlap.
  */
final case class VlogInputPartition(absPath: String,
    commitVersion: Long = -1L, rangeStart: Long = -1L,
    rangeEnd: Long = -1L) extends InputPartition

/** One reader per data file. The requested projection is intersected
  * with the FILE's own footer schema, so a pre-evolution file serves
  * NULL for evolved columns; a projection the file cannot serve at all
  * (empty intersection — `count(*)`, or all-evolved columns) never opens
  * a record reader: the footer's row count drives `rowsOnly` emission of
  * all-null/zero-width rows, zero data pages read.
  */
final class VlogReaderFactory(required: StructType,
    ranges: Map[String, (Long, Long)] = Map.empty,
    points: Seq[VlogPointPred] = Seq.empty)
    extends PartitionReaderFactory {

  /** Every type that survives schema derivation decodes columnar, so
    * batch scans always take the vectorized path ([[VlogColumnarReader]]
    * — r16 verdict task #4); the row reader below stays as the
    * engine-driven fallback for row-based exec paths and as the
    * differential twin the spec pins the columnar decode against.
    */
  override def supportColumnarReads(partition: InputPartition): Boolean =
    true

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    VlogColumnarReader.open(
      partition.asInstanceOf[VlogInputPartition], required, ranges, points)

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[VlogInputPartition]
    // a row-group split's range is expressed through ParquetFileReader's
    // options, which the Group-based reader below cannot take — ranged
    // partitions serve rows as a view over the columnar decode (values
    // spec-pinned identical); whole-file partitions keep the independent
    // Group reader, the spec's differential twin
    if (p.rangeStart >= 0) {
      val inner = VlogColumnarReader.open(p, required, ranges, points)
      return new PartitionReader[InternalRow] {
        private var it: java.util.Iterator[InternalRow] =
          java.util.Collections.emptyIterator()
        private var cur: InternalRow = _
        override def next(): Boolean = {
          while (!it.hasNext) {
            if (!inner.next()) return false
            it = inner.get().rowIterator()
          }
          cur = it.next(); true
        }
        override def get(): InternalRow = cur
        override def close(): Unit = inner.close()
      }
    }
    val abs = Paths.get(p.absPath)
    new PartitionReader[InternalRow] {
      private val (fileSchema, rowCount) = VlogSchema.footer(abs)
      // metadata columns are served by the reader itself (the partition
      // IS the file / the commit), never decoded from parquet — so they
      // are "absent" for projection purposes and constant per row
      private val metaValue: Map[String, Any] =
        VlogTable.metaConstants(p).map { case (k, v) => k ->
          (v match { case s: String => UTF8String.fromString(s)
                     case x => x })
        }
      private def isMeta(name: String): Boolean = metaValue.contains(name)
      private val present: Array[Boolean] =
        required.fields.map(f =>
          !isMeta(f.name) && fileSchema.containsField(f.name))
      private val reader: ParquetReader[Group] =
        if (!present.exists(identity)) null
        else {
          val wanted: Array[PqType] = required.fields.zip(present).collect {
            case (f, true) => fileSchema.getType(Seq(f.name): _*)
          }
          val projection = new MessageType(fileSchema.getName, wanted: _*)
          val conf = new Configuration()
          conf.set(ReadSupport.PARQUET_READ_SCHEMA, projection.toString)
          val b = ParquetReader.builder(new GroupReadSupport(),
            new HPath(abs.toUri)).withConf(conf)
          // pushed point/range hints become parquet's OWN row-group
          // filtering (stats + dictionary + bloom) — groups that cannot
          // match are never page-read; the predicate is a conservative
          // superset test and Spark's residual filter restores exactness
          VlogFilters.forFile(fileSchema, ranges, points)
            .foreach(b.withFilter)
          b.build()
        }
      private var rowsOnly = 0L
      private var cur: Group = _

      override def next(): Boolean =
        if (reader == null) { rowsOnly += 1; rowsOnly <= rowCount }
        else { cur = reader.read(); cur != null }

      override def get(): InternalRow =
        new GenericInternalRow(required.fields.zipWithIndex.map {
          case (f, _) if isMeta(f.name) => metaValue(f.name)
          case (f, i) =>
            if (!present(i) || cur.getFieldRepetitionCount(f.name) == 0)
              null
            else value(cur, f.name, f.dataType)
        }.asInstanceOf[Array[Any]])

      private def value(g: Group, n: String, dt: DataType): Any =
        dt match {
          case LongType => java.lang.Long.valueOf(g.getLong(n, 0))
          case IntegerType => Integer.valueOf(g.getInteger(n, 0))
          case ShortType =>
            java.lang.Short.valueOf(g.getInteger(n, 0).toShort)
          case ByteType => java.lang.Byte.valueOf(g.getInteger(n, 0).toByte)
          case BooleanType => java.lang.Boolean.valueOf(g.getBoolean(n, 0))
          case DoubleType => java.lang.Double.valueOf(g.getDouble(n, 0))
          case FloatType => java.lang.Float.valueOf(g.getFloat(n, 0))
          case StringType => UTF8String.fromBytes(g.getBinary(n, 0).getBytes)
          case BinaryType => g.getBinary(n, 0).getBytes
          case TimestampType | TimestampNTZType =>
            java.lang.Long.valueOf(g.getLong(n, 0)) // micros pass through
          case DateType => Integer.valueOf(g.getInteger(n, 0)) // days
          case other => sys.error(s"unreachable: $other survived " +
            "schema derivation")
        }

      override def close(): Unit = if (reader != null) reader.close()
    }
  }
}

/** Commit-version offsets: monotone and replayable — commits are
  * immutable, so a checkpointed (start, end] names the same file set
  * forever (the determinism end-to-end exactly-once needs).
  */
final case class VlogOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

final class VlogMicroBatchStream(dir: String, startingVersion: Long,
    maxFilesPerBatch: Int, required: StructType, full: StructType)
    extends MicroBatchStream with SupportsAdmissionControl {

  /** A stream's schema is FIXED at start (the Structured Streaming
    * contract) — a column added by a later additive-evolution commit
    * would be silently absent from every delivered row for the life of
    * the query. Delta fails the stream loudly instead; so do we (r16
    * advice): the admission walk opens the footers of exactly the files
    * it is about to admit (IO ∝ new commits, the property the source
    * already has) and errors on any field the start-time schema lacks.
    */
  private def checkNoEvolution(v: Long, files: Seq[String]): Unit = {
    val known = full.fieldNames.toSet
    files.foreach { f =>
      VlogSchema.footer(Paths.get(dir, f))._1.getFields.asScala.foreach {
        pf =>
          if (!known.contains(pf.getName))
            sys.error(s"graft-vlog stream over $dir: commit $v added " +
              s"column '${pf.getName}' which the running query's schema " +
              "does not carry — restart the stream to pick up the " +
              "evolved schema (silently omitting the column would be " +
              "data loss)")
      }
    }
  }

  /** startingVersion is INCLUSIVE (the Delta convention — "begin the
    * stream AT this commit"), so the exclusive low offset is one below
    * it; the default 0 streams the table from its first commit. (r16
    * review: the first cut used the option value as the exclusive
    * offset directly, silently dropping the named commit's rows.)
    */
  override def initialOffset(): Offset = VlogOffset(startingVersion - 1)

  /** Admission by FILE count over the engine-supplied TRUE start (the
    * checkpointed position on recovery — never instance state): admit
    * whole commits until the next would push the batch past the cap,
    * always at least one. The walk validates the append-shaped contract
    * as it counts, so a COW commit fails the stream at the offset
    * boundary — loudly, before any reader serves wrong "changes".
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[VlogOffset].v
    val head = VersionedTable.currentVersion(dir)
    if (head <= s) return VlogOffset(s)
    val cap = limit match {
      case _: ReadAllAvailable => Int.MaxValue
      case m: ReadMaxFiles => math.max(1, m.maxFiles())
      case _ => math.max(1, maxFilesPerBatch)
    }
    var v = s
    var files = 0
    var batchFull = false
    while (v < head && !batchFull) {
      val adds = VersionedTable.appendCommitAdds(dir, v + 1)
      if (files > 0 && files + adds.size > cap) batchFull = true
      else {
        checkNoEvolution(v + 1, adds)
        files += adds.size
        v += 1
      }
    }
    VlogOffset(v)
  }

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxFiles(math.max(1, maxFilesPerBatch))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the admission-control entry point")

  override def deserializeOffset(json: String): Offset =
    VlogOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[VlogOffset].v,
      end.asInstanceOf[VlogOffset].v)
    (s + 1 to e).flatMap(v => VersionedTable.appendCommitAdds(dir, v))
      .map(f =>
        VlogInputPartition(Paths.get(dir, f).toString): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new VlogReaderFactory(required)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Driver-materialized metadata table — the shared scaffolding every
  * `@suffix` table rides (r17 review: history and files each carried a
  * private copy of the Scan/partition/reader wiring; the next metadata
  * table would have made a third). `rows` is evaluated once at planning
  * on the driver (these tables are metadata-bounded by construction —
  * commits, live files — never data-sized) and ships as one partition.
  */
private[sources] class VlogMetaTable(tableName: String,
    tableSchema: StructType, rows: () => Seq[InternalRow])
    extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new ScanBuilder {
    override def build(): Scan = new Scan with Batch {
      override def readSchema(): StructType = tableSchema
      override def toBatch: Batch = this
      override def description(): String = tableName
      override def planInputPartitions(): Array[InputPartition] =
        Array(VlogMetaPartition(rows()))
      override def createReaderFactory(): PartitionReaderFactory =
        new PartitionReaderFactory {
          override def createReader(partition: InputPartition)
              : PartitionReader[InternalRow] =
            new PartitionReader[InternalRow] {
              private val rs =
                partition.asInstanceOf[VlogMetaPartition].rows
              private var i = -1
              override def next(): Boolean = { i += 1; i < rs.size }
              override def get(): InternalRow = rs(i)
              override def close(): Unit = ()
            }
        }
    }
  }
}

final case class VlogMetaPartition(rows: Seq[InternalRow])
    extends InputPartition

/** `DESCRIBE HISTORY` as a queryable TABLE (the Delta `DESCRIBE HISTORY`
  * surface through plain SQL): `graft_vlog.`/dir@history`` serves one row
  * per commit — (version, op, n_added, n_removed, txn). Commit-count-
  * bounded metadata (exactly what [[VersionedTable.history]] reads).
  */
final class VlogHistoryTable(dir: String) extends VlogMetaTable(
  s"graft-vlog($dir@history)", VlogHistoryTable.Schema,
  () => VersionedTable.historyRows(dir).map { case (v, op, a, r, txn) =>
    new GenericInternalRow(Array[Any](v, UTF8String.fromString(op), a, r,
      txn.map(UTF8String.fromString).orNull))
  })

object VlogHistoryTable {
  val Schema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("n_added", LongType, nullable = false),
    StructField("n_removed", LongType, nullable = false),
    StructField("txn", StringType, nullable = true)))
}

/** The live-file inventory as a queryable SQL table (the Iceberg
  * `.files` metadata-table shape): `graft_vlog.`/dir@files`` serves one
  * row per (live file × logged stat key) — table-relative path, size in
  * bytes, footer row count, and the stat key's [min, max] envelope —
  * with a single NULL-stat row for files carrying no stats. The ops
  * queries this exists for ("which files does a ts range touch", "how
  * big is the small-file tail", "is the z-order layout still tight")
  * become plain SQL over metadata: snapshot replay + one footer open
  * per live file at planning, never a data page. A file a concurrent
  * vacuum reclaims mid-inventory reports bytes = n_rows = −1 rather
  * than failing the query (r17 review — the ops table must survive the
  * maintenance window it exists to observe).
  */
final class VlogFilesTable(dir: String) extends VlogMetaTable(
  s"graft-vlog($dir@files)", VlogFilesTable.Schema,
  () => VersionedTable.liveEntriesReplaying(dir, None)._1
    .flatMap { case (f, sts) =>
      val abs = Paths.get(dir, f)
      val bytes =
        try Files.size(abs)
        catch { case scala.util.control.NonFatal(_) => -1L }
      val nRows =
        try VlogSchema.footer(abs)._2
        catch { case scala.util.control.NonFatal(_) => -1L }
      def row(key: String, lo: Any, hi: Any) =
        new GenericInternalRow(Array[Any](UTF8String.fromString(f),
          bytes, nRows,
          if (key == null) null else UTF8String.fromString(key), lo, hi))
      if (sts.isEmpty) Seq(row(null, null, null))
      else sts.values.toSeq.sortBy(_.key)
        .map(st => row(st.key, st.min, st.max))
    })

object VlogFilesTable {
  val Schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("bytes", LongType, nullable = false),
    StructField("n_rows", LongType, nullable = false),
    StructField("stat_key", StringType, nullable = true),
    StructField("stat_min", LongType, nullable = true),
    StructField("stat_max", LongType, nullable = true)))
}

/** The CHANGE FEED as a queryable SQL table (r16 verdict task #6 —
  * `readChangeFeed` was Scala-only): `graft_vlog.`/dir@changes(f,t)``
  * serves exactly the rows commits (f, t] appended, each carrying
  * `_commit_version` (the commit that added it) and `_change_type`
  * ("insert" — the only row-level change an append-shaped commit
  * carries), straight through the same per-file readers (columnar
  * included; the CDF pair are per-partition constant vectors). IO is ∝
  * the range's files, never a snapshot scan; a COW commit in range
  * fails loudly at planning (the `appendCommitAdds` contract every feed
  * consumer shares). Schema = union of the RANGE's file schemas + the
  * two metadata columns — byte-identical rows to the Scala
  * `readChangeFeed`, spec-pinned.
  */
final class VlogChangesTable(dir: String, fromV: Long, toV: Long)
    extends Table with SupportsRead {
  require(fromV <= toV,
    s"inverted change range ($fromV, $toV] — fromV is EXCLUSIVE " +
      "(use @changes(-1,0) for the first commit's rows)")

  // (version, file) pairs of the range — resolved once per table load;
  // commits are immutable so the list is stable
  private lazy val versionFiles: Seq[(Long, String)] =
    (fromV + 1 to toV).flatMap(v =>
      VersionedTable.appendCommitAdds(dir, v).map(f => (v, f)))

  override def name(): String = s"graft-vlog($dir@changes($fromV,$toV))"
  override lazy val schema: StructType = StructType({
    // an EMPTY range (a zero-changes poll: fromV == toV, a range of
    // data-less commits, or an empty/not-yet-written table at head −1)
    // is benign — serve the SNAPSHOT's schema (metadata columns alone
    // when no snapshot has data files either) with zero partitions
    // instead of erroring (r17 review ×2; the Scala API's None for the
    // same range is not expressible as a SQL table)
    val data =
      if (versionFiles.nonEmpty)
        VlogSchema.mergedSchemaOf(dir, versionFiles.map(_._2),
          s"change range ($fromV, $toV] of $dir")
      else if (toV >= 0 &&
          VersionedTable.liveFiles(dir, Some(toV)).nonEmpty)
        VlogSchema.mergedSchema(dir, Some(toV))
      else StructType(Nil)
    data.fields.toSeq ++ Seq(
      StructField(VlogTable.CommitVersionCol, LongType, nullable = false),
      StructField(VlogTable.ChangeTypeCol, StringType, nullable = false))
  })
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new ScanBuilder
      with SupportsPushDownRequiredColumns {
    private var required: StructType = schema
    override def pruneColumns(requiredSchema: StructType): Unit =
      required = requiredSchema
    override def build(): Scan = new Scan with Batch {
      override def readSchema(): StructType = required
      override def toBatch: Batch = this
      override def description(): String =
        s"graft-vlog-changes $dir ($fromV,$toV] " +
          s"files=${versionFiles.size}"
      override def planInputPartitions(): Array[InputPartition] =
        versionFiles.map { case (v, f) =>
          VlogInputPartition(Paths.get(dir, f).toString, v): InputPartition
        }.toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new VlogReaderFactory(required)
    }
  }
}

/** The catalog plugin: table identifiers ARE table directories
  * (backtick-quoted in SQL), so no mount configuration is needed —
  * `spark.sql.catalog.graft_vlog = graft.sources.VlogCatalog` once, then
  * any versioned table on the filesystem is addressable as
  * `graft_vlog.`/its/dir`` with `VERSION AS OF <v>` time travel routed
  * through the public `loadTable(ident, version)` hook. DDL is rejected:
  * the table format's write surface is [[VersionedTable]]'s commit
  * protocol, not catalog DDL.
  */
class VlogCatalog
    extends org.apache.spark.sql.connector.catalog.TableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName = "graft_vlog"
  private var maxFilesPerBatch = VlogTable.DefaultMaxFilesPerBatch

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    maxFilesPerBatch = Option(options.get("maxFilesPerBatch"))
      .map(_.toInt).getOrElse(VlogTable.DefaultMaxFilesPerBatch)
  }
  override def name(): String = catalogName

  private def dirOf(ident: Identifier): String = {
    val ok = ident.namespace().isEmpty &&
      ident.name().startsWith("/") &&
      Files.isDirectory(Paths.get(ident.name(), "_vlog"))
    if (!ok)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException(ident)
    ident.name()
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchNamespaceException(namespace)
    Array.empty // tables are directories; there is no registry to list
  }

  private def isVlogDir(name: String): Boolean =
    name.startsWith("/") &&
      Files.isDirectory(Paths.get(name, "_vlog"))

  // both bounds may be -1: the low bound is EXCLUSIVE, so commit 0's
  // rows are reachable only as @changes(-1,t), and a poller that read
  // head = currentVersion = -1 off an empty table writes @changes(-1,-1)
  // — a benign zero-changes poll, not a parse failure (r17 review ×2)
  private val ChangesSuffix = "@changes\\((-1|\\d+),(-1|\\d+)\\)$".r

  override def loadTable(ident: Identifier): Table =
    // a REAL table directory always wins (r16 review: a data table whose
    // path literally ends in "@history" must stay readable and must not
    // silently alias to another table's history); only when no such
    // table exists does the `@history` suffix mount the base table's
    // commit log (DESCRIBE HISTORY through plain SQL), `@files` the
    // live-file inventory with stats, and `@changes(f,t)` the change
    // feed for commits (f, t]
    if (isVlogDir(ident.name()))
      new VlogTable(dirOf(ident), None, maxFilesPerBatch, 0L)
    else if (ident.name().endsWith("@history")) {
      val base = Identifier.of(ident.namespace(),
        ident.name().stripSuffix("@history"))
      new VlogHistoryTable(dirOf(base))
    } else if (ident.name().endsWith("@files")) {
      val base = Identifier.of(ident.namespace(),
        ident.name().stripSuffix("@files"))
      new VlogFilesTable(dirOf(base))
    } else ChangesSuffix.findFirstMatchIn(ident.name()) match {
      case Some(m) =>
        val base = Identifier.of(ident.namespace(),
          ident.name().substring(0, m.start))
        new VlogChangesTable(dirOf(base), m.group(1).toLong,
          m.group(2).toLong)
      case None =>
        new VlogTable(dirOf(ident), None, maxFilesPerBatch, 0L)
    }

  /** The DSv2 time-travel hook — `VERSION AS OF <v>` arrives here. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = version.toLongOption.getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException(ident))
    new VlogTable(dirOf(ident), Some(v), maxFilesPerBatch, 0L)
  }

  /** `TIMESTAMP AS OF <ts>` — Spark hands epoch MICROS; resolution is the
    * newest commit published at or before it (commit-file mtimes, the
    * Delta recipe).
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val dir = dirOf(ident)
    new VlogTable(dir,
      Some(VersionedTable.versionAtTimestamp(dir, timestamp)),
      maxFilesPerBatch, 0L)
  }

  /** SQL `CALL graft_vlog.<proc>(...)` — the maintenance surface
    * ([[VlogProcedures]]): compact / compact_small_files / vacuum /
    * zorder as schedulable SQL text, each routed through the same
    * optimistic commit protocol every writer shares.
    */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    if (ident.namespace().nonEmpty) throw noSuchProcedure(ident)
    else VlogProcedures.load(ident.name())
      .getOrElse(throw noSuchProcedure(ident))

  private def noSuchProcedure(ident: Identifier): Exception =
    new RuntimeException(
      s"no such procedure ${ident.name()} — the $catalogName catalog " +
        s"serves: ${VlogProcedures.names.mkString(", ")}")

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.nonEmpty) Array.empty
    else VlogProcedures.names
      .map(n => Identifier.of(Array.empty[String], n)).toArray

  /** `CREATE TABLE graft_vlog.`/dir`` (and therefore CTAS — Spark plans
    * it as createTable + append): the identifier IS the directory. The
    * declared schema is durably recorded by staging an EMPTY parquet
    * file as commit v0 ("op:create"), so the schema-from-footers
    * invariant every reader relies on holds unchanged for a table with
    * zero rows — no side-channel schema file, and the first real INSERT
    * is validated against it exactly like any other write. Partitioning
    * transforms are refused loudly (layout comes from
    * clustering/Z-order, not hive partitions).
    */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft-vlog tables take no PARTITIONED BY — layout is installed " +
        "by clustering (CALL graft_vlog.compact / zorder)")
    val ok = ident.namespace().isEmpty && ident.name().startsWith("/")
    if (!ok)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException(ident)
    val dir = Paths.get(ident.name())
    if (Files.isDirectory(dir.resolve("_vlog")))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    Files.createDirectories(dir)
    // the pre-check above is a fast path only; the v0 commit inside
    // createEmpty is the real uniqueness arbiter (two concurrent
    // CREATEs race on the v0 link — exactly one wins; r17 review)
    try VersionedTable.createEmpty(ident.name(), schema)
    catch {
      case _: VersionedTable.VlogTableExistsException =>
        throw new org.apache.spark.sql.catalyst.analysis
          .TableAlreadyExistsException(ident)
    }
    new VlogTable(ident.name(), None, maxFilesPerBatch, 0L)
  }

  override def alterTable(ident: Identifier,
      changes: org.apache.spark.sql.connector.catalog.TableChange*): Table =
    throw new UnsupportedOperationException(
      "schema evolves through VersionedTable writes, not DDL")

  /** `DROP TABLE graft_vlog.`/dir`` — the directory is the table; drop
    * deletes it whole (log, live and historical files). Refuses
    * non-vlog directories rather than recursively deleting arbitrary
    * paths the identifier happens to name.
    */
  override def dropTable(ident: Identifier): Boolean = {
    val ok = ident.namespace().isEmpty && ident.name().startsWith("/") &&
      Files.isDirectory(Paths.get(ident.name(), "_vlog"))
    if (!ok) false
    else {
      val root = Paths.get(ident.name())
      val w = Files.walk(root)
      try w.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
      finally w.close()
      true
    }
  }
  override def renameTable(ident: Identifier, to: Identifier): Unit =
    throw new UnsupportedOperationException(
      "vlog tables are directories; rename is a filesystem operation")
}
