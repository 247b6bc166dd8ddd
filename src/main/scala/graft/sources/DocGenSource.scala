package graft.sources

import java.util.OptionalLong

import scala.collection.JavaConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic synthetic document-metadata generator as a full
  * DataSource V2 implementation — the "sources" axis beyond files: a
  * `TableProvider` whose `ScanBuilder` implements BOTH pushdown surfaces
  * (`SupportsPushDownFilters`: doc_id range predicates narrow the generated
  * interval itself, so filtered rows are never produced, not produced-then-
  * dropped; `SupportsPushDownRequiredColumns`: unreferenced columns are
  * never generated) and reports post-pushdown statistics
  * (`SupportsReportStatistics` — the optimizer sees the NARROWED row count,
  * which is what makes a pushed scan broadcast-eligible at planning time).
  *
  * Scale shape: `planInputPartitions` splits the (already narrowed) range
  * into `partitions` independent slices — generation is embarrassingly
  * parallel, nothing is materialized on the driver, and a 10¹²-row range
  * costs the same to PLAN as a 10³-row one. The row recipe is a 31-bit LCG
  * (x = (1103515245·i + 12345) mod 2³¹ — Numerical Recipes' public
  * constants), chosen because both engines replay it exactly in 64-bit
  * integer arithmetic: the registered a4 query's DuckDB oracle re-derives
  * every generated value from `generate_series`, so the whole source —
  * generation, pushdown narrowing, residual filters, pruning — is
  * hash-checked end to end.
  */
object DocGen {
  val Langs: Array[String] = Array("en", "es", "de", "fr", "zh")
  val Sources: Array[String] = Array("web", "books", "code", "wiki")

  /** The one default for streaming admission (rows per micro-batch) —
    * every construction path (provider options, catalog options) funnels
    * through this constant.
    */
  val DefaultBatchRows = 100L

  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("quality_ppm", LongType, nullable = false)))

  /** The LCG state for row i — every column derives from it. */
  def x(i: Long): Long = (1103515245L * i + 12345L) % 2147483648L

  /** Column value for row i (JVM types; the reader wraps strings). */
  def value(i: Long, field: String): Any = {
    val xi = x(i)
    field match {
      case "doc_id" => i
      case "lang" => Langs((xi % 5).toInt)
      case "source" => Sources(((xi / 5) % 4).toInt)
      case "n_chars" => 48L + (xi / 20) % 500L
      case "quality_ppm" => 100000L + (xi / 10007L) % 900000L
      case other => throw new IllegalArgumentException(other)
    }
  }
}

class DocGenSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-docgen"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DocGen.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    // getTable receives the ORIGINAL-case option map (unlike inferSchema's
    // CaseInsensitiveStringMap) — rewrap it, or .option("ROWS", …) would
    // silently fall back to the default
    val opts = new CaseInsensitiveStringMap(properties)
    new DocGenTable(
      Option(opts.get("rows")).getOrElse("1000").toLong,
      Option(opts.get("partitions")).getOrElse("4").toInt,
      Option(opts.get("batchRows"))
        .map(_.toLong).getOrElse(DocGen.DefaultBatchRows))
  }
}

final class DocGenTable(rows: Long, parts: Int, batchRows: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft-docgen($rows)"
  override def schema(): StructType = DocGen.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new DocGenScanBuilder(rows, parts, batchRows)
}

final class DocGenScanBuilder(rows: Long, parts: Int, batchRows: Long)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {
  private var lo = 0L
  private var hi = rows
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = DocGen.Schema
  private var pushedAgg: Option[Aggregation] = None

  private def long(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case _ => None // a non-integral literal never narrows the range
  }

  /** doc_id range predicates narrow the generated interval; everything
    * else stays residual (Spark re-evaluates residuals above the scan, so
    * rejecting a filter is always CORRECT, accepting one must be exact).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (acc, residual) = filters.partition {
      case GreaterThanOrEqual("doc_id", v) => long(v).isDefined
      // the > / <= / = forms need v+1 — at Long.MaxValue that overflows
      // and, because an ACCEPTED filter is never re-evaluated above the
      // scan, would return wrong rows (not just prune badly): leave the
      // boundary literal residual instead
      case GreaterThan("doc_id", v) =>
        long(v).exists(_ < Long.MaxValue)
      case LessThan("doc_id", v) => long(v).isDefined
      case LessThanOrEqual("doc_id", v) =>
        long(v).exists(_ < Long.MaxValue)
      case EqualTo("doc_id", v) =>
        long(v).exists(_ < Long.MaxValue)
      case _ => false
    }
    acc.foreach {
      case GreaterThanOrEqual(_, v) => lo = math.max(lo, long(v).get)
      case GreaterThan(_, v) => lo = math.max(lo, long(v).get + 1)
      case LessThan(_, v) => hi = math.min(hi, long(v).get)
      case LessThanOrEqual(_, v) => hi = math.min(hi, long(v).get + 1)
      case EqualTo(_, v) =>
        lo = math.max(lo, long(v).get); hi = math.min(hi, long(v).get + 1)
      case f => throw new IllegalStateException(s"unreachable: $f")
    }
    accepted = acc
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Aggregate pushdown — the third pushdown surface, and the one that
    * changes the COST CLASS: `count/min/max/sum` over the row index have
    * closed forms on a [lo,hi) interval, so an accepted aggregation makes
    * the scan O(1) — zero rows generated, zero rows shuffled — regardless
    * of the configured row count. Composition with filter pushdown is
    * exactly why this is sound: `pushFilters` has ALREADY narrowed
    * [lo,hi), so the closed forms aggregate precisely the rows a plain
    * scan would have produced. Only the index column qualifies (the
    * LCG-derived columns have no closed-form aggregates — a request
    * touching them is declined and Spark aggregates normally, which the
    * contract makes always-correct). Grouped aggregations are declined
    * for the same reason. `supportCompletePushDown` answers true for the
    * same set, so Spark drops its own Aggregate node entirely — the a6
    * oracle then hash-checks the closed forms against a real
    * `generate_series` aggregation.
    */
  private def aggSupported(agg: Aggregation): Boolean = {
    def isDocId(e: org.apache.spark.sql.connector.expressions.Expression) =
      e match {
        case nr: NamedReference => nr.fieldNames.sameElements(Array("doc_id"))
        case _ => false
      }
    def isNonNullLiteral(
        e: org.apache.spark.sql.connector.expressions.Expression) =
      e match {
        case lv: org.apache.spark.sql.connector.expressions.Literal[_] =>
          lv.value != null
        case _ => false
      }
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.forall {
      case _: CountStar => true
      // doc_id is the (unique, non-null) row index, so DISTINCT is a no-op
      // and count(doc_id) = count(*); count(<non-null literal>) (Spark's
      // count(1) form) also counts every row
      case c: Count =>
        isDocId(c.column) || (!c.isDistinct && isNonNullLiteral(c.column))
      case m: Min => isDocId(m.column)
      case m: Max => isDocId(m.column)
      case s: Sum => isDocId(s.column)
      case _ => false
    }
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    aggSupported(agg)

  override def pushAggregation(agg: Aggregation): Boolean = {
    // accepting here is also sound under Spark's PARTIAL-pushdown fallback
    // (final count = SUM of returned counts, min of mins, …): every
    // accepted function is decomposable and the scan returns one exact row
    val ok = aggSupported(agg)
    if (ok) pushedAgg = Some(agg)
    ok
  }

  override def build(): Scan = {
    val boundedLo = math.max(lo, 0L)
    val boundedHi = math.max(hi, boundedLo)
    pushedAgg match {
      case Some(agg) =>
        new DocGenAggScan(boundedLo, boundedHi, agg.aggregateExpressions,
          accepted.map(_.toString).sorted)
      case None =>
        new DocGenScan(boundedLo, boundedHi, parts,
          required, accepted.map(_.toString).sorted, batchRows)
    }
  }
}

/** The O(1) scan a pushed aggregation builds: one partition, one row, every
  * value a closed form over the (filter-narrowed) index interval [lo,hi).
  * Empty interval ⇒ count 0 and NULL min/max/sum — the global-aggregate
  * convention both engines share. The sum uses the Gauss closed form in
  * BigInt and truncates to Long, which reproduces Spark's (non-ANSI)
  * wrap-around addition bit-for-bit if a range ever exceeds 2⁶³.
  */
final class DocGenAggScan(lo: Long, hi: Long, funcs: Array[AggregateFunc],
    pushedDesc: Array[String]) extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(funcs.map {
      case f: CountStar => StructField(f.toString, LongType, nullable = false)
      case f: Count => StructField(f.toString, LongType, nullable = false)
      case f => StructField(f.toString, LongType, nullable = true)
    })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-docgen-agg range=[$lo,$hi) " +
      s"PushedAggregates: [${funcs.map(_.toString).mkString(", ")}] " +
      s"PushedFilters: [${pushedDesc.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] =
    Array(DocGenInputPartition(0L, 1L))

  override def createReaderFactory(): PartitionReaderFactory = {
    val (l, h) = (lo, hi)
    val kinds: Array[Int] = funcs.map {
      case _: CountStar | _: Count => 0
      case _: Min => 1
      case _: Max => 2
      case _: Sum => 3
    }
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition)
          : PartitionReader[InternalRow] = new PartitionReader[InternalRow] {
        private var emitted = false
        override def next(): Boolean = { val r = !emitted; emitted = true; r }
        override def get(): InternalRow = {
          val empty = h <= l
          val values: Array[Any] = kinds.map {
            case 0 => (h - l): java.lang.Long
            case 1 => if (empty) null else (l: java.lang.Long)
            case 2 => if (empty) null else ((h - 1): java.lang.Long)
            case 3 =>
              if (empty) null
              else {
                val s = (BigInt(l) + BigInt(h - 1)) * BigInt(h - l) / 2
                (s.toLong: java.lang.Long)
              }
          }
          new GenericInternalRow(values)
        }
        override def close(): Unit = ()
      }
    }
  }
}

final class DocGenScan(lo: Long, hi: Long, parts: Int,
    required: StructType, pushedDesc: Array[String], batchRows: Long)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-docgen range=[$lo,$hi) cols=" +
      s"[${required.fieldNames.mkString(",")}] " +
      s"PushedFilters: [${pushedDesc.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, parts)
    val span = hi - lo
    (0 until n).map { p =>
      // contiguous near-equal slices of the narrowed range
      DocGenInputPartition(
        lo + span * p / n, lo + span * (p + 1) / n): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DocGenReaderFactory(required.fieldNames)

  /** Streaming form of the same generator: the offset IS the next row
    * index, so a checkpointed offset replays EXACTLY (generation is a
    * pure function of the index — the deterministic-source property that
    * makes end-to-end exactly-once possible at all). Admission control is
    * `batchRows` per micro-batch over the same (pushdown-narrowed, column-
    * pruned) range the batch scan reads.
    */
  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream =
    new DocGenMicroBatchStream(lo, hi, parts, batchRows,
      required.fieldNames)

  /** Post-pushdown statistics: the optimizer's broadcast decision sees the
    * narrowed count, not the configured total.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(math.max(0L, hi - lo) * 48L)
    override def numRows(): OptionalLong =
      OptionalLong.of(math.max(0L, hi - lo))
  }
}

final case class DocGenInputPartition(start: Long, end: Long)
    extends InputPartition

/** The catalog surface for the same tables: a read-only `TableCatalog`
  * exposing `docgen_<rows>[_<partitions>]` identifiers, so plain SQL text
  * reaches the custom source with full pushdown —
  * `SELECT ... FROM graft.docgen_10000 WHERE doc_id < 100`. Registered in
  * `LocalSession` via `spark.sql.catalog.graft` (the public catalog-plugin
  * config), which is how a deployment would mount it cluster-wide. DDL
  * (create/alter/drop/rename) is rejected: generated tables have no
  * mutable state to manage.
  */
class DocGenCatalog
    extends org.apache.spark.sql.connector.catalog.TableCatalog {
  import org.apache.spark.sql.connector.catalog.Identifier

  private var catalogName = "graft"
  // catalog-level default for streaming admission, settable as
  // spark.sql.catalog.<name>.batchRows (catalog options arrive in
  // initialize) — the SQL path has no per-read .option() surface
  private var batchRows = DocGen.DefaultBatchRows
  private val Pattern = """docgen_(\d+)(?:_(\d+))?""".r

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    batchRows = Option(options.get("batchRows"))
      .map(_.toLong).getOrElse(DocGen.DefaultBatchRows)
  }
  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    // the catalog is flat: only the empty namespace exists — fabricating
    // entries under arbitrary namespaces would make wrong-namespace
    // queries succeed silently
    if (namespace.nonEmpty)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchNamespaceException(namespace)
    Array(Identifier.of(namespace, "docgen_1000"))
  }

  override def loadTable(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.Table =
    ident.name() match {
      case Pattern(rows, parts) if ident.namespace().isEmpty =>
        // a digits-only suffix can still overflow Long/Int — that's an
        // unknown table, not a NumberFormatException leaking to the user
        try new DocGenTable(rows.toLong,
          Option(parts).map(_.toInt).getOrElse(4), batchRows)
        catch {
          case _: NumberFormatException =>
            throw new org.apache.spark.sql.catalyst.analysis
              .NoSuchTableException(ident)
        }
      case _ => throw new org.apache.spark.sql.catalyst.analysis
          .NoSuchTableException(ident)
    }

  override def createTable(ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.Table =
    throw new UnsupportedOperationException("docgen tables are generated")
  override def alterTable(ident: Identifier,
      changes: org.apache.spark.sql.connector.catalog.TableChange*)
      : org.apache.spark.sql.connector.catalog.Table =
    throw new UnsupportedOperationException("docgen tables are immutable")
  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("docgen tables are generated")
  override def renameTable(ident: Identifier, to: Identifier): Unit =
    throw new UnsupportedOperationException("docgen tables are generated")
}

/** Row-index offsets: monotone, dense, and replayable — the committed
  * offset fully determines both what was delivered and what comes next.
  */
final case class DocGenOffset(i: Long) extends Offset {
  override def json(): String = i.toString
}

final class DocGenMicroBatchStream(lo: Long, hi: Long, parts: Int,
    batchRows: Long, fields: Array[String])
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = DocGenOffset(lo)

  /** Admission control proper: the engine hands us the TRUE start (the
    * checkpointed position on recovery — not instance state, which a
    * fresh incarnation would lack), and we admit `batchRows` more. A
    * stateful `latestOffset()` variant instead returns the committed
    * position itself on a recovered instance's first call, which
    * `processAllAvailable` reads as caught-up — measured in the resume
    * spec before this form replaced it.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[DocGenOffset].i
    limit match {
      // Trigger.Once / AvailableNow pass ReadAllAvailable — the engine is
      // asking for EVERYTHING, and answering with one batchRows chunk
      // would terminate the run with data silently undelivered
      case _: ReadAllAvailable => DocGenOffset(hi)
      case m: ReadMaxRows =>
        DocGenOffset(math.min(hi, s + math.max(1L, m.maxRows())))
      case _ =>
        DocGenOffset(math.min(hi, s + math.max(1L, batchRows)))
    }
  }

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(math.max(1L, batchRows))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the admission-control entry point")

  override def deserializeOffset(json: String): Offset =
    DocGenOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[DocGenOffset].i,
      end.asInstanceOf[DocGenOffset].i)
    if (e <= s) Array.empty
    else {
      val n = math.max(1, math.min(parts.toLong, e - s).toInt)
      (0 until n).map { p =>
        DocGenInputPartition(
          s + (e - s) * p / n, s + (e - s) * (p + 1) / n): InputPartition
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DocGenReaderFactory(fields)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final class DocGenReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DocGenInputPartition]
    new PartitionReader[InternalRow] {
      private var i = p.start - 1
      override def next(): Boolean = { i += 1; i < p.end }
      override def get(): InternalRow =
        new GenericInternalRow(fields.map { f =>
          DocGen.value(i, f) match {
            case s: String => UTF8String.fromString(s)
            case other => other.asInstanceOf[AnyRef]
          }
        }.asInstanceOf[Array[Any]])
      override def close(): Unit = ()
    }
  }
}
