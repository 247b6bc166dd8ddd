package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.types._

/** Aggregate pushdown for the vlog table: `count(*)` / `count(col)` /
  * `min` / `max` over integer-physical columns are answered from parquet
  * FOOTERS — block row counts, null counts and min/max statistics the
  * writers already paid for — so `SELECT max(event_ts), count(*) FROM t`
  * on a 100-TB table reads zero data pages.
  *
  * The scan deliberately answers `supportCompletePushDown = false` and
  * returns one PARTIAL row per file bundle: the footer opens run on
  * EXECUTORS, fanned across the cluster, and Spark's final aggregate
  * folds the partials (sum of counts, min of mins) — the driver never
  * walks 100k footers serially the way a complete-pushdown answer would
  * force. Eligibility is decided at planning from the merged snapshot
  * schema; per-file surprises (a block without statistics, an INT96
  * legacy timestamp, an all-null chunk with no null count) fall back to
  * decoding JUST that file's needed columns through the normal columnar
  * reader — partition-local, never a replan, still exact.
  *
  * Soundness notes pinned by the spec: parquet int32/int64 statistics
  * are exact (never truncated, unlike strings); footer min/max exclude
  * nulls exactly like Spark's `Min`/`Max`; a pre-evolution file that
  * lacks the column contributes an all-null partial (`count(col)` 0);
  * an EMPTY live set still emits one zero-count partial row because the
  * final `SUM` over zero partial rows would return NULL where `count`
  * over an empty table must return 0.
  */
object VlogAggScan {

  /** Min/Max qualify only on the exact-integer-stat types (the same set
    * the skipping envelope trusts); count(col) qualifies on any column —
    * null counts are type-agnostic and the decode fallback serves every
    * schema-derivable type.
    */
  private[sources] def statType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
        TimestampType | TimestampNTZType => true
    case _ => false
  }

  private def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression,
      full: StructType): Option[StructField] = e match {
    case nr: NamedReference if nr.fieldNames.length == 1 =>
      full.fields.find(_.name == nr.fieldNames.head)
    case _ => None
  }

  /** Planning-time eligibility against the merged snapshot schema. */
  private[sources] def supported(agg: Aggregation, full: StructType)
      : Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case c: Count if !c.isDistinct => fieldOf(c.column, full).isDefined
        case m: Min => fieldOf(m.column, full).exists(f => statType(f.dataType))
        case m: Max => fieldOf(m.column, full).exists(f => statType(f.dataType))
        case _ => false
      }

  /** The partial-row schema, positionally matching the aggregation. */
  private[sources] def partialSchema(funcs: Array[AggregateFunc],
      full: StructType): StructType =
    StructType(funcs.zipWithIndex.map {
      case (_: CountStar, i) =>
        StructField(s"count_star_$i", LongType, nullable = false)
      case (_: Count, i) =>
        StructField(s"count_$i", LongType, nullable = false)
      case (m: Min, i) =>
        val f = fieldOf(m.column, full).get
        StructField(s"min_$i", f.dataType, nullable = true)
      case (m: Max, i) =>
        val f = fieldOf(m.column, full).get
        StructField(s"max_$i", f.dataType, nullable = true)
      case (f, _) => throw new IllegalStateException(s"unreachable: $f")
    })
}

final case class VlogAggInputPartition(absPaths: Seq[String])
    extends InputPartition

final class VlogAggScanImpl(dir: String, asOf: Option[Long],
    funcs: Array[AggregateFunc], full: StructType)
    extends Scan with Batch {

  // snapshot pinned once per scan, same discipline as the row scan
  private lazy val pinned: Long =
    asOf.getOrElse(VersionedTable.currentVersion(dir))
  private lazy val files: Seq[String] =
    VersionedTable.liveFiles(dir, Some(pinned))

  override def readSchema(): StructType =
    VlogAggScan.partialSchema(funcs, full)
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-vlog-agg $dir version=$pinned files=${files.size} " +
      s"PushedAggregates: [${funcs.map(_.toString).mkString(", ")}]"

  /** ≤128 bundles (one partial row each): enough fan-out that a 100k-file
    * table opens footers cluster-parallel, few enough that the final fold
    * is trivial. An empty table still plans ONE bundle (the zero-count
    * partial — see the class doc).
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val abs = files.map(f => Paths.get(dir, f).toString)
    if (abs.isEmpty) Array(VlogAggInputPartition(Seq.empty))
    else {
      val per = math.max(1, math.ceil(abs.size / 128.0).toInt)
      abs.grouped(per).map(VlogAggInputPartition(_): InputPartition).toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new VlogAggReaderFactory(funcs, full)
}

private object AggKind {
  val CountStarK = 0
  val CountColK = 1
  val MinK = 2
  val MaxK = 3
}

final class VlogAggReaderFactory(funcs: Array[AggregateFunc],
    full: StructType) extends PartitionReaderFactory {

  // (kind, column name or null) per output position — serialized to
  // executors instead of the connector expression objects
  private val specs: Array[(Int, String)] = funcs.map {
    case _: CountStar => (AggKind.CountStarK, null)
    case c: Count =>
      (AggKind.CountColK,
        c.column.asInstanceOf[NamedReference].fieldNames.head)
    case m: Min =>
      (AggKind.MinK, m.column.asInstanceOf[NamedReference].fieldNames.head)
    case m: Max =>
      (AggKind.MaxK, m.column.asInstanceOf[NamedReference].fieldNames.head)
    case f => throw new IllegalStateException(s"unreachable: $f")
  }

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] =
    new VlogAggPartitionReader(
      partition.asInstanceOf[VlogAggInputPartition].absPaths, specs, full)
}

/** Folds one partial row from this bundle's footers. All state is a
  * per-position accumulator: counts add, min/max fold with null-skip.
  */
final class VlogAggPartitionReader(paths: Seq[String],
    specs: Array[(Int, String)], full: StructType)
    extends PartitionReader[InternalRow] {

  import AggKind._

  private val counts = Array.fill[Long](specs.length)(0L)
  private val mins = Array.fill[Any](specs.length)(null)
  private var emitted = false

  private def foldMin(i: Int, v: Long): Unit =
    mins(i) = if (mins(i) == null) v
    else math.min(mins(i).asInstanceOf[Long], v)
  private def foldMax(i: Int, v: Long): Unit =
    mins(i) = if (mins(i) == null) v
    else math.max(mins(i).asInstanceOf[Long], v)

  private def asLong(v: Any): Option[Long] = v match {
    case l: java.lang.Long => Some(l.longValue)
    case i: java.lang.Integer => Some(i.longValue)
    case _ => None
  }

  /** One file's contribution from its footer; positions whose statistics
    * are unusable are returned for the decode fallback.
    */
  private def foldFooter(abs: String): Seq[Int] = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(Paths.get(abs).toUri),
      new org.apache.hadoop.conf.Configuration())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = r.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      val present = if (blocks.isEmpty) Set.empty[String]
        else blocks.head.getColumns.asScala
          .map(_.getPath.toDotString).toSet
      specs.indices.flatMap { i =>
        val (kind, colName) = specs(i)
        kind match {
          case CountStarK => counts(i) += rows; None
          case _ if !present.contains(colName) =>
            // pre-evolution file: the column reads as all NULL, so
            // count(col) gains 0 and min/max gain nothing
            None
          case CountColK =>
            val nulls = blocks.map { b =>
              val st = b.getColumns.asScala
                .find(_.getPath.toDotString == colName).map(_.getStatistics)
              if (st.exists(s => s != null && s.isNumNullsSet))
                Some(st.get.getNumNulls)
              else None
            }
            if (nulls.forall(_.isDefined)) {
              counts(i) += rows - nulls.flatten.sum; None
            } else Some(i)
          case MinK | MaxK =>
            val perBlock = blocks.map { b =>
              val st = b.getColumns.asScala
                .find(_.getPath.toDotString == colName).map(_.getStatistics)
              st match {
                case Some(s) if s != null && s.hasNonNullValue =>
                  // usable iff the physical value is an exact integer
                  (asLong(s.genericGetMin), asLong(s.genericGetMax)) match {
                    case (Some(lo), Some(hi)) => Some(Some((lo, hi)))
                    case _ => None // INT96/binary stats: fall back
                  }
                case Some(s) if s != null && s.isNumNullsSet &&
                    s.getNumNulls == b.getRowCount =>
                  Some(None) // provably all-null block: contributes nothing
                case _ if b.getRowCount == 0L => Some(None)
                case _ => None // stats missing: fall back
              }
            }
            if (perBlock.forall(_.isDefined)) {
              perBlock.flatten.flatten.foreach { case (lo, hi) =>
                if (kind == MinK) foldMin(i, lo) else foldMax(i, hi)
              }
              None
            } else Some(i)
        }
      }
    } finally r.close()
  }

  /** Exactness rescue for a file whose footer cannot answer a position:
    * decode ONLY the needed columns of ONLY this file through the normal
    * columnar reader and fold row-by-row. Partition-local; the common
    * case (our own writers) never takes it.
    */
  private def foldByDecode(abs: String, positions: Seq[Int]): Unit = {
    val cols = positions.map(i => specs(i)._2).distinct
    val proj = StructType(cols.map(c => full.fields.find(_.name == c).get))
    val reader = new VlogReaderFactory(proj)
      .createReader(VlogInputPartition(abs))
    try while (reader.next()) {
      val row = reader.get()
      positions.foreach { i =>
        val (kind, colName) = specs(i)
        val pos = proj.fieldIndex(colName)
        if (!row.isNullAt(pos)) kind match {
          case CountColK => counts(i) += 1L
          case MinK | MaxK =>
            val v = proj.fields(pos).dataType match {
              case ByteType => row.getByte(pos).toLong
              case ShortType => row.getShort(pos).toLong
              case IntegerType | DateType => row.getInt(pos).toLong
              case _ => row.getLong(pos)
            }
            if (kind == MinK) foldMin(i, v) else foldMax(i, v)
        }
      }
    } finally reader.close()
  }

  override def next(): Boolean =
    if (emitted) false
    else {
      paths.foreach { abs =>
        val fallback = foldFooter(abs)
        if (fallback.nonEmpty) foldByDecode(abs, fallback)
      }
      emitted = true
      true
    }

  override def get(): InternalRow = {
    val out: Array[Any] = specs.indices.map { i =>
      specs(i)._1 match {
        case CountStarK | CountColK => counts(i): java.lang.Long
        case _ =>
          if (mins(i) == null) null
          else {
            val v = mins(i).asInstanceOf[Long]
            // InternalRow representation of the column's own type
            full.fields.find(_.name == specs(i)._2).get.dataType match {
              case ByteType => v.toByte: java.lang.Byte
              case ShortType => v.toShort: java.lang.Short
              case IntegerType | DateType => v.toInt: java.lang.Integer
              case _ => v: java.lang.Long
            }
          }
      }
    }.toArray
    new GenericInternalRow(out)
  }

  override def close(): Unit = ()
}
