package graft.sources

import java.nio.file.Path

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.column.ColumnReader
import org.apache.parquet.column.impl.ColumnReadStoreImpl
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.{Converter, GroupConverter, PrimitiveConverter}
import org.apache.parquet.schema.{MessageType, Type => PqType}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.vectorized.{ConstantColumnVector, OnHeapColumnVector}
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.unsafe.types.UTF8String

/** COLUMNAR decode for the vlog DSv2 scan (r16 verdict task #4): the
  * row-at-a-time `Group` materializer was correct but paid one object
  * tree per ROW; this reader decodes straight from parquet's column
  * pages into Spark's `OnHeapColumnVector`s, one triplet loop per
  * COLUMN per batch — the vectorized shape Spark's native parquet
  * reader uses, built on the public parquet-column API
  * (`ParquetFileReader.setRequestedSchema` + `ColumnReadStoreImpl`), so
  * a fact-sized vlog table scans at columnar speed while the metadata
  * log still does the pruning.
  *
  * Layout contract (identical to the row reader, spec-pinned
  * row-for-row): the requested projection intersects the FILE's own
  * footer schema — evolved columns the file lacks fill with nulls, the
  * `_file` metadata column is a per-partition constant vector, and a
  * projection the file cannot serve at all (count(*), all-evolved)
  * never opens a page: batches of width-0-plus-constants rows flow from
  * the footer row count alone. Values pass through exactly as the row
  * reader's: INT64 micros ARE Catalyst's timestamp representation,
  * INT32 days its date representation.
  *
  * Batches cap at [[VlogColumnarReader.BatchRows]] rows; vectors are
  * freshly allocated per batch (their backing arrays die young — the
  * scan's working set is one batch per task, exactly like the native
  * reader's).
  */
object VlogColumnarReader {

  val BatchRows = 4096

  /** All leaf converters are no-ops: values are pulled through the
    * typed `ColumnReader` getters, never pushed through the converter —
    * parquet only requires the object graph to exist (and
    * `hasDictionarySupport` to answer false, the default).
    */
  private final class NoopGroup(width: Int) extends GroupConverter {
    private val leaf = new PrimitiveConverter {}
    override def getConverter(i: Int): Converter = leaf
    override def start(): Unit = ()
    override def end(): Unit = ()
  }

  /** One column's per-batch fill loop: null iff the definition level
    * sits below the leaf's max (flat schemas: 0 = null, 1 = present).
    * The type dispatch is hoisted OUT of the loop — one tight
    * monomorphic while per (column, batch), the shape the JIT vectorizes.
    */
  private def fill(cr: ColumnReader, vec: OnHeapColumnVector, rows: Int,
      maxDef: Int, pq: PrimitiveTypeName, dt: DataType): Unit = {
    @inline def loop(put: Int => Unit): Unit = {
      var i = 0
      while (i < rows) {
        if (cr.getCurrentDefinitionLevel < maxDef) vec.putNull(i)
        else put(i)
        cr.consume()
        i += 1
      }
    }
    pq match {
      case PrimitiveTypeName.INT64 => loop(i => vec.putLong(i, cr.getLong))
      case PrimitiveTypeName.INT32 => dt match {
        case ShortType => loop(i => vec.putShort(i, cr.getInteger.toShort))
        case ByteType => loop(i => vec.putByte(i, cr.getInteger.toByte))
        case _ => loop(i => vec.putInt(i, cr.getInteger))
      }
      case PrimitiveTypeName.DOUBLE =>
        loop(i => vec.putDouble(i, cr.getDouble))
      case PrimitiveTypeName.FLOAT => loop(i => vec.putFloat(i, cr.getFloat))
      case PrimitiveTypeName.BOOLEAN =>
        loop(i => vec.putBoolean(i, cr.getBoolean))
      case PrimitiveTypeName.BINARY => loop { i =>
        val b = cr.getBinary.getBytes
        vec.putByteArray(i, b, 0, b.length)
      }
      case other => sys.error(s"unreachable: $other survived " +
        "schema derivation")
    }
  }

  def open(part: VlogInputPartition, required: StructType,
      ranges: Map[String, (Long, Long)] = Map.empty,
      points: Seq[VlogPointPred] = Seq.empty)
      : PartitionReader[ColumnarBatch] = {
    val abs: Path = java.nio.file.Paths.get(part.absPath)
    val in = HadoopInputFile.fromPath(new HPath(abs.toUri),
      new Configuration())
    // a row-group SPLIT reads only the groups whose midpoint falls in
    // its byte range — parquet's own block selection, so getRowGroups
    // (and therefore the footer-only count path) reflects the split.
    // Pushed point/range hints additionally become parquet's row-group
    // filtering (stats + dictionary + BLOOM): a group that provably
    // cannot match is dropped before any page read. Sound for the
    // footer-only count path too: predicates imply their columns are in
    // `required` (residual re-evaluation needs them), so a file serving
    // the footer-only path has no applicable conjuncts — forFile drops
    // conjuncts on absent columns. The filter costs ONE extra footer
    // open per (file, predicated scan); predicate-free scans pay nothing.
    val optsB = org.apache.parquet.ParquetReadOptions.builder()
    if (part.rangeStart >= 0) optsB.withRange(part.rangeStart, part.rangeEnd)
    if (ranges.nonEmpty || points.nonEmpty)
      VlogFilters.forFile(VlogSchema.footer(abs)._1, ranges, points)
        .foreach(optsB.withRecordFilter)
    val reader = ParquetFileReader.open(in, optsB.build())
    val fileSchema: MessageType = reader.getFooter.getFileMetaData.getSchema
    val createdBy = reader.getFooter.getFileMetaData.getCreatedBy
    val totalRows = reader.getRowGroups.asScala.map(_.getRowCount).sum
    val metas: Map[String, Any] = VlogTable.metaConstants(part)

    // the parquet-backed subset of the projection, in required order
    val backed: Array[(StructField, Int)] = required.fields.zipWithIndex
      .filter { case (f, _) =>
        !metas.contains(f.name) && fileSchema.containsField(f.name) }
    val projection: Option[MessageType] =
      if (backed.isEmpty) None
      else {
        val wanted: Array[PqType] =
          backed.map { case (f, _) => fileSchema.getType(Seq(f.name): _*) }
        Some(new MessageType(fileSchema.getName, wanted: _*))
      }
    projection.foreach(reader.setRequestedSchema)

    new PartitionReader[ColumnarBatch] {
      // per-row-group state (rebuilt by advance())
      private var groupRows = 0L
      private var readers: Array[(ColumnReader, Int, PrimitiveTypeName)] = _
      private var footerOnlyRemaining: Long =
        if (projection.isEmpty) totalRows else -1L
      private var batch: ColumnarBatch = _

      private def advance(): Boolean = projection.exists { proj =>
        val pages = reader.readNextRowGroup()
        if (pages == null) false
        else {
          groupRows = pages.getRowCount
          val store = new ColumnReadStoreImpl(pages,
            new NoopGroup(proj.getFieldCount), proj, createdBy)
          readers = proj.getColumns.asScala.map { cd =>
            (store.getColumnReader(cd), cd.getMaxDefinitionLevel,
              cd.getPrimitiveType.getPrimitiveTypeName)
          }.toArray
          true
        }
      }

      override def next(): Boolean = {
        if (batch != null) { batch.close(); batch = null }
        val rows: Int =
          if (projection.isEmpty) {
            if (footerOnlyRemaining <= 0) return false
            val n = math.min(BatchRows.toLong, footerOnlyRemaining).toInt
            footerOnlyRemaining -= n
            n
          } else {
            if (groupRows == 0 && !advance()) return false
            math.min(BatchRows.toLong, groupRows).toInt
          }
        val vectors = new Array[ColumnVector](required.fields.length)
        var backedIdx = 0
        required.fields.zipWithIndex.foreach { case (f, out) =>
          if (metas.contains(f.name)) {
            val c = new ConstantColumnVector(rows, f.dataType)
            metas(f.name) match {
              case s: String => c.setUtf8String(UTF8String.fromString(s))
              case l: Long => c.setLong(l)
              case other => sys.error(s"unreachable meta constant $other")
            }
            vectors(out) = c
          } else if (projection.nonEmpty &&
              backedIdx < backed.length && backed(backedIdx)._2 == out) {
            val v = new OnHeapColumnVector(rows, f.dataType)
            val (cr, maxDef, pq) = readers(backedIdx)
            fill(cr, v, rows, maxDef, pq, f.dataType)
            vectors(out) = v
            backedIdx += 1
          } else {
            val v = new OnHeapColumnVector(rows, f.dataType)
            v.putNulls(0, rows)
            vectors(out) = v
          }
        }
        if (projection.nonEmpty) groupRows -= rows
        batch = new ColumnarBatch(vectors, rows)
        true
      }

      override def get(): ColumnarBatch = batch

      override def close(): Unit = {
        if (batch != null) { batch.close(); batch = null }
        reader.close()
      }
    }
  }
}
