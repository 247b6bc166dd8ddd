package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The WRITE half of the DataSource V2 connector surface (a4/a5/a6 cover
  * the read half): a metrics sink exercising the full two-phase batch
  * write protocol — executors produce `DataWriter`s whose task-level
  * `commit()` returns a `WriterCommitMessage` (here: row count + an
  * order-independent checksum), and the driver-side `BatchWrite.commit`
  * publishes the job's aggregate ATOMICALLY only after every task
  * succeeded; `abort` publishes nothing. This is the seam that makes V2
  * writes exactly-once under task retry and speculation: Spark delivers
  * at most ONE commit message per partition to the driver commit, so
  * duplicate task attempts never double-count — the spec drives both the
  * happy path and a simulated attempt-race through the public API.
  *
  * Scale shape: task state is two longs regardless of row count, the
  * commit message is constant-size, and the driver registry holds one
  * entry per target — nothing is data-sized anywhere. A real table sink
  * (parquet, JDBC) differs only in what `write(row)` does and what the
  * commit message carries (file manifests, transaction ids); the protocol
  * choreography demonstrated here is identical.
  */
class RowSink extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-rowsink"
  // writes carry their own schema (the input DataFrame's) — accept it
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new RowSinkTable(
      Option(opts.get("target")).getOrElse("default"), schema)
  }
}

final class RowSinkTable(target: String, writeSchema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"graft-rowsink($target)"
  override def schema(): StructType = writeSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new RowSinkBatchWrite(target, info.schema())
        override def toStreaming: StreamingWrite =
          new RowSinkStreamingWrite(target, info.schema())
      }
    }
}

/** Task-level result: constant-size, mergeable on the driver. The checksum
  * is an XOR of per-row mixes — commutative and associative, so the job
  * total is independent of partitioning, task order, and retry history.
  */
final case class RowSinkTaskResult(partitionId: Int, rows: Long,
    checksum: Long) extends WriterCommitMessage

final class RowSinkBatchWrite(target: String, schema: StructType)
    extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new RowSinkWriterFactory(schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    var rows = 0L
    var sum = 0L
    messages.foreach { case RowSinkTaskResult(_, r, c) =>
      rows += r; sum ^= c
    }
    RowSinkRegistry.publish(target, rows, sum)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    RowSinkRegistry.recordAbort(target)
}

/** The STREAMING half of the protocol: identical task-side choreography,
  * but the driver commit is keyed by EPOCH (micro-batch id). Publishing is
  * a keyed PUT, so a replayed epoch (crash between sink commit and
  * checkpoint commit — the at-least-once window every streaming sink
  * lives with) overwrites its own entry with identical content and the
  * epoch fold stays exactly-once — the same batchId-keyed idempotency
  * recipe as `StreamOps.idempotentBatchWrite`, here at the connector
  * protocol layer.
  */
final class RowSinkStreamingWrite(target: String, schema: StructType)
    extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new RowSinkStreamingWriterFactory(schema)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    var rows = 0L
    var sum = 0L
    messages.foreach { case RowSinkTaskResult(_, r, c) =>
      rows += r; sum ^= c
    }
    RowSinkRegistry.publishEpoch(target, epochId, rows, sum)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    RowSinkRegistry.recordAbort(target)
}

/** Streaming writer factory — ships to executors, so it must be a
  * self-contained serializable class (an anonymous factory would capture
  * the non-serializable StreamingWrite). Task state is epoch-agnostic:
  * the epoch key matters only at driver commit.
  */
final class RowSinkStreamingWriterFactory(schema: StructType)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new RowSinkWriterFactory(schema).createWriter(partitionId, taskId)
}

final class RowSinkWriterFactory(schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private var sum = 0L

      override def write(row: InternalRow): Unit = {
        var h = 1469598103934665603L // FNV offset basis — any fixed seed
        var i = 0
        while (i < schema.length) {
          val fh: Long =
            if (row.isNullAt(i)) 0x9E3779B97F4A7C15L
            else schema(i).dataType match {
              case LongType => row.getLong(i)
              case DoubleType =>
                java.lang.Double.doubleToLongBits(row.getDouble(i))
              case StringType => row.getUTF8String(i).hashCode.toLong
              case _ => row.get(i, schema(i).dataType).hashCode.toLong
            }
          h = (h ^ fh) * 1099511628211L // FNV-1a step over field hashes
          i += 1
        }
        rows += 1
        sum ^= h
      }

      override def commit(): WriterCommitMessage =
        RowSinkTaskResult(partitionId, rows, sum)

      // nothing external was made visible, so abort has nothing to undo —
      // exactly the property that lets Spark retry the task blindly
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

/** Driver-side registry the spec (and a monitoring consumer) reads: one
  * constant-size entry per target, written only by a successful job-level
  * commit.
  */
object RowSinkRegistry {
  final case class Committed(rows: Long, checksum: Long)
  private val committed = new ConcurrentHashMap[String, Committed]()
  private val aborts = new ConcurrentHashMap[String, java.lang.Long]()

  def publish(target: String, rows: Long, checksum: Long): Unit =
    committed.put(target, Committed(rows, checksum))
  def recordAbort(target: String): Unit =
    aborts.merge(target, 1L, (a, b) => a + b)

  // epoch-keyed streaming commits: PUT semantics make replays idempotent
  private val epochs =
    new ConcurrentHashMap[(String, Long), Committed]()
  def publishEpoch(target: String, epochId: Long, rows: Long,
      checksum: Long): Unit =
    epochs.put((target, epochId), Committed(rows, checksum))
  /** The exactly-once fold a consumer reads: distinct epochs, summed. */
  def epochTotal(target: String): Committed = {
    var rows = 0L
    var sum = 0L
    epochs.forEach { (k, v) =>
      if (k._1 == target) { rows += v.rows; sum ^= v.checksum }
    }
    Committed(rows, sum)
  }
  def epochCount(target: String): Int = {
    var n = 0
    epochs.forEach((k, _) => if (k._1 == target) n += 1)
    n
  }
  def epochGet(target: String, epochId: Long): Option[Committed] =
    Option(epochs.get((target, epochId)))

  def get(target: String): Option[Committed] =
    Option(committed.get(target))
  def abortCount(target: String): Long =
    Option(aborts.get(target)).map(_.longValue).getOrElse(0L)
  def clear(target: String): Unit = {
    committed.remove(target); aborts.remove(target)
    val stale = new java.util.ArrayList[(String, Long)]()
    epochs.forEach((k, _) => if (k._1 == target) stale.add(k))
    stale.forEach(epochs.remove(_))
  }
}
