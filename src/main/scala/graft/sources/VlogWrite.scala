package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._

/** The WRITE half of the graft-vlog connector (completing [[VlogSource]]):
  * `INSERT INTO graft_vlog.`/dir``, `df.write.format("graft-vlog")`
  * append/overwrite, and `writeStream.format("graft-vlog")` — all through
  * [[VersionedTable]]'s commit protocol, so every write is one atomic
  * MVCC version and the table's invariants (staged-then-published, never
  * torn; optimistic concurrency; time travel) hold for SQL writers too.
  *
  * Two-phase choreography (the RowSink discipline on real storage):
  * executor `DataWriter`s stream rows into task-unique parquet files
  * under the job's fresh `data/<token>/` staging dir — unreferenced and
  * therefore INVISIBLE until commit; task `commit()` returns the file's
  * table-relative path; the driver publishes ONE commit referencing
  * exactly the files of the tasks the engine committed. A speculative
  * duplicate attempt either aborts (file deleted) or its message is
  * dropped by the engine — either way its bytes are never referenced,
  * and a crashed task's orphan is retention-windowed vacuum food, never
  * data corruption. `mode("overwrite")` maps through `SupportsTruncate`
  * to the overwrite commit shape, remove-set re-derived per retry (the
  * lost-update discipline `VersionedTable.overwrite` pins).
  *
  * The STREAMING write commits each epoch with the exactly-once
  * `txn:<queryId>/<epochId>` line — a replayed epoch (foreachBatch-less
  * writeStream is still at-least-once between sink write and checkpoint
  * commit) finds its txn already folded and publishes NOTHING; its
  * re-staged files are deleted on the spot. This is the same probe the
  * `appendStreamBatch` sink and `replicateOnce` share, now reachable as
  * plain `writeStream.format("graft-vlog")`.
  */
object VlogWrite {

  private[sources] def toParquet(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val t = f.dataType match {
        case LongType => Types.optional(PrimitiveTypeName.INT64)
        case IntegerType => Types.optional(PrimitiveTypeName.INT32)
        case ShortType => Types.optional(PrimitiveTypeName.INT32)
          .as(LogicalTypeAnnotation.intType(16, true))
        case ByteType => Types.optional(PrimitiveTypeName.INT32)
          .as(LogicalTypeAnnotation.intType(8, true))
        case BooleanType => Types.optional(PrimitiveTypeName.BOOLEAN)
        case DoubleType => Types.optional(PrimitiveTypeName.DOUBLE)
        case FloatType => Types.optional(PrimitiveTypeName.FLOAT)
        case StringType => Types.optional(PrimitiveTypeName.BINARY)
          .as(LogicalTypeAnnotation.stringType())
        case BinaryType => Types.optional(PrimitiveTypeName.BINARY)
        case TimestampType => Types.optional(PrimitiveTypeName.INT64)
          .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.MICROS))
        case TimestampNTZType => Types.optional(PrimitiveTypeName.INT64)
          .as(LogicalTypeAnnotation.timestampType(false, TimeUnit.MICROS))
        case DateType => Types.optional(PrimitiveTypeName.INT32)
          .as(LogicalTypeAnnotation.dateType())
        case other => sys.error(
          s"graft-vlog cannot write column '${f.name}': $other (the " +
            "write surface carries the same primitive subset the reader " +
            "decodes)")
      }
      b.addField(t.named(f.name))
    }
    b.named("graft_vlog")
  }

  private[sources] def deleteStaged(dir: String,
      messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case m: VlogWriteMessage if m.relPath != null =>
        Files.deleteIfExists(Paths.get(dir, m.relPath))
      case _ => ()
    }

  /** add: lines plus stats: lines for every committed file. The
    * (column, min, max) triples ride the commit MESSAGES — each executor
    * DataWriter harvests its own just-written file's footer at task
    * commit (local, parallel), so the driver never re-opens files and a
    * replayed streaming epoch discards plain values, not I/O
    * (r16 review).
    */
  private[sources] def addLines(
      messages: Array[WriterCommitMessage]): Seq[String] = {
    val msgs = messages.collect {
      case m: VlogWriteMessage if m.relPath != null => m
    }.sortBy(_.relPath)
    msgs.map("add:" + _.relPath).toSeq ++
      msgs.flatMap(m => VersionedTable.statsLinesOf(m.relPath, m.stats))
  }
}

final case class VlogWriteMessage(relPath: String,
    stats: Seq[(String, Long, Long)]) extends WriterCommitMessage

final class VlogWriteBuilder(dir: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false

  override def truncate(): WriteBuilder = { truncateFirst = true; this }

  /** Same-name/different-type writes are refused BEFORE any commit can
    * publish (r16 advice): one mistyped append (string id into a long-id
    * table) would otherwise become a durable commit that poisons every
    * later read through mergedSchema's type-change check — Delta rejects
    * at write time for the same reason. Additive columns stay free
    * (that's the evolution contract); an overwrite replaces the whole
    * snapshot, so its schema owes the old one nothing.
    */
  private def validateSchema(): Unit =
    if (!truncateFirst && VersionedTable.currentVersion(dir) >= 0) {
      val existing = VlogSchema.mergedSchema(dir, None)
        .fields.map(f => f.name -> f.dataType).toMap
      info.schema().fields.foreach { f =>
        existing.get(f.name).foreach { dt =>
          require(dt == f.dataType,
            s"graft-vlog write rejected: column '${f.name}' is $dt in " +
              s"$dir but ${f.dataType} in the incoming data — a type " +
              "change would poison every later read (only ADDITIVE " +
              "evolution is supported)")
        }
      }
    }

  override def build(): Write = new Write {
    validateSchema()
    private def bloomCols: Seq[String] =
      Option(info.options().get("bloomColumns")).toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    override def toBatch: BatchWrite =
      new VlogBatchWrite(dir, info.schema(), truncateFirst, bloomCols)
    override def toStreaming: StreamingWrite = {
      require(!truncateFirst,
        "graft-vlog streaming writes are append-only (no complete mode)")
      val opts = info.options()
      val auto = Option(opts.get("autoCompactAt")).map { at =>
        AutoCompact(at.toInt,
          Option(opts.get("autoCompactTarget")).map(_.toInt).getOrElse(1),
          Option(opts.get("autoCompactSmallBytes")).map(_.toLong)
            .getOrElse(32L * 1024 * 1024))
      }
      new VlogStreamingWrite(dir, info.schema(), info.queryId(), auto,
        bloomCols)
    }
  }
}

/** Post-commit auto-compaction policy for a streaming write: when the
  * table holds ≥ `at` small files (< `smallBytes` each), bin-pack them
  * into ≤ `target` files as one follow-up COW commit (r16 verdict task
  * #5 — every epoch publishes ≥1 file per task; without a policy the
  * log grows a file per task per trigger forever).
  */
final case class AutoCompact(at: Int, target: Int, smallBytes: Long)

final class VlogBatchWrite(dir: String, schema: StructType,
    truncateFirst: Boolean, bloomCols: Seq[String] = Seq.empty)
    extends BatchWrite {
  private val token = java.util.UUID.randomUUID.toString

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory =
    new VlogWriterFactory(dir, token, schema, bloomCols)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val adds = VlogWrite.addLines(messages)
    if (truncateFirst)
      // remove-set re-derived per retry attempt: a concurrent append
      // landing between attempts must also be overwritten away
      VersionedTable.commitRetrying(dir, "overwrite") { head =>
        val removed = if (head >= 0) VersionedTable.liveFiles(dir, Some(head))
          else Seq.empty
        "op:overwrite" +: (adds ++ removed.map("remove:" + _))
      }
    else
      VersionedTable.commitRetrying(dir, "append to")(_ => "op:append" +: adds)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    VlogWrite.deleteStaged(dir, messages)
}

final class VlogStreamingWrite(dir: String, schema: StructType,
    queryId: String, autoCompact: Option[AutoCompact] = None,
    bloomCols: Seq[String] = Seq.empty)
    extends StreamingWrite {
  private val token = java.util.UUID.randomUUID.toString

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory =
    new VlogWriterFactory(dir, token, schema, bloomCols)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    VersionedTable.commitTxn(dir, s"vlogw-$queryId", epochId,
      VlogWrite.addLines(messages)) match {
      case Some(_) =>
        // threshold-gated post-commit compaction (its own txn-safe COW
        // commit through the shared optimistic loop; a replayed epoch
        // never triggers it — the None arm below publishes nothing).
        // Small-files-only, so the cost is ∝ the epoch tail, and the
        // exactly-once probe is untouched: txn lines fold from history
        // regardless of which files a compact commit swaps. The `at`
        // threshold IS compactSmallFiles' minSmallFiles floor — one
        // walk decides and packs (r17 review: the hook's own pre-count
        // duplicated the scan on the commit hot path).
        autoCompact.foreach { ac =>
          VersionedTable.compactSmallFiles(
            org.apache.spark.sql.SparkSession.active, dir,
            ac.smallBytes, ac.target, minSmallFiles = ac.at)
        }
      case None =>
        // replayed epoch: the txn is already folded — publish nothing and
        // reclaim the re-staged bytes immediately (they are unreferenced,
        // so this is tidiness, not correctness)
        VlogWrite.deleteStaged(dir, messages)
    }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    VlogWrite.deleteStaged(dir, messages)
}

/** One factory serves both write paths: a task writes at most one
  * parquet file, named by (epoch, partition, task attempt) so no two
  * attempts ever collide; the writer opens LAZILY so an empty partition
  * stages nothing at all.
  */
final class VlogWriterFactory(dir: String, token: String,
    schema: StructType, bloomCols: Seq[String] = Seq.empty)
    extends DataWriterFactory with StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] = writer(-1L, partitionId, taskId)

  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] = writer(epochId, partitionId, taskId)

  private def writer(epochId: Long, partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] = new DataWriter[InternalRow] {
    private val rel =
      s"data/$token/part-e$epochId-p$partitionId-t$taskId.parquet"
    private val msgType = VlogWrite.toParquet(schema)
    private val factory = new SimpleGroupFactory(msgType)
    private var out: ParquetWriter[Group] = _

    override def write(row: InternalRow): Unit = {
      if (out == null) {
        val abs = Paths.get(dir, rel)
        Files.createDirectories(abs.getParent)
        val b = ExampleParquetWriter.builder(new HPath(abs.toUri))
          .withType(msgType).withConf(new Configuration())
        // `.option("bloomColumns", "a,b")` — parquet-native per-group
        // bloom filters, the write-side half of point-lookup skipping
        bloomCols.foreach(c => b.withBloomFilterEnabled(c, true))
        out = b.build()
      }
      val g = factory.newGroup()
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        if (!row.isNullAt(i)) f.dataType match {
          case LongType | TimestampType | TimestampNTZType =>
            g.add(f.name, row.getLong(i))
          case IntegerType | DateType => g.add(f.name, row.getInt(i))
          case ShortType => g.add(f.name, row.getShort(i).toInt)
          case ByteType => g.add(f.name, row.getByte(i).toInt)
          case BooleanType => g.add(f.name, row.getBoolean(i))
          case DoubleType => g.add(f.name, row.getDouble(i))
          case FloatType => g.add(f.name, row.getFloat(i))
          case StringType => g.add(f.name,
            Binary.fromConstantByteArray(row.getUTF8String(i).getBytes))
          case BinaryType => g.add(f.name,
            Binary.fromConstantByteArray(row.getBinary(i)))
          case other => sys.error(s"unreachable: $other survived " +
            "write-schema derivation")
        }
      }
      out.write(g)
    }

    override def commit(): WriterCommitMessage = {
      if (out != null) out.close()
      if (out == null) VlogWriteMessage(null, Seq.empty)
      else VlogWriteMessage(rel,
        VersionedTable.footerStatsAll(Paths.get(dir, rel)).values.toSeq
          .map(st => (st.key, st.min, st.max)))
    }

    override def abort(): Unit = {
      if (out != null) out.close()
      Files.deleteIfExists(Paths.get(dir, rel))
    }

    override def close(): Unit = ()
  }
}
