package graft.sources

import java.nio.file.Paths

import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL `MERGE INTO` / `UPDATE` / (non-translatable) `DELETE` over the
  * vlog table — Spark 4's `SupportsRowLevelOperations` routed into
  * [[VersionedTable]]'s file-granular copy-on-write (r16 verdict task #3:
  * "a real lakehouse user writes MERGE INTO first").
  *
  * GROUP-based (copy-on-write) shape, the one that matches an
  * immutable-parquet format: Spark reads the affected groups (our group
  * = one data FILE), computes their full replacement contents (matched
  * rows transformed, unmatched rows passed through, NOT-MATCHED inserts
  * appended), writes them as new files, and the commit atomically swaps
  * `remove:<scanned files>` for `add:<new files>` — one MVCC version,
  * history intact, exactly the algebra `VersionedTable.merge` uses.
  *
  * The TOUCHED-FILE BOUND survives the SQL path through runtime group
  * filtering: the table exposes a `_file` metadata column (the file a
  * row lives in), the row-level scan declares it as its runtime filter
  * attribute, and Spark's `RowLevelOperationRuntimeGroupFiltering` plans
  * a subquery — `SELECT DISTINCT _file FROM t JOIN source ON cond` over
  * the table's REGULAR batch scan — whose result arrives as an
  * `IN(_file, …)` predicate BEFORE `planInputPartitions`: only files
  * that actually hold matched rows are read, and therefore only those
  * are rewritten (a one-bucket MERGE into an 8-bucket clustered table
  * rewrites ≤2 files, spec-pinned — the same bound `touchedByKey` gives
  * the Column API). Static filter envelopes additionally prune through
  * the log's footer stats, so a clustered-key UPDATE/DELETE skips files
  * before the probe subquery even runs.
  *
  * The scan ↔ write handshake rides the operation instance (the public
  * DSv2 contract: both builders come from one `RowLevelOperation`): the
  * scan records the files it finally planned; the write's commit
  * replaces exactly those. Concurrency: the commit retries through the
  * shared optimistic loop, but a removed file no longer live at the
  * observed head means another writer rewrote a group we are about to
  * replace — that is a real write conflict and fails LOUDLY (Delta/
  * Iceberg draw the same line) instead of silently resurrecting or
  * double-applying rows.
  */
final class VlogRowLevelBuilder(dir: String, info: RowLevelOperationInfo)
    extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation =
    new VlogRowLevelOperation(dir, info.command())
}

final class VlogRowLevelOperation(dir: String,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {

  /** Table-relative paths of the files the row-level scan finally
    * planned (post runtime group filtering) — the groups the write
    * replaces. Written by [[VlogCowScan.planInputPartitions]] on the
    * driver before any write task launches; the engine plans the scan
    * strictly before committing the write.
    */
  @volatile private[sources] var scannedFiles: Option[Seq[String]] = None

  override def command(): RowLevelOperation.Command = cmd

  override def description(): String = s"graft-vlog-cow $cmd $dir"

  /** `_file` must ride the row-level scan's output: the runtime group
    * filter's pruning key resolves against it (and the matching-rows
    * subquery reads the same column from the REGULAR scan).
    */
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(VlogTable.FileCol))

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new VlogCowScanBuilder(this, dir)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val opName = cmd match {
      case RowLevelOperation.Command.DELETE => "delete"
      case RowLevelOperation.Command.UPDATE => "update"
      case _ => "merge"
    }
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new VlogCowBatchWrite(VlogRowLevelOperation.this, dir, opName,
            info.schema())
      }
    }
  }
}

/** Same pushdown surfaces as the regular [[VlogScanBuilder]] (column
  * pruning to the per-file readers, integral/temporal range envelopes
  * for stats-based file skipping), building the runtime-filterable COW
  * scan.
  */
final class VlogCowScanBuilder(op: VlogRowLevelOperation, dir: String)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private val full: StructType = VlogSchema.mergedSchema(dir, None)
  private var required: StructType = full
  private var accepted: Array[Filter] = Array.empty
  private var ranges: Map[String, (Long, Long)] = Map.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    accepted = filters.filter { f =>
      val before = ranges
      ranges = VlogTable.mergeRanges(ranges, Array(f))
      ranges != before
    }
    filters // all residual — skipping is an optimization, never semantics
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new VlogCowScan(op, dir, required, ranges)
}

final class VlogCowScan(op: VlogRowLevelOperation, dir: String,
    required: StructType, ranges: Map[String, (Long, Long)])
    extends Scan with Batch with SupportsRuntimeV2Filtering {

  // snapshot pinned once per operation: the groups replaced are the
  // groups read, resolved against ONE version
  private val pinned: Long = VersionedTable.currentVersion(dir)

  private val statKept: Seq[String] =
    VersionedTable.liveEntriesReplaying(dir, Some(pinned))._1
      .filter { case (_, sts) =>
        ranges.forall { case (key, (lo, hi)) =>
          sts.get(key).forall(st => st.max >= lo && st.min <= hi)
        }
      }.map(_._1)

  // narrowed by filter() when the runtime group filter delivers the
  // matched-file set; starts at the stats-pruned snapshot
  @volatile private var kept: Seq[String] = statKept

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-vlog-cow ${op.command()} $dir version=$pinned " +
      s"files=${kept.size} PushedFileRanges: [${ranges.toSeq.sortBy(_._1)
        .map { case (k, (lo, hi)) => s"$k∈[$lo,$hi]" }.mkString(", ")}]"

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column(VlogTable.FileCol))

  /** The runtime group filter: an `IN(_file, <matched files>)` (or a
    * degenerate `=`) over the values the regular scan emitted — absolute
    * paths, mapped back to table-relative. Anything unparseable keeps
    * the current set (sound: a superset rewrite is still exact, the
    * unmatched rows rewrite to themselves).
    */
  override def filter(predicates: Array[Predicate]): Unit = {
    val allowed: Option[Set[String]] = predicates.collectFirst {
      case p if (p.name() == "IN" || p.name() == "=") &&
          p.children().nonEmpty &&
          p.children()(0).isInstanceOf[NamedReference] &&
          p.children()(0).asInstanceOf[NamedReference]
            .fieldNames().sameElements(Array(VlogTable.FileCol)) =>
        p.children().drop(1).collect {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
            if l.value != null => l.value.toString
        }.toSet
    }
    allowed.foreach { abs =>
      kept = kept.filter(f => abs.contains(Paths.get(dir, f).toString))
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    // the handshake: these exact files are what the write replaces
    op.scannedFiles = Some(kept)
    kept.map(f =>
      VlogInputPartition(Paths.get(dir, f).toString): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new VlogReaderFactory(required)
}

final class VlogCowBatchWrite(op: VlogRowLevelOperation, dir: String,
    opName: String, schema: StructType) extends BatchWrite {
  private val token = java.util.UUID.randomUUID.toString

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = new VlogWriterFactory(dir, token, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val removed = op.scannedFiles.getOrElse(sys.error(
      "row-level write committed before its scan planned — engine " +
        "contract violation"))
    val adds = VlogWrite.addLines(messages)
    VersionedTable.commitRetrying(dir, s"SQL $opName against") { head =>
      // write-conflict check: every group this operation replaces must
      // still be live at the head it commits against — a concurrent COW
      // that rewrote one of them means our replacement rows were derived
      // from a dead snapshot (lost update either way it lands)
      val live = VersionedTable.liveFiles(dir, Some(head)).toSet
      val gone = removed.filterNot(live)
      if (gone.nonEmpty)
        sys.error(s"concurrent update conflict on $dir: " +
          s"${gone.size} file(s) this $opName read were rewritten by " +
          "another writer before it committed — retry the statement " +
          s"(first: ${gone.head})")
      s"op:$opName" +: (adds ++ removed.map("remove:" + _))
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    VlogWrite.deleteStaged(dir, messages)
}
