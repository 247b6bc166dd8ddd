package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

/** Table-maintenance procedures through SQL `CALL` (Spark 4's
  * `ProcedureCatalog` — the surface Iceberg exposes as
  * `CALL catalog.system.rewrite_data_files(...)`): the operations a
  * 100-TB table needs on a schedule — OPTIMIZE (range-clustered or
  * Z-ordered rewrite), small-file bin-packing, and vacuum — become SQL
  * text a scheduler can submit, with the outcome returned as a result
  * row instead of buried in logs. Every procedure routes through
  * [[VersionedTable]]'s optimistic commit protocol, so a `CALL` races
  * concurrent writers exactly like the Scala API it wraps (MVCC: old
  * snapshots stay readable until `vacuum`).
  *
  * Execution note: Spark binds and invokes procedures at ANALYSIS time
  * (`InvokeProcedures`), so the mutation happens when the `CALL` text is
  * analyzed and the returned rows land in the plan as a local relation —
  * the Iceberg semantics.
  */
object VlogProcedures {

  private def P(name: String, dt: DataType) = ProcedureParameter.in(name, dt)

  /** The procedures the vlog catalog serves, by identifier name. */
  def load(name: String): Option[UnboundProcedure] = name match {
    case "compact" => Some(CompactProc)
    case "compact_small_files" => Some(CompactSmallProc)
    case "vacuum" => Some(VacuumProc)
    case "zorder" => Some(ZOrderProc)
    case _ => None
  }
  val names: Seq[String] =
    Seq("compact", "compact_small_files", "vacuum", "zorder")

  /** One-row result relation. `LocalScan` is the DSv2 contract for
    * procedure output: the rows are already on the driver (file counts
    * and commit versions — metadata-sized by construction).
    */
  private final class ProcResult(schema: StructType,
      out: Array[InternalRow]) extends LocalScan {
    override def rows(): Array[InternalRow] = out
    override def readSchema(): StructType = schema
  }

  private def one(schema: StructType, values: Any*): java.util.Iterator[Scan] =
    java.util.Collections.singletonList(
      new ProcResult(schema,
        Array(new GenericInternalRow(values.toArray))): Scan).iterator()

  private def tableDir(row: InternalRow, pos: Int): String = {
    val dir = row.getUTF8String(pos).toString
    require(dir.startsWith("/") &&
      java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir, "_vlog")),
      s"not a graft-vlog table directory: $dir")
    dir
  }

  /** Shared scaffold: all four procedures are deterministic=false
    * one-row-result mutations bound independently of the input schema
    * (the parameters are scalars; Spark coerces by position/name).
    */
  private abstract class VlogProc(procName: String, descr: String,
      params: Array[ProcedureParameter], resultSchema: StructType)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = descr
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false
    protected def run(spark: SparkSession, in: InternalRow): Seq[Any]
    override def call(in: InternalRow): java.util.Iterator[Scan] =
      one(resultSchema, run(SparkSession.active, in): _*)
  }

  /** `CALL graft_vlog.compact('/dir', 'key' [, buckets])` — rewrite the
    * snapshot as range-clustered, stats-carrying files (OPTIMIZE): the
    * small-file cure that simultaneously installs single-key skipping.
    */
  private object CompactProc extends VlogProc("compact",
    "rewrite the current snapshot range-clustered on a key " +
      "(OPTIMIZE): one COW commit, footer stats harvested for skipping",
    Array(
      P("table", StringType).comment("absolute vlog table directory").build(),
      P("key", StringType).comment("clustering column (integral/temporal)")
        .build(),
      P("buckets", IntegerType).defaultValue("8")
        .comment("target file count").build(),
      P("bloom_cols", StringType).defaultValue("''")
        .comment("comma-separated columns to write parquet bloom " +
          "filters for (point-lookup group skipping)").build()),
    StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("files_before", IntegerType, nullable = false),
      StructField("files_after", IntegerType, nullable = false)))) {
    override protected def run(spark: SparkSession,
        in: InternalRow): Seq[Any] = {
      val dir = tableDir(in, 0)
      val before = VersionedTable.liveFiles(dir).size
      val blooms = in.getUTF8String(3).toString.split(",").toSeq
        .map(_.trim).filter(_.nonEmpty)
      val v = VersionedTable.compact(spark, dir,
        in.getUTF8String(1).toString, in.getInt(2), blooms)
      // Seq[Any], NOT Seq(...): a Long head makes Scala infer
      // Seq[Long] and silently WIDEN the Int file counts, which
      // then fail the IntegerType unboxing in the result projection
      Seq[Any](v, before, VersionedTable.liveFiles(dir, Some(v)).size)
    }
  }

  /** `CALL graft_vlog.zorder('/dir', 'a,b[,c…]' [, buckets])` — the
    * multi-dimensional OPTIMIZE: rewrite the snapshot Morton-interleaved
    * on 2..8 keys so EVERY listed dimension prunes files.
    */
  private object ZOrderProc extends VlogProc("zorder",
    "rewrite the current snapshot Z-ordered on 2..8 comma-separated " +
      "keys: multi-dimensional data skipping in one COW commit",
    Array(
      P("table", StringType).comment("absolute vlog table directory").build(),
      P("keys", StringType)
        .comment("comma-separated clustering columns (2..8)").build(),
      P("buckets", IntegerType).defaultValue("16")
        .comment("target file count").build()),
    StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("files_before", IntegerType, nullable = false),
      StructField("files_after", IntegerType, nullable = false)))) {
    override protected def run(spark: SparkSession,
        in: InternalRow): Seq[Any] = {
      val dir = tableDir(in, 0)
      val keys = in.getUTF8String(1).toString.split(",").toSeq
        .map(_.trim).filter(_.nonEmpty)
      val before = VersionedTable.liveFiles(dir).size
      val v = VersionedTable.rewriteZOrdered(spark, dir, keys, in.getInt(2))
      // Seq[Any], NOT Seq(...): a Long head makes Scala infer
      // Seq[Long] and silently WIDEN the Int file counts, which
      // then fail the IntegerType unboxing in the result projection
      Seq[Any](v, before, VersionedTable.liveFiles(dir, Some(v)).size)
    }
  }

  /** `CALL graft_vlog.compact_small_files('/dir' [, small_bytes, target,
    * min_small_files])` — bin-pack only the small tail streaming ingest
    * leaves; cost ∝ the tail, never the table. `version` is NULL when
    * fewer than `min_small_files` small files exist (no-op).
    */
  private object CompactSmallProc extends VlogProc("compact_small_files",
    "bin-pack live files under small_bytes into <= target files " +
      "(one COW commit); NULL version = nothing to pack",
    Array(
      P("table", StringType).comment("absolute vlog table directory").build(),
      P("small_bytes", LongType).defaultValue("33554432")
        .comment("size floor: files under this are packed").build(),
      P("target", IntegerType).defaultValue("1")
        .comment("packed file count").build(),
      P("min_small_files", IntegerType).defaultValue("2")
        .comment("no-op below this many small files").build()),
    StructType(Seq(
      StructField("version", LongType, nullable = true),
      StructField("files_before", IntegerType, nullable = false),
      StructField("files_after", IntegerType, nullable = false)))) {
    override protected def run(spark: SparkSession,
        in: InternalRow): Seq[Any] = {
      val dir = tableDir(in, 0)
      val before = VersionedTable.liveFiles(dir).size
      val v = VersionedTable.compactSmallFiles(spark, dir, in.getLong(1),
        in.getInt(2), in.getInt(3))
      Seq[Any](v.map(Long.box).orNull, before,
        VersionedTable.liveFiles(dir, v).size)
    }
  }

  /** `CALL graft_vlog.vacuum('/dir' [, retention_ms])` — reclaim file
    * sets no snapshot references, older than the retention window (the
    * in-flight-writer grace period — see [[VersionedTable.vacuum]]).
    */
  private object VacuumProc extends VlogProc("vacuum",
    "delete unreferenced staged/removed file sets older than " +
      "retention_ms; time travel older than the horizon stops",
    Array(
      P("table", StringType).comment("absolute vlog table directory").build(),
      P("retention_ms", LongType)
        .defaultValue(VersionedTable.DefaultRetentionMs.toString)
        .comment("grace period for unreferenced files").build()),
    StructType(Seq(
      StructField("files_reclaimed", IntegerType, nullable = false)))) {
    override protected def run(spark: SparkSession,
        in: InternalRow): Seq[Any] = {
      val dir = tableDir(in, 0)
      Seq[Any](VersionedTable.vacuum(dir, in.getLong(1)).size)
    }
  }
}
