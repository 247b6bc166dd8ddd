package graft.sources

import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A minimal snapshot-versioned table format — the Delta/Iceberg-shaped
  * capability the r14 verdict named as the frontier beyond the §2 contract
  * (adjacent to j80's snapshot diff and j54's SCD1 upsert, which operate on
  * EXTERNALLY-versioned inputs; this makes the versioning itself a property
  * of the table). Everything here is the public MVCC-log recipe (Armbrust
  * et al., "Delta Lake: High-Performance ACID Table Storage over Cloud
  * Object Stores", VLDB'20), re-derived small:
  *
  *  - **Data** is plain immutable parquet: every write lands its files
  *    under a fresh `data/<token>/` subdirectory, so a writer can NEVER
  *    clobber another's bytes — commit races are resolved entirely in the
  *    metadata log.
  *  - **Log** is one file per version under `_vlog/`: `%020d.commit`
  *    carrying `add:`/`remove:` lines of table-relative paths. A version
  *    exists iff its commit file does, and data files not reachable from a
  *    committed version are INVISIBLE — a writer that dies after staging
  *    parquet but before publishing its commit leaves garbage, never a
  *    torn table (the atomicity law FormatsSpec pins).
  *  - **Commit** is an atomic single-file publish: write `<v>.commit.tmp.*`
  *    then ATOMIC_MOVE (no replace) to `<v>.commit`. Two writers racing to
  *    the same version: exactly one move succeeds, the loser re-reads the
  *    log and retries against the next version (optimistic concurrency —
  *    the conditional-put every object store offers; spec-pinned with two
  *    threads racing 20 rounds).
  *  - **Snapshot at v** = replay of commits ≤ v. To keep replay O(1)-ish
  *    as versions accumulate, every CHECKPOINT_EVERY-th commit also writes
  *    `%020d.checkpoint` holding the full live-file list at that version;
  *    readers start from the newest checkpoint ≤ v and replay only the
  *    tail (the `_last_checkpoint` recipe; spec drives 25 commits and
  *    asserts replay reads ≤ CHECKPOINT_EVERY commit files).
  *  - **Time travel**: `read(spark, dir, asOf = Some(v))` reconstructs any
  *    retained snapshot; `read(spark, dir)` is the current one.
  *  - **merge/delete are copy-on-write**: rewrite survivors + publish one
  *    commit that adds the new files and removes every replaced one.
  *    Readers of older versions still see the removed files (MVCC) until
  *    `vacuum()` reclaims files unreachable from the current version.
  *
  * Scale notes (the 100 TB honesty): this local implementation rewrites
  * the FULL table on merge/delete — a cluster deployment partitions the
  * data layout and rewrites only touched partitions/files (the add/remove
  * log algebra is already file-granular, so that change is confined to
  * the writer); the log itself is metadata-sized (bytes per file, not per
  * row) and the checkpoint bounds replay exactly as at demo scale.
  * ATOMIC_MOVE-without-replace maps to `putIfAbsent` on object stores.
  */
object VersionedTable {

  private[graft] val CheckpointEvery = 10
  private val MaxCommitRetries = 50

  private def logDir(dir: String): Path = Paths.get(dir, "_vlog")
  private def commitFile(dir: String, v: Long): Path =
    logDir(dir).resolve(f"$v%020d.commit")
  private def checkpointFile(dir: String, v: Long): Path =
    logDir(dir).resolve(f"$v%020d.checkpoint")

  private def listLog(dir: String, suffix: String): Seq[Long] = {
    val ld = logDir(dir)
    if (!Files.isDirectory(ld)) Seq.empty
    else {
      val s = Files.list(ld)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(suffix))
        .map(_.stripSuffix(suffix).toLong).toSeq.sorted
      finally s.close()
    }
  }

  /** Highest committed version, or -1 for an empty/absent table. */
  def currentVersion(dir: String): Long =
    listLog(dir, ".commit").lastOption.getOrElse(-1L)

  /** Attempt to publish version `v`. Returns false iff another writer won
    * the race for exactly this version (any other failure throws).
    */
  private[graft] def tryCommit(dir: String, v: Long, op: String,
      added: Seq[String], removed: Seq[String]): Boolean =
    tryCommitLines(dir, v, s"op:$op" +:
      (added.map("add:" + _) ++ removed.map("remove:" + _)))

  /** Publish the next version, retrying past optimistic-concurrency losses.
    * NOTE: append-only commits are always safe to retry; merge/delete
    * callers re-derive their file sets against the new head before retrying
    * (see [[merge]]) — retrying a stale remove-set would be lost-update.
    */
  private def commitNext(dir: String, op: String, added: Seq[String],
      removed: Seq[String]): Long = {
    var attempt = 0
    while (attempt < MaxCommitRetries) {
      val v = currentVersion(dir) + 1
      if (tryCommit(dir, v, op, added, removed)) return v
      attempt += 1
    }
    sys.error(s"could not commit to $dir after $MaxCommitRetries races")
  }

  private def maybeCheckpoint(dir: String, v: Long): Unit =
    if (v > 0 && v % CheckpointEvery == 0) {
      val files = liveFiles(dir, Some(v))
      val tmp = Files.createTempFile(logDir(dir), "ckpt.tmp", "")
      Files.write(tmp, files.map("live:" + _)
        .mkString("", "\n", "\n").getBytes("UTF-8"),
        StandardOpenOption.TRUNCATE_EXISTING)
      try {
        Files.createLink(checkpointFile(dir, v), tmp)
        Files.deleteIfExists(tmp)
      } catch { // a racing checkpointer already wrote it — fine
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp)
      }
    }

  private def readLines(p: Path): Seq[String] =
    Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty)

  /** Table-relative live data files at `asOf` (default: current), replaying
    * from the newest checkpoint at-or-before it. Exposed with the commit
    * count actually replayed so the spec can pin checkpoint effectiveness.
    */
  private[graft] def liveFilesReplaying(dir: String,
      asOf: Option[Long]): (Seq[String], Int) = {
    val head = asOf.getOrElse(currentVersion(dir))
    require(head >= 0, s"$dir has no committed version")
    require(Files.exists(commitFile(dir, head)),
      s"version $head does not exist in $dir")
    val ckpt = listLog(dir, ".checkpoint").filter(_ <= head).lastOption
    val base = scala.collection.mutable.LinkedHashSet.empty[String]
    ckpt.foreach { cv =>
      readLines(checkpointFile(dir, cv))
        .filter(_.startsWith("live:")).foreach(l => base += l.substring(5))
    }
    val from = ckpt.map(_ + 1).getOrElse(0L)
    var replayed = 0
    (from to head).foreach { v =>
      replayed += 1
      readLines(commitFile(dir, v)).foreach {
        case l if l.startsWith("add:") => base += l.substring(4)
        case l if l.startsWith("remove:") => base -= l.substring(7)
        case _ => ()
      }
    }
    (base.toSeq, replayed)
  }

  def liveFiles(dir: String, asOf: Option[Long] = None): Seq[String] =
    liveFilesReplaying(dir, asOf)._1

  /** Read the table as of a version (time travel) or at the current head. */
  def read(spark: SparkSession, dir: String,
      asOf: Option[Long] = None): DataFrame = {
    val files = liveFiles(dir, asOf)
    require(files.nonEmpty,
      s"snapshot at $asOf of $dir holds no files (fully deleted or vacuumed)")
    spark.read.parquet(files.map(f => Paths.get(dir, f).toString): _*)
  }

  /** Stage `df` as immutable parquet under a fresh data/<token>/ dir and
    * return the staged table-relative file paths. Nothing is visible until
    * a commit references them.
    */
  private def stage(df: DataFrame, dir: String): Seq[String] = {
    val token = java.util.UUID.randomUUID.toString
    val sub = s"data/$token"
    df.write.parquet(Paths.get(dir, sub).toString)
    val s = Files.list(Paths.get(dir, sub))
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      .map(n => s"$sub/$n").toSeq.sorted
    finally s.close()
  }

  /** Append `df` as a new version; returns the committed version. */
  def append(df: DataFrame, dir: String): Long =
    commitNext(dir, "append", stage(df, dir), Seq.empty)

  /** Replace the whole table contents with `df` (one commit). */
  def overwrite(df: DataFrame, dir: String): Long = {
    val removed = if (currentVersion(dir) >= 0) liveFiles(dir) else Seq.empty
    commitNext(dir, "overwrite", stage(df, dir), removed)
  }

  /** Copy-on-write upsert (j54's SCD1 algebra as a table op): rows of
    * `updates` replace current rows sharing `key`; unmatched rows insert.
    * The read + rewrite + commit runs against one observed head; a commit
    * race re-derives from the new head rather than retrying stale files.
    */
  def merge(spark: SparkSession, updates: DataFrame, dir: String,
      key: String): Long = {
    var attempt = 0
    while (attempt < MaxCommitRetries) {
      val head = currentVersion(dir)
      val removed = liveFiles(dir, Some(head))
      val survivors = read(spark, dir, Some(head))
        .join(updates, Seq(key), "left_anti")
      val added = stage(survivors.unionByName(updates), dir)
      if (tryCommit(dir, head + 1, "merge", added, removed))
        return head + 1
      attempt += 1 // lost the race: new head has new files — re-derive
    }
    sys.error(s"could not merge into $dir after $MaxCommitRetries races")
  }

  /** Copy-on-write delete of rows matching `cond` (same race discipline). */
  def delete(spark: SparkSession, dir: String, cond: Column): Long = {
    var attempt = 0
    while (attempt < MaxCommitRetries) {
      val head = currentVersion(dir)
      val removed = liveFiles(dir, Some(head))
      val added = stage(read(spark, dir, Some(head)).filter(!cond), dir)
      if (tryCommit(dir, head + 1, "delete", added, removed))
        return head + 1
      attempt += 1
    }
    sys.error(s"could not delete from $dir after $MaxCommitRetries races")
  }

  /** Idempotent streaming append — the exactly-once sink contract on top
    * of the commit log (Delta's `txn` action re-derived): each micro-batch
    * commits with a `txn:<streamId>/<batchId>` line; a foreachBatch replay
    * after a crash-between-sink-and-checkpoint re-runs the SAME batchId,
    * finds its txn already in the log, and commits nothing — so the table
    * converges to exactly the unbroken run's contents while a naive
    * append sink double-writes (StreamingSpec forces the replay window
    * and asserts both halves). Returns Some(version) on a fresh commit,
    * None when the batch was already applied. The txn scan walks the
    * metadata log (commit files only, newest first with early exit); a
    * cluster deployment folds the latest-txn-per-stream map into the
    * checkpoint files exactly like the live-file list, keeping the probe
    * O(1) — same mechanism, elided here where logs are short.
    */
  def appendStreamBatch(df: DataFrame, dir: String, streamId: String,
      batchId: Long): Option[Long] = {
    val txn = s"$streamId/$batchId"
    val applied = listLog(dir, ".commit").reverse.exists { v =>
      readLines(commitFile(dir, v)).exists(_ == s"txn:$txn")
    }
    if (applied) None
    else {
      val added = stage(df, dir)
      var attempt = 0
      while (attempt < MaxCommitRetries) {
        val v = currentVersion(dir) + 1
        // another racer may have been a replay of the SAME txn (two
        // restarts): re-probe before every attempt so the loser of the
        // race cannot double-apply it
        if (listLog(dir, ".commit").reverse.exists { cv =>
              readLines(commitFile(dir, cv)).exists(_ == s"txn:$txn")
            }) return None
        if (tryCommitLines(dir, v,
            Seq("op:stream-append", s"txn:$txn") ++
              added.map("add:" + _))) return Some(v)
        attempt += 1
      }
      sys.error(s"could not stream-append to $dir " +
        s"after $MaxCommitRetries races")
    }
  }

  private def tryCommitLines(dir: String, v: Long,
      lines: Seq[String]): Boolean = {
    Files.createDirectories(logDir(dir))
    val tmp = Files.createTempFile(logDir(dir), f"$v%020d.commit.tmp", "")
    Files.write(tmp, lines.mkString("", "\n", "\n").getBytes("UTF-8"),
      StandardOpenOption.TRUNCATE_EXISTING)
    try {
      // createLink, NOT ATOMIC_MOVE: on POSIX a rename silently REPLACES
      // an existing target (two racers would both "win" and one commit
      // would vanish — measured in the spec before this line changed);
      // link(2) is the local-FS atomic create-if-absent, the same
      // conditional-put contract object stores offer
      Files.createLink(commitFile(dir, v), tmp)
      Files.deleteIfExists(tmp)
      maybeCheckpoint(dir, v)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp); false
    }
  }

  /** Reclaim every data DIRECTORY unreachable from the CURRENT version
    * (older snapshots stop being readable — the retention trade every MVCC
    * store makes explicit). Granularity is the staging directory: each
    * `data/<token>/` is added whole by one commit and removed whole by the
    * COW commit that rewrites it, so a directory with no live parquet is
    * dead in its entirety — including its `_SUCCESS`/checksum sidecars —
    * while sidecars next to live files are never touched. Returns the
    * deleted table-relative file paths.
    */
  def vacuum(dir: String): Seq[String] = {
    val liveDirs = liveFiles(dir)
      .map(f => Paths.get(f).getParent.toString).toSet
    val dataRoot = Paths.get(dir, "data")
    if (!Files.isDirectory(dataRoot)) return Seq.empty
    val s = Files.list(dataRoot)
    val subdirs = try s.iterator().asScala.filter(Files.isDirectory(_))
      .toSeq
    finally s.close()
    val deadDirs = subdirs.filterNot(p =>
      liveDirs.contains(Paths.get(dir).relativize(p).toString))
    val deleted = deadDirs.flatMap { dd =>
      val w = Files.walk(dd)
      val files = try w.iterator().asScala.filter(Files.isRegularFile(_))
        .map(p => Paths.get(dir).relativize(p).toString).toSeq
      finally w.close()
      files.foreach(f => Files.deleteIfExists(Paths.get(dir, f)))
      Files.deleteIfExists(dd)
      files
    }
    deleted.sorted
  }
}
