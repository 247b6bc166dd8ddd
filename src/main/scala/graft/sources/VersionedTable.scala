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

  /** The commit log as data (DESCRIBE HISTORY): one row per version with
    * its operation, add/remove file counts, and txn id if any — the audit
    * surface every table format owes its operators (what changed, when,
    * by which stream). Pure metadata: reads commit files only, never a
    * data byte.
    */
  def history(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    listLog(dir, ".commit").map { v =>
      val lines = readLines(commitFile(dir, v))
      val op = lines.collectFirst {
        case l if l.startsWith("op:") => l.substring(3) }.getOrElse("?")
      val txn = lines.collectFirst {
        case l if l.startsWith("txn:") => l.substring(4) }
      (v, op, lines.count(_.startsWith("add:")).toLong,
        lines.count(_.startsWith("remove:")).toLong, txn)
    }.toDF("version", "op", "n_added", "n_removed", "txn")
  }

  /** Default vacuum retention: a staging directory younger than this is
    * never reclaimed even when unreachable, because it may belong to a
    * writer that has staged but not yet committed (see [[vacuum]]).
    */
  private[graft] val DefaultRetentionMs: Long = 20L * 60 * 1000

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

  /** The one optimistic-retry loop every writer shares: `mkLines` is
    * re-invoked with the head it must commit AGAINST on every attempt, so
    * a remove-carrying writer (merge/delete/overwrite/compact) re-derives
    * its file sets from the new head after losing a race — retrying a
    * stale remove-set would be lost-update (a concurrent append's files
    * would survive an "overwrite"). Append-shaped writers just return
    * their pre-staged lines.
    */
  private def commitRetrying(dir: String, what: String)(
      mkLines: Long => Seq[String]): Long = {
    var attempt = 0
    while (attempt < MaxCommitRetries) {
      val head = currentVersion(dir)
      if (tryCommitLines(dir, head + 1, mkLines(head))) return head + 1
      attempt += 1
    }
    sys.error(s"could not $what $dir after $MaxCommitRetries races")
  }

  private def commitNext(dir: String, op: String, added: Seq[String],
      removed: Seq[String]): Long =
    commitRetrying(dir, s"$op-commit to")(_ => s"op:$op" +:
      (added.map("add:" + _) ++ removed.map("remove:" + _)))

  private def maybeCheckpoint(dir: String, v: Long): Unit =
    if (v > 0 && v % CheckpointEvery == 0) {
      val (entries, _) = liveEntriesReplaying(dir, Some(v))
      val lines = entries.map("live:" + _._1) ++ entries.flatMap {
        case (f, sts) =>
          sts.values.map(st => s"lstat:$f|${st.key}|${st.min}|${st.max}")
      }
      val tmp = Files.createTempFile(logDir(dir), "ckpt.tmp", "")
      Files.write(tmp, lines
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

  /** Per-file data-skipping statistics: min/max of one clustering key,
    * carried as `stats:<file>|<key>|<min>|<max>` log lines next to the
    * file's `add:` and replayed into every snapshot (checkpoints persist
    * them as `lstat:` lines). A file may carry stats for SEVERAL keys
    * (the Z-order layout stats every clustering dimension). Files
    * without stats for the queried key are always read — stats only
    * ever SHRINK a scan, never change results.
    */
  final case class FileStats(key: String, min: Long, max: Long)

  private def parseStats(s: String): Option[(String, FileStats)] =
    s.split('|') match {
      case Array(f, k, lo, hi) =>
        Some((f, FileStats(k, lo.toLong, hi.toLong)))
      case _ => None
    }

  /** Table-relative live data files (+ per-key stats) at `asOf`
    * (default: current), replaying from the newest checkpoint
    * at-or-before it. Exposed with the commit count actually replayed so
    * the spec can pin checkpoint effectiveness.
    */
  private[graft] def liveEntriesReplaying(dir: String, asOf: Option[Long])
      : (Seq[(String, Map[String, FileStats])], Int) = {
    val head = asOf.getOrElse(currentVersion(dir))
    require(head >= 0, s"$dir has no committed version")
    require(Files.exists(commitFile(dir, head)),
      s"version $head does not exist in $dir")
    val ckpt = listLog(dir, ".checkpoint").filter(_ <= head).lastOption
    val base = scala.collection.mutable
      .LinkedHashMap.empty[String, Map[String, FileStats]]
    def addStats(payload: String): Unit =
      parseStats(payload).foreach { case (f, st) =>
        if (base.contains(f)) base(f) = base(f) + (st.key -> st)
      }
    ckpt.foreach { cv =>
      readLines(checkpointFile(dir, cv)).foreach {
        case l if l.startsWith("live:") =>
          base += l.substring(5) -> Map.empty
        case l if l.startsWith("lstat:") => addStats(l.substring(6))
        case _ => ()
      }
    }
    val from = ckpt.map(_ + 1).getOrElse(0L)
    var replayed = 0
    (from to head).foreach { v =>
      replayed += 1
      readLines(commitFile(dir, v)).foreach {
        case l if l.startsWith("add:") =>
          base += l.substring(4) -> Map.empty
        case l if l.startsWith("remove:") => base -= l.substring(7)
        case l if l.startsWith("stats:") => addStats(l.substring(6))
        case _ => ()
      }
    }
    (base.toSeq, replayed)
  }

  private[graft] def liveFilesReplaying(dir: String,
      asOf: Option[Long]): (Seq[String], Int) = {
    val (entries, replayed) = liveEntriesReplaying(dir, asOf)
    (entries.map(_._1), replayed)
  }

  def liveFiles(dir: String, asOf: Option[Long] = None): Seq[String] =
    liveFilesReplaying(dir, asOf)._1

  /** Read the table as of a version (time travel) or at the current head.
    * Reads with `mergeSchema` on: ADDITIVE schema evolution is free —
    * a snapshot spanning files written before and after a column was
    * added unions the schemas, older files supplying NULL for the new
    * column (the parquet-native evolution contract; the spec pins it and
    * pins that COW merge then back-fills physically). At 100 TB the
    * schema union is footer-metadata work, one footer per distinct
    * staged write, not a data scan.
    */
  def read(spark: SparkSession, dir: String,
      asOf: Option[Long] = None): DataFrame = {
    val files = liveFiles(dir, asOf)
    require(files.nonEmpty,
      s"snapshot at $asOf of $dir holds no files (fully deleted or vacuumed)")
    spark.read.option("mergeSchema", "true")
      .parquet(files.map(f => Paths.get(dir, f).toString): _*)
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

  /** Min/max of an INT64 column straight from a parquet file's FOOTER —
    * block-level statistics the writer already paid for, so harvesting
    * them costs metadata reads only, never a data scan (the reason
    * data-skipping stats are free at 100 TB: each task reports its own
    * footer stats at write time; here we read them back once per staged
    * file). None when the column is absent, not INT64-stat-backed, or
    * any block lacks stats — an unstatted file is simply never skipped.
    */
  private def footerKeyStats(abs: Path, key: String): Option[FileStats] =
    try {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(abs.toUri),
        new org.apache.hadoop.conf.Configuration())
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val stats = r.getFooter.getBlocks.asScala.toSeq.map { b =>
          b.getColumns.asScala
            .find(_.getPath.toDotString == key).map(_.getStatistics)
        }
        if (stats.isEmpty || stats.exists(s =>
            s.isEmpty || s.get == null || !s.get.hasNonNullValue)) None
        else {
          val lo = stats.map(_.get.genericGetMin).collect {
            case l: java.lang.Long => l.longValue }
          val hi = stats.map(_.get.genericGetMax).collect {
            case l: java.lang.Long => l.longValue }
          if (lo.size != stats.size || hi.size != stats.size) None
          else Some(FileStats(key, lo.min, hi.max))
        }
      } finally r.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  private def stageWithStats(df: DataFrame, dir: String,
      statKeys: Seq[String]): Seq[String] = {
    val added = stage(df, dir)
    added.map("add:" + _) ++ added.flatMap { f =>
      statKeys.flatMap(k => footerKeyStats(Paths.get(dir, f), k)
        .map(st => s"stats:$f|$k|${st.min}|${st.max}"))
    }
  }

  private def stageClustered(df: DataFrame, dir: String, key: String,
      buckets: Int): Seq[String] =
    stageWithStats(df.repartitionByRange(buckets, col(key))
      .sortWithinPartitions(key), dir, Seq(key))

  /** Bit-spread the low 32 bits of `c` so bit i lands at position 2i —
    * half of the 64-bit Morton (Z-order) interleave, as pure codegen'd
    * bitwise column ops (no UDF).
    */
  private def spreadBits(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFFFFFL))
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x3333333333333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** The 64-bit Morton code of two keys in [0, 2³¹): bits interleave so
    * z-contiguous ranges are axis-ALIGNED blocks of the (a, b) plane —
    * the reason a z-sorted file owns a narrow min/max interval on BOTH
    * dimensions at once.
    */
  private[graft] def zValue(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** Z-ORDERED append: range-partition and sort by the Morton code of
    * (keyA, keyB), then harvest footer stats for BOTH keys into the log —
    * multi-dimensional data skipping, the layout `appendClustered` can't
    * give (linear clustering on one key leaves the other key's values
    * spread uniformly across every file, so its predicates prune
    * nothing; the spec measures exactly that contrast). Keys must be
    * non-negative and < 2³¹ (the interleave's domain). Works through the
    * SAME stats/prune machinery — `readPruned` on EITHER key skips
    * non-overlapping files.
    */
  def appendZOrdered(df: DataFrame, dir: String, keyA: String,
      keyB: String, buckets: Int = 16): Long = {
    require(!df.columns.contains("__z"),
      "appendZOrdered stages through a temporary __z column — rename " +
        "the input's __z first (it would be silently destroyed)")
    val clustered = df.withColumn("__z", zValue(col(keyA), col(keyB)))
      .repartitionByRange(buckets, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
    val lines = stageWithStats(clustered, dir, Seq(keyA, keyB))
    // the interleave's domain is [0, 2^31) per key: out-of-range values
    // wrap through the 32-bit mask (and keyB's bit 31 lands in the Long
    // sign bit), silently scrambling the curve so every file spans the
    // full key range and pruning is defeated with EXACT results — no
    // symptom. The staged footers are already in hand, so the guard is
    // free; enforced BEFORE the commit publishes (a failed stage is
    // vacuumable garbage, never a torn table).
    val stats = lines.filter(_.startsWith("stats:"))
      .flatMap(l => parseStats(l.substring(6))).map(_._2)
    val adds = lines.count(_.startsWith("add:"))
    require(stats.size == 2 * adds,
      s"z-order needs INT64 footer stats on both $keyA and $keyB " +
        s"(got ${stats.size} stats for $adds files) — non-INT64 or " +
        "all-null keys cannot drive the interleave")
    require(stats.forall(st => st.min >= 0L && st.max < (1L << 31)),
      s"z-order keys must lie in [0, 2^31): " +
        stats.filterNot(st => st.min >= 0L && st.max < (1L << 31))
          .map(st => s"${st.key}∈[${st.min},${st.max}]").mkString(", "))
    commitRetrying(dir, "commit to")(_ => "op:append-clustered" +: lines)
  }

  /** Append `df` range-clustered on `key` with per-file min/max stats in
    * the log — the layout half of data skipping: range partitioning makes
    * each file own a narrow key interval, so a later [[readPruned]] scans
    * only the files whose interval overlaps the predicate. This is the
    * OPTIMIZE ZORDER shape reduced to one dimension (the common case;
    * multi-column clustering changes only the repartition expression).
    */
  def appendClustered(df: DataFrame, dir: String, key: String,
      buckets: Int = 8): Long = {
    val lines = stageClustered(df, dir, key, buckets)
    commitRetrying(dir, "commit to")(_ => "op:append-clustered" +: lines)
  }

  /** The file lists a key-range predicate partitions the snapshot into:
    * (files to scan, files skipped by stats). A file with no stats for
    * `key` is always scanned — skipping is an optimization, never a
    * semantics change.
    */
  private[graft] def pruneFiles(dir: String, key: String, lo: Long,
      hi: Long, asOf: Option[Long] = None): (Seq[String], Seq[String]) = {
    val (entries, _) = liveEntriesReplaying(dir, asOf)
    val (keep, skip) = entries.partition { case (_, sts) =>
      sts.get(key) match {
        case Some(st) => st.max >= lo && st.min <= hi
        case None => true
      }
    }
    (keep.map(_._1), skip.map(_._1))
  }

  /** Read only the files whose key interval overlaps [lo, hi], then apply
    * the exact predicate — identical results to a full-scan filter, minus
    * the skipped files' IO (VersionedTableSpec pins both halves).
    */
  def readPruned(spark: SparkSession, dir: String, key: String, lo: Long,
      hi: Long, asOf: Option[Long] = None): DataFrame = {
    val (keep, _) = pruneFiles(dir, key, lo, hi, asOf)
    // a predicate overlapping NO file still needs a schema-correct empty
    // result: fall back to one arbitrary live file, which the exact
    // predicate then empties (one footer of IO, zero matching row groups)
    val files = if (keep.nonEmpty) keep else liveFiles(dir, asOf).take(1)
    require(files.nonEmpty, s"snapshot of $dir holds no files")
    // mergeSchema here too: without it a pruned keep-set spanning pre-
    // and post-evolution files would infer one arbitrary file's schema
    // and silently drop the evolved column that read() returns — the
    // "identical to a full-scan filter" contract must survive evolution
    spark.read.option("mergeSchema", "true")
      .parquet(files.map(f => Paths.get(dir, f).toString): _*)
      .filter(col(key) >= lo && col(key) <= hi)
  }

  /** Compaction (OPTIMIZE): rewrite the current snapshot as `buckets`
    * range-clustered, stats-carrying files in ONE commit — the small-file
    * cure for streaming ingest (every micro-batch commit is its own tiny
    * file set) that simultaneously installs the data-skipping layout.
    * MVCC as ever: older versions keep reading the pre-compaction files
    * until vacuum. Same optimistic-retry discipline as merge.
    */
  def compact(spark: SparkSession, dir: String, key: String,
      buckets: Int = 8): Long =
    commitRetrying(dir, "compact") { head =>
      val removed = liveFiles(dir, Some(head))
      val lines = stageClustered(
        read(spark, dir, Some(head)), dir, key, buckets)
      "op:compact" +: (lines ++ removed.map("remove:" + _))
    }

  /** Replace the whole table contents with `df` (one commit). The staged
    * files are reused across retry attempts (they don't depend on the
    * head) but the REMOVE set is re-derived per attempt: a concurrent
    * append landing between attempts must also be overwritten away, or
    * "replace the whole table" silently keeps its rows (lost-update —
    * the r15 review caught this using a snapshotted remove list).
    */
  def overwrite(df: DataFrame, dir: String): Long = {
    val added = stage(df, dir)
    commitRetrying(dir, "overwrite") { head =>
      val removed = if (head >= 0) liveFiles(dir, Some(head)) else Seq.empty
      "op:overwrite" +: (added.map("add:" + _) ++ removed.map("remove:" + _))
    }
  }

  /** Copy-on-write upsert (j54's SCD1 algebra as a table op): rows of
    * `updates` replace current rows sharing `key`; unmatched rows insert.
    * The read + rewrite + commit runs against one observed head; a commit
    * race re-derives from the new head rather than retrying stale files.
    */
  def merge(spark: SparkSession, updates: DataFrame, dir: String,
      key: String): Long =
    commitRetrying(dir, "merge into") { head =>
      val removed = liveFiles(dir, Some(head))
      val survivors = read(spark, dir, Some(head))
        .join(updates, Seq(key), "left_anti")
      // allowMissingColumns: an EVOLVED updates side (new column) merges
      // against pre-evolution survivors, who supply NULL — the additive
      // write-path half of schema evolution (read() is the other half)
      val added = stage(
        survivors.unionByName(updates, allowMissingColumns = true), dir)
      "op:merge" +: (added.map("add:" + _) ++ removed.map("remove:" + _))
    }

  /** Copy-on-write delete of rows matching `cond` (same race discipline). */
  def delete(spark: SparkSession, dir: String, cond: Column): Long =
    commitRetrying(dir, "delete from") { head =>
      val removed = liveFiles(dir, Some(head))
      val added = stage(read(spark, dir, Some(head)).filter(!cond), dir)
      "op:delete" +: (added.map("add:" + _) ++ removed.map("remove:" + _))
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
    val applied = txnApplied(dir, streamId, batchId)
    if (applied) None
    else commitTxn(dir, streamId, batchId, stage(df, dir).map("add:" + _))
  }

  private def txnApplied(dir: String, streamId: String,
      batchId: Long): Boolean = {
    val txn = s"txn:$streamId/$batchId"
    listLog(dir, ".commit").reverse.exists { v =>
      readLines(commitFile(dir, v)).exists(_ == txn)
    }
  }

  /** Publish a txn-carrying commit (with or without data files),
    * re-probing before every optimistic retry so a racing replay of the
    * SAME txn cannot double-apply it. None = the txn was already in the
    * log.
    */
  private def commitTxn(dir: String, streamId: String, batchId: Long,
      addLines: Seq[String]): Option[Long] = {
    var attempt = 0
    while (attempt < MaxCommitRetries) {
      val v = currentVersion(dir) + 1
      if (txnApplied(dir, streamId, batchId)) return None
      if (tryCommitLines(dir, v,
          Seq("op:stream-append", s"txn:$streamId/$batchId") ++ addLines))
        return Some(v)
      attempt += 1
    }
    sys.error(s"could not stream-append to $dir " +
      s"after $MaxCommitRetries races")
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

  /** The change feed (CDF): rows ADDED by the commits in (fromV, toV] —
    * read from exactly those commits' added files, never a snapshot scan,
    * so following a growing table costs IO proportional to the NEW data
    * (the property that makes incremental pipelines viable at 100 TB).
    * Only append-shaped commits (append / append-clustered /
    * stream-append) qualify: a copy-on-write commit in the range rewrites
    * survivors, and serving its added files as "changes" would re-emit
    * the whole table — the caller gets a loud error instead of silent
    * duplication (Delta's streaming source draws the same line). An
    * empty range yields None (no schema to give).
    */
  def readChanges(spark: SparkSession, dir: String, fromV: Long,
      toV: Long): Option[DataFrame] = {
    require(fromV <= toV, s"empty change range ($fromV, $toV]")
    val added = (fromV + 1 to toV).flatMap { v =>
      val lines = readLines(commitFile(dir, v))
      val op = lines.collectFirst {
        case l if l.startsWith("op:") => l.substring(3) }.getOrElse("?")
      if (!Set("append", "append-clustered", "stream-append").contains(op))
        sys.error(s"version $v of $dir is a '$op' commit — the change " +
          "feed serves append-shaped commits only (a COW rewrite's added " +
          "files are not row-level changes); replicate from a snapshot " +
          "read instead")
      lines.filter(_.startsWith("add:")).map(_.substring(4))
    }
    if (added.isEmpty) None
    else Some(spark.read.option("mergeSchema", "true")
      .parquet(added.map(f => Paths.get(dir, f).toString): _*))
  }

  /** The source version `dst` has already replicated up to under
    * `streamId` (the txn probe, exposed so a replicator resumes from its
    * own TARGET's log — the offset lives in the destination table, which
    * is what makes replication transactional rather than paired with an
    * external checkpoint that can fall out of sync).
    */
  private def lastReplicated(dst: String, streamId: String): Long =
    // newest-first with early exit: a stream's txn ids are monotone in
    // commit order, so the first hit from the tail IS the max — the
    // full-log fold was O(commits) metadata reads per pull (r15 review).
    // The parse is defensive (toLongOption): another stream whose id
    // extends this one past a '/' ("replicate/shardA") would otherwise
    // throw on "shardA/7".toLong and wedge replication forever.
    listLog(dst, ".commit").reverse.iterator.flatMap { v =>
      readLines(commitFile(dst, v)).collectFirst {
        case l if l.startsWith(s"txn:$streamId/") &&
            l.substring(s"txn:$streamId/".length).toLongOption.isDefined =>
          l.substring(s"txn:$streamId/".length).toLong
      }
    }.nextOption().getOrElse(-1L)

  /** One incremental replication pull: read the source's change feed
    * past the destination's recorded high-water mark and commit it to
    * the destination with the source version reached as the txn id — so
    * a crash ANYWHERE replays idempotently: the txn probe skips a pull
    * the destination already absorbed. Returns the (fromV, toV] range
    * applied, or None when the destination was already caught up.
    * Repeated calls are the pull-model streaming loop (Delta's
    * Trigger.Once shape); each pays IO for the new files only.
    * CONTRACT: one replicator per (streamId, dst) at a time — the txn
    * probe makes a RE-RUN of the same pull idempotent (crash replay);
    * two concurrent pulls that observed different source heads overlap
    * in range and carry different txn ids, which no per-version log can
    * reconcile (Delta's txn/appId carries the same single-writer rule).
    */
  def replicateOnce(spark: SparkSession, srcDir: String, dstDir: String,
      streamId: String): Option[(Long, Long)] = {
    // streamId is REQUIRED, not defaulted: two sources fanned into one
    // destination under a shared default would mix their source-valued
    // high-water marks and one source's pulls would no-op forever
    // (r15 review) — callers key the stream by source.
    val from = lastReplicated(dstDir, streamId)
    val to = currentVersion(srcDir)
    if (to <= from) return None
    // even an all-empty change range must advance the high-water mark
    // with a data-less txn commit, or every later pull would rescan the
    // same commits and never reach the caught-up None
    val addLines = readChanges(spark, srcDir, from, to)
      .map(changes => stage(changes, dstDir).map("add:" + _))
      .getOrElse(Seq.empty)
    commitTxn(dstDir, streamId, to, addLines)
    Some((from, to))
  }

  /** Reclaim every data DIRECTORY unreachable from the CURRENT version
    * (older snapshots stop being readable — the retention trade every MVCC
    * store makes explicit). Granularity is the staging directory: each
    * `data/<token>/` is added whole by one commit and removed whole by the
    * COW commit that rewrites it, so a directory with no live parquet is
    * dead in its entirety — including its `_SUCCESS`/checksum sidecars —
    * while sidecars next to live files are never touched. Unreachable
    * directories younger than `retentionMs` are kept: an in-flight writer
    * stages BEFORE committing, and vacuum cannot tell a dead writer from
    * a slow one except by age (Delta's deletedFileRetentionDuration, same
    * reasoning) — reclaiming a fresh staging dir would let its commit
    * publish add-lines to deleted files. A table with no committed
    * version yet vacuums only aged orphans (the died-before-v0 case).
    * Returns the deleted table-relative file paths.
    */
  def vacuum(dir: String,
      retentionMs: Long = DefaultRetentionMs): Seq[String] = {
    val liveDirs =
      if (currentVersion(dir) < 0) Set.empty[String]
      else liveFiles(dir).map(f => Paths.get(f).getParent.toString).toSet
    val dataRoot = Paths.get(dir, "data")
    if (!Files.isDirectory(dataRoot)) return Seq.empty
    val s = Files.list(dataRoot)
    val subdirs = try s.iterator().asScala.filter(Files.isDirectory(_))
      .toSeq
    finally s.close()
    val cutoff = System.currentTimeMillis() - retentionMs
    val deadDirs = subdirs.filterNot(p =>
      liveDirs.contains(Paths.get(dir).relativize(p).toString))
      .filter(p => Files.getLastModifiedTime(p).toMillis <= cutoff)
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
