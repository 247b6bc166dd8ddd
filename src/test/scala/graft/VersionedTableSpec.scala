package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.VersionedTable

/** Laws of the snapshot-versioned table format (SURVEY §2 row
  * `a7_time_travel` carries the oracle; this spec pins the format
  * PROPERTIES the oracle can't see: atomicity, optimistic concurrency,
  * checkpoint-bounded replay, MVCC retention, vacuum).
  */
class VersionedTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDir(): String =
    Files.createTempDirectory("graft-vlog-spec").toString

  private def df(ids: Long*) = {
    import spark.implicits._
    // one file per staged version: COW is FILE-granular (r16), so tests
    // that reason about which staging dirs die must control row→file
    // co-location, not leave it to local-mode slicing
    ids.map(i => (i, s"v$i")).toDF("id", "payload").coalesce(1)
  }

  private def idSet(d: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    d.select("id", "payload").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("staged-but-uncommitted data files are invisible (atomicity)") {
    val dir = freshDir()
    VersionedTable.append(df(1L, 2L), dir)
    // a writer that died after staging parquet but before publishing its
    // commit: bytes on disk under data/, no log entry
    df(99L).write.parquet(Paths.get(dir, "data/orphan-died").toString)
    assert(idSet(VersionedTable.read(spark, dir)).map(_._1) == Set(1L, 2L),
      "uncommitted files leaked into a read")
    // the retention window: a FRESH unreachable dir may be an in-flight
    // writer mid-stage, so the default vacuum must leave it alone —
    // reclaiming it would let that writer commit add-lines to deleted
    // files
    assert(VersionedTable.vacuum(dir).isEmpty,
      "default vacuum reclaimed a staging dir inside the retention window")
    // past the window (retention 0), vacuum reclaims exactly the orphan,
    // never a live file
    val dead = VersionedTable.vacuum(dir, retentionMs = 0L)
    assert(dead.nonEmpty && dead.forall(_.startsWith("data/orphan-died")),
      s"vacuum removed the wrong files: $dead")
    assert(idSet(VersionedTable.read(spark, dir)).map(_._1) == Set(1L, 2L))
  }

  test("vacuum on a table that died before v0 reclaims the aged orphan") {
    val dir = freshDir()
    // first-ever writer staged parquet, never committed: no version exists
    df(7L).write.parquet(Paths.get(dir, "data/orphan-no-v0").toString)
    assert(VersionedTable.currentVersion(dir) == -1L)
    val dead = VersionedTable.vacuum(dir, retentionMs = 0L)
    assert(dead.nonEmpty && dead.forall(_.startsWith("data/orphan-no-v0")),
      s"pre-v0 orphan not reclaimed: $dead")
  }

  test("commit races resolve to exactly one winner per version") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = freshDir()
    VersionedTable.append(df(1L), dir) // v0 exists
    (1 to 20).foreach { round =>
      val v = VersionedTable.currentVersion(dir) + 1
      val gate = new java.util.concurrent.CountDownLatch(1)
      val racers = (0 until 2).map { w =>
        Future {
          gate.await()
          VersionedTable.tryCommit(dir, v, s"race$round-$w",
            Seq(s"data/race$round/w$w.parquet"), Seq.empty)
        }
      }
      gate.countDown()
      val results = racers.map(Await.result(_, 60.seconds))
      assert(results.count(identity) == 1,
        s"round $round: ${results.count(identity)} winners for version $v")
    }
    // every version number appears exactly once in the log
    assert(VersionedTable.currentVersion(dir) == 20L)
  }

  test("concurrent merges with disjoint keys both land (retry re-derives)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = freshDir()
    VersionedTable.append(df(1L, 2L, 3L, 4L), dir)
    // two writers upserting DISJOINT keys at the same time: optimistic
    // concurrency forces one to lose the first commit and re-derive
    // against the other's head — the lost-update test
    val fa = Future(VersionedTable.merge(spark,
      df(1L).withColumn("payload", lit("A")), dir, "id"))
    val fb = Future(VersionedTable.merge(spark,
      df(2L).withColumn("payload", lit("B")), dir, "id"))
    Await.result(fa, 120.seconds); Await.result(fb, 120.seconds)
    assert(VersionedTable.currentVersion(dir) == 2L,
      "expected exactly two merge commits after the race")
    assert(idSet(VersionedTable.read(spark, dir)) ==
      Set((1L, "A"), (2L, "B"), (3L, "v3"), (4L, "v4")),
      "a merge was lost or applied against a stale snapshot")
  }

  test("overwrite removes EVERY live file at its commit head") {
    val dir = freshDir()
    VersionedTable.append(df(1L), dir)
    VersionedTable.append(df(2L), dir) // a second live file set
    VersionedTable.overwrite(df(9L), dir)
    assert(idSet(VersionedTable.read(spark, dir)) == Set((9L, "v9")),
      "overwrite kept rows from a pre-existing commit")
    // MVCC: the pre-overwrite snapshot is still whole
    assert(idSet(VersionedTable.read(spark, dir, Some(1L))).map(_._1) ==
      Set(1L, 2L))
  }

  test("checkpoints bound log replay; every historical version stays exact") {
    val dir = freshDir()
    (0 until 25).foreach(i => VersionedTable.append(df(i.toLong), dir))
    val (files, replayed) = VersionedTable.liveFilesReplaying(dir, None)
    assert(files.size >= 25, "appended files missing from the snapshot")
    assert(replayed <= VersionedTable.CheckpointEvery,
      s"read replayed $replayed commits — checkpoint not used")
    // time travel to an arbitrary mid checkpoint-gap version
    assert(VersionedTable.read(spark, dir, Some(13L)).count() == 14L)
    assert(VersionedTable.read(spark, dir, Some(3L)).count() == 4L)
  }

  test("clustered writes carry footer stats; pruned reads skip non-overlapping files") {
    val dir = freshDir()
    val big = spark.range(0L, 10000L)
      .select(col("id"), (col("id") % 7).as("v"))
    VersionedTable.appendClustered(big, dir, "id", buckets = 8)
    val total = VersionedTable.liveFiles(dir).size
    assert(total >= 4, s"range clustering produced too few files: $total")
    // a 1000-id predicate over ~1250-id buckets overlaps at most 2 files
    val (keep, skip) = VersionedTable.pruneFiles(dir, "id", 2000L, 2999L)
    assert(keep.nonEmpty && skip.nonEmpty && keep.size <= 2,
      s"stats did not prune: kept ${keep.size} of $total")
    assert(keep.size + skip.size == total)
    // identical results to the full-scan filter, minus the skipped IO
    val pruned = VersionedTable.readPruned(spark, dir, "id", 2000L, 2999L)
    val full = VersionedTable.read(spark, dir)
      .filter(col("id") >= 2000L && col("id") <= 2999L)
    assert(pruned.count() == 1000L)
    assert(pruned.except(full).isEmpty && full.except(pruned).isEmpty,
      "pruned read changed results")
    // a predicate overlapping NOTHING returns a schema-correct empty df
    assert(VersionedTable.readPruned(spark, dir, "id",
      50000L, 60000L).count() == 0L)
    // files without stats are never skipped: a plain (unstatted) append
    // must always be scanned even when its keys overlap the predicate
    import spark.implicits._
    VersionedTable.append(Seq((2500L, 99L)).toDF("id", "v"), dir)
    val (keep2, _) = VersionedTable.pruneFiles(dir, "id", 2000L, 2999L)
    assert(keep2.size == keep.size + 1, "unstatted file was skipped")
    assert(VersionedTable.readPruned(spark, dir, "id", 2000L, 2999L)
      .count() == 1001L)
  }

  test("compaction collapses small-file commits and installs the skip layout") {
    val dir = freshDir()
    // streaming-shaped ingest: many tiny txn-logged commits
    (0 until 6).foreach { i =>
      val batch = spark.range(i * 100L, i * 100L + 100L).toDF("id")
      assert(VersionedTable.appendStreamBatch(batch, dir, "s", i.toLong)
        .nonEmpty)
    }
    // replaying an already-applied batch commits nothing
    assert(VersionedTable.appendStreamBatch(
      spark.range(0L, 100L).toDF("id"), dir, "s", 3L).isEmpty)
    val before = VersionedTable.liveFiles(dir).size
    val preVersion = VersionedTable.currentVersion(dir)
    VersionedTable.compact(spark, dir, "id", buckets = 2)
    val after = VersionedTable.liveFiles(dir).size
    assert(after < before, s"compaction did not shrink: $before -> $after")
    // contents identical, and the rewrite installed prunable stats
    assert(VersionedTable.read(spark, dir).count() == 600L)
    val (keep, skip) = VersionedTable.pruneFiles(dir, "id", 0L, 299L)
    assert(skip.nonEmpty, "compacted files carry no usable stats")
    assert(VersionedTable.readPruned(spark, dir, "id", 0L, 299L)
      .count() == 300L)
    // MVCC: the pre-compaction snapshot still reads until vacuum
    assert(VersionedTable.read(spark, dir, Some(preVersion))
      .count() == 600L)
  }

  test("Z-order clusters BOTH dimensions; linear clustering only one") {
    // 16,384 points on a 128×128 grid. Z-ordered into 16 files ≈ 16
    // axis-aligned 32×32 blocks, so a 16-wide band on EITHER axis
    // overlaps only the blocks that touch it; linearly clustering on x
    // leaves y uniform in every file — y-predicates prune nothing.
    val pts = spark.range(16384L)
      .select((col("id") % 128).as("x"), expr("id DIV 128").as("y"))
    val zdir = freshDir()
    VersionedTable.appendZOrdered(pts, zdir, "x", "y", buckets = 16)
    val total = VersionedTable.liveFiles(zdir).size
    val (kx, sx) = VersionedTable.pruneFiles(zdir, "x", 0L, 15L)
    val (ky, sy) = VersionedTable.pruneFiles(zdir, "y", 0L, 15L)
    assert(sx.size * 2 >= total && sy.size * 2 >= total,
      s"z-order pruned too little: x keeps ${kx.size}, y keeps " +
        s"${ky.size} of $total")
    // both pruned reads are exact (2,048 grid points per 16-wide band)
    assert(VersionedTable.readPruned(spark, zdir, "x", 0L, 15L)
      .count() == 2048L)
    assert(VersionedTable.readPruned(spark, zdir, "y", 0L, 15L)
      .count() == 2048L)
    // the contrast: linear clustering on x cannot prune y at all
    val ldir = freshDir()
    VersionedTable.appendClustered(pts, ldir, "x", buckets = 16)
    val (kly, sly) = VersionedTable.pruneFiles(ldir, "y", 0L, 15L)
    assert(sly.isEmpty && kly.size == VersionedTable.liveFiles(ldir).size,
      "a linear-x layout should carry no y stats to prune with")
  }

  test("merge rewrites ONLY the files containing matched keys (file-granular COW)") {
    import spark.implicits._
    val dir = freshDir()
    val big = spark.range(0L, 8000L)
      .select(col("id"), (col("id") % 7).as("v"))
    VersionedTable.appendClustered(big, dir, "id", buckets = 8)
    val total = VersionedTable.liveFiles(dir).size
    assert(total >= 6, s"clustering produced too few files: $total")
    // updates confined to one ~1000-id bucket: the stats prune + key
    // probe must bound the rewrite to the file(s) owning that interval —
    // at 100 TB this is the difference between rewriting one file and
    // rewriting the table (the r15 verdict's one `weak`)
    VersionedTable.merge(spark,
      Seq((2100L, 99L), (2200L, 98L)).toDF("id", "v"), dir, "id")
    val removedByMerge = VersionedTable.history(spark, dir)
      .filter(col("op") === "merge").select("n_removed").as[Long].head()
    assert(removedByMerge <= 2,
      s"single-bucket upsert rewrote $removedByMerge of $total files")
    // contents exact: matched replaced, neighbors untouched, count kept
    val cur = VersionedTable.read(spark, dir)
    assert(cur.count() == 8000L)
    val got = cur.filter(col("id").isin(2100L, 2200L, 2300L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(2100L -> 99L, 2200L -> 98L, 2300L -> 2300L % 7),
      s"file-granular merge diverged: $got")
    // MVCC intact: the pre-merge snapshot still serves the old values
    assert(VersionedTable.read(spark, dir, Some(0L))
      .filter(col("id") === 2100L).select("v").as[Long].head() == 2100L % 7)
    // a pure insert (no key matches anything) rewrites NOTHING: the
    // update envelope misses every file's stats interval, so the probe
    // scan never even runs
    VersionedTable.merge(spark, Seq((9999L, 1L)).toDF("id", "v"), dir, "id")
    val removedByInsert = VersionedTable.history(spark, dir)
      .filter(col("version") === 2L).select("n_removed").as[Long].head()
    assert(removedByInsert == 0L,
      s"pure insert rewrote $removedByInsert files")
    assert(VersionedTable.read(spark, dir).count() == 8001L)
  }

  test("delete rewrites only the files holding matching rows") {
    import spark.implicits._
    val dir = freshDir()
    VersionedTable.appendClustered(
      spark.range(0L, 8000L).toDF("id"), dir, "id", buckets = 8)
    val total = VersionedTable.liveFiles(dir).size
    VersionedTable.delete(spark, dir, col("id").between(100L, 199L))
    val removed = VersionedTable.history(spark, dir)
      .filter(col("op") === "delete").select("n_removed").as[Long].head()
    assert(removed <= 2, s"narrow delete rewrote $removed of $total files")
    assert(VersionedTable.read(spark, dir).count() == 7900L)
    assert(VersionedTable.read(spark, dir)
      .filter(col("id").between(100L, 199L)).count() == 0L)
    // a predicate matching nothing publishes a data-less commit — the
    // history records the operation, the snapshot is unchanged
    VersionedTable.delete(spark, dir, col("id") === -5L)
    val noop = VersionedTable.history(spark, dir)
      .filter(col("version") === 2L)
      .select("n_added", "n_removed").as[(Long, Long)].head()
    assert(noop == ((0L, 0L)), s"no-match delete staged files: $noop")
    assert(VersionedTable.read(spark, dir).count() == 7900L)
  }

  test("exactly-once probe replays the checkpointed tail, not the whole log") {
    val dir = freshDir()
    (0 until 25).foreach { i =>
      assert(VersionedTable.appendStreamBatch(
        spark.range(i.toLong, i + 1L).toDF("id"), dir, "s", i.toLong)
        .nonEmpty)
    }
    // the latest-txn map rides the checkpoint like the live-file list:
    // the probe after 25 commits reads ≤ CheckpointEvery commit files
    val (txns, replayed) = VersionedTable.latestTxnsReplaying(dir)
    assert(txns.get("s").contains(24L), s"latest-txn fold diverged: $txns")
    assert(replayed <= VersionedTable.CheckpointEvery,
      s"txn probe replayed $replayed commits — ltxn not checkpoint-folded")
    // replaying ANY earlier batch is a no-op (batchId ≤ latest), even one
    // older than the newest checkpoint
    assert(VersionedTable.appendStreamBatch(
      spark.range(0L, 1L).toDF("id"), dir, "s", 3L).isEmpty)
    assert(VersionedTable.appendStreamBatch(
      spark.range(0L, 1L).toDF("id"), dir, "s", 24L).isEmpty)
    // an unrelated stream id is independent
    assert(VersionedTable.appendStreamBatch(
      spark.range(0L, 1L).toDF("id"), dir, "s2", 0L).nonEmpty)
  }

  test("change feed metadata attributes every row to its commit") {
    import spark.implicits._
    val dir = freshDir()
    VersionedTable.append(df(1L, 2L), dir)          // v0
    VersionedTable.append(df(3L), dir)              // v1
    VersionedTable.append(df(4L, 5L), dir)          // v2
    val feed = VersionedTable.readChangeFeed(spark, dir, -1L, 2L).get
    assert(feed.columns.toSet ==
      Set("id", "payload", "_commit_version", "_change_type"))
    val byV = feed.groupBy("_commit_version")
      .agg(sort_array(collect_list("id")).as("ids"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(byV == Map(0L -> Seq(1L, 2L), 1L -> Seq(3L),
      2L -> Seq(4L, 5L)), s"commit attribution diverged: $byV")
    assert(feed.select("_change_type").distinct()
      .as[String].collect().toSeq == Seq("insert"))
    // the bare feed (what replication stages) stays metadata-free — the
    // source's history must not leak into the destination's DATA
    assert(VersionedTable.readChanges(spark, dir, -1L, 2L).get
      .columns.toSet == Set("id", "payload"))
  }

  test("z-order layout is deterministic: same ingest publishes the same " +
      "file boundaries") {
    // r17: stageZOrdered routes rows through value-derived equi-width
    // z-buckets (identity partitioner), replacing the sampled range
    // exchange whose RangePartitioner seed made the SAME ingest publish
    // different layouts run to run (observed: the 3-key pruning pin below
    // flipped with mere suite ordering). Two independent ingests of the
    // same data must now agree file-for-file on count and on every
    // pruning decision.
    val pts = spark.range(16384L)
      .select((col("id") % 128).as("x"), expr("id DIV 128").as("y"))
    val d1 = freshDir(); val d2 = freshDir()
    VersionedTable.appendZOrdered(pts, d1, "x", "y", buckets = 16)
    VersionedTable.appendZOrdered(pts, d2, "x", "y", buckets = 16)
    assert(VersionedTable.liveFiles(d1).size ==
      VersionedTable.liveFiles(d2).size)
    for {
      k <- Seq("x", "y")
      (lo, hi) <- Seq((0L, 15L), (16L, 47L), (48L, 127L), (31L, 32L))
    } {
      val (k1, s1) = VersionedTable.pruneFiles(d1, k, lo, hi)
      val (k2, s2) = VersionedTable.pruneFiles(d2, k, lo, hi)
      assert(k1.size == k2.size && s1.size == s2.size,
        s"layout diverged on $k∈[$lo,$hi]: " +
          s"${k1.size}/${s1.size} vs ${k2.size}/${s2.size}")
    }
  }

  test("3-key Z-order prunes on every axis; domain guard scales with k") {
    // 32³ points in a cube; a 3-way interleave budgets 21 bits per key
    val pts = spark.range(32768L).select(
      (col("id") % 32).as("x"),
      (expr("id DIV 32") % 32).as("y"),
      expr("id DIV 1024").as("z"))
    val dir = freshDir()
    VersionedTable.appendZOrdered(pts, dir, Seq("x", "y", "z"), buckets = 8)
    val total = VersionedTable.liveFiles(dir).size
    Seq("x", "y", "z").foreach { k =>
      val (keep, skip) = VersionedTable.pruneFiles(dir, k, 0L, 7L)
      assert(skip.size * 3 >= total,
        s"3-key z-order pruned too little on $k: kept ${keep.size} of " +
          s"$total")
      // a quarter-band on any axis is exactly 8·32·32 points
      assert(VersionedTable.readPruned(spark, dir, k, 0L, 7L)
        .count() == 8192L, s"pruned read on $k lost rows")
    }
    // a key outside [0, 2^21) must fail LOUDLY before the commit — the
    // spread fold drops high bits, which would scramble the curve and
    // silently defeat pruning with exact results
    val bad = spark.range(4L).select(col("id").as("x"), col("id").as("y"),
      (col("id") + (1L << 21)).as("z"))
    val err = intercept[IllegalArgumentException] {
      VersionedTable.appendZOrdered(bad, freshDir(), Seq("x", "y", "z"))
    }
    assert(err.getMessage.contains("2^21"), s"wrong guard: ${err.getMessage}")
    // the 2-key budget is 31 bits, NOT 32: at 2^31 the second key's top
    // bit would spread into the Long sign bit and the signed range
    // partitioner would scramble the curve (r16 review caught the k-way
    // generalization briefly loosening exactly this guard)
    val bad2 = spark.range(4L).select(col("id").as("x"),
      (col("id") + (1L << 31)).as("y"))
    val err2 = intercept[IllegalArgumentException] {
      VersionedTable.appendZOrdered(bad2, freshDir(), "x", "y")
    }
    assert(err2.getMessage.contains("2^31"),
      s"2-key guard regressed: ${err2.getMessage}")
  }

  test("no-overlap pruned read keeps the full evolved schema") {
    import spark.implicits._
    val dir = freshDir()
    VersionedTable.appendClustered(
      spark.range(0L, 100L).toDF("id"), dir, "id", buckets = 2)
    VersionedTable.appendClustered(
      Seq((200L, "x")).toDF("id", "extra"), dir, "id", buckets = 1)
    // every live file is statted and none overlaps: the empty result must
    // still carry the FULL merged schema, not one arbitrary file's
    // (r15 advice — the one-file fallback missed evolved columns)
    val out = VersionedTable.readPruned(spark, dir, "id", 5000L, 6000L)
    assert(out.columns.toSet == Set("id", "extra"),
      s"empty pruned read lost evolved columns: ${out.columns.toSeq}")
    assert(out.count() == 0L)
  }

  test("DSv2 batch scan serves the snapshot: schema union, count(*) from footers, file skipping") {
    import spark.implicits._
    import graft.sources.{VersionedTable => VT}
    val dir = freshDir()
    VT.appendClustered(spark.range(0L, 2000L)
      .select(col("id"), (col("id") % 7).as("v")), dir, "id", buckets = 4)
    VT.append(Seq((5000L, 1L, "x")).toDF("id", "v", "extra").coalesce(1),
      dir)
    val dsv2 = spark.read.format("graft-vlog").option("path", dir).load()
    // merged schema includes the evolved column; the custom per-file
    // reader NULL-backfills it for pre-evolution files
    assert(dsv2.columns.toSet == Set("id", "v", "extra"))
    val a = dsv2.select("id", "v", "extra")
    val b = VT.read(spark, dir).select("id", "v", "extra")
    assert(a.except(b).isEmpty && b.except(a).isEmpty,
      "DSv2 scan diverged from VersionedTable.read")
    assert(dsv2.filter(col("extra").isNotNull).count() == 1L)
    // count(*) prunes the projection to zero columns: the reader answers
    // from footer row counts without opening a record reader
    assert(dsv2.count() == 2001L)
    // an integral range predicate prunes whole FILES through the log
    // stats at planning time (visible as files= in the scan description)
    val pruned = dsv2.filter(col("id") >= 100L && col("id") <= 299L)
    val desc = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() == 200L)
    val filesShown = "files=(\\d+)".r.findFirstMatchIn(desc).map(_.group(1))
    assert(filesShown.exists(_.toInt <= 2),
      s"range scan did not skip files: $filesShown in\n$desc")
    // time travel through the provider option
    assert(spark.read.format("graft-vlog").option("path", dir)
      .option("version", "0").load().count() == 2000L)
    // a non-primitive column fails schema derivation loudly, never
    // mis-decodes
    val arrDir = freshDir()
    VT.append(Seq((1L, Seq(1, 2))).toDF("id", "xs"), arrDir)
    val err = intercept[RuntimeException] {
      spark.read.format("graft-vlog").option("path", arrDir).load()
    }
    assert(err.getMessage.contains("graft-vlog cannot serve column"),
      s"wrong error: ${err.getMessage}")
  }

  test("DSv2 batch WRITE appends and overwrites through the commit protocol") {
    import spark.implicits._
    val dir = freshDir()
    // writes target an EXISTING table (creation is VersionedTable.append's
    // job — the catalog rejects DDL by design)
    VersionedTable.append(df(1L, 2L), dir)                          // v0
    Seq((3L, "v3"), (4L, "v4")).toDF("id", "payload")
      .write.format("graft-vlog").option("path", dir)
      .mode("append").save()                                       // v1
    assert(VersionedTable.currentVersion(dir) == 1L,
      "a DSv2 append must publish exactly ONE version")
    assert(idSet(VersionedTable.read(spark, dir)) ==
      Set((1L, "v1"), (2L, "v2"), (3L, "v3"), (4L, "v4")))
    assert(VersionedTable.history(spark, dir)
      .filter(col("version") === 1L).select("op")
      .as[String].head() == "append")
    // the engine's own reader round-trips the engine's own writer
    assert(spark.read.format("graft-vlog").option("path", dir)
      .load().count() == 4L)
    // SQL INSERT INTO through the catalog (one more atomic version)
    spark.conf.set("spark.sql.catalog.graft_vlog",
      "graft.sources.VlogCatalog")
    spark.sql(s"INSERT INTO graft_vlog.`$dir` VALUES (5, 'v5')")   // v2
    assert(idSet(VersionedTable.read(spark, dir))
      .contains((5L, "v5")), "INSERT INTO row missing")
    // overwrite routes through SupportsTruncate: one commit replaces the
    // whole live set, and MVCC keeps the pre-overwrite snapshot readable
    Seq((9L, "v9")).toDF("id", "payload")
      .write.format("graft-vlog").option("path", dir)
      .mode("overwrite").save()                                    // v3
    assert(idSet(VersionedTable.read(spark, dir)) == Set((9L, "v9")))
    assert(idSet(VersionedTable.read(spark, dir, Some(2L))).map(_._1) ==
      Set(1L, 2L, 3L, 4L, 5L), "pre-overwrite snapshot lost")
    // a time-travel snapshot is not a write target
    intercept[Exception] {
      Seq((7L, "x")).toDF("id", "payload").write.format("graft-vlog")
        .option("path", dir).option("version", "0")
        .mode("append").save()
    }
    // DSv2 writes harvest footer stats for every INT64 column at commit
    // time: a range-clustered INSERT is immediately data-skippable, just
    // like appendClustered's files
    val sdir = freshDir()
    VersionedTable.append(spark.range(0L, 1L).toDF("id"), sdir)
    spark.range(0L, 4000L).toDF("id").repartitionByRange(4, col("id"))
      .sortWithinPartitions("id")
      .write.format("graft-vlog").option("path", sdir)
      .mode("append").save()
    val (keep, skip) = VersionedTable.pruneFiles(sdir, "id", 3000L, 3999L)
    assert(skip.size >= 2,
      s"DSv2-written files carry no stats: kept ${keep.size}, " +
        s"skipped ${skip.size}")
    assert(VersionedTable.readPruned(spark, sdir, "id", 3000L, 3999L)
      .count() == 1000L, "stats-pruned read of DSv2 files lost rows")
  }

  test("post-pruning statistics make a small vlog table broadcast-eligible") {
    val dir = freshDir()
    VersionedTable.append(spark.range(0L, 25L)
      .select(col("id").as("k"), (col("id") % 5).as("grp")), dir)
    val dim = spark.read.format("graft-vlog").option("path", dir).load()
    val fact = spark.range(0L, 100000L)
      .select((col("id") % 25L).as("k"), col("id").as("v"))
    val joined = fact.join(dim, "k")
    // the STATIC plan must already pick BHJ from estimateStatistics —
    // without reported stats a DSv2 scan defaults to "unknown = huge"
    // and the planner would shuffle both sides (AQE might rescue it at
    // runtime, but the 100 TB story wants the right plan up front)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"small vlog side not broadcast:\n$plan")
    assert(joined.count() == 100000L)
  }

  test("catalog SQL time travel: VERSION AS OF serves every retained snapshot") {
    val dir = freshDir()
    VersionedTable.append(df(1L, 2L), dir)                     // v0
    VersionedTable.append(df(3L), dir)                         // v1
    VersionedTable.merge(spark,
      df(2L).withColumn("payload", lit("upd")), dir, "id")     // v2
    spark.conf.set("spark.sql.catalog.graft_vlog",
      "graft.sources.VlogCatalog")
    def q(at: String) = spark.sql(
      s"SELECT id, payload FROM graft_vlog.`$dir` $at ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(q("VERSION AS OF 0") == Seq((1L, "v1"), (2L, "v2")))
    assert(q("VERSION AS OF 1") == Seq((1L, "v1"), (2L, "v2"), (3L, "v3")))
    assert(q("VERSION AS OF 2") == Seq((1L, "v1"), (2L, "upd"), (3L, "v3")))
    assert(q("") == q("VERSION AS OF 2"), "head read != newest snapshot")
    // the scan must SAY which snapshot it serves (the PlanSpec-style pin)
    val plan = spark.sql(
      s"SELECT id FROM graft_vlog.`$dir` VERSION AS OF 1")
      .queryExecution.executedPlan.toString
    assert(plan.contains("version=1"), s"snapshot not pinned in scan:\n$plan")
    // unknown identifiers are the standard missing-table error
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM graft_vlog.`/no/such/table`").collect()
    }
  }

  test("SQL DELETE and TIMESTAMP AS OF complete the catalog surface") {
    import spark.implicits._
    val dir = freshDir()
    VersionedTable.append(df(1L, 2L, 3L), dir)                     // v0
    Thread.sleep(40) // commit mtimes must straddle the probe instant
    val betweenMicros = System.currentTimeMillis() * 1000L
    Thread.sleep(40)
    VersionedTable.append(df(4L), dir)                             // v1
    // a NULL-keyed row: SQL three-valued logic says `id <= 1` is UNKNOWN
    // for it, and DELETE removes only TRUE rows — it must survive
    // (r16 review: the unwrapped Column routing deleted it)
    VersionedTable.append(Seq[(java.lang.Long, String)]((null, "vnull"))
      .toDF("id", "payload").coalesce(1), dir)                     // v2
    spark.conf.set("spark.sql.catalog.graft_vlog",
      "graft.sources.VlogCatalog")
    // DELETE routes through SupportsDelete into the file-granular COW
    spark.sql(s"DELETE FROM graft_vlog.`$dir` WHERE id <= 1 OR id = 4")
    val survivors = VersionedTable.read(spark, dir)
      .select("payload").collect().map(_.getString(0)).toSet
    assert(survivors == Set("v2", "v3", "vnull"),
      s"SQL DELETE diverged (NULL row must survive): $survivors")
    assert(VersionedTable.history(spark, dir)
      .filter(col("version") === 3L).select("op")
      .as[String].head() == "delete")
    // DESCRIBE HISTORY through SQL: the @history suffix mounts the
    // commit log itself as a queryable table
    val hist = spark.sql(s"SELECT version, op, n_removed " +
      s"FROM graft_vlog.`$dir@history` ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(hist.map(_._2).toSeq ==
      Seq("append", "append", "append", "delete"),
      s"@history table diverged: ${hist.toSeq}")
    assert(hist.last._3 > 0L, "the COW delete must report removed files")
    // TIMESTAMP AS OF between v0 and v1 serves exactly v0 (resolution by
    // commit-file publish times)
    val lit = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(betweenMicros / 1000L))
    val rows = spark.sql(
      s"SELECT id FROM graft_vlog.`$dir` TIMESTAMP AS OF '$lit'")
      .collect().map(_.getLong(0)).toSet
    assert(rows == Set(1L, 2L, 3L),
      s"timestamp travel served the wrong snapshot: $rows")
    // a timestamp predating the table is a loud error, not an empty read
    intercept[Exception] {
      spark.sql(s"SELECT id FROM graft_vlog.`$dir` " +
        "TIMESTAMP AS OF '1990-01-01 00:00:00'").collect()
    }
  }

  test("change feed serves exactly the appended rows; COW in range errors loudly") {
    val dir = freshDir()
    VersionedTable.append(df(1L, 2L), dir)          // v0
    VersionedTable.append(df(3L), dir)              // v1
    VersionedTable.append(df(4L, 5L), dir)          // v2
    // the feed reads ONLY the range's added files, not a snapshot
    val ch = VersionedTable.readChanges(spark, dir, 0L, 2L).get
    assert(idSet(ch).map(_._1) == Set(3L, 4L, 5L),
      s"change feed diverged: ${idSet(ch)}")
    // an empty range has no schema to give
    assert(VersionedTable.readChanges(spark, dir, 2L, 2L).isEmpty)
    // a COW commit inside the range must fail loudly, never re-emit the
    // rewritten table as "changes"
    VersionedTable.delete(spark, dir, col("id") === 1L) // v3, COW
    val err = intercept[RuntimeException] {
      VersionedTable.readChanges(spark, dir, 2L, 3L)
    }
    assert(err.getMessage.contains("append-shaped"),
      s"wrong error: ${err.getMessage}")
  }

  test("incremental replication is idempotent and pays only for new files") {
    val src = freshDir()
    val dst = freshDir()
    VersionedTable.append(df(1L, 2L), src)
    VersionedTable.append(df(3L), src)
    // first pull: catches dst up to src v1
    assert(VersionedTable.replicateOnce(spark, src, dst, "repl-src") ==
      Some((-1L, 1L)))
    assert(idSet(VersionedTable.read(spark, dst)) ==
      idSet(VersionedTable.read(spark, src)))
    // caught up: the pull is a no-op
    assert(VersionedTable.replicateOnce(spark, src, dst, "repl-src").isEmpty)
    // source grows; the next pull moves ONLY the delta and re-running
    // the same pull (crash replay) double-applies nothing
    VersionedTable.append(df(4L, 5L), src)
    assert(VersionedTable.replicateOnce(spark, src, dst, "repl-src") ==
      Some((1L, 2L)))
    assert(VersionedTable.replicateOnce(spark, src, dst, "repl-src").isEmpty)
    assert(idSet(VersionedTable.read(spark, dst)) ==
      idSet(VersionedTable.read(spark, src)),
      "replica diverged from source after incremental pulls")
    // the destination holds one stream-append commit per pull, keyed by
    // the source version it reached — the offset lives IN the table
    assert(VersionedTable.currentVersion(dst) == 1L)
  }

  test("additive schema evolution: new columns union in, NULL-backfilled") {
    import spark.implicits._
    val dir = freshDir()
    VersionedTable.append(df(1L, 2L), dir) // (id, payload)
    VersionedTable.append(
      Seq((3L, "v3", "x")).toDF("id", "payload", "extra"), dir)
    val cur = VersionedTable.read(spark, dir)
    assert(cur.columns.toSet == Set("id", "payload", "extra"),
      s"schemas did not union: ${cur.columns.toSeq}")
    val byId = cur.collect()
      .map(r => r.getLong(0) -> Option(r.getAs[String]("extra"))).toMap
    assert(byId == Map(1L -> None, 2L -> None, 3L -> Some("x")),
      s"old files must supply NULL for the new column: $byId")
    // time travel to BEFORE the evolution keeps the old schema exactly
    assert(VersionedTable.read(spark, dir, Some(0L)).columns.toSeq ==
      Seq("id", "payload"))
    // COW merge with an evolved updates side back-fills physically
    VersionedTable.merge(spark,
      Seq((1L, "v1b", "y")).toDF("id", "payload", "extra"), dir, "id")
    val after = VersionedTable.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getAs[String]("payload"),
        Option(r.getAs[String]("extra")))).toSet
    assert(after == Set((1L, "v1b", Some("y")), (2L, "v2", None),
      (3L, "v3", Some("x"))), s"evolved merge diverged: $after")
  }

  test("history reports every commit's op, file deltas, and txn id") {
    import spark.implicits._
    val dir = freshDir()
    VersionedTable.append(df(1L, 2L), dir)
    VersionedTable.merge(spark,
      df(1L).withColumn("payload", lit("u")), dir, "id")
    VersionedTable.appendStreamBatch(df(3L), dir, "s", 7L)
    val h = VersionedTable.history(spark, dir)
      .as[(Long, String, Long, Long, Option[String])]
      .collect().sortBy(_._1)
    assert(h.map(r => (r._1, r._2)).toSeq ==
      Seq((0L, "append"), (1L, "merge"), (2L, "stream-append")),
      s"history ops diverged: ${h.toSeq}")
    assert(h.forall(_._3 > 0L), "every commit here added files")
    assert(h(1)._4 > 0L && h(0)._4 == 0L,
      "only the COW merge removes files")
    assert(h(2)._5.contains("s/7"), s"txn id missing: ${h(2)._5}")
  }

  test("time travel reads every snapshot; vacuum trades history for space") {
    val dir = freshDir()
    VersionedTable.append(df(1L, 2L, 3L), dir)                 // v0
    VersionedTable.merge(spark,
      df(2L).withColumn("payload", lit("upd")), dir, "id")     // v1
    VersionedTable.delete(spark, dir, col("id") === 1L)        // v2
    assert(idSet(VersionedTable.read(spark, dir, Some(0L))) ==
      Set((1L, "v1"), (2L, "v2"), (3L, "v3")))
    assert(idSet(VersionedTable.read(spark, dir, Some(1L))) ==
      Set((1L, "v1"), (2L, "upd"), (3L, "v3")))
    assert(idSet(VersionedTable.read(spark, dir)) ==
      Set((2L, "upd"), (3L, "v3")))
    intercept[IllegalArgumentException] { // a version that never existed
      VersionedTable.read(spark, dir, Some(7L))
    }
    val dead = VersionedTable.vacuum(dir, retentionMs = 0L)
    assert(dead.nonEmpty, "COW left nothing to vacuum — not MVCC")
    // current head still reads; the pre-vacuum snapshot is gone (retention)
    assert(idSet(VersionedTable.read(spark, dir)) ==
      Set((2L, "upd"), (3L, "v3")))
    intercept[Exception] {
      VersionedTable.read(spark, dir, Some(0L)).collect()
    }
  }

  test("time-typed file stats: a timestamp-clustered table prunes on time (r17)") {
    import org.apache.spark.sql.expressions.Window
    val dir = freshDir()
    // 4000 hourly NTZ timestamps clustered by ts: the footer's INT64
    // micros stats land in the log exactly like an id column's, so a
    // time predicate skips files — the single most common 100 TB layout
    // (ingest clustered by event time) finally prunes on its own key
    val rows = spark.range(0L, 4000L).select(col("id"),
      expr("timestampadd(HOUR, CAST(id AS INT), " +
        "TIMESTAMP_NTZ'2026-01-01 00:00:00')").as("ts"))
    VersionedTable.appendClustered(rows, dir, "ts", buckets = 4)
    val loMicros = java.time.LocalDateTime.of(2026, 1, 1, 0, 0)
      .plusHours(3000).toInstant(java.time.ZoneOffset.UTC).toEpochMilli *
      1000L
    val hiMicros = java.time.LocalDateTime.of(2026, 1, 1, 0, 0)
      .plusHours(3999).toInstant(java.time.ZoneOffset.UTC).toEpochMilli *
      1000L
    val (keep, skip) = VersionedTable.pruneFiles(dir, "ts",
      loMicros, hiMicros)
    assert(skip.size >= 2,
      s"ts-clustered files carry no usable stats: kept ${keep.size}, " +
        s"skipped ${skip.size}")
    assert(VersionedTable.readPruned(spark, dir, "ts", loMicros, hiMicros)
      .count() === 1000L, "time-pruned read lost rows")
    // the DSv2 scan prunes the same files straight from SQL-shaped
    // predicates: an NTZ literal arrives as LocalDateTime and converts
    // to the exact micros envelope
    val dsv2 = spark.read.format("graft-vlog").option("path", dir).load()
      .filter(col("ts") >= expr("TIMESTAMP_NTZ'2026-05-06 00:00:00'"))
    assert(dsv2.count() ===
      rows.filter(col("ts") >= expr("TIMESTAMP_NTZ'2026-05-06 00:00:00'"))
        .count())
    val desc = dsv2.queryExecution.executedPlan.toString
    val filesShown = "files=(\\d+)".r.findFirstMatchIn(desc).map(_.group(1))
    assert(filesShown.exists(_.toInt <= 2),
      s"ts predicate did not skip files: $filesShown in\n$desc")
    // DATE stats (INT32 days) through the DSv2 write path, which
    // harvests every integer-physical column
    val ddir = freshDir()
    VersionedTable.append(spark.range(0L, 1L).select(col("id"),
      expr("DATE'2026-01-01'").as("dt")), ddir)
    spark.range(0L, 2000L).select(col("id"),
        expr("date_add(DATE'2026-01-01', CAST(id AS INT))").as("dt"))
      .repartitionByRange(4, col("dt")).sortWithinPartitions("dt")
      .write.format("graft-vlog").option("path", ddir)
      .mode("append").save()
    val d0 = java.time.LocalDate.of(2026, 1, 1).toEpochDay
    val (dkeep, dskip) = VersionedTable.pruneFiles(ddir, "dt",
      d0 + 1500, d0 + 1999)
    assert(dskip.size >= 2,
      s"date-clustered DSv2 files carry no stats: kept ${dkeep.size}, " +
        s"skipped ${dskip.size}")
    assert(VersionedTable.readPruned(spark, ddir, "dt", d0 + 1500,
      d0 + 1999).count() === 500L)
  }

  test("a same-name/different-type DSv2 write is rejected before any commit") {
    import spark.implicits._
    val dir = freshDir()
    VersionedTable.append(df(1L), dir) // id: LONG
    val head = VersionedTable.currentVersion(dir)
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    val err = intercept[Throwable] {
      Seq(("oops", "p")).toDF("id", "payload").write.format("graft-vlog")
        .option("path", dir).mode("append").save()
    }
    // the BATCH path is refused twice over: Spark's own byName resolution
    // rejects the unsafe cast against the table-reported schema, and the
    // connector's validateSchema backstops paths that skip it — either
    // error is acceptable, publication is not
    assert(chain(err).exists(m => m.contains("poison") ||
      m.contains("Cannot safely cast")),
      s"wrong failure: ${chain(err).mkString(" | ")}")
    // nothing published: the table is not poisoned, reads still work
    assert(VersionedTable.currentVersion(dir) == head,
      "a mistyped write published a commit")
    assert(spark.read.format("graft-vlog").option("path", dir)
      .load().count() == 1L)
    // additive evolution stays free through the NATIVE append surface
    // (the DSv2 batch write enforces exact arity Spark-side — a column
    // count change is refused at analysis, so evolution flows through
    // VersionedTable.append / merge, never a silent write)
    VersionedTable.append(
      Seq((2L, "p2", 9L)).toDF("id", "payload", "extra").coalesce(1), dir)
    val evolved = spark.read.format("graft-vlog").option("path", dir).load()
    assert(evolved.count() == 2L &&
      evolved.columns.toSet == Set("id", "payload", "extra"))
    // a NATIVE overwrite may change types — it replaces the whole
    // snapshot, owing the old schema nothing
    VersionedTable.overwrite(
      Seq(("fresh", "p")).toDF("id", "payload").coalesce(1), dir)
    assert(spark.read.format("graft-vlog").option("path", dir)
      .load().select("id").head().getString(0) == "fresh")
  }

  test("probes survive hint-pruning away every file carrying an evolved column") {
    import spark.implicits._
    // the r16 advice scenario: a valid SQL DELETE whose predicate
    // references an evolved column, on a snapshot where the stats hints
    // prune ALL evolved files out of the candidate set — the probe must
    // NULL-backfill and complete (deleting nothing from those files, the
    // SQL three-valued contract), not throw AnalysisException
    val dir = freshDir()
    VersionedTable.appendClustered(
      spark.range(0L, 100L).select(col("id"),
        concat(lit("v"), col("id")).as("payload")), dir, "id", buckets = 4)
    VersionedTable.append(
      Seq((200L, "v200", "x")).toDF("id", "payload", "extra").coalesce(1),
      dir)
    spark.conf.set("spark.sql.catalog.graft_vlog",
      "graft.sources.VlogCatalog")
    spark.sql(s"DELETE FROM graft_vlog.`$dir` " +
      "WHERE id < 50 AND extra = 'x'")
    // completes; rows in pre-evolution files have extra = NULL → the SQL
    // path's coalesce(cond, false) keeps them, and the evolved row's id
    // misses the envelope — so nothing is deleted
    assert(VersionedTable.read(spark, dir).count() === 101L,
      "the evolved-predicate DELETE removed rows it should not")
    // the merge probe under the same pressure: merging on an evolved key
    // whose envelope stats-prunes every key-carrying file leaves only
    // keyless candidates — backfilled NULL keys match nothing, so the
    // merge completes as a pure insert
    val mdir = freshDir()
    VersionedTable.append(
      Seq((1L, "a"), (2L, "b")).toDF("id", "payload").coalesce(1), mdir)
    VersionedTable.appendClustered(
      spark.range(1000L, 1100L).select(col("id").as("k"), col("id"),
        lit("kk").as("payload")), mdir, "k", buckets = 2)
    VersionedTable.merge(spark,
      Seq((5L, 50L, "new")).toDF("k", "id", "payload"), mdir, "k")
    val got = VersionedTable.read(spark, mdir)
    assert(got.count() === 103L, "evolved-key merge lost or dropped rows")
    assert(got.filter(col("k") === 5L).count() === 1L,
      "the pure-insert row is missing")
  }

  test("SQL MERGE INTO rewrites only the runtime-filtered touched files") {
    import spark.implicits._
    // the r16 verdict's task #3 done-criterion: the touched-file bound
    // must survive the SQL path. 800 ids range-clustered into 8 files;
    // the MERGE matches two keys in ONE file (plus one pure insert) —
    // runtime group filtering (`_file` metadata column + the IN-subquery
    // Spark plans over the regular scan) must bound the COW to ≤2 files,
    // exactly the bound touchedByKey gives the Column API.
    val dir = freshDir()
    VersionedTable.appendClustered(
      spark.range(0L, 800L).select(col("id"),
        concat(lit("v"), col("id")).as("payload")), dir, "id", buckets = 8)
    spark.conf.set("spark.sql.catalog.graft_vlog",
      "graft.sources.VlogCatalog")
    Seq((10L, "upd10"), (15L, "upd15"), (9999L, "new"))
      .toDF("id", "payload").createOrReplaceTempView("a10spec_src")
    spark.sql(s"""MERGE INTO graft_vlog.`$dir` t
                  USING a10spec_src u ON t.id = u.id
                  WHEN MATCHED THEN UPDATE SET *
                  WHEN NOT MATCHED THEN INSERT *""")
    val got = idSet(VersionedTable.read(spark, dir))
    val want = (0L until 800L).filterNot(i => i == 10L || i == 15L)
      .map(i => (i, s"v$i")).toSet ++
      Set((10L, "upd10"), (15L, "upd15"), (9999L, "new"))
    assert(got == want, "SQL MERGE produced wrong contents")
    val last = VersionedTable.history(spark, dir)
      .orderBy(col("version").desc).head()
    assert(last.getString(1) == "merge",
      s"head commit is '${last.getString(1)}', not the SQL merge")
    assert(last.getLong(3) <= 2L,
      s"SQL MERGE rewrote ${last.getLong(3)} of 8 files — runtime group " +
        "filtering did not bound the COW")
    // MVCC intact: the pre-merge snapshot still reads exactly v0
    assert(VersionedTable.read(spark, dir, Some(0L)).count() === 800L)
  }

  test("SQL UPDATE and subquery DELETE route through the row-level COW") {
    import spark.implicits._
    val dir = freshDir()
    VersionedTable.appendClustered(
      spark.range(0L, 400L).select(col("id"),
        (col("id") % 4).as("grp")), dir, "id", buckets = 4)
    spark.conf.set("spark.sql.catalog.graft_vlog",
      "graft.sources.VlogCatalog")
    // UPDATE: RewriteUpdateTable → group-based ReplaceData; the static
    // id-envelope ALSO prunes through the log stats, so only the file
    // holding [0,100) rewrites
    spark.sql(s"UPDATE graft_vlog.`$dir` SET grp = 99 WHERE id < 50")
    val afterUpd = VersionedTable.read(spark, dir)
    assert(afterUpd.filter(col("grp") === 99L).count() === 50L)
    assert(afterUpd.count() === 400L)
    val upd = VersionedTable.history(spark, dir)
      .orderBy(col("version").desc).head()
    assert(upd.getString(1) == "update" && upd.getLong(3) <= 1L,
      s"UPDATE rewrote ${upd.getLong(3)} of 4 files (op ${upd.getString(1)})")
    // DELETE with a subquery predicate: canDeleteWhere never sees it
    // (not a translatable Filter), so the metadata path is out and the
    // row-level rewrite must serve it
    Seq(5L, 6L, 7L).toDF("del_id").createOrReplaceTempView("a11spec_del")
    spark.sql(s"""DELETE FROM graft_vlog.`$dir`
                  WHERE id IN (SELECT del_id FROM a11spec_del)""")
    val afterDel = VersionedTable.read(spark, dir)
    assert(afterDel.count() === 397L)
    assert(afterDel.filter(col("id").isin(5L, 6L, 7L)).count() === 0L)
    val del = VersionedTable.history(spark, dir)
      .orderBy(col("version").desc).head()
    assert(del.getString(1) == "delete",
      s"subquery DELETE landed as '${del.getString(1)}'")
  }

  test("columnar vlog decode ≡ the row decode on a mixed-type evolved snapshot") {
    import spark.implicits._
    // every type the schema derivation admits, nulls included, plus an
    // evolved column one file lacks — the columnar reader (the batch
    // scan's default path, r16 task #4) must produce exactly the row
    // reader's rows, and the DSv2 read must equal the native read
    val dir = freshDir()
    val wide = spark.range(0L, 5000L).select(
      col("id"),
      when(col("id") % 7 === 0, lit(null))
        .otherwise(col("id") % 100).cast("int").as("i32"),
      (col("id") % 3 === 0).as("b"),
      (col("id") * 1.5).as("d"),
      col("id").cast("float").as("f"),
      (col("id") % 30000L).cast("short").as("i16"),
      (col("id") % 100L).cast("byte").as("i8"),
      concat(lit("s"), col("id")).as("s"),
      when(col("id") % 11 === 0, lit(null))
        .otherwise(concat(lit("t"), col("id"))).as("snull"),
      expr("timestampadd(HOUR, CAST(id % 100 AS INT), " +
        "TIMESTAMP_NTZ'2026-01-01 00:00:00')").as("ts"),
      expr("date_add(DATE'2026-01-01', CAST(id % 50 AS INT))").as("dt"),
      encode(concat(lit("x"), col("id")), "UTF-8").as("bin"))
    VersionedTable.append(wide, dir)
    VersionedTable.append(
      Seq((90000L, 42L)).toDF("id", "extra").coalesce(1), dir) // evolved
    val dsv2 = spark.read.format("graft-vlog").option("path", dir).load()
    val native = VersionedTable.read(spark, dir)
      .select(dsv2.columns.map(col).toSeq: _*)
    assert(dsv2.exceptAll(native).isEmpty &&
      native.exceptAll(dsv2).isEmpty,
      "columnar DSv2 read diverged from the native parquet read")
    // count(*): the footer-only path emits constant-width batches
    assert(dsv2.count() === 5001L)
    // the `_file` metadata column rides the columnar path as a constant
    // vector — one distinct value per live file
    import scala.jdk.CollectionConverters._
    val nFiles = VersionedTable.liveFiles(dir).size.toLong
    assert(dsv2.select(col("_file")).distinct().count() === nFiles)
    // READER-level differential: drive the row PartitionReader and the
    // columnar PartitionReader over the same file and compare values
    // field-for-field (the row reader stays the engine's fallback and
    // the spec's independent twin)
    val schema = dsv2.schema
    val fac = new graft.sources.VlogReaderFactory(schema)
    // extraction discipline: ALWAYS isNullAt before the typed get — the
    // engine's own contract (ColumnarBatchRow.get skips the null check
    // that GenericInternalRow.get happens to perform)
    def norm(row: org.apache.spark.sql.catalyst.InternalRow, i: Int,
        dt: org.apache.spark.sql.types.DataType): Any =
      if (row.isNullAt(i)) null
      else row.get(i, dt) match {
        case a: Array[Byte] => a.toSeq
        case x => x
      }
    VersionedTable.liveFiles(dir).foreach { f =>
      val part = graft.sources.VlogInputPartition(
        java.nio.file.Paths.get(dir, f).toString)
      val viaRow = {
        val r = fac.createReader(part)
        val buf = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
        while (r.next()) buf += schema.fields.zipWithIndex.map {
          case (fld, i) => norm(r.get(), i, fld.dataType) }.toSeq
        r.close(); buf.toSeq
      }
      val viaCol = {
        assert(fac.supportColumnarReads(part))
        val r = fac.createColumnarReader(part)
        val buf = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
        while (r.next()) r.get().rowIterator().asScala.foreach { row =>
          buf += schema.fields.zipWithIndex.map {
            case (fld, i) => norm(row, i, fld.dataType) }.toSeq
        }
        r.close(); buf.toSeq
      }
      assert(viaRow == viaCol,
        s"file $f: columnar decode diverged from row decode " +
          s"(${viaRow.size} vs ${viaCol.size} rows)")
    }
  }

  test("@changes(f,t) serves the change feed through SQL ≡ the Scala path") {
    import spark.implicits._
    val dir = freshDir()
    VersionedTable.append(df(1L, 2L), dir) // v0
    VersionedTable.append(df(3L), dir) // v1
    VersionedTable.append(
      Seq((4L, "v4", 9L)).toDF("id", "payload", "extra").coalesce(1),
      dir) // v2, evolved
    spark.conf.set("spark.sql.catalog.graft_vlog",
      "graft.sources.VlogCatalog")
    val sql = spark.sql(s"SELECT * FROM graft_vlog.`$dir@changes(0,2)`")
    val scala = VersionedTable.readChangeFeed(spark, dir, 0L, 2L).get
    // identical rows INCLUDING the metadata columns (r16 task #6's
    // done-criterion) — align column order then bag-compare
    val sqlAligned = sql.select(scala.columns.map(col).toSeq: _*)
    assert(sqlAligned.exceptAll(scala).isEmpty &&
      scala.exceptAll(sqlAligned).isEmpty,
      "SQL change feed diverged from readChangeFeed")
    assert(sql.count() === 2L)
    assert(sql.filter(col("_change_type") =!= "insert").count() === 0L)
    assert(sql.filter(col("_commit_version") === 2L)
      .select("extra").as[Long].head() === 9L)
    // commit 0 is reachable: the low bound is EXCLUSIVE, so the first
    // commit's rows spell as @changes(-1,0) (r17 review — \d+ alone
    // made v0 permanently unreachable through SQL)
    val v0 = spark.sql(s"SELECT * FROM graft_vlog.`$dir@changes(-1,0)`")
    assert(v0.count() === 2L)
    assert(v0.select("_commit_version").distinct().as[Long].head() === 0L)
    // an EMPTY range (a zero-changes poll) is benign: snapshot schema,
    // zero rows — not an error (r17 review)
    val empty = spark.sql(s"SELECT * FROM graft_vlog.`$dir@changes(2,2)`")
    assert(empty.count() === 0L)
    assert(empty.columns.contains("_commit_version") &&
      empty.columns.contains("extra"))
    // a COW commit in range fails loudly through SQL too
    VersionedTable.delete(spark, dir, col("id") === 1L) // v3, COW
    val err = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_vlog.`$dir@changes(0,3)`").collect()
    }
    assert(err.getMessage != null &&
      err.getMessage.contains("append-shaped"),
      s"wrong failure: ${err.getMessage}")
    // the degenerate poll: a generic poller reads head = currentVersion
    // = -1 off a table with no commits yet and writes @changes(-1,-1) —
    // benign zero rows, metadata-only schema, not a parse failure
    val fresh = freshDir()
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(fresh, "_vlog"))
    val none = spark.sql(s"SELECT * FROM graft_vlog.`$fresh@changes(-1,-1)`")
    assert(none.count() === 0L)
    assert(none.columns.toSeq ==
      Seq("_commit_version", "_change_type"))
  }

  test("a multi-row-group file scans group-parallel with exact results") {
    // r17: one task per ROW GROUP, not per file — the native reader
    // splits large files and so must the vlog scan, or a 1 GB file
    // serializes on one core at 100 TB. Build a single FILE with many
    // small row groups (tiny parquet.block.size), hand-commit it, and
    // pin: more partitions than files, exact rows, exact count(*)
    // (the footer-only path must respect the split's group selection).
    import spark.implicits._
    val dir = freshDir()
    spark.range(0L, 50000L)
      .select(col("id"), concat(lit("s"), col("id")).as("s"))
      .coalesce(1).write
      .option("parquet.block.size", "65536")
      .option("parquet.page.size", "8192")
      .parquet(java.nio.file.Paths.get(dir, "data/manual").toString)
    val staged = {
      val l = java.nio.file.Files.list(
        java.nio.file.Paths.get(dir, "data/manual"))
      try {
        import scala.jdk.CollectionConverters._
        l.iterator().asScala.map(_.getFileName.toString)
          .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
          .map(n => s"data/manual/$n").toSeq
      } finally l.close()
    }
    assert(staged.size == 1, s"expected one staged file, got $staged")
    assert(VersionedTable.tryCommit(dir, 0L, "append", staged, Seq.empty))
    val nGroups = graft.sources.VlogSchema.rowGroupMidpoints(
      java.nio.file.Paths.get(dir, staged.head)).size
    assert(nGroups > 1, s"test file has only $nGroups row group(s) — " +
      "shrink parquet.block.size")
    val dsv2 = spark.read.format("graft-vlog").option("path", dir).load()
    assert(dsv2.rdd.getNumPartitions == nGroups,
      s"expected $nGroups split partitions, " +
        s"got ${dsv2.rdd.getNumPartitions}")
    assert(dsv2.count() === 50000L)
    assert(dsv2.agg(sum("id")).head().getLong(0) ===
      (0L until 50000L).sum)
    // no row lost or duplicated across split boundaries
    assert(dsv2.select("id").distinct().count() === 50000L)
    // the ranged ROW reader (the engine's row-exec fallback) serves the
    // same rows as the whole-file Group reader would
    val schema = dsv2.schema
    val fac = new graft.sources.VlogReaderFactory(schema)
    val mids = graft.sources.VlogSchema.rowGroupMidpoints(
      java.nio.file.Paths.get(dir, staged.head))
    val viaSplits = mids.flatMap { m =>
      val r = fac.createReader(graft.sources.VlogInputPartition(
        java.nio.file.Paths.get(dir, staged.head).toString, -1L, m, m + 1))
      val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (r.next()) buf += r.get().getLong(0)
      r.close(); buf.toSeq
    }
    assert(viaSplits.sorted == (0L until 50000L),
      s"split row reader lost rows: ${viaSplits.size}")
  }

  test("@files serves the live inventory with stats through SQL") {
    val dir = freshDir()
    VersionedTable.appendClustered(
      spark.range(0L, 400L).select(col("id"), (col("id") % 7).as("v")),
      dir, "id", buckets = 4)
    VersionedTable.append(df(9000L), dir) // plain append: no stats lines
    spark.conf.set("spark.sql.catalog.graft_vlog",
      "graft.sources.VlogCatalog")
    val files = spark.sql(s"SELECT * FROM graft_vlog.`$dir@files`")
    val live = VersionedTable.liveFiles(dir)
    // every live file appears; clustered files carry an id stat row,
    // the plain-append file a NULL-stat row
    assert(files.select("file").distinct().count() === live.size.toLong)
    assert(files.filter(col("stat_key") === "id").count() >= 4L)
    assert(files.filter(col("stat_key").isNull).count() === 1L)
    // row counts sum to the table's rows; bytes are real sizes
    assert(files.select("file", "n_rows").distinct()
      .agg(sum("n_rows")).head().getLong(0) === 401L)
    assert(files.filter(col("bytes") <= 0L).count() === 0L)
    // the ops query the table exists for: which files a range touches
    val touch = spark.sql(
      s"""SELECT file FROM graft_vlog.`$dir@files`
          WHERE stat_key = 'id' AND stat_max >= 100 AND stat_min <= 150""")
    assert(touch.count() <= 2L, "stats rows do not support range triage")
  }

  test("racing small-file compactors: one packs, the loser concludes no-op") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // the r17 review's lost-race scenario: both compactors pass the
    // floor, one wins the commit; the loser's retry re-derives the
    // small set, finds only the winner's packed output (< 2 files) and
    // must return None — not crash on an empty read or re-pack a
    // singleton
    val dir = freshDir()
    (1L to 5L).foreach(i => VersionedTable.append(df(i), dir))
    val gate = new java.util.concurrent.CountDownLatch(1)
    val racers = (0 until 2).map { _ =>
      Future {
        gate.await()
        VersionedTable.compactSmallFiles(spark, dir, target = 1)
      }
    }
    gate.countDown()
    val results = racers.map(Await.result(_, 120.seconds))
    // at least one packed; a loser that observed the packed head no-ops
    assert(results.exists(_.isDefined), s"nobody packed: $results")
    assert(VersionedTable.liveFiles(dir).size <= 2,
      s"small files did not converge: ${VersionedTable.liveFiles(dir)}")
    assert(idSet(VersionedTable.read(spark, dir)).map(_._1) ==
      (1L to 5L).toSet, "racing compactors lost rows")
    // and a table already converged concludes None outright
    assert(VersionedTable.compactSmallFiles(spark, dir, target = 1).isEmpty
      || VersionedTable.liveFiles(dir).size == 1)
  }

  private def mountCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft_vlog",
      "graft.sources.VlogCatalog")

  test("CALL procedures drive compact, small-file packing and vacuum") {
    val dir = freshDir()
    // three small-file commits — the shape streaming ingest leaves
    VersionedTable.append(df(1L, 2L), dir)
    VersionedTable.append(df(3L, 4L), dir)
    VersionedTable.append(df(5L, 6L), dir)
    mountCatalog()
    val before = idSet(VersionedTable.read(spark, dir))

    // OPTIMIZE through SQL text: one COW commit; the result row is what
    // a scheduler would log
    val c = spark.sql(s"CALL graft_vlog.compact('$dir', 'id', 2)").collect()
    assert(c.length === 1)
    assert(c(0).getLong(0) === 3L, "compact = the fourth commit")
    assert(c(0).getInt(1) === 3, "one file per append before")
    assert(c(0).getInt(2) <= 2, "clustered into <= buckets files")
    assert(idSet(VersionedTable.read(spark, dir)) === before,
      "CALL compact changed table contents")

    // named arguments + parameter defaults both route: a fresh-file
    // vacuum under the DEFAULT retention window reclaims nothing…
    val v0 = spark.sql(s"CALL graft_vlog.vacuum(table => '$dir')").collect()
    assert(v0(0).getInt(0) === 0,
      "default-retention vacuum reclaimed in-window files")
    // …and retention 0 reclaims exactly the three pre-compact files
    val v = spark.sql(
      s"CALL graft_vlog.vacuum(table => '$dir', retention_ms => 0)")
      .collect()
    // ≥ 3: the three pre-compact data files, plus their staging dirs'
    // _SUCCESS/checksum sidecars (vacuum reports every path it deletes)
    assert(v(0).getInt(0) >= 3, s"expected >= 3 reclaimed, got ${v(0)}")
    assert(idSet(VersionedTable.read(spark, dir)) === before)

    // small-file packing through SQL on a separate ingest tail
    val dir2 = freshDir()
    VersionedTable.append(df(1L), dir2)
    VersionedTable.append(df(2L), dir2)
    VersionedTable.append(df(3L), dir2)
    val p = spark.sql(
      s"CALL graft_vlog.compact_small_files('$dir2', 33554432, 1, 2)")
      .collect()
    assert(!p(0).isNullAt(0) && p(0).getLong(0) === 3L)
    assert(p(0).getInt(2) === 1, "three small files packed into one")
    // converged table → NULL version (no-op), file count unchanged
    val p2 = spark.sql(
      s"CALL graft_vlog.compact_small_files('$dir2', 33554432, 1, 2)")
      .collect()
    assert(p2(0).isNullAt(0), "no-op pack must report NULL version")
    assert(p2(0).getInt(2) === 1)

    // a procedure the catalog does not serve fails loudly, naming the
    // ones it does
    val e = intercept[Exception] {
      spark.sql(s"CALL graft_vlog.nope('$dir')").collect()
    }
    assert(e.getMessage.contains("no such procedure") ||
      Option(e.getCause).exists(_.getMessage.contains("no such procedure")))
  }

  test("CALL zorder rewrites the snapshot multi-dimensionally clustered") {
    val dir = freshDir()
    // unclustered ingest: every file spans both key domains
    VersionedTable.append(
      spark.range(0L, 512L).select(
        (col("id") % 64).as("a"), expr("id div 64").as("b"),
        col("id").as("payload_id")).repartition(4), dir)
    mountCatalog()
    val before = VersionedTable.read(spark, dir)
      .select("a", "b", "payload_id").collect().map(_.toSeq).toSet

    val z = spark.sql(s"CALL graft_vlog.zorder('$dir', 'a,b', 4)").collect()
    assert(z(0).getLong(0) === 1L, "zorder = the second commit")
    assert(z(0).getInt(2) <= 4)
    assert(VersionedTable.read(spark, dir)
      .select("a", "b", "payload_id").collect().map(_.toSeq).toSet
      === before, "CALL zorder changed table contents")
    // the rewrite installed BOTH dimensions' stats: pruning on either
    // key now skips files (the @files inventory shows the envelopes)
    val stats = spark.sql(s"SELECT DISTINCT stat_key FROM " +
      s"graft_vlog.`$dir@files` WHERE stat_key IS NOT NULL")
      .collect().map(_.getString(0)).toSet
    assert(Set("a", "b").subsetOf(stats),
      s"zorder rewrite must stat both keys, got $stats")
  }

  test("concurrent CREATE TABLE races resolve to exactly one winner") {
    mountCatalog()
    val dir = s"${Files.createTempDirectory("graft-ddl-race")}/t"
    import java.util.concurrent._
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    def attempt(schema: String): Future[Boolean] =
      pool.submit(new Callable[Boolean] {
        def call(): Boolean = {
          gate.await()
          try {
            spark.sql(s"CREATE TABLE graft_vlog.`$dir` ($schema)"); true
          } catch { case _: Throwable => false }
        }
      })
    val a = attempt("id BIGINT")
    val b = attempt("name STRING")
    gate.countDown()
    val wins = Seq(a, b).map(_.get()).count(identity)
    pool.shutdown()
    // the catalog's existence pre-check is a fast path both racers can
    // pass; the v0 commit link is the arbiter — exactly one CREATE may
    // report success, and only the winner's schema exists (both
    // "succeeding" would silently union two declared schemas)
    assert(wins === 1, s"$wins CREATE TABLEs claimed success")
    assert(VersionedTable.currentVersion(dir) === 0L,
      "the losing CREATE landed a commit")
    val cols = spark.read.format("graft-vlog").option("path", dir)
      .load().columns.toSet
    assert(cols === Set("id") || cols === Set("name"),
      s"schemas unioned: $cols")
  }

  test("runtime filtering prunes fact files on the join's key values") {
    import graft.sources.VlogScanBuilder
    val dir = freshDir()
    // 8 id-clustered files: a dim that only references one bucket's ids
    // should leave most of the fact unread
    VersionedTable.appendClustered(
      spark.range(0L, 4000L).select(col("id"), (col("id") % 7).as("v")),
      dir, "id", buckets = 8)
    assert(VersionedTable.liveFiles(dir).size === 8)

    // scan-level law, driven exactly as Spark drives it: plan, then
    // deliver the join side's values through filter(), then re-plan
    val full = spark.read.format("graft-vlog").option("path", dir)
      .load().schema
    val scan = new VlogScanBuilder(dir, None, full, 16, 0L).build()
      .asInstanceOf[org.apache.spark.sql.connector.read
        .SupportsRuntimeFiltering]
    val before = scan.asInstanceOf[org.apache.spark.sql.connector.read.Scan]
      .toBatch.planInputPartitions().length
    assert(before === 8)
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("id", Array(10L, 11L, 250L))))
    val after = scan.asInstanceOf[org.apache.spark.sql.connector.read.Scan]
      .toBatch.planInputPartitions().length
    assert(after === 1,
      s"runtime In over one bucket's ids kept $after of $before files")

    // end-to-end: the join result is exact and the physical scan shows
    // the runtime filter attached
    mountCatalog()
    spark.range(0L, 3L).select((col("id") + 500L).as("k"))
      .createOrReplaceTempView("rt_dim")
    val j = spark.sql(s"""SELECT f.id, f.v FROM graft_vlog.`$dir` f
                          JOIN rt_dim d ON f.id = d.k""")
    val got = j.collect().map(_.toSeq).toSet
    assert(got === Set(Seq(500L, 3L), Seq(501L, 4L), Seq(502L, 5L)))
    assert(j.queryExecution.executedPlan.toString
      .contains("RuntimeFilters"),
      "no runtime filter attached to the vlog scan")
  }

  test("CREATE TABLE, CTAS, INSERT INTO and DROP TABLE through the " +
      "catalog") {
    mountCatalog()
    val root = Files.createTempDirectory("graft-ddl").toString
    val dir = s"$root/t1"
    // CREATE TABLE records the declared schema as a zero-row v0 commit,
    // so an empty table reads back schema-correct through the same
    // footer-derivation path as any other
    spark.sql(s"CREATE TABLE graft_vlog.`$dir` " +
      "(id BIGINT, name STRING, ts TIMESTAMP_NTZ)")
    val t = spark.sql(s"SELECT * FROM graft_vlog.`$dir`")
    assert(t.columns.toSeq === Seq("id", "name", "ts"))
    assert(t.count() === 0L)
    assert(VersionedTable.currentVersion(dir) === 0L)
    // a second CREATE of the same directory is a loud already-exists
    intercept[Exception] {
      spark.sql(s"CREATE TABLE graft_vlog.`$dir` (id BIGINT)")
    }
    // INSERT INTO validates against the declared schema and lands v1
    spark.sql(s"INSERT INTO graft_vlog.`$dir` VALUES " +
      "(1, 'a', TIMESTAMP_NTZ'2024-01-01 00:00:00'), (2, 'b', NULL)")
    assert(spark.sql(s"SELECT id, name FROM graft_vlog.`$dir`")
      .collect().map(_.toSeq).toSet === Set(Seq(1L, "a"), Seq(2L, "b")))
    // CTAS = createTable + append in one statement
    val dir2 = s"$root/t2"
    spark.sql(s"CREATE TABLE graft_vlog.`$dir2` AS " +
      "SELECT id, id * 2 AS dbl FROM range(10)")
    assert(spark.sql(
      s"SELECT CAST(SUM(dbl) AS BIGINT) FROM graft_vlog.`$dir2`")
      .head().getLong(0) === 90L)
    // hive-style partitioning is refused loudly (layout = clustering)
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE graft_vlog.`$root/t3` (id BIGINT) " +
        "PARTITIONED BY (id)")
    }
    assert(e.getMessage.contains("PARTITIONED") ||
      Option(e.getCause).exists(_.getMessage.contains("PARTITIONED")))
    // DROP TABLE deletes the directory whole — log, live and history
    spark.sql(s"DROP TABLE graft_vlog.`$dir2`")
    assert(!Files.isDirectory(Paths.get(dir2)),
      "DROP TABLE left the directory behind")
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_vlog.`$dir2`").collect()
    }
  }

  test("parquet blooms + group skipping serve point lookups on " +
      "unclustered keys") {
    import graft.sources.{VlogFilters, VlogPointPred}
    val dir = freshDir()
    // k is UNCLUSTERED (even scatter): a probe for an in-range odd k
    // sits inside the min/max of some group's stats, so only the BLOOM
    // can prove it absent; tag exercises the string-equality path
    val rows = spark.range(0L, 4000L).select(col("id"),
      (col("id") * 2 % 4000).as("k"),
      concat(lit("u"), col("id") % 97).as("tag"))
    VersionedTable.appendClustered(rows, dir, "id", buckets = 4,
      bloomCols = Seq("k", "tag"))
    val live = VersionedTable.liveFiles(dir)

    // 1. write side: parquet bloom filters really landed in the files
    def openPlain(f: String) =
      org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(Paths.get(dir, f).toUri),
          new org.apache.hadoop.conf.Configuration()))
    // (k only: parquet DROPS the bloom for a fully dictionary-encoded
    // chunk — the dictionary itself is exact membership, and the
    // DICTIONARY level of row-group filtering serves the same skip; the
    // low-cardinality tag column takes that path, pinned below via the
    // absent-string probe)
    val r0 = openPlain(live.head)
    try {
      val cols = r0.getRowGroups.get(0).getColumns
      import scala.jdk.CollectionConverters._
      val cc = cols.asScala.find(_.getPath.toDotString == "k").get
      assert(cc.getBloomFilterOffset > 0L, "no bloom written for k")
    } finally r0.close()

    // 2. the skip engine, pinned at the parquet layer on a file whose
    // k-STATS contain the probe (so a skip can only come from the bloom)
    def kStats(f: String): (Long, Long) = {
      val r = openPlain(f)
      try {
        import scala.jdk.CollectionConverters._
        val sts = r.getRowGroups.asScala.map(_.getColumns.asScala
          .find(_.getPath.toDotString == "k").get.getStatistics)
        (sts.map(_.genericGetMin.asInstanceOf[Long]).min,
          sts.map(_.genericGetMax.asInstanceOf[Long]).max)
      } finally r.close()
    }
    val statted = live.find { f =>
      val (lo, hi) = kStats(f); lo <= 1001L && hi >= 1001L
    }.get
    val schema = {
      val r = openPlain(statted)
      try r.getFooter.getFileMetaData.getSchema finally r.close()
    }
    val probe = VlogFilters.forFile(schema, Map("k" -> (1001L, 1001L)),
      Seq(VlogPointPred("k", Seq(1001L), Seq.empty))).get
    val rF = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(Paths.get(dir, statted).toUri),
        new org.apache.hadoop.conf.Configuration()),
      org.apache.parquet.ParquetReadOptions.builder()
        .withRecordFilter(probe).build())
    try assert(rF.getRowGroups.isEmpty,
      "bloom failed to skip a group whose stats contain the absent probe")
    finally rF.close()
    // the string path: an absent tag value skips through the DICTIONARY
    // filtering level (no bloom needed — exact membership)
    val probeS = VlogFilters.forFile(schema, Map.empty,
      Seq(VlogPointPred("tag", Seq.empty, Seq("zz")))).get
    val rS = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(Paths.get(dir, statted).toUri),
        new org.apache.hadoop.conf.Configuration()),
      org.apache.parquet.ParquetReadOptions.builder()
        .withRecordFilter(probeS).build())
    try assert(rS.getRowGroups.isEmpty,
      "dictionary filtering failed to skip an absent string probe")
    finally rS.close()
    // IS NULL answers from per-group NULL COUNTS: k is never null, so
    // every fully-populated group skips without a page read
    val probeN = VlogFilters.forFile(schema, Map.empty,
      Seq(VlogPointPred.isNull("k", test = true))).get
    val rN = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(Paths.get(dir, statted).toUri),
        new org.apache.hadoop.conf.Configuration()),
      org.apache.parquet.ParquetReadOptions.builder()
        .withRecordFilter(probeN).build())
    try assert(rN.getRowGroups.isEmpty,
      "null-count filtering failed to skip a fully-populated group")
    finally rN.close()

    // 3. end-to-end through SQL: absent / present / IN / string probes
    // all exact vs a full-scan recompute
    mountCatalog()
    def q(where: String): Set[Seq[Any]] =
      spark.sql(s"SELECT id, k, tag FROM graft_vlog.`$dir` WHERE $where")
        .collect().map(_.toSeq).toSet
    def truth(where: String): Set[Seq[Any]] =
      rows.where(where).collect().map(_.toSeq).toSet
    assert(q("k = 1001") === Set.empty, "absent probe returned rows")
    assert(q("k IS NULL") === Set.empty, "IS NULL on a non-null column")
    for (w <- Seq("k = 1000", "k IN (1000, 1001, 999999)",
        "tag = 'u5'", "tag IN ('u5', 'nope')", "k IS NOT NULL")) {
      val got = q(w)
      assert(got === truth(w), s"point-lookup mismatch for [$w]")
      assert(got.nonEmpty, s"vacuous probe [$w]")
    }
    // an IN past the point-value cap records only its envelope (the
    // point set would ride every task's serialization) — still exact
    val bigIn = (0L until 6000L).map(_ * 2)
    val capGot = spark.read.format("graft-vlog").option("path", dir).load()
      .filter(col("k").isInCollection(bigIn))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capWant = rows.filter(col("k").isInCollection(bigIn))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capGot === capWant && capGot.size === 4000,
      "capped IN lost exactness")
    // the plan advertises the pushed point conjuncts
    val plan = spark.sql(
      s"SELECT id FROM graft_vlog.`$dir` WHERE k IN (7, 9)")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedGroupPoints"),
      s"point conjuncts missing from the scan description:\n$plan")

    // 4. the DSv2 WRITE path's bloomColumns option lands blooms too
    val dir2 = freshDir()
    // seed with the same shape: the DSv2 write resolves its columns
    // against the existing table schema
    VersionedTable.append(rows.limit(1).coalesce(1), dir2)
    rows.write.format("graft-vlog").option("path", dir2)
      .option("bloomColumns", "k").mode("append").save()
    val bloomed = VersionedTable.liveFiles(dir2).filter { f =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(Paths.get(dir2, f).toUri),
          new org.apache.hadoop.conf.Configuration()))
      try {
        import scala.jdk.CollectionConverters._
        r.getRowGroups.asScala.exists(_.getColumns.asScala
          .exists(c => c.getPath.toDotString == "k" &&
            c.getBloomFilterOffset > 0L))
      } finally r.close()
    }
    assert(bloomed.nonEmpty, "DSv2 write produced no bloom for k")
  }

  test("aggregate pushdown answers count/min/max from footers") {
    val dir = freshDir()
    // v0: nullable v (every 5th id NULL); v1 evolves the schema with w,
    // so the v0 file must contribute all-NULL partials for w
    VersionedTable.append(
      spark.range(0L, 400L).select(col("id"),
        when(col("id") % 5 === 0, lit(null))
          .otherwise(col("id") % 7).as("v")).coalesce(1), dir)
    VersionedTable.append(
      spark.range(400L, 500L).select(col("id"), (col("id") % 7).as("v"),
        (col("id") * 2).as("w")).coalesce(1), dir)
    mountCatalog()

    val q = spark.sql(
      s"""SELECT COUNT(*) AS n, COUNT(v) AS nv, COUNT(w) AS nw,
                 MIN(id) AS lo, MAX(id) AS hi,
                 MIN(w) AS wlo, MAX(w) AS whi
          FROM graft_vlog.`$dir`""")
    // the plan carries the pushed aggregate (the scan IS the agg source)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates"),
      s"aggregate did not push into the vlog scan:\n$plan")
    val r = q.collect()(0)
    assert(r.getLong(0) === 500L)
    assert(r.getLong(1) === 420L, "count(v) must subtract footer nulls")
    assert(r.getLong(2) === 100L, "count(w) over the evolved column")
    assert(r.getLong(3) === 0L && r.getLong(4) === 499L)
    assert(r.getLong(5) === 800L && r.getLong(6) === 998L,
      "min/max(w) must ignore the pre-evolution file")

    // a FILTERED aggregate must NOT push (vlog filters are residual) and
    // must still be exact
    val f = spark.sql(
      s"SELECT COUNT(*) AS n FROM graft_vlog.`$dir` WHERE id >= 450")
    assert(!f.queryExecution.executedPlan.toString
      .contains("PushedAggregates"),
      "a filtered aggregate must not push past residual filters")
    assert(f.collect()(0).getLong(0) === 50L)

    // temporal min/max ride the same exact integer stats (micros/days)
    val dirT = freshDir()
    VersionedTable.append(
      spark.range(0L, 100L).select(col("id"),
        expr("timestampadd(SECOND, CAST(id AS INT), " +
          "TIMESTAMP_NTZ'2024-01-01 00:00:00')").as("ts"),
        expr("date_add(DATE'2024-01-01', CAST(id AS INT))").as("d"))
        .coalesce(1), dirT)
    val t = spark.sql(
      s"""SELECT MIN(ts) AS tlo, MAX(ts) AS thi, MIN(d) AS dlo,
                 MAX(d) AS dhi, COUNT(*) AS n
          FROM graft_vlog.`$dirT`""")
    assert(t.queryExecution.executedPlan.toString
      .contains("PushedAggregates"))
    val tr = t.collect()(0)
    assert(tr.getAs[java.time.LocalDateTime](0) ===
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0))
    assert(tr.getAs[java.time.LocalDateTime](1) ===
      java.time.LocalDateTime.of(2024, 1, 1, 0, 1, 39))
    assert(tr.getDate(2).toString === "2024-01-01")
    assert(tr.getDate(3).toString === "2024-04-09")
    assert(tr.getLong(4) === 100L)
  }
}
