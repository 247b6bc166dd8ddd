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
    ids.map(i => (i, s"v$i")).toDF("id", "payload")
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
    // and vacuum reclaims exactly the orphan, never a live file
    val dead = VersionedTable.vacuum(dir)
    assert(dead.nonEmpty && dead.forall(_.startsWith("data/orphan-died")),
      s"vacuum removed the wrong files: $dead")
    assert(idSet(VersionedTable.read(spark, dir)).map(_._1) == Set(1L, 2L))
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
    val dead = VersionedTable.vacuum(dir)
    assert(dead.nonEmpty, "COW left nothing to vacuum — not MVCC")
    // current head still reads; the pre-vacuum snapshot is gone (retention)
    assert(idSet(VersionedTable.read(spark, dir)) ==
      Set((2L, "upd"), (3L, "v3")))
    intercept[Exception] {
      VersionedTable.read(spark, dir, Some(0L)).collect()
    }
  }
}
