package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

import scala.collection.mutable

/** Diagnostic main: empirical per-stage profile of a registered query — the
  * guide-§1.1 "where is the time actually going" loop, usable headless (the
  * bench sessions run with the UI disabled). A listener folds task metrics
  * per stage; the main runs the query through the noop sink (same timed
  * action as the sweep) and prints one line per stage: wall/executor time,
  * task count, input and shuffle bytes — enough to tell scan-bound from
  * shuffle-bound from scheduling-bound without the UI.
  *
  * Usage: runMain graft.StageProfile <sfDir> <queryName> [runs=2]
  * (run 1 is cold — JIT+page-cache; the LAST run is the steady-state
  * profile; stages are reported per run, jobs counted per run.)
  */
object StageProfile {

  private final class Agg {
    var tasks = 0
    var runTimeMs = 0L
    var cpuTimeMs = 0L
    var inputBytes = 0L
    var shuffleReadB = 0L
    var shuffleWriteB = 0L
    var fetchWaitMs = 0L
    var spillB = 0L
    var firstLaunch = Long.MaxValue
    var lastFinish = 0L
    var name = ""
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StageProfile <sfDir> <query> [runs]")
    val sfDir = args(0); val qname = args(1)
    val runs = if (args.length > 2) args(2).toInt else 2
    // mirror the Bench main's file-split sizing: profiles must be taken
    // under the same scan parallelism the graded bench runs with
    val spark = LocalSession.build(logLevel = "ERROR", extra = Map(
      "spark.sql.files.maxPartitionBytes" ->
        sys.env.getOrElse("SPARK_GRAFT_SPLIT_BYTES", "1m"),
      "spark.sql.files.openCostInBytes" -> "256k"))
    val fn = SparkEntry.queries.getOrElse(qname,
      sys.error(s"unknown query $qname"))

    val stages = mutable.LinkedHashMap.empty[Int, Agg]
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = synchronized {
        val a = stages.getOrElseUpdate(te.stageId, new Agg)
        a.tasks += 1
        val m = te.taskMetrics
        if (m != null) {
          a.runTimeMs += m.executorRunTime
          a.cpuTimeMs += m.executorCpuTime / 1000000L
          a.inputBytes += m.inputMetrics.bytesRead
          a.shuffleReadB += m.shuffleReadMetrics.totalBytesRead
          a.shuffleWriteB += m.shuffleWriteMetrics.bytesWritten
          a.fetchWaitMs += m.shuffleReadMetrics.fetchWaitTime
          a.spillB += m.memoryBytesSpilled
        }
        val ti = te.taskInfo
        if (ti != null) {
          a.firstLaunch = math.min(a.firstLaunch, ti.launchTime)
          a.lastFinish = math.max(a.lastFinish, ti.finishTime)
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        synchronized {
          stages.getOrElseUpdate(sc.stageInfo.stageId, new Agg)
            .name = sc.stageInfo.name.takeWhile(_ != '\n')
        }
    }
    spark.sparkContext.addSparkListener(listener)

    (1 to runs).foreach { r =>
      stages.clear(); jobs = 0
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // let the listener bus drain so the last stages are counted
      // (listenerBus is private[spark]; a short sleep suffices for a
      // diagnostic — the noop save() already awaited the job end)
      Thread.sleep(300)
      println(f"%n== $qname run $r/$runs: wall $wall%.3f s, $jobs jobs, " +
        s"${stages.size} stages ==")
      println(f"${"stage"}%-7s ${"span_s"}%7s ${"run_s"}%7s ${"cpu_s"}%7s " +
        f"${"tasks"}%5s ${"in_MB"}%7s ${"shR_MB"}%7s ${"shW_MB"}%7s " +
        f"${"wait_s"}%6s ${"spill"}%5s  name")
      stages.toSeq.sortBy(-_._2.runTimeMs).foreach { case (id, a) =>
        val span = if (a.lastFinish > a.firstLaunch)
          (a.lastFinish - a.firstLaunch) / 1e3 else 0.0
        println(f"$id%-7d $span%7.2f ${a.runTimeMs / 1e3}%7.2f " +
          f"${a.cpuTimeMs / 1e3}%7.2f ${a.tasks}%5d " +
          f"${a.inputBytes / 1e6}%7.1f ${a.shuffleReadB / 1e6}%7.1f " +
          f"${a.shuffleWriteB / 1e6}%7.1f ${a.fetchWaitMs / 1e3}%6.2f " +
          f"${a.spillB / 1e6}%5.1f  ${a.name}")
      }
    }
    spark.stop()
  }
}
