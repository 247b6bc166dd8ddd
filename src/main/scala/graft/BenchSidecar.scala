package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import scala.util.control.NonFatal

/** The bench artifact's evidence overflow file. Round 12 proved the ONE
  * stdout JSON line must stay under the driver's ~2000-char tail capture —
  * the 172-entry per-query sweep map pushed it to ~7000 chars and the whole
  * graded artifact parsed to null (VERDICT r12 "What's wrong" #1). So the
  * printed line stays compact (totals, slowest, capped regressions) and the
  * full per-query sweep times, headline raw samples, plan fingerprints and
  * uncapped regression detail live here, in a COMMITTED sidecar the next
  * round's run diffs against.
  *
  * Previous-round sweep times resolve in evidence order:
  *   1. newest `BENCH_r{N}.json` → `parsed.sweep.times` (the driver's
  *      graded wrapper — rounds ≤11 carried the map there);
  *   2. the same wrapper's raw `tail` text, last parseable JSON line
  *      (covers a wrapper whose own parse step failed on a complete line);
  *   3. this sidecar (the recovery path after r12's truncated artifact —
  *      without it the regression tripwire stays dead forever, since every
  *      later round would read r12's `parsed: null`).
  */
object BenchSidecar {

  val Path = "bench_sweep.json"

  private def readJson(p: java.nio.file.Path): Option[Any] =
    try Some(MiniJson.parse(new String(Files.readAllBytes(p), UTF_8)))
    catch {
      case NonFatal(e) =>
        System.err.println(s"[bench] $p unreadable (${e.getMessage})")
        None
    }

  private def doubleMap(v: Any, path: String*): Option[Map[String, Double]] =
    MiniJson.dig(v, path: _*).collect { case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].collect { case (k, d: Double) => k -> d }
    }.filter(_.nonEmpty)

  private def stringMap(v: Any, path: String*): Map[String, String] =
    MiniJson.dig(v, path: _*).collect { case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].collect { case (k, s: String) => k -> s }
    }.getOrElse(Map.empty)

  private def newestArtifact(): Option[(String, Any)] = {
    val cand = Option(new java.io.File(".").listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.getName.matches("BENCH_r\\d+\\.json"))
      .sortBy(f => f.getName.replaceAll("\\D", "").toInt)
      .lastOption
    cand.flatMap(f => readJson(f.toPath).map(f.getName -> _))
  }

  /** Last complete bench JSON line embedded in the wrapper's raw stdout
    * tail — only lines that parse AND carry `sweep.times` count.
    */
  private def timesFromTail(parsed: Any,
      sfDir: String): Option[Map[String, Double]] =
    MiniJson.dig(parsed, "tail").collect { case t: String => t }.flatMap {
      tail =>
        tail.split('\n').iterator.map(_.trim).filter(_.startsWith("{"))
          .flatMap { l =>
            (try {
              val v = MiniJson.parse(l)
              doubleMap(v, "sweep", "times")
                .filter(_ => sfMatches(v, sfDir, "sf"))
            } catch { case NonFatal(_) => None }).iterator
          }
          .foldLeft(Option.empty[Map[String, Double]])((_, m) => Some(m))
    }

  /** A source only counts when its recorded sf dir matches the current run
    * (or predates the field): diffing a dev sf0.001 sidecar against the
    * driver's sf0.1 run would flag every query.
    */
  private def sfMatches(v: Any, sfDir: String, path: String*): Boolean =
    MiniJson.dig(v, path: _*) match {
      case Some(s: String) => s == sfDir
      case _ => true // older artifacts: sf recorded as a bare number — accept
    }

  def previousSweepTimes(sfDir: String): Option[(String, Map[String, Double])] = {
    val fromArtifact = newestArtifact().flatMap { case (name, parsed) =>
      doubleMap(parsed, "parsed", "sweep", "times")
        .filter(_ => sfMatches(parsed, sfDir, "parsed", "sf"))
        .map(name -> _)
        .orElse(timesFromTail(parsed, sfDir).map(s"$name(tail)" -> _))
    }
    fromArtifact.orElse {
      val p = Paths.get(Path)
      if (!Files.exists(p)) None
      else readJson(p)
        .filter(sfMatches(_, sfDir, "sf"))
        .flatMap(doubleMap(_, "times")).map(Path -> _)
    }
  }

  /** Previous headline plan fingerprints: sidecar first (it always carries
    * them), else the newest wrapper's parsed line.
    */
  def previousPlans(sfDir: String): Map[String, String] = {
    val p = Paths.get(Path)
    val side =
      if (!Files.exists(p)) Map.empty[String, String]
      else readJson(p).filter(sfMatches(_, sfDir, "sf"))
        .map(stringMap(_, "plans")).getOrElse(Map.empty)
    if (side.nonEmpty) side
    else newestArtifact()
      .filter { case (_, parsed) => sfMatches(parsed, sfDir, "parsed", "sf") }
      .map { case (_, parsed) => stringMap(parsed, "parsed", "plans") }
      .getOrElse(Map.empty)
  }

  /** Linear-interpolated percentile — the ONE implementation both the
    * printed line (Bench) and this sidecar publish from, so p50 and p95
    * can never disagree about the same samples.
    */
  private[graft] def pctl(ts: Seq[Double], p: Double): Option[Double] =
    if (ts.isEmpty) None
    else {
      val s = ts.sorted
      val idx = p * (s.size - 1)
      val lo = idx.toInt
      val hi = math.min(lo + 1, s.size - 1)
      Some(s(lo) + (idx - lo) * (s(hi) - s(lo)))
    }

  def write(sfDir: String, cpus: Int,
      times: Seq[(String, Double)],
      plans: Seq[(String, String)],
      regressions: Seq[(String, Double, Double)],
      prevSource: Option[String],
      headline: Seq[(String, Option[Double], Seq[Double])],
      errors: Seq[(String, String)]): Unit = {
    import MiniJson.{jstr, obj}
    val json = obj(Seq(
      "kind" -> jstr("graft-bench-sidecar"),
      "sf" -> jstr(sfDir),
      "cpus" -> cpus.toString,
      "action" -> jstr("noop-write"),
      "written_ms" -> System.currentTimeMillis.toString,
      "prev_source" -> prevSource.map(jstr).getOrElse("null"),
      "times" -> obj(times.map { case (k, v) => k -> v.toString }),
      "plans" -> obj(plans.map { case (k, v) => k -> jstr(v) }),
      "regressions" -> obj(regressions.map { case (k, was, now) =>
        k -> obj(Seq(
          "was" -> was.toString,
          "now" -> now.toString,
          "ratio" -> MiniJson.num(now / was, 3)))
      }),
      "headline" -> obj(headline.map { case (k, cold, ss) =>
        k -> obj(Seq(
          "cold" -> cold.map(_.toString).getOrElse("null"),
          "runs" -> ss.mkString("[", ",", "]"),
          "p95" -> pctl(ss, 0.95).map(_.toString).getOrElse("null")))
      }),
      "errors" -> obj(errors.map { case (k, m) => k -> jstr(m) })))
    try Files.write(Paths.get(Path), json.getBytes(UTF_8))
    catch {
      case NonFatal(e) =>
        System.err.println(s"[bench] sidecar write failed: ${e.getMessage}")
    }
  }
}
