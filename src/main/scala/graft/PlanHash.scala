package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame

/** Normalized fingerprint of a query's STATIC physical plan (the plan before
  * AQE runtime re-optimization — the same surface PlanSpec pins). Purpose:
  * the bench's round-over-round timing diff has a 1.5× floor, so a plan
  * regression that costs milliseconds locally (a lost broadcast, an un-pushed
  * filter — hours at 100 TB) can hide under timing noise forever. The plan
  * hash is the noise-free tripwire: identical code + data layout → identical
  * hash; any physical-shape change → a flagged diff in the bench artifact.
  *
  * Normalization strips the run-varying text: expression IDs (`#123`
  * differ per session), plan IDs, the file-index listing (absolute paths,
  * file counts), the scale-factor directory itself, and the shuffle
  * partition count inside `hashpartitioning(..., 32)` (tracks
  * SPARK_GRAFT_CPUS, not plan shape).
  */
object PlanHash {

  def normalize(plan: String, sfDir: String): String =
    plan
      .replace(sfDir, "<SF>")
      .replaceAll("#\\d+", "#")
      .replaceAll("plan_id=\\d+", "plan_id=")
      .replaceAll("InMemoryFileIndex\\(\\d+ paths\\)\\[[^\\]]*\\]", "<FILES>")
      // trailing partition count of hash/rangepartitioning — allow TWO
      // levels of nested parens in the key exprs: one for casts, two for
      // Spark's floating-point key wrapping, which renders as
      // knownfloatingpointnormalized(normalizenanandzero(col#)) — with
      // only one level the ", 32" of a float-keyed exchange survived and
      // the fingerprint tracked SPARK_GRAFT_CPUS, the exact noise this
      // normalization exists to remove
      .replaceAll(
        "(partitioning\\([^()]*(?:\\([^()]*(?:\\([^()]*\\)[^()]*)*\\)" +
          "[^()]*)*), \\d+\\)",
        "$1, <P>)")

  def fingerprint(df: DataFrame, sfDir: String): String =
    md5hex(normalize(df.queryExecution.executedPlan.toString, sfDir)).take(12)

  def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
}
