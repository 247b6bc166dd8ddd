package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (forked test JVM) — built by the
  * SAME [[LocalSession.build]] recipe the Verify/Bench mains use, so the
  * suites certify the exact session configuration the correctness gate
  * runs under (extensions, UTC, `nanosAsLong`, shuffle partitions).
  */
object TestSpark {
  lazy val spark: SparkSession = LocalSession.build(
    defaultCpus = "4",
    extra = Map(
      "spark.app.name" -> "graft-test",
      "spark.sql.warehouse.dir" ->
        java.nio.file.Files.createTempDirectory("graft-wh").toString))

  val Sf0001 = "/root/testdata/sf0.001"
  val Sf001 = "/root/testdata/sf0.01"

  /** Hex md5 of a UTF-8 string — the one JVM-side replica of the engines'
    * `md5(...)`, shared by every spec that recomputes a hash law.
    */
  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
