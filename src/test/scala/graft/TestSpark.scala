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
}
