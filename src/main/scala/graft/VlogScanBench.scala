package graft

import org.apache.spark.sql.functions._

/** The r16 verdict's task-#4 evidence artifact: the vlog DSv2 scan vs
  * Spark's native parquet reader over the SAME files — same rows, same
  * aggregate, only the reader differs. Run:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.VlogScanBench"
  *
  * Prints one JSON line with per-reader timings (min of N) and the
  * ratio. The aggregate touches longs, doubles and a string column, so
  * the BINARY decode path is measured too; a count(*) pair additionally
  * measures the footer-only path (where the vlog scan reads zero data
  * pages and should WIN).
  */
object VlogScanBench {
  private def timeMin(n: Int)(f: => Unit): Double =
    (1 to n).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalSession.build()
    val dir = java.nio.file.Files
      .createTempDirectory("graft-vlogscanbench").toString
    sources.VersionedTable.append(
      spark.read.parquet(s"$sf/lineitem.parquet"), dir)
    val files = sources.VersionedTable.liveFiles(dir)
      .map(f => java.nio.file.Paths.get(dir, f).toString)
    def native = spark.read.parquet(files: _*)
    def vlog = spark.read.format("graft-vlog").option("path", dir).load()
    def agg(df: org.apache.spark.sql.DataFrame): Unit =
      df.agg(count(lit(1)), sum("l_quantity"), sum("l_extendedprice"),
        min("l_orderkey"), max("l_orderkey"),
        sum(length(col("l_returnflag")))).collect()
    // same answers before any timing (the point is a FAIR race) — the
    // check sums EXACT integers (cents), not raw doubles: the two
    // readers partition files differently, so double-sum addition order
    // differs and bitwise equality would flake on ULPs (r17 review)
    def exactRow(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)),
        sum(round(col("l_quantity") * 100).cast("long")),
        sum(round(col("l_extendedprice") * 100).cast("long")),
        min("l_orderkey"), max("l_orderkey"),
        sum(length(col("l_returnflag")))).collect().toSeq
    require(exactRow(native) == exactRow(vlog),
      "readers disagree — no point timing")
    val n = 5
    agg(native); agg(vlog) // warm both code paths once
    val tNative = timeMin(n)(agg(native))
    val tVlog = timeMin(n)(agg(vlog))
    val cNative = timeMin(n)(native.count())
    val cVlog = timeMin(n)(vlog.count())
    println(f"""{"metric":"vlog_scan_vs_native","sf":"$sf","rows":${vlog.count()},"agg_native_sec":$tNative%.3f,"agg_vlog_sec":$tVlog%.3f,"agg_ratio":${tVlog / tNative}%.3f,"count_native_sec":$cNative%.3f,"count_vlog_sec":$cVlog%.3f,"count_ratio":${cVlog / cNative}%.3f}""")
    spark.stop()
  }
}
