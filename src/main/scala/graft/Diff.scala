package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: exact-compare two registered queries' outputs (both
  * directions of exceptAll, plus row counts) — the differential check for
  * query pairs whose oracle is impractical at a given SF (e.g. j13 vs j30
  * at sf0.1, where the shared recursive-CTE DuckDB oracle exceeds 30 min).
  * Usage: sbt "runMain graft.Diff <sfDir> <nameA> <nameB>"
  */
object Diff {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: Diff <sfDir> <nameA> <nameB>")
    val Array(sfDir, nameA, nameB) = args
    val spark = LocalSession.build(defaultCpus = "32")
    val a = SparkEntry.queries(nameA)(spark, sfDir)
    val b = SparkEntry.queries(nameB)(spark, sfDir)
    val (na, nb) = (a.count(), b.count())
    val aOnly = a.exceptAll(b).count()
    val bOnly = b.exceptAll(a).count()
    val verdict = if (na == nb && aOnly == 0 && bOnly == 0) "IDENTICAL"
                  else "DIFFER"
    println(s"[diff] $nameA=$na rows, $nameB=$nb rows, " +
      s"aOnly=$aOnly, bOnly=$bOnly -> $verdict")
    spark.stop()
  }
}
