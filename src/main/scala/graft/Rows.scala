package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: print output row counts for selected queries (scale
  * experiments report these next to wall times so "work tracks output" is
  * checkable). Usage:
  *   sbt "runMain graft.Rows <sfDir> <name> [name ...]"
  */
object Rows {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Rows <sfDir> <name> [name ...]")
    val sfDir = args.head
    val spark = LocalSession.build(defaultCpus = "32")
    args.tail.foreach { n =>
      println(s"[rows] $n = ${SparkEntry.queries(n)(spark, sfDir).count()}")
    }
    spark.stop()
  }
}
