package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: print formatted physical plans for selected queries
  * (all registered queries if no names given). Usage:
  *   sbt "runMain graft.Plans <sfDir> [name ...]"
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
                else SparkEntry.all.map(_.name)
    val spark = LocalSession.build(logLevel = "ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
