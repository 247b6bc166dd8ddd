package graft

import org.apache.spark.sql.SparkSession

/** The one local-session recipe shared by every runnable main (Verify,
  * Bench, Diff, Rows, Plans, ScaleSynth). Factored into a single helper so
  * a diagnostic main cannot drift from the config the correctness gate
  * certifies — e.g. a forgotten `spark.sql.extensions` registration would
  * silently run a differential check under a different session than the
  * thing it vouches for.
  *
  * Core thread count comes from SPARK_GRAFT_CPUS (falling back to
  * `defaultCpus`) and also sizes `spark.sql.shuffle.partitions` — local
  * mode wants one shuffle partition per core, not the 200 default meant
  * for clusters.
  */
object LocalSession {

  def build(defaultCpus: String = "4",
      extra: Map[String, String] = Map.empty,
      logLevel: String = "WARN"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // the docgen TableCatalog: SQL text reaches the custom DSv2 source
      // as graft.docgen_<rows>[_<parts>] with full pushdown (a5)
      .config("spark.sql.catalog.graft", "graft.sources.DocGenCatalog")
      // the versioned-table catalog: any VersionedTable directory is
      // addressable as graft_vlog.`/its/dir` with VERSION AS OF (a9)
      .config("spark.sql.catalog.graft_vlog", "graft.sources.VlogCatalog")
      // both events.ts layouts must read (ns-long pre-regen, µs current) —
      // set once at session build, not mutated at query-build time
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    extra.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel(logLevel)
    spark
  }
}
