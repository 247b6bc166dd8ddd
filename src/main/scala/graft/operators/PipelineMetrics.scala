package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** In-flight metrics observation — the zero-extra-scan observability
  * surface (`Dataset.observe`): named aggregates are computed INSIDE the
  * job that produces the data, piggybacked on the same scan and
  * exchanges, so a 100 TB pipeline gets its row counts, empty-document
  * rates, and size distribution for free instead of paying a second
  * pass over the corpus (the naive monitor — `df.agg(...)` next to the
  * real action — doubles the scan bill at exactly the scale where that
  * matters). Batch: the [[Observation]] handle resolves once the action
  * completes. Streaming: the same observe call surfaces per-micro-batch
  * metrics in every `QueryProgress.observedMetrics` — the feed a
  * data-quality monitor alerts on, with no second stream.
  */
object PipelineMetrics {

  /** Attach corpus-quality metrics to a documents-shaped frame; returns
    * the frame to keep building on plus the handle that resolves after
    * the first action. ObservabilitySpec proves the metrics arrive from
    * the SAME single job and equal the directly-computed aggregates.
    */
  def observeDocQuality(df: DataFrame, name: String = "doc_quality")
      : (DataFrame, Observation) = {
    val obs = Observation(name)
    val out = df.observe(obs,
      count(lit(1)).as("n_docs"),
      sum(when(col("text").isNull || length(col("text")) === 0, 1L)
        .otherwise(0L)).as("n_empty"),
      sum(col("n_chars")).as("total_chars"),
      min(col("n_chars")).as("min_chars"),
      max(col("n_chars")).as("max_chars"))
    (out, obs)
  }

  /** Streaming variant (Observation handles are batch-only): metrics
    * surface per micro-batch under `name` in
    * `QueryProgress.observedMetrics`.
    */
  def observeDocQualityStream(df: DataFrame, name: String = "doc_quality")
      : DataFrame =
    df.observe(name,
      count(lit(1)).as("n_docs"),
      sum(col("n_chars")).as("total_chars"))
}
