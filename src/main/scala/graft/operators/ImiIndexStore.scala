package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persistence lifecycle for the inverted multi-index — the production
  * surface between BUILD and SERVE: the index (two half codebooks + the
  * one-row-per-vector cell table) is written once at build time and every
  * later serving session reads the artifact, never re-deriving it from
  * the collection (at 100 TB a rebuild is an O(n·2·kHalf) pass over the
  * vectors; a load is a catalog read). The cell table persists BUCKETED
  * AND SORTED BY CELL, so index-side work keyed on the cell — the
  * candidate equi-join when the probe panel is too large to broadcast,
  * cell-occupancy aggregation, SemDeDup's within-cell pair stage — plans
  * with ZERO Exchange on the index side (LayoutSpec proves the same
  * property for the fact tables; ImiIndex serving is the same physics).
  * Every column is integer (the 1e-6 fixed-point convention), so the
  * round trip is exact: a loaded index serves bit-identical answers, and
  * the spec asserts row-for-row equality with the registered j68.
  */
object ImiIndexStore {

  /** Write the index as three managed tables under `prefix`:
    * `<prefix>_cents_lo`, `<prefix>_cents_hi` (kHalf-row codebooks) and
    * `<prefix>_cells` (one row per vector, bucketed+sorted by cell).
    */
  def save(prefix: String, centsLo: DataFrame, centsHi: DataFrame,
      cells: DataFrame, nBuckets: Int = 16): Unit = {
    centsLo.write.mode("overwrite").saveAsTable(s"${prefix}_cents_lo")
    centsHi.write.mode("overwrite").saveAsTable(s"${prefix}_cents_hi")
    cells.select("vec_id", "cell").write
      .bucketBy(nBuckets, "cell")
      .sortBy("cell")
      .mode("overwrite")
      .saveAsTable(s"${prefix}_cells")
  }

  /** Read the three index tables back: (centsLo, centsHi, cells). */
  def load(spark: SparkSession, prefix: String)
      : (DataFrame, DataFrame, DataFrame) =
    (spark.table(s"${prefix}_cents_lo"),
      spark.table(s"${prefix}_cents_hi"),
      spark.table(s"${prefix}_cells"))

  /** Drop the index tables (test hygiene / index retirement). */
  def drop(spark: SparkSession, prefix: String): Unit =
    Seq("cents_lo", "cents_hi", "cells").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS ${prefix}_$t"))
}
