package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** A finished (or partial — same shape) HDR-style histogram sketch:
  * 1,024 fixed log-bucketed cells flattened into one long array.
  */
final case class HdrSketch(cells: Array[Long])

/** Grouped-input element for the per-key quantile sketch (d16): one
  * non-negative integer observation (exact cents) under a group key.
  */
final case class KeyVal(key: String, v: Long)

/** HDR-histogram quantile sketch (the public High-Dynamic-Range histogram
  * bucketing: log₂ exponent × 16 sub-buckets from the 4 bits after the
  * leading one) as a mergeable typed `Aggregator` — the QUANTILE member of
  * the sketch family next to CMS (counts, j44) and HLL (distinct, j47).
  *
  * Why this and not a KLL/t-digest: the cell function is PURE INTEGER
  * arithmetic on the observation — `floor(log₂ v)` and a 4-bit mantissa
  * slice — so a SQL engine can derive every cell exactly and the
  * distributed fold is oracle-checkable cell-for-cell, where the
  * comparison-based sketches' cut points depend on arrival order and can
  * never hash-match across engines (the reason d13's built-in
  * `approx_percentile` is a no-oracle row).
  *
  * Guarantee: a cell spans [lb, lb·(1+1/16)), so any rank query answered
  * with the crossing cell's LOWER BOUND undershoots the true quantile by
  * at most one cell width — relative error ≤ 1/16 + one ulp at cell
  * granularity (bounds-tested against exact percentiles in QueriesSpec).
  *
  * Execution shape at 100 TB: each partition folds its observations into a
  * local 1,024-cell array, partials merge by cell-wise sum (associative +
  * commutative + zero-identity — the LawsSpec properties), so the shuffle
  * carries ONE fixed-size row per (partition, key) regardless of row count
  * — the same contract as j44/j47, where the exact d8 percentile path must
  * globally sort every group.
  */
class HdrAggregator[IN](elem: IN => Long)
    extends Aggregator[IN, HdrSketch, HdrSketch] {
  import HdrHistogram.{Cells, cellOf}

  override def zero: HdrSketch = HdrSketch(new Array[Long](Cells))

  override def reduce(b: HdrSketch, in: IN): HdrSketch = {
    b.cells(cellOf(elem(in))) += 1L
    b
  }

  override def merge(a: HdrSketch, b: HdrSketch): HdrSketch = {
    val out = new Array[Long](Cells)
    var i = 0
    while (i < out.length) { out(i) = a.cells(i) + b.cells(i); i += 1 }
    HdrSketch(out)
  }

  override def finish(r: HdrSketch): HdrSketch = r

  override def bufferEncoder: Encoder[HdrSketch] = Encoders.product[HdrSketch]
  override def outputEncoder: Encoder[HdrSketch] = Encoders.product[HdrSketch]
}

object HdrHistogram extends HdrAggregator[Long](identity) {
  /** 64 exponents × 16 sub-buckets covers any non-negative long. */
  val Cells = 1024

  /** Cell index of observation v ≥ 0: exact small values (v < 16) occupy
    * cells 0–15 (width-1 buckets — exact); otherwise cell = 16·⌊log₂ v⌋ +
    * the 4 mantissa bits after the leading one. Negative inputs are a
    * caller contract violation (cents are non-negative); clamp to cell 0
    * rather than corrupt a random cell.
    */
  def cellOf(v: Long): Int =
    if (v < 16L) math.max(0L, v).toInt
    else {
      val exp = 63 - java.lang.Long.numberOfLeadingZeros(v)
      ((exp << 4) + ((v >>> (exp - 4)) & 0xfL)).toInt
    }

  /** Lower bound of cell c — the quantile estimate emitted at the crossing
    * cell. Inverse of [[cellOf]] up to the 1/16 cell width.
    */
  def lowerBound(c: Int): Long =
    if (c < 16) c.toLong
    else (16L + (c & 0xf)) << ((c >> 4) - 4)

  /** Quantile estimate at rank ceil(num·n/den): the lower bound of the
    * crossing cell in the cumulative walk — the same integer rank formula
    * the d16 query and its oracle use ((n+1) DIV 2 = ceil(n/2) etc.), so
    * sketch answers agree across the batch, SQL, and streaming paths.
    * 0 for an empty sketch.
    */
  def quantile(sk: HdrSketch, num: Long, den: Long): Long = {
    var n = 0L
    var i = 0
    while (i < Cells) { n += sk.cells(i); i += 1 }
    if (n == 0L) return 0L
    val t = (num * n + den - 1) / den
    var cum = 0L
    var c = 0
    while (c < Cells) {
      cum += sk.cells(c)
      if (cum >= t) return lowerBound(c)
      c += 1
    }
    lowerBound(Cells - 1)
  }
}

/** Grouped variant: per-key quantile sketch — "p99 per key over 100 TB"
  * with constant state per key (the j48-for-quantiles shape).
  */
object HdrHistogramByKey extends HdrAggregator[KeyVal](_.v)
