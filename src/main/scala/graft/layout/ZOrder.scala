package graft.layout

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the multi-dimensional half of the
  * write-side layout story. A table sorted on ONE column prunes scans only
  * for predicates on that column: files carry tight min/max on the sort key
  * and useless full-range stats on everything else. Interleaving the bits
  * of several columns into one Morton code and range-partitioning + sorting
  * on it gives every participating column partially-tight per-file ranges,
  * so a data-skipping reader (file- or row-group-level min/max, the same
  * stats parquet footers and lakehouse manifests already carry) prunes for
  * predicates on ANY of the dimensions — the standard OPTIMIZE-ZORDER
  * technique (Morton 1966; see also the public Delta/Iceberg docs). At
  * 100 TB this is the difference between "point-in-time queries re-scan the
  * whole user-sorted table" and "both user- and time-selective queries skip
  * ~(1 - sel^(1/d)) of the files".
  *
  * Everything here is deterministic column arithmetic (shift/and/or — all
  * codegen'd); the only driver-side step is the one min/max aggregate that
  * fixes the per-column scaling, the same single pass any write-side
  * layout job already pays.
  */
object ZOrder {

  /** Interleave the low `bits` bits of pre-scaled non-negative longs:
    * bit b of column i lands at position b·n + i. 2 cols × 16 bits = 32
    * shift/and/or terms — a flat codegen'd expression, no UDF.
    */
  def interleave(scaled: Seq[Column], bits: Int): Column = {
    // JVM shifts mask the amount mod 64, so bits*n > 64 would not fail —
    // it would silently fold distinct codes together and degrade all
    // pruning to garbage. Refuse instead; callers use effectiveBits.
    require(bits * scaled.size <= 64,
      s"interleave: $bits bits x ${scaled.size} cols exceeds 64-bit Morton " +
        s"code; use bits <= ${64 / scaled.size}")
    (0 until bits).flatMap { b =>
      scaled.zipWithIndex.map { case (c, i) =>
        shiftleft(shiftright(c, b).bitwiseAND(lit(1L)),
          b * scaled.size + i)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Largest per-column bit width that fits `n` columns in one 64-bit
    * Morton code — 2 cols → 32, 4 → 16, 5 → 12.
    */
  def effectiveBits(n: Int, requested: Int = 16): Int =
    math.min(requested, 64 / math.max(1, n))

  /** Morton code over `cols` (numeric; cast timestamps to long first),
    * each linearly scaled to [0, 2^bits) from the supplied (min, max).
    */
  def mortonCol(
      cols: Seq[Column], ranges: Seq[(Long, Long)], bits: Int = 16): Column = {
    // auto-reduce so the default 16 bits keeps working past 4 dimensions
    val useBits = effectiveBits(cols.size, bits)
    val scaled = cols.zip(ranges).map { case (c, (lo, hi)) =>
      // exact integer scaling to EXACTLY `bits` significant bits: rebase
      // to the column minimum, then shift the span's bit-length to
      // `bits` — down for wide spans (µs timestamps), UP for narrow ones
      // (small id domains). Pure shifts, no doubles (a µs span times any
      // multiplier would exceed double's 2^53 exact-integer range).
      // Equal widths matter: if one dimension occupied fewer top bits
      // than another, the interleaved code's high bits would all belong
      // to the wide dimension and range-partitioning on it would degrade
      // to a plain sort on that dimension — no pruning on the others.
      val span = math.max(1L, hi - lo)
      val bl = 64 - java.lang.Long.numberOfLeadingZeros(span)
      val c0 = c.cast("long") - lit(lo)
      if (bl >= useBits) shiftright(c0, bl - useBits)
      else shiftleft(c0, useBits - bl)
    }
    interleave(scaled, useBits)
  }

  /** Rewrite `df` into `destDir` clustered on the Morton code of `cols`:
    * one min/max pass to fix the scaling, then range-partition into
    * `nFiles` Z-ranges and sort within each — every output file covers a
    * contiguous stretch of the curve, which is what makes its per-column
    * min/max tight. Returns the (min, max) ranges used (a reader needs
    * nothing from them — pruning uses the files' own column stats).
    */
  def zorderWrite(
      df: DataFrame, cols: Seq[String], destDir: String,
      nFiles: Int = 16, bits: Int = 16): Seq[(Long, Long)] = {
    val mm = df.agg(
      cols.flatMap(c => Seq(min(col(c).cast("long")).as(s"lo_$c"),
        max(col(c).cast("long")).as(s"hi_$c"))).head,
      cols.flatMap(c => Seq(min(col(c).cast("long")).as(s"lo_$c"),
        max(col(c).cast("long")).as(s"hi_$c"))).tail: _*).head()
    val ranges = cols.indices.map { i =>
      // empty input or an all-null column yields null min/max — fail with
      // the actual problem, not an opaque NPE from getLong
      require(!mm.isNullAt(2 * i) && !mm.isNullAt(2 * i + 1),
        s"zorderWrite: no non-null values for Z-order column " +
          s"'${cols(i)}' (empty input?)")
      (mm.getLong(2 * i), mm.getLong(2 * i + 1))
    }
    val z = mortonCol(cols.map(col), ranges, bits)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(destDir)
    ranges
  }

  /** Data-skipping emulation for tests/demos: per-file (min, max) of each
    * probe column — exactly the stats a parquet footer / lakehouse manifest
    * exposes — and the count of files whose ranges intersect a box
    * predicate. A reader would schedule only those files.
    */
  def filesTouched(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      box: Seq[(String, Long, Long)]): (Long, Long) = {
    val stats = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(box.flatMap { case (c, _, _) =>
        Seq(min(col(c).cast("long")).as(s"lo_$c"),
          max(col(c).cast("long")).as(s"hi_$c")) }.head,
        box.flatMap { case (c, _, _) =>
          Seq(min(col(c).cast("long")).as(s"lo_$c"),
            max(col(c).cast("long")).as(s"hi_$c")) }.tail: _*)
    val hit = box.map { case (c, lo, hi) =>
      col(s"lo_$c") <= lit(hi) && col(s"hi_$c") >= lit(lo)
    }.reduce(_ && _)
    (stats.filter(hit).count(), stats.count())
  }
}
