package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded random-hyperplane candidate generation for cosine similarity —
  * the machinery behind `j11_cosine_neardup`, factored out so the band
  * geometry is parameterizable: the registered query instantiates
  * (r=4, b=8) to keep a non-trivial oracled result at the demo threshold,
  * and the corpus-scale law test instantiates wide bands (r=12) to prove
  * the saturation story measured, not asserted.
  *
  * Geometry: plane q's weight vector is the fixed ±1 integer pattern
  * `(i·(73 + 151·q)) mod 97 < 49` — like the j12 family it is
  * reproducible in ANSI SQL so an oracle can encode the same bands
  * bit-for-bit, but unlike j12's `(i·73 + q·151) mod 7` it is NOT
  * periodic in q (that pattern repeats every 7 planes, so any family
  * wider than 7 reuses hyperplanes and correlates its bands — measured:
  * r=12 bands built from it saturate to 340n candidates; gcd(54, 97) = 1
  * makes this family's 97 planes distinct). Band j owns planes
  * [j·r, (j+1)·r); its key packs the r sign bits. A pair is a candidate
  * iff it collides in ≥ 1 full band: P(candidate) = 1-(1-p^r)^b with
  * p = 1-θ/π.
  *
  * Scale rule (the j10 signature-width lesson): the 2^r key space must
  * grow with the corpus or per-bucket counts saturate the band equi-join
  * toward n²/2^r. r=4 (16 keys) fits the 2k-vector testdata; a production
  * corpus at τ ≥ 0.9 runs r=12–16 (4k–64k keys), where p ≈ 0.86 keeps
  * S-curve recall high — measured in QueriesSpec at 20k vectors.
  */
object CosineBands {

  /** Sign bit of plane q as 0/`weight` — the REFERENCE interpreted
    * formulation (higher-order-function fold). The hot path uses the fused
    * codegen'd [[graft.functions.CosinePlaneKeys]] expression instead;
    * this Column is kept for the lockstep spec that pins the two
    * bit-identical (IEEE ±1.0 multiplication is exact, so the folds
    * cannot diverge).
    */
  def planeBit(q: Int, weight: Int, embCol: String = "embedding"): Column =
    expr(
      s"""CASE WHEN aggregate(zip_with($embCol, transform(sequence(1, 64),
          i -> CASE WHEN (i * (73 + 151 * $q)) % 97 < 49 THEN 1.0D
               ELSE -1.0D END), (x, w) -> cast(x as double) * w),
          cast(0 as double), (acc, v) -> acc + v) >= 0
          THEN $weight ELSE 0 END""")

  /** Band j's packed r-bit key — one fused codegen'd pass (computes bands
    * 0..j and takes the last; for the j12 single-bucket use j=0 so nothing
    * is wasted).
    */
  def bandKey(j: Int, r: Int, embCol: String = "embedding"): Column =
    expr(s"element_at(graft_plane_keys($embCol, $r, ${j + 1}), ${j + 1})")

  /** `(vec_id, band, bk)` — one row per vector per band from ONE fused
    * signature pass per row, lineage-truncated so it runs once, not once
    * per self-join side.
    */
  def bandKeys(e: DataFrame, r: Int, b: Int): DataFrame = {
    graft.functions.CosinePlaneKeys.register(e.sparkSession)
    graft.Q.truncateLineage(e
      .select(col("vec_id"),
        posexplode(expr(s"graft_plane_keys(embedding, $r, $b)"))
          .as(Seq("band", "bk"))))
  }

  /** Distinct candidate pairs `(vid_a, vid_b)`, vid_a < vid_b, colliding in
    * ≥ 1 band — a hash equi-join on (band, key), never an all-pairs scan.
    */
  def candidatePairs(e: DataFrame, r: Int, b: Int): DataFrame = {
    val keys = bandKeys(e, r, b)
    keys.alias("x")
      .join(keys.alias("y"),
        col("x.band") === col("y.band") && col("x.bk") === col("y.bk") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vid_a"), col("y.vec_id").as("vid_b"))
      .distinct()
  }

  /** The matching oracle-side band column SQL (DuckDB), kept adjacent to
    * the Spark formula so the two can only drift together.
    */
  def bandSql(j: Int, r: Int): String =
    (0 until r).map { k =>
      val q = j * r + k
      s"""(CASE WHEN list_reduce(list_transform(generate_series(1, 64),
          i -> embedding[i]::DOUBLE *
            (CASE WHEN (i * (73 + 151 * $q)) % 97 < 49
             THEN 1.0 ELSE -1.0 END)), (x, y) -> x + y) >= 0
          THEN ${1 << k} ELSE 0 END)"""
    }.mkString(" + ")
}
