package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spherical k-means training for IVF cell centroids (Lloyd iterations on a
  * bounded deterministic sample), plus the same assign/search machinery the
  * registered j16/j46 queries use — so a LEARNED codebook drops in behind
  * the identical interface. The j16/j46 ORACLE stays on the fixed
  * data-derived centroids (exactly reproducible in SQL); this learned path
  * is the production refinement, differential-tested in QueriesSpec for
  * recall ≥ the fixed codebook at the same nprobe.
  *
  * Scale design (100 TB):
  *  - training reads a BOUNDED deterministic sample (hash-ordered limit —
  *    one TakeOrdered, no full sort), so cost is O(sample·k·d·iters),
  *    independent of collection size;
  *  - the model (k×d doubles) lives on the driver between iterations —
  *    that is O(k·d) MODEL state, not data (same legitimacy as any
  *    broadcast variable), re-shipped per iteration as a broadcast literal;
  *  - the per-iteration mean is posexplode + (cell, dim) aggregation, so
  *    the shuffle carries k·d partial rows per partition, never vectors;
  *  - empty cells keep their previous centroid (the standard Lloyd guard);
  *  - centroids renormalize to unit length each round (spherical k-means),
  *    keeping dot-product assignment ≡ cosine assignment.
  */
object IvfKMeans {

  /** In-order double dot between the float `embedding` column and a double
    * array column `c` (centroids are means — double — so the cast sits on
    * the data side, matching how DuckDB's oracle arithmetic casts).
    */
  private def dotD(emb: String, c: String) = expr(
    s"""aggregate(zip_with($emb, $c,
        (x, y) -> cast(x as double) * y),
        cast(0 as double), (acc, v) -> acc + v)""")

  private def centsDf(emb: DataFrame, cents: Array[Array[Double]]) = {
    val spark = emb.sparkSession
    import spark.implicits._
    cents.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toSeq) }.toSeq
      .toDF("cent_id", "cvec")
  }

  /** Train k unit-norm centroids. Seeds are the k lowest-`vec_id` sample
    * vectors — the same deterministic convention as the fixed j16 codebook,
    * so iteration 0 IS the fixed codebook and every improvement is
    * attributable to Lloyd refinement. Fully deterministic: no RNG state,
    * stable under repartitioning.
    */
  def train(emb: DataFrame, k: Int = 16, iters: Int = 5,
      sampleN: Int = 4096): Array[Array[Double]] = {
    val sample = graft.Q.truncateLineage(
      emb.select(col("vec_id"), col("embedding"))
        .orderBy(pmod(hash(col("vec_id")), lit(1000003)), col("vec_id"))
        .limit(sampleN))
    var cents: Array[Array[Double]] = sample.orderBy("vec_id").limit(k)
      .collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
      .map(normalize)
    val wA = Window.partitionBy("vec_id")
      .orderBy(col("cscore").desc, col("cent_id"))
    for (_ <- 0 until iters) {
      val assigned = sample.crossJoin(broadcast(centsDf(emb, cents)))
        .withColumn("cscore", dotD("embedding", "cvec"))
        .withColumn("ark", row_number().over(wA))
        .filter(col("ark") === 1)
        .select(col("cent_id").as("cell"), col("embedding"))
      // (cell, dim) means — k·d tiny rows to the driver = the new model
      val means = assigned
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("cell", "pos").agg(avg(col("v").cast("double")).as("m"))
        .collect()
      val next = cents.map(_.clone()) // empty cells keep previous centroid
      means.foreach { r =>
        next(r.getLong(0).toInt)(r.getInt(1)) = r.getDouble(2)
      }
      cents = next.map(normalize)
    }
    cents
  }

  /** 1e-6 fixed-point quantization of the float embedding column —
    * CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT) per element, the
    * exact expression DuckDB evaluates identically (float→double widening
    * is exact, the multiply is one correctly-rounded IEEE op, and both
    * engines round ties away from zero).
    */
  def quantize(emb: DataFrame): DataFrame = emb.select(col("vec_id"), expr(
    "transform(embedding, x -> cast(round(cast(x as double) * 1000000) " +
      "as bigint))").as("qv"))

  /** Integer squared euclidean distance between two BIGINT-array columns —
    * exact, order-independent, engine-identical. `graft_d2` is the native
    * codegen'd expression (graft.functions.SquaredDistance), value-identical
    * to the interpreted `aggregate(zip_with(...))` fold it replaced; the
    * HOF form measured ~3× the whole-query runtime on the 200k-vector PQ
    * encode (one boxed Long per element vs one primitive loop).
    */
  def d2Expr(a: String, b: String): String = s"graft_d2($a, $b)"

  private def centsDfL(spark: org.apache.spark.sql.SparkSession,
      cents: Array[Array[Long]]): DataFrame = {
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i.toLong, c.toSeq) }.toSeq
      .toDF("cent_id", "cvec")
  }

  /** Nearest-cell assignment under an integer codebook: argmin squared
    * distance, ties to the lower cent_id. Output (vec_id, qv, cell).
    */
  def assignExact(qe: DataFrame, cents: Array[Array[Long]]): DataFrame = {
    graft.functions.SquaredDistance.register(qe.sparkSession)
    val w = Window.partitionBy("vec_id").orderBy(col("d2").asc,
      col("cent_id"))
    qe.crossJoin(broadcast(centsDfL(qe.sparkSession, cents)))
      .withColumn("d2", expr(d2Expr("qv", "cvec")))
      .withColumn("ark", row_number().over(w))
      .filter(col("ark") === 1)
      .select(col("vec_id"), col("qv"), col("cent_id").as("cell"))
  }

  /** Integer-EXACT Lloyd training — the oracle-checkable twin of [[train]]:
    * quantize to 1e-6 fixed point, assign by integer squared-euclidean
    * distance (ties to the lower cent_id), update each centroid dim to
    * floor(sum/count) (floor of an exact-double division of exact
    * integers — IEEE-identical in any engine). Every iteration is a pure
    * function of integers, so DuckDB replays the whole loop bit-for-bit —
    * which is what lets the registered j61 query oracle-check the TRAINING
    * LOOP itself, not just the assignment machinery. Seeds follow [[train]]'s
    * convention (the k lowest-vec_id sample vectors), but the SAMPLE uses an
    * md5 priority (not Spark's murmur3 `hash`) so the oracle can rebuild it.
    * Same scale shape as [[train]]: O(sample·k·d·iters) work, k×d-long
    * driver-held model state, per-iteration shuffle of k·d partial rows.
    * Returns (iteration-0 seed codebook, trained codebook).
    */
  def trainExact(emb: DataFrame, k: Int = 8, iters: Int = 3,
      sampleN: Int = 256): (Array[Array[Long]], Array[Array[Long]]) = {
    val sample = graft.Q.truncateLineage(
      quantize(emb)
        .orderBy(md5(concat(lit("ivf:"), col("vec_id").cast("string"))),
          col("vec_id"))
        .limit(sampleN))
    val seeds: Array[Array[Long]] = sample.orderBy("vec_id").limit(k)
      .collect().map(_.getSeq[Long](1).toArray)
    var cents = seeds
    for (_ <- 0 until iters) {
      val assigned = assignExact(sample, cents)
        .select(col("cell"), col("qv"))
      // (cell, dim) floor-means — k·d tiny rows to the driver = new model
      val means = assigned
        .select(col("cell"), posexplode(col("qv")).as(Seq("pos", "v")))
        .groupBy("cell", "pos")
        .agg(expr("cast(floor(cast(sum(v) as double) / count(1)) as bigint)")
          .as("m"))
        .collect()
      val next = cents.map(_.clone()) // empty cells keep previous centroid
      means.foreach { r =>
        next(r.getLong(0).toInt)(r.getInt(1)) = r.getLong(2)
      }
      cents = next
    }
    (seeds, cents)
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) v else v.map(_ / n)
  }

  /** Nearest-`nprobe` cell assignment — the exact shape j16/j46 use
    * (broadcast codebook join + one window rank), against a learned
    * codebook. nprobe = 1 for the collection (each vector lives in ONE
    * cell), > 1 for probes (multi-probe recall lever).
    */
  def assignCells(emb: DataFrame, cents: Array[Array[Double]],
      nprobe: Int): DataFrame = {
    val wA = Window.partitionBy("vec_id")
      .orderBy(col("cscore").desc, col("cent_id"))
    emb.crossJoin(broadcast(centsDf(emb, cents)))
      .withColumn("cscore", dotD("embedding", "cvec"))
      .withColumn("ark", row_number().over(wA))
      .filter(col("ark") <= nprobe)
      .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
  }

  /** Top-k per probe within the probe's cells — identical scoring and
    * tie-break to j16/j46 (rounded dot, then vec_id), so recall
    * comparisons against them are bit-fair.
    */
  def searchTopK(assigned: DataFrame, probes: DataFrame,
      k: Int): DataFrame = {
    graft.functions.DotProduct.register(assigned.sparkSession)
    val p = probes.select(col("vec_id").as("probe_id"),
      col("embedding").as("p"), col("cell").as("pcell"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("score").desc, col("vec_id"))
    assigned.join(broadcast(p),
        col("cell") === col("pcell") && col("vec_id") =!= col("probe_id"))
      .withColumn("score", round(expr("graft_dot(embedding, p)"), 6))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("probe_id", "vec_id", "score", "rk")
  }
}
