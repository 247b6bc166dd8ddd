package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Connected components over an undirected pair list — the cluster-
  * canonicalization core behind `j13_dedup_clusters` / `j30_cc_bigstar`,
  * exposed as a reusable operator so any pair-producing dedup stage
  * (MinHash, SimHash, embedding near-dup) can feed it directly.
  *
  * Inputs: `nodes(doc_id)` — the id universe (isolated nodes label
  * themselves); `pairs(doc_a, doc_b)` — undirected edges. Output:
  * `(doc_id, cluster_id, is_canonical)`, cluster_id = min id in the
  * component, unordered (callers add their output sort).
  *
  * Two interchangeable algorithms, identical results:
  *   - `byLabelPropagation`: BSP min-label flooding, O(diameter)
  *     supersteps — the simple default when components are compact.
  *   - `byStarContraction`: alternating large-star/small-star (public
  *     technique: Kiveris et al., "Connected Components in MapReduce and
  *     Beyond", SoCC'14), O(log n) rounds on ANY graph — the scale path
  *     when component diameter is adversarial (long near-dup chains).
  * Both run to a detected fixpoint with the driver actioning only a 1-row
  * convergence scalar per round, truncate lineage every round (reliable
  * checkpoints under `spark.graft.reliableCheckpoint`, see
  * [[graft.Q.truncateLineage]]), and fail LOUDLY on their runaway backstop
  * rather than return an unconverged (wrong) clustering.
  */
object ConnectedComponents {

  private def trunc = graft.Q.truncateLineage _

  /** O(diameter)-superstep min-label propagation to fixpoint (label sum is
    * positive and strictly decreasing until convergence, so one cheap agg
    * per superstep detects it — no diameter assumption baked in).
    */
  def byLabelPropagation(nodes: DataFrame, pairs: DataFrame,
      maxSupersteps: Int = 50): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    var labels = nodes.select(col("doc_id"), col("doc_id").as("label"))
    var prevSum: java.math.BigDecimal = java.math.BigDecimal.valueOf(-1L)
    var iter = 0
    // coalesce: sum() over an empty label set is NULL — the degenerate
    // empty-input case must return empty output, not NPE. Decimal sum:
    // exact and overflow-proof (a long sum of billions of wide ids would
    // throw under ANSI arithmetic at 100-TB node counts), preserving the
    // monotone-decrease convergence argument unchanged.
    def sumOf(l: DataFrame): java.math.BigDecimal =
      l.agg(coalesce(sum(col("label").cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO))).head().getDecimal(0)
    var curSum = sumOf(labels)
    // compareTo, not equals: BigDecimal.equals is scale-sensitive
    while (curSum.compareTo(prevSum) != 0 && iter < maxSupersteps) {
      val nbr = edges
        .join(labels.select(col("doc_id").as("dst"),
          col("label").as("nlabel")), "dst")
        .groupBy(col("src").as("doc_id"))
        .agg(min("nlabel").as("nmin"))
      labels = trunc(
        labels.join(nbr, Seq("doc_id"), "left")
          .select(col("doc_id"),
            least(col("label"), coalesce(col("nmin"), col("label")))
              .as("label")))
      prevSum = curSum
      curSum = sumOf(labels)
      iter += 1
    }
    require(curSum.compareTo(prevSum) == 0,
      s"label propagation did not converge within $iter supersteps " +
        "(component diameter exceeds the superstep budget — use " +
        "byStarContraction, which is O(log n) rounds on any graph)")
    // telemetry: the O(diameter)-vs-O(log n) claim should carry a measured
    // round count per corpus (scale runs cite this line in the README)
    System.err.println(s"[cc] label-propagation fixpoint in $iter supersteps")
    labels.select(col("doc_id"), col("label").as("cluster_id"),
      (col("doc_id") === col("label")).as("is_canonical"))
  }

  /** O(log n)-round alternating large-star/small-star contraction.
    *   large-star: every neighbor v > u re-links to m = min(Γ(u) ∪ {u})
    *   small-star: every neighbor (all ≤ u after large-star) and u itself
    *               re-link to m
    * Each round is two keyed exchanges (a min-window per star center + a
    * dedup); at the fixpoint the edges form a star forest whose centers
    * are the component minima.
    */
  def byStarContraction(nodes: DataFrame, pairs: DataFrame,
      maxRounds: Int = 50): DataFrame = {
    // parent-link edge set, maintained directed large→small (u > v)
    var edges = trunc(
      pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
        .union(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
        .filter(col("u") > col("v")))
    // Convergence is two-tier: a cheap per-round digest (count + key sums +
    // an XORed per-edge hash — XOR is order-independent and cannot overflow
    // under ANSI arithmetic) detects a CANDIDATE fixpoint, and an exact
    // set-difference then CONFIRMS it. Digest equality alone must never end
    // the loop — two different edge sets could collide on the digest, and
    // this operator's contract is fail-loud, never silently-wrong. Both
    // sides of the compare are distinct sets with equal count (count is in
    // the digest), so one empty `except` proves set equality.
    def stateOf(e: DataFrame): (Long, Long, Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(u))"), lit(0L)),
        coalesce(expr("bit_xor(xxhash64(v))"), lit(0L)),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    var cur = stateOf(edges)
    var iter = 0
    var fixpoint = false
    while (!fixpoint && iter < maxRounds) {
      val sym = edges
        .union(edges.select(col("v").as("u"), col("u").as("v")))
      val wU = Window.partitionBy("u")
      val ls = sym
        .withColumn("m", least(min(col("v")).over(wU), col("u")))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
      val ss = ls
        .withColumn("m", least(min(col("v")).over(wU), col("u")))
        .select(explode(array(
          struct(col("v").as("a"), col("m").as("b")),
          struct(col("u").as("a"), col("m").as("b")))).as("e"))
        .select(col("e.a").as("u"), col("e.b").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
      val next = trunc(ss)
      val nxt = stateOf(next)
      if (nxt == cur) fixpoint = next.except(edges).isEmpty
      edges = next
      cur = nxt
      iter += 1
    }
    require(fixpoint,
      s"large/small-star did not converge within $iter rounds")
    System.err.println(s"[cc] star-contraction fixpoint in $iter rounds")
    val roots = edges.groupBy(col("u").as("doc_id"))
      .agg(min(col("v")).as("root"))
    nodes.select(col("doc_id"))
      .join(roots, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("root"), col("doc_id")).as("cluster_id"),
        (col("doc_id") === coalesce(col("root"), col("doc_id")))
          .as("is_canonical"))
  }
}
