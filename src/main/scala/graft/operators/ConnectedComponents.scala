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
    var prevSum = -1L
    var iter = 0
    var curSum = labels.agg(sum("label")).head().getLong(0)
    while (curSum != prevSum && iter < maxSupersteps) {
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
      curSum = labels.agg(sum("label")).head().getLong(0)
      iter += 1
    }
    require(curSum == prevSum,
      s"label propagation did not converge within $iter supersteps " +
        "(component diameter exceeds the superstep budget — use " +
        "byStarContraction, which is O(log n) rounds on any graph)")
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
    def stateOf(e: DataFrame): (Long, Long, Long) = {
      val r = e.agg(count(lit(1)), coalesce(sum("u"), lit(0L)),
        coalesce(sum("v"), lit(0L))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    var prev = (-1L, -1L, -1L)
    var cur = stateOf(edges)
    var iter = 0
    while (cur != prev && iter < maxRounds) {
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
      edges = trunc(ss)
      prev = cur
      cur = stateOf(edges)
      iter += 1
    }
    require(cur == prev,
      s"large/small-star did not converge within $iter rounds")
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
