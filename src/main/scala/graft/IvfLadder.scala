package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.IvfKMeans

/** Diagnostic main for the scale-adaptive IVF path (k ≈ √n cells,
  * `IvfKMeans.scaledK`): on one embeddings dir it builds BOTH indexes —
  * the fixed 16-cell codebook the registered j16/j46/j64 queries keep for
  * oracle exactness, and the trained √n-cell codebook — then prints one
  * JSON line with, per index: cell count, probed fraction, average
  * candidates per probe, search-stage wall, and recall@3 against the
  * brute-force integer-d2 truth. Run it at two collection sizes and the
  * scaled row's candidates-per-probe should grow ~√(size ratio) while the
  * fixed row's grows linearly — the sublinear claim, measured.
  *
  * Usage: SPARK_GRAFT_SF_DIR-style arg: runMain graft.IvfLadder <dir>
  */
object IvfLadder {

  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: IvfLadder <embeddingsDir>")
    val spark = LocalSession.build()
    graft.functions.SquaredDistance.register(spark)
    val e = Tables.embeddings(spark, args(0))
    val n = e.count()
    val qe = Q.truncateLineage(IvfKMeans.quantize(e))
    val probePanel = Q.truncateLineage(
      qe.filter(col("vec_id") % 100 === 7).orderBy("vec_id").limit(64))
    val nProbes = probePanel.count()

    // brute-force integer-d2 top-3 truth (same metric + tie-break as the
    // indexed paths, so recall is bit-fair)
    val wT = Window.partitionBy("probe_id").orderBy(col("d2").asc,
      col("vec_id"))
    val truth = qe.crossJoin(broadcast(probePanel
        .select(col("vec_id").as("probe_id"), col("qv").as("pqv"))))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("d2", expr(IvfKMeans.d2Expr("qv", "pqv")))
      .withColumn("rk", row_number().over(wT))
      .filter(col("rk") <= 3)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    def run(tag: String, cents: Array[Array[Long]], nprobe: Int)
        : (String, Double, Int, org.apache.spark.sql.DataFrame) = {
      val k = cents.length
      var t0 = System.nanoTime()
      val cells = Q.truncateLineage(IvfKMeans.assignExactAgg(qe, cents))
      cells.count()
      val assignSec = (System.nanoTime() - t0) / 1e9
      // probe qvs come from the already-materialized panel — re-quantizing
      // the whole collection here cost three redundant full passes
      val probes = IvfKMeans.probeCellsExact(probePanel, cents, nprobe)
      // average over ALL panel probes (left join + coalesce 0): a probe
      // alone in its cells must count as 0 candidates, not vanish from
      // the mean — and an all-empty panel must yield 0.0, not an NPE
      val avgCand = probePanel.select(col("vec_id").as("probe_id"))
        .join(
          cells.join(broadcast(probes), col("cell") === col("pcell"))
            .filter(col("vec_id") =!= col("probe_id"))
            .groupBy("probe_id").count(),
          Seq("probe_id"), "left")
        .agg(coalesce(avg(coalesce(col("count"), lit(0L))), lit(0.0)))
        .collect()(0).getDouble(0)
      t0 = System.nanoTime()
      val top = IvfKMeans.searchTopKExact(cells, probes, topK = 3)
        .select("probe_id", "vec_id").collect()
      val searchSec = (System.nanoTime() - t0) / 1e9
      val hits = top.count(r => truth((r.getLong(0), r.getLong(1))))
      (f"""\"$tag\":{"k":$k,"nprobe":$nprobe,""" +
        f""""probed_fraction":${nprobe.toDouble / k}%.4f,""" +
        f""""avg_candidates_per_probe":$avgCand%.1f,""" +
        f""""assign_sec":$assignSec%.2f,"search_sec":$searchSec%.2f,""" +
        f""""recall_hits":$hits,"recall_denom":${truth.size}}""",
        avgCand, hits, cells)
    }

    // fixed 16-cell codebook (the j16/j61 convention: 16 lowest vec_ids)
    val fixed16 = qe.orderBy("vec_id").limit(16).collect()
      .map(_.getSeq[Long](1).toArray)
    // trained √n-cell codebook: integer-exact Lloyd, sample ≥ 16 pts/cell
    val k = IvfKMeans.scaledK(n)
    val t0 = System.nanoTime()
    val (_, trained) = IvfKMeans.trainExact(e, k = k, iters = 2,
      sampleN = math.max(1024, 16 * k))
    val trainSec = (System.nanoTime() - t0) / 1e9
    // equal-or-smaller probed fraction for the scaled index: nprobe scales
    // with k/16 (rounded DOWN, so the scaled path never probes a larger
    // fraction than fixed's nprobe=1 — recall wins are then attributable
    // to the trained partition, not to probing more of the space)
    val nprobeScaled = math.max(1, k / 16)
    // Three configs, two claims:
    //  - "scaled_eqfrac" (nprobe = k/16, same 1/16 probed fraction as the
    //    fixed baseline): the RECALL story — trained √n cells vs the fixed
    //    16 at identical candidate budget growth.
    //  - "scaled_const_nprobe" (nprobe pinned at 8): the COST story — per-
    //    probe candidates are nprobe·n/k = 8·√n, so a 10× collection grows
    //    per-probe work ~√10 ≈ 3.2×, where both fixed16 and any
    //    equal-fraction config grow it 10× (candidates = fraction·n).
    val (fixedJson, _, _, fixedCells) = run("fixed16", fixed16, nprobe = 1)
    val (eqfracJson, avgCandScaled, _, _) =
      run("scaled_eqfrac", trained, nprobe = nprobeScaled)
    val (constJson, _, _, _) = run("scaled_const_nprobe", trained, nprobe = 8)
    val out = Seq(fixedJson, eqfracJson, constJson).mkString(",")
    // the multi-index assignment-cost point: ~k product cells from
    // 2·√k distance evals per vector, vs the flat path's k — this is
    // the build-cost fix scaledK's caveat names (j67/j68 machinery)
    val kHalf = math.max(4, math.ceil(math.sqrt(k.toDouble)).toInt)
    val tImi = System.nanoTime()
    val imiCells = Q.truncateLineage(
      IvfKMeans.imiAssign(qe, kHalf).select("vec_id", "cell"))
    imiCells.count()
    val imiSec = (System.nanoTime() - tImi) / 1e9
    val imiJson = f""""imi":{"k_half":$kHalf,""" +
      f""""cells":${kHalf * kHalf},"evals_per_vec":${2 * kHalf},""" +
      f""""assign_sec":$imiSec%.2f}"""
    // IMI SEARCH at production sizing (round 13): kHalf ≈ n^(1/4) TRAINED
    // half codebooks → ~√n product cells — the full j68 pipeline (2·kHalf
    // probe evals, decomposed-sum cell ordering, candidates from the cell
    // equi-join, vectors fetched per candidate) at the sizing a 100 TB
    // deployment would run. nprobe is tied to the scaled-IVF eqfrac config
    // (nprobe_imi = floor(cells · nprobe_scaled / k)) so the probed CELL
    // fraction is equal-or-smaller and recall is comparable; candidates
    // per probe report the fraction of the COLLECTION actually scanned.
    val kQ = math.max(4, math.ceil(math.pow(n.toDouble, 0.25)).toInt)
    val nCellsImi = kQ * kQ
    var tI = System.nanoTime()
    val (cl, ch) = IvfKMeans.imiHalfCodebooksTrained(qe, kQ,
      iters = 2, sampleN = math.max(1024, 16 * kQ))
    val clT = Q.truncateLineage(cl)
    val chT = Q.truncateLineage(ch)
    clT.count(); chT.count()
    val imiTrainSec = (System.nanoTime() - tI) / 1e9
    tI = System.nanoTime()
    val imiCellTable = Q.truncateLineage(
      IvfKMeans.imiAssignAgainst(qe, clT, chT, kQ).select("vec_id", "cell"))
    imiCellTable.count()
    val imiAssignSec = (System.nanoTime() - tI) / 1e9
    def runImi(tag: String, nprobe: Int): (String, Double, Int) = {
      val probesImi = Q.truncateLineage(IvfKMeans.imiProbeCells(
        probePanel.select(col("vec_id").as("probe_id"), col("qv").as("pqv")),
        clT, chT, kQ, nprobe))
      val avgCand = probePanel.select(col("vec_id").as("probe_id"))
        .join(
          imiCellTable.join(broadcast(probesImi.select("probe_id", "pcell")),
              col("cell") === col("pcell"))
            .filter(col("vec_id") =!= col("probe_id"))
            .groupBy("probe_id").count(),
          Seq("probe_id"), "left")
        .agg(coalesce(avg(coalesce(col("count"), lit(0L))), lit(0.0)))
        .collect()(0).getDouble(0)
      val tS = System.nanoTime()
      val top = IvfKMeans.imiSearchTopK(imiCellTable, qe, probesImi,
          topK = 3)
        .select("probe_id", "vec_id").collect()
      val searchSec = (System.nanoTime() - tS) / 1e9
      val hits = top.count(r => truth((r.getLong(0), r.getLong(1))))
      (f"""\"$tag\":{"k_half":$kQ,"cells":$nCellsImi,"nprobe":$nprobe,""" +
        f""""probed_fraction":${nprobe.toDouble / nCellsImi}%.4f,""" +
        f""""avg_candidates_per_probe":$avgCand%.1f,""" +
        f""""train_sec":$imiTrainSec%.2f,""" +
        f""""assign_sec":$imiAssignSec%.2f,""" +
        f""""search_sec":$searchSec%.2f,""" +
        f""""recall_hits":$hits,"recall_denom":${truth.size}}""",
        avgCand, hits)
    }
    // equal-or-smaller probed CELL fraction than the scaled eqfrac config
    val nprobeImi = math.max(1,
      math.floor(nCellsImi * nprobeScaled / k.toDouble).toInt)
    val (imiEqfracJson, avgCandImi, _) =
      runImi("imi_search_eqfrac", nprobeImi)
    // equal CANDIDATE budget: a data-point probe lands in the dense region
    // of the trained flat cells, so at equal cell fraction the product
    // cells (ordered by decomposed sum) scan FEWER vectors — measured,
    // e.g. 1197 vs 1776 at 20k. Scaling nprobe to candidate parity makes
    // the recall comparison budget-fair; capped at all cells.
    val nprobeEq = math.min(nCellsImi, math.max(nprobeImi,
      math.ceil(nprobeImi * avgCandScaled / math.max(avgCandImi, 1.0)).toInt))
    val (imiEqcandJson, _, _) = runImi("imi_search_eqcand", nprobeEq)
    // SemDeDup pair stage at production sizing (round 13, the j70 shape):
    // the dedup's quadratic term is candidate pairs = Σ c·(c−1)/2 over
    // cell sizes — computed EXACTLY from the two cell histograms (fixed
    // 16 cells vs the trained ~√n product cells; no join needed for the
    // count), then the IMI-cell pair stage is EXECUTED for wall time:
    // within-cell self-join + rounded-dot τ=0.35 filter. The synth
    // vectors are uniform UNNORMALIZED (measured: τ=0.35 passes ~80% of
    // within-cell candidates) — tau_pairs is a throughput detail here,
    // not a dedup-quality signal (the real corpus is L2-normalized
    // where τ bites); the evidence is the CANDIDATE counts and the wall
    // of scanning them, the term that decides 100 TB viability: fixed
    // cells hold candidates at n²/16 while √n cells drop them to ~n^1.5
    // (and the product structure is what makes √n cells BUILDABLE — the
    // assign_sec fields above).
    graft.functions.DotProduct.register(spark)
    def candPairs(cellTable: org.apache.spark.sql.DataFrame): Long =
      cellTable.groupBy("cell").count()
        .agg(sum(expr("count * (count - 1) div 2")).cast("long"))
        .collect()(0).getLong(0)
    // reuse the fixed-16 assignment run("fixed16") already materialized —
    // recomputing it here was a full redundant O(n·16) pass inside the
    // very harness that measures assignment cost
    val candFixed = candPairs(fixedCells)
    val candImi = candPairs(imiCellTable)
    val tD = System.nanoTime()
    val assignedD = Q.truncateLineage(e.select("vec_id", "embedding")
      .join(imiCellTable, "vec_id"))
    val tauPairs = graft.queries.LlmOps.semanticPairs(assignedD).count()
    val dedupSec = (System.nanoTime() - tD) / 1e9
    val dedupJson =
      f""""semdedup":{"cand_pairs_fixed16":$candFixed,""" +
        f""""cand_pairs_imi":$candImi,""" +
        f""""cand_ratio":${candFixed.toDouble / math.max(candImi, 1L)}%.1f,""" +
        f""""tau_pairs":$tauPairs,"pair_stage_sec":$dedupSec%.2f}"""
    // hard-negative mining (the j74 family) at both cell structures:
    // anchors are a broadcast 8-row panel, so per-anchor work is
    // CELL-sized — candidates/anchor drop by ~cells/16 under the trained
    // product cells (the same n²-term physics as SemDeDup's pair stage,
    // but anchored: 8·n/cells instead of n²/cells)
    def mineCand(cellTable: org.apache.spark.sql.DataFrame): Long =
      cellTable.filter(col("vec_id") < 8)
        .select(col("cell").as("acell"))
        .join(cellTable.groupBy("cell").count(),
          col("cell") === col("acell"))
        .agg(coalesce(sum(expr("count - 1")), lit(0L)).cast("long"))
        .collect()(0).getLong(0)
    val mcFixed = mineCand(fixedCells.select("vec_id", "cell"))
    val mcImi = mineCand(imiCellTable)
    val tF = System.nanoTime()
    val negFixed = graft.queries.LlmOps
      .minedNegatives(fixedCells.select("vec_id", "cell"), e).count()
    val mineFixedSec = (System.nanoTime() - tF) / 1e9
    val tC = System.nanoTime()
    val negImi = graft.queries.LlmOps.minedNegatives(imiCellTable, e).count()
    val mineImiSec = (System.nanoTime() - tC) / 1e9
    val miningJson =
      f""""mining":{"cand_fixed16":$mcFixed,"cand_cells":$mcImi,""" +
        f""""cand_ratio":${mcFixed.toDouble / math.max(mcImi, 1L)}%.1f,""" +
        f""""neg_fixed":$negFixed,"neg_cells":$negImi,""" +
        f""""fixed_sec":$mineFixedSec%.2f,"cells_sec":$mineImiSec%.2f}"""
    println(s"""{"n":$n,"n_probes":$nProbes,""" +
      f""""train_sec":$trainSec%.2f,$out,$imiJson,""" +
      s"""$imiEqfracJson,$imiEqcandJson,$dedupJson,$miningJson}""")
    spark.stop()
  }
}
