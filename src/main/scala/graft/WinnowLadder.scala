package graft

/** Diagnostic main for the winnow near-dup join's df-cap knob
  * (`LlmOps.winnowPairs`, registered as j81 with cap = 64): on one
  * documents dir it runs the SAME pair join at each requested cap and
  * prints one JSON line per cap with the wall time, surviving pair
  * count, and how many pairs are planted-cluster pairs (ScaleSynth
  * plants 5-doc near-dup clusters in each consecutive id group of 100,
  * so a planted pair is one with doc_a/doc_b in the same group and both
  * id%100 < 5 — the recall denominator is known by construction).
  *
  * The claim this measures: on a vocabulary-saturated corpus the
  * fingerprint df grows ∝ n, pushing the posting self-join toward its
  * n²/V regime — a tighter cap collapses that background while planted
  * recall holds, because dup-cluster fingerprints have df ≈ cluster
  * size (5 here), far below any sensible cap.
  *
  * Usage: runMain graft.WinnowLadder <documentsDir> [cap ...]
  *        (default caps: 64 16 8)
  */
object WinnowLadder {

  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: WinnowLadder <documentsDir> [cap ...]")
    val caps = if (args.length > 1) args.tail.toSeq.map(_.toLong)
               else Seq(64L, 16L, 8L)
    val spark = LocalSession.build()
    val docs = Tables.documents(spark, args(0))
    val nDocs = docs.count()
    caps.foreach { cap =>
      val t0 = System.nanoTime()
      val pairs = graft.queries.LlmOps.winnowPairs(spark, docs, cap)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val sec = (System.nanoTime() - t0) / 1e9
      val planted = pairs.count { case (a, b) =>
        a / 100 == b / 100 && a % 100 < 5 && b % 100 < 5 }
      // 5-doc clusters → C(5,2) = 10 planted pairs per FULL 100-id
      // group; a partial tail group still carries its first
      // min(tail, 5) clones, so count its C(m, 2) too or recall can
      // read > 100% on non-multiple-of-100 corpora
      val tailClones = math.min(nDocs % 100, 5L)
      val plantedTotal =
        (nDocs / 100) * 10 + tailClones * (tailClones - 1) / 2
      println(s"""{"winnow_ladder": {"docs": $nDocs, "cap": $cap, """ +
        s""""sec": ${MiniJson.num(sec, 2)}, "pairs": ${pairs.length}, """ +
        s""""planted_found": $planted, "planted_total": $plantedTotal}}""")
    }
    spark.stop()
  }
}
