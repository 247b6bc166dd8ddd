package graft

import org.apache.spark.sql.functions._

/** Diagnostic main for the SymSpell typo join's df-cap knob
  * (`LlmOps.typoCandidates`, registered uncapped as j87 and with cap = 2
  * as j88): synthesizes a digit-dense vocabulary — the ADVERSARIAL regime
  * for deletion indexing, because every 3-digit subsequence variant is
  * shared by hundreds of numeric tokens — plants known distance-1 typo
  * pairs, and measures wall time, candidate volume, and planted recall
  * at each cap and vocabulary size.
  *
  * Vocabulary: tokens `w<i>` for i < V (the ScaleSynth token shape), plus
  * P planted pairs (`q<j>0`, `q<j>1`) — each planted twin differs by ONE
  * substituted trailing char, so lev = 1 and the pair shares a depth-1
  * deletion variant whose bucket is SMALL (only the twins post it).
  * Planted recall therefore survives any cap ≥ 2, while the numeric
  * background's hot subsequence buckets (df into the hundreds) are
  * exactly what the cap exists to drop — both sides of the j66-style
  * trade measured on one corpus.
  *
  * Usage: runMain graft.TypoLadder [V ...] (default 20000 50000 100000)
  *        caps per rung: 2, 16, 64; uncapped only at the smallest V
  *        (the uncapped candidate set is the quadratic regime the index
  *        replaces — running it at 100k would measure only the blow-up).
  */
object TypoLadder {

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toInt)
                else Seq(20000, 50000, 100000)
    val planted = 500
    val spark = LocalSession.build()
    import spark.implicits._
    sizes.foreach { v =>
      val base = spark.range(v.toLong)
        .select(concat(lit("w"), col("id")).as("tok"), lit(1L).as("cnt"))
      val pairs = spark.range(planted.toLong).select(
        explode(array(concat(lit("q"), col("id"), lit("0")),
          concat(lit("q"), col("id"), lit("1")))).as("tok"),
        lit(1L).as("cnt"))
      val vocab = base.unionByName(pairs)
      val caps: Seq[Option[Int]] =
        (if (v == sizes.min) Seq(None) else Nil) ++
          Seq(Some(64), Some(16), Some(2))
      caps.foreach { cap =>
        val t0 = System.nanoTime()
        val found = graft.queries.LlmOps.typoCandidates(vocab, cap)
          .select("tok_a", "tok_b").collect()
          .map(r => (r.getString(0), r.getString(1)))
        val sec = (System.nanoTime() - t0) / 1e9
        val plantedFound = found.count { case (a, b) =>
          a.startsWith("q") && b.startsWith("q") &&
            a.dropRight(1) == b.dropRight(1) }
        println(s"""{"typo_ladder": {"vocab": $v, """ +
          s""""cap": ${cap.map(_.toString).getOrElse("null")}, """ +
          s""""sec": ${MiniJson.num(sec, 2)}, "pairs": ${found.length}, """ +
          s""""planted_found": $plantedFound, """ +
          s""""planted_total": $planted}}""")
      }
    }
    spark.stop()
  }
}
