package graft

import org.apache.spark.sql.functions._

/** Diagnostic main for the two round-15 scale fixes, measuring each A/B
  * at growing synthetic multipliers (the j18/RangeLadder discipline:
  * never assert a scale claim the ladder didn't time):
  *
  *  1. j85's vocabulary joins — pinned broadcast(c1) vs unhinted (AQE
  *     decides). The ladder grows the VOCABULARY (the quantity Heaps'
  *     law grows with corpus size) while the probe side stays fixed, and
  *     times the unigram lookup join both ways. The point recorded: the
  *     hinted and unhinted forms cost the same at every rung that fits
  *     (AQE re-broadcasts the measured-small build on its own), while
  *     the hint's driver-collect grows linearly with vocab — i.e. the
  *     hint buys nothing locally and is the only part that breaks at
  *     10^8-10^9 types. Checksums must match between forms.
  *
  *  2. j89's triangle orientation — id-ordered vs degree-ordered wedge
  *     generation on a planted hot-vertex graph (a mid-id hub with m/2
  *     lower-id and m/2 higher-id neighbors, the id-orientation worst
  *     case, over a sparse random background). Wedge counts and
  *     enumeration wall are measured per rung: id-ordering's hub wedges
  *     grow (m/2)^2 while degree-ordering's stay background-bounded; the
  *     triangle sets must be identical.
  *
  * Usage: runMain graft.SkewLadder [mult ...] (default 1 2 4)
  */
object SkewLadder {

  def main(args: Array[String]): Unit = {
    val mults = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 2, 4)
    val spark = LocalSession.build()
    import spark.implicits._

    // ---- 1. j85 vocab join: hinted broadcast vs AQE-decided ----
    mults.foreach { m =>
      val v = 1000000L * m
      // vocab-keyed count table (the c1 shape) and a fixed probe side
      val c1 = spark.range(v).select(concat(lit("w"), col("id")).as("b"),
        (pmod(hash(col("id")), lit(1000)) + 1).cast("long").as("n1"))
      val probes = spark.range(2000000L).select(
        concat(lit("w"), pmod(hash(col("id"), lit(7)), lit(v))).as("b"))
      def score(vocab: org.apache.spark.sql.DataFrame) =
        probes.join(vocab, Seq("b"), "left")
          .agg(sum(coalesce(col("n1"), lit(0L))).as("s")).collect()(0)
          .getLong(0)
      val t0 = System.nanoTime()
      val sHint = score(broadcast(c1))
      val hintSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val sFree = score(c1)
      val freeSec = (System.nanoTime() - t1) / 1e9
      require(sHint == sFree, s"join forms disagree: $sHint vs $sFree")
      println(s"""{"j85_vocab_ladder": {"vocab": $v, "probes": 2000000, """ +
        s""""broadcast_hint_sec": ${MiniJson.num(hintSec, 2)}, """ +
        s""""unhinted_sec": ${MiniJson.num(freeSec, 2)}}}""")
    }

    // ---- 2. j89 orientation: id-ordered vs degree-ordered wedges ----
    mults.foreach { m =>
      val hubDeg = 2000L * m
      val hub = hubDeg / 2 // mid-id hub: half the leaves on each side
      val nBg = 20000L * m
      val star = spark.range(hubDeg).select(
        when(col("id") < hub, col("id")).otherwise(col("id") + 1).as("a"))
        .select(least(col("a"), lit(hub)).as("u"),
          greatest(col("a"), lit(hub)).as("v"))
      // sparse random background among non-hub ids ABOVE the star range
      // (keeps the hub's degree exactly hubDeg and adds real triangles)
      val bg = spark.range(nBg).select(
        (pmod(hash(col("id"), lit(3)), lit(nBg / 2)) + hubDeg + 2).as("x"),
        (pmod(hash(col("id"), lit(4)), lit(nBg / 2)) + hubDeg + 2).as("y"))
        .filter(col("x") =!= col("y"))
        .select(least(col("x"), col("y")).as("u"),
          greatest(col("x"), col("y")).as("v"))
        .distinct()
      val e = Q.truncateLineage(
        star.unionAll(bg).withColumn("jac", lit(0.9375)))
      // id-ordered wedges (the pre-fix shape)
      val t0 = System.nanoTime()
      val idW = e.alias("ab")
        .join(e.alias("bc"), col("ab.v") === col("bc.u")).count()
      val idSec = (System.nanoTime() - t0) / 1e9
      // degree-ordered wedges (the fixed shape)
      val o = Q.truncateLineage(graft.queries.LlmOps.orientEdges(e))
      val t1 = System.nanoTime()
      val degW = o.alias("e1")
        .join(o.alias("e2"),
          col("e1.u") === col("e2.u") &&
            (col("e1.dv") < col("e2.dv") ||
              (col("e1.dv") === col("e2.dv") &&
                col("e1.v") < col("e2.v")))).count()
      val degSec = (System.nanoTime() - t1) / 1e9
      // both orientations must enumerate the same triangles
      val t2 = System.nanoTime()
      val triDeg = graft.queries.LlmOps.triangleEnum(e)
      val nTri = triDeg.count()
      val triSec = (System.nanoTime() - t2) / 1e9
      val triId = e.alias("ab")
        .join(e.alias("bc"), col("ab.v") === col("bc.u"))
        .join(e.alias("ac"),
          col("ab.u") === col("ac.u") && col("bc.v") === col("ac.v"))
        .select(col("ab.u"), col("ab.v"), col("bc.v")).count()
      require(nTri == triId,
        s"orientations disagree on triangles: $nTri vs $triId")
      println(s"""{"j89_orient_ladder": {"hub_degree": $hubDeg, """ +
        s""""edges_bg": $nBg, "id_wedges": $idW, "deg_wedges": $degW, """ +
        s""""id_wedge_sec": ${MiniJson.num(idSec, 2)}, """ +
        s""""deg_wedge_sec": ${MiniJson.num(degSec, 2)}, """ +
        s""""triangles": $nTri, """ +
        s""""deg_enum_sec": ${MiniJson.num(triSec, 2)}}}""")
    }
    spark.stop()
  }
}
