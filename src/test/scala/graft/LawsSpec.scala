package graft

import graft.functions.{MinHashSignature, Moments, SimHashBands, WelfordStats}
import graft.multimodal.MediaPipeline
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck laws (SURVEY §5.2.4) for the custom function kernels — pure
  * JVM-level properties, no Spark session needed.
  */
object LawsSpec extends Properties("graft") {

  private val doubles = Gen.listOf(Gen.choose(-1e6, 1e6))

  property("welford: merge of split == reduce of whole (mean/m2 stable)") =
    Prop.forAll(doubles, doubles) { (xs, ys) =>
      val whole = (xs ++ ys).foldLeft(WelfordStats.zero)(WelfordStats.reduce)
      val split = WelfordStats.merge(
        xs.foldLeft(WelfordStats.zero)(WelfordStats.reduce),
        ys.foldLeft(WelfordStats.zero)(WelfordStats.reduce))
      val no = WelfordStats.finish(whole)
      val ns = WelfordStats.finish(split)
      val avgO = no.avg.getOrElse(0.0)
      val avgS = ns.avg.getOrElse(0.0)
      val sdO = no.sd.getOrElse(0.0)
      val sdS = ns.sd.getOrElse(0.0)
      no.n == ns.n && no.avg.isDefined == ns.avg.isDefined &&
        no.sd.isDefined == ns.sd.isDefined &&
        math.abs(avgO - avgS) <= 1e-6 * math.max(1.0, math.abs(avgO)) &&
        math.abs(sdO - sdS) <= 1e-6 * math.max(1.0, sdO)
    }

  property("welford: sd is NULL (None) for n <= 1, like stddev_samp") =
    Prop.forAll(Gen.choose(-1e6, 1e6)) { x =>
      WelfordStats.finish(WelfordStats.zero).sd.isEmpty &&
        WelfordStats.finish(WelfordStats.zero).avg.isEmpty &&
        WelfordStats.finish(
          WelfordStats.reduce(WelfordStats.zero, x)).sd.isEmpty &&
        WelfordStats.finish(
          WelfordStats.reduce(WelfordStats.zero, x)).avg.contains(x)
    }

  property("welford: n counts every element") =
    Prop.forAll(doubles) { xs =>
      xs.foldLeft(WelfordStats.zero)(WelfordStats.reduce).n == xs.length
    }

  property("welford: zero is identity for merge") =
    Prop.forAll(doubles) { xs =>
      val m = xs.foldLeft(WelfordStats.zero)(WelfordStats.reduce)
      WelfordStats.merge(m, WelfordStats.zero) == m &&
        WelfordStats.merge(WelfordStats.zero, m) == m
    }

  private def sig(tokens: Seq[String]): Seq[Long] = {
    val arr = new GenericArrayData(
      tokens.map(t => UTF8String.fromString(t)).toArray[Any])
    MinHashSignature(Literal.create(arr, ArrayType(StringType)), 16)
      .eval(null).asInstanceOf[GenericArrayData].toLongArray().toSeq
  }

  private val tokenSets =
    Gen.nonEmptyListOf(Gen.identifier.map(_.take(8))).map(_.distinct)

  property("minhash: permutation-invariant (set semantics)") =
    Prop.forAll(tokenSets) { ts =>
      sig(ts) == sig(scala.util.Random.shuffle(ts))
    }

  property("minhash: signature of a union is elementwise min") =
    Prop.forAll(tokenSets, tokenSets) { (a, b) =>
      val u = sig((a ++ b).distinct)
      sig(a).zip(sig(b)).map(p => math.min(p._1, p._2)) == u
    }

  property("minhash: equal sets collide on every slot") =
    Prop.forAll(tokenSets) { ts => sig(ts) == sig(ts.reverse) }

  // --- SimHash band laws: the two invariants j10's banded equi-join rests
  // on, checked against the SAME (offset, width) constants the query
  // builds its Column expressions from.

  private val sig63 = Gen.choose(0L, Long.MaxValue) // 63-bit nonnegative

  // a signature plus ≤ maxHamming distinct flipped bit positions
  private val nearPair = for {
    a <- sig63
    k <- Gen.choose(0, SimHashBands.maxHamming)
    bits <- Gen.listOfN(k, Gen.choose(0, 62)).map(_.distinct)
  } yield (a, bits.foldLeft(a)((s, i) => s ^ (1L << i)))

  property("simhash bands: partition the 63 bits (signature reconstructs)") =
    Prop.forAll(sig63) { a =>
      SimHashBands.defs.map(_._2).sum == 63 &&
        SimHashBands.defs.indices
          .map(j => SimHashBands.value(a, j) << SimHashBands.defs(j)._1)
          .reduce(_ | _) == a
    }

  property("simhash bands: pigeonhole — Hamming <= 4 always shares a band") =
    Prop.forAll(nearPair) { case (a, b) =>
      java.lang.Long.bitCount(a ^ b) <= SimHashBands.maxHamming &&
        SimHashBands.firstMatch(a, b) >= 0
    }

  property("simhash bands: first-match filter emits each pair exactly once") =
    Prop.forAll(sig63, sig63) { (a, b) =>
      // replicate the query's per-band emission predicate: a (band_idx)
      // candidate row survives iff the band matches AND its index is the
      // first matching one — summed over all bands that must be 1 when any
      // band matches (the pair is emitted once) and 0 when none do
      val emitted = SimHashBands.defs.indices.count(j =>
        SimHashBands.value(a, j) == SimHashBands.value(b, j) &&
          j == SimHashBands.firstMatch(a, b))
      if (SimHashBands.firstMatch(a, b) >= 0) emitted == 1 else emitted == 0
    }

  property("fakeDecode: nonempty payload histogram is normalized") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) {
      bs =>
        val h = MediaPipeline.fakeDecode(bs.toArray)
        h.length == 16 && math.abs(h.sum - 1.0) < 1e-9 && h.forall(_ >= 0.0)
    }

  // ---- j42 bottom-k sampling: the property that makes hashed-priority
  // bottom-k the DISTRIBUTED-correct reservoir — merging per-partition
  // bottom-k's and re-taking the bottom k gives exactly the global
  // bottom-k, for ANY partitioning. Plain sequential reservoir sampling
  // has no such merge. Replicates the query's priority (md5 of
  // 'bk:'||doc_id, hex-string order) in pure JVM code.
  private def bkPriority(id: Long): String = TestSpark.md5Hex(s"bk:$id")

  private def bottomK(ids: Seq[Long], k: Int): Seq[Long] =
    ids.distinct.map(id => (bkPriority(id), id)).sorted.take(k).map(_._2)

  property("bottom-k by hashed priority: merge of partitions == whole") =
    Prop.forAll(
      Gen.listOf(Gen.choose(0L, 100000L)),
      Gen.choose(1, 8), Gen.choose(1, 12)) { (ids0, nParts, k) =>
      val ids = ids0.distinct
      val parts = ids.groupBy(id => math.abs(id.hashCode) % nParts)
        .values.toSeq
      bottomK(parts.flatMap(p => bottomK(p, k)), k) == bottomK(ids, k)
    }

  // ---- KMV distinct sketch (j60 / streaming distinctUsersKmv): the
  // bottom-k merge law above already covers mergeability; these pin the
  // ESTIMATOR's contract — exactness below saturation and a distribution-
  // level error bound past it (5 standard errors of the (K-1)M/tau
  // estimator — a deterministic-seed property, not a flaky statistical
  // test: the hash is fixed, so each generated set has one fixed outcome).
  private def kmvSketch(ids: Seq[Long], k: Int): Seq[String] =
    ids.distinct.map(graft.streaming.StreamOps.kmvHex)
      .distinct.sorted.take(k)

  property("kmv: estimate is EXACT below saturation (sketch = the set)") =
    Prop.forAll(Gen.listOf(Gen.choose(0L, 1000000L))) { ids0 =>
      val ids = ids0.distinct
      val k = ids.size + 1
      graft.streaming.StreamOps.kmvEstimate(kmvSketch(ids, k), k) ==
        ids.size.toLong
    }

  property("kmv: saturated estimate error distribution (deterministic panel)") = {
    // Round 15: the old form drew (n, base) fresh each run under a 5σ
    // bound — and after ~14 rounds of 100-draw runs one draw landed on a
    // genuine 5.2σ estimator-tail outlier (n=338, base=613316: est 561,
    // |err| 223 vs tol 215) and flaked the suite. The estimator is fine;
    // the LAW was a per-draw tail bound on a varying sample. Replace it
    // with what the comment above always claimed it was: a DETERMINISTIC
    // panel (fixed LCG, same 200 cases every run — one fixed outcome) with
    // distribution-level pins: every case within 8σ (a broken estimator is
    // off by orders, not sigmas), the median within 1.5σ (the bulk is
    // tight), and the discovered outlier kept as a named regression case
    // inside 6σ so the tail behavior stays measured, not forgotten.
    val k = 64
    def errSigmas(n: Int, base: Long): Double = {
      val ids = (0 until n).map(i => base + i * 7919L)
      val est = graft.streaming.StreamOps.kmvEstimate(kmvSketch(ids, k), k)
      math.abs(est - n) / (n / math.sqrt(k - 2.0))
    }
    var s = 0x5eed5eedL // fixed seed: the panel never varies run-to-run
    def lcg(): Long = { s = s * 6364136223846793005L + 1442695040888963407L
      s >>> 11 }
    val panel = Seq.fill(200)((200 + (lcg() % 2801).toInt,
      lcg() % 1000001L))
    val sig = panel.map { case (n, b) => errSigmas(n, b) }.sorted
    Prop(sig.last <= 8.0) :| s"max ${sig.last}σ > 8σ" &&
    Prop(sig(sig.size / 2) <= 1.5) :|
      s"median ${sig(sig.size / 2)}σ > 1.5σ" &&
    Prop(errSigmas(338, 613316L) <= 6.0) :|
      "known 5.2σ outlier regressed past 6σ"
  }

  property("kmv: replay/duplicates never move the sketch (set semantics)") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(0L, 100000L))) { ids =>
      kmvSketch(ids ++ ids, 64) == kmvSketch(ids, 64)
    }

  // ---- CountMinSketch Aggregator (j44): the merge law that lets the
  // token stream fold map-side — reducing a whole stream into one sketch
  // equals reducing any split of it and cell-wise-summing the partials.
  import graft.functions.{BkEntry, BkState, BottomK, CmsSketch, CountMinSketch, DocPri}

  private val tokenStream = Gen.listOf(Gen.identifier.map(_.take(6)))

  private def cmsOf(toks: Seq[String]): CmsSketch =
    toks.foldLeft(CountMinSketch.zero)(CountMinSketch.reduce)

  property("cms: merge of split == reduce of whole (cell-for-cell)") =
    Prop.forAll(tokenStream, tokenStream) { (xs, ys) =>
      val whole = cmsOf(xs ++ ys)
      val split = CountMinSketch.merge(cmsOf(xs), cmsOf(ys))
      whole.cells.sameElements(split.cells)
    }

  property("cms: zero is identity for merge") =
    Prop.forAll(tokenStream) { xs =>
      val m = cmsOf(xs)
      CountMinSketch.merge(m, CountMinSketch.zero).cells.sameElements(m.cells) &&
        CountMinSketch.merge(CountMinSketch.zero, m).cells.sameElements(m.cells)
    }

  property("cms: estimate never undercounts the true frequency") =
    Prop.forAll(tokenStream.suchThat(_.nonEmpty)) { xs =>
      val sk = cmsOf(xs)
      xs.distinct.forall { t =>
        CountMinSketch.estimate(sk, t) >= xs.count(_ == t).toLong
      }
    }

  property("cms: every row's cells sum to the stream length") =
    Prop.forAll(tokenStream) { xs =>
      val sk = cmsOf(xs)
      (0 until CountMinSketch.Depth).forall { r =>
        sk.cells.slice(r * CountMinSketch.Width, (r + 1) * CountMinSketch.Width)
          .sum == xs.length.toLong
      }
    }

  // ---- BPE merge-position rule (j56): the relational formulation picks
  // merge positions with gaps-and-islands parity (candidate runs, merge at
  // even offsets from the run start). The law: those positions are EXACTLY
  // the greedy leftmost non-overlapping scan's — on any symbol sequence
  // and any pair, including the overlapping-candidate chains ('aaa' under
  // (a,a)) the parity rule exists to resolve.
  private val symSeq = Gen.listOf(Gen.oneOf("a", "b", "c"))
  private val symPair = for {
    x <- Gen.oneOf("a", "b", "c"); y <- Gen.oneOf("a", "b", "c")
  } yield (x, y)

  private def greedyMerges(
      s: List[String], a: String, b: String): Set[Int] = {
    var i = 0
    val out = scala.collection.mutable.Set.empty[Int]
    while (i < s.length - 1) {
      if (s(i) == a && s(i + 1) == b) { out += i; i += 2 } else i += 1
    }
    out.toSet
  }

  private def parityMerges(
      s: List[String], a: String, b: String): Set[Int] = {
    val cand = s.indices.dropRight(1)
      .filter(i => s(i) == a && s(i + 1) == b)
    // group consecutive candidates into runs (gaps-and-islands: i minus
    // candidate ordinal is constant within a run), keep even offsets
    cand.zipWithIndex.groupBy { case (i, rn) => i - rn }
      .values.flatMap { run =>
        val start = run.map(_._1).min
        run.map(_._1).filter(i => (i - start) % 2 == 0)
      }.toSet
  }

  property("bpe: parity-rule merge positions == greedy leftmost scan") =
    Prop.forAll(symSeq, symPair) { case (s, (a, b)) =>
      greedyMerges(s, a, b) == parityMerges(s, a, b)
    }

  // ---- HDR-histogram quantile sketch (d16): merge is cell-wise sum (the
  // CMS shape), and the cell function is an exact integer bucketing whose
  // lower bound must bracket every observation within 1/16 relative error
  // — the guarantee the d16 quantile estimates inherit.
  import graft.functions.{HdrHistogram, HdrSketch}

  private val longStream = Gen.listOf(Gen.choose(0L, 1L << 40))

  private def hdrOf(vs: Seq[Long]): HdrSketch =
    vs.foldLeft(HdrHistogram.zero)(HdrHistogram.reduce)

  property("hdr: merge of split == reduce of whole (cell-for-cell)") =
    Prop.forAll(longStream, longStream) { (xs, ys) =>
      val whole = hdrOf(xs ++ ys)
      val split = HdrHistogram.merge(hdrOf(xs), hdrOf(ys))
      whole.cells.sameElements(split.cells)
    }

  property("hdr: zero is identity for merge") =
    Prop.forAll(longStream) { xs =>
      val m = hdrOf(xs)
      HdrHistogram.merge(m, HdrHistogram.zero).cells.sameElements(m.cells) &&
        HdrHistogram.merge(HdrHistogram.zero, m).cells.sameElements(m.cells)
    }

  property("hdr: cells count every observation exactly once") =
    Prop.forAll(longStream) { xs =>
      hdrOf(xs).cells.sum == xs.length.toLong
    }

  property("hdr: lower bound brackets v within 1/16 relative error") =
    Prop.forAll(Gen.choose(0L, Long.MaxValue)) { v =>
      val c = HdrHistogram.cellOf(v)
      val lb = HdrHistogram.lowerBound(c)
      // lb ≤ v and v < lb·17/16 (+1 covers the width-1 small cells);
      // compare in BigInt — lb·17 overflows a long near Long.MaxValue
      lb <= v && BigInt(v) < (BigInt(lb) * 17) / 16 + 1
    }

  property("hdr: cell index is monotone in v (order-preserving buckets)") =
    Prop.forAll(Gen.choose(0L, 1L << 50), Gen.choose(0L, 1L << 50)) {
      (a, b) =>
        val (lo, hi) = (math.min(a, b), math.max(a, b))
        HdrHistogram.cellOf(lo) <= HdrHistogram.cellOf(hi)
    }

  // ---- HyperLogLog Aggregator (j47/j48): merge is element-wise max, so
  // it is not just mergeable but IDEMPOTENT — re-merging the same partial
  // (a retried/speculated task) cannot change the sketch, the property
  // that makes the register file safe under at-least-once execution.
  import graft.functions.{HllSketch, HyperLogLog}

  private def hllOf(toks: Seq[String]): HllSketch =
    toks.foldLeft(HyperLogLog.zero)(HyperLogLog.reduce)

  property("hll: merge of split == reduce of whole (register-for-register)") =
    Prop.forAll(tokenStream, tokenStream) { (xs, ys) =>
      val whole = hllOf(xs ++ ys)
      val split = HyperLogLog.merge(hllOf(xs), hllOf(ys))
      whole.registers.sameElements(split.registers)
    }

  property("hll: merge is idempotent (retry/speculation-safe)") =
    Prop.forAll(tokenStream) { xs =>
      val m = hllOf(xs)
      HyperLogLog.merge(m, m).registers.sameElements(m.registers)
    }

  property("hll: zero is identity for merge") =
    Prop.forAll(tokenStream) { xs =>
      val m = hllOf(xs)
      HyperLogLog.merge(m, HyperLogLog.zero).registers
        .sameElements(m.registers) &&
        HyperLogLog.merge(HyperLogLog.zero, m).registers
          .sameElements(m.registers)
    }

  property("hll: duplicates never move the sketch (set semantics)") =
    Prop.forAll(tokenStream) { xs =>
      hllOf(xs ++ xs).registers.sameElements(hllOf(xs.distinct).registers)
    }

  property("hll: estimate within 2x of true distinct (6.5% std error)") =
    Prop.forAll(tokenStream.suchThat(_.distinct.size >= 20)) { xs =>
      val n = xs.distinct.size.toDouble
      val e = HyperLogLog.estimate(hllOf(xs))
      e >= n / 2 && e <= n * 2
    }

  // ---- BottomK Aggregator (j45): same merge law as the pure-JVM bottom-k
  // above, but over the Aggregator's actual buffer type — merging
  // per-partition bounded heaps and re-taking k equals folding the whole
  // stream through one heap.
  private val docPris = Gen.listOf(Gen.choose(0L, 100000L)).map(ids =>
    ids.distinct.map(id => DocPri("s", id, bkPriority(id))))

  private def bkOf(agg: BottomK, xs: Seq[DocPri]): BkState =
    xs.foldLeft(agg.zero)(agg.reduce)

  property("bottomk aggregator: merge of split == reduce of whole") =
    Prop.forAll(docPris, docPris, Gen.choose(1, 12)) { (xs, ys, k) =>
      // NO cross-list dedup: the law must hold for multisets — Spark can
      // deliver the same row to reduce on one side and merge from another
      // under task retry/speculation, so duplicate doc_ids across partials
      // are a real input shape, not a generator artifact
      val agg = new BottomK(k)
      agg.merge(bkOf(agg, xs), bkOf(agg, ys)) == bkOf(agg, xs ++ ys)
    }

  property("bottomk aggregator: merge with forced-overlap partials") =
    Prop.forAll(docPris, docPris, Gen.choose(1, 12)) { (xs, ys0, k) =>
      // ys repeats half of xs — the guaranteed-duplicate shape a
      // speculative retry produces; pins merge semantics under duplicates
      val ys = ys0 ++ xs.take(xs.length / 2)
      val agg = new BottomK(k)
      agg.merge(bkOf(agg, xs), bkOf(agg, ys)) == bkOf(agg, xs ++ ys)
    }

  property("bottomk aggregator: matches the window-sort oracle") =
    Prop.forAll(docPris, Gen.choose(1, 12)) { (xs, k) =>
      val agg = new BottomK(k)
      bkOf(agg, xs).entries ==
        xs.map(x => BkEntry(x.pri, x.doc_id))
          .sortBy(e => (e.pri, e.docId)).take(k)
    }

  property("bottomk aggregator: buffer never exceeds k entries") =
    Prop.forAll(docPris, Gen.choose(1, 12)) { (xs, k) =>
      val agg = new BottomK(k)
      xs.scanLeft(agg.zero)(agg.reduce).forall(_.entries.size <= k)
    }

  // ---- MiniJson (feeds Bench's round-over-round sweep diff) ----

  private val jsonString: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.oneOf("\"quoted\"", "back\\slash", "new\nline", "tab\there",
      "ctrlchar", "", "sf0.1", "a,b:{c}"))
  private val jsonLeaf: Gen[Any] = Gen.oneOf(
    jsonString.map(s => s: Any),
    Gen.choose(-1e9, 1e9).map(d => d: Any),
    Gen.oneOf(true, false).map(b => b: Any),
    Gen.const(null: Any))
  private def jsonValue(depth: Int): Gen[Any] =
    if (depth <= 0) jsonLeaf
    else Gen.frequency(
      3 -> jsonLeaf,
      1 -> Gen.mapOf(Gen.zip(Gen.alphaNumStr, jsonValue(depth - 1)))
        .map(m => m: Any),
      1 -> Gen.listOf(jsonValue(depth - 1)).map(l => l: Any))
  // serialize through the PRODUCTION write half (MiniJson.jstr/obj — the
  // functions Bench's artifact line is built with), so this property
  // guards the real escaping rather than a copy that could drift
  private def ser(v: Any): String = v match {
    case m: Map[_, _] => MiniJson.obj(m.asInstanceOf[Map[String, Any]]
      .toSeq.map { case (k, x) => k -> ser(x) })
    case l: List[_] => l.map(ser).mkString("[", ",", "]")
    case s: String => MiniJson.jstr(s)
    case d: Double => d.toString
    case b: Boolean => b.toString
    case null => "null"
  }

  property("minijson: parse is a left inverse of the artifact serializer") =
    Prop.forAll(jsonValue(3)) { v => MiniJson.parse(ser(v)) == v }

  property("minijson: dig walks nested maps and misses safely") =
    Prop.forAll(Gen.alphaNumStr, jsonValue(2)) { (k, v) =>
      val nested = Map("parsed" -> Map("sweep" -> Map(k -> v)))
      MiniJson.dig(nested, "parsed", "sweep", k) == Some(v) &&
        MiniJson.dig(nested, "parsed", "missing", k).isEmpty &&
        MiniJson.dig("not a map", "parsed").isEmpty
    }

  property("planhash: partition count strips through nested float-key wrapping") =
    Prop.forAll(Gen.choose(1, 4096)) { p =>
      // Spark renders a float/double hash key with TWO paren levels —
      // knownfloatingpointnormalized(normalizenanandzero(col#)) — and the
      // partition count must still normalize away (it tracks CPUS, not
      // plan shape); same for plain and one-level-cast keys
      val plans = Seq(
        s"Exchange hashpartitioning(knownfloatingpointnormalized(" +
          s"normalizenanandzero(sim#12)), $p)",
        s"Exchange hashpartitioning(cast(doc_id#3 as string), $p)",
        s"Exchange rangepartitioning(doc_id#3 ASC NULLS FIRST, $p)")
      plans.forall { pl =>
        val n = PlanHash.normalize(pl, "/d")
        n.endsWith(", <P>)") && !n.contains(s", $p)")
      }
    }

  property("minijson: num stays dot-decimal under a comma-decimal locale") =
    Prop.secure {
      val old = java.util.Locale.getDefault
      try {
        java.util.Locale.setDefault(java.util.Locale.GERMANY)
        // under de_DE the f-interpolator emits "0,940" (invalid JSON);
        // num must stay locale-independent
        MiniJson.num(0.94, 3) == "0.940" &&
          MiniJson.num(-1.5, 2) == "-1.50" &&
          f"${0.94}%.3f" == "0,940" // the failure mode num exists to avoid
      } finally java.util.Locale.setDefault(old)
    }

  // ---- WinnowFingerprint: the native rolling-hash expression vs an
  // independent positional reference (the O(n·k) polynomial the oracle
  // uses — NOT the expression's own recurrence), on random ASCII text.
  private def winnowRef(text: String, k: Int, w: Int): Seq[Long] = {
    val B = 257L; val M = 1000000007L
    val p = text.length - k + 1
    if (p < w) return Seq.empty
    val hs = (0 until p).map { i =>
      (0 until k).foldLeft(0L)((h, j) =>
        // positional: Σ c_j · B^(k-1-j), folded as Horner for clarity —
        // still independent of the rolling subtract-shift-add recurrence
        (h * B + text.charAt(i + j)) % M)
    }
    val mins = (0 to p - w).map(i => hs.slice(i, i + w).min)
    mins.distinct
  }

  private def winnowExpr(text: String, k: Int, w: Int): Seq[Long] =
    graft.functions.WinnowFingerprint(
      Literal(UTF8String.fromString(text), StringType), k, w)
      .eval(null).asInstanceOf[GenericArrayData].toLongArray().toSeq

  private val asciiText = Gen.chooseNum(0, 120).flatMap(n =>
    Gen.listOfN(n, Gen.frequency(
      9 -> Gen.alphaLowerChar, 1 -> Gen.const(' '))).map(_.mkString))

  property("winnow: rolling recurrence == positional polynomial, all windows") =
    Prop.forAll(asciiText, Gen.choose(2, 10), Gen.choose(1, 6)) { (t, k, w) =>
      winnowExpr(t, k, w) == winnowRef(t, k, w)
    }

  property("winnow: short input yields the empty fingerprint set, never throws") =
    Prop.forAll(Gen.choose(0, 12), Gen.choose(2, 10), Gen.choose(1, 6)) {
      (n, k, w) =>
        val t = "a" * n
        val out = winnowExpr(t, k, w)
        n - k + 1 >= w || out.isEmpty
    }

  property("winnow: fingerprints are k-gram hash values actually present") =
    Prop.forAll(asciiText, Gen.choose(2, 8)) { (t, k) =>
      val w = 3
      val p = t.length - k + 1
      p < w || {
        val B = 257L; val M = 1000000007L
        val all = (0 until p).map(i => (0 until k).foldLeft(0L)((h, j) =>
          (h * B + t.charAt(i + j)) % M)).toSet
        winnowExpr(t, k, w).forall(all.contains)
      }
    }
}
