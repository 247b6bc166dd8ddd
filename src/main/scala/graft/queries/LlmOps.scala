package graft.queries

import graft.{Q, Tables}
import graft.functions.DotProduct
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY §2 category J — LLM-data-pipeline operators: deduplication (exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine), similarity
  * search (brute-force + LSH-banded scale path), text analysis
  * (quality/lang-id heuristics, stats, fingerprinting), multimodal columns.
  *
  * Scale stances (100 TB):
  *  - MinHash/LSH banding IS the linear-scale path for near-dup: candidates
  *    come from equi-joins on (band, signature) buckets, never from an O(n²)
  *    pair scan; the exact-Jaccard verify only touches banded candidates.
  *  - The exhaustive pair formulations (j9/j11) are intentionally restricted
  *    to bounded slices (one language / the probe set) and exist as the
  *    correctness baseline the sketch paths are judged against.
  *  - All hash seeds are fixed constants (SURVEY §5.3 rule 6).
  */
object LlmOps {

  /** 5-char shingle set of `text` as a SQL expression (shared by j2/j13).
    * Spark `sequence(1, n)` DESCENDS for n < 1 (sequence(1,0) = [1,0] —
    * never empty), so the empty case needs an explicit CASE branch to agree
    * with DuckDB's empty generate_series on sub-5-char texts.
    */
  private val ShingleExpr =
    """CASE WHEN length(text) >= 5
       THEN array_distinct(transform(sequence(1, length(text)-4),
            i -> substring(text, i, 5)))
       ELSE array() END"""

  /** Canonical text normalization (shared by j21/j26): lowercase, strip
    * non-alphanumerics, collapse whitespace runs, trim. Spark's
    * regexp_replace is global by default; the DuckDB form needs 'g'.
    */
  private def cleanCol(c: org.apache.spark.sql.Column) =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "),
      " +", " "))
  private val CleanSql =
    """trim(regexp_replace(regexp_replace(lower(text),
       '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"""

  /** Stopword list shared by j7 and the j83 funnel (SQL tuple literal —
    * identical text in the Spark expr and the DuckDB oracle).
    */
  private[graft] val FunnelStops = "('the','a','of','and','to','in')"

  /** j83's shared verdict seam — per-doc quality features + the FIRST-FAIL
    * rule attribution, used verbatim by the batch funnel and the streaming
    * funnel monitor so the two cannot fork. The repetition statistic (max
    * token frequency) is computed INSIDE the row as a sorted-run fold:
    * array_sort puts equal tokens adjacent, one aggregate() pass tracks the
    * longest run — exact integer, no explode, no (doc, tok) shuffle. Input
    * must carry (doc_id, text, source, n_chars); output adds `verdict`.
    */
  private[graft] def funnelVerdicts(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("nt", size(col("toks")).cast("long"))
      .withColumn("nsym",
        length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("long"))
      .withColumn("nstop",
        expr(s"size(filter(toks, x -> x IN $FunnelStops))").cast("long"))
      .withColumn("topc", expr(
        """aggregate(array_sort(toks),
             named_struct('prev', '', 'run', 0L, 'best', 0L),
             (acc, t) -> named_struct(
               'prev', t,
               'run', IF(t = acc.prev, acc.run + 1L, 1L),
               'best', GREATEST(acc.best,
                 IF(t = acc.prev, acc.run + 1L, 1L))),
             acc -> acc.best)"""))
      .withColumn("verdict",
        when(col("nt") < 20, "fail_short")
          .when(col("n_chars") > 450, "fail_long")
          .when(col("n_chars") - col("nt") + 1 > col("nt") * 5,
            "fail_word_len")
          .when(col("nsym") * 10 > col("n_chars"), "fail_symbol")
          .when(col("nstop") === 0, "fail_stopword")
          .when(col("topc") * 5 > col("nt"), "fail_repetition")
          .otherwise("pass"))
      .drop("toks", "nt", "nsym", "nstop", "topc")

  /** j86's quasi-identifier seam — the release-visible attribute tuple,
    * shared by the batch audit and the streaming monitor (the
    * funnelVerdicts discipline: one definition, two surfaces).
    */
  private[graft] def qiTuples(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.select(col("lang"), col("source"),
      expr("n_chars div 200").as("len_bucket"))

  /** j91/j92's shared shingling seam — (doc_id, g) token-trigram rows from
    * a (doc_id, ts: array<string>) projection (the qiTuples discipline:
    * one definition, two surfaces — j92's novelty is DEFINED against
    * j91's vocabulary unit, so they must not drift apart).
    */
  private[graft] def docTrigrams(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.where(size(col("ts")) >= 3)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(ts) - 2),
             i -> concat_ws(' ', element_at(ts, i),
                    element_at(ts, i + 1),
                    element_at(ts, i + 2)))""")).as("g"))

  private val NumHashes = 32
  // 4 bands × 8 rows: LSH S-curve threshold (1/b)^(1/r) ≈ 0.84, just under
  // the τ=0.9 verify threshold. Measured on this corpus: r=2 bands collide
  // for ~half of ALL pairs (background J ≈ 0.2–0.3 from the tiny
  // vocabulary), flooding the exact-verify stage; r=8 keeps candidates to
  // the true near-dup clusters while missing a J=0.99 pair with
  // P ≈ (1-0.99⁸)⁴ ≈ 4e-5 (recall verified exactly by the oracle + spec).
  private val NumBands = 4
  private val RowsPerBand = 8

  /** In-order double fold dot product. `graft_dot` is the native codegen'd
    * Catalyst expression (graft.functions.DotProduct) — bit-identical to the
    * interpreted `aggregate(zip_with(...))` fold and to DuckDB's
    * `list_reduce`, but it stays inside whole-stage codegen.
    */
  private def dot(a: String, b: String): String = s"graft_dot($a, $b)"

  /** Lineage truncation between j13 supersteps and for shared subtrees
    * (j10's signature table, j29's gram set) — see [[graft.Q.truncateLineage]]
    * for the localCheckpoint vs reliable-checkpoint contract.
    */
  private def truncateLineage(
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    graft.Q.truncateLineage(df)

  /** Product-quantization subspace table shared by j63/j64 (Jégou et al.
    * TPAMI'11): the 1e-6 fixed-point vector (j61's quantization) split into
    * 8 contiguous 8-dim integer subvectors. All downstream PQ math is exact
    * BIGINT squared-euclidean, so DuckDB replays codebook assignment
    * bit-for-bit — the j16/j61 oracle trick applied to PQ.
    */
  private def pqSubs(qe: org.apache.spark.sql.DataFrame) =
    qe.select(col("vec_id"), explode(expr(
      """transform(sequence(0, 7),
         m -> named_struct('m', m, 'sub', slice(qv, m * 8 + 1, 8)))"""))
      .as("s"))
      .select(col("vec_id"), col("s.m").as("m"), col("s.sub").as("sub"))

  /** PQ code assignment: per (vector, subspace), the nearest of the 16
    * fixed data-derived subspace centroids (the 16 lowest vec_ids — the
    * j16 fixed-codebook convention, which keeps the oracle exact; a learned
    * per-subspace codebook would come from IvfKMeans.trainExact on the
    * subvectors). Ties to the lower cent_id. Output (vec_id, m, code, d2).
    */
  /** The 8 × 16 subspace codebooks derived from a subspace table (the 16
    * lowest vec_ids — the j16 fixed-codebook convention).
    */
  private[graft] def pqCents(subs: org.apache.spark.sql.DataFrame) =
    subs.filter(col("vec_id") < 16)
      .select(col("m"), col("vec_id").as("cent_id"), col("sub").as("csub"))

  private def pqCodes(subs: org.apache.spark.sql.DataFrame) =
    pqCodesAgainst(subs, pqCents(subs))

  private[graft] def pqCodesAgainst(subs: org.apache.spark.sql.DataFrame,
      cents: org.apache.spark.sql.DataFrame) = {
    // argmin as min(struct(d2, cent_id)) — lexicographic struct-min IS
    // "lowest d2, ties to the lower cent_id" (the oracle's row_number
    // ORDER BY d2, cent_id), but as a map-side-combining aggregate: the
    // 16 candidate rows per (vector, subspace) collapse IN-TASK (they are
    // produced by the same broadcast-join task), so the shuffle carries
    // one row per (vector, subspace). Measured: the whole encode dropped
    // 19.6 s → 4.3 s at 200k vectors when the window became this
    // aggregate, and the gap is the point at 100 TB: a window must
    // shuffle and sort 16× the rows it keeps.
    // PRECONDITION (here and at ivfCellAssign): inputs are fixed-width
    // NON-NULL integer arrays (j61's quantize of the synthesized 64-dim
    // embeddings guarantees it). graft_d2 returns NULL on a null/ragged
    // input, and Spark's struct ordering sorts a null first field FIRST —
    // a null-d2 row would WIN this min while the DuckDB oracle's
    // ORDER BY d2 ASC sorts NULLS LAST; a malformed-vector corpus must be
    // length/null-validated (j25's schema-contract pattern) before PQ.
    subs.join(broadcast(cents), Seq("m"))
      .withColumn("d2",
        expr(graft.operators.IvfKMeans.d2Expr("sub", "csub")))
      .groupBy("vec_id", "m")
      .agg(min(struct(col("d2"), col("cent_id"))).as("best"))
      .select(col("vec_id"), col("m"),
        col("best.cent_id").as("code"), col("best.d2").as("d2"))
  }

  /** j63's output shape from a (vec_id, m, code, d2) code table: the
    * dash-joined code string in subspace order + total integer
    * reconstruction error. THE single definition — the registered j63 and
    * the streaming [[pqEncodeBatch]] both call it, so an edit here cannot
    * silently fork the batch and streaming encoders.
    */
  private[graft] def pqCodeAgg(codes: org.apache.spark.sql.DataFrame) =
    codes.groupBy("vec_id")
      .agg(expr("""concat_ws('-',
             transform(array_sort(collect_list(struct(m, code))),
               x -> cast(x.code as string)))""").as("pq_code"),
        sum(col("d2")).as("err_q"))

  /** The 16-row integer IVF coarse codebook of a quantized collection. */
  private[graft] def ivfCents(qe: org.apache.spark.sql.DataFrame) =
    qe.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("qv").as("cvec"))

  /** Nearest-coarse-cell assignment (vec_id, cell) — min(struct) argmin,
    * ties to the lower cent_id; shared by j64 and [[pqEncodeBatch]].
    */
  private[graft] def ivfCellAssign(qe: org.apache.spark.sql.DataFrame,
      icents: org.apache.spark.sql.DataFrame) =
    qe.crossJoin(broadcast(icents))
      .withColumn("cd2",
        expr(graft.operators.IvfKMeans.d2Expr("qv", "cvec")))
      .groupBy("vec_id")
      .agg(min(struct(col("cd2"), col("cent_id"))).as("best"))
      .select(col("vec_id"), col("best.cent_id").as("cell"))

  /** PQ-encode + IVF-cell-assign arbitrary incoming vectors against the
    * STATIC collection's codebooks — the index-maintenance operation: new
    * vectors arriving later get the same codes/cell they would have gotten
    * in the original build (codebooks are fixed once trained; re-deriving
    * them from the delta would silently fork the index). Output per
    * vector: (vec_id, pq_code, err_q, cell), unordered (the index-append
    * sink is order-insensitive; a sort here would cost every micro-batch
    * a range shuffle). PRECONDITION: vec_id unique within `vecs` — an
    * index ingest stream is keyed, and two versions of one id in the same
    * batch would min-merge per subspace into a code matching neither
    * version (an upsert stream must dedup to latest-wins first, j54's
    * job). Reused verbatim by
    * [[graft.streaming.StreamOps.pqEncodeStream]] per micro-batch, so
    * batch/stream parity holds by construction (and is differential-tested
    * in StreamingSpec). At scale the two codebook subtrees below are
    * yesterday's persisted 128-row / 16-row tables, touching no raw data.
    */
  private[graft] def pqEncodeBatch(vecs: org.apache.spark.sql.DataFrame,
      staticEmb: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val (cents, icents) = pqCodebooks(staticEmb)
    pqEncodeAgainst(vecs, cents, icents)
  }

  /** Derive the two fixed codebook tables from the static collection: the
    * 128-row PQ subspace codebook and the 16-row IVF coarse codebook. A
    * long-lived consumer (the streaming encoder) calls this ONCE and
    * truncates/persists the outputs — re-deriving per micro-batch would
    * scan the static collection twice per batch for tables that never
    * change.
    */
  private[graft] def pqCodebooks(staticEmb: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    graft.functions.SquaredDistance.register(staticEmb.sparkSession)
    val qeStatic = graft.operators.IvfKMeans.quantize(staticEmb)
    (pqCents(pqSubs(qeStatic)), ivfCents(qeStatic))
  }

  /** The per-batch half of [[pqEncodeBatch]]: encode `vecs` against
    * already-derived codebook tables.
    */
  private[graft] def pqEncodeAgainst(vecs: org.apache.spark.sql.DataFrame,
      cents: org.apache.spark.sql.DataFrame,
      icents: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    graft.functions.SquaredDistance.register(vecs.sparkSession)
    val qv = graft.operators.IvfKMeans.quantize(vecs)
    pqCodeAgg(pqCodesAgainst(pqSubs(qv), cents))
      .join(ivfCellAssign(qv, icents), Seq("vec_id"))
  }

  /** The shared WITH-chain prefix of the j63/j64 oracles: fixed-point
    * vectors → subspace split → subspace codebook → PQ codes, each step the
    * SQL image of [[pqSubs]]/[[pqCodes]]. Every arithmetic output is cast
    * to BIGINT (DuckDB list_sum/sum over BIGINT widens to HUGEINT — the n4
    * round-10 lesson).
    */
  private val PqCodesSql =
    """q AS (
         SELECT vec_id, list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
         FROM embeddings),
       subs AS (
         SELECT vec_id, u.m AS m,
                array_slice(qv, u.m * 8 + 1, u.m * 8 + 8) AS sub
         FROM q, UNNEST(generate_series(0, 7)) AS u(m)),
       pcents AS (
         SELECT m, vec_id AS cent_id, sub AS csub FROM subs
         WHERE vec_id < 16),
       scored AS (
         SELECT s.vec_id, s.m, c.cent_id,
                CAST(list_sum(list_transform(generate_series(1, 8),
                  i -> (s.sub[i] - c.csub[i]) * (s.sub[i] - c.csub[i])))
                  AS BIGINT) AS d2
         FROM subs s JOIN pcents c ON s.m = c.m),
       codes AS (
         SELECT vec_id, m, cent_id AS code, d2 FROM (
           SELECT vec_id, m, cent_id, d2,
                  row_number() OVER (PARTITION BY vec_id, m
                    ORDER BY d2, cent_id) AS ark
           FROM scored) WHERE ark = 1)"""

  /** Per-doc distinct 8-grams of `text` as a pipelined explode, used by
    * the decontamination probes (j29/j43). Dedup happens INSIDE the row
    * (array_distinct) — semantically identical to DISTINCT (doc_id, g8)
    * because the dedup key includes the doc — so the gram stream stays a
    * pure map over the documents scan: no corpus-wide distinct shuffle
    * and no materialized gram table. At 500k docs / 41.5M grams the
    * materialize-and-checkpoint shape spent 128 s building the table
    * before probing it; this shape streams the same grams through the
    * broadcast probes as they are generated. At 100 TB the training gram
    * table is the one thing you must never materialize. */
  private def docGrams8(
      dd: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = dd
    .select(col("doc_id"), split(col("text"), " ").as("t"))
    .filter(size(col("t")) >= 8)
    .select(col("doc_id"), explode(expr(
      """array_distinct(transform(sequence(1, size(t) - 7),
         i -> concat_ws(' ', slice(t, i, 8))))""")).as("g8"))

  private def duckDot(a: String, b: String): String =
    s"""list_reduce(list_transform(generate_series(1, 64),
        i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (x, y) -> x + y)"""

  // ---- SimHash pieces (63-bit, md5-hex-derived so both engines agree):
  // bits 0..31 vote on md5(tok)'s 32 hex chars, bits 32..62 on
  // md5('x' || tok) — a second independent hash; 63 bits keeps the
  // signature positive in a signed BIGINT in both engines. Width matters
  // for LSH: 32-bit signatures leave 6–7-bit bands (≤128 keys), which
  // saturate and degrade the band join toward n²/128; 12–13-bit bands
  // give 4k–8k keys each and room to grow with the corpus.
  private val simhashBitsSql = (0 until 63).map { i =>
    val h = if (i < 32) "md5(tok)" else "md5('x' || tok)"
    val pos = if (i < 32) i + 1 else i - 31
    s"SUM(CASE WHEN substring($h, $pos, 1) >= '8' THEN 1 ELSE -1 END) AS b$i"
  }.mkString(", ")
  private val simhashValSql = (0 until 63).map(i =>
    s"(CASE WHEN b$i > 0 THEN (1::BIGINT << $i) ELSE 0 END)").mkString(" + ")

  /** Word 3-gram posting-list scaffold (shared by j9/j24): distinct 3-gram
    * sets per `lang='en'` doc, per-doc set sizes, and the pairwise
    * intersection counts from the inverted-index equi-join on the gram —
    * linear in Σ df(gram)², never an n² pair scan. The CASE guard matters:
    * Spark `sequence(1, n)` DESCENDS for n < 1 and `element_at` with index
    * 0 throws under ANSI, so sub-3-token docs map to an empty array (which
    * explode drops), matching the oracle's `len >= 3` filter.
    */
  private def ngramPairCounts(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    // lineage-truncated: the gram table feeds both inverted-index join
    // sides AND the per-doc sizes — without truncation the tokenize +
    // explode re-executes per reference (4 fact scans, plan-verified)
    val ng = truncateLineage(Tables.documentsSpread(s, d)
      .filter(col("lang") === "en")
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(toks) >= 3
           THEN array_distinct(transform(sequence(1, size(toks)-2),
             i -> concat_ws(' ', element_at(toks, i),
               element_at(toks, i+1), element_at(toks, i+2))))
           ELSE array() END""")).as("g")))
    val sizes = ng.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    ng.alias("x")
      .join(ng.alias("y"),
        col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sa")),
        "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sb")),
        "doc_b")
  }

  /** Banded MinHash signature keys `(doc_id, bk)` from a shingle table.
    *
    * Empty shingle sets are dropped BEFORE signing: `graft_minhash` of an
    * empty array is the constant all-`Long.MaxValue` signature, so every
    * sub-5-char doc would otherwise share all `NumBands` band keys — one
    * degenerate bucket that goes quadratic on a real crawl (billions of
    * tiny docs). Correctness is unchanged: an empty set has Jaccard 0/0
    * (NaN, filtered) against everything, so those docs can never be
    * near-dups anyway. Guarding here covers all three callers (j2's
    * symmetric pairs, j40's asymmetric probe, the streaming probe).
    */
  private def bandKeys(sh: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val mh = sh.filter(size(col("sh")) > 0)
      .withColumn("mh", expr(s"graft_minhash(sh, $NumHashes)"))
    mh.select(col("doc_id"),
      explode(array((0 until NumBands).map(b =>
        struct(lit(b).as("b") +: (0 until RowsPerBand).map(r =>
          col("mh")(RowsPerBand * b + r).as(s"v$r")): _*)): _*)).as("bk"))
  }

  /** Near-dup index over `docs(doc_id, text, ...)`: the lineage-truncated
    * shingle table + its banded signature keys — the shared front half of
    * the near-dup pipelines (j2's symmetric all-pairs, j40's asymmetric
    * probe, and the streaming probe in `StreamOps`). Truncation matters:
    * the shingle table feeds the signature pipeline AND the exact-Jaccard
    * verify side — without it the shingle explode re-executes per
    * reference (4 fact scans, plan-verified). At 100 TB this pair is what
    * a production pipeline PERSISTS — signatures are incremental by
    * construction, so new documents never re-signature the index.
    */
  private[graft] def buildNeardupIndex(docs: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    graft.functions.MinHashSignature.register(docs.sparkSession)
    val sh = truncateLineage(
      docs.select(col("doc_id"), expr(ShingleExpr).as("sh")))
    (sh, bandKeys(sh))
  }

  /** j40's probe, reusable per streaming micro-batch: band the delta docs,
    * equi-join the index band table for candidates, exact-Jaccard verify
    * ≥ 0.9, and emit per matched delta doc its best index match (max
    * Jaccard, min doc_id tie-break) + the match count. The batch j40 query
    * and `StreamOps.neardupProbeStream` both run exactly this code —
    * batch/stream parity is by construction (and differential-tested).
    */
  private[graft] def probeNeardupIndex(
      deltaDocs: org.apache.spark.sql.DataFrame,
      index: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame))
      : org.apache.spark.sql.DataFrame = {
    graft.functions.MinHashSignature.register(deltaDocs.sparkSession)
    val (shI, bandsI) = index
    val shD = truncateLineage(
      deltaDocs.select(col("doc_id"), expr(ShingleExpr).as("sh")))
    val cand = bandKeys(shD).alias("x")
      .join(bandsI.alias("y"), col("x.bk") === col("y.bk"))
      .select(col("x.doc_id").as("delta_doc"),
        col("y.doc_id").as("index_doc"))
      .distinct()
    val w = Window.partitionBy("delta_doc")
      .orderBy(col("jac").desc, col("index_doc"))
    cand
      .join(shD.select(col("doc_id").as("delta_doc"), col("sh").as("sh_d")),
        "delta_doc")
      .join(shI.select(col("doc_id").as("index_doc"), col("sh").as("sh_i")),
        "index_doc")
      .withColumn("inter", size(array_intersect(col("sh_d"), col("sh_i"))))
      .withColumn("jac", col("inter").cast("double") /
        (size(col("sh_d")) + size(col("sh_i")) - col("inter")))
      .filter(col("jac") >= 0.9)
      .withColumn("rk", row_number().over(w))
      .withColumn("n_matches",
        count(lit(1)).over(Window.partitionBy("delta_doc")))
      .filter(col("rk") === 1)
      .select(col("delta_doc"), col("index_doc").as("best_match"),
        round(col("jac"), 4).as("jaccard"), col("n_matches"))
      .orderBy("delta_doc")
  }

  /** The symmetric shingle+band front for j2: one shingle pass over the
    * whole table (the symmetric all-pairs join filters sides itself).
    */
  private def shingleBands(s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) =
    // parallelism-floored read (Tables.spread): the shingle+MinHash map is
    // the most compute-heavy scan stage in the repo — measured 2.0 s in
    // ONE row-bearing task on this round's single-row-group layout,
    // j2 4.17→1.07 s with the floor
    buildNeardupIndex(Tables.documentsSpread(s, d))

  /** The j2 pipeline up to verified pairs: shingles → fused MinHash
    * signature → banded candidates → exact-Jaccard verify ≥ 0.9.
    */
  private def neardupPairs(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val (sh, bands) = shingleBands(s, d)
    val cand = bands.alias("x")
      .join(bands.alias("y"),
        col("x.bk") === col("y.bk") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val shA = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val shB = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    cand.join(shA, "doc_a").join(shB, "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jac", col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jac") >= 0.9)
      .select(col("doc_a"), col("doc_b"), col("jac"))
  }

  /** Degree-ordered orientation of an undirected pair table
    * `(u, v, jac)` (u < v by doc_id, one row per edge): every edge
    * re-oriented from its LOWER-degree endpoint to its higher, doc_id
    * breaking ties — the Suri & Vassilvitskii (WWW'11) orientation that
    * makes triangle enumeration skew-safe. Why degree and not doc_id:
    * under id-order a hub vertex with a mid-range id keeps up to deg²/4
    * wedges centered on itself (one boilerplate template duplicated 10⁶
    * times at 100 TB = 10¹² wedges from ONE vertex); under degree-order
    * the hub is ≺-maximal, so every hub edge points INTO it and the hub
    * centers zero wedges — out-degrees are bounded by O(√m) (arboricity),
    * so Σ outdeg² is bounded by m^1.5 REGARDLESS of skew. Emits
    * `(u, v, dv, jac)` with (deg_u, u) ≺ (deg_v, v); dv (= v's degree)
    * rides along because the wedge join must order arms by the same
    * (deg, id) rank it oriented with. Cost: one vertex-sized degree
    * aggregate + two id-keyed equi-joins — linear in the edge set.
    */
  private[graft] def orientEdges(pairs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val deg = pairs.select(col("u").as("id"))
      .unionAll(pairs.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    pairs
      .join(deg.select(col("id").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), Seq("v"))
      // input has u < v by id, so a degree TIE keeps the id order
      .withColumn("fwd", col("du") < col("dv") || col("du") === col("dv"))
      .select(
        when(col("fwd"), col("u")).otherwise(col("v")).as("u"),
        when(col("fwd"), col("v")).otherwise(col("u")).as("v"),
        when(col("fwd"), col("dv")).otherwise(col("du")).as("dv"),
        col("jac"))
  }

  /** Triangle enumeration over an undirected near-dup pair table (the
    * j89 body, factored so QueriesSpec can run it on planted fixtures):
    * orient by degree ([[orientEdges]]), build each wedge at its
    * ≺-minimum vertex (arms ordered by the same (deg, id) rank, so every
    * triangle forms exactly one wedge), close with one equi-join against
    * the oriented table — the closing edge of a wedge (v₁ ≺ v₂) is
    * stored exactly as (u = v₁, v = v₂). Output is canonical id order
    * via array_sort, identical to the previous id-oriented enumeration
    * (the oracle and the brute-force spec pin that).
    */
  private[graft] def triangleEnum(pairs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val o = truncateLineage(orientEdges(pairs))
    val wedges = o.alias("e1")
      .join(o.alias("e2"),
        col("e1.u") === col("e2.u") &&
          (col("e1.dv") < col("e2.dv") ||
            (col("e1.dv") === col("e2.dv") && col("e1.v") < col("e2.v"))))
    wedges.join(o.alias("e3"),
        col("e1.v") === col("e3.u") && col("e2.v") === col("e3.v"))
      .select(
        array_sort(array(col("e1.u"), col("e1.v"), col("e2.v"))).as("ids"),
        floor(least(col("e1.jac"), col("e2.jac"), col("e3.jac")) * 10000)
          .cast("long").as("cohesion_bp"))
      .select(col("ids")(0).as("doc_a"), col("ids")(1).as("doc_b"),
        col("ids")(2).as("doc_c"), col("cohesion_bp"))
      .orderBy("doc_a", "doc_b", "doc_c")
  }

  /** Shared DuckDB CTE block producing the exact J ≥ 0.9 near-dup pair set
    * `pairs(doc_a, doc_b, jac)` — the oracle for j2 and the edge set for the
    * j13/j30 cluster oracles. NOT a mirror of the Spark MinHash banding: it
    * is prefix filtering (Bayardo, Ma & Srikant, "Scaling Up All Pairs
    * Similarity Search", WWW'07) — rank each doc's shingles by global
    * document frequency, keep only the first n - ceil(0.9·n) + 1 as the
    * prefix, and candidates must share a prefix shingle. Complete by
    * pigeonhole: a qualifying pair shares ≥ ceil(0.9·n) shingles, more than
    * fit in the n - p suffix — so the exact-Jaccard verify over candidates
    * only loses nothing, yet the n² pair space is never materialized.
    * Validated identical to the exhaustive join at sf0.001 and sf0.01, and
    * feasible at sf0.1 (~6 min vs >30 min exhaustive), which empties the
    * sf0.1 oracle skip list. Length arithmetic is exact integer
    * ((9n+9)//10 = ceil(0.9n); a.n*10 >= b.n*9 is the |a| ≥ 0.9|b| length
    * filter) so a boundary-length pair can't be lost to float rounding.
    */
  private[graft] val NeardupPairsSql: String =
    """sh AS (
      |  SELECT doc_id,
      |         list_distinct(list_transform(generate_series(1, length(text)-4),
      |           i -> substring(text, i, 5))) AS s
      |  FROM documents),
      |ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh),
      |freq AS (SELECT g, count(*) AS df FROM ex GROUP BY g),
      |pref AS (
      |  SELECT doc_id, g, n FROM (
      |    SELECT e.doc_id, e.g, e.n,
      |           row_number() OVER (PARTITION BY e.doc_id
      |                              ORDER BY f.df, e.g) AS rk
      |    FROM ex e JOIN freq f ON e.g = f.g)
      |  WHERE rk <= n - (9 * n + 9) // 10 + 1),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM pref a JOIN pref b
      |    ON a.g = b.g AND a.doc_id < b.doc_id
      |   AND a.n * 10 >= b.n * 9 AND b.n * 10 >= a.n * 9),
      |pairs AS (
      |  SELECT doc_a, doc_b, jac FROM (
      |    SELECT c.doc_a, c.doc_b,
      |           CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) /
      |             (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s)))
      |             AS jac
      |    FROM cand c JOIN sh x ON x.doc_id = c.doc_a
      |                JOIN sh y ON y.doc_id = c.doc_b)
      |  WHERE jac >= 0.9)""".stripMargin

  /** j68/j94's shared oracle CTE stack — quantized vectors, the 4×4 IMI
    * cell assignment, the 64-probe panel, top-3 probed cells and the
    * candidate distances (`ad`). j68's final SELECT ranks `ad`; j94 joins
    * the same ranking against a brute-force top-3 (one definition, two
    * oracles — the NeardupPairsSql discipline).
    */
  private[graft] val ImiSearchCte: String =
    """q AS (
         SELECT vec_id, list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
           AS qv
         FROM embeddings),
       h AS (
         SELECT vec_id, qv[1:32] AS lo, qv[33:64] AS hi FROM q),
       cl AS (
         SELECT vec_id AS cid, lo AS cv FROM h WHERE vec_id < 4),
       ch AS (
         SELECT vec_id AS cid, hi AS cv FROM h WHERE vec_id < 4),
       alo AS (
         SELECT h.vec_id, c.cid,
                CAST(list_sum(list_transform(generate_series(1, 32),
                  i -> (h.lo[i] - c.cv[i]) * (h.lo[i] - c.cv[i])))
                  AS BIGINT) AS d2
         FROM h CROSS JOIN cl c),
       ahi AS (
         SELECT h.vec_id, c.cid,
                CAST(list_sum(list_transform(generate_series(1, 32),
                  i -> (h.hi[i] - c.cv[i]) * (h.hi[i] - c.cv[i])))
                  AS BIGINT) AS d2
         FROM h CROSS JOIN ch c),
       blo AS (
         SELECT vec_id, cid AS cell_lo FROM (
           SELECT vec_id, cid, row_number() OVER (
             PARTITION BY vec_id ORDER BY d2, cid) AS rk
           FROM alo) WHERE rk = 1),
       bhi AS (
         SELECT vec_id, cid AS cell_hi FROM (
           SELECT vec_id, cid, row_number() OVER (
             PARTITION BY vec_id ORDER BY d2, cid) AS rk
           FROM ahi) WHERE rk = 1),
       vcells AS (
         SELECT blo.vec_id, cell_lo * 4 + cell_hi AS cell
         FROM blo JOIN bhi ON blo.vec_id = bhi.vec_id),
       probes AS (
         SELECT vec_id AS probe_id, qv AS pqv FROM q
         WHERE vec_id % 100 = 7 ORDER BY vec_id LIMIT 64),
       pdl AS (
         SELECT p.probe_id, c.cid AS ci,
                CAST(list_sum(list_transform(generate_series(1, 32),
                  i -> (p.pqv[i] - c.cv[i]) * (p.pqv[i] - c.cv[i])))
                  AS BIGINT) AS dl
         FROM probes p CROSS JOIN cl c),
       pdh AS (
         SELECT p.probe_id, c.cid AS cj,
                CAST(list_sum(list_transform(generate_series(1, 32),
                  i -> (p.pqv[i + 32] - c.cv[i])
                       * (p.pqv[i + 32] - c.cv[i])))
                  AS BIGINT) AS dh
         FROM probes p CROSS JOIN ch c),
       pcells AS (
         SELECT probe_id, pcell FROM (
           SELECT pdl.probe_id, pdl.ci * 4 + pdh.cj AS pcell,
                  row_number() OVER (PARTITION BY pdl.probe_id
                    ORDER BY pdl.dl + pdh.dh,
                             pdl.ci * 4 + pdh.cj) AS crk
           FROM pdl JOIN pdh ON pdl.probe_id = pdh.probe_id)
         WHERE crk <= 3),
       cand AS (
         SELECT p.probe_id, v.vec_id FROM vcells v
         JOIN pcells p ON v.cell = p.pcell
         WHERE v.vec_id <> p.probe_id),
       ad AS (
         SELECT cand.probe_id, cand.vec_id,
                CAST(list_sum(list_transform(generate_series(1, 64),
                  i -> (q.qv[i] - pr.pqv[i]) * (q.qv[i] - pr.pqv[i])))
                  AS BIGINT) AS adist
         FROM cand JOIN q ON q.vec_id = cand.vec_id
         JOIN probes pr ON pr.probe_id = cand.probe_id)"""

  /** j53's within-cell τ-pair stage over ANY (vec_id, embedding, cell)
    * assignment — shared by the registered fixed-centroid query and the
    * learned-codebook production variant below, so the two can never
    * drift in pair semantics. The assignment is materialized once (one
    * row per vector) before the self-join.
    */
  private[graft] def semanticPairs(
      assigned: org.apache.spark.sql.DataFrame,
      tau: Double = 0.35): org.apache.spark.sql.DataFrame = {
    val a = truncateLineage(assigned)
    a.select(col("vec_id").as("doc_a"),
        col("embedding").as("ea"), col("cell"))
      .join(a.select(col("vec_id").as("doc_b"),
        col("embedding").as("eb"), col("cell")), "cell")
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("sim", round(expr(dot("ea", "eb")), 6))
      .filter(col("sim") >= tau)
      .select("doc_a", "doc_b")
  }

  /** 10-token chunking shared by j75 and the STREAMING first-occurrence
    * dedup (StreamOps.chunkDedupStream): (doc_id, idx, chunk, ck) rows
    * for every doc with ≥ 10 tokens. One definition, so the batch rewrite
    * and the streaming decision path cannot fork on chunk boundaries.
    * Works unchanged on a streaming DataFrame (pure per-row expressions).
    */
  private[graft] def docChunks(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 10)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, cast(floor(size(toks) / 10) as int) - 1),
           c -> struct(cast(c as bigint) as idx,
                       concat_ws(' ', slice(toks, c * 10 + 1, 10))
                         as chunk))""")).as("ch"))
      .select(col("doc_id"), col("ch.idx").as("idx"),
        col("ch.chunk").as("chunk"))
      .withColumn("ck", md5(col("chunk")))

  /** j71's per-doc priority derivation (quality-per-token ratio in 1e6
    * fixed point + its div-10000 histogram bucket), shared with the
    * STREAMING budget-histogram maintenance (StreamOps
    * .budgetHistogramStream) so batch and stream cannot fork on the
    * priority formula. Pure per-row expressions — works on a streaming
    * DataFrame unchanged.
    */
  private[graft] def docPriorities(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        size(array_distinct(split(col("text"), " ")))
          .cast("long").as("n_distinct"))
      .withColumn("priority", expr("n_distinct * 1000000L div n_tok"))
      .withColumn("bucket", expr("priority div 10000L"))
      .select("doc_id", "n_tok", "priority", "bucket")

  /** j74's mining stage over ANY (vec_id, cell) assignment: broadcast
    * anchor panel (vec_id < nAnchors), candidate ids from the cell
    * equi-join on the one-row-per-vector cell table, vectors fetched PER
    * CANDIDATE, rounded-dot band [0.10, 0.35), per-anchor group-limit
    * top-k. Shared by the registered j74 (4×4 seed cells the oracle
    * replays) and the learned-codebook production variant below, so the
    * two can never fork in mining semantics.
    */
  private[graft] def minedNegatives(
      cells: org.apache.spark.sql.DataFrame,
      e: org.apache.spark.sql.DataFrame,
      nAnchors: Int = 8,
      topK: Int = 4): org.apache.spark.sql.DataFrame = {
    val anchors = truncateLineage(cells.filter(col("vec_id") < nAnchors)
      .join(e.select("vec_id", "embedding"), "vec_id")
      .select(col("vec_id").as("anchor_id"),
        col("embedding").as("ea"), col("cell")))
    val candIds = cells.join(broadcast(anchors), Seq("cell"))
      .filter(col("vec_id") =!= col("anchor_id"))
      .select("anchor_id", "vec_id", "ea")
    val w = Window.partitionBy("anchor_id")
      .orderBy(col("sim").desc, col("vec_id").asc)
    candIds.join(e.select(col("vec_id"),
        col("embedding").as("eb")), Seq("vec_id"))
      .withColumn("sim", round(expr(dot("ea", "eb")), 6))
      .filter(col("sim") >= 0.10 && col("sim") < 0.35)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= topK)
      .select(col("anchor_id"), col("vec_id").as("neg_id"),
        col("sim"), col("rk"))
      .orderBy("anchor_id", "rk")
  }

  /** The hard-negative production variant: j74's mining with cells from
    * TRAINED half codebooks at an arbitrary kHalf (the √n-cells scale
    * knob, kHalf ≈ n^(1/4)) through the SAME `imiAssignAgainst` seam
    * j67 and the streaming index maintenance use. The registered j74
    * stays on the 4×4 seed cells SQL can replay exactly; QueriesSpec
    * pins this variant's structural contract on the same corpus.
    */
  def hardNegativesLearned(
      s: org.apache.spark.sql.SparkSession, d: String,
      kHalf: Int = 4): org.apache.spark.sql.DataFrame = {
    DotProduct.register(s)
    graft.functions.SquaredDistance.register(s)
    val e = Tables.embeddings(s, d)
    val qe = truncateLineage(graft.operators.IvfKMeans.quantize(e))
    val (cl, ch) =
      graft.operators.IvfKMeans.imiHalfCodebooksTrained(qe, kHalf)
    val cells = truncateLineage(graft.operators.IvfKMeans
      .imiAssignAgainst(qe, truncateLineage(cl), truncateLineage(ch), kHalf)
      .select("vec_id", "cell"))
    minedNegatives(cells, e)
  }

  /** j75's decision stage: every chunk occurrence marked kept iff it is
    * the globally FIRST (min (doc_id, idx)) occurrence of its hash —
    * min(struct) map-side argmin, one shuffled row per distinct chunk.
    * Exposed so the streaming twin's differential can compare decisions
    * row-for-row, not just the per-doc aggregate.
    */
  private[graft] def chunkKept(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val chunks = truncateLineage(docChunks(docs))
    val firsts = chunks.groupBy("ck")
      .agg(min(struct(col("doc_id"), col("idx"))).as("f"))
      .select(col("ck"), col("f.doc_id").as("fdoc"),
        col("f.idx").as("fidx"))
    chunks.join(firsts, "ck")
      .withColumn("kept",
        col("doc_id") === col("fdoc") && col("idx") === col("fidx"))
  }

  /** The SemDeDup production variant: j53's pipeline with cells from the
    * deterministic spherical k-means codebook (operators.IvfKMeans) —
    * the √n-cells scale knob the registered fixed-centroid query
    * documents. Same pair stage, same CC canonicalization; QueriesSpec
    * differential-tests its pair recall against the fixed-cell path on
    * the exhaustive τ-pair truth. The oracle stays on the fixed
    * centroids, which SQL can reproduce exactly.
    */
  def semanticDedupLearned(
      s: org.apache.spark.sql.SparkSession, d: String,
      k: Int = 16): org.apache.spark.sql.DataFrame = {
    DotProduct.register(s)
    val e = Tables.embeddings(s, d)
    val cents = graft.operators.IvfKMeans.train(e, k)
    val assigned = graft.operators.IvfKMeans.assignCells(e, cents, 1)
    graft.operators.ConnectedComponents.byStarContraction(
      e.select(col("vec_id").as("doc_id")),
      truncateLineage(semanticPairs(assigned)))
      .select(col("doc_id").as("vec_id"), col("cluster_id"),
        col("is_canonical"))
      .orderBy("vec_id")
  }

  /** Gram-diagonal exact-substring span reconstruction — the shared core
    * of j62 (uncapped, the exact oracle form) and j66 (df-capped, the
    * 100 TB form). Per doc: the longest token span shared verbatim with
    * any other doc, the partner achieving it (ties to the smaller
    * doc_id), and the distinct-partner count.
    *
    * `dfCap`: when set, grams occurring more than `cap` times in the
    * CORPUS are dropped from the inverted index before the self-join —
    * the j38 stopword-guard pattern applied to grams. The self-join cost
    * is Σ df(g)², so one boilerplate gram shared by 1% of a 10B-doc
    * corpus (df 10⁸) alone costs 10¹⁶ candidate pairs uncapped; the cap
    * bounds every gram's contribution at cap² and total cost at
    * |grams|·cap². The trade is RECALL, precisely characterizable: a
    * dropped gram splits the diagonal run that crosses it, so a span
    * containing a >cap gram shrinks (or, if ALL its grams are over-cap,
    * disappears); spans made of ≤cap grams — the planted-clone /
    * plagiarism signal, which is rare by nature — reconstruct exactly
    * (QueriesSpec pins both halves on a planted-hot-gram corpus).
    * cap = 2 keeps pure pairwise evidence: any gram present ≥3 times is
    * treated as boilerplate. The df computation is one groupBy on the
    * gram hash — the same key the self-join shuffles on, so the capped
    * plan adds one aggregation, not a new shuffle stage pattern.
    */
  private[graft] def substringSpans(docs: org.apache.spark.sql.DataFrame,
      dfCap: Option[Long]): org.apache.spark.sql.DataFrame = {
    val rawGrams = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 8)
      .select(col("doc_id"), posexplode(expr(
        """transform(sequence(1, size(t) - 7),
           i -> md5(concat_ws(' ', slice(t, i, 8))))"""))
        .as(Seq("p", "g")))
    val grams = dfCap match {
      case None => truncateLineage(rawGrams)
      case Some(cap) =>
        // materialize the gram table BEFORE the df guard: it feeds both
        // the df aggregate and the join side, and without truncation the
        // token explode would execute twice (the j2 shingle-table rule);
        // the capped result is truncated too so the self-join's two sides
        // read one materialization instead of re-running the cap join
        val g0 = truncateLineage(rawGrams)
        truncateLineage(g0.join(
          g0.groupBy("g").agg(count(lit(1)).as("df"))
            .filter(col("df") <= cap)
            .select("g"),
          Seq("g")))
    }
    val a = grams.select(col("doc_id").as("da"), col("p").as("pa"),
      col("g"))
    val b = grams.select(col("doc_id").as("db"), col("p").as("pb"),
      col("g"))
    val wRun = Window.partitionBy("da", "db", "diag").orderBy("pa")
    val spans = a.join(b, Seq("g"))
      .filter(col("da") =!= col("db"))
      .select(col("da"), col("db"), col("pa"),
        (col("pa") - col("pb")).as("diag"))
      .withColumn("grp", col("pa") - row_number().over(wRun))
      .groupBy("da", "db", "diag", "grp")
      .agg((count(lit(1)) + 7).as("span"))
    val best = truncateLineage(
      spans.groupBy("da", "db").agg(max("span").as("span")))
    val wBest = Window.partitionBy("da")
      .orderBy(col("span").desc, col("db"))
    best.groupBy("da")
      .agg(max(col("span")).as("max_shared_tokens"),
        count(lit(1)).as("n_partners"))
      .join(best.withColumn("rk", row_number().over(wBest))
        .filter(col("rk") === 1)
        .select(col("da"), col("db").as("partner_id")), Seq("da"))
      .select(col("da").as("doc_id"), col("max_shared_tokens"),
        col("partner_id"), col("n_partners"))
      .orderBy("doc_id")
  }

  /** One BPE round over a `(word, wcount, i, s)` symbol table: count
    * adjacent pairs weighted by word count, pick the top pair under the
    * total order (cnt DESC, pair lexicographic), apply it leftmost-
    * non-overlapping via gaps-and-islands, resequence. THE single
    * definition — j56 (training: the learned pair per round) and j69
    * (encoding: the evolved symbol table after all rounds) both call it,
    * so the trainer and the encoder cannot fork; the oracle twin is
    * [[bpeRoundSql]]. Returns (top-pair 1-row table, next symbol table).
    */
  private[graft] def bpeRound(sym: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val wWin = Window.partitionBy("word").orderBy("i")
    val pairs = sym
      .withColumn("b", lead(col("s"), 1).over(wWin))
      .filter(col("b").isNotNull)
      .groupBy(col("s").as("a"), col("b"))
      .agg(sum("wcount").as("cnt"))
    val top = pairs
      .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
      .select(col("a").as("ta"), col("b").as("tb"),
        col("cnt").as("tcnt"))
    val cand = sym.crossJoin(broadcast(top))
      .withColumn("c", coalesce(
        col("s") === col("ta") &&
          lead(col("s"), 1).over(wWin) === col("tb"),
        lit(false)))
    val runs = cand.withColumn("grp", when(col("c"),
      col("i") - row_number().over(
        Window.partitionBy("word", "c").orderBy("i"))))
    val marks = runs
      .withColumn("rstart",
        min(col("i")).over(Window.partitionBy("word", "grp")))
      .withColumn("m",
        col("c") && (col("i") - col("rstart")) % 2 === 0)
    val next = marks
      .withColumn("pm", lag(col("m"), 1, false).over(wWin))
      .filter(col("m") || !col("pm"))
      .select(col("word"), col("wcount"),
        row_number().over(wWin).cast("long").as("i"),
        when(col("m"), concat(col("ta"), col("tb")))
          .otherwise(col("s")).as("s"))
    (top, next)
  }

  /** The weighted vocabulary of a corpus and its initial per-character
    * symbol table — the inputs every BPE round evolves. Everything after
    * this ONE corpus pass runs on (distinct word, count): the shape that
    * scales BPE to 100 TB.
    */
  private[graft] def bpeSym1(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val vocab = Tables.documentsSpread(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wcount"))
    vocab.select(col("word"), col("wcount"),
      posexplode(expr(
        """transform(sequence(1, length(word)),
           k -> substring(word, k, 1))""")).as(Seq("p0", "s")))
      .select(col("word"), col("wcount"),
        (col("p0") + 1).cast("long").as("i"), col("s"))
  }

  /** Oracle twin of [[bpeRound]]: the CTE block deriving top$k and
    * sym${k+1} from sym$k. j56's and j69's oracles unroll the SAME text,
    * so an edit to the relational merge step changes both or neither.
    */
  private def bpeRoundSql(k: Int): String = {
    val n = k + 1
    s"""pairs$k AS (
          SELECT a, b, CAST(sum(wcount) AS BIGINT) AS cnt FROM (
            SELECT word, wcount, s AS a,
                   lead(s) OVER (PARTITION BY word ORDER BY i) AS b
            FROM sym$k)
          WHERE b IS NOT NULL GROUP BY a, b),
        top$k AS (
          SELECT a AS ta, b AS tb, cnt AS tcnt FROM pairs$k
          ORDER BY cnt DESC, a, b LIMIT 1),
        cand$k AS (
          SELECT s.word, s.wcount, s.i, s.s, t.ta, t.tb,
                 COALESCE(s.s = t.ta AND
                   lead(s.s) OVER (PARTITION BY s.word ORDER BY s.i)
                     = t.tb, false) AS c
          FROM sym$k s CROSS JOIN top$k t),
        runs$k AS (
          SELECT *, CASE WHEN c THEN i - row_number()
            OVER (PARTITION BY word, c ORDER BY i) END AS grp
          FROM cand$k),
        marks$k AS (
          SELECT *, c AND ((i - min(i) OVER (PARTITION BY word, grp))
            % 2 = 0) AS m
          FROM runs$k),
        sym$n AS (
          SELECT word, wcount,
                 CAST(row_number() OVER (PARTITION BY word ORDER BY i)
                   AS BIGINT) AS i,
                 CASE WHEN m THEN ta || tb ELSE s END AS s
          FROM (SELECT *, lag(m, 1, false)
                  OVER (PARTITION BY word ORDER BY i) AS pm
                FROM marks$k)
          WHERE m OR NOT pm)"""
  }

  /** Per-document contract-violation flags — the SHARED seam between
    * batch j76 and the streaming contract monitor
    * ([[graft.streaming.StreamOps.contractMonitorStream]]): one
    * definition of each row-local constraint, so the two surfaces cannot
    * fork. Row-local only by design — the uniqueness constraint needs
    * cross-row visibility and lives in the consumers (count−distinct in
    * batch, doc_id-keyed seen-state in the stream).
    */
  private[graft] def docContractFlags(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"),
      when(col("text").isNull || length(col("text")) === 0, 1L)
        .otherwise(0L).as("text_empty"),
      when(col("n_chars") =!= length(col("text")), 1L)
        .otherwise(0L).as("n_chars_bad"),
      when(!col("lang").isin("en", "es", "zh", "de", "fr"), 1L)
        .otherwise(0L).as("lang_bad"),
      when(col("n_chars") < 200L, 1L).otherwise(0L).as("too_short"))

  /** The winnow near-dup pair join (j81's body), parameterized on the df
    * cap so the cap is a MEASURABLE knob (`graft.WinnowLadder` times it
    * on vocab-saturated synthetic corpora, where fingerprint df grows ∝ n
    * and the cap is what keeps the posting self-join from entering its
    * n²/V regime — dup-cluster fingerprints have df ≈ cluster size, so
    * any cap ≥ 8 keeps recall while background work collapses).
    * Verdict threshold τ = 0.5 containment: measured bimodal on the
    * testdata corpus — planted near-dup clusters sit ≥ 0.80 while the
    * shared-vocabulary background has p99 ≈ 0.20, so 0.5 separates
    * cleanly (29 pairs vs 78k candidates at sf0.001); MinShared = 3
    * prunes on the cheap count BEFORE the division.
    */
  private[graft] def winnowPairs(
      s: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame,
      cap: Long): org.apache.spark.sql.DataFrame = {
    val K = 8; val W = 4; val MinShared = 3
    graft.functions.WinnowFingerprint.register(s)
    val post = truncateLineage(
      docs.filter(length(col("text")) >= K + W - 1)
        .select(col("doc_id"),
          expr(s"graft_winnow(text, $K, $W)").as("fps"))
        .select(col("doc_id"),
          size(col("fps")).cast("long").as("n_fp"),
          explode(col("fps")).as("fp")))
    val keep = post.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= cap).select("fp")
    val idx = post.join(keep, Seq("fp"))
    idx.as("x").join(idx.as("y"),
        col("x.fp") === col("y.fp") &&
          col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"),
        col("y.doc_id").as("doc_b"),
        col("x.n_fp").as("n_fp_a"), col("y.n_fp").as("n_fp_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= MinShared)
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        expr("n_shared * 1000000 div least(n_fp_a, n_fp_b)")
          .as("containment_ppm"))
      .filter(col("containment_ppm") >= 500000L)
      .orderBy("doc_a", "doc_b")
  }

  /** The SCD2 history derivation — the SHARED seam between the registered
    * j78 (history table) and j79's point-in-time consumption: per
    * customer, consecutive same-status orders collapse into islands
    * (gaps-and-islands via lag on the (custkey)(ts, ok) order), each
    * island one version row with [valid_from, valid_to) wall-clock date
    * strings (valid_to NULL while current). One definition, so the
    * history a fact joins AS OF is exactly the history j78 publishes.
    * All windows key on custkey; the filter preserves partitioning, so
    * the whole derivation runs on a single keyed exchange.
    */
  private[graft] def scd2History(
      orders: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val o = orders.select(
      col("o_custkey").as("custkey"),
      col("o_orderdate").as("ts"),
      col("o_orderkey").as("ok"),
      col("o_orderstatus").as("status"))
    val w = Window.partitionBy("custkey").orderBy("ts", "ok")
    o.withColumn("prev", lag("status", 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("status"))
      .select(col("custkey"), col("status"),
        date_format(col("ts"), "yyyy-MM-dd").as("valid_from"),
        date_format(lead("ts", 1).over(w), "yyyy-MM-dd").as("valid_to"),
        row_number().over(w).cast("long").as("version"))
  }

  /** Oracle twin of [[bpeSym1]]. */
  private val BpeSym1Sql =
    """vocab AS (
         SELECT word, CAST(count(*) AS BIGINT) AS wcount FROM
           (SELECT unnest(string_split(text, ' ')) AS word
            FROM documents)
         GROUP BY word),
       sym1 AS (
         SELECT word, wcount, CAST(u.k AS BIGINT) AS i,
                substring(word, CAST(u.k AS INT), 1) AS s
         FROM vocab,
              UNNEST(generate_series(1, length(word))) AS u(k))"""

  val queries: Seq[Q] = Seq(

    // Exact dedup: content-hash the text, keep the lowest doc_id per hash.
    // row_number (not dropDuplicates) so the survivor is deterministic.
    Q("j1_exact_dedup",
      (s, d) => {
        val w = Window.partitionBy("h").orderBy("doc_id")
        Tables.documents(s, d)
          .withColumn("h", sha2(col("text"), 256))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("doc_id", "lang", "source", "n_chars")
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang, source, n_chars FROM (
                SELECT doc_id, lang, source, n_chars,
                       row_number() OVER (PARTITION BY text ORDER BY doc_id)
                         AS rn
                FROM documents)
              WHERE rn = 1 ORDER BY doc_id""")),

    // MinHash + LSH banding near-dup: shingle → fused 32-slot signature →
    // 4 bands of 8 → bucket equi-join for candidates → exact-Jaccard verify
    // ≥ 0.9. The oracle is an exact (prefix-filtered, NeardupPairsSql) pair
    // join via a different algorithm — the banded path must find every
    // qualifying pair (at the corpus's J≈0.99 near-dups, per-pair miss
    // probability ≈ (1-0.99⁸)⁴ ≈ 4e-5; recall verified exact by the oracle
    // at every sf incl. sf0.1, and by QueriesSpec at sf0.001 and sf0.1).
    Q("j2_minhash_neardup",
      (s, d) => neardupPairs(s, d)
        .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jaccard"))
        .orderBy("doc_a", "doc_b"),
      Some(s"""WITH $NeardupPairsSql
               SELECT doc_a, doc_b, round(jac, 4) AS jaccard FROM pairs
               ORDER BY doc_a, doc_b""")),

    // Brute-force cosine top-k (embeddings are L2-normalized → cosine ≡ dot).
    // Ranking is on the ROUNDED score so engine ULP noise can't flip ranks.
    Q("j3_cosine_topk",
      (s, d) => {
        DotProduct.register(s)
        val probe = Tables.embeddings(s, d).filter(col("vec_id") === 0)
          .select(col("embedding").as("p"))
        Tables.embeddings(s, d).crossJoin(broadcast(probe))
          .select(col("vec_id"),
            round(expr(dot("embedding", "p")), 6).as("score"))
          .orderBy(col("score").desc, col("vec_id"))
          .limit(10)
      },
      Some(s"""SELECT e.vec_id, round(${duckDot("e.embedding", "p.p")}, 6)
                        AS score
               FROM embeddings e CROSS JOIN
                 (SELECT embedding AS p FROM embeddings WHERE vec_id = 0) p
               ORDER BY score DESC, e.vec_id LIMIT 10""")),

    // k-NN similarity join for a BOUNDED probe panel: exact top-3 over the
    // full collection for the first 512 label=0 vectors. The limit(512) is
    // the scale contract: the broadcast build side has a plan-guaranteed
    // maximum size (a GlobalLimit below the broadcast exchange, pinned in
    // PlanSpec), so the compare count is O(N·512) — linear in the
    // collection — instead of the O(N·M) blow-up of broadcasting a constant
    // FRACTION of the collection. Exact kNN against an UNBOUNDED probe set
    // is the ANN territory (j12 buckets / j16 cells / j46 multi-probe):
    // measured here, even 12 of 16 IVF cells miss true top-3 neighbors on
    // this isotropic corpus, so no cell routing can keep this operator's
    // exact contract — bounding the panel is the honest exact form. At the
    // tested SFs every label=0 vector has vec_id < 512, so the panel equals
    // the full label-0 set and results are identical to the exhaustive
    // definition.
    Q("j4_knn_join",
      (s, d) => {
        DotProduct.register(s)
        val e = Tables.embeddings(s, d)
        val probes = e.filter(col("label") === 0)
          .orderBy("vec_id").limit(512)
          .select(col("vec_id").as("probe_id"), col("embedding").as("p"))
        val w = Window.partitionBy("probe_id")
          .orderBy(col("score").desc, col("vec_id"))
        e.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
          .withColumn("score", round(expr(dot("embedding", "p")), 6))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 3)
          .select("probe_id", "vec_id", "score", "rk")
          .orderBy("probe_id", "rk")
      },
      Some(s"""SELECT probe_id, vec_id, score, rk FROM (
                 SELECT p.vec_id AS probe_id, e.vec_id AS vec_id,
                        round(${duckDot("e.embedding", "p.embedding")}, 6)
                          AS score,
                        CAST(row_number() OVER (PARTITION BY p.vec_id
                          ORDER BY round(${duckDot("e.embedding", "p.embedding")}, 6)
                            DESC, e.vec_id) AS BIGINT) AS rk
                 FROM embeddings e JOIN
                   (SELECT vec_id, embedding FROM embeddings
                    WHERE label = 0 ORDER BY vec_id LIMIT 512) p
                   ON e.vec_id != p.vec_id)
               WHERE rk <= 3 ORDER BY probe_id, rk""")),

    // Corpus text statistics per (lang, source): doc/char/token counts and
    // type-token ratio.
    Q("j5_text_stats",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .withColumn("toks", split(col("text"), " "))
        val base = docs.groupBy("lang", "source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").as("sum_chars"),
            round(avg("n_chars"), 2).as("avg_chars"),
            sum(size(col("toks"))).as("n_tokens"))
        val uniq = docs
          .select(col("lang"), col("source"), explode(col("toks")).as("tok"))
          .groupBy("lang", "source")
          .agg(countDistinct(col("tok")).as("n_uniq_tokens"))
        base.join(uniq, Seq("lang", "source"))
          .withColumn("ttr",
            round(col("n_uniq_tokens").cast("double") / col("n_tokens"), 6))
          .orderBy("lang", "source")
      },
      Some("""WITH base AS (
                SELECT lang, source, COUNT(*) AS n_docs,
                       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                       round(AVG(n_chars), 2) AS avg_chars,
                       CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                         AS n_tokens
                FROM documents GROUP BY 1, 2),
              uniq AS (
                SELECT lang, source, COUNT(DISTINCT tok) AS n_uniq_tokens
                FROM (SELECT lang, source,
                        unnest(string_split(text, ' ')) AS tok
                      FROM documents)
                GROUP BY 1, 2)
              SELECT base.lang AS lang, base.source AS source, n_docs,
                     sum_chars, avg_chars, n_tokens, n_uniq_tokens,
                     round(CAST(n_uniq_tokens AS DOUBLE) / n_tokens, 6) AS ttr
              FROM base JOIN uniq ON base.lang = uniq.lang
                AND base.source = uniq.source
              ORDER BY lang, source""")),

    // Multimodal column plumbing: opaque binary payload + typed metadata
    // struct carried through the plan, projected to scalars for the oracle.
    // (The mapPartitions decode/feature path lives in graft.multimodal.)
    Q("j6_multimodal_col",
      (s, d) => Tables.documents(s, d)
        .withColumn("payload", col("text").cast("binary"))
        .withColumn("meta", struct(lit("text/plain").as("mime"),
          col("n_chars").as("bytes")))
        .select(col("doc_id"),
          length(col("payload")).cast("long").as("payload_len"),
          md5(col("payload")).as("payload_md5"),
          col("meta.mime").as("mime"),
          col("meta.bytes").as("bytes"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     CAST(octet_length(encode(text)) AS BIGINT)
                       AS payload_len,
                     md5(text) AS payload_md5,
                     'text/plain' AS mime,
                     n_chars AS bytes
              FROM documents ORDER BY doc_id""")),

    // Per-doc quality scoring + stopword-ratio language heuristic.
    Q("j7_quality_langid",
      (s, d) => {
        Tables.documents(s, d)
          .withColumn("toks", split(col("text"), " "))
          .withColumn("nt", size(col("toks")).cast("long"))
          .withColumn("nstop",
            expr(s"size(filter(toks, t -> t IN $FunnelStops))")
              .cast("long"))
          .withColumn("nuniq", size(array_distinct(col("toks"))).cast("long"))
          .select(col("doc_id"), col("lang"),
            col("nt").as("n_tokens"),
            ceil(col("n_chars") / 4.0).as("token_est"),
            // BPE-ish regex tokenizer (alternatives are first-char-disjoint,
            // so Java and RE2 matching agree)
            size(expr("regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+|[^a-z0-9 ]+', 0)"))
              .cast("long").as("bpe_est"),
            round((col("n_chars") - (col("nt") - 1)).cast("double") /
              col("nt"), 4).as("avg_tok_len"),
            round(col("nstop").cast("double") / col("nt"), 4)
              .as("stop_ratio"),
            round(col("nuniq").cast("double") / col("nt"), 4)
              .as("uniq_ratio"),
            when(col("nstop").cast("double") / col("nt") > 0.05, "en-like")
              .otherwise("other").as("pred_lang"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (
                SELECT doc_id, lang, n_chars, text,
                       len(string_split(text, ' ')) AS nt,
                       len(list_filter(string_split(text, ' '),
                         x -> x IN $FunnelStops)) AS nstop,
                       len(list_distinct(string_split(text, ' '))) AS nuniq
                FROM documents)
              SELECT doc_id, lang, CAST(nt AS BIGINT) AS n_tokens,
                     CAST(ceil(n_chars/4.0) AS BIGINT) AS token_est,
                     CAST(len(regexp_extract_all(text,
                       ' ?[a-z]+| ?[0-9]+|[^a-z0-9 ]+', 0)) AS BIGINT)
                       AS bpe_est,
                     round(CAST(n_chars - (nt-1) AS DOUBLE)/nt, 4)
                       AS avg_tok_len,
                     round(CAST(nstop AS DOUBLE)/nt, 4) AS stop_ratio,
                     round(CAST(nuniq AS DOUBLE)/nt, 4) AS uniq_ratio,
                     CASE WHEN CAST(nstop AS DOUBLE)/nt > 0.05
                          THEN 'en-like' ELSE 'other' END AS pred_lang
              FROM t ORDER BY doc_id""")),

    // Document fingerprinting (content-hash identity for dedup indexes).
    Q("j8_fingerprint",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          md5(col("text").cast("binary")).as("fp"),
          substring(md5(col("text").cast("binary")), 1, 16).as("fp16"),
          sha2(col("text"), 256).as("fp_sha"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, md5(text) AS fp,
                     substring(md5(text), 1, 16) AS fp16,
                     sha256(text) AS fp_sha
              FROM documents ORDER BY doc_id""")),

    // Word 3-gram Jaccard near-dup over one language slice, via an
    // inverted-index (posting-list) join: gram→doc postings equi-join on the
    // gram, count shared grams per pair, then Jaccard from set sizes. Linear
    // in Σ df(gram)² — measured 8× fewer candidate rows than the n² cross
    // join at sf0.1, and the scalable shape for bigger corpora (the DuckDB
    // oracle keeps the equivalent cross-join formulation; pairs with zero
    // shared grams can't reach any positive threshold, so results match).
    Q("j9_ngram_jaccard",
      (s, d) => ngramPairCounts(s, d)
          .withColumn("jac", col("inter").cast("double") /
            (col("sa") + col("sb") - col("inter")))
          .filter(col("jac") >= 0.8)
          .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jaccard"))
          .orderBy("doc_a", "doc_b"),
      Some("""WITH ng AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                         generate_series(1, len(string_split(text,' '))-2),
                         i -> concat_ws(' ', string_split(text,' ')[i],
                           string_split(text,' ')[i+1],
                           string_split(text,' ')[i+2]))) AS g
                FROM documents WHERE lang = 'en'
                  AND len(string_split(text, ' ')) >= 3)
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     round(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) /
                       (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))),
                       4) AS jaccard
              FROM ng a JOIN ng b ON a.doc_id < b.doc_id
              WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) /
                (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.8
              ORDER BY doc_a, doc_b""")),

    // SimHash near-dup: 63-bit signature from md5-hex bit votes over the
    // distinct token set (two independent md5s — see simhashBitsSql —
    // because signature WIDTH is what keeps LSH bands selective; the
    // original 32-bit form left ≤128 keys per band, which saturates on any
    // large corpus and silently degrades the band join toward n²/128, and
    // at Hamming ≤ 4 of 32 it flagged 40% of all sf0.1 pairs — not a
    // detector). Pairs within Hamming distance 4. The pairing is never an
    // all-pairs scan — three stacked public techniques keep it
    // sub-quadratic AND dedup-shuffle-free:
    //   1. SIGNATURE DEDUP: docs collapse to distinct signatures first
    //     (duplicate-heavy corpora repeat signatures — the quadratic core
    //     runs on distinct signatures, not docs; doc pairs come back at
    //     the end via two equi-joins against the doc→sig map plus a
    //     same-signature self-join for the Hamming-0 groups).
    //   2. PIGEONHOLE BANDS: the 63 bits split into 5 bands
    //     (13+13+13+12+12); distance ≤ 4 means at most 4 differing bands,
    //     so at least one band matches EXACTLY — candidates come from an
    //     equi-join on (band_idx, band_value), and only candidates pay the
    //     bit_count verify.
    //   3. FIRST-MATCH EMISSION: a candidate that collides in several
    //     bands is kept only where band_idx equals the FIRST index at
    //     which the two signatures agree — exactly-once emission as a
    //     map-side filter, replacing a multi-million-row distinct.
    // The signature table (doc_id + one long — a few bytes per doc) is
    // lineage-truncated once so the token-stream aggregation never
    // re-executes across its five references. Honest local measurement:
    // below ~10⁵ docs a brute-force all-pairs bit_count scan is still
    // faster (1.25e9 codegen'd comparisons ≈ 2.4 s on 32 cores at 50k
    // docs vs 7.1 s banded) — the banded path exists because the grid is
    // gone at 10⁷+ docs while band buckets stay bounded.
    Q("j10_simhash_neardup",
      (s, d) => {
        // the two hex digests are projected ONCE per (doc, token) row —
        // inside the 63 aggregate expressions below, each md5 would be
        // evaluated per-row per-expression (up to 63 hashes/row) unless
        // codegen happens to eliminate the common subexpressions; hoisting
        // guarantees 2 hashes/row on the most hash-bound query in the repo
        val tok = Tables.documentsSpread(s, d)
          .select(col("doc_id"),
            explode(array_distinct(split(col("text"), " "))).as("tok"))
          .select(col("doc_id"), md5(col("tok")).as("h1"),
            md5(concat(lit("x"), col("tok"))).as("h2"))
        val bitCols = (0 until 63).map { i =>
          val h = if (i < 32) col("h1") else col("h2")
          val pos = if (i < 32) i + 1 else i - 31
          sum(when(substring(h, pos, 1) >= "8", 1L).otherwise(-1L)).as(s"b$i")
        }
        val bits = tok.groupBy("doc_id").agg(bitCols.head, bitCols.tail: _*)
        val simhash = (0 until 63).map(i =>
          when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ + _)
        val sim = truncateLineage(
          bits.select(col("doc_id"), simhash.as("simhash")))
        // (offset, width) of the 5 bands covering all 63 signature bits —
        // shared with LawsSpec, which property-tests the pigeonhole-recall
        // and exactly-once-emission invariants against these constants
        val bandDefs = graft.functions.SimHashBands.defs
        def bv(h: org.apache.spark.sql.Column, j: Int) = {
          val (off, width) = bandDefs(j)
          shiftright(h, off).bitwiseAND(lit((1L << width) - 1))
        }
        val usig = sim.select("simhash").distinct()
        val bands = usig.select(col("simhash"),
          explode(array(bandDefs.indices.map(j =>
            struct(lit(j).as("bi"), bv(col("simhash"), j).as("bv"))): _*))
            .as("bk"))
        // first band index at which sa and sb agree (well-defined for any
        // banded match; ≤ the joined band's index by construction)
        val firstMatch = bandDefs.indices.foldRight(lit(-1)) { (j, rest) =>
          when(bv(col("sa"), j) === bv(col("sb"), j), lit(j)).otherwise(rest)
        }
        val sigPairs = bands.alias("x")
          .join(bands.alias("y"),
            col("x.bk") === col("y.bk") &&
              col("x.simhash") < col("y.simhash"))
          .select(col("x.simhash").as("sa"), col("y.simhash").as("sb"),
            col("x.bk.bi").as("bi"))
          .withColumn("ham",
            bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long"))
          .filter(col("ham") <= graft.functions.SimHashBands.maxHamming &&
            col("bi") === firstMatch)
        // expand signature pairs to doc pairs (AQE broadcasts the doc→sig
        // map at small SF; at corpus scale these are plain equi-joins)
        val cross = sigPairs
          .join(sim.select(col("simhash").as("sa"), col("doc_id").as("ida")),
            "sa")
          .join(sim.select(col("simhash").as("sb"), col("doc_id").as("idb")),
            "sb")
          .select(least(col("ida"), col("idb")).as("doc_a"),
            greatest(col("ida"), col("idb")).as("doc_b"), col("ham"))
        val same = sim.alias("a")
          .join(sim.alias("b"),
            col("a.simhash") === col("b.simhash") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            lit(0L).as("ham"))
        cross.union(same)
          .select("doc_a", "doc_b", "ham")
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH tok AS (SELECT DISTINCT doc_id, tok FROM
                 (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                  FROM documents)),
               bits AS (SELECT doc_id, $simhashBitsSql FROM tok
                 GROUP BY doc_id),
               sim AS (SELECT doc_id, CAST($simhashValSql AS BIGINT)
                 AS simhash FROM bits)
               SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT)
                        AS ham
               FROM sim a JOIN sim b ON a.doc_id < b.doc_id
               WHERE bit_count(xor(a.simhash, b.simhash)) <= 4
               ORDER BY doc_a, doc_b""")),

    // Near-dup cluster canonicalization: connected components over the
    // verified pair graph; every doc gets cluster_id = min doc_id in its
    // component, and the minimum member is the canonical survivor — the
    // final stage of a dedup pipeline. Spark side: BSP min-label
    // propagation run to FIXPOINT via the reusable
    // operators.ConnectedComponents.byLabelPropagation (the driver only
    // actions a 1-row convergence scalar per superstep, lineage truncated
    // per round, loud failure on the runaway backstop); j30 runs the
    // SAME pair graph through the O(log n)-round star-contraction
    // variant. The verified pairs are checkpointed ONCE here (the edge
    // union's two projections would otherwise each execute the whole LSH
    // pipeline). Oracle: recursive-CTE transitive closure + min.
    Q("j13_dedup_clusters",
      (s, d) => {
        val pairs = truncateLineage(neardupPairs(s, d))
        graft.operators.ConnectedComponents
          .byLabelPropagation(Tables.documents(s, d).select("doc_id"), pairs)
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $NeardupPairsSql,
              edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                        UNION ALL SELECT doc_b, doc_a FROM pairs),
              reach(a, b) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src)
              SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster_id,
                     (a = min(b)) AS is_canonical
              FROM reach GROUP BY a ORDER BY doc_id""")),

    // Connected components via alternating large-star/small-star — the
    // O(log n)-ROUND algorithm (public technique: Kiveris et al.,
    // "Connected Components in MapReduce and Beyond", SoCC'14) that
    // replaces j13's min-label propagation where component DIAMETER, not
    // size, is the adversary: label propagation needs O(diameter)
    // supersteps (a 10⁶-doc near-dup chain = 10⁶ rounds), large/small-star
    // provably converges in O(log n) rounds on any graph — demonstrated
    // head-to-head on a path graph in QueriesSpec, where the propagation
    // backstop fires and contraction converges. Same verified pair graph,
    // same oracle, bit-identical clusters to j13 (differential-tested).
    // Algorithm body: operators.ConnectedComponents.byStarContraction.
    Q("j30_cc_bigstar",
      (s, d) => {
        val pairs = truncateLineage(neardupPairs(s, d))
        graft.operators.ConnectedComponents
          .byStarContraction(Tables.documents(s, d).select("doc_id"), pairs)
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $NeardupPairsSql,
              edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                        UNION ALL SELECT doc_b, doc_a FROM pairs),
              reach(a, b) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src)
              SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster_id,
                     (a = min(b)) AS is_canonical
              FROM reach GROUP BY a ORDER BY doc_id""")),

    // ANN via LSH bucketing — the scale path beside brute-force j3/j4: 8
    // fixed random-hyperplane sign bits coarse-quantize the collection;
    // each probe searches ONLY its own bucket (collection shrinks ~256×
    // per probe at scale). Hyperplane weights are the deterministic ±1
    // CosineBands family (de-periodized round 10: the original mod-7
    // pattern made plane 7 ≡ plane 0, silently halving the bucket space
    // to 128), reproducible in SQL, so the whole ANN result — bucketing
    // included — is exactly oracle-checkable. Recall vs exhaustive j4 is
    // the usual ANN trade-off, not a correctness property. The bucket IS
    // one 8-bit CosineBands band, so j11's band machinery and this
    // bucketing can only drift together.
    Q("j12_ann_lsh_bucket",
      (s, d) => {
        DotProduct.register(s)
        graft.functions.CosinePlaneKeys.register(s)
        def withBucket(df: org.apache.spark.sql.DataFrame) =
          df.withColumn("bucket",
            graft.operators.CosineBands.bandKey(0, 8))
        val e = withBucket(Tables.embeddings(s, d))
          .select(col("vec_id"), col("embedding"), col("bucket"))
        // probe panel structurally capped like j4/j16/j46 (limit below
        // the broadcast) — all probes survive the cap at tested SFs
        val probes = e.filter(col("vec_id") % 50 === 0)
          .orderBy("vec_id").limit(512)
          .select(col("vec_id").as("probe_id"), col("embedding").as("p"),
            col("bucket").as("pbucket"))
        val w = Window.partitionBy("probe_id")
          .orderBy(col("score").desc, col("vec_id"))
        e.join(broadcast(probes),
          col("bucket") === col("pbucket") &&
            col("vec_id") =!= col("probe_id"))
          .withColumn("score", round(expr(dot("embedding", "p")), 6))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 3)
          .select("probe_id", "vec_id", "score", "rk")
          .orderBy("probe_id", "rk")
      },
      Some(s"""WITH b AS (
                 SELECT vec_id, embedding,
                        ${graft.operators.CosineBands.bandSql(0, 8)}
                          AS bucket
                 FROM embeddings)
               SELECT probe_id, vec_id, score, rk FROM (
                 SELECT p.vec_id AS probe_id, e.vec_id AS vec_id,
                        round(${duckDot("e.embedding", "p.embedding")}, 6)
                          AS score,
                        CAST(row_number() OVER (PARTITION BY p.vec_id
                          ORDER BY round(${duckDot("e.embedding", "p.embedding")}, 6)
                            DESC, e.vec_id) AS BIGINT) AS rk
                 FROM b e JOIN
                   (SELECT * FROM b WHERE vec_id % 50 = 0
                    ORDER BY vec_id LIMIT 512) p
                   ON e.bucket = p.bucket
                  AND e.vec_id != p.vec_id)
               WHERE rk <= 3 ORDER BY probe_id, rk""")),

    // Embedding-cosine near-dup pairs via banded random-hyperplane
    // candidates + exact dot-product verify — the sub-quadratic form.
    //
    // Exhaustive cosine near-dup at a weak threshold is INHERENTLY
    // quadratic: τ=0.45 on this isotropic 64-d corpus sits ≈3.6σ above the
    // pairwise-dot background (σ = 1/√64), and we measured that no coarse
    // structure separates it — the 16-cell IVF assignment needs 8 of 16
    // probed cells (i.e. all pairs) before the 14 sf0.01 qualifying pairs
    // are all co-located. So the scale form makes the candidate generation
    // part of the operator's CONTRACT, exactly as j12 does: 32 deterministic
    // ±1 hyperplanes (the de-periodized operators.CosineBands family —
    // plane q = 4·band + k) grouped into 8 bands of 4 sign bits; a pair is
    // a candidate iff it collides in ≥1 full band, and only candidates get
    // the exact verify. The oracle replicates the bands bit-for-bit in
    // DuckDB, so the check stays exact (rows+schema+hash) and survives any
    // testdata regen.
    //
    // Recall is the banded S-curve 1-(1-p^4)^8, p = 1-θ/π: at the demo
    // threshold p≈0.65 predicts ~83%, and 12/14 (86%) is measured at
    // sf0.01 — τ=0.45 IS the background (by design this synthetic corpus
    // has no true embedding near-dups); ≥99.8% in the regime near-dup
    // filtering actually targets (τ≥0.9 → p≈0.86), demonstrated on planted
    // in QueriesSpec. Scale shape: one lineage-truncated signature pass
    // (n×8 tiny rows), a band equi-join (Σ per-bucket n_b²), two hash
    // joins to re-attach vectors — no cross join, no broadcast of the
    // collection, plan-pinned in PlanSpec. Band WIDTH is the saturation
    // knob (the j10 signature-width lesson): 4-bit keys = 16 buckets/band
    // is sized for this corpus; a production corpus raises r so the 2^r
    // key space keeps per-bucket counts bounded (r=12–16 at τ≥0.9, where
    // p≈0.86 keeps the S-curve recall ≥ 1-(1-0.86^r)^b high), which is a
    // constant change here and in the oracle's generated SQL.
    Q("j11_cosine_neardup",
      (s, d) => {
        DotProduct.register(s)
        val e = Tables.embeddingsSpread(s, d)
        // band machinery lives in operators.CosineBands (parameterized —
        // the corpus-scale wide-band variant is law-tested there); this
        // query instantiates (r=4, b=8) per the saturation note above
        val cand = graft.operators.CosineBands.candidatePairs(e, r = 4, b = 8)
        val ea = e.select(col("vec_id").as("vid_a"), col("embedding").as("ea"))
        val eb = e.select(col("vec_id").as("vid_b"), col("embedding").as("eb"))
        cand.join(ea, "vid_a").join(eb, "vid_b")
          .withColumn("dotp", expr(dot("ea", "eb")))
          .filter(col("dotp") >= 0.45)
          .select(col("vid_a"), col("vid_b"),
            round(col("dotp"), 6).as("score"))
          .orderBy("vid_a", "vid_b")
      },
      Some {
        val bandCols = (0 until 8).map { j =>
          graft.operators.CosineBands.bandSql(j, 4) + s" AS band$j"
        }.mkString(",\n                 ")
        val collide = (0 until 8).map(j => s"a.band$j = b.band$j")
          .mkString(" OR ")
        s"""WITH sig AS (
              SELECT vec_id, embedding, $bandCols
              FROM embeddings)
            SELECT vid_a, vid_b, round(dotp, 6) AS score FROM (
              SELECT a.vec_id AS vid_a, b.vec_id AS vid_b,
                     ${duckDot("a.embedding", "b.embedding")} AS dotp
              FROM sig a JOIN sig b
                ON a.vec_id < b.vec_id AND ($collide))
            WHERE dotp >= 0.45 ORDER BY vid_a, vid_b"""
      }),

    // tf-idf top terms per document. The token explode aggregates ONCE into
    // the (doc, term) tf table, which is lineage-truncated so BOTH df and
    // the final score derive from the same materialized pass (no
    // self-derived diamond re-running the explode). df is a map-side-
    // combinable groupBy + an equi-join back on `word` — round 10 replaced
    // the earlier count-window-over-word form: a window partition is ONE
    // task, so every stopword's full posting list landed in a single task
    // with no adaptive mitigation, while join skew is exactly what AQE's
    // skew split handles. The corpus size joins in as a broadcast
    // single-row count-only scan, never a driver-side collect. Rank uses
    // the ROUNDED score (+ term tie-break) so cross-engine libm ln
    // differences can't reorder near-equal terms.
    Q("j14_tfidf_topk",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        val tf = truncateLineage(toks.groupBy("doc_id", "word")
          .agg(count(lit(1)).as("tf")))
        val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
        val n = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
        val w = Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("word"))
        tf.join(df, "word")
          .crossJoin(broadcast(n))
          .withColumn("score",
            round(col("tf") *
              log(col("n_docs").cast("double") / col("df")), 4))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 3)
          .select("doc_id", "word", "score", "rk")
          .orderBy("doc_id", "rk")
      },
      Some("""WITH toks AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS word
                FROM documents),
              tf AS (SELECT doc_id, word, COUNT(*) AS tf
                     FROM toks GROUP BY doc_id, word),
              dfq AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
              n AS (SELECT COUNT(*) AS n_docs FROM documents)
              SELECT doc_id, word, score, rk FROM (
                SELECT tf.doc_id, tf.word,
                       round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfq.df), 4)
                         AS score,
                       CAST(row_number() OVER (PARTITION BY tf.doc_id
                         ORDER BY round(tf.tf *
                           ln(CAST(n.n_docs AS DOUBLE) / dfq.df), 4) DESC,
                           tf.word) AS BIGINT) AS rk
                FROM tf JOIN dfq ON tf.word = dfq.word CROSS JOIN n)
              WHERE rk <= 3 ORDER BY doc_id, rk""")),

    // Repeated-bigram ratio — the classic repetition quality signal for
    // training-data filtering (a high ratio flags boilerplate/spam). Pure
    // per-row array math: no shuffle at all until the final sort.
    Q("j15_repetition",
      (s, d) => Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 2)
        .withColumn("grams", expr(
          """transform(sequence(1, size(toks) - 1),
             i -> concat_ws(' ', element_at(toks, i),
               element_at(toks, i + 1)))"""))
        .select(col("doc_id"),
          size(col("grams")).cast("long").as("n_bigrams"),
          size(array_distinct(col("grams"))).cast("long").as("n_distinct"))
        .withColumn("rep_ratio",
          round(lit(1.0) -
            col("n_distinct").cast("double") / col("n_bigrams"), 4))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, n_bigrams, n_distinct,
                     round(1.0 - CAST(n_distinct AS DOUBLE) / n_bigrams, 4)
                       AS rep_ratio
              FROM (
                SELECT doc_id,
                       len(string_split(text, ' ')) - 1 AS n_bigrams,
                       len(list_distinct(list_transform(
                         generate_series(1, len(string_split(text, ' ')) - 1),
                         i -> string_split(text, ' ')[i] || ' ' ||
                           string_split(text, ' ')[i + 1]))) AS n_distinct
                FROM documents WHERE len(string_split(text, ' ')) >= 2)
              ORDER BY doc_id""")),

    // IVF-style ANN (the second scale path next to j12's LSH buckets):
    // coarse-quantize the collection into cells around fixed data-derived
    // centroids (the 16 lowest vec_ids — at cluster scale these come from
    // k-means, but fixed centroids keep the oracle exact), then each probe
    // searches only its own cell. Assignment and search are broadcast joins
    // against the 16-row centroid table + one window rank — no O(n²) pair
    // scan anywhere.
    Q("j16_ivf_ann",
      (s, d) => {
        DotProduct.register(s)
        val e = Tables.embeddings(s, d)
        val cents = e.filter(col("vec_id") < 16)
          .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
        // same deterministic assignment formula applied to the full
        // collection once and to the tiny probe subset once. Measured
        // negative (round 6): truncateLineage(assignCells(e)) + filtering
        // probes from the materialized table is 3.2× SLOWER at sf0.1
        // (warm-min 1.67 s vs 0.52 s) — `assigned` carries the full
        // embedding vectors, so the checkpoint writes/reads the whole
        // collection, while the duplicate probe-side pass only re-assigns
        // the 1% probe subset. The materialize-once rule applies to
        // SMALL-output subtrees (signatures, keyed aggs), not here; the
        // gap only widens at 100 TB where materializing ≈ the input size.
        // Round 11: the rank-1 assignment window became the map-side
        // argmax agg (the pqCodes pattern) — max(struct) with a NEGATED
        // tie column reproduces "highest score, ties to the LOWER
        // cent_id" exactly, and the 16 candidate rows per vector collapse
        // in the broadcast-join task instead of shuffling 16× into a
        // window sort; cent_id is unique per group, so comparison never
        // reaches the trailing carried fields.
        def assignCells(df: org.apache.spark.sql.DataFrame) =
          df.crossJoin(broadcast(cents))
            .withColumn("cscore", round(expr(dot("embedding", "cvec")), 6))
            .groupBy("vec_id")
            .agg(max(struct(col("cscore"), negate(col("cent_id")),
              col("cent_id"), col("embedding"))).as("best"))
            .select(col("vec_id"), col("best.embedding").as("embedding"),
              col("best.cent_id").as("cell"))
        val assigned = assignCells(e)
        // probe panel structurally capped like j4 (limit below the
        // broadcast): the broadcast side can never grow with the
        // collection; all probes survive the cap at tested SFs
        val probes = assignCells(
            e.filter(col("vec_id") % 100 === 7).orderBy("vec_id").limit(512))
          .select(col("vec_id").as("probe_id"), col("embedding").as("p"),
            col("cell").as("pcell"))
        val w = Window.partitionBy("probe_id")
          .orderBy(col("score").desc, col("vec_id"))
        assigned.join(broadcast(probes),
          col("cell") === col("pcell") && col("vec_id") =!= col("probe_id"))
          .withColumn("score", round(expr(dot("embedding", "p")), 6))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 3)
          .select("probe_id", "vec_id", "score", "rk")
          .orderBy("probe_id", "rk")
      },
      Some(s"""WITH c AS (
                 SELECT vec_id AS cent_id, embedding AS cvec
                 FROM embeddings WHERE vec_id < 16),
               a AS (
                 SELECT vec_id, embedding, cent_id AS cell FROM (
                   SELECT e.vec_id, e.embedding, c.cent_id,
                          row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY round(${duckDot("e.embedding", "c.cvec")},
                              6) DESC, c.cent_id) AS ark
                   FROM embeddings e CROSS JOIN c)
                 WHERE ark = 1)
               SELECT probe_id, vec_id, score, rk FROM (
                 SELECT p.vec_id AS probe_id, a.vec_id,
                        round(${duckDot("a.embedding", "p.embedding")}, 6)
                          AS score,
                        CAST(row_number() OVER (PARTITION BY p.vec_id
                          ORDER BY round(${duckDot("a.embedding",
                            "p.embedding")}, 6) DESC, a.vec_id) AS BIGINT)
                          AS rk
                 FROM a JOIN
                   (SELECT * FROM a WHERE vec_id % 100 = 7
                    ORDER BY vec_id LIMIT 512) p
                   ON a.cell = p.cell
                  AND a.vec_id != p.vec_id)
               WHERE rk <= 3 ORDER BY probe_id, rk""")),

    // Winnowing fingerprints via a TRUE Karp-Rabin rolling hash, computed
    // by the native `graft_winnow` expression (functions.WinnowFingerprint
    // — the O(n) recurrence h' = (h - c_out·B^(k-1))·B + c_in (mod M),
    // w-window minima, distinct): the loop-carried recurrence is exactly
    // what SQL HOFs can't express without O(n·k) re-derivation, the tier-b
    // custom-expression criterion. The oracle computes the identical
    // residues with the positional O(n·k) polynomial formula (modular
    // arithmetic is associative, so both derivations agree
    // value-for-value). Pure per-row work; no shuffle before the output
    // sort.
    Q("j19_winnow_fingerprint",
      (s, d) => {
        val K = 8; val W = 4
        graft.functions.WinnowFingerprint.register(s)
        Tables.documents(s, d)
          .filter(length(col("text")) >= K + W - 1)
          .select(col("doc_id"),
            expr(s"graft_winnow(text, $K, $W)").as("fps"))
          .select(col("doc_id"), size(col("fps")).cast("long").as("n_fp"),
            expr("array_min(fps)").as("min_fp"),
            expr("array_max(fps)").as("max_fp"))
          .orderBy("doc_id")
      },
      Some {
        val K = 8; val W = 4
        val B = 257L; val M = 1000000007L
        val pows = {
          val a = new Array[Long](K)
          a(K - 1) = 1L
          ((K - 2) to 0 by -1).foreach(j => a(j) = a(j + 1) * B % M)
          a
        }
        val powList = pows.mkString("[", ", ", "]")
        s"""WITH hs AS (
              SELECT doc_id,
                     list_transform(
                       generate_series(1, length(text) - ${K - 1}),
                       i -> list_reduce(
                         list_transform(generate_series(0, ${K - 1}),
                           j -> (CAST(ascii(substring(text,
                               CAST(i + j AS INT), 1)) AS BIGINT)
                             * ($powList)[j + 1]) % $M),
                         (a, b) -> (a + b) % $M)) AS h
              FROM documents WHERE length(text) >= ${K + W - 1}),
            fps AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       generate_series(1, len(h) - ${W - 1}),
                       j -> list_min(h[j:j + ${W - 1}]))) AS fp
              FROM hs)
            SELECT doc_id, CAST(len(fp) AS BIGINT) AS n_fp,
                   CAST(list_min(fp) AS BIGINT) AS min_fp,
                   CAST(list_max(fp) AS BIGINT) AS max_fp
            FROM fps ORDER BY doc_id"""
      }),

    // Char-trigram-profile language ID — the classic n-gram heuristic:
    // per-language profiles = top-20 trigrams by corpus frequency, each doc
    // scored by distinct-trigram overlap with every profile, argmax wins.
    // Profiles are tiny (5 langs × 20) → broadcast; the two aggregations
    // shuffle on (lang, tri) and the distinct doc-trigram key. NOTE: this
    // generator assigns `lang` independently of the (shared-vocabulary)
    // text, so accuracy ≈ chance on this corpus — the query is graded on
    // the deterministic pipeline, which is exactly reproduced in SQL.
    Q("j18_langid_ngram",
      (s, d) => {
        // both branches (profile build, scoring) recompute this extraction;
        // measured THREE times now: recomputing the codegen'd substring
        // explode beats every materialization — raw-tris localCheckpoint
        // was 1.35× slower at 10× scale, and a shared (doc_id, lang, tri)
        // aggregate feeding both branches (one explode, one wide shuffle,
        // truncated) measured 1.9× slower at sf0.1 / 1.2× at 500k docs:
        // the profile branch's map-side partial aggregation makes its
        // shuffle nearly free, so the "saved" explode costs less than the
        // materialize-and-reread. Cheap-to-recompute lineage stays lineage.
        val tris = Tables.documentsSpread(s, d)
          .filter(length(col("text")) >= 3)
          .select(col("doc_id"), col("lang"), explode(expr(
            """transform(sequence(1, length(text) - 2),
               i -> substring(text, i, 3))""")).as("tri"))
        val prof = tris.groupBy("lang", "tri")
          .agg(count(lit(1)).as("n"))
          .withColumn("rk", row_number().over(Window.partitionBy("lang")
            .orderBy(col("n").desc, col("tri"))))
          .filter(col("rk") <= 20)
          .select(col("lang").as("p_lang"), col("tri"))
        // distinct BEFORE the profile join, measured deliberately: profile
        // trigrams are by construction the corpus's most frequent, so
        // joining the raw occurrence stream first MULTIPLIES rows (one per
        // matching language profile) before any de-dup — join-then-
        // countDistinct measured 1.45× SLOWER at sf0.1 (8.6 s vs 5.9 s).
        // Fourth measured negative (round 11): in-row dedup via
        // array_distinct-before-explode (j29's docGrams8 trick — valid
        // here too, the dedup key includes doc_id) is 1.37× SLOWER than
        // this shuffle distinct at sf0.1 (warm-min 4.48 s vs 3.27 s,
        // uncontended): a ~330-element array_distinct per row costs more
        // than shuffling the occurrences, because trigram rows are tiny
        // and the distinct's map-side partial aggregation already halves
        // the exchange. j29's grams win that trade only because 8-gram
        // STRINGS are wide (shuffle bytes dominate); 3-char trigrams are
        // not. Dedup placement stays the shuffle distinct.
        val scores = tris.select("doc_id", "lang", "tri").distinct()
          .join(broadcast(prof), "tri")
          .groupBy("doc_id", "lang", "p_lang")
          .agg(count(lit(1)).as("overlap"))
        val w = Window.partitionBy("doc_id")
          .orderBy(col("overlap").desc, col("p_lang"))
        scores.withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("doc_id"), col("lang").as("true_lang"),
            col("p_lang").as("pred_lang"),
            col("overlap").cast("long").as("overlap"),
            (col("p_lang") === col("lang")).as("correct"))
          .orderBy("doc_id")
      },
      Some("""WITH tris AS (
                SELECT doc_id, lang, unnest(list_transform(
                  generate_series(1, length(text) - 2),
                  i -> substring(text, CAST(i AS INT), 3))) AS tri
                FROM documents WHERE length(text) >= 3),
              prof AS (
                SELECT lang AS p_lang, tri FROM (
                  SELECT lang, tri, row_number() OVER (PARTITION BY lang
                    ORDER BY COUNT(*) DESC, tri) AS rk
                  FROM tris GROUP BY lang, tri)
                WHERE rk <= 20),
              doc_tris AS (SELECT DISTINCT doc_id, lang, tri FROM tris),
              scores AS (
                SELECT d.doc_id, d.lang AS true_lang, p.p_lang,
                       COUNT(*) AS overlap
                FROM doc_tris d JOIN prof p ON d.tri = p.tri
                GROUP BY d.doc_id, d.lang, p.p_lang)
              SELECT doc_id, true_lang, p_lang AS pred_lang,
                     CAST(overlap AS BIGINT) AS overlap,
                     (p_lang = true_lang) AS correct
              FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                      ORDER BY overlap DESC, p_lang) AS rk FROM scores)
              WHERE rk = 1 ORDER BY doc_id""")),

    // Sub-document (chunk-level) exact dedup — the "paragraph dedup" of a
    // training pipeline, at 10-token granularity since this corpus has no
    // sentence delimiters: find token runs repeated across the corpus
    // (boilerplate/header detection). One shuffle on the chunk key; output
    // keyed by md5 so row width stays constant regardless of chunk length.
    Q("j17_chunk_dedup",
      (s, d) => Tables.documentsSpread(s, d)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 10)
        .select(col("doc_id"), explode(expr(
          """transform(sequence(0, cast(floor(size(toks) / 10) as int) - 1),
             c -> concat_ws(' ', slice(toks, c * 10 + 1, 10)))"""))
          .as("chunk"))
        .groupBy("chunk")
        .agg(count(lit(1)).as("n_occ"),
          countDistinct(col("doc_id")).as("n_docs"))
        .filter(col("n_occ") > 1)
        .select(md5(col("chunk")).as("chunk_md5"), col("n_occ"),
          col("n_docs"))
        .orderBy("chunk_md5"),
      Some("""WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS t FROM documents
                WHERE len(string_split(text, ' ')) >= 10),
              chunks AS (
                SELECT doc_id, unnest(list_transform(
                  generate_series(0, CAST(floor(len(t) / 10) AS INT) - 1),
                  c -> array_to_string(t[c*10+1:c*10+10], ' '))) AS chunk
                FROM toks)
              SELECT md5(chunk) AS chunk_md5, COUNT(*) AS n_occ,
                     COUNT(DISTINCT doc_id) AS n_docs
              FROM chunks GROUP BY chunk HAVING COUNT(*) > 1
              ORDER BY chunk_md5""")),

    // Int8 symmetric quantization of the embedding column — the storage/
    // bandwidth-reduction step before an ANN index build (4× smaller than
    // float32). Per vector: scale by 127/max|x| and round each component to
    // an integer. All arithmetic is widened to double FIRST (float→double is
    // exact; double ops are IEEE-identical across engines) and both engines
    // round halves away from zero, so the quantized integers match exactly.
    // The divisor is greatest(amax, 1e-30): an all-zero vector has amax = 0
    // and would otherwise produce 0/0 = NaN, which CAST(NaN AS BIGINT)
    // throws on under ANSI; with the floor the components are exactly 0.0
    // and quantize to 0, which is the right answer for a zero vector.
    // Per-row work, zero shuffles before the output sort — at 100 TB this
    // is a pure map stage.
    Q("j20_embed_quantize",
      (s, d) => Tables.embeddings(s, d)
        .withColumn("e", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .withColumn("amax", expr("array_max(transform(e, x -> abs(x)))"))
        .withColumn("q",
          expr("transform(e, x -> CAST(round(x * 127.0 / greatest(amax, 1e-30d)) AS BIGINT))"))
        .select(col("vec_id"),
          round(col("amax"), 6).as("amax_r"),
          expr("aggregate(q, CAST(0 AS BIGINT), (a, x) -> a + x)").as("qsum"),
          expr("aggregate(q, CAST(0 AS BIGINT), (a, x) -> a + abs(x))")
            .as("ql1"),
          expr("array_max(q)").as("qmax"))
        .orderBy("vec_id"),
      Some("""WITH t AS (
                SELECT vec_id,
                       list_transform(embedding, x -> x::DOUBLE) AS e
                FROM embeddings),
              a AS (
                SELECT vec_id, e,
                       list_max(list_transform(e, x -> abs(x))) AS amax
                FROM t),
              qq AS (
                SELECT vec_id, amax,
                       list_transform(e,
                         x -> CAST(round(x * 127.0 / greatest(amax, 1e-30))
                           AS BIGINT)) AS q
                FROM a)
              SELECT vec_id, round(amax, 6) AS amax_r,
                     CAST(list_sum(q) AS BIGINT) AS qsum,
                     CAST(list_sum(list_transform(q, x -> abs(x)))
                       AS BIGINT) AS ql1,
                     CAST(list_max(q) AS BIGINT) AS qmax
              FROM qq ORDER BY vec_id""")),

    // Text-cleaning kernel — the canonical normalization pass (cleanCol)
    // before hashing/dedup in a training-data pipeline. Output is the
    // cleaned text's md5 + size stats so the oracle column stays narrow.
    Q("j21_text_clean",
      (s, d) => Tables.documents(s, d)
        .withColumn("clean", cleanCol(col("text")))
        .select(col("doc_id"), md5(col("clean")).as("clean_md5"),
          length(col("clean")).cast("long").as("clean_len"),
          size(split(col("clean"), " ")).cast("long").as("clean_toks"))
        .orderBy("doc_id"),
      Some(s"""WITH c AS (
                SELECT doc_id, $CleanSql AS clean
                FROM documents)
              SELECT doc_id, md5(clean) AS clean_md5,
                     CAST(length(clean) AS BIGINT) AS clean_len,
                     CAST(len(string_split(clean, ' ')) AS BIGINT)
                       AS clean_toks
              FROM c ORDER BY doc_id""")),

    // Corpus vocabulary build: top-20 tokens by document frequency (then
    // total frequency, then token — a total order). One shuffle on the
    // token; df and tf ride the same partial/final aggregation. At 100 TB
    // this is word count with a bounded top-k output
    // (TakeOrderedAndProject), never a global sort.
    Q("j22_vocab_topk",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok")
        .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
        .select("tok", "tf", "df")
        .orderBy(col("df").desc, col("tf").desc, col("tok"))
        .limit(20),
      Some("""SELECT tok, CAST(count(*) AS BIGINT) AS tf,
                     CAST(count(DISTINCT doc_id) AS BIGINT) AS df
              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                    FROM documents)
              GROUP BY tok ORDER BY df DESC, tf DESC, tok LIMIT 20""")),

    // Document-length histogram: fixed-width 50-char buckets via integer
    // division (no width_bucket — DuckDB and Spark agree exactly on
    // `div`/`//` over BIGINT). The length-distribution profile drives
    // quality-filter thresholds; per-bucket lang spread shows mixture.
    Q("j23_doclen_hist",
      (s, d) => Tables.documents(s, d)
        .withColumn("bucket", expr("n_chars div 50"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          min("n_chars").as("min_chars"),
          max("n_chars").as("max_chars"),
          countDistinct(col("lang")).as("n_langs"))
        .orderBy("bucket"),
      Some("""SELECT n_chars // 50 AS bucket, count(*) AS n_docs,
                     min(n_chars) AS min_chars, max(n_chars) AS max_chars,
                     CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
              FROM documents GROUP BY bucket ORDER BY bucket""")),

    // Word 3-gram CONTAINMENT (|A∩B| / |A|) — the asymmetric companion to
    // j9's Jaccard: high containment with low Jaccard means doc A is a
    // subset/boilerplate fragment of a larger doc B, which Jaccard's
    // union-normalization hides. Same inverted-index (posting-list) join
    // shape as j9 — linear in Σ df(gram)², never an n² pair scan.
    Q("j24_ngram_containment",
      (s, d) => ngramPairCounts(s, d)
          .withColumn("cont_ab", col("inter").cast("double") / col("sa"))
          .withColumn("cont_ba", col("inter").cast("double") / col("sb"))
          .filter(greatest(col("cont_ab"), col("cont_ba")) >= 0.5)
          .select(col("doc_a"), col("doc_b"),
            round(col("cont_ab"), 4).as("cont_ab"),
            round(col("cont_ba"), 4).as("cont_ba"))
          .orderBy("doc_a", "doc_b"),
      Some("""WITH ng AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                         generate_series(1, len(string_split(text,' '))-2),
                         i -> concat_ws(' ', string_split(text,' ')[i],
                           string_split(text,' ')[i+1],
                           string_split(text,' ')[i+2]))) AS g
                FROM documents WHERE lang = 'en'
                  AND len(string_split(text, ' ')) >= 3)
              SELECT doc_a, doc_b, round(cont_ab, 4) AS cont_ab,
                     round(cont_ba, 4) AS cont_ba FROM (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                         / len(a.g) AS cont_ab,
                       CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                         / len(b.g) AS cont_ba
                FROM ng a JOIN ng b ON a.doc_id < b.doc_id)
              WHERE greatest(cont_ab, cont_ba) >= 0.5
              ORDER BY doc_a, doc_b""")),

    // Dataset-card statistics per source: the corpus summary a training-data
    // pipeline publishes — volume, language spread, size, and exact-dup
    // ratio in basis points (integer — no double division in output).
    Q("j25_dataset_stats",
      (s, d) => Tables.documents(s, d)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("n_chars")).as("total_chars"),
          countDistinct(col("text")).as("n_uniq"))
        .select(col("source"), col("n_docs"), col("n_langs"),
          col("total_chars"),
          // `div`, not `/`: Spark's Column./ is always double division
          expr("(n_docs - n_uniq) * 10000 div n_docs").as("dup_bp"))
        .orderBy("source"),
      Some("""SELECT source, count(*) AS n_docs,
                     CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                     CAST(sum(n_chars) AS BIGINT) AS total_chars,
                     (count(*) - count(DISTINCT text)) * 10000 // count(*)
                       AS dup_bp
              FROM documents GROUP BY source ORDER BY source""")),

    // End-to-end training-data pipeline composite — the flagship chain a
    // consumer actually runs: normalize text (cleanCol) → quality filter
    // (length + repeated-token ratio) → exact dedup on the cleaned content
    // (lowest doc_id survives) → per-language yield accounting. The dedup
    // window partitions on md5(clean), NOT the text itself — the shuffle
    // key is 32 bytes regardless of document length, which is what makes
    // the one keyed shuffle cheap at 100 TB (same stance as j17's
    // md5-keyed chunks).
    Q("j26_pipeline_e2e",
      (s, d) => {
        val w = Window.partitionBy("ch").orderBy("doc_id")
        Tables.documents(s, d)
          .withColumn("clean", cleanCol(col("text")))
          .withColumn("toks", split(col("clean"), " "))
          .filter(length(col("clean")) >= 50 &&
            // repeated-token ratio < 0.8: distinct tokens / tokens > 0.2
            size(array_distinct(col("toks"))).cast("double") /
              size(col("toks")) > 0.2)
          .withColumn("ch", md5(col("clean")))
          // fixed-width rows through the dedup shuffle: carry the token
          // COUNT, not the token array (verified in the plan — without this
          // the exchange hauls the full toks array per row)
          .withColumn("n_toks", size(col("toks")).cast("long"))
          .select("doc_id", "lang", "ch", "n_toks")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .groupBy("lang")
          .agg(count(lit(1)).as("kept_docs"),
            sum(col("n_toks")).as("kept_tokens"),
            min("doc_id").as("first_doc"))
          .orderBy("lang")
      },
      Some(s"""WITH cleaned AS (
                SELECT doc_id, lang, $CleanSql AS clean
                FROM documents),
              filtered AS (
                SELECT doc_id, lang, clean,
                       len(string_split(clean, ' ')) AS n_toks,
                       len(list_distinct(string_split(clean, ' '))) AS n_uniq
                FROM cleaned
                WHERE length(clean) >= 50),
              quality AS (
                SELECT doc_id, lang, clean, n_toks FROM filtered
                WHERE CAST(n_uniq AS DOUBLE) / n_toks > 0.2),
              deduped AS (
                SELECT doc_id, lang, n_toks FROM (
                  SELECT doc_id, lang, n_toks,
                         row_number() OVER (PARTITION BY md5(clean)
                           ORDER BY doc_id) AS rn
                  FROM quality)
                WHERE rn = 1)
              SELECT lang, count(*) AS kept_docs,
                     CAST(sum(n_toks) AS BIGINT) AS kept_tokens,
                     min(doc_id) AS first_doc
              FROM deduped GROUP BY lang ORDER BY lang""")),

    // Bigram collocation extraction by pointwise mutual information — the
    // corpus-analysis pass behind tokenizer/vocab design (which word pairs
    // behave as units and deserve a merged token). PMI(a,b) =
    // ln( p(ab) / (p(a)·p(b)) ) with p from corpus counts; min-count floor
    // keeps rare-pair noise out; ranking on the ROUNDED value + bigram
    // tie-break is a total order. Two keyed shuffles (bigram counts, token
    // counts); corpus totals are 1-row broadcasts; the bounded-vocab token
    // counts broadcast into the bigram side (shuffle join is the unbounded-
    // vocab fallback); top-20 plans as TakeOrderedAndProject. The double
    // arithmetic is written with the SAME operation order in both engines,
    // and ln is rounded at 6 dp per the §5.3 libm rule.
    Q("j27_bigram_pmi",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(split(col("text"), " ").as("t"))
          .filter(size(col("t")) >= 2)
        val unic = toks.select(explode(col("t")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("n_u"))
        val bgc = toks.select(explode(expr(
            """transform(sequence(1, size(t) - 1),
               i -> struct(element_at(t, i) AS a, element_at(t, i + 1) AS b))"""))
            .as("p"))
          .select(col("p.a").as("a"), col("p.b").as("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
        val totB = bgc.agg(sum("n_ab").as("tot_b"))
        val totU = unic.agg(sum("n_u").as("tot_u"))
        bgc.filter(col("n_ab") >= 20)
          .join(broadcast(unic.select(col("tok").as("a"),
            col("n_u").as("n_a"))), "a")
          .join(broadcast(unic.select(col("tok").as("b"),
            col("n_u").as("n_b"))), "b")
          .crossJoin(broadcast(totB)).crossJoin(broadcast(totU))
          .select(
            concat_ws(" ", col("a"), col("b")).as("bigram"),
            col("n_ab"),
            round(log(
              (col("n_ab").cast("double") / col("tot_b")) /
                ((col("n_a").cast("double") / col("tot_u")) *
                  (col("n_b").cast("double") / col("tot_u")))), 6).as("pmi"))
          .orderBy(col("pmi").desc, col("bigram"))
          .limit(20)
      },
      Some("""WITH toks AS (
                SELECT string_split(text, ' ') AS t FROM documents
                WHERE len(string_split(text, ' ')) >= 2),
              unic AS (
                SELECT tok, COUNT(*) AS n_u FROM (
                  SELECT unnest(t) AS tok FROM toks) GROUP BY tok),
              bgc AS (
                SELECT p.a AS a, p.b AS b, COUNT(*) AS n_ab FROM (
                  SELECT unnest(list_transform(
                    generate_series(1, len(t) - 1),
                    i -> {'a': t[i], 'b': t[i + 1]})) AS p FROM toks)
                GROUP BY 1, 2),
              totb AS (SELECT SUM(n_ab) AS tot_b FROM bgc),
              totu AS (SELECT SUM(n_u) AS tot_u FROM unic)
              SELECT a || ' ' || b AS bigram, n_ab,
                     round(ln((n_ab::DOUBLE / tot_b) /
                       ((ua.n_u::DOUBLE / tot_u) *
                        (ub.n_u::DOUBLE / tot_u))), 6) AS pmi
              FROM bgc
              JOIN unic ua ON bgc.a = ua.tok
              JOIN unic ub ON bgc.b = ub.tok
              CROSS JOIN totb CROSS JOIN totu
              WHERE n_ab >= 20
              ORDER BY pmi DESC, bigram LIMIT 20""")),

    // Unigram-LM surprisal per document — the cheap deterministic cousin of
    // perplexity-based quality filtering (CCNet-style): score each doc by
    // −mean ln p(token) under the corpus unigram model; high surprisal =
    // rare-token-heavy text. Float-sum ordering is the hazard here (a
    // shuffle-order Σln would differ from DuckDB in the last ulp), so the
    // per-doc sum is an ORDER-PINNED fold: counts are collected as
    // (pos, n) structs, sort_array'd, and reduced left-to-right with an
    // explicit 0.0 seed — bit-identical to DuckDB's list_reduce over the
    // same pos-ordered list (the `graft_dot` in-order-fold technique).
    // Scale: one token-count shuffle + the per-doc regroup; the unigram
    // table broadcasts (bounded vocab — shuffle join is the fallback);
    // per-doc arrays are bounded by doc length, never by corpus size.
    Q("j28_unigram_surprisal",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        val unic = toks.groupBy("tok").agg(count(lit(1)).as("n_u"))
        val tot = unic.agg(sum("n_u").as("tot_u"))
        toks.join(broadcast(unic), "tok")
          .groupBy("doc_id")
          .agg(sort_array(collect_list(struct(col("pos"), col("n_u"))))
            .as("pn"))
          .crossJoin(broadcast(tot))
          .select(col("doc_id"),
            size(col("pn")).cast("long").as("n_toks"),
            round(expr(
              """-(aggregate(transform(pn, x -> x.n_u), CAST(0 AS DOUBLE),
                   (a, n) -> a + ln(CAST(n AS DOUBLE) / tot_u))
                 / size(pn))"""), 6).as("surprisal"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
                SELECT doc_id, p.pos AS pos, p.tok AS tok FROM (
                  SELECT doc_id, unnest(list_transform(
                    generate_series(1, len(string_split(text, ' '))),
                    i -> {'pos': i, 'tok': string_split(text, ' ')[i]})) AS p
                  FROM documents)),
              unic AS (
                SELECT tok, COUNT(*) AS n_u FROM toks GROUP BY tok),
              tot AS (SELECT SUM(n_u) AS tot_u FROM unic),
              arrs AS (
                SELECT doc_id, list(n_u ORDER BY pos) AS pn
                FROM toks JOIN unic USING (tok)
                GROUP BY doc_id)
              SELECT doc_id, CAST(len(pn) AS BIGINT) AS n_toks,
                     round(-(list_reduce(
                         list_transform(pn, n -> ln(n::DOUBLE / tot_u)),
                         (a, b) -> a + b)
                       / len(pn)), 6) AS surprisal
              FROM arrs CROSS JOIN tot ORDER BY doc_id""")),

    // Benchmark decontamination — the pre-training hygiene pass: flag
    // training documents sharing any word 8-gram with the held-out eval
    // set (stand-in eval slice: doc_id % 20 == 0). The asymmetry is the
    // scale story: the eval set is a FIXED benchmark suite, so its distinct
    // 8-gram set broadcasts (or ships as a bloom filter) and contamination
    // detection is a map-side probe of the 100 TB training stream — no
    // wide join ever touches the training side; the only keyed shuffles
    // are the per-doc distinct-gram dedups. Output: every contaminated
    // training doc with its distinct-8-gram total and hit count.
    Q("j29_decontaminate",
      (s, d) => {
        // the eval-gram set is lineage-truncated ONCE (it re-scans only
        // the eval 5% of documents); the training side is a single
        // pipelined pass — docGrams8 dedupes per doc with array_distinct,
        // so no corpus-wide gram distinct and no materialized gram table
        // (the checkpoint-the-gram-table shape measured 116 s at 500k
        // docs where this one runs warm in ~13 s; see docGrams8).
        // Broadcast boundedness: an eval set is O(benchmark-suite) by
        // nature — fixed, not a corpus fraction (the 5% filter is only
        // this demo's stand-in). If eval grams ever outgrow broadcast,
        // j43 is the designed fallback: same probe as a fixed-memory
        // bloom filter with one-sided error.
        val evalG = truncateLineage(
          docGrams8(Tables.documentsSpread(s, d)
            .filter(col("doc_id") % 20 === 0))
            .select("g8").distinct())
          .withColumn("hit", lit(true))
        // one pass over the training grams: the broadcast LEFT probe tags
        // hits (evalG is distinct on g8, so no row multiplication) and a
        // single keyed aggregate yields total + hit counts together — no
        // totals/hits diamond, no second aggregate-and-rejoin
        docGrams8(Tables.documentsSpread(s, d)
          .filter(col("doc_id") % 20 =!= 0))
          .join(broadcast(evalG), Seq("g8"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_g8"), count(col("hit")).as("n_hit"))
          .filter(col("n_hit") > 0)
          .select(col("doc_id"), col("n_g8"), col("n_hit"))
          .orderBy("doc_id")
      },
      Some("""WITH grams AS (
                SELECT DISTINCT doc_id, g8 FROM (
                  SELECT doc_id, unnest(list_transform(
                    generate_series(1, len(t) - 7),
                    i -> array_to_string(t[i:i + 7], ' '))) AS g8
                  FROM (SELECT doc_id, string_split(text, ' ') AS t
                        FROM documents WHERE
                          len(string_split(text, ' ')) >= 8))),
              ev AS (
                SELECT DISTINCT g8 FROM grams WHERE doc_id % 20 = 0),
              train AS (
                SELECT doc_id, g8 FROM grams WHERE doc_id % 20 != 0),
              totals AS (
                SELECT doc_id, COUNT(*) AS n_g8 FROM train GROUP BY doc_id)
              SELECT t.doc_id, n_g8, COUNT(*) AS n_hit
              FROM train t JOIN ev USING (g8) JOIN totals USING (doc_id)
              GROUP BY t.doc_id, n_g8 ORDER BY t.doc_id""")),

    // Repetition / boilerplate scoring — the Gopher-style quality rule:
    // per-doc duplicate-token and duplicate-word-trigram fractions, in
    // basis points (integer division — no double division in output, §5.3).
    // Map-only at any scale: every column is per-row array math over the
    // codegen'd split/transform, the only exchange is the output sort.
    // Docs under 3 tokens have no trigram and are filtered (sequence(1, n)
    // DESCENDS for n < 1 — same guard as j29's 8-grams).
    Q("j31_dup_ngram_ratio",
      (s, d) => Tables.documentsSpread(s, d)
        .withColumn("t", split(col("text"), " "))
        .filter(size(col("t")) >= 3)
        .withColumn("g3", expr(
          """transform(sequence(1, size(t) - 2),
             i -> concat_ws(' ', slice(t, i, 3)))"""))
        .select(col("doc_id"),
          size(col("t")).cast("long").as("n_tokens"),
          // `div`, not `/`: Spark's Column./ is always double division
          expr("(size(t) - size(array_distinct(t))) * 10000 div size(t)")
            .as("dup_tok_bp"),
          size(col("g3")).cast("long").as("n_tri"),
          expr("(size(g3) - size(array_distinct(g3))) * 10000 div size(g3)")
            .as("dup_tri_bp"))
        // two-signal flag, thresholds near p99/p90 of the synthetic corpus
        // so the rule actually discriminates (a never-firing flag is vacuous)
        .withColumn("flagged",
          (col("dup_tri_bp") > 150 || col("dup_tok_bp") > 6500).cast("int"))
        .orderBy("doc_id"),
      Some("""WITH a AS (
                SELECT doc_id, string_split(text, ' ') AS t FROM documents
                WHERE len(string_split(text, ' ')) >= 3),
              b AS (
                SELECT doc_id, t,
                       list_transform(generate_series(1, len(t) - 2),
                         i -> array_to_string(t[i:i + 2], ' ')) AS g3
                FROM a),
              c AS (
                SELECT doc_id,
                       CAST(len(t) AS BIGINT) AS n_tokens,
                       (len(t) - len(list_distinct(t))) * 10000 // len(t)
                         AS dup_tok_bp,
                       CAST(len(g3) AS BIGINT) AS n_tri,
                       (len(g3) - len(list_distinct(g3))) * 10000 // len(g3)
                         AS dup_tri_bp
                FROM b)
              SELECT doc_id, n_tokens, dup_tok_bp, n_tri, dup_tri_bp,
                     CAST(dup_tri_bp > 150 OR dup_tok_bp > 6500 AS INTEGER)
                       AS flagged
              FROM c ORDER BY doc_id""")),

    // Training-mixture sampling — deterministic per-source downsampling to
    // target rates. The 100-TB story: the rate derives from the source name
    // ((src# % 5 + 1) / 10) and the keep decision is a per-row integer LCG
    // over doc_id, so sampling is a pure MAP-SIDE filter of the document
    // stream — no shuffle, no RNG state, reproducible across reruns and
    // engines (rand() is neither). The only exchange here is the tiny
    // per-source yield summary this query emits to audit the mixture.
    // All arithmetic is exact BIGINT: u < rate*2^31 is tested as
    // u*10 < k*2^31 to avoid engine-divergent double→int casts.
    // Naming contract: sources are 'src<N>' (TESTDATA [E2]). try_cast (not
    // cast — ANSI mode throws CAST_INVALID_INPUT on '' / non-numeric) maps
    // any other shape to a NULL rate, and the violation is LOUD: such a
    // source keeps nothing AND emits unmatched=1, so a mis-named corpus
    // shows up in the audit table instead of silently vanishing from the
    // mixture. DuckDB's TRY_CAST has the same NULL-on-failure contract, so
    // the oracle can't diverge on bad names either.
    Q("j32_mixture_sample",
      (s, d) => Tables.documents(s, d)
        .withColumn("k",
          expr("try_cast(substring(source, 4) as int) % 5 + 1"))
        .withColumn("kept", expr(
          """CASE WHEN ((doc_id % 100000007) * 1103515245 + 12345)
                       % 2147483648 * 10 < k * 2147483648
             THEN 1 END"""))
        .groupBy("source")
        .agg(max(col("k")).as("k"),
          count(lit(1)).as("n_docs"),
          count(col("kept")).as("n_kept"))
        .select(col("source"), round(col("k") / 10.0, 1).as("rate"),
          col("n_docs"), col("n_kept"),
          expr("n_kept * 10000 div n_docs").as("kept_bp"),
          expr("cast(k is null as int)").as("unmatched"))
        .orderBy("source"),
      Some("""WITH s AS (
                SELECT source,
                       TRY_CAST(substr(source, 4) AS INT) % 5 + 1 AS k,
                       ((doc_id % 100000007) * 1103515245 + 12345)
                         % 2147483648 * 10 AS u10
                FROM documents)
              SELECT source, round(max(k) / 10.0, 1) AS rate,
                     count(*) AS n_docs,
                     CAST(count(*) FILTER (WHERE u10 < k * 2147483648)
                       AS BIGINT) AS n_kept,
                     count(*) FILTER (WHERE u10 < k * 2147483648) * 10000
                       // count(*) AS kept_bp,
                     CAST(max(k) IS NULL AS INT) AS unmatched
              FROM s GROUP BY source ORDER BY source""")),

    // Sequence-length histogram — the packing/seq-len planning profile: doc
    // token counts bucketed at width 32, with cumulative doc share in basis
    // points. One keyed aggregate over the corpus; the windows run on the
    // few-dozen-row HISTOGRAM (single-partition window is deliberate and
    // safe — its input is the aggregated bucket table, never the corpus).
    Q("j33_seqlen_hist",
      (s, d) => {
        val h = Tables.documents(s, d)
          .select(expr("size(split(text, ' '))").as("tok"))
          .select(expr("tok div 32").as("bucket"), col("tok"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"), sum("tok").as("sum_tokens"))
        val cum = Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = Window.partitionBy()
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        h.withColumn("cum_docs", sum("n_docs").over(cum))
          .withColumn("total", sum("n_docs").over(tot))
          .select(col("bucket"), (col("bucket") * 32).as("lo"),
            (col("bucket") * 32 + 31).as("hi"),
            col("n_docs"), col("sum_tokens"), col("cum_docs"),
            expr("cum_docs * 10000 div total").as("cum_bp"))
          .orderBy("bucket")
      },
      Some("""WITH h AS (
                SELECT len(string_split(text, ' ')) // 32 AS bucket,
                       count(*) AS n_docs,
                       CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                         AS sum_tokens
                FROM documents GROUP BY 1)
              SELECT bucket, bucket * 32 AS lo, bucket * 32 + 31 AS hi,
                     n_docs, sum_tokens,
                     CAST(sum(n_docs) OVER (ORDER BY bucket) AS BIGINT)
                       AS cum_docs,
                     CAST(sum(n_docs) OVER (ORDER BY bucket) AS BIGINT)
                       * 10000 // CAST(sum(n_docs) OVER () AS BIGINT)
                       AS cum_bp
              FROM h ORDER BY bucket""")),

    // Training-sequence packing — concat-and-chunk: docs concatenated in
    // doc_id order and split into 2048-token context windows, the way LLM
    // pre-training actually consumes a corpus. pack_id = running-token-sum
    // start div 2048, plus a boundary-crossing flag, rolled up per pack.
    // The 100-TB story: the running sum partitions on (source, shard =
    // doc_id div 100k) — packing is order-sensitive so it CANNOT be a plain
    // map, but sub-sharding bounds every window partition to ~100k docs, so
    // the corpus packs in parallel instead of serializing per source (the
    // unsharded variant would put a whole source's docs through one task).
    Q("j34_seq_packing",
      (s, d) => {
        val w = Window.partitionBy("source", "shard").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            expr("doc_id div 100000").as("shard"),
            expr("size(split(text, ' '))").as("toks"))
          .withColumn("cum", sum("toks").over(w))
          .withColumn("pack_id", expr("(cum - toks) div 2048"))
          .withColumn("spans",
            expr("cast((cum - 1) div 2048 != pack_id as int)"))
          .groupBy("source", "shard", "pack_id")
          .agg(count(lit(1)).as("n_docs"),
            sum("toks").cast("long").as("n_tokens"),
            sum("spans").cast("long").as("n_spanning"))
          .orderBy("source", "shard", "pack_id")
      },
      Some("""WITH t AS (
                SELECT doc_id, source, doc_id // 100000 AS shard,
                       len(string_split(text, ' ')) AS toks
                FROM documents),
              w AS (
                SELECT source, shard, toks,
                       CAST(sum(toks) OVER (PARTITION BY source, shard
                         ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                         AS BIGINT) AS cum
                FROM t),
              p AS (
                SELECT source, shard, (cum - toks) // 2048 AS pack_id, toks,
                       CASE WHEN (cum - 1) // 2048 != (cum - toks) // 2048
                            THEN 1 ELSE 0 END AS spans
                FROM w)
              SELECT source, shard, pack_id, count(*) AS n_docs,
                     CAST(sum(toks) AS BIGINT) AS n_tokens,
                     CAST(sum(spans) AS BIGINT) AS n_spanning
              FROM p GROUP BY source, shard, pack_id
              ORDER BY source, shard, pack_id""")),

    // Mixture drift monitoring — per-source unigram-distribution L1
    // distance vs the corpus, over the global top-50 vocabulary, in EXACT
    // basis points (per-token shares via BIGINT div — integer arithmetic
    // end to end, so the drift number can hash-match across engines; a
    // double KL/chi-square would flake at the last ulp). Shape: ONE
    // token-count shuffle; source totals, global counts, and the top-50
    // all derive from that count table (vocabulary-sized); the 50×sources
    // grid is broadcast back against the counts, so the corpus is never
    // re-scanned and nothing wide shuffles twice.
    Q("j35_unigram_drift",
      (s, d) => {
        val counts = truncateLineage(Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
          .groupBy("source", "tok").agg(count(lit(1)).as("c")))
        val stot = counts.groupBy("source").agg(sum("c").as("stot"))
        val glob = counts.groupBy("tok").agg(sum("c").as("gc"))
        val ctot = glob.agg(sum("gc").as("ctot"))
        val top = glob.crossJoin(broadcast(ctot))
          .orderBy(col("gc").desc, col("tok")).limit(50)
        broadcast(top).crossJoin(broadcast(stot))
          .join(counts, Seq("source", "tok"), "left")
          .select(col("source"),
            expr("coalesce(c, 0) * 10000 div stot").as("obs_bp"),
            expr("gc * 10000 div ctot").as("corpus_bp"))
          .groupBy("source")
          .agg(sum(expr("abs(obs_bp - corpus_bp)")).cast("long")
            .as("drift_bp_l1"))
          .orderBy("source")
      },
      Some("""WITH e AS (
                SELECT source, unnest(string_split(text, ' ')) AS tok
                FROM documents),
              cnt AS (SELECT source, tok, count(*) AS c FROM e GROUP BY 1, 2),
              stot AS (SELECT source, CAST(sum(c) AS BIGINT) AS stot
                       FROM cnt GROUP BY 1),
              gcnt AS (SELECT tok, CAST(sum(c) AS BIGINT) AS gc
                       FROM cnt GROUP BY 1),
              ctot AS (SELECT CAST(sum(gc) AS BIGINT) AS ctot FROM gcnt),
              top AS (SELECT tok, gc FROM gcnt ORDER BY gc DESC, tok
                      LIMIT 50),
              grid AS (SELECT s.source, s.stot, t.tok, t.gc, c.ctot
                       FROM stot s CROSS JOIN top t CROSS JOIN ctot c),
              j AS (SELECT g.source,
                           coalesce(c.c, 0) * 10000 // g.stot AS obs_bp,
                           g.gc * 10000 // g.ctot AS corpus_bp
                    FROM grid g LEFT JOIN cnt c
                      ON c.source = g.source AND c.tok = g.tok)
              SELECT source,
                     CAST(sum(abs(obs_bp - corpus_bp)) AS BIGINT)
                       AS drift_bp_l1
              FROM j GROUP BY source ORDER BY source""")),

    // Train/val/test holdout split — the j32 exact-BIGINT LCG over doc_id,
    // mod 100 → 80/10/10. No RNG state: the assignment is a pure function
    // of doc_id, reproducible across engines and reruns, so at 100 TB the
    // split is a map-side tag on the document stream (j29's decontamination
    // would then run val/test against train). Emitted audit: per
    // (lang, split) counts + within-lang share in basis points — the tiny
    // (languages × 3)-row table; the window runs on the audit, not the
    // corpus.
    Q("j36_data_split",
      (s, d) => {
        val a = Tables.documents(s, d)
          .withColumn("u",
            expr("((doc_id % 1000003) * 2654435761 + 101) % 2147483648 % 100"))
          .withColumn("split", expr(
            """CASE WHEN u < 80 THEN 'train'
                    WHEN u < 90 THEN 'val' ELSE 'test' END"""))
          .groupBy("lang", "split").agg(count(lit(1)).as("n_docs"))
        val wl = Window.partitionBy("lang")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        a.withColumn("lang_total", sum("n_docs").over(wl))
          .select(col("lang"), col("split"), col("n_docs"),
            expr("n_docs * 10000 div lang_total").as("share_bp"))
          .orderBy("lang", "split")
      },
      Some("""WITH b AS (
                SELECT lang,
                       ((doc_id % 1000003) * 2654435761 + 101)
                         % 2147483648 % 100 AS u
                FROM documents),
              s AS (SELECT lang,
                           CASE WHEN u < 80 THEN 'train'
                                WHEN u < 90 THEN 'val' ELSE 'test' END
                             AS split
                    FROM b),
              a AS (SELECT lang, split, count(*) AS n_docs
                    FROM s GROUP BY 1, 2)
              SELECT lang, split, n_docs,
                     n_docs * 10000 //
                       CAST(sum(n_docs) OVER (PARTITION BY lang) AS BIGINT)
                       AS share_bp
              FROM a ORDER BY lang, split""")),

    // Skip-gram collocation PMI — j27's window generalization (word2vec-
    // style): co-occurrence pairs at token distance 1..3, not just adjacent
    // bigrams, the statistic behind embedding-training context windows and
    // phrase mining. The 100-TB shape is the point: pairs are generated
    // PER ROW by nested array transforms (map-side, no positional
    // self-join — a posexplode + range self-join on doc_id would shuffle
    // the corpus twice and explode skewed long docs quadratically), then
    // counted in one keyed shuffle. Spark's sequence(1, n) descends for
    // n < 1 so the k=2,3 offsets guard the short-doc case with an explicit
    // CASE (same pitfall as ShingleExpr); DuckDB's generate_series is
    // empty there. Ranking on the ROUNDED pmi + pair tie-break per §5.3.
    Q("j37_skipgram_pmi",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(split(col("text"), " ").as("t"))
          .filter(size(col("t")) >= 2)
        val pairs = toks.select(explode(expr(
            """flatten(transform(sequence(1, 3), k ->
                 CASE WHEN size(t) - k >= 1
                 THEN transform(sequence(1, size(t) - k),
                      i -> struct(element_at(t, i) AS a,
                                  element_at(t, i + k) AS b))
                 ELSE array() END))""")).as("p"))
          .select(col("p.a").as("a"), col("p.b").as("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
        val unic = toks.select(explode(col("t")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("n_u"))
        val totP = pairs.agg(sum("n_ab").as("tot_p"))
        val totU = unic.agg(sum("n_u").as("tot_u"))
        pairs.filter(col("n_ab") >= 30)
          .join(broadcast(unic.select(col("tok").as("a"),
            col("n_u").as("n_a"))), "a")
          .join(broadcast(unic.select(col("tok").as("b"),
            col("n_u").as("n_b"))), "b")
          .crossJoin(broadcast(totP)).crossJoin(broadcast(totU))
          .select(
            concat_ws(" ", col("a"), col("b")).as("pair"),
            col("n_ab"),
            round(log(
              (col("n_ab").cast("double") / col("tot_p")) /
                ((col("n_a").cast("double") / col("tot_u")) *
                  (col("n_b").cast("double") / col("tot_u")))), 6).as("pmi"))
          .orderBy(col("pmi").desc, col("pair"))
          .limit(20)
      },
      Some("""WITH toks AS (
                SELECT string_split(text, ' ') AS t FROM documents
                WHERE len(string_split(text, ' ')) >= 2),
              pairs AS (
                SELECT p.a AS a, p.b AS b, COUNT(*) AS n_ab FROM (
                  SELECT unnest(flatten(list_transform(
                    generate_series(1, 3), k -> list_transform(
                      generate_series(1, len(t) - k),
                      i -> {'a': t[i], 'b': t[i + k]})))) AS p
                  FROM toks)
                GROUP BY 1, 2),
              unic AS (
                SELECT tok, COUNT(*) AS n_u FROM (
                  SELECT unnest(t) AS tok FROM toks) GROUP BY tok),
              totp AS (SELECT SUM(n_ab) AS tot_p FROM pairs),
              totu AS (SELECT SUM(n_u) AS tot_u FROM unic)
              SELECT a || ' ' || b AS pair, n_ab,
                     round(ln((n_ab::DOUBLE / tot_p) /
                       ((ua.n_u::DOUBLE / tot_u) *
                        (ub.n_u::DOUBLE / tot_u))), 6) AS pmi
              FROM pairs
              JOIN unic ua ON pairs.a = ua.tok
              JOIN unic ub ON pairs.b = ub.tok
              CROSS JOIN totp CROSS JOIN totu
              WHERE n_ab >= 30
              ORDER BY pmi DESC, pair LIMIT 20""")),

    // BM25 keyword retrieval — top-10 documents for the fixed query
    // {spark, join, stream} (k1=1.2, b=0.75), the lexical-retrieval half of
    // a RAG / eval-search stack. Scale shape: the token stream is filtered
    // to the query terms BEFORE the keyed shuffle (at 100 TB only matching
    // tokens leave the mappers), the per-doc tf table is lineage-truncated
    // ONCE and re-aggregated for document frequencies (tiny — matched docs
    // only), and corpus stats (N, Σdl) come from a separate count-only pass
    // with no explode. Per-term scores live in disjoint conditional-sum
    // slots (each sums ONE nonzero value + exact 0.0s — no float-order
    // hazard) and combine in a fixed a+b+c order; ranking uses the ROUNDED
    // score + doc_id tie-break, planning as TakeOrderedAndProject.
    Q("j38_bm25_topk",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("dl"),
            split(col("text"), " ").as("t"))
        val corpus = base.agg(count(lit(1)).as("n_docs"),
          sum("dl").as("sum_dl"))
        val tf = truncateLineage(base
          .select(col("doc_id"), col("dl"), explode(col("t")).as("w"))
          .filter(col("w").isin("spark", "join", "stream"))
          .groupBy("doc_id")
          .agg(max("dl").as("dl"),
            sum(when(col("w") === "spark", 1).otherwise(0)).as("tf1"),
            sum(when(col("w") === "join", 1).otherwise(0)).as("tf2"),
            sum(when(col("w") === "stream", 1).otherwise(0)).as("tf3")))
        val dfs = tf.agg(
          sum(expr("cast(tf1 > 0 as int)")).as("df1"),
          sum(expr("cast(tf2 > 0 as int)")).as("df2"),
          sum(expr("cast(tf3 > 0 as int)")).as("df3"))
        def term(i: Int) =
          s"""CASE WHEN tf$i > 0
              THEN ln((n_docs - df$i + 0.5) / (df$i + 0.5) + 1.0) *
                   (tf$i * 2.2) /
                   (tf$i + 1.2 * (1.0 - 0.75 + 0.75 * (dl / avgdl)))
              ELSE 0.0 END"""
        tf.crossJoin(broadcast(dfs)).crossJoin(broadcast(corpus))
          .withColumn("avgdl", expr("cast(sum_dl as double) / n_docs"))
          .withColumn("score",
            round(expr(s"${term(1)} + ${term(2)} + ${term(3)}"), 4))
          .select("doc_id", "tf1", "tf2", "tf3", "score")
          .orderBy(col("score").desc, col("doc_id"))
          .limit(10)
      },
      Some("""WITH base AS (
                SELECT doc_id,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
                       string_split(text, ' ') AS t
                FROM documents),
              corpus AS (SELECT COUNT(*) AS n_docs,
                                CAST(SUM(dl) AS BIGINT) AS sum_dl FROM base),
              tf AS (
                SELECT doc_id, MAX(dl) AS dl,
                       CAST(SUM(CASE WHEN w = 'spark' THEN 1 ELSE 0 END)
                         AS BIGINT) AS tf1,
                       CAST(SUM(CASE WHEN w = 'join' THEN 1 ELSE 0 END)
                         AS BIGINT) AS tf2,
                       CAST(SUM(CASE WHEN w = 'stream' THEN 1 ELSE 0 END)
                         AS BIGINT) AS tf3
                FROM (SELECT doc_id, dl, unnest(t) AS w FROM base)
                WHERE w IN ('spark', 'join', 'stream')
                GROUP BY doc_id),
              dfs AS (
                SELECT CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END)
                         AS BIGINT) AS df1,
                       CAST(SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END)
                         AS BIGINT) AS df2,
                       CAST(SUM(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END)
                         AS BIGINT) AS df3
                FROM tf)
              SELECT doc_id, tf1, tf2, tf3,
                     round(
                       (CASE WHEN tf1 > 0
                        THEN ln((n_docs - df1 + 0.5) / (df1 + 0.5) + 1.0) *
                             (tf1 * 2.2) /
                             (tf1 + 1.2 * (1.0 - 0.75 + 0.75 *
                               (dl / (CAST(sum_dl AS DOUBLE) / n_docs))))
                        ELSE 0.0 END) +
                       (CASE WHEN tf2 > 0
                        THEN ln((n_docs - df2 + 0.5) / (df2 + 0.5) + 1.0) *
                             (tf2 * 2.2) /
                             (tf2 + 1.2 * (1.0 - 0.75 + 0.75 *
                               (dl / (CAST(sum_dl AS DOUBLE) / n_docs))))
                        ELSE 0.0 END) +
                       (CASE WHEN tf3 > 0
                        THEN ln((n_docs - df3 + 0.5) / (df3 + 0.5) + 1.0) *
                             (tf3 * 2.2) /
                             (tf3 + 1.2 * (1.0 - 0.75 + 0.75 *
                               (dl / (CAST(sum_dl AS DOUBLE) / n_docs))))
                        ELSE 0.0 END), 4) AS score
              FROM tf CROSS JOIN dfs CROSS JOIN corpus
              ORDER BY score DESC, doc_id LIMIT 10""")),

    // Temperature-scaled mixture weights — multilingual/multi-source
    // sampling at temperature α=0.5 (w_s ∝ p_s^0.5, the up-weight-the-tail
    // rule from multilingual LM training), with a 1M-token budget
    // allocation and the resulting per-source oversample factor. α=0.5 is
    // deliberately sqrt: IEEE sqrt is correctly rounded, so the weights are
    // bit-identical across engines where pow(x, 0.33) would not be. The
    // weight normalizer Σ√tokens is an ORDER-PINNED fold over the
    // source-sorted struct list (the j28 technique) — a plain double SUM
    // would differ in the last ulp under shuffle order. Scale shape: token
    // counts come from per-row size(split()) — NO explode — rolled up by
    // one map-side-partial keyed agg; everything above the truncated
    // per-source table is source-cardinality work.
    Q("j39_mixture_temperature",
      (s, d) => {
        val src = truncateLineage(Tables.documents(s, d)
          .groupBy("source")
          .agg(sum(size(split(col("text"), " "))).cast("long")
            .as("n_tokens")))
        val tot = src
          .agg(sort_array(collect_list(struct(col("source"),
            col("n_tokens")))).as("st"))
          .select(
            expr("""aggregate(st, CAST(0 AS DOUBLE),
                    (a, x) -> a + sqrt(CAST(x.n_tokens AS DOUBLE)))""")
              .as("tot_w"),
            expr("aggregate(st, CAST(0 AS BIGINT), (a, x) -> a + x.n_tokens)")
              .as("tot_tokens"))
        src.crossJoin(broadcast(tot))
          .select(col("source"), col("n_tokens"),
            expr("n_tokens * 10000 div tot_tokens").as("raw_bp"),
            expr("""cast(floor(sqrt(cast(n_tokens as double)) * 10000
                    / tot_w) as bigint)""").as("temp_bp"),
            expr("""cast(floor(sqrt(cast(n_tokens as double)) * 1000000
                    / tot_w) as bigint)""").as("alloc_tokens"))
          .withColumn("oversample",
            round(expr("alloc_tokens / cast(n_tokens as double)"), 4))
          .orderBy("source")
      },
      Some("""WITH src AS (
                SELECT source,
                       CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                         AS n_tokens
                FROM documents GROUP BY 1),
              tot AS (
                SELECT list_reduce(
                         list_transform(list(n_tokens ORDER BY source),
                           n -> sqrt(n::DOUBLE)),
                         (a, b) -> a + b) AS tot_w,
                       CAST(sum(n_tokens) AS BIGINT) AS tot_tokens
                FROM src)
              SELECT source, n_tokens,
                     n_tokens * 10000 // tot_tokens AS raw_bp,
                     CAST(floor(sqrt(n_tokens::DOUBLE) * 10000 / tot_w)
                       AS BIGINT) AS temp_bp,
                     CAST(floor(sqrt(n_tokens::DOUBLE) * 1000000 / tot_w)
                       AS BIGINT) AS alloc_tokens,
                     round(CAST(floor(sqrt(n_tokens::DOUBLE) * 1000000
                         / tot_w) AS BIGINT) / n_tokens::DOUBLE, 4)
                       AS oversample
              FROM src CROSS JOIN tot ORDER BY source""")),

    // Incremental near-dup — the production dedup shape: a new-crawl DELTA
    // (stand-in: doc_id % 10 == 0) probed against the existing INDEX (the
    // other 90%), reusing j2's shingle→MinHash→band machinery but with an
    // ASYMMETRIC banded join: delta bands × index bands, no within-index
    // pairing. At 100 TB the index's band keys are precomputed and stored
    // (signature build is incremental by construction — new docs never
    // re-signature the index), so a daily delta costs O(|delta| + matched
    // buckets), not a corpus-wide re-dedup; within-delta duplicates are
    // j1/j2's job on the delta alone. Output: per matched delta doc, its
    // best index match (max Jaccard, min doc_id tie-break on the EXACT
    // division both engines compute identically) + the match count.
    Q("j40_incremental_neardup",
      (s, d) => {
        // spread: both halves pay the shingle+MinHash map (j40 2.99→1.12 s)
        val docs = Tables.documentsSpread(s, d)
        val index = buildNeardupIndex(docs.filter(col("doc_id") % 10 =!= 0))
        probeNeardupIndex(docs.filter(col("doc_id") % 10 === 0), index)
      },
      Some(s"""WITH $NeardupPairsSql,
               cross_pairs AS (
                 SELECT CASE WHEN doc_a % 10 = 0 THEN doc_a ELSE doc_b END
                          AS delta_doc,
                        CASE WHEN doc_a % 10 = 0 THEN doc_b ELSE doc_a END
                          AS index_doc,
                        jac
                 FROM pairs
                 WHERE (doc_a % 10 = 0) != (doc_b % 10 = 0)),
               r AS (
                 SELECT delta_doc, index_doc, jac,
                        row_number() OVER (PARTITION BY delta_doc
                          ORDER BY jac DESC, index_doc) AS rk,
                        count(*) OVER (PARTITION BY delta_doc) AS n_matches
                 FROM cross_pairs)
               SELECT delta_doc, index_doc AS best_match,
                      round(jac, 4) AS jaccard,
                      CAST(n_matches AS BIGINT) AS n_matches
               FROM r WHERE rk = 1 ORDER BY delta_doc""")),

    // Count-Min-sketch heavy hitters — the fixed-memory frequency sketch
    // (Cormode & Muthukrishnan, J.Alg'05): d=4 salted hash rows × w=256
    // buckets; est(t) = min over rows of the bucket count, which can only
    // OVERcount (collisions add, never subtract) — that one-sided error is
    // the invariant QueriesSpec asserts. Hashes are md5-hex digits (the
    // cross-engine-reproducible j10 technique: bucket = first two hex
    // chars of md5('cm<r>:'||tok), so both engines compute the identical
    // 1024-cell sketch bit for bit). Scale shape: the sketch is 1,024
    // cells — a map-side-combining aggregate whose shuffle is 1,024 rows
    // per partition REGARDLESS of corpus size; that is the whole point of
    // the sketch at 100 TB, where the exact vocabulary shuffle (j22) pays
    // per distinct token. Here the registered query derives both sketch
    // and exact counts from ONE materialized token-count table (the
    // vocab-sized j22 aggregate) so the measured overestimate is exact and
    // oracle-checked — the j9/j11 pattern: the exact side is the
    // correctness baseline the sketch is judged against.
    Q("j41_cms_heavyhitters",
      (s, d) => {
        // one corpus token shuffle, materialized once; the sketch build,
        // the top-k candidates, and the probe all read this tiny table
        val counts = truncateLineage(Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("c")))
        // (row, bucket) per token via a nested transform: the inner
        // transform materializes the 4 salted md5s ONCE each, the outer
        // reads 2 hex digits per hash — 4 md5 evals per token, not 8
        val rbExpr =
          """transform(
               transform(sequence(0, 3),
                 r -> md5(concat('cm', r, ':', tok))),
               h -> (instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 16
                  + (instr('0123456789abcdef', substring(h, 2, 1)) - 1))"""
        val cells = counts
          .select(col("c"), posexplode(expr(rbExpr)).as(Seq("r", "b")))
          .groupBy("r", "b").agg(sum("c").as("cell"))
        val probe = counts
          .orderBy(col("c").desc, col("tok")).limit(20)
          .select(col("tok"), col("c"), posexplode(expr(rbExpr))
            .as(Seq("r", "b")))
        probe.join(broadcast(cells), Seq("r", "b"))
          .groupBy("tok", "c").agg(min("cell").as("cms_est"))
          .select(col("tok"), col("c").as("exact_tf"), col("cms_est"),
            expr("(cms_est - c) * 10000 div c").as("over_bp"))
          .orderBy(col("exact_tf").desc, col("tok"))
      },
      Some("""WITH counts AS (
                SELECT tok, CAST(count(*) AS BIGINT) AS c
                FROM (SELECT unnest(string_split(text, ' ')) AS tok
                      FROM documents)
                GROUP BY tok),
              rs AS (SELECT unnest(generate_series(0, 3)) AS r),
              cells AS (
                SELECT r,
                       (strpos('0123456789abcdef', substring(
                          md5('cm' || r || ':' || tok), 1, 1)) - 1) * 16
                     + (strpos('0123456789abcdef', substring(
                          md5('cm' || r || ':' || tok), 2, 1)) - 1) AS b,
                       CAST(sum(c) AS BIGINT) AS cell
                FROM counts CROSS JOIN rs GROUP BY 1, 2),
              top AS (SELECT tok, c FROM counts
                      ORDER BY c DESC, tok LIMIT 20),
              probe AS (
                SELECT tok, c, r,
                       (strpos('0123456789abcdef', substring(
                          md5('cm' || r || ':' || tok), 1, 1)) - 1) * 16
                     + (strpos('0123456789abcdef', substring(
                          md5('cm' || r || ':' || tok), 2, 1)) - 1) AS b
                FROM top CROSS JOIN rs)
              SELECT tok, c AS exact_tf, min(cell) AS cms_est,
                     (min(cell) - c) * 10000 // c AS over_bp
              FROM probe JOIN cells USING (r, b)
              GROUP BY tok, c ORDER BY exact_tf DESC, tok""")),

    // Deterministic bottom-k sampling — the distributed-correct reservoir:
    // priority = md5('bk:'||doc_id), keep the k lowest priorities per
    // source. Bottom-k by hashed priority is MERGEABLE (bottom-k of a
    // union = bottom-k of the per-partition bottom-k's — the LawsSpec
    // property), which plain sequential reservoir sampling is not: that is
    // what makes this the sampling shape that survives partitioned
    // execution, retries, and incremental appends at 100 TB, and the
    // sample is reproducible run over run (no RNG state, j32's principle).
    // Shape: one window shuffle on source; at cluster scale the same
    // bottom-k is expressible as a per-key bounded heap (the k2/streaming
    // top-k Aggregator) when even the window's full-partition sort is too
    // much.
    Q("j42_bottomk_sample",
      (s, d) => {
        val w = Window.partitionBy("source").orderBy("pri", "doc_id")
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"),
            md5(concat(lit("bk:"), col("doc_id").cast("string"))).as("pri"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 10)
          .select("source", "rk", "doc_id", "pri")
          .orderBy("source", "rk")
      },
      Some("""WITH p AS (
                SELECT source, doc_id,
                       md5('bk:' || CAST(doc_id AS VARCHAR)) AS pri
                FROM documents),
              r AS (
                SELECT source, doc_id, pri,
                       CAST(row_number() OVER (PARTITION BY source
                         ORDER BY pri, doc_id) AS BIGINT) AS rk
                FROM p)
              SELECT source, rk, doc_id, pri
              FROM r WHERE rk <= 10 ORDER BY source, rk""")),

    // Bloom-filter decontamination — j29's broadcast-probe design with the
    // bloom filter made literal: the eval suite's 8-grams set k=3 salted
    // md5 positions in an m=4096-bit filter, and a training gram is a
    // bloom HIT iff all 3 of its positions are set. The filter is ≤4,096
    // distinct positions → broadcasts at any corpus size, so detection
    // stays a map-side probe of the 100 TB training stream with FIXED
    // memory — where j29's exact gram set grows with the eval suite. The
    // price is one-sided error: false POSITIVES only (never negatives —
    // the LawsSpec-grade invariant: bloom_hits ≥ exact_hits per doc, and
    // every j29-contaminated doc reappears here). The exact probe rides
    // along to measure the FP rate; a production pass would drop it or
    // use it as the second-stage verify on the (tiny) bloom-flagged slice.
    Q("j43_bloom_decontaminate",
      (s, d) => {
        // Filter CAPACITY is the one bloom parameter that must scale with
        // the data: FP = (1 - e^(-k·n/m))^k, so m must grow with the eval
        // gram count n (rule of thumb at k=3: m ≥ 10·n for FP < 1%). The
        // default m=4096 matches the oracle SQL and the sf-tier eval sizes
        // (~1.3k grams → 60% fill, 23% per-gram FP — deliberately lossy so
        // the FP ledger is non-trivially exercised); scale runs size the
        // filter to the suite via SPARK_GRAFT_BLOOM_BITS (e.g. 2^22 bits =
        // 512 KiB for a 205k-gram suite → 0.25% per-gram FP — still
        // broadcastable, still fixed-memory). A saturated filter (all bits
        // set) is the measured failure mode of NOT scaling m: at 50k docs
        // the 4096-bit default saturates, every gram "hits", and the probe
        // degenerates to emitting the whole corpus (44 s wall); at 2^22
        // bits the same corpus takes 23 s and flags 10,581 docs vs 2,000
        // exact — the per-gram FP matches (1-e^(-kn/m))^k, amplified to
        // doc level by ~80 grams/doc, which is why production keeps the
        // second-stage exact verify on the flagged slice.
        val mBits = sys.env.getOrElse("SPARK_GRAFT_BLOOM_BITS", "4096").toInt
        // position = first ceil(log16 m) hex chars of the salted md5, % m —
        // as FLAT per-hash scalar columns (conv(substring(md5))), NOT a
        // transform() over an array of hashes: higher-order functions are
        // interpreted in Spark, and the transform formulation measured
        // 44 s for the position math ALONE on the 39.5M training grams
        // where the flat codegen version takes 12 s. At the default
        // m=4096 this is exactly the oracle's 3-hex-digit position
        // (16^3 = 4096 makes the % a no-op).
        val nHex = math.max(1,
          math.ceil(math.log(mBits.toDouble) / math.log(16.0)).toInt)
        def posCol(i: Int) = expr(
          s"""cast(conv(substring(md5(concat('bf', $i, ':', g8)),
              1, $nHex), 16, 10) as bigint) % $mBits""")
        // the eval-gram set and its bit positions are each materialized
        // ONCE (they re-scan only the eval 5% of documents) — the probe
        // joins below broadcast the same tiny tables instead of
        // re-running the explode+distinct per join
        val evalG = truncateLineage(
          docGrams8(Tables.documentsSpread(s, d)
            .filter(col("doc_id") % 20 === 0))
            .select("g8").distinct())
        val bits = truncateLineage(evalG
          .select(explode(array(posCol(0), posCol(1), posCol(2))).as("pos"))
          .distinct().withColumn("set", lit(true)))
        // probe: one narrow broadcast LEFT join per hash function on the
        // gram's k=3 position columns — bloom hit = all 3 matched. This is
        // the map-side emulation of `bitmap[p0] && bitmap[p1] && bitmap[p2]`:
        // the training stream flows scan → explode → 4 broadcast probes →
        // partial agg inside one pipeline, and the only exchange is the
        // 1-row-per-doc aggregate. Measured at 500k docs / 39.5M training
        // grams (32 cores, 2^22-bit filter): 14.8 s warm — vs 116 s for
        // the materialize-the-gram-table shape (whose checkpoint alone
        // took 128 s cold) and 226 s for the first cut, which exploded
        // the 3 positions into rows and re-grouped them on (doc_id, gram),
        // a 3×-corpus-wide shuffle.
        val probed = (0 until 3).foldLeft(
          docGrams8(Tables.documentsSpread(s, d)
            .filter(col("doc_id") % 20 =!= 0))) { (df, i) =>
          df.join(broadcast(bits.select(col("pos").as(s"q$i"),
              col("set").as(s"s$i"))),
            posCol(i) === col(s"q$i"), "left")
        }
        val bhit = probed.select(col("doc_id"), col("g8"),
          (col("s0").isNotNull && col("s1").isNotNull &&
            col("s2").isNotNull).cast("int").as("bhit"))
        bhit.join(broadcast(evalG.withColumn("ex", lit(true))),
            Seq("g8"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_g8"),
            sum("bhit").as("bloom_hits"),
            count(col("ex")).as("exact_hits"))
          .filter(col("bloom_hits") > 0)
          .withColumn("false_pos", col("bloom_hits") - col("exact_hits"))
          .select("doc_id", "n_g8", "bloom_hits", "exact_hits", "false_pos")
          .orderBy("doc_id")
      },
      Some("""WITH grams AS (
                SELECT DISTINCT doc_id, g8 FROM (
                  SELECT doc_id, unnest(list_transform(
                    generate_series(1, len(t) - 7),
                    i -> array_to_string(t[i:i + 7], ' '))) AS g8
                  FROM (SELECT doc_id, string_split(text, ' ') AS t
                        FROM documents WHERE
                          len(string_split(text, ' ')) >= 8))),
              ev AS (
                SELECT DISTINCT g8 FROM grams WHERE doc_id % 20 = 0),
              bits AS (
                SELECT DISTINCT unnest(list_transform(
                  list_transform([0, 1, 2], i -> md5('bf' || i || ':' || g8)),
                  h -> (strpos('0123456789abcdef', substring(h, 1, 1)) - 1)
                         * 256
                     + (strpos('0123456789abcdef', substring(h, 2, 1)) - 1)
                         * 16
                     + (strpos('0123456789abcdef', substring(h, 3, 1)) - 1)))
                  AS pos
                FROM ev),
              gp AS (
                SELECT doc_id, g8, unnest(list_transform(
                  list_transform([0, 1, 2], i -> md5('bf' || i || ':' || g8)),
                  h -> (strpos('0123456789abcdef', substring(h, 1, 1)) - 1)
                         * 256
                     + (strpos('0123456789abcdef', substring(h, 2, 1)) - 1)
                         * 16
                     + (strpos('0123456789abcdef', substring(h, 3, 1)) - 1)))
                  AS pos
                FROM grams WHERE doc_id % 20 != 0),
              b AS (
                SELECT doc_id, g8,
                       CASE WHEN count(CASE WHEN pos IN
                              (SELECT pos FROM bits) THEN 1 END) = 3
                            THEN 1 ELSE 0 END AS bhit
                FROM gp GROUP BY doc_id, g8)
              SELECT doc_id,
                     CAST(count(*) AS BIGINT) AS n_g8,
                     CAST(sum(bhit) AS BIGINT) AS bloom_hits,
                     CAST(count(e.m) AS BIGINT) AS exact_hits,
                     CAST(sum(bhit) - count(e.m) AS BIGINT) AS false_pos
              FROM b LEFT JOIN (SELECT g8, TRUE AS m FROM ev) e USING (g8)
              GROUP BY doc_id HAVING sum(bhit) > 0 ORDER BY doc_id""")),

    // The Count-Min sketch EXECUTED as a sketch: j41 derives the 1,024
    // cells from the exact vocabulary table (so the overestimate is
    // oracle-checked); this row builds the identical cells with the
    // mergeable typed Aggregator (graft.functions.CountMinSketch) — the
    // token stream folds map-side into one fixed-size array per partition
    // and the only exchange carries ONE sketch row per partition (plan-
    // pinned in PlanSpec), never a per-distinct-token row. The oracle
    // recomputes the cells exactly in DuckDB, so hash-match proves the
    // distributed fold is cell-for-cell identical to the SQL derivation.
    Q("j44_cms_sketch",
      (s, d) => {
        import s.implicits._
        val toks = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("tok")).as[String]
        // .name (not .as) keeps the TypedColumn so the TYPED select overload
        // is chosen — `.as` widens to Column and Spark rejects an Aggregator
        // column in the untyped select API at runtime. The resulting
        // Dataset[CmsSketch] flattens the product to its `cells` field.
        toks.select(graft.functions.CountMinSketch.toColumn.name("sk"))
          .select(posexplode(col("cells")).as(Seq("i", "cell")))
          .filter(col("cell") > 0)
          .select(expr("CAST(i DIV 256 AS BIGINT)").as("r"),
            expr("CAST(i % 256 AS BIGINT)").as("b"), col("cell"))
          .orderBy("r", "b")
      },
      Some("""WITH counts AS (
                SELECT tok, CAST(count(*) AS BIGINT) AS c
                FROM (SELECT unnest(string_split(text, ' ')) AS tok
                      FROM documents)
                GROUP BY tok),
              rs AS (SELECT unnest(generate_series(0, 3)) AS r)
              SELECT r,
                     (strpos('0123456789abcdef', substring(
                        md5('cm' || r || ':' || tok), 1, 1)) - 1) * 16
                   + (strpos('0123456789abcdef', substring(
                        md5('cm' || r || ':' || tok), 2, 1)) - 1) AS b,
                     CAST(sum(c) AS BIGINT) AS cell
              FROM counts CROSS JOIN rs
              GROUP BY 1, 2 ORDER BY r, b""")),

    // j42's bottom-k sample EXECUTED as a bounded heap: same output, no
    // corpus-wide window sort — each partition keeps ≤k entries per source
    // (graft.functions.BottomK), partials merge by sorted-merge-take-k
    // (mergeability is the LawsSpec property), and the one exchange
    // carries ≤k-entry buffers keyed by source (plan-pinned: no Window,
    // no full-partition Sort below the aggregate). Oracle is j42's: the
    // outputs are byte-identical (also differential-tested directly).
    Q("j45_bottomk_heap",
      (s, d) => {
        import s.implicits._
        val ds = Tables.documents(s, d)
          .select(col("source"), col("doc_id"),
            md5(concat(lit("bk:"), col("doc_id").cast("string"))).as("pri"))
          .as[graft.functions.DocPri]
        ds.groupByKey(_.source)
          .agg(new graft.functions.BottomK(10).toColumn.name("bk"))
          .toDF("source", "bk")
          .select(col("source"), posexplode(col("bk.entries")).as(Seq("i", "e")))
          .select(col("source"), (col("i") + 1).cast("long").as("rk"),
            col("e.docId").as("doc_id"), col("e.pri").as("pri"))
          .orderBy("source", "rk")
      },
      Some("""WITH pri AS (
                SELECT source, doc_id, md5('bk:' || doc_id) AS pri
                FROM documents),
              r AS (
                SELECT source, doc_id, pri,
                       row_number() OVER (PARTITION BY source
                                          ORDER BY pri, doc_id) AS rk
                FROM pri)
              SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, pri
              FROM r WHERE rk <= 10 ORDER BY source, rk""")),

    // Multi-probe IVF ANN: j16 with nprobe=2 — each probe searches its TWO
    // nearest centroid cells instead of one, the standard recall lever for
    // cross-boundary neighbors (a probe near a cell border has its true
    // neighbors split across both sides; searching both recovers them at
    // 2× the scan cost — still 1/8th of the collection at 16 cells, and
    // the fraction only improves as the cell count grows at scale). The
    // collection assignment is unchanged (each vector lives in exactly ONE
    // cell, so the widened probe join cannot duplicate candidates); only
    // the probe side keeps ark <= 2. QueriesSpec pins the recall
    // differential: j46's hits against the exact brute-force top-3 are >=
    // j16's single-probe hits (guaranteed — the candidate set is a strict
    // superset containing the ark=1 cell).
    Q("j46_ivf_multiprobe",
      (s, d) => {
        DotProduct.register(s)
        val e = Tables.embeddings(s, d)
        val cents = e.filter(col("vec_id") < 16)
          .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
        val wAssign = Window.partitionBy("vec_id")
          .orderBy(col("cscore").desc, col("cent_id"))
        def scored(df: org.apache.spark.sql.DataFrame) =
          df.crossJoin(broadcast(cents))
            .withColumn("cscore", round(expr(dot("embedding", "cvec")), 6))
        // COLLECTION side is nprobe=1 — the j16 map-side argmax agg (16
        // candidates collapse in the broadcast-join task); only the
        // plan-capped 512-row PROBE side needs a real top-2, where the
        // window sorts 16 rows for 512 keys — nothing at any scale
        val assigned = scored(e)
          .groupBy("vec_id")
          .agg(max(struct(col("cscore"), negate(col("cent_id")),
            col("cent_id"), col("embedding"))).as("best"))
          .select(col("vec_id"), col("best.embedding").as("embedding"),
            col("best.cent_id").as("cell"))
        // probe panel structurally capped like j4/j16 (limit below the
        // broadcast) — all probes survive the cap at tested SFs
        val probes = scored(
            e.filter(col("vec_id") % 100 === 7).orderBy("vec_id").limit(512))
          .withColumn("ark", row_number().over(wAssign))
          .filter(col("ark") <= 2)
          .select(col("vec_id").as("probe_id"), col("embedding").as("p"),
            col("cent_id").as("pcell"))
        val w = Window.partitionBy("probe_id")
          .orderBy(col("score").desc, col("vec_id"))
        assigned.join(broadcast(probes),
          col("cell") === col("pcell") && col("vec_id") =!= col("probe_id"))
          .withColumn("score", round(expr(dot("embedding", "p")), 6))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 3)
          .select("probe_id", "vec_id", "score", "rk")
          .orderBy("probe_id", "rk")
      },
      Some(s"""WITH c AS (
                 SELECT vec_id AS cent_id, embedding AS cvec
                 FROM embeddings WHERE vec_id < 16),
               a AS (
                 SELECT vec_id, embedding, cent_id AS cell FROM (
                   SELECT e.vec_id, e.embedding, c.cent_id,
                          row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY round(${duckDot("e.embedding", "c.cvec")},
                              6) DESC, c.cent_id) AS ark
                   FROM embeddings e CROSS JOIN c)
                 WHERE ark = 1),
               p2 AS (
                 SELECT vec_id, embedding, cent_id AS cell FROM (
                   SELECT e.vec_id, e.embedding, c.cent_id,
                          row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY round(${duckDot("e.embedding", "c.cvec")},
                              6) DESC, c.cent_id) AS ark
                   FROM (SELECT * FROM embeddings WHERE vec_id % 100 = 7
                         ORDER BY vec_id LIMIT 512) e CROSS JOIN c)
                 WHERE ark <= 2)
               SELECT probe_id, vec_id, score, rk FROM (
                 SELECT p.vec_id AS probe_id, a.vec_id,
                        round(${duckDot("a.embedding", "p.embedding")}, 6)
                          AS score,
                        CAST(row_number() OVER (PARTITION BY p.vec_id
                          ORDER BY round(${duckDot("a.embedding",
                            "p.embedding")}, 6) DESC, a.vec_id) AS BIGINT)
                          AS rk
                 FROM a JOIN p2 p
                   ON a.cell = p.cell AND a.vec_id != p.vec_id)
               WHERE rk <= 3 ORDER BY probe_id, rk""")),

    // HyperLogLog EXECUTED as a sketch — the cardinality twin of j44's
    // CMS row: d2 is the exact distinct (full token shuffle), d3 is
    // Spark's built-in HLL++ estimate; this row is the sketch AS the
    // product — 256 auditable registers that persist per shard/day and
    // re-merge across arbitrary slices later without rescanning, the
    // operation a 100-TB dedup/reporting pipeline actually runs. The token
    // stream folds map-side into one fixed 256-register array per
    // partition (merge = element-wise max: idempotent, so retries and
    // speculation cannot skew it, unlike a count) and the only exchange
    // carries ONE sketch row per partition — plan-pinned like j44. The
    // md5-hex hash family makes the registers EXACTLY derivable in DuckDB
    // (integer/string ops only, no floats), so hash-match proves the
    // distributed fold register-for-register; the estimate path is
    // law-tested in LawsSpec and bounds-tested in QueriesSpec.
    Q("j47_hll_registers",
      (s, d) => {
        import s.implicits._
        val toks = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("tok")).as[String]
        toks.select(graft.functions.HyperLogLog.toColumn.name("sk"))
          .select(posexplode(col("registers")).as(Seq("b", "rho")))
          .filter(col("rho") > 0)
          .select(col("b").cast("long").as("b"), col("rho"))
          .orderBy("b")
      },
      Some("""WITH toks AS (
                SELECT unnest(string_split(text, ' ')) AS tok
                FROM documents),
              h AS (SELECT md5('hll:' || tok) AS hx FROM toks),
              br AS (SELECT
                  (strpos('0123456789abcdef', substring(hx, 1, 1)) - 1) * 16
                + (strpos('0123456789abcdef', substring(hx, 2, 1)) - 1) AS b,
                  CASE WHEN ltrim(substring(hx, 3, 8), '0') = '' THEN 33
                       ELSE (8 - length(ltrim(substring(hx, 3, 8), '0'))) * 4
                          + CASE WHEN substring(ltrim(substring(hx, 3, 8),
                                   '0'), 1, 1) = '1' THEN 3
                                 WHEN substring(ltrim(substring(hx, 3, 8),
                                   '0'), 1, 1) IN ('2', '3') THEN 2
                                 WHEN substring(ltrim(substring(hx, 3, 8),
                                   '0'), 1, 1) IN ('4', '5', '6', '7') THEN 1
                                 ELSE 0 END
                          + 1 END AS rho
                FROM h)
              SELECT CAST(b AS BIGINT) AS b, CAST(max(rho) AS BIGINT) AS rho
              FROM br GROUP BY b ORDER BY b""")),

    // The grouped HLL — "distinct users per key" at 100 TB: one keyed
    // exchange on source whose rows are fixed 256-register arrays, never
    // per-distinct-value sets (the exact formulation shuffles every
    // distinct (source, tok) pair; this shuffles 20 sketch rows). Same
    // auditable hash family as j47, so the per-source registers are
    // oracle-checked exactly; per-source estimates are bounds-tested
    // against the exact distinct counts in QueriesSpec.
    Q("j48_hll_by_source",
      (s, d) => {
        import s.implicits._
        val ds = Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
          .as[graft.functions.SrcTok]
        ds.groupByKey(_.source)
          .agg(graft.functions.HyperLogLogBySource.toColumn.name("sk"))
          .toDF("source", "sk")
          .select(col("source"),
            posexplode(col("sk.registers")).as(Seq("b", "rho")))
          .filter(col("rho") > 0)
          .select(col("source"), col("b").cast("long").as("b"), col("rho"))
          .orderBy("source", "b")
      },
      Some("""WITH toks AS (
                SELECT source, unnest(string_split(text, ' ')) AS tok
                FROM documents),
              h AS (SELECT source, md5('hll:' || tok) AS hx FROM toks),
              br AS (SELECT source,
                  (strpos('0123456789abcdef', substring(hx, 1, 1)) - 1) * 16
                + (strpos('0123456789abcdef', substring(hx, 2, 1)) - 1) AS b,
                  CASE WHEN ltrim(substring(hx, 3, 8), '0') = '' THEN 33
                       ELSE (8 - length(ltrim(substring(hx, 3, 8), '0'))) * 4
                          + CASE WHEN substring(ltrim(substring(hx, 3, 8),
                                   '0'), 1, 1) = '1' THEN 3
                                 WHEN substring(ltrim(substring(hx, 3, 8),
                                   '0'), 1, 1) IN ('2', '3') THEN 2
                                 WHEN substring(ltrim(substring(hx, 3, 8),
                                   '0'), 1, 1) IN ('4', '5', '6', '7') THEN 1
                                 ELSE 0 END
                          + 1 END AS rho
                FROM h)
              SELECT source, CAST(b AS BIGINT) AS b,
                     CAST(max(rho) AS BIGINT) AS rho
              FROM br GROUP BY source, b ORDER BY source, b""")),

    // Weighted sampling without replacement (Efraimidis–Spirakis, IPL'06),
    // deterministic: uniform u from the first 48 md5 bits of the doc id
    // (exact integer in both engines — doubles are exact below 2^53),
    // priority = -ln(u)/w with w = n_chars, keep the k lowest. Selection
    // probability ∝ weight — long/high-weight docs over-represented by
    // construction (pinned in QueriesSpec) — yet reproducible run-over-run
    // with no RNG state (j32/j42's principle: a retry or a re-run of the
    // 100-TB job draws the SAME sample). Execution shape: orderBy+limit
    // compiles to TakeOrderedAndProject — per-partition bounded top-k
    // heaps merged at the driver, NO global sort exchange (plan-pinned),
    // the same mergeable-bottom-k shape as j42/j45 so per-shard samples
    // recombine exactly. Priorities round to 12 dp (~8 significant digits
    // at these magnitudes) so the two engines' last-ulp ln() differences
    // cannot flip the ordering.
    Q("j49_weighted_sample",
      (s, d) => {
        Tables.documents(s, d)
          .withColumn("hx",
            md5(concat(lit("ws:"), col("doc_id").cast("string"))))
          .withColumn("v",
            expr("cast(conv(substring(hx, 1, 12), 16, 10) as double)"))
          .withColumn("pri", round(
            -log((col("v") + 0.5) / lit(281474976710656.0)) / col("n_chars"),
            12))
          .orderBy(col("pri"), col("doc_id"))
          .limit(50)
          .select(col("doc_id"), col("n_chars").as("w_chars"), col("pri"))
      },
      Some("""SELECT doc_id, n_chars AS w_chars,
                     round(-ln((('0x' || substring(md5('ws:' || doc_id), 1,
                             12))::BIGINT + 0.5) / 281474976710656.0)
                           / n_chars, 12) AS pri
              FROM documents ORDER BY pri, doc_id LIMIT 50""")),

    // The claim j47's Scaladoc makes — "persisted per shard and re-merged
    // across arbitrary slices later without rescanning data" — executed:
    // build the per-source sketches (j48's shape, the thing a daily job
    // would PERSIST), then merge them back into the global sketch with
    // plain column ops (posexplode + max per register — element-wise max
    // is the whole merge). The oracle derives the same global registers
    // from raw data, so hash-match proves slice-merge == direct-fold; the
    // QueriesSpec differential additionally pins j50 ≡ j47 row-for-row.
    // At 100 TB the first stage is yesterday's saved 20-row sketch table
    // and this query touches no documents at all.
    Q("j50_hll_merge",
      (s, d) => {
        import s.implicits._
        val ds = Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
          .as[graft.functions.SrcTok]
        val perSource = ds.groupByKey(_.source)
          .agg(graft.functions.HyperLogLogBySource.toColumn.name("sk"))
          .toDF("source", "sk")
        perSource
          .select(posexplode(col("sk.registers")).as(Seq("b", "rho")))
          .groupBy("b").agg(max("rho").as("rho"))
          .filter(col("rho") > 0)
          .select(col("b").cast("long").as("b"), col("rho"))
          .orderBy("b")
      },
      Some("""WITH toks AS (
                SELECT unnest(string_split(text, ' ')) AS tok
                FROM documents),
              h AS (SELECT md5('hll:' || tok) AS hx FROM toks),
              br AS (SELECT
                  (strpos('0123456789abcdef', substring(hx, 1, 1)) - 1) * 16
                + (strpos('0123456789abcdef', substring(hx, 2, 1)) - 1) AS b,
                  CASE WHEN ltrim(substring(hx, 3, 8), '0') = '' THEN 33
                       ELSE (8 - length(ltrim(substring(hx, 3, 8), '0'))) * 4
                          + CASE WHEN substring(ltrim(substring(hx, 3, 8),
                                   '0'), 1, 1) = '1' THEN 3
                                 WHEN substring(ltrim(substring(hx, 3, 8),
                                   '0'), 1, 1) IN ('2', '3') THEN 2
                                 WHEN substring(ltrim(substring(hx, 3, 8),
                                   '0'), 1, 1) IN ('4', '5', '6', '7') THEN 1
                                 ELSE 0 END
                          + 1 END AS rho
                FROM h)
              SELECT CAST(b AS BIGINT) AS b, CAST(max(rho) AS BIGINT) AS rho
              FROM br GROUP BY b ORDER BY b""")),

    // j50's re-merge contract for the FREQUENCY sketch: per-source CMS
    // sketches (the persisted shard table) re-combine into j44's global
    // cells by plain cell-wise SUM — addition is the entire CMS merge, so
    // sharded counts compose exactly (where HLL's merge was max). Oracle
    // derives the same cells from raw data; QueriesSpec pins j51 ≡ j44
    // row-for-row. Same 100-TB shape: stage 1 reads yesterday's 20 sketch
    // rows, not the corpus.
    Q("j51_cms_merge",
      (s, d) => {
        import s.implicits._
        val ds = Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
          .as[graft.functions.SrcTok]
        val perSource = ds.groupByKey(_.source)
          .agg(graft.functions.CountMinSketchBySource.toColumn.name("sk"))
          .toDF("source", "sk")
        perSource
          .select(posexplode(col("sk.cells")).as(Seq("i", "cell")))
          .groupBy("i").agg(sum("cell").as("cell"))
          .filter(col("cell") > 0)
          .select(expr("CAST(i DIV 256 AS BIGINT)").as("r"),
            expr("CAST(i % 256 AS BIGINT)").as("b"), col("cell"))
          .orderBy("r", "b")
      },
      Some("""WITH counts AS (
                SELECT tok, CAST(count(*) AS BIGINT) AS c
                FROM (SELECT unnest(string_split(text, ' ')) AS tok
                      FROM documents)
                GROUP BY tok),
              rs AS (SELECT unnest(generate_series(0, 3)) AS r)
              SELECT r,
                     (strpos('0123456789abcdef', substring(
                        md5('cm' || r || ':' || tok), 1, 1)) - 1) * 16
                   + (strpos('0123456789abcdef', substring(
                        md5('cm' || r || ':' || tok), 2, 1)) - 1) AS b,
                     CAST(sum(c) AS BIGINT) AS cell
              FROM counts CROSS JOIN rs
              GROUP BY 1, 2 ORDER BY r, b""")),

    // PII scrubbing — the redaction pass every training-data pipeline runs
    // before anything else sees the text: email / IPv4 / phone patterns →
    // typed placeholder tokens, plus per-doc match counts for the
    // compliance audit trail. Map-only (one scan, no shuffle before the
    // output sort) — at 100 TB this is a pure pipelined stage.
    //
    // The shipped synthetic corpus contains no PII (counts would be zero
    // everywhere and the redaction vacuous), so the DEMO augments each doc
    // with deterministic synthetic PII derived from its own doc_id — built
    // identically in Spark and the oracle — which makes every row exercise
    // all three regex engines' match+replace paths and the md5 compare
    // non-trivial. The patterns stay in the shared-dialect subset (\d, \b,
    // character classes, bounded repetition — identical semantics in Java
    // regex and DuckDB's RE2); replacement order email→ip→phone is fixed
    // on both sides.
    Q("j52_pii_scrub",
      (s, d) => {
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val ipv4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
        val phone = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"
        Tables.documentsSpread(s, d)
          .withColumn("aug", concat(col("text"),
            lit(" contact doc"), col("doc_id").cast("string"),
            lit("@example.com from 10.0."),
            (col("doc_id") % 256).cast("string"),
            lit(".7 call 555-123-4567")))
          .withColumn("n_emails",
            regexp_count(col("aug"), lit(email)).cast("long"))
          .withColumn("n_ips",
            regexp_count(col("aug"), lit(ipv4)).cast("long"))
          .withColumn("n_phones",
            regexp_count(col("aug"), lit(phone)).cast("long"))
          .withColumn("redacted",
            regexp_replace(regexp_replace(regexp_replace(col("aug"),
              email, "<EMAIL>"), ipv4, "<IP>"), phone, "<PHONE>"))
          .select(col("doc_id"), col("n_emails"), col("n_ips"),
            col("n_phones"), md5(col("redacted")).as("redacted_md5"))
          .orderBy("doc_id")
      },
      Some("""WITH aug AS (
                SELECT doc_id,
                       text || ' contact doc' || CAST(doc_id AS VARCHAR)
                         || '@example.com from 10.0.'
                         || CAST(doc_id % 256 AS VARCHAR)
                         || '.7 call 555-123-4567' AS aug
                FROM documents)
              SELECT doc_id,
                     CAST(len(regexp_extract_all(aug,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                       AS BIGINT) AS n_emails,
                     CAST(len(regexp_extract_all(aug,
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
                       AS BIGINT) AS n_ips,
                     CAST(len(regexp_extract_all(aug,
                       '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b'))
                       AS BIGINT) AS n_phones,
                     md5(regexp_replace(regexp_replace(regexp_replace(aug,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                       '<IP>', 'g'),
                       '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b',
                       '<PHONE>', 'g')) AS redacted_md5
              FROM aug ORDER BY doc_id""")),

    // Semantic dedup (public technique: Abbas et al., "SemDeDup", 2023):
    // embedding-space duplicate PRUNING, the stage after lexical dedup in a
    // training-data pipeline — j13/j30 canonicalize verbatim near-dups,
    // this canonicalizes MEANING-level duplicates the lexical passes can't
    // see. Shape per the paper: (1) coarse-quantize the corpus into cells
    // around the j16 centroids (fixed data-derived centroids keep the
    // oracle exact; production trains them — operators.IvfKMeans); (2)
    // pairwise cosine ONLY within a cell — the cells bound the quadratic
    // term to Σ(cell size)², and at 100 TB the cell count k grows ~√n so
    // per-cell work stays flat; assignment itself is a broadcast map-side
    // pass; (3) connected components over the τ-pairs via the O(log n)
    // star-contraction operator, canonical survivor = min vec_id per
    // component. τ=0.35 sits above this corpus's isotropic background (no
    // planted semantic pairs — FIXTURES.md) yet yields real multi-member
    // components at both oracle SFs (66 / 775 pairs), so the clustering is
    // non-trivially exercised. Rounded dot (§5.3) keeps the threshold
    // compare engine-exact.
    Q("j53_semantic_dedup",
      (s, d) => {
        DotProduct.register(s)
        val e = Tables.embeddingsSpread(s, d)
        val cents = e.filter(col("vec_id") < 16)
          .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
        val wAssign = Window.partitionBy("vec_id")
          .orderBy(col("cscore").desc, col("cent_id"))
        val assigned = e.crossJoin(broadcast(cents))
          .withColumn("cscore", round(expr(dot("embedding", "cvec")), 6))
          .withColumn("ark", row_number().over(wAssign))
          .filter(col("ark") === 1)
          .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
        val a = truncateLineage(assigned)
        val pairs = semanticPairs(a)
        val cc = graft.operators.ConnectedComponents.byStarContraction(
          e.select(col("vec_id").as("doc_id")), truncateLineage(pairs))
        cc.join(a.select(col("vec_id").as("doc_id"), col("cell")), "doc_id")
          .select(col("doc_id").as("vec_id"), col("cell").cast("long"),
            col("cluster_id"), col("is_canonical"))
          .orderBy("vec_id")
      },
      Some(s"""WITH RECURSIVE c AS (
                 SELECT vec_id AS cent_id, embedding AS cvec
                 FROM embeddings WHERE vec_id < 16),
               a AS (
                 SELECT vec_id, embedding, cell FROM (
                   SELECT e.vec_id, e.embedding, c.cent_id AS cell,
                          row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY round(${duckDot("e.embedding", "c.cvec")},
                              6) DESC, c.cent_id) AS ark
                   FROM embeddings e CROSS JOIN c)
                 WHERE ark = 1),
               pairs AS (
                 SELECT a1.vec_id AS doc_a, a2.vec_id AS doc_b
                 FROM a a1 JOIN a a2
                   ON a1.cell = a2.cell AND a1.vec_id < a2.vec_id
                 WHERE round(${duckDot("a1.embedding", "a2.embedding")}, 6)
                       >= 0.35),
               edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                         UNION ALL SELECT doc_b, doc_a FROM pairs),
               reach(x, y) AS (
                 SELECT vec_id, vec_id FROM embeddings
                 UNION
                 SELECT r.x, e.dst FROM reach r JOIN edges e ON r.y = e.src)
               SELECT x AS vec_id, CAST(a.cell AS BIGINT) AS cell,
                      CAST(min(y) AS BIGINT) AS cluster_id,
                      (x = min(y)) AS is_canonical
               FROM reach JOIN a ON a.vec_id = reach.x
               GROUP BY x, a.cell ORDER BY vec_id""")),

    // Snapshot + delta upsert merge — the CDC/crawl-refresh shape every
    // production corpus needs: yesterday's snapshot merged with a delta of
    // updates / inserts / deletes, latest-wins per key. The shipped corpus
    // is static, so the delta derives deterministically from doc_id slices
    // (U: %10=3 gets a ' [rev2]' revision; D: %100=55 retracted; I: %100=7
    // re-lands under a new id) — built identically in SQL, and the slices
    // are disjoint so each key appears in the delta at most once.
    //
    // Plan shape is the 100 TB story: the snapshot side is NEVER shuffled —
    // survivors come from a broadcast LEFT ANTI against the delta keys (a
    // daily delta is small-side by construction; were it not, the same
    // merge degrades gracefully to a shuffled anti join on the key), and
    // the applied delta unions in map-side. Exactly 2 documents scans
    // (snapshot + delta derivation) and no join exchange, PlanSpec-pinned.
    // Production refinement documented here: with the snapshot bucketed by
    // key (graft.layout), only buckets containing delta keys need rewriting.
    Q("j54_snapshot_upsert",
      (s, d) => {
        val snap = Tables.documents(s, d)
        // materialized once: a real refresh's delta ARRIVES materialized;
        // deriving it here and truncating its lineage keeps the registered
        // plan honest (the anti-join keys and the applied rows both read
        // the same small table, not two re-derivations of the snapshot)
        val delta = truncateLineage(snap
          .withColumn("op", expr(
            """CASE WHEN doc_id % 10 = 3 THEN 'U'
                    WHEN doc_id % 100 = 55 THEN 'D'
                    WHEN doc_id % 100 = 7 THEN 'I' END"""))
          .filter(col("op").isNotNull)
          .select(
            when(col("op") === "I", col("doc_id") + 10000000L)
              .otherwise(col("doc_id")).as("doc_id"),
            when(col("op") === "U", concat(col("text"), lit(" [rev2]")))
              .otherwise(col("text")).as("text"),
            col("op")))
        val kept = snap
          .join(broadcast(delta.select("doc_id")), Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("text"),
            lit(0L).as("version"), lit("K").as("op"))
        val applied = delta.filter(col("op") =!= "D")
          .select(col("doc_id"), col("text"),
            lit(1L).as("version"), col("op"))
        kept.unionByName(applied)
          .select(col("doc_id"), col("version"), col("op"),
            length(col("text")).cast("long").as("n_chars"),
            md5(col("text")).as("text_md5"))
          .orderBy("doc_id")
      },
      Some("""WITH delta AS (
                SELECT CASE WHEN op = 'I' THEN doc_id + 10000000
                            ELSE doc_id END AS doc_id,
                       CASE WHEN op = 'U' THEN text || ' [rev2]'
                            ELSE text END AS text,
                       op
                FROM (SELECT doc_id, text,
                        CASE WHEN doc_id % 10 = 3 THEN 'U'
                             WHEN doc_id % 100 = 55 THEN 'D'
                             WHEN doc_id % 100 = 7 THEN 'I' END AS op
                      FROM documents)
                WHERE op IS NOT NULL),
              kept AS (
                SELECT d.doc_id, d.text, CAST(0 AS BIGINT) AS version,
                       'K' AS op
                FROM documents d
                WHERE NOT EXISTS
                  (SELECT 1 FROM delta x WHERE x.doc_id = d.doc_id)),
              applied AS (
                SELECT doc_id, text, CAST(1 AS BIGINT) AS version, op
                FROM delta WHERE op <> 'D')
              SELECT doc_id, version, op,
                     CAST(length(text) AS BIGINT) AS n_chars,
                     md5(text) AS text_md5
              FROM (SELECT * FROM kept UNION ALL SELECT * FROM applied)
              ORDER BY doc_id""")),

    // Boilerplate REMOVAL with document reconstruction — the C4-style
    // cleaning rule (public technique: Raffel et al., C4: drop lines
    // occurring repeatedly across the corpus), where j17 only DETECTS
    // repeated chunks this strips them and rebuilds the document: docs
    // chunk into 10-token spans (trailing remainder kept — reconstruction
    // must cover every token, unlike j17's exact-window stats), spans
    // repeated >= 2 times corpus-wide are dropped, survivors reassemble in
    // position order. Shape at 100 TB: the chunk table materializes once
    // (~1/10th of the corpus rows; the three consumers would otherwise
    // re-derive it), ONE corpus-keyed count on the chunk, a co-partitioned
    // left join marking frequent spans (count output is already
    // chunk-partitioned — the join reuses it), one doc-keyed regroup to
    // reassemble — three linear exchanges, nothing quadratic. Output keeps
    // md5(clean) scalar so row width stays constant.
    Q("j55_boilerplate_strip",
      (s, d) => {
        val chunks = truncateLineage(Tables.documents(s, d)
          .withColumn("toks", split(col("text"), " "))
          .select(col("doc_id"), posexplode(expr(
            """transform(sequence(0, cast((size(toks) + 9) div 10 as int) - 1),
               c -> concat_ws(' ', slice(toks, c * 10 + 1, 10)))"""))
            .as(Seq("pos", "chunk"))))
        val freq = chunks.groupBy("chunk")
          .agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") >= 2)
          .select(col("chunk"), lit(true).as("is_freq"))
        chunks.join(freq, Seq("chunk"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("long").as("n_chunks"),
            count(when(col("is_freq").isNull, 1)).cast("long").as("n_kept"),
            md5(concat_ws(" ", expr(
              """transform(array_sort(collect_list(
                   CASE WHEN is_freq IS NULL THEN struct(pos, chunk) END)),
                 x -> x.chunk)"""))).as("clean_md5"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS t FROM documents),
              chunks AS (
                SELECT doc_id, CAST(u.c AS INT) AS pos,
                       array_to_string(t[u.c*10+1:u.c*10+10], ' ') AS chunk
                FROM toks,
                     UNNEST(generate_series(0,
                       CAST((len(t) + 9) // 10 AS INT) - 1)) AS u(c)),
              freq AS (
                SELECT chunk FROM chunks GROUP BY chunk
                HAVING count(*) >= 2)
              SELECT c.doc_id,
                     CAST(count(*) AS BIGINT) AS n_chunks,
                     CAST(count(CASE WHEN f.chunk IS NULL THEN 1 END)
                       AS BIGINT) AS n_kept,
                     md5(coalesce(string_agg(
                       CASE WHEN f.chunk IS NULL THEN c.chunk END,
                       ' ' ORDER BY c.pos), '')) AS clean_md5
              FROM chunks c LEFT JOIN freq f ON c.chunk = f.chunk
              GROUP BY c.doc_id ORDER BY doc_id""")),

    // BPE tokenizer training — the first K=3 byte-pair merges learned from
    // the corpus (public technique: Sennrich et al., ACL'16; within-word
    // merges, no end-of-word marker — symbols live on word rows so a merge
    // can never cross a boundary). Everything after the ONE corpus pass
    // (the word count) runs on the weighted VOCABULARY — exactly how
    // production BPE trainers scale to 100 TB: pair statistics over
    // (distinct word, count), never over raw tokens.
    //
    // Each round is fully relational, so Spark and DuckDB derive the same
    // merge deterministically: adjacent-pair counts weighted by word count
    // → top pair (cnt DESC, pair lexicographic — total order) → leftmost
    // non-overlapping merge via gaps-and-islands (candidate runs grouped
    // by i - row_number, merge at even offsets from the run start — the
    // parity rule that resolves overlapping candidates like 'aaa' under
    // pair (a,a)) → resequence. Three rounds unroll as three applications
    // of the same builder; the oracle unrolls the identical CTE chain.
    Q("j56_bpe_merges",
      (s, d) => {
        // each round's input is consumed twice (pair count + merge) and
        // feeds the next round's windows — truncate per round like the CC
        // supersteps so the vocabulary-sized table materializes instead of
        // re-deriving the whole chain per reference
        val (t1, sym2) = bpeRound(truncateLineage(bpeSym1(s, d)))
        val (t2, sym3) = bpeRound(truncateLineage(sym2))
        val (t3, _) = bpeRound(truncateLineage(sym3))
        def rowOf(t: org.apache.spark.sql.DataFrame, k: Int) =
          t.select(lit(k.toLong).as("mrank"), col("ta").as("left_sym"),
            col("tb").as("right_sym"),
            concat(col("ta"), col("tb")).as("merged"), col("tcnt").as("cnt"))
        rowOf(t1, 1).unionByName(rowOf(t2, 2)).unionByName(rowOf(t3, 3))
          .orderBy("mrank")
      },
      Some(
        s"""WITH $BpeSym1Sql,
            ${bpeRoundSql(1)}, ${bpeRoundSql(2)}, ${bpeRoundSql(3)}
            SELECT * FROM (
              SELECT CAST(1 AS BIGINT) AS mrank, ta AS left_sym,
                     tb AS right_sym, ta || tb AS merged, tcnt AS cnt
              FROM top1
              UNION ALL
              SELECT CAST(2 AS BIGINT), ta, tb, ta || tb, tcnt FROM top2
              UNION ALL
              SELECT CAST(3 AS BIGINT), ta, tb, ta || tb, tcnt FROM top3)
            ORDER BY mrank""")),

    // Cross-source duplicate-overlap matrix — the dataset-card statistic
    // behind mixture design: how much verbatim content two ingest sources
    // share (a crawl re-packaged under two names shows up here before it
    // double-counts in training). Granularity is the j55 10-token chunk
    // (whole-doc hashes find nothing at the gate SF; shared SPANS are the
    // signal that matters anyway — that's what boilerplate is). Per source
    // the DISTINCT chunk hashes, then a hash-keyed self-join restricted to
    // source_a < source_b with per-pair counts — the posting-list shape
    // (linear in Σ per-hash df², like j9/j24: a hash shared by k sources
    // costs k², never corpus²; hashes unique to one source never produce a
    // joined row). Overlap share in exact basis points against the
    // smaller side.
    Q("j57_source_overlap",
      (s, d) => {
        val hs = truncateLineage(Tables.documents(s, d)
          .withColumn("toks", split(col("text"), " "))
          .select(col("source"), explode(expr(
            """transform(sequence(0, cast((size(toks) + 9) div 10 as int) - 1),
               c -> concat_ws(' ', slice(toks, c * 10 + 1, 10)))"""))
            .as("chunk"))
          .select(col("source"), md5(col("chunk")).as("h"))
          .distinct())
        val sizes = hs.groupBy("source").agg(count(lit(1)).as("n"))
        val pairs = hs.select(col("source").as("source_a"), col("h"))
          .join(hs.select(col("source").as("source_b"), col("h")), "h")
          .filter(col("source_a") < col("source_b"))
          .groupBy("source_a", "source_b")
          .agg(count(lit(1)).as("n_shared"))
        pairs
          .join(sizes.select(col("source").as("source_a"),
            col("n").as("n_a")), "source_a")
          .join(sizes.select(col("source").as("source_b"),
            col("n").as("n_b")), "source_b")
          .select(col("source_a"), col("source_b"), col("n_shared"),
            expr("n_shared * 10000 DIV least(n_a, n_b)").as("overlap_bp"))
          .orderBy("source_a", "source_b")
      },
      Some("""WITH toks AS (
                SELECT source, string_split(text, ' ') AS t FROM documents),
              hs AS (
                SELECT DISTINCT source,
                       md5(array_to_string(t[u.c*10+1:u.c*10+10], ' ')) AS h
                FROM toks,
                     UNNEST(generate_series(0,
                       CAST((len(t) + 9) // 10 AS INT) - 1)) AS u(c)),
              sizes AS (
                SELECT source, CAST(count(*) AS BIGINT) AS n FROM hs
                GROUP BY source),
              pairs AS (
                SELECT a.source AS source_a, b.source AS source_b,
                       CAST(count(*) AS BIGINT) AS n_shared
                FROM hs a JOIN hs b
                  ON a.h = b.h AND a.source < b.source
                GROUP BY 1, 2)
              SELECT source_a, source_b, n_shared,
                     n_shared * 10000 // least(sa.n, sb.n) AS overlap_bp
              FROM pairs
              JOIN sizes sa ON sa.source = source_a
              JOIN sizes sb ON sb.source = source_b
              ORDER BY source_a, source_b""")),

    // Leakage-safe train/val/test split — j36's deterministic LCG split
    // applied to the NEAR-DUP CLUSTER id instead of the doc id: every
    // member of a duplicate cluster lands in the SAME split by
    // construction, so a test document can never have a ≥0.9-Jaccard twin
    // in train (the eval-leakage failure mode doc-level splitting cannot
    // prevent — a known training-data best practice). Pipeline: verified
    // pair graph (the j2 machinery) → star-contraction components → LCG on
    // cluster_id → per-doc (cluster, split) assignment. Singleton clusters
    // have cluster_id = doc_id, so the split distribution matches j36's
    // at corpus scale where near-dup clusters are a vanishing fraction.
    Q("j58_leakage_safe_split",
      (s, d) => {
        val pairs = truncateLineage(neardupPairs(s, d))
        graft.operators.ConnectedComponents
          .byStarContraction(Tables.documents(s, d).select("doc_id"), pairs)
          .withColumn("u", expr(
            "((cluster_id % 1000003) * 2654435761 + 101) % 2147483648 % 100"))
          .withColumn("split", expr(
            """CASE WHEN u < 80 THEN 'train'
                    WHEN u < 90 THEN 'val' ELSE 'test' END"""))
          .select(col("doc_id"), col("cluster_id"), col("split"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $NeardupPairsSql,
              edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                        UNION ALL SELECT doc_b, doc_a FROM pairs),
              reach(a, b) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
              cl AS (
                SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster_id
                FROM reach GROUP BY a)
              SELECT doc_id, cluster_id,
                     CASE WHEN u < 80 THEN 'train'
                          WHEN u < 90 THEN 'val' ELSE 'test' END AS split
              FROM (SELECT doc_id, cluster_id,
                      ((cluster_id % 1000003) * 2654435761 + 101)
                        % 2147483648 % 100 AS u
                    FROM cl)
              ORDER BY doc_id""")),

    // Duplication-graph centrality — iterative graph analytics BEYOND
    // connected components: 5 rounds of exact integer mass diffusion
    // (PageRank's power iteration in micro-units) over the verified
    // near-dup graph. High-mass docs are duplication HUBS — the templates
    // a cleanup pipeline inspects first, a signal cluster membership alone
    // doesn't give (j13 says "same cluster", this says "which member is
    // the center"). Mass seeds as n_chars·1000 (content-weighted — and
    // non-degenerate: this corpus's dup graph is edges + triangles, i.e.
    // REGULAR components, on which a uniform seed is already stationary
    // and five rounds would provably change nothing; the size seed makes
    // every unequal-length near-dup pair actually trade mass).
    // Why integer: each round sends mass(u) DIV deg(u)
    // along every edge and RETAINS the division remainder, so mass is
    // conserved exactly and every round is engine-exact integer arithmetic
    // — a float power iteration could never hash-match across engines
    // (the d16-vs-d13 argument applied to graphs). Fixed K=5 rounds
    // unroll in both engines; each round is one join + one keyed
    // aggregate on the (tiny relative to corpus) edge list, the CC-round
    // shape — at 100 TB this runs on the pair table, never the corpus.
    // The oracle's round CTEs are AS MATERIALIZED: each round references
    // its predecessor twice, and DuckDB's default inlining would expand
    // the chain 2^5-fold (measured: a 79 GB spill at sf0.1).
    Q("j59_dup_graph_rank",
      (s, d) => {
        val pairs = truncateLineage(neardupPairs(s, d))
        val edges = truncateLineage(
          pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
            .union(pairs.select(col("doc_b").as("src"),
              col("doc_a").as("dst"))))
        val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        def diffuse(mass: org.apache.spark.sql.DataFrame)
            : org.apache.spark.sql.DataFrame = {
          val m = mass
            .join(deg, mass("doc_id") === deg("src"), "left")
            .select(col("doc_id"), col("mass"),
              coalesce(col("deg"), lit(0L)).as("deg"))
          val sent = m.filter(col("deg") > 0)
            .join(edges, col("doc_id") === col("src"))
            .groupBy(col("dst").as("doc_id"))
            .agg(sum(expr("mass DIV deg")).as("recv"))
          m.select(col("doc_id"),
              when(col("deg") > 0, col("mass") % col("deg"))
                .otherwise(col("mass")).as("kept"))
            .join(sent, Seq("doc_id"), "left")
            .select(col("doc_id"),
              (col("kept") + coalesce(col("recv"), lit(0L))).as("mass"))
        }
        var mass = Tables.documents(s, d).select(col("doc_id"),
          (col("n_chars") * 1000L).as("mass"))
        (1 to 5).foreach(_ => mass = truncateLineage(diffuse(mass)))
        mass.orderBy("doc_id")
      },
      Some {
        def roundSql(k: Int): String = {
          val n = k + 1
          s"""m$k AS MATERIALIZED (
                SELECT x.doc_id, x.mass, COALESCE(dg.deg, 0) AS deg
                FROM mass$k x LEFT JOIN deg dg ON dg.src = x.doc_id),
              sent$k AS MATERIALIZED (
                SELECT e.dst AS doc_id,
                       CAST(sum(m.mass // m.deg) AS BIGINT) AS recv
                FROM m$k m JOIN edges e ON e.src = m.doc_id
                WHERE m.deg > 0 GROUP BY e.dst),
              mass$n AS MATERIALIZED (
                SELECT m.doc_id,
                       CAST(CASE WHEN m.deg > 0 THEN m.mass % m.deg
                            ELSE m.mass END + COALESCE(s.recv, 0)
                         AS BIGINT) AS mass
                FROM m$k m LEFT JOIN sent$k s ON s.doc_id = m.doc_id)"""
        }
        s"""WITH $NeardupPairsSql,
            edges AS MATERIALIZED (
                      SELECT doc_a AS src, doc_b AS dst FROM pairs
                      UNION ALL SELECT doc_b, doc_a FROM pairs),
            deg AS MATERIALIZED (
                    SELECT src, CAST(count(*) AS BIGINT) AS deg
                    FROM edges GROUP BY src),
            mass1 AS (SELECT doc_id, CAST(n_chars * 1000 AS BIGINT)
                        AS mass FROM documents),
            ${(1 to 5).map(roundSql).mkString(", ")}
            SELECT doc_id, mass FROM mass6 ORDER BY doc_id"""
      }),

    // KMV (k-minimum-values) distinct-overlap sketch — the SKETCH-scale
    // answer to the question j57's exact overlap matrix computes: how many
    // distinct 10-token chunks do two sources share? j57 equi-joins the
    // full per-source chunk-hash sets (linear but corpus-wide); this keeps
    // only each source's K=128 smallest hashed values — a fixed-size
    // per-source synopsis that at 100 TB is computed in one bounded-heap
    // aggregate (the j45 BottomK machinery: ≤K entries per partition into
    // the shuffle, one ≤K-row buffer per source out) and then estimates
    // |A∪B| = (K-1)·M/τ (Bar-Yossef et al. RANDOM'02), Ĵ = |bottom-K(A∪B)
    // ∩ A ∩ B| / |bottom-K(A∪B)|, |A∩B| = Ĵ·|A∪B| — all from ≤K·sources
    // rows, no cross-source corpus join at all. Everything is exact
    // integer arithmetic on a deterministic md5-derived 32-bit value space
    // (fixed-width hex ⇒ lexicographic = numeric order, so the sketch
    // itself never converts; only the per-pair τ does), which is why a
    // SKETCH query can hash-match a DuckDB oracle — same trick as j47's
    // HLL registers. Relative error ~1/√K ≈ 9% (QueriesSpec pins the
    // union estimate within 30% of j57-exact ground truth at sf0.01).
    Q("j60_kmv_overlap",
      (s, d) => {
        import s.implicits._
        val K = 128
        val M = 4294967296L // 16^8: the hashed value space
        // element universe = j57's: distinct 10-token chunk hashes/source
        val hs = Tables.documentsSpread(s, d)
          .withColumn("toks", split(col("text"), " "))
          .select(col("source"), explode(expr(
            """transform(sequence(0, cast((size(toks) + 9) div 10 as int) - 1),
               c -> concat_ws(' ', slice(toks, c * 10 + 1, 10)))"""))
            .as("chunk"))
          .select(col("source"),
            substring(md5(concat(lit("kmv:"), md5(col("chunk")))), 1, 8)
              .as("hex"))
          .distinct()
        // per-source sketch: the K lexicographically-smallest hex values,
        // via the bounded-heap Aggregator (constant state; the window
        // formulation would sort every distinct chunk of a source).
        // Materialized ONCE: the pairwise stage references it three times
        // (source list ×2 + the membership join), and without truncation
        // each reference re-runs the corpus scan + distinct + heap agg
        // (the diamond problem — PlanSpec pins the single scan).
        val sk = truncateLineage(hs
          .select(col("source"), lit(0L).as("doc_id"), col("hex").as("pri"))
          .as[graft.functions.DocPri]
          .groupByKey(_.source)
          .agg(new graft.functions.BottomK(K).toColumn.name("bk"))
          .toDF("source", "bk")
          .select(col("source"),
            explode(col("bk.entries").getField("pri")).as("hex")))
        // pairwise estimates over the ≤K·sources surviving rows (tiny)
        val srcs = sk.select(col("source")).distinct()
        val pairs = srcs.select(col("source").as("sa"))
          .crossJoin(srcs.select(col("source").as("sb")))
          .filter(col("sa") < col("sb"))
        val uni = pairs
          .join(sk, col("source") === col("sa") || col("source") === col("sb"))
          .groupBy("sa", "sb", "hex")
          .agg(max((col("source") === col("sa")).cast("int")).as("in_a"),
            max((col("source") === col("sb")).cast("int")).as("in_b"))
        val w = Window.partitionBy("sa", "sb").orderBy("hex")
        val bk = uni.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= K)
        bk.groupBy("sa", "sb")
          .agg(count(lit(1)).as("n_sk"),
            sum(col("in_a") * col("in_b")).as("k_int"),
            max(col("hex")).as("tau_hex"))
          .withColumn("tau", expr("cast(conv(tau_hex, 16, 10) as bigint)"))
          .withColumn("est_union", expr(
            s"CASE WHEN n_sk < $K THEN n_sk " +
              s"ELSE ${(K - 1).toLong * M} DIV greatest(tau, 1) END"))
          .select(col("sa").as("source_a"), col("sb").as("source_b"),
            col("n_sk"), col("k_int"), col("tau"), col("est_union"),
            expr("k_int * 10000 DIV n_sk").as("est_jaccard_bp"),
            expr("k_int * est_union DIV n_sk").as("est_intersect"))
          .orderBy("source_a", "source_b")
      },
      Some("""WITH toks AS (
                SELECT source, string_split(text, ' ') AS t FROM documents),
              hs AS (
                SELECT DISTINCT source,
                       substring(md5('kmv:' ||
                         md5(array_to_string(t[u.c*10+1:u.c*10+10], ' '))),
                         1, 8) AS hex
                FROM toks,
                     UNNEST(generate_series(0,
                       CAST((len(t) + 9) // 10 AS INT) - 1)) AS u(c)),
              sk AS (
                SELECT source, hex FROM (
                  SELECT source, hex,
                         row_number() OVER (PARTITION BY source
                                            ORDER BY hex) AS rk
                  FROM hs) WHERE rk <= 128),
              pr AS (
                SELECT a.source AS sa, b.source AS sb
                FROM (SELECT DISTINCT source FROM sk) a,
                     (SELECT DISTINCT source FROM sk) b
                WHERE a.source < b.source),
              uni AS (
                SELECT pr.sa, pr.sb, s.hex,
                       max(CASE WHEN s.source = pr.sa THEN 1 ELSE 0 END)
                         AS in_a,
                       max(CASE WHEN s.source = pr.sb THEN 1 ELSE 0 END)
                         AS in_b
                FROM pr JOIN sk s ON s.source = pr.sa OR s.source = pr.sb
                GROUP BY 1, 2, 3),
              bk AS (
                SELECT * FROM (
                  SELECT sa, sb, hex, in_a, in_b,
                         row_number() OVER (PARTITION BY sa, sb
                                            ORDER BY hex) AS rk
                  FROM uni) WHERE rk <= 128),
              res AS (
                SELECT sa, sb,
                       CAST(count(*) AS BIGINT) AS n_sk,
                       CAST(sum(in_a * in_b) AS BIGINT) AS k_int,
                       max(hex) AS tau_hex
                FROM bk GROUP BY 1, 2),
              res2 AS (
                SELECT sa, sb, n_sk, k_int,
                       CAST(
                         (strpos('0123456789abcdef', substring(tau_hex,1,1)) - 1) * 268435456
                       + (strpos('0123456789abcdef', substring(tau_hex,2,1)) - 1) * 16777216
                       + (strpos('0123456789abcdef', substring(tau_hex,3,1)) - 1) * 1048576
                       + (strpos('0123456789abcdef', substring(tau_hex,4,1)) - 1) * 65536
                       + (strpos('0123456789abcdef', substring(tau_hex,5,1)) - 1) * 4096
                       + (strpos('0123456789abcdef', substring(tau_hex,6,1)) - 1) * 256
                       + (strpos('0123456789abcdef', substring(tau_hex,7,1)) - 1) * 16
                       + (strpos('0123456789abcdef', substring(tau_hex,8,1)) - 1)
                         AS BIGINT) AS tau
                FROM res),
              res3 AS (
                SELECT sa, sb, n_sk, k_int, tau,
                       CAST(CASE WHEN n_sk < 128 THEN n_sk
                            ELSE 127 * 4294967296 // greatest(tau, 1) END
                         AS BIGINT) AS est_union
                FROM res2)
              SELECT sa AS source_a, sb AS source_b, n_sk, k_int, tau,
                     est_union,
                     CAST(k_int * 10000 // n_sk AS BIGINT) AS est_jaccard_bp,
                     CAST(k_int * est_union // n_sk AS BIGINT)
                       AS est_intersect
              FROM res3 ORDER BY source_a, source_b""")),

    // Learned-codebook training audit — the ORACLE-CHECKED form of the
    // IvfKMeans training loop (operators/IvfKMeans.scala). trainExact
    // replays Lloyd in 1e-6 fixed point: md5-priority sample (engine-
    // neutral, unlike murmur3 `hash`), integer squared-euclidean
    // assignment with cent_id tie-break, floor-mean centroid update —
    // every iteration a pure function of integers, so the DuckDB oracle
    // unrolls the SAME 3 iterations and must land on the identical
    // codebook, cell assignment, and recall integers. Output is the
    // per-cell differential audit: collection cell sizes under the seed
    // (iteration-0 = fixed) codebook vs the trained one, plus probe
    // counts and exact-top-10 retrieval hits under each — the j41-style
    // measure-it-exactly pattern applied to training. Scale: training
    // cost is O(sample·k·d·iters) independent of collection size with
    // k×d-long driver model state (the sanctioned bounded collect);
    // the audit itself is two broadcast-codebook assignment passes over
    // the collection and one broadcast-probe exact-kNN pass, probe panel
    // plan-capped at 64 below the broadcast like j4/j16.
    Q("j61_ivf_train_audit",
      (s, d) => {
        import graft.operators.IvfKMeans
        val K = 8; val ITERS = 3; val SAMPLE = 256; val TOPK = 10
        val e = Tables.embeddingsSpread(s, d)
        val (seedC, learnedC) = IvfKMeans.trainExact(e, K, ITERS, SAMPLE)
        val qe = truncateLineage(IvfKMeans.quantize(e))
        val aF = truncateLineage(
          IvfKMeans.assignExact(qe, seedC).select("vec_id", "cell"))
        val aL = truncateLineage(
          IvfKMeans.assignExact(qe, learnedC).select("vec_id", "cell"))
        // NOT lineage-truncated: each reference re-runs a TakeOrdered(64)
        // over the checkpointed qe (cheap), and in exchange the limit=64
        // cap below every broadcast stays STRUCTURAL in the plan
        // (PlanSpec-pinned) instead of hidden behind a checkpoint RDD —
        // j16's recompute-the-tiny-probe-side tradeoff.
        val probes =
          qe.filter(col("vec_id") % 100 === 7).orderBy("vec_id").limit(64)
            .select(col("vec_id").as("probe_id"), col("qv").as("pq"))
        val wEx = Window.partitionBy("probe_id")
          .orderBy(col("d2").asc, col("vec_id"))
        val exact = truncateLineage(qe.crossJoin(broadcast(probes))
          .filter(col("vec_id") =!= col("probe_id"))
          .withColumn("d2", expr(IvfKMeans.d2Expr("qv", "pq")))
          .withColumn("rk", row_number().over(wEx))
          .filter(col("rk") <= TOPK)
          .select(col("probe_id"), col("vec_id").as("nb")))
        def probeCells(aX: org.apache.spark.sql.DataFrame) =
          aX.join(broadcast(probes.select(col("probe_id"))),
              col("vec_id") === col("probe_id"))
            .select(col("probe_id"), col("cell").as("pcell"))
        def sizes(aX: org.apache.spark.sql.DataFrame, name: String) =
          aX.groupBy("cell").agg(count(lit(1)).as(name))
        def probeN(pX: org.apache.spark.sql.DataFrame, name: String) =
          pX.withColumn("cell", col("pcell"))
            .groupBy("cell").agg(count(lit(1)).as(name))
        def hits(aX: org.apache.spark.sql.DataFrame,
            pX: org.apache.spark.sql.DataFrame, name: String) =
          exact.join(pX, Seq("probe_id"))
            .join(aX.select(col("vec_id").as("nb"),
              col("cell").as("ncell")), Seq("nb"))
            .filter(col("ncell") === col("pcell"))
            .withColumn("cell", col("pcell"))
            .groupBy("cell").agg(count(lit(1)).as(name))
        val pF = probeCells(aF); val pL = probeCells(aL)
        s.range(K).toDF("cell")
          .join(sizes(aF, "n_fixed"), Seq("cell"), "left")
          .join(sizes(aL, "n_learned"), Seq("cell"), "left")
          .join(probeN(pF, "probes_fixed"), Seq("cell"), "left")
          .join(probeN(pL, "probes_learned"), Seq("cell"), "left")
          .join(hits(aF, pF, "hits_fixed"), Seq("cell"), "left")
          .join(hits(aL, pL, "hits_learned"), Seq("cell"), "left")
          .na.fill(0L)
          .select("cell", "n_fixed", "n_learned", "probes_fixed",
            "probes_learned", "hits_fixed", "hits_learned")
          .orderBy("cell")
      },
      Some {
        val K = 8; val ITERS = 3; val SAMPLE = 256; val TOPK = 10
        def d2(a: String, b: String): String =
          s"""list_reduce(list_transform(generate_series(1, 64),
              i -> ($a[i] - $b[i]) * ($a[i] - $b[i])), (x, y) -> x + y)"""
        // one Lloyd iteration: assign the sample to the previous codebook,
        // rebuild each centroid as per-dim floor-means (empty cells keep
        // the previous centroid)
        def iterCtes(t: Int): String =
          s"""a$t AS (
                SELECT vec_id, qv, cent_id AS cell FROM (
                  SELECT s.vec_id, s.qv, c.cent_id,
                         row_number() OVER (PARTITION BY s.vec_id
                           ORDER BY ${d2("s.qv", "c.cvec")} ASC, c.cent_id)
                           AS ark
                  FROM samp s CROSS JOIN c${t - 1} c) WHERE ark = 1),
              c$t AS (
                SELECT p.cent_id, COALESCE(n.cvec, p.cvec) AS cvec
                FROM c${t - 1} p LEFT JOIN (
                  SELECT cell AS cent_id, list(m ORDER BY pos) AS cvec
                  FROM (
                    SELECT a.cell, dims.i AS pos,
                           CAST(floor(CAST(sum(a.qv[dims.i]) AS DOUBLE)
                             / count(*)) AS BIGINT) AS m
                    FROM a$t a CROSS JOIN
                      (SELECT unnest(generate_series(1, 64)) AS i) dims
                    GROUP BY a.cell, dims.i)
                  GROUP BY cell) n ON p.cent_id = n.cent_id)"""
        def assignCte(name: String, cb: String): String =
          s"""$name AS (
                SELECT vec_id, cent_id AS cell FROM (
                  SELECT q.vec_id, c.cent_id,
                         row_number() OVER (PARTITION BY q.vec_id
                           ORDER BY ${d2("q.qv", "c.cvec")} ASC, c.cent_id)
                           AS ark
                  FROM qe q CROSS JOIN $cb c) WHERE ark = 1)"""
        def perCodebook(x: String, a: String): String =
          s"""p$x AS (
                SELECT a.vec_id, a.cell AS pcell FROM $a a
                JOIN probes p ON a.vec_id = p.probe_id),
              h$x AS (
                SELECT p.pcell AS cell, CAST(count(*) AS BIGINT) AS hits
                FROM exact e
                JOIN p$x p ON e.probe_id = p.vec_id
                JOIN $a n ON e.nb = n.vec_id AND n.cell = p.pcell
                GROUP BY p.pcell),
              n$x AS (SELECT cell, CAST(count(*) AS BIGINT) AS n
                      FROM $a GROUP BY cell),
              q$x AS (SELECT pcell AS cell, CAST(count(*) AS BIGINT) AS n
                      FROM p$x GROUP BY pcell)"""
        s"""WITH qe AS (
              SELECT vec_id, list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
                AS qv
              FROM embeddings),
            samp AS (
              SELECT vec_id, qv FROM qe
              ORDER BY md5('ivf:' || CAST(vec_id AS VARCHAR)), vec_id
              LIMIT $SAMPLE),
            c0 AS (
              SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
                       AS cent_id, qv AS cvec
              FROM (SELECT vec_id, qv FROM samp ORDER BY vec_id LIMIT $K)),
            ${(1 to ITERS).map(iterCtes).mkString(",\n")},
            ${assignCte("af", "c0")},
            ${assignCte("al", s"c$ITERS")},
            probes AS (
              SELECT vec_id AS probe_id, qv AS pq FROM qe
              WHERE vec_id % 100 = 7 ORDER BY vec_id LIMIT 64),
            exact AS (
              SELECT probe_id, vec_id AS nb FROM (
                SELECT p.probe_id, q.vec_id,
                       row_number() OVER (PARTITION BY p.probe_id
                         ORDER BY ${d2("q.qv", "p.pq")} ASC, q.vec_id) AS rk
                FROM qe q CROSS JOIN probes p
                WHERE q.vec_id <> p.probe_id) WHERE rk <= $TOPK),
            ${perCodebook("f", "af")},
            ${perCodebook("l", "al")},
            cells AS (
              SELECT CAST(unnest(generate_series(0, ${K - 1})) AS BIGINT)
                       AS cell)
            SELECT c.cell,
                   CAST(COALESCE(nf.n, 0) AS BIGINT) AS n_fixed,
                   CAST(COALESCE(nl.n, 0) AS BIGINT) AS n_learned,
                   CAST(COALESCE(qf.n, 0) AS BIGINT) AS probes_fixed,
                   CAST(COALESCE(ql.n, 0) AS BIGINT) AS probes_learned,
                   CAST(COALESCE(hf.hits, 0) AS BIGINT) AS hits_fixed,
                   CAST(COALESCE(hl.hits, 0) AS BIGINT) AS hits_learned
            FROM cells c
            LEFT JOIN nf ON nf.cell = c.cell
            LEFT JOIN nl ON nl.cell = c.cell
            LEFT JOIN qf ON qf.cell = c.cell
            LEFT JOIN ql ON ql.cell = c.cell
            LEFT JOIN hf ON hf.cell = c.cell
            LEFT JOIN hl ON hl.cell = c.cell
            ORDER BY c.cell"""
      }),

    // Exact-substring cross-doc dedup — the remaining member of the dedup
    // family (Lee et al. 2022, "Deduplicating Training Data Makes Language
    // Models Better"): find the longest TOKEN SPAN each document shares
    // verbatim with any other document, the signal behind
    // "remove any substring repeated ≥ N tokens". Lee et al. build a
    // corpus suffix array (inherently sequential); the distributed-exact
    // form used here is the gram-diagonal method: positional 8-gram
    // occurrences, an inverted-index self-join on the gram hash (cost
    // Σ df(g)² like j9/j57 — never n² over docs), and run-length merging
    // of consecutive matches on each (doc_a, doc_b, pa-pb) diagonal — a
    // shared span of T tokens is exactly a run of T-7 consecutive gram
    // hits on one diagonal, so spans reconstruct EXACTLY (not a lower
    // bound) from gram-local evidence. Per doc: the longest such span,
    // the partner achieving it (ties to the smaller doc_id), and the
    // distinct-partner count. At 100 TB the one extra knob is a df cap on
    // the gram table (stopword-like grams out of the join, the guard j38
    // applies to query terms) — REGISTERED and oracle-checked as
    // j66_substring_dedup_capped; this uncapped form stays the
    // exact-recall baseline.
    Q("j62_substring_dedup",
      (s, d) => substringSpans(Tables.documentsSpread(s, d), dfCap = None),
      Some("""WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS t FROM documents),
              g AS (
                SELECT doc_id, u.i AS p,
                       md5(array_to_string(t[u.i:u.i+7], ' ')) AS g
                FROM toks, UNNEST(generate_series(1, len(t) - 7)) AS u(i)
                WHERE len(t) >= 8),
              m AS (
                SELECT a.doc_id AS da, b.doc_id AS db, a.p AS pa,
                       a.p - b.p AS diag
                FROM g a JOIN g b ON a.g = b.g AND a.doc_id <> b.doc_id),
              runs AS (
                SELECT da, db, diag,
                       pa - row_number() OVER (PARTITION BY da, db, diag
                                               ORDER BY pa) AS grp
                FROM m),
              spans AS (
                SELECT da, db, CAST(count(*) + 7 AS BIGINT) AS span
                FROM runs GROUP BY da, db, diag, grp),
              best AS (
                SELECT da, db, max(span) AS span FROM spans GROUP BY da, db),
              agg1 AS (
                SELECT da, CAST(max(span) AS BIGINT) AS max_shared_tokens,
                       CAST(count(*) AS BIGINT) AS n_partners
                FROM best GROUP BY da),
              p1 AS (
                SELECT da, db AS partner_id FROM (
                  SELECT da, db, row_number() OVER (PARTITION BY da
                    ORDER BY span DESC, db) AS rk
                  FROM best) WHERE rk = 1)
              SELECT agg1.da AS doc_id, max_shared_tokens, partner_id,
                     n_partners
              FROM agg1 JOIN p1 ON agg1.da = p1.da ORDER BY doc_id""")),

    // Product quantization (Jégou et al. TPAMI'11) — the compression half
    // of the FAISS-style IVF-PQ index that makes billion-vector ANN fit in
    // memory: each 64-dim vector becomes 8 four-bit codes (one per 8-dim
    // subspace, 16-entry codebook) + we report the exact integer squared
    // reconstruction error. Everything runs in j61's 1e-6 fixed point, so
    // the codes AND the error hash-match the DuckDB replay. Scale: the
    // codebook is 128 broadcast rows; encoding is one map-side broadcast
    // join + the map-side min(struct) argmin (see pqCodesAgainst) —
    // linear, and the output is ~50 bytes/vector instead of 256 (the
    // point of PQ).
    Q("j63_pq_encode",
      (s, d) => {
        graft.functions.SquaredDistance.register(s)
        val subs = pqSubs(
          graft.operators.IvfKMeans.quantize(Tables.embeddings(s, d)))
        pqCodeAgg(pqCodes(subs)).orderBy("vec_id")
      },
      Some(s"""WITH $PqCodesSql
               SELECT vec_id,
                      string_agg(CAST(code AS VARCHAR), '-' ORDER BY m)
                        AS pq_code,
                      CAST(sum(d2) AS BIGINT) AS err_q
               FROM codes GROUP BY vec_id ORDER BY vec_id""")),

    // IVF-PQ search with asymmetric distance computation — the other half:
    // probes search only their IVF cell (j16's coarse routing, here under
    // j61's integer codebook) and rank candidates WITHOUT touching raw
    // vectors — each probe precomputes an 8×16 table of subspace distances
    // to the PQ codebook, and a candidate's distance is 8 table lookups
    // summed (ADC, Jégou et al. §IV). At 100 TB that is the architecture
    // that works: the raw vectors stay on disk, the scan reads only the
    // byte codes, the distance tables are a broadcast (probes×128 rows),
    // and the per-probe work is |cell| lookups, not |cell| dot products.
    // All integer-exact, so ranking and distances hash-match the oracle.
    Q("j64_ivfpq_adc",
      (s, d) => {
        graft.functions.SquaredDistance.register(s)
        // qe is NOT truncated — it carries the full 64-long vectors, and
        // checkpointing a vector-carrying table is the measured j16
        // negative (at 200k vectors the qe checkpoint alone took longer
        // than recomputing the quantize map per pass). The three passes
        // below each re-derive quantize from the parquet scan; what IS
        // truncated is every SMALL output the search reads (codes, cells,
        // dtab) — the standing materialize-only-small-outputs rule.
        // Measured at 200k vectors (4 threads): 29.6 s as first written
        // (window argmin + exploded ADC join + qe checkpoint) → 13.4 s
        // final (min-struct argmin, packed-array ADC, codegen'd graft_d2).
        val qe = graft.operators.IvfKMeans.quantize(Tables.embeddings(s, d))
        val subs = pqSubs(qe)
        // the stored index half: codes packed to ONE 8-entry array per
        // vector (how a real PQ index lays codes out — contiguous bytes,
        // not (vector, subspace) rows), so the search join below carries
        // one row per candidate instead of eight
        val codes = truncateLineage(pqCodes(subs)
          .groupBy("vec_id")
          .agg(expr("""transform(array_sort(collect_list(struct(m, code))),
                 x -> x.code)""").as("codes")))
        // IVF coarse cells under the integer codebook (16 lowest vec_ids);
        // the shared ivfCellAssign — min(struct) argmin, the 16 candidate
        // rows per vector collapse in-task, no window sort
        val cells = truncateLineage(ivfCellAssign(qe, ivfCents(qe)))
        // probe panel plan-capped like j4/j12/j16: the broadcast side can
        // never grow with the collection
        val probes = cells.filter(col("vec_id") % 100 === 7)
          .orderBy("vec_id").limit(64)
          .select(col("vec_id").as("probe_id"), col("cell").as("pcell"))
        // per-probe subspace distance tables: probes×8×16 rows → broadcast
        val pcents = pqCents(subs)
        // per-probe lookup table flattened to a 128-entry array indexed by
        // m*16 + code — ADC as it is actually implemented: a candidate's
        // distance is 8 array lookups summed in one per-row fold, so the
        // search stage is ONE keyed join (candidates × packed codes) + a
        // map — no exploded (vector, subspace) join, no re-aggregation
        // (measured: the exploded form re-shuffled 8× the rows and paid a
        // second keyed agg)
        val dtab = truncateLineage(subs.join(broadcast(probes),
            col("vec_id") === col("probe_id"))
          .select(col("probe_id"), col("m"), col("sub"))
          .join(broadcast(pcents), Seq("m"))
          .withColumn("pd2",
            expr(graft.operators.IvfKMeans.d2Expr("sub", "csub")))
          .groupBy("probe_id")
          .agg(expr(
            """transform(array_sort(collect_list(struct(m, cent_id, pd2))),
               x -> x.pd2)""").as("dt")))
        val cand = cells.join(broadcast(probes),
            col("cell") === col("pcell") && col("vec_id") =!= col("probe_id"))
          .select(col("probe_id"), col("vec_id"))
        val w = Window.partitionBy("probe_id")
          .orderBy(col("adist").asc, col("vec_id"))
        cand.join(codes, Seq("vec_id"))
          .join(broadcast(dtab), Seq("probe_id"))
          .withColumn("adist", expr(
            """aggregate(sequence(0, 7), cast(0 as bigint),
               (acc, m) -> acc + element_at(dt,
                 m * 16 + cast(element_at(codes, m + 1) as int) + 1))"""))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 3)
          .select("probe_id", "vec_id", "adist", "rk")
          .orderBy("probe_id", "rk")
      },
      Some(s"""WITH $PqCodesSql,
               icents AS (
                 SELECT vec_id AS cent_id, qv AS cvec FROM q
                 WHERE vec_id < 16),
               cellsc AS (
                 SELECT vec_id, cent_id AS cell FROM (
                   SELECT q.vec_id, i.cent_id,
                          row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY CAST(list_sum(list_transform(
                              generate_series(1, 64),
                              k -> (q.qv[k] - i.cvec[k]) *
                                   (q.qv[k] - i.cvec[k]))) AS BIGINT),
                            i.cent_id) AS ark
                   FROM q CROSS JOIN icents i) WHERE ark = 1),
               probes AS (
                 SELECT vec_id AS probe_id, cell AS pcell FROM cellsc
                 WHERE vec_id % 100 = 7 ORDER BY vec_id LIMIT 64),
               dtab AS (
                 SELECT p.probe_id, s.m, c.cent_id AS code,
                        CAST(list_sum(list_transform(generate_series(1, 8),
                          i -> (s.sub[i] - c.csub[i]) *
                               (s.sub[i] - c.csub[i]))) AS BIGINT) AS pd2
                 FROM probes p JOIN subs s ON s.vec_id = p.probe_id
                 JOIN pcents c ON c.m = s.m),
               cand AS (
                 SELECT p.probe_id, cc.vec_id FROM cellsc cc JOIN probes p
                   ON cc.cell = p.pcell AND cc.vec_id <> p.probe_id),
               ad AS (
                 SELECT cand.probe_id, cand.vec_id,
                        CAST(sum(d.pd2) AS BIGINT) AS adist
                 FROM cand
                 JOIN codes k ON k.vec_id = cand.vec_id
                 JOIN dtab d ON d.probe_id = cand.probe_id AND d.m = k.m
                            AND d.code = k.code
                 GROUP BY cand.probe_id, cand.vec_id)
               SELECT probe_id, vec_id, adist, rk FROM (
                 SELECT probe_id, vec_id, adist,
                        CAST(row_number() OVER (PARTITION BY probe_id
                          ORDER BY adist, vec_id) AS BIGINT) AS rk
                 FROM ad) t
               WHERE rk <= 3 ORDER BY probe_id, rk""")),

    // HTML text extraction — the FIRST stage of every web-crawl training
    // pipeline (before any cleaning/dedup runs, markup must go). The
    // corpus ships plain text, so the markup is synthesized
    // deterministically per doc (the j52 augmentation discipline: both
    // engines build the identical wrapper from (doc_id, text), so the
    // extraction kernel is exercised on every row and stays oracle-exact;
    // every 5th doc additionally gets entity-escaped ampersands injected
    // between tokens to drive the entity-decode path). Kernel: strip tags
    // → decode entities → collapse whitespace → trim; patterns live in
    // the Java-regex ∩ RE2 shared dialect (j52's rule), DuckDB's
    // regexp_replace needs 'g' (j21's rule). MAP-ONLY — one scan, the
    // only exchange is the output sort; at 100 TB this runs at ingest
    // wire speed. QueriesSpec pins the round-trip law: stripping the
    // wrapper recovers exactly "Doc <id> <text>" (resp. its entity-decoded
    // form), recomputed JVM-side per row.
    Q("j65_html_strip",
      (s, d) => {
        val entified = when(col("doc_id") % 5 === 0,
          regexp_replace(col("text"), " ", " &amp; "))
          .otherwise(col("text"))
        Tables.documents(s, d)
          .withColumn("html", concat(
            lit("<html><body><div class=\"c"),
            (col("doc_id") % 7).cast("string"),
            lit("\"><h1>Doc "), col("doc_id").cast("string"),
            lit("</h1><p>"), entified,
            lit("</p><br/></div></body></html>")))
          .withColumn("n_tags",
            regexp_count(col("html"), lit("<[^>]*>")).cast("long"))
          .withColumn("stripped", trim(regexp_replace(regexp_replace(
            regexp_replace(col("html"), "<[^>]*>", " "),
            "&amp;", "&"), " +", " ")))
          .select(col("doc_id"), col("n_tags"),
            length(col("stripped")).cast("long").as("n_chars"),
            md5(col("stripped")).as("stripped_md5"))
          .orderBy("doc_id")
      },
      Some("""WITH aug AS (
                SELECT doc_id,
                       '<html><body><div class="c'
                         || CAST(doc_id % 7 AS VARCHAR)
                         || '"><h1>Doc ' || CAST(doc_id AS VARCHAR)
                         || '</h1><p>'
                         || CASE WHEN doc_id % 5 = 0
                              THEN regexp_replace(text, ' ', ' &amp; ', 'g')
                              ELSE text END
                         || '</p><br/></div></body></html>' AS html
                FROM documents),
              stripped AS (
                SELECT doc_id, html,
                       trim(regexp_replace(regexp_replace(regexp_replace(
                         html, '<[^>]*>', ' ', 'g'),
                         '&amp;', '&', 'g'), ' +', ' ', 'g')) AS s
                FROM aug)
              SELECT doc_id,
                     CAST(len(regexp_extract_all(html, '<[^>]*>'))
                       AS BIGINT) AS n_tags,
                     CAST(length(s) AS BIGINT) AS n_chars,
                     md5(s) AS stripped_md5
              FROM stripped ORDER BY doc_id""")),

    // j62's 100 TB form, REGISTERED: the gram df cap that round 11 only
    // documented is executable and oracle-checked here. Grams occurring
    // more than twice in the corpus leave the inverted index before the
    // self-join (cap = 2 ⇒ only pure pairwise evidence joins; every
    // gram's pair contribution is bounded at cap² and a boilerplate gram
    // shared by millions of docs costs nothing instead of df²). Same
    // output contract as j62 over the surviving spans; the recall trade
    // (spans crossing a dropped gram shrink or vanish) is pinned with a
    // planted-hot-gram corpus in QueriesSpec and measured on the
    // ScaleSynth hotgram ladder (hotEvery=10, one gram in 10% of docs,
    // 4 threads): 30k docs uncapped 16.9 s / capped 10.7 s; 60k docs
    // uncapped 60.4 s / capped 18.2 s — doubling the corpus grew the
    // uncapped join 3.6× (the df² term) but the capped one 1.7×
    // (≈linear), which is the whole argument for the knob at 100 TB.
    // DuckDB replays the cap exactly — it is
    // one HAVING on the gram CTE — so the knob itself is hash-checked.
    Q("j66_substring_dedup_capped",
      (s, d) => substringSpans(Tables.documentsSpread(s, d),
        dfCap = Some(2L)),
      Some("""WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS t FROM documents),
              g0 AS (
                SELECT doc_id, u.i AS p,
                       md5(array_to_string(t[u.i:u.i+7], ' ')) AS g
                FROM toks, UNNEST(generate_series(1, len(t) - 7)) AS u(i)
                WHERE len(t) >= 8),
              keep AS (
                SELECT g FROM g0 GROUP BY g HAVING count(*) <= 2),
              g AS (
                SELECT g0.* FROM g0 JOIN keep ON g0.g = keep.g),
              m AS (
                SELECT a.doc_id AS da, b.doc_id AS db, a.p AS pa,
                       a.p - b.p AS diag
                FROM g a JOIN g b ON a.g = b.g AND a.doc_id <> b.doc_id),
              runs AS (
                SELECT da, db, diag,
                       pa - row_number() OVER (PARTITION BY da, db, diag
                                               ORDER BY pa) AS grp
                FROM m),
              spans AS (
                SELECT da, db, CAST(count(*) + 7 AS BIGINT) AS span
                FROM runs GROUP BY da, db, diag, grp),
              best AS (
                SELECT da, db, max(span) AS span FROM spans GROUP BY da, db),
              agg1 AS (
                SELECT da, CAST(max(span) AS BIGINT) AS max_shared_tokens,
                       CAST(count(*) AS BIGINT) AS n_partners
                FROM best GROUP BY da),
              p1 AS (
                SELECT da, db AS partner_id FROM (
                  SELECT da, db, row_number() OVER (PARTITION BY da
                    ORDER BY span DESC, db) AS rk
                  FROM best) WHERE rk = 1)
              SELECT agg1.da AS doc_id, max_shared_tokens, partner_id,
                     n_partners
              FROM agg1 JOIN p1 ON agg1.da = p1.da ORDER BY doc_id""")),

    // Inverted multi-index coarse quantizer (Babenko & Lempitsky CVPR'12)
    // — the scalable ANN coarse ASSIGNMENT: cells are the PRODUCT of two
    // independent half-vector codebooks, so kHalf² cells cost 2·kHalf
    // distance evals per vector instead of kHalf² (here 4×4 = 16 cells
    // from 8 evals — and at the production k = √n sizing, n·2·n^(1/4)
    // total evals instead of n^1.5, closing IvfKMeans.scaledK's build
    // caveat). EXACT by the product-structure law: integer squared
    // euclidean decomposes over the halves, so the product argmin IS the
    // flat argmin over the 16 materialized concatenated centroids
    // (QueriesSpec pins the equality); everything runs in j61's 1e-6
    // fixed point so DuckDB replays both half argmins bit-for-bit.
    Q("j67_imi_cells",
      (s, d) => {
        val qe = graft.operators.IvfKMeans.quantize(
          Tables.embeddingsSpread(s, d))
        graft.operators.IvfKMeans.imiAssign(qe, kHalf = 4)
          .orderBy("vec_id")
      },
      Some("""WITH q AS (
                SELECT vec_id, list_transform(embedding,
                  x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
                  AS qv
                FROM embeddings),
              h AS (
                SELECT vec_id, qv[1:32] AS lo, qv[33:64] AS hi FROM q),
              cl AS (
                SELECT vec_id AS cid, lo AS cv FROM h WHERE vec_id < 4),
              ch AS (
                SELECT vec_id AS cid, hi AS cv FROM h WHERE vec_id < 4),
              alo AS (
                SELECT h.vec_id, c.cid,
                       CAST(list_sum(list_transform(generate_series(1, 32),
                         i -> (h.lo[i] - c.cv[i]) * (h.lo[i] - c.cv[i])))
                         AS BIGINT) AS d2
                FROM h CROSS JOIN cl c),
              ahi AS (
                SELECT h.vec_id, c.cid,
                       CAST(list_sum(list_transform(generate_series(1, 32),
                         i -> (h.hi[i] - c.cv[i]) * (h.hi[i] - c.cv[i])))
                         AS BIGINT) AS d2
                FROM h CROSS JOIN ch c),
              blo AS (
                SELECT vec_id, cid AS cell_lo, d2 AS d2_lo FROM (
                  SELECT vec_id, cid, d2, row_number() OVER (
                    PARTITION BY vec_id ORDER BY d2, cid) AS rk
                  FROM alo) WHERE rk = 1),
              bhi AS (
                SELECT vec_id, cid AS cell_hi, d2 AS d2_hi FROM (
                  SELECT vec_id, cid, d2, row_number() OVER (
                    PARTITION BY vec_id ORDER BY d2, cid) AS rk
                  FROM ahi) WHERE rk = 1)
              SELECT blo.vec_id, cell_lo, cell_hi,
                     CAST(cell_lo * 4 + cell_hi AS BIGINT) AS cell,
                     d2_lo, d2_hi
              FROM blo JOIN bhi ON blo.vec_id = bhi.vec_id
              ORDER BY blo.vec_id""")),

    // IMI search — the other half of j67 (Babenko & Lempitsky's
    // multi-sequence idea in its rank form): a probe scores the kHalf
    // centroids of EACH half (2·kHalf = 8 distance evals), orders all
    // kHalf² product cells by the decomposed lower bound dl(i) + dh(j) —
    // which for product cells is the probe's EXACT distance to the
    // concatenated centroid, not a bound — probes the top-3 cells, and
    // ranks only those cells' members by full integer distance. The
    // probe-side work is 8 evals + a 16-row sort + |probed cells|
    // candidates; the collection is touched only through the cell
    // equi-join (one row per candidate fetches its vector — at 100 TB
    // the vector fetch is candidates-sized, never collection-sized).
    // All integer-exact → cell choice, candidate set, and ranking
    // hash-match the DuckDB replay.
    Q("j68_imi_search",
      (s, d) => imiSearchTop3(s, d).orderBy("probe_id", "rk"),
      Some(s"""WITH $ImiSearchCte
              SELECT probe_id, vec_id, adist, rk FROM (
                SELECT probe_id, vec_id, adist,
                       CAST(row_number() OVER (PARTITION BY probe_id
                         ORDER BY adist, vec_id) AS BIGINT) AS rk
                FROM ad) t
              WHERE rk <= 3 ORDER BY probe_id, rk""")),

    // IMI recall audit (round 16) — the approximation QUALITY of j68's
    // index registered as an oracle-checked fact: per probe, how many of
    // the EXACT top-3 neighbors (brute force over the whole collection,
    // the j3 shape) the 3-cell IMI probe recovered, in exact basis points.
    // Every ANN deployment quotes recall@k; here the number itself
    // hash-matches because both rankings are integer-exact with total
    // tie orders, so the audit can run continuously over index rebuilds
    // (a silent recall collapse — bad codebooks, skewed cells — fails
    // the oracle, not just a ladder). Shapes: the IMI side is j68's
    // seam verbatim; the brute side is ONE broadcast of the 64-probe
    // panel against the collection (probe-panel-sized × n distance
    // evals — the audit costs one brute pass, which is exactly what an
    // offline recall check pays at any scale; sample probes, never the
    // collection). Recall measured REAL on this corpus: not 100% —
    // the 3-of-16-cells probe misses true neighbors in unprobed cells.
    Q("j94_imi_recall",
      (s, d) => {
        val imi = imiSearchTop3(s, d).select("probe_id", "vec_id")
        val exact = bruteTop3(s, d)
        val hits = exact.join(imi, Seq("probe_id", "vec_id"), "left_semi")
          .groupBy("probe_id").agg(count(lit(1)).as("h"))
        // recall divides by the COMPUTED exact-neighbor count, not a
        // literal k: on a collection where some probe has fewer than 3
        // other vectors, a hard-coded 3 would silently understate
        exact.groupBy("probe_id").agg(count(lit(1)).as("n_exact"))
          .join(hits, Seq("probe_id"), "left")
          .select(col("probe_id"),
            coalesce(col("h"), lit(0L)).as("hits"),
            expr("(coalesce(h, 0) * CAST(10000 AS BIGINT)) div n_exact")
              .as("recall_bp"))
          .orderBy("probe_id")
      },
      Some(s"""WITH $ImiSearchCte,
              imi AS (
                SELECT probe_id, vec_id FROM (
                  SELECT probe_id, vec_id,
                         row_number() OVER (PARTITION BY probe_id
                           ORDER BY adist, vec_id) AS rk
                  FROM ad) t WHERE rk <= 3),
              bd AS (
                SELECT pr.probe_id, q.vec_id,
                       CAST(list_sum(list_transform(generate_series(1, 64),
                         i -> (q.qv[i] - pr.pqv[i]) * (q.qv[i] - pr.pqv[i])))
                         AS BIGINT) AS bdist
                FROM probes pr CROSS JOIN q
                WHERE q.vec_id <> pr.probe_id),
              brute AS (
                SELECT probe_id, vec_id FROM (
                  SELECT probe_id, vec_id,
                         row_number() OVER (PARTITION BY probe_id
                           ORDER BY bdist, vec_id) AS rk
                  FROM bd) t WHERE rk <= 3),
              hits AS (
                SELECT b.probe_id, count(*) AS n_exact,
                       count(i.vec_id) AS h
                FROM brute b LEFT JOIN imi i
                  ON i.probe_id = b.probe_id AND i.vec_id = b.vec_id
                GROUP BY 1)
              SELECT probe_id, CAST(h AS BIGINT) AS hits,
                     CAST(h * 10000 // n_exact AS BIGINT) AS recall_bp
              FROM hits ORDER BY probe_id""")),

    // BPE ENCODE — the apply half of the tokenizer loop (j56 is train-only:
    // it learns the first K=3 merges but encodes nothing). Applies the
    // learned merges to every document in priority order, one leftmost-
    // non-overlapping pass per merge — complete for BPE because merge k's
    // constituent symbols can only be produced by merges < k, so a single
    // ordered pass per merge leaves no applicable site behind. The pass IS
    // [[bpeRound]], the identical relational step training uses (trainer
    // and encoder share one definition; the oracle unrolls the same CTEs),
    // and the evolved symbol table after round K is exactly the corpus
    // vocabulary encoded under the K learned merges.
    //
    // Shape at 100 TB: encoding runs on the weighted VOCABULARY (distinct
    // word), never on raw tokens — per-word token counts then join back to
    // the doc→word table on the word key (one hash join, vocabulary-sized
    // build side vs corpus-sized probe side, exactly how production
    // tokenizers amortize encode cost across duplicate words). Output:
    // per-doc word count + symbol counts pre-merge (characters) and
    // post-merge (BPE tokens).
    Q("j69_bpe_encode",
      (s, d) => {
        val (_, sym2) = bpeRound(truncateLineage(bpeSym1(s, d)))
        val (_, sym3) = bpeRound(truncateLineage(sym2))
        val (_, sym4) = bpeRound(truncateLineage(sym3))
        val enc = sym4.groupBy("word")
          .agg(count(lit(1)).cast("long").as("n_tok"))
        val docWords = Tables.documentsSpread(s, d)
          .select(col("doc_id"),
            explode(split(col("text"), " ")).as("word"))
          .filter(length(col("word")) >= 1)
        docWords.join(enc, Seq("word"))
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("long").as("n_words"),
            sum(length(col("word"))).cast("long").as("n_char_toks"),
            sum(col("n_tok")).cast("long").as("n_bpe_toks"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $BpeSym1Sql,
            ${bpeRoundSql(1)}, ${bpeRoundSql(2)}, ${bpeRoundSql(3)},
            enc AS (
              SELECT word, CAST(count(*) AS BIGINT) AS n_tok
              FROM sym4 GROUP BY word),
            doc_words AS (
              SELECT doc_id, w.word FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS word
                FROM documents) w
              WHERE length(w.word) >= 1)
            SELECT d.doc_id,
                   CAST(count(*) AS BIGINT) AS n_words,
                   CAST(sum(length(d.word)) AS BIGINT) AS n_char_toks,
                   CAST(sum(e.n_tok) AS BIGINT) AS n_bpe_toks
            FROM doc_words d JOIN enc e ON d.word = e.word
            GROUP BY d.doc_id ORDER BY doc_id""")),

    // Semantic dedup over the MULTI-INDEX cells — j53's SemDeDup pipeline
    // with the coarse quantizer swapped for j67's inverted multi-index
    // (round 13). Why it earns its own registration: the index the search
    // path already builds and maintains (j67 cells, j68 search,
    // imiAssignStream/imiSearchStream) now also bounds the dedup's
    // quadratic term — ONE coarse quantizer, four consumers. The scale
    // argument is j67's: SemDeDup needs cells ~√n for per-cell work to
    // stay flat, and flat k=√n assignment is the n^1.5 wall the product
    // structure drops to n·2·n^(1/4) (measured 35-49x at 1M vectors —
    // README ladder). Same pair stage (rounded dot >= 0.35 within a
    // cell), same star-contraction CC, same canonical-min convention as
    // j53, so the two registrations differ ONLY in cell structure —
    // product cells from per-half integer-d2 argmins (16 = 4x4 here,
    // oracle-exact by the j67 product-structure law) vs j53's 16
    // dot-nearest centroids. A component can never span cells (every
    // pair is within-cell), which QueriesSpec pins.
    Q("j70_semantic_dedup_imi",
      (s, d) => {
        DotProduct.register(s)
        graft.functions.SquaredDistance.register(s)
        val e = Tables.embeddingsSpread(s, d)
        val cells = truncateLineage(graft.operators.IvfKMeans
          .imiAssign(graft.operators.IvfKMeans.quantize(e), kHalf = 4)
          .select("vec_id", "cell"))
        val assigned = truncateLineage(
          e.select("vec_id", "embedding").join(cells, "vec_id"))
        val pairs = semanticPairs(assigned)
        val cc = graft.operators.ConnectedComponents.byStarContraction(
          e.select(col("vec_id").as("doc_id")), truncateLineage(pairs))
        cc.join(assigned.select(col("vec_id").as("doc_id"), col("cell")),
            "doc_id")
          .select(col("doc_id").as("vec_id"), col("cell").cast("long"),
            col("cluster_id"), col("is_canonical"))
          .orderBy("vec_id")
      },
      Some(s"""WITH RECURSIVE q AS (
                 SELECT vec_id, embedding, list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
                   AS qv
                 FROM embeddings),
               h AS (
                 SELECT vec_id, qv[1:32] AS lo, qv[33:64] AS hi FROM q),
               cl AS (
                 SELECT vec_id AS cid, lo AS cv FROM h WHERE vec_id < 4),
               ch AS (
                 SELECT vec_id AS cid, hi AS cv FROM h WHERE vec_id < 4),
               alo AS (
                 SELECT h.vec_id, c.cid,
                        CAST(list_sum(list_transform(generate_series(1, 32),
                          i -> (h.lo[i] - c.cv[i]) * (h.lo[i] - c.cv[i])))
                          AS BIGINT) AS d2
                 FROM h CROSS JOIN cl c),
               ahi AS (
                 SELECT h.vec_id, c.cid,
                        CAST(list_sum(list_transform(generate_series(1, 32),
                          i -> (h.hi[i] - c.cv[i]) * (h.hi[i] - c.cv[i])))
                          AS BIGINT) AS d2
                 FROM h CROSS JOIN ch c),
               blo AS (
                 SELECT vec_id, cid AS cell_lo FROM (
                   SELECT vec_id, cid, row_number() OVER (
                     PARTITION BY vec_id ORDER BY d2, cid) AS rk
                   FROM alo) WHERE rk = 1),
               bhi AS (
                 SELECT vec_id, cid AS cell_hi FROM (
                   SELECT vec_id, cid, row_number() OVER (
                     PARTITION BY vec_id ORDER BY d2, cid) AS rk
                   FROM ahi) WHERE rk = 1),
               a AS (
                 SELECT e.vec_id, e.embedding,
                        CAST(blo.cell_lo * 4 + bhi.cell_hi AS BIGINT) AS cell
                 FROM embeddings e
                 JOIN blo ON e.vec_id = blo.vec_id
                 JOIN bhi ON e.vec_id = bhi.vec_id),
               pairs AS (
                 SELECT a1.vec_id AS doc_a, a2.vec_id AS doc_b
                 FROM a a1 JOIN a a2
                   ON a1.cell = a2.cell AND a1.vec_id < a2.vec_id
                 WHERE round(${duckDot("a1.embedding", "a2.embedding")}, 6)
                       >= 0.35),
               edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                         UNION ALL SELECT doc_b, doc_a FROM pairs),
               reach(x, y) AS (
                 SELECT vec_id, vec_id FROM embeddings
                 UNION
                 SELECT r.x, e.dst FROM reach r JOIN edges e ON r.y = e.src)
               SELECT x AS vec_id, a.cell,
                      CAST(min(y) AS BIGINT) AS cluster_id,
                      (x = min(y)) AS is_canonical
               FROM reach JOIN a ON a.vec_id = reach.x
               GROUP BY x, a.cell ORDER BY vec_id""")),

    // Token-budget corpus selection (round 13) — the data-mixing
    // primitive: pick the best documents by quality-per-token until a
    // token budget is exhausted (here: vocabulary richness
    // n_distinct_tok/n_tok as the quality proxy, budget = half the
    // corpus tokens, both derived in-query so the oracle replays them).
    // The NAIVE form is a cumulative sum over a GLOBAL ordering — a
    // single-partition window, the canonical scale-killer. The
    // registered plan is the 100 TB shape: priority is a RATIO bounded
    // in [0, 1e6], so a div-10000 histogram has ≤ 101 buckets at ANY
    // corpus size — (1) one map-side-partial agg builds the
    // constant-size bucket token histogram, (2) the cut bucket falls
    // out of a ≤101-row window (broadcast-sized, the only global-order
    // work), (3) whole buckets above/below the cut get their flag from
    // the broadcast join alone, and only the ONE boundary bucket runs a
    // per-doc cumulative window — partitioned by bucket, never global.
    // (At 100 TB a still-too-big boundary bucket recurses on a finer
    // histogram of its own priority sub-range — same operator, narrower
    // interval.) Selection = running sum INCLUSIVE of the doc ≤ budget,
    // ordered (priority DESC, doc_id); integer div both engines.
    Q("j71_budget_select",
      (s, d) => {
        val base = truncateLineage(docPriorities(Tables.documents(s, d)))
        // ≤101-row histogram: the global-order window here is bounded by
        // the ratio range, not the corpus — constant work at any scale.
        // Materialized ONCE (truncated): the three selection branches
        // below would otherwise each re-aggregate the corpus to rebuild
        // it, and the registered plan must carry ZERO unpartitioned
        // windows (PlanSpec pins exactly that)
        val wB = Window.orderBy(col("bucket").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val btot = truncateLineage(base.groupBy("bucket")
          .agg(sum(col("n_tok")).as("btok"))
          .withColumn("cum_before",
            sum(col("btok")).over(wB) - col("btok")))
        val budget = truncateLineage(
          base.agg(expr("sum(n_tok) div 2").as("budget")))
        val withB = base.join(broadcast(btot), "bucket")
          .crossJoin(broadcast(budget))
        val whole = withB
          .filter(col("cum_before") + col("btok") <= col("budget"))
          .withColumn("selected", lit(true))
        val none = withB.filter(col("cum_before") >= col("budget"))
          .withColumn("selected", lit(false))
        val wD = Window.partitionBy("bucket")
          .orderBy(col("priority").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val boundary = withB
          .filter(col("cum_before") < col("budget") &&
            col("cum_before") + col("btok") > col("budget"))
          .withColumn("cum", col("cum_before") + sum(col("n_tok")).over(wD))
          .withColumn("selected", col("cum") <= col("budget"))
          .drop("cum")
        whole.unionByName(none).unionByName(boundary)
          .select(col("doc_id"), col("priority"), col("bucket"),
            col("n_tok"), col("selected"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
                SELECT doc_id,
                       CAST(len(string_split(text, ' ')) AS BIGINT)
                         AS n_tok,
                       CAST(len(list_distinct(string_split(text, ' ')))
                         AS BIGINT) AS n_distinct
                FROM documents),
              p AS (
                SELECT doc_id, n_tok,
                       CAST(n_distinct * 1000000 // n_tok AS BIGINT)
                         AS priority
                FROM t),
              b AS (
                SELECT CAST(sum(n_tok) // 2 AS BIGINT) AS budget FROM p),
              c AS (
                SELECT doc_id, n_tok, priority,
                       sum(n_tok) OVER (ORDER BY priority DESC, doc_id
                         ROWS UNBOUNDED PRECEDING) AS cum
                FROM p)
              SELECT doc_id, priority,
                     CAST(priority // 10000 AS BIGINT) AS bucket, n_tok,
                     (cum <= (SELECT budget FROM b)) AS selected
              FROM c ORDER BY doc_id""")),

    // Deterministic curriculum interleave (round 13) — the training-order
    // primitive: within each source, rank documents easiest-first
    // (n_chars, doc_id — curriculum by length), then interleave sources
    // round-robin so no contiguous run of one source reaches the
    // training loop. The scale point: the naive global shuffle-order is
    // a corpus-wide row_number (single-partition window); here the
    // interleave position is COMPUTED — pos = (rk-1)·n_sources +
    // (src_idx-1) — from a per-source window (partitioned, parallel)
    // plus two broadcast scalars (the ≤sources-row index table and the
    // source count). Positions are unique and order-correct by
    // construction; sources that run out leave gaps, which only a
    // consumer that densifies (a streaming zipWithIndex at write time)
    // would close — ordering, the training-relevant property, is
    // already total.
    Q("j72_curriculum_interleave",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val wSrc = Window.partitionBy("source")
          .orderBy(col("n_chars").asc, col("doc_id").asc)
        val ranked = docs.select("doc_id", "source", "n_chars")
          .withColumn("rk", row_number().over(wSrc).cast("long"))
        // ≤sources-row index table: the only global-order window is over
        // the distinct-source list, broadcast-sized at any corpus scale
        val wIdx = Window.orderBy("source")
        val srcIdx = docs.select("source").distinct()
          .withColumn("src_idx", row_number().over(wIdx).cast("long"))
        val nSrc = srcIdx.agg(count(lit(1)).as("n_src"))
        ranked.join(broadcast(srcIdx), "source")
          .crossJoin(broadcast(nSrc))
          .select(col("doc_id"), col("source"), col("rk"),
            ((col("rk") - 1) * col("n_src") + col("src_idx") - 1)
              .as("pos"))
          .orderBy("doc_id")
      },
      Some("""WITH ranked AS (
                SELECT doc_id, source,
                       CAST(row_number() OVER (PARTITION BY source
                         ORDER BY n_chars, doc_id) AS BIGINT) AS rk
                FROM documents),
              srcs AS (
                SELECT source,
                       CAST(row_number() OVER (ORDER BY source) AS BIGINT)
                         AS src_idx
                FROM (SELECT DISTINCT source FROM documents)),
              n AS (SELECT CAST(count(*) AS BIGINT) AS n_src FROM srcs)
              SELECT r.doc_id, r.source, r.rk,
                     CAST((r.rk - 1) * n.n_src + s.src_idx - 1 AS BIGINT)
                       AS pos
              FROM ranked r JOIN srcs s ON r.source = s.source
              CROSS JOIN n ORDER BY r.doc_id""")),

    // Signed random projection (round 13) — Johnson–Lindenstrauss-style
    // dimensionality reduction of the embedding column, the cheapening
    // step before any distance-heavy stage: 64 dims → 16 signed sums, a
    // 4× cut in every downstream distance eval, and the SIGNS of the 16
    // projections are exactly the hyperplane-LSH bits j11/j12 bucket on
    // (Charikar SRP: sign(r·x) with r a ±1 vector) — one map pass yields
    // both the sketch and the bucketing key. Determinism across engines:
    // the ±1 matrix is derived from md5("<j>_<i>") first-hex-char >= '8'
    // (the simhash convention above), and the input is j61's 1e-6
    // fixed-point quantization, so every product and sum is exact BIGINT
    // arithmetic both engines replay bit-for-bit. Scale shape: the 16-row
    // sign matrix is a broadcast; the projection is aggregate(zip_with())
    // inside the map stage — ZERO shuffles before the output sort at any
    // corpus size (PlanSpec pins exactly one exchange, the sort).
    Q("j73_random_projection",
      (s, d) => {
        val qe = truncateLineage(graft.operators.IvfKMeans.quantize(
          Tables.embeddingsSpread(s, d)))
        val m = truncateLineage(s.range(0, 16).toDF("j")
          .withColumn("srow", expr(
            """transform(sequence(1, 64), i ->
                 CASE WHEN substring(md5(concat(cast(j as string), '_',
                   cast(i as string))), 1, 1) >= '8'
                 THEN 1L ELSE -1L END)""")))
        qe.crossJoin(broadcast(m))
          .select(col("vec_id"), col("j"),
            expr("""aggregate(zip_with(qv, srow, (x, sg) -> x * sg),
                    0L, (a, x) -> a + x)""").as("proj"))
          .withColumn("srp_bit", col("proj") >= 0L)
          .orderBy("vec_id", "j")
      },
      Some("""WITH q AS (
                SELECT vec_id, list_transform(embedding,
                  x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
                  AS qv
                FROM embeddings),
              m AS (
                SELECT CAST(j AS BIGINT) AS j,
                       list_transform(generate_series(1, 64),
                         i -> CASE WHEN substring(md5(CAST(j AS VARCHAR)
                             || '_' || CAST(i AS VARCHAR)), 1, 1) >= '8'
                           THEN CAST(1 AS BIGINT)
                           ELSE CAST(-1 AS BIGINT) END) AS srow
                FROM generate_series(0, 15) t(j))
              SELECT vec_id, j,
                     CAST(list_sum(list_transform(generate_series(1, 64),
                       i -> q.qv[i] * m.srow[i])) AS BIGINT) AS proj,
                     (CAST(list_sum(list_transform(generate_series(1, 64),
                       i -> q.qv[i] * m.srow[i])) AS BIGINT) >= 0)
                       AS srp_bit
              FROM q CROSS JOIN m ORDER BY vec_id, j""")),

    // Hard-negative mining (round 13) — the contrastive-training data
    // op: for each anchor, the top-4 candidates that are SIMILAR but not
    // duplicate (rounded cosine in [0.10, 0.35) — informative, yet below
    // SemDeDup's τ = 0.35 dup threshold from j53/j70, so a mined
    // negative is never a pair dedup would have collapsed), ranked by
    // similarity. The
    // fifth consumer of the j67 coarse quantizer: candidates come from
    // the anchor's IMI cell (where similar-but-distinct vectors live by
    // construction), so per-anchor work is cell-sized, never
    // collection-sized. Plan shape mirrors j68's 100 TB discipline:
    // anchors are a broadcast panel (8 rows); candidate (anchor, vec)
    // id-pairs form on the one-row-per-vector cell table via the cell
    // equi-join; candidate vectors are fetched PER CANDIDATE after; the
    // only window is partitioned by anchor. Exact: cell choice is
    // integer (product-structure law), sim is round(dot, 6) — the same
    // rounding j53/j70 hash-match under.
    Q("j74_hard_negatives",
      (s, d) => {
        DotProduct.register(s)
        graft.functions.SquaredDistance.register(s)
        val e = Tables.embeddings(s, d)
        val cells = truncateLineage(graft.operators.IvfKMeans
          .imiAssign(graft.operators.IvfKMeans.quantize(e), kHalf = 4)
          .select("vec_id", "cell"))
        minedNegatives(cells, e)
      },
      Some(s"""WITH RECURSIVE q AS (
                 SELECT vec_id, embedding, list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
                   AS qv
                 FROM embeddings),
               h AS (
                 SELECT vec_id, qv[1:32] AS lo, qv[33:64] AS hi FROM q),
               cl AS (
                 SELECT vec_id AS cid, lo AS cv FROM h WHERE vec_id < 4),
               ch AS (
                 SELECT vec_id AS cid, hi AS cv FROM h WHERE vec_id < 4),
               alo AS (
                 SELECT h.vec_id, c.cid,
                        CAST(list_sum(list_transform(generate_series(1, 32),
                          i -> (h.lo[i] - c.cv[i]) * (h.lo[i] - c.cv[i])))
                          AS BIGINT) AS d2
                 FROM h CROSS JOIN cl c),
               ahi AS (
                 SELECT h.vec_id, c.cid,
                        CAST(list_sum(list_transform(generate_series(1, 32),
                          i -> (h.hi[i] - c.cv[i]) * (h.hi[i] - c.cv[i])))
                          AS BIGINT) AS d2
                 FROM h CROSS JOIN ch c),
               blo AS (
                 SELECT vec_id, cid AS cell_lo FROM (
                   SELECT vec_id, cid, row_number() OVER (
                     PARTITION BY vec_id ORDER BY d2, cid) AS rk
                   FROM alo) WHERE rk = 1),
               bhi AS (
                 SELECT vec_id, cid AS cell_hi FROM (
                   SELECT vec_id, cid, row_number() OVER (
                     PARTITION BY vec_id ORDER BY d2, cid) AS rk
                   FROM ahi) WHERE rk = 1),
               a AS (
                 SELECT e.vec_id, e.embedding,
                        CAST(blo.cell_lo * 4 + bhi.cell_hi AS BIGINT) AS cell
                 FROM embeddings e
                 JOIN blo ON e.vec_id = blo.vec_id
                 JOIN bhi ON e.vec_id = bhi.vec_id),
               anch AS (
                 SELECT vec_id AS anchor_id, embedding AS ea, cell
                 FROM a WHERE vec_id < 8),
               band AS (
                 SELECT an.anchor_id, a.vec_id AS neg_id,
                        round(${duckDot("an.ea", "a.embedding")}, 6) AS sim
                 FROM anch an JOIN a
                   ON an.cell = a.cell AND a.vec_id <> an.anchor_id),
               rk AS (
                 SELECT anchor_id, neg_id, sim,
                        CAST(row_number() OVER (PARTITION BY anchor_id
                          ORDER BY sim DESC, neg_id) AS BIGINT) AS rk
                 FROM band WHERE sim >= 0.10 AND sim < 0.35)
               SELECT anchor_id, neg_id, sim, rk FROM rk
               WHERE rk <= 4 ORDER BY anchor_id, rk""")),

    // First-occurrence-wins chunk rewrite (round 13) — the REWRITE form
    // of chunk-level dedup: j17 reports which 10-token chunks repeat;
    // this op actually edits the corpus, keeping each distinct chunk
    // only at its globally FIRST occurrence (min (doc_id, idx)) and
    // dropping every later repetition, then emits per-doc audit rows
    // (chunk counts before/after + md5 of the rewritten text). The
    // "first occurrence" looks like a global-order problem but is not:
    // min(struct(doc_id, idx)) is a map-side-combinable argmin on the
    // chunk-hash key — ONE shuffled row per distinct chunk, the same key
    // the rewrite join then reuses (no second wide exchange shape), and
    // the reconstruction is a per-doc sorted collect, partitioned by
    // doc_id. No windows anywhere; nothing is corpus-ordered. (min-struct
    // precondition: doc_id is non-null by schema, so the struct never
    // compares through a NULL leading field.)
    Q("j75_chunk_rewrite",
      (s, d) => chunkKept(Tables.documents(s, d))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_chunks"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
            md5(concat_ws(" ", expr(
              """transform(sort_array(collect_list(
                   CASE WHEN kept THEN struct(idx, chunk) END)),
                 x -> x.chunk)"""))).as("clean_md5"))
          .orderBy("doc_id"),
      Some("""WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS t FROM documents
                WHERE len(string_split(text, ' ')) >= 10),
              chunks AS (
                SELECT doc_id,
                       CAST(unnest(generate_series(0,
                         CAST(floor(len(t) / 10) AS INT) - 1)) AS BIGINT)
                         AS idx,
                       unnest(list_transform(generate_series(0,
                         CAST(floor(len(t) / 10) AS INT) - 1),
                         c -> array_to_string(t[c*10+1:c*10+10], ' ')))
                         AS chunk
                FROM toks),
              f1 AS (
                SELECT md5(chunk) AS ck, min(doc_id) AS fdoc
                FROM chunks GROUP BY 1),
              f2 AS (
                SELECT f1.ck, f1.fdoc, min(c.idx) AS fidx
                FROM f1 JOIN chunks c
                  ON md5(c.chunk) = f1.ck AND c.doc_id = f1.fdoc
                GROUP BY 1, 2),
              marked AS (
                SELECT c.doc_id, c.idx, c.chunk,
                       (c.doc_id = f.fdoc AND c.idx = f.fidx) AS kept
                FROM chunks c JOIN f2 f ON md5(c.chunk) = f.ck)
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
                     CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_kept,
                     md5(coalesce(string_agg(
                       CASE WHEN kept THEN chunk END, ' ' ORDER BY idx),
                       '')) AS clean_md5
              FROM marked GROUP BY doc_id ORDER BY doc_id""")),

    // Data-contract checking (round 13) — the Deequ-shaped assertion
    // surface a pipeline runs BEFORE training consumes a snapshot: each
    // constraint (uniqueness, not-empty, derived-column consistency, enum
    // membership, referential integrity, freshness window, business
    // rules) emits its violation count and a pass flag. Distinct from
    // j25 (descriptive stats): this is the CHECK — the output is the
    // gate a scheduler blocks on. Scale shape: ONE aggregate pass per
    // table (conditional sums fused into a single scan each for
    // documents and events) plus one broadcast anti-join for the FK
    // (customer is dimension-sized); the result is 9 rows regardless of
    // corpus size. Two constraints are genuinely violated on this
    // generator (132 short docs, 136 value outliers at sf0.001), so the
    // failed-contract path is exercised, not just the green one.
    Q("j76_data_contract",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val ev = Tables.events(s, d)
        val cust = Tables.customer(s, d)
        // row-local flags come from the docContractFlags seam (shared
        // with the streaming monitor — the flag definitions cannot fork);
        // the projection fuses into the same single aggregate pass
        val docAgg = docContractFlags(docs).agg(
          (count(lit(1)) - countDistinct(col("doc_id"))).as("doc_id_dup"),
          sum(col("text_empty")).as("text_empty"),
          sum(col("n_chars_bad")).as("n_chars_bad"),
          sum(col("lang_bad")).as("lang_bad"),
          sum(col("too_short")).as("too_short"))
        val evAgg = ev.agg(
          (count(lit(1)) - countDistinct(col("event_id")))
            .as("event_id_dup"),
          // freshness boundary compared on the WALL-CLOCK date string:
          // Tables.events turned the file's naive wall time into an
          // instant via the session tz, and date_format renders it back
          // through the SAME tz, so the roundtrip cancels and this
          // matches the oracle's naive TIMESTAMP compare under ANY
          // driver timezone (a bare lit(...).cast("timestamp") boundary
          // would shift with spark.sql.session.timeZone). Boundaries are
          // midnights, so date granularity is exact.
          sum(when(date_format(col("ts"), "yyyy-MM-dd") < "2024-01-01" ||
              date_format(col("ts"), "yyyy-MM-dd") >= "2025-01-01", 1L)
            .otherwise(0L)).as("ts_bad"),
          sum(when(col("value") > 100.0, 1L).otherwise(0L))
            .as("value_big"))
        val fk = ev.join(broadcast(cust),
            col("user_id") === col("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("fk_bad"))
        docAgg.crossJoin(evAgg).crossJoin(fk)
          .selectExpr("""stack(9,
              'doc_id_unique', doc_id_dup,
              'doc_text_not_empty', text_empty,
              'doc_n_chars_consistent', n_chars_bad,
              'doc_lang_in_enum', lang_bad,
              'doc_min_200_chars', too_short,
              'event_id_unique', event_id_dup,
              'event_ts_in_2024', ts_bad,
              'event_value_le_100', value_big,
              'event_user_fk', fk_bad)
            as (cname, n_violations)""")
          .withColumn("pass", col("n_violations") === 0L)
          .orderBy("cname")
      },
      Some("""WITH dc AS (
                SELECT CAST(count(*) - count(DISTINCT doc_id) AS BIGINT)
                         AS doc_id_dup,
                       CAST(sum(CASE WHEN text IS NULL OR length(text) = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS text_empty,
                       CAST(sum(CASE WHEN n_chars <> length(text)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_chars_bad,
                       CAST(sum(CASE WHEN lang NOT IN
                         ('en','es','zh','de','fr')
                         THEN 1 ELSE 0 END) AS BIGINT) AS lang_bad,
                       CAST(sum(CASE WHEN n_chars < 200
                         THEN 1 ELSE 0 END) AS BIGINT) AS too_short
                FROM documents),
              ec AS (
                SELECT CAST(count(*) - count(DISTINCT event_id) AS BIGINT)
                         AS event_id_dup,
                       CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-01'
                         OR ts >= TIMESTAMP '2025-01-01'
                         THEN 1 ELSE 0 END) AS BIGINT) AS ts_bad,
                       CAST(sum(CASE WHEN value > 100
                         THEN 1 ELSE 0 END) AS BIGINT) AS value_big
                FROM events),
              fk AS (
                SELECT CAST(count(*) AS BIGINT) AS fk_bad
                FROM events e LEFT JOIN customer c
                  ON e.user_id = c.c_custkey
                WHERE c.c_custkey IS NULL),
              u AS (
                SELECT 'doc_id_unique' AS cname, doc_id_dup
                         AS n_violations FROM dc
                UNION ALL SELECT 'doc_text_not_empty', text_empty FROM dc
                UNION ALL SELECT 'doc_n_chars_consistent', n_chars_bad
                  FROM dc
                UNION ALL SELECT 'doc_lang_in_enum', lang_bad FROM dc
                UNION ALL SELECT 'doc_min_200_chars', too_short FROM dc
                UNION ALL SELECT 'event_id_unique', event_id_dup FROM ec
                UNION ALL SELECT 'event_ts_in_2024', ts_bad FROM ec
                UNION ALL SELECT 'event_value_le_100', value_big FROM ec)
              SELECT cname, n_violations, (n_violations = 0) AS pass
              FROM (SELECT * FROM u
                    UNION ALL SELECT 'event_user_fk', fk_bad FROM fk)
              ORDER BY cname""")),

    // Bigram-LM cross-entropy per document (round 14) — the perplexity
    // quality filter PROPER (the CCNet shape: score text under a language
    // model trained on the corpus, drop the high-perplexity tail), where
    // j28 is the unigram stand-in. Model: add-one-smoothed bigram LM,
    // p(b|a) = (c(a,b)+1)/(c(a)+V) with c(·) counted over the ≥2-token
    // corpus slice and V the distinct-token vocabulary; score = −mean ln p
    // over the doc's bigrams in POSITION ORDER (the j28 order-pinned fold:
    // sorted (pos, counts) structs reduced left-to-right from an explicit
    // 0.0 seed, so the float sum is bit-identical to DuckDB's list_reduce
    // over the same pos-ordered list). Scale shape: the bigram count
    // table grows with the corpus, so it carries NO broadcast hint —
    // Catalyst sizes it (at this SF its stats fit the broadcast
    // threshold; past it the SAME plan degrades to a sort-merge join on
    // the exact (a,b) key the count aggregate already shuffled on, so
    // the aggregate's partitioning is reused and only the probe side
    // moves). The unigram context counts broadcast explicitly (bounded
    // vocab, j28's argument), V is a 1-row broadcast, and the unigram
    // table is lineage-truncated so its two consumers don't re-scan the
    // corpus: documents is read exactly TWICE (bigram probe + bigram
    // counts) at any scale. High xent = rare-transition text (gibberish,
    // wrong-language, boilerplate-shredded) — the training-data drop
    // signal.
    Q("j77_bigram_lm_score",
      (s, d) => {
        val toks = Tables.documentsSpread(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("t"))
          .filter(size(col("t")) >= 2)
        val bg = toks.select(col("doc_id"), explode(expr(
            """transform(sequence(1, size(t) - 1),
               i -> named_struct('pos', i, 'a', t[i - 1], 'b', t[i]))"""))
            .as("p"))
          .select(col("doc_id"), col("p.pos").as("pos"),
            col("p.a").as("a"), col("p.b").as("b"))
        val bgc = bg.groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
        // the unigram table feeds BOTH the context join and V — truncate
        // it once (vocab-sized output) so the diamond doesn't re-scan the
        // corpus per reference: the final plan reads documents exactly
        // twice (bigram probe + bigram counts), never four times
        val unic = truncateLineage(
          toks.select(explode(col("t")).as("tok"))
            .groupBy("tok").agg(count(lit(1)).as("n_u")))
        val vocab = unic.agg(count(lit(1)).as("v"))
        bg.join(bgc, Seq("a", "b"))
          .join(broadcast(unic.select(col("tok").as("a"),
            col("n_u").as("n_a"))), Seq("a"))
          .groupBy("doc_id")
          .agg(sort_array(collect_list(
            struct(col("pos"), col("n_ab"), col("n_a")))).as("pn"))
          .crossJoin(broadcast(vocab))
          .select(col("doc_id"),
            size(col("pn")).cast("long").as("n_bg"),
            round(expr(
              """-(aggregate(pn, CAST(0 AS DOUBLE),
                   (acc, x) -> acc + ln(CAST(x.n_ab + 1 AS DOUBLE)
                     / (x.n_a + v)))
                 / size(pn))"""), 6).as("xent"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS t FROM documents
                WHERE len(string_split(text, ' ')) >= 2),
              bg AS (
                SELECT doc_id, p.pos AS pos, p.a AS a, p.b AS b FROM (
                  SELECT doc_id, unnest(list_transform(
                    generate_series(1, len(t) - 1),
                    i -> {'pos': i, 'a': t[i], 'b': t[i + 1]})) AS p
                  FROM toks)),
              bgc AS (
                SELECT a, b, COUNT(*) AS n_ab FROM bg GROUP BY a, b),
              unic AS (
                SELECT tok, COUNT(*) AS n_u FROM (
                  SELECT unnest(t) AS tok FROM toks) GROUP BY tok),
              vocab AS (SELECT COUNT(*) AS v FROM unic),
              arrs AS (
                SELECT doc_id,
                       list({'n_ab': n_ab, 'n_a': n_u} ORDER BY pos) AS pn
                FROM bg
                JOIN bgc USING (a, b)
                JOIN unic ON bg.a = unic.tok
                GROUP BY doc_id)
              SELECT doc_id, CAST(len(pn) AS BIGINT) AS n_bg,
                     round(-(list_reduce(list_transform(pn,
                         x -> ln((x.n_ab + 1)::DOUBLE / (x.n_a + v))),
                         (p, q) -> p + q)
                       / len(pn)), 6) AS xent
              FROM arrs CROSS JOIN vocab ORDER BY doc_id""")),

    // SCD2 dimension history (round 14) — the versioned complement of
    // j54's SCD1 upsert: every attribute CHANGE becomes a validity
    // interval [valid_from, valid_to) instead of an overwrite, which is
    // how a training pipeline keeps metadata dimensions (source configs,
    // license states, customer tiers) queryable AS OF any snapshot. Demo
    // dimension: each customer's order-status track over their order
    // sequence — consecutive same-status orders collapse into one island
    // (gaps-and-islands via lag), each island emits one version row with
    // valid_to = the next island's start and NULL while current. Scale
    // shape: EVERY window is partitioned by the dimension key (custkey) —
    // no global window anywhere — and all three window steps (lag, lead,
    // row_number) share the one (custkey)(ts, ok) sort order, so the
    // whole history builds on a single keyed exchange: the filter between
    // lag and lead preserves partitioning+order and Spark plans lead +
    // row_number in one Window operator with NO re-exchange. Dates
    // compare and emit as wall-clock strings (the j76 tz discipline).
    Q("j78_scd2_history",
      (s, d) => scd2History(Tables.orders(s, d))
        .orderBy("custkey", "version"),
      Some("""WITH o AS (
                SELECT o_custkey AS custkey, o_orderdate AS ts,
                       o_orderkey AS ok, o_orderstatus AS status
                FROM orders),
              mk AS (
                SELECT *, lag(status) OVER
                    (PARTITION BY custkey ORDER BY ts, ok) AS prev
                FROM o),
              isl AS (
                SELECT custkey, ts, ok, status FROM mk
                WHERE prev IS NULL OR prev <> status)
              SELECT custkey, status,
                     strftime(ts, '%Y-%m-%d') AS valid_from,
                     strftime(lead(ts) OVER
                       (PARTITION BY custkey ORDER BY ts, ok),
                       '%Y-%m-%d') AS valid_to,
                     CAST(row_number() OVER
                       (PARTITION BY custkey ORDER BY ts, ok) AS BIGINT)
                       AS version
              FROM isl ORDER BY custkey, version""")),

    // Point-in-time dimension join (round 14) — the CONSUMPTION half of
    // j78 and the feature-store correctness primitive: a fact row at time
    // T must see the dimension attributes valid AT T, never today's (the
    // leakage a training pipeline ships when it joins features naively —
    // "point-in-time correctness" in Feast/Tecton terms). Facts: each
    // lineitem at its ship date, attributed to the customer-status
    // version in force when it shipped; output = revenue per dimension
    // VERSION. The as-of mechanics need NO argmax/window: SCD2 intervals
    // PARTITION each key's timeline (j78's chain law, spec-asserted), so
    // the custkey equi-join + interval filter matches each fact row at
    // most once — the join multiplies a fact by that key's version count
    // (the dimension's change cadence, bounded by attribute churn, never
    // corpus size) and the filter collapses it back. Scale shape: the
    // orderkey join co-partitions two fact tables (SMJ on the key both
    // would shuffle on anyway); the history side is dimension-sized and
    // unhinted (Catalyst broadcasts it here; degrades to a keyed SMJ past
    // the threshold); revenue in exact integer cents (per-row rounding,
    // order-independent integer sum).
    Q("j79_pit_dimension_join",
      (s, d) => {
        val hist = scd2History(Tables.orders(s, d))
        val facts = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_shipdate"),
            col("l_extendedprice"), col("l_discount"))
          .join(Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("custkey"),
            date_format(col("l_shipdate"), "yyyy-MM-dd").as("sd"),
            graft.Q.cents(col("l_extendedprice")
              * (lit(1.0) - col("l_discount"))).as("rev_c"))
        // LEFT join with the interval in the join condition: a fact
        // predating its key's first version (this generator ships 474
        // such lineitems at sf0.001) keeps an explicit version-0
        // "(none)" bucket instead of silently dropping — at most one
        // interval matches (the chain law), so conservation is exact:
        // Σ n_ship == total facts, spec-asserted
        facts.join(hist,
            facts("custkey") === hist("custkey") &&
              col("valid_from") <= col("sd") &&
              (col("valid_to").isNull || col("sd") < col("valid_to")),
            "left")
          .select(facts("custkey").as("custkey"),
            coalesce(col("version"), lit(0L)).as("version"),
            coalesce(col("status"), lit("(none)")).as("status"),
            col("rev_c"))
          .groupBy("custkey", "version", "status")
          .agg(count(lit(1)).as("n_ship"), sum("rev_c").as("rev_cents"))
          .orderBy("custkey", "version")
      },
      Some("""WITH o AS (
                SELECT o_custkey AS custkey, o_orderdate AS ts,
                       o_orderkey AS ok, o_orderstatus AS status
                FROM orders),
              mk AS (
                SELECT *, lag(status) OVER
                    (PARTITION BY custkey ORDER BY ts, ok) AS prev
                FROM o),
              isl AS (
                SELECT custkey, ts, ok, status FROM mk
                WHERE prev IS NULL OR prev <> status),
              hist AS (
                SELECT custkey, status,
                       strftime(ts, '%Y-%m-%d') AS valid_from,
                       strftime(lead(ts) OVER
                         (PARTITION BY custkey ORDER BY ts, ok),
                         '%Y-%m-%d') AS valid_to,
                       CAST(row_number() OVER
                         (PARTITION BY custkey ORDER BY ts, ok) AS BIGINT)
                         AS version
                FROM isl),
              f AS (
                SELECT o_custkey AS custkey,
                       strftime(l_shipdate, '%Y-%m-%d') AS sd,
                       CAST(round(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT) AS rev_c
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
              SELECT f.custkey AS custkey,
                     COALESCE(version, 0) AS version,
                     COALESCE(status, '(none)') AS status,
                     CAST(count(*) AS BIGINT) AS n_ship,
                     CAST(sum(rev_c) AS BIGINT) AS rev_cents
              FROM f LEFT JOIN hist ON f.custkey = hist.custkey
                AND valid_from <= sd
                AND (valid_to IS NULL OR sd < valid_to)
              GROUP BY 1, 2, 3
              ORDER BY custkey, version""")),

    // Corpus snapshot diff (round 14) — dataset-versioning AUDIT, the
    // complement of j54's upsert: given two corpus snapshots, report per
    // source how many documents were added / removed / changed /
    // unchanged and the net character drift — the release-notes table a
    // training-data version bump ships with. Snapshot stand-ins derived
    // deterministically from the one generator table (the j29 eval-slice
    // convention): OLD drops doc_id % 10 == 9 and carries an ' OLDREV'
    // edit on % 13 == 0; NEW drops % 10 == 0 — so all four buckets are
    // genuinely populated. Scale discipline: both sides project to
    // (doc_id, source, md5(text), length) BEFORE the join — content
    // comparison rides the 32-hex HASH, so the doc_id-keyed full-outer
    // shuffle moves ~50 bytes per document, never the text (at 100 TB
    // the diff costs two scans + a keyed join of fingerprints). The
    // classification is null-pattern matching on the join result; one
    // final tiny aggregate by (source, dstatus).
    Q("j80_snapshot_diff",
      (s, d) => {
        def fp(df: org.apache.spark.sql.DataFrame) =
          df.select(col("doc_id"), col("source"),
            md5(col("text")).as("h"),
            length(col("text")).cast("long").as("len"))
        val old = fp(Tables.documents(s, d)
          .filter(col("doc_id") % 10 =!= 9)
          .withColumn("text",
            when(col("doc_id") % 13 === 0, concat(col("text"),
              lit(" OLDREV"))).otherwise(col("text"))))
          .select(col("doc_id"), col("source").as("o_source"),
            col("h").as("o_h"), col("len").as("o_len"))
        val neu = fp(Tables.documents(s, d)
          .filter(col("doc_id") % 10 =!= 0))
        neu.join(old, Seq("doc_id"), "full_outer")
          .select(
            coalesce(col("source"), col("o_source")).as("source"),
            when(col("o_h").isNull, "added")
              .when(col("h").isNull, "removed")
              .when(col("h") =!= col("o_h"), "changed")
              .otherwise("unchanged").as("dstatus"),
            (coalesce(col("len"), lit(0L))
              - coalesce(col("o_len"), lit(0L))).as("d_len"))
          .groupBy("source", "dstatus")
          .agg(count(lit(1)).as("n_docs"), sum("d_len").as("chars_delta"))
          .orderBy("source", "dstatus")
      },
      Some("""WITH old AS (
                SELECT doc_id, source,
                       md5(CASE WHEN doc_id % 13 = 0
                           THEN text || ' OLDREV' ELSE text END) AS o_h,
                       CAST(length(CASE WHEN doc_id % 13 = 0
                           THEN text || ' OLDREV' ELSE text END)
                         AS BIGINT) AS o_len
                FROM documents WHERE doc_id % 10 <> 9),
              neu AS (
                SELECT doc_id, source, md5(text) AS h,
                       CAST(length(text) AS BIGINT) AS len
                FROM documents WHERE doc_id % 10 <> 0)
              SELECT COALESCE(neu.source, old.source) AS source,
                     CASE WHEN o_h IS NULL THEN 'added'
                          WHEN h IS NULL THEN 'removed'
                          WHEN h <> o_h THEN 'changed'
                          ELSE 'unchanged' END AS dstatus,
                     CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(COALESCE(len, 0) - COALESCE(o_len, 0))
                       AS BIGINT) AS chars_delta
              FROM neu FULL OUTER JOIN old USING (doc_id)
              GROUP BY 1, 2
              ORDER BY source, dstatus""")),

    // Winnow-fingerprint near-dup join (round 14) — the CONSUMPTION half
    // of j19, completing the winnowing loop the way j69 completed BPE and
    // j79 completed SCD2: the per-doc fingerprint SETS become an inverted
    // index and docs sharing ≥3 fingerprints emit as near-dup candidate
    // pairs with a fixed-point containment score — the MOSS shape
    // (Schleimer et al. §5: fingerprint postings + per-pair counts), and
    // a dedup family member with LOCAL sensitivity (winnow fingerprints
    // survive partial overlap/reordering that document-global MinHash
    // dilutes). Scale discipline is the j66 posting-list playbook: the
    // posting table is lineage-truncated ONCE (it IS the index — a real
    // deployment persists it, ImiIndexStore-style) and hot fingerprints
    // with df > 64 leave the index via a HAVING on the SAME fp key the
    // self-join shuffles on (no extra wide exchange; per-fp pair work
    // bounded at cap²); the pair count then rides one fp-keyed equi-join,
    // never an all-pairs scan. Containment = shared·1e6 div min(|fp|)
    // (exact integer both engines).
    Q("j81_winnow_neardup",
      (s, d) => winnowPairs(s, Tables.documentsSpread(s, d), cap = 64L),
      Some {
        val K = 8; val W = 4
        val B = 257L; val M = 1000000007L
        val pows = {
          val a = new Array[Long](K)
          a(K - 1) = 1L
          ((K - 2) to 0 by -1).foreach(j => a(j) = a(j + 1) * B % M)
          a
        }
        val powList = pows.mkString("[", ", ", "]")
        s"""WITH hs AS (
              SELECT doc_id,
                     list_transform(
                       generate_series(1, length(text) - ${K - 1}),
                       i -> list_reduce(
                         list_transform(generate_series(0, ${K - 1}),
                           j -> (CAST(ascii(substring(text,
                               CAST(i + j AS INT), 1)) AS BIGINT)
                             * ($powList)[j + 1]) % $M),
                         (a, b) -> (a + b) % $M)) AS h
              FROM documents WHERE length(text) >= ${K + W - 1}),
            fps AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       generate_series(1, len(h) - ${W - 1}),
                       j -> list_min(h[j:j + ${W - 1}]))) AS fp
              FROM hs),
            post AS (
              SELECT doc_id, CAST(len(fp) AS BIGINT) AS n_fp,
                     unnest(fp) AS f
              FROM fps),
            keep AS (
              SELECT f FROM post GROUP BY f HAVING count(*) <= 64),
            idx AS (
              SELECT post.* FROM post JOIN keep USING (f))
            SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
                   CAST(count(*) AS BIGINT) AS n_shared,
                   CAST((count(*) * 1000000)
                     // LEAST(x.n_fp, y.n_fp) AS BIGINT)
                     AS containment_ppm
            FROM idx x JOIN idx y
              ON x.f = y.f AND x.doc_id < y.doc_id
            GROUP BY x.doc_id, y.doc_id, x.n_fp, y.n_fp
            HAVING count(*) >= 3
               AND (count(*) * 1000000) // LEAST(x.n_fp, y.n_fp)
                   >= 500000
            ORDER BY doc_a, doc_b"""
      }),

    // Incremental aggregate refresh (round 14) — materialized-view
    // maintenance by STATE MERGE: a keyed aggregate over (base ⊎ delta)
    // computed as merge(agg(base), agg(delta)), never as a rescan of the
    // union — the core of incremental ETL, and the plain-aggregate
    // cousin of the sketch-merge family (j50 HLL merge / j51 CMS merge
    // already prove the path for approximate state; this is the exact
    // count/sum/min/max algebra). The ORACLE IS THE LAW: the DuckDB side
    // computes the aggregate directly over all events, so the hash match
    // proves merge(agg(base), agg(delta)) == agg(base ⊎ delta) on real
    // data. Scale claim: at production the base states are a STORED
    // table (they are exactly what this query's base branch computes),
    // so refresh cost is delta-sized + a state-table-sized merge join —
    // the corpus is never rescanned; here both branches derive from the
    // one generator table with the slice predicate PUSHED to parquet
    // (PlanSpec pins PushedFilters absent — date_format isn't pushable —
    // so the pin is on the two-scan shape + keyed merge join instead).
    // Boundary compares ride wall-clock date strings (the j76 tz
    // discipline; the 2024-01-15 boundary is a midnight, so date
    // granularity is exact).
    Q("j82_incremental_agg_refresh",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"),
            date_format(col("ts"), "yyyy-MM-dd").as("dt"),
            graft.Q.cents(col("value")).as("v_c"))
        def slice(p: org.apache.spark.sql.Column, tag: String) =
          ev.filter(p).groupBy("event_type").agg(
            count(lit(1)).as(s"${tag}_n"),
            sum(col("v_c")).as(s"${tag}_sum"),
            min(col("v_c")).as(s"${tag}_mn"),
            max(col("v_c")).as(s"${tag}_mx"))
        val base = slice(col("dt") < "2024-01-15", "b")
        val delta = slice(col("dt") >= "2024-01-15", "d")
        base.join(delta, Seq("event_type"), "full_outer")
          .select(col("event_type"),
            (coalesce(col("b_n"), lit(0L))
              + coalesce(col("d_n"), lit(0L))).as("n"),
            (coalesce(col("b_sum"), lit(0L))
              + coalesce(col("d_sum"), lit(0L))).as("sum_cents"),
            when(col("b_mn").isNull, col("d_mn"))
              .when(col("d_mn").isNull, col("b_mn"))
              .otherwise(least(col("b_mn"), col("d_mn"))).as("min_cents"),
            when(col("b_mx").isNull, col("d_mx"))
              .when(col("d_mx").isNull, col("b_mx"))
              .otherwise(greatest(col("b_mx"), col("d_mx")))
              .as("max_cents"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
                     CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(CAST(round(value * 100) AS BIGINT))
                       AS BIGINT) AS sum_cents,
                     CAST(min(CAST(round(value * 100) AS BIGINT))
                       AS BIGINT) AS min_cents,
                     CAST(max(CAST(round(value * 100) AS BIGINT))
                       AS BIGINT) AS max_cents
              FROM events
              GROUP BY event_type
              ORDER BY event_type""")),

    // Quality-rule filter funnel (round 14) — the Gopher/C4-shape rule
    // battery every production corpus ships through, with FIRST-FAIL
    // attribution: each doc is charged to the earliest rule it breaks
    // (the funnel semantics an ablation report needs — marginal rule
    // hits double-count, first-fail partitions), and the output is the
    // per-(source, verdict) kill table with exact share basis points.
    // Rule thresholds are calibrated to this corpus (5 of 6 fire at
    // sf0.01; the symbol rule cannot fire on the all-lowercase generator
    // text and is kept for rule-battery honesty — QueriesSpec proves it
    // fires on a planted fixture). Scale shape: the per-doc repetition
    // statistic (top token frequency) is a SORTED-RUN FOLD inside the
    // row — array_sort + one aggregate() pass — NOT an explode +
    // (doc, tok) groupBy, so the whole funnel is one scan with zero
    // joins and zero explode shuffles; the only exchange is the final
    // (source, verdict)-keyed aggregate, and the share-of-source window
    // runs on the POST-aggregate table (≤ 7 rows per source), never on
    // docs. PlanSpec pins the single documents scan and the no-Generate
    // shape.
    Q("j83_filter_funnel",
      (s, d) => {
        val v = funnelVerdicts(Tables.documents(s, d))
        v.groupBy("source", "verdict")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").as("n_chars_total"))
          .withColumn("share_bp", expr(
            "n_docs * 10000 div sum(n_docs) over (partition by source)"))
          .orderBy("source", "verdict")
      },
      Some(s"""WITH t AS (
                SELECT doc_id, source, n_chars,
                       len(string_split(text, ' ')) AS nt,
                       length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))
                         AS nsym,
                       len(list_filter(string_split(text, ' '),
                         x -> x IN $FunnelStops)) AS nstop
                FROM documents),
              m AS (
                SELECT doc_id, max(c) AS topc FROM (
                  SELECT doc_id, tok, count(*) AS c FROM (
                    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                    FROM documents)
                  GROUP BY doc_id, tok)
                GROUP BY doc_id),
              v AS (
                SELECT source, n_chars,
                       CASE WHEN nt < 20 THEN 'fail_short'
                            WHEN n_chars > 450 THEN 'fail_long'
                            WHEN n_chars - nt + 1 > nt * 5
                              THEN 'fail_word_len'
                            WHEN nsym * 10 > n_chars THEN 'fail_symbol'
                            WHEN nstop = 0 THEN 'fail_stopword'
                            WHEN topc * 5 > nt THEN 'fail_repetition'
                            ELSE 'pass' END AS verdict
                FROM t JOIN m USING (doc_id))
              SELECT source, verdict, CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
                     CAST((count(*) * 10000)
                       // CAST(sum(count(*)) OVER (PARTITION BY source)
                            AS BIGINT) AS BIGINT) AS share_bp
              FROM v GROUP BY source, verdict
              ORDER BY source, verdict""")),

    // Quality-aware dedup survivor selection (round 14) — the REWRITE half
    // of j13, the way j75 rewrites j17 and j81 consumes j19: near-dup
    // clusters collapse to ONE survivor each, chosen by QUALITY (vocab
    // richness, distinct-token ppm of j71's fixed-point form) instead of
    // j13's min-id canonical — the FineWeb/CCNet production semantics
    // ("keep the best member", not "keep the first"), and the difference
    // is real: a near-dup cluster pairs a pristine doc with its degraded
    // twin, and min-id keeps whichever was crawled first. Survivor =
    // min(struct(-quality, doc_id)) with doc_id as the deterministic
    // tiebreak — computed as a partition-only WINDOW, not the agg + join
    // back: the output is DOC-LINEAR (every member row carries its
    // survivor), so the aggregate form is a diamond (the cluster⋈quality
    // subtree executes twice, re-scanning documents per reference —
    // measured in the static plan) while the window is one cluster_id
    // exchange over rows that had to shuffle there anyway, no join, no
    // second scan. This is the sanctioned exception to the min-struct-
    // over-window rule: that rule replaces windows when output is
    // CLUSTER-linear; here it would manufacture the diamond. Scale
    // shape: clusters come from the banded pair graph (j2's machinery,
    // linear), quality is one scan of docs, and nothing is ever
    // collection-sized on the driver.
    Q("j84_dedup_survivor",
      (s, d) => {
        val pairs = truncateLineage(neardupPairs(s, d))
        val docs = Tables.documents(s, d)
        val clusters = graft.operators.ConnectedComponents
          .byLabelPropagation(docs.select("doc_id"), pairs)
          .select("doc_id", "cluster_id")
        val quality = docs
          .withColumn("toks", split(col("text"), " "))
          .select(col("doc_id"),
            expr("""CAST(size(array_distinct(toks)) AS BIGINT) * 1000000L
                    div size(toks)""").as("quality_ppm"))
        clusters.join(quality, "doc_id")
          .withColumn("w", min(struct((-col("quality_ppm")).as("nq"),
            col("doc_id").as("d")))
            .over(Window.partitionBy("cluster_id")))
          .select(col("doc_id"), col("cluster_id"), col("quality_ppm"),
            col("w.d").as("survivor_id"),
            (col("doc_id") === col("w.d")).as("kept"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $NeardupPairsSql,
              edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                        UNION ALL SELECT doc_b, doc_a FROM pairs),
              reach(a, b) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
              cl AS (
                SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster_id
                FROM reach GROUP BY a),
              q AS (
                SELECT doc_id,
                       CAST((len(list_distinct(string_split(text, ' ')))
                           * 1000000)
                         // len(string_split(text, ' ')) AS BIGINT)
                         AS quality_ppm
                FROM documents),
              cq AS (
                SELECT cl.doc_id AS doc_id, cluster_id, quality_ppm
                FROM cl JOIN q USING (doc_id)),
              surv AS (
                SELECT cluster_id, doc_id AS survivor_id FROM cq
                QUALIFY row_number() OVER (PARTITION BY cluster_id
                  ORDER BY quality_ppm DESC, doc_id) = 1)
              SELECT cq.doc_id AS doc_id, cluster_id, quality_ppm,
                     survivor_id, (cq.doc_id = survivor_id) AS kept
              FROM cq JOIN surv USING (cluster_id)
              ORDER BY doc_id"""))
  ) ++ Seq(

    // Trigram stupid-backoff LM scoring (round 14) — the CCNet-shape
    // scoring upgrade of j77's bigram stand-in: order-3 counts with the
    // Brants et al. ("Large Language Models in Machine Translation",
    // EMNLP'07) stupid-backoff cascade — trigram ratio if seen, else
    // 0.4 × bigram ratio, else 0.4² × an add-one unigram floor (open
    // vocabulary: an eval word absent from training still scores
    // finitely). Scored HELD-OUT (train doc_id%10≠0, eval %10=0, the
    // j29/j58 split convention) because a same-corpus score never backs
    // off — measured at sf0.01 the cascade is non-vacuous at all three
    // levels (1656 trigram hits / 981 bigram backoffs / 1 unigram
    // floor). Per-doc backoff counts emit as exact integers; the
    // cross-entropy rides j77's order-pinned fold (pos-sorted structs,
    // identical double op order in both engines, round 6). Scale shape:
    // count tables are vocab/bigram-keyed aggregates (corpus-sized
    // shuffles only at build; a deployment stores them — they ARE the
    // LM); the bigram table is lineage-truncated ONCE and feeds both the
    // (a,b)-context and (b,c)-backoff lookups, the unigram table both
    // the n1b and n1c lookups + the broadcast 1-row totals; eval lookups
    // are five keyed equi-joins, never a scan of anything
    // collection-sized per probe.
    Q("j85_trigram_backoff",
      (s, d) => {
        val docs = Tables.documentsSpread(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("t"))
        val train = docs.filter(col("doc_id") % 10 =!= 0)
        def trigrams(df: org.apache.spark.sql.DataFrame) =
          df.filter(size(col("t")) >= 3)
            .select(col("doc_id"), explode(expr(
              """transform(sequence(2, size(t) - 1),
                 i -> named_struct('pos', i, 'a', t[i - 2], 'b', t[i - 1],
                                   'c', t[i]))""")).as("g"))
            .select(col("doc_id"), col("g.pos").as("pos"),
              col("g.a").as("a"), col("g.b").as("b"), col("g.c").as("c"))
        val ev = docs.filter(col("doc_id") % 10 === 0)
        // the count-building path carries only (a, b, c) through the
        // corpus-scale explode — pos (and doc_id) would ride the largest
        // shuffle in the query just to be dropped by the groupBy
        val c3 = train.filter(size(col("t")) >= 3)
          .select(explode(expr(
            """transform(sequence(2, size(t) - 1),
               i -> named_struct('a', t[i - 2], 'b', t[i - 1],
                                 'c', t[i]))""")).as("g"))
          .select(col("g.a").as("a"), col("g.b").as("b"),
            col("g.c").as("c"))
          .groupBy("a", "b", "c").agg(count(lit(1)).as("n3"))
        val c2 = truncateLineage(train.filter(size(col("t")) >= 2)
          .select(explode(expr(
            """transform(sequence(1, size(t) - 1),
               i -> named_struct('x', t[i - 1], 'y', t[i]))""")).as("g"))
          .select(col("g.x").as("x"), col("g.y").as("y"))
          .groupBy("x", "y").agg(count(lit(1)).as("n2")))
        val c1 = truncateLineage(train.select(explode(col("t")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("n1")))
        val totals = c1.agg(sum("n1").cast("long").as("n_tok"),
          count(lit(1)).cast("long").as("v"))
        trigrams(ev)
          .join(c3, Seq("a", "b", "c"), "left")
          .join(c2.select(col("x").as("a"), col("y").as("b"),
            col("n2").as("n2ab")), Seq("a", "b"), "left")
          .join(c2.select(col("x").as("b"), col("y").as("c"),
            col("n2").as("n2bc")), Seq("b", "c"), "left")
          // the unigram lookups deliberately carry NO broadcast hint: the
          // build side is the corpus VOCABULARY, which Heaps' law puts at
          // 10^8-10^9 types (tens of GB) on 100 TB of text — a pinned
          // broadcast there is a driver OOM waiting for scale. Left as
          // shuffle joins, AQE re-broadcasts at runtime when the MEASURED
          // size is small (it does at every shipped SF), which is the
          // only safe way to get the broadcast win. ScaleLadder measured
          // the trade (SURVEY §6): identical runtime at sf0.01 under AQE.
          .join(c1.select(col("w").as("b"),
            col("n1").as("n1b")), Seq("b"), "left")
          .join(c1.select(col("w").as("c"),
            col("n1").as("n1c")), Seq("c"), "left")
          .groupBy("doc_id")
          .agg(sort_array(collect_list(struct(col("pos"),
            coalesce(col("n3"), lit(0L)).as("n3"),
            coalesce(col("n2ab"), lit(0L)).as("n2ab"),
            coalesce(col("n2bc"), lit(0L)).as("n2bc"),
            coalesce(col("n1b"), lit(0L)).as("n1b"),
            coalesce(col("n1c"), lit(0L)).as("n1c")))).as("pn"))
          .crossJoin(broadcast(totals))
          .select(col("doc_id"),
            size(col("pn")).cast("long").as("n_tg"),
            expr("""CAST(size(filter(pn,
                x -> x.n3 = 0L AND x.n2bc > 0L)) AS BIGINT)""")
              .as("n_bo1"),
            expr("""CAST(size(filter(pn,
                x -> x.n3 = 0L AND x.n2bc = 0L)) AS BIGINT)""")
              .as("n_bo2"),
            round(expr(
              """-(aggregate(pn, CAST(0 AS DOUBLE),
                   (acc, x) -> acc + CASE
                     WHEN x.n3 > 0L
                       THEN ln(CAST(x.n3 AS DOUBLE) / x.n2ab)
                     WHEN x.n2bc > 0L
                       THEN ln(0.4 * CAST(x.n2bc AS DOUBLE) / x.n1b)
                     ELSE ln(0.16 * CAST(x.n1c + 1 AS DOUBLE)
                       / (n_tok + v)) END)
                 / size(pn))"""), 6).as("xent"))
          .orderBy("doc_id")
      },
      Some("""WITH docs AS (
                SELECT doc_id, string_split(text, ' ') AS t FROM documents),
              train AS (SELECT * FROM docs WHERE doc_id % 10 <> 0),
              ev AS (SELECT * FROM docs
                     WHERE doc_id % 10 = 0 AND len(t) >= 3),
              ttg AS (
                SELECT unnest(list_transform(generate_series(3, len(t)),
                  i -> {'a': t[i - 2], 'b': t[i - 1], 'c': t[i]})) AS g
                FROM train WHERE len(t) >= 3),
              c3 AS (SELECT g.a AS a, g.b AS b, g.c AS c,
                       count(*) AS n3 FROM ttg GROUP BY 1, 2, 3),
              tbg AS (
                SELECT unnest(list_transform(generate_series(2, len(t)),
                  i -> {'x': t[i - 1], 'y': t[i]})) AS g
                FROM train WHERE len(t) >= 2),
              c2 AS (SELECT g.x AS x, g.y AS y, count(*) AS n2
                     FROM tbg GROUP BY 1, 2),
              c1 AS (SELECT w, count(*) AS n1 FROM (
                       SELECT unnest(t) AS w FROM train) GROUP BY w),
              tot AS (SELECT CAST(sum(n1) AS BIGINT) AS n_tok,
                             CAST(count(*) AS BIGINT) AS v FROM c1),
              etg AS (
                SELECT doc_id, g.pos AS pos, g.a AS a, g.b AS b, g.c AS c
                FROM (SELECT doc_id,
                        unnest(list_transform(generate_series(3, len(t)),
                          i -> {'pos': i, 'a': t[i - 2], 'b': t[i - 1],
                                'c': t[i]})) AS g
                      FROM ev)),
              j AS (
                SELECT e.doc_id, e.pos,
                       COALESCE(c3.n3, 0) AS n3,
                       COALESCE(ab.n2, 0) AS n2ab,
                       COALESCE(bc.n2, 0) AS n2bc,
                       COALESCE(b1.n1, 0) AS n1b,
                       COALESCE(cx.n1, 0) AS n1c
                FROM etg e
                LEFT JOIN c3 ON e.a = c3.a AND e.b = c3.b AND e.c = c3.c
                LEFT JOIN c2 ab ON e.a = ab.x AND e.b = ab.y
                LEFT JOIN c2 bc ON e.b = bc.x AND e.c = bc.y
                LEFT JOIN c1 b1 ON e.b = b1.w
                LEFT JOIN c1 cx ON e.c = cx.w),
              arrs AS (
                SELECT doc_id, list({'n3': n3, 'n2ab': n2ab, 'n2bc': n2bc,
                    'n1b': n1b, 'n1c': n1c} ORDER BY pos) AS pn
                FROM j GROUP BY doc_id)
              SELECT doc_id, CAST(len(pn) AS BIGINT) AS n_tg,
                     CAST(len(list_filter(pn,
                       x -> x.n3 = 0 AND x.n2bc > 0)) AS BIGINT) AS n_bo1,
                     CAST(len(list_filter(pn,
                       x -> x.n3 = 0 AND x.n2bc = 0)) AS BIGINT) AS n_bo2,
                     round(-(list_reduce(list_transform(pn, x -> CASE
                         WHEN x.n3 > 0
                           THEN ln(CAST(x.n3 AS DOUBLE) / x.n2ab)
                         WHEN x.n2bc > 0
                           THEN ln(0.4 * CAST(x.n2bc AS DOUBLE) / x.n1b)
                         ELSE ln(0.16 * CAST(x.n1c + 1 AS DOUBLE)
                           / (n_tok + v)) END),
                       (p, q) -> p + q) / len(pn)), 6) AS xent
              FROM arrs CROSS JOIN tot ORDER BY doc_id""")),

    // k-anonymity audit (round 14) — the privacy complement of j52's PII
    // scrub: before a corpus ships, count how identifiable each record is
    // under its quasi-identifier tuple (Sweeney's k-anonymity, the public
    // re-identification framework; QI here = lang × source × 200-char
    // length band — the release-visible attributes). Output per source:
    // group counts by risk band (k=1 unique → re-identifiable, 2≤k<5,
    // k≥5), docs at risk (members of sub-5 groups), and the source's
    // k-anonymity level (its min group size). All three bands fire at
    // sf0.001/sf0.01; at sf0.1 the k=1 band is measured EMPTY — more
    // data raises k, which is exactly the property the audit reports.
    // Scale shape: one QI-keyed aggregate (map-side combinable count)
    // then a source-keyed rollup of the group table (QI-cardinality-
    // sized, ≪ corpus); no window, no join, no driver state.
    Q("j86_k_anonymity",
      (s, d) => qiTuples(Tables.documents(s, d))
        .groupBy("lang", "source", "len_bucket")
        .agg(count(lit(1)).as("k"))
        .groupBy("source")
        .agg(
          sum(when(col("k") === 1, 1L).otherwise(0L)).as("groups_k1"),
          sum(when(col("k") >= 2 && col("k") < 5, 1L).otherwise(0L))
            .as("groups_k2_4"),
          sum(when(col("k") >= 5, 1L).otherwise(0L)).as("groups_k5"),
          sum(when(col("k") < 5, col("k")).otherwise(0L))
            .as("docs_at_risk"),
          min(col("k")).as("min_k"))
        .orderBy("source"),
      Some("""WITH g AS (
                SELECT lang, source, n_chars // 200 AS len_bucket,
                       count(*) AS k
                FROM documents GROUP BY 1, 2, 3)
              SELECT source,
                     CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END)
                       AS BIGINT) AS groups_k1,
                     CAST(sum(CASE WHEN k >= 2 AND k < 5 THEN 1 ELSE 0
                       END) AS BIGINT) AS groups_k2_4,
                     CAST(sum(CASE WHEN k >= 5 THEN 1 ELSE 0 END)
                       AS BIGINT) AS groups_k5,
                     CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END)
                       AS BIGINT) AS docs_at_risk,
                     CAST(min(k) AS BIGINT) AS min_k
              FROM g GROUP BY source ORDER BY source""")),

    // SymSpell deletion-neighborhood fuzzy vocabulary join (round 14) — the
    // typo-candidate miner a corpus normalization pass runs before vocab
    // consolidation: every distinct-token pair within edit distance ≤ 2,
    // with corpus frequencies (the cleaner merges the rare spelling into
    // the frequent one). The naive form is O(V²) levenshtein evaluations —
    // at a realistic V = 10⁷ that is 10¹⁴ string comparisons, the dedup
    // family's scale-killer in miniature. The public SymSpell observation
    // (Garbe): lev(a,b) ≤ d  ⇒  deletes≤d(a) ∩ deletes≤d(b) ≠ ∅, where
    // deletes≤d(t) is t plus every string reachable by ≤ d single-char
    // deletions. So each token posts its O(L²) depth-2 deletion variants
    // (pure codegen'd array ops — sequence/transform/substr, no UDF), the
    // variant key becomes an equi-join, and the exact levenshtein runs ONLY
    // on co-bucketed candidates (measured here: 14 candidates vs 465 brute
    // pairs, recall 7/7 — QueriesSpec additionally property-tests recall
    // against brute force on random planted typos). At 100 TB the variant
    // posting table is j66's playbook: a HAVING df-cap on the SAME variant
    // key the self-join shuffles on bounds any hot bucket (short tokens
    // share the empty-string variant) at cap² pairs — not needed at this
    // vocabulary, documented as the production knob. The oracle is the
    // BRUTE-FORCE quadratic (DuckDB's levenshtein, exact integer in both
    // engines), so the hash match proves the index loses nothing.
    Q("j87_typo_candidates",
      (s, d) => typoCandidates(
        Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("tok"))
          .where(col("tok") =!= "")
          .groupBy("tok").agg(count(lit(1)).as("cnt"))),
      Some("""WITH toks AS (
                SELECT unnest(string_split(text, ' ')) AS tok
                FROM documents),
              v AS (SELECT tok, count(*) AS cnt FROM toks
                    WHERE tok <> '' GROUP BY tok)
              SELECT a.tok AS tok_a, b.tok AS tok_b,
                     CAST(levenshtein(a.tok, b.tok) AS INTEGER) AS dist,
                     a.cnt AS cnt_a, b.cnt AS cnt_b
              FROM v a JOIN v b
                ON a.tok < b.tok AND levenshtein(a.tok, b.tok) <= 2
              ORDER BY tok_a, tok_b""")),

    // j87 with the production df cap EXECUTABLE and hash-checked (the j66
    // discipline: a documented knob is not a tested knob). Variants shared
    // by more than `cap` tokens leave the posting table before the
    // self-join — the HAVING runs on the SAME variant key the join
    // shuffles on, so the cap adds no extra wide exchange, and each
    // surviving bucket contributes ≤ cap² candidate pairs (the blow-up
    // bound: short tokens' empty-string bucket, digit-dense vocabularies'
    // subsequence buckets). cap=2 BITES on this corpus — the df-3 'at'
    // bucket (fast/part/…) is dropped and exactly one true pair
    // (fast, part) has no other shared variant, so the recall trade is
    // measured in the hash itself: 6 of j87's 7 pairs (QueriesSpec replays
    // the capped index first-principles in Scala and pins the subset law).
    // The DuckDB oracle rebuilds the SAME deletion index in SQL and
    // applies the SAME HAVING, so both engines drop the same bucket for
    // the same reason. TypoLadder measures the cost/recall envelope at
    // vocabulary 20k–100k on the planted digit-vocab corpus.
    Q("j88_typo_capped",
      (s, d) => typoCandidates(
        Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("tok"))
          .where(col("tok") =!= "")
          .groupBy("tok").agg(count(lit(1)).as("cnt")),
        dfCap = Some(2)),
      Some("""WITH toks AS (
                SELECT unnest(string_split(text, ' ')) AS tok
                FROM documents),
              v AS (SELECT tok, count(*) AS cnt FROM toks
                    WHERE tok <> '' GROUP BY tok),
              posted AS (
                SELECT tok, cnt, unnest(list_distinct(
                  [tok] ||
                  list_transform(generate_series(1, length(tok)),
                    i -> substr(tok, 1, i - 1) || substr(tok, i + 1)) ||
                  flatten(list_transform(generate_series(1, length(tok)),
                    i -> list_transform(
                      generate_series(i + 1, length(tok)),
                      j -> substr(tok, 1, i - 1) ||
                           substr(tok, i + 1, j - i - 1) ||
                           substr(tok, j + 1)))))) AS var
                FROM v),
              kept AS (SELECT var FROM posted
                       GROUP BY var HAVING count(*) <= 2),
              cand AS (
                SELECT DISTINCT a.tok AS tok_a, b.tok AS tok_b,
                       a.cnt AS cnt_a, b.cnt AS cnt_b
                FROM (SELECT p.* FROM posted p JOIN kept USING (var)) a
                JOIN (SELECT p.* FROM posted p JOIN kept USING (var)) b
                  ON a.var = b.var AND a.tok < b.tok)
              SELECT tok_a, tok_b,
                     CAST(levenshtein(tok_a, tok_b) AS INTEGER) AS dist,
                     cnt_a, cnt_b
              FROM cand WHERE levenshtein(tok_a, tok_b) <= 2
              ORDER BY tok_a, tok_b""")),

    // Triangle enumeration over the near-dup graph — the cluster-DENSITY
    // audit the pairwise dedup reports can't give: a triangle is three
    // documents that are all mutually near-duplicates, the strongest
    // evidence a cluster is a true template family rather than a chain of
    // borderline pairs (transitive chaining is dedup's classic false-merge
    // mode; j13's clusters connect by ANY path, triangles certify mutual
    // similarity). Standard distributed shape (Suri & Vassilvitskii,
    // WWW'11): orient every edge by DEGREE (low→high, doc_id tiebreak),
    // build wedges at each edge pair's ≺-minimum vertex, close each wedge
    // with one more equi-join — see [[triangleEnum]] for why degree (not
    // doc_id) is the load-bearing choice at 100 TB. The edge set is j2's
    // banded pair table (linear, truncated once; the ORIENTED table is
    // truncated again and reused for all three join roles).
    // Cohesion = the triangle's weakest pairwise Jaccard in basis points
    // (floor of the exact division both engines compute identically).
    Q("j89_dup_triangles",
      (s, d) => triangleEnum(truncateLineage(neardupPairs(s, d)
        .select(col("doc_a").as("u"), col("doc_b").as("v"), col("jac")))),
      Some(s"""WITH $NeardupPairsSql,
              e AS (SELECT doc_a AS u, doc_b AS v, jac FROM pairs)
              SELECT ab.u AS doc_a, ab.v AS doc_b, bc.v AS doc_c,
                     CAST(floor(least(ab.jac, bc.jac, ac.jac) * 10000)
                       AS BIGINT) AS cohesion_bp
              FROM e ab
              JOIN e bc ON ab.v = bc.u
              JOIN e ac ON ab.u = ac.u AND bc.v = ac.v
              ORDER BY doc_a, doc_b, doc_c""")),

    // l-diversity audit (Machanavajjhala et al. 2006, the public successor
    // to k-anonymity) — j86's blind spot made executable: a group can be
    // k-anonymous yet leak everything if all k members SHARE the sensitive
    // value (the homogeneity attack). Here the quasi-identifier is (lang,
    // len_bucket) and the sensitive attribute is `source` (the release-
    // visible provenance a curator may need to hide): per QI group, the
    // distinct-l (how many sources appear) and entropy-l (how evenly —
    // ln N − Σ n·ln n / N, the entropy of the source distribution) plus
    // the max single-source share the recursive-(c,l) check needs.
    // Determinism: counts are exact integers; the entropy sum is a float
    // fold ORDER-PINNED by sorting the (source, n) list before the fold
    // (n6's discipline — Spark `aggregate` seeded with the first term ≡
    // DuckDB `list_reduce`, left fold in identical order), so the 6-dp
    // round is safe; ln parity is j27's measured prior art. Scale: two
    // keyed aggregations on subset keys (the second groups a strict subset
    // of the first's key — no extra wide exchange under AQE), output is
    // QI-group-sized; the per-group fold list is bounded by the number of
    // DISTINCT sensitive values (≤ sources, tiny), never by row count.
    Q("j90_l_diversity",
      (s, d) => {
        val g = qiTuples(Tables.documents(s, d))
          .groupBy("lang", "len_bucket", "source")
          .agg(count(lit(1)).as("n"))
        g.groupBy("lang", "len_bucket")
          .agg(sum(col("n")).as("n_docs"),
            count(lit(1)).as("l_distinct"),
            max(col("n")).as("max_source"),
            expr("sort_array(collect_list(struct(source, n)))").as("cs"))
          .withColumn("terms",
            expr("transform(cs, c -> CAST(c.n AS DOUBLE) * ln(c.n))"))
          .select(col("lang"), col("len_bucket"), col("n_docs"),
            col("l_distinct"), col("max_source"),
            round(
              expr("ln(CAST(n_docs AS DOUBLE))") -
                expr("""aggregate(slice(terms, 2, size(terms) - 1),
                          element_at(terms, 1),
                          (a, x) -> a + x)""")
                / col("n_docs").cast("double"), 6).as("entropy_l"))
          .orderBy("lang", "len_bucket")
      },
      Some("""WITH g AS (
                SELECT lang, n_chars // 200 AS len_bucket, source,
                       count(*) AS n
                FROM documents GROUP BY 1, 2, 3),
              q AS (
                SELECT lang, len_bucket,
                       sum(n) AS n_docs, count(*) AS l_distinct,
                       max(n) AS max_source,
                       list_sort(list(struct_pack(source := source,
                                                  n := n))) AS cs
                FROM g GROUP BY 1, 2)
              SELECT lang, len_bucket,
                     CAST(n_docs AS BIGINT) AS n_docs,
                     CAST(l_distinct AS BIGINT) AS l_distinct,
                     CAST(max_source AS BIGINT) AS max_source,
                     round(ln(CAST(n_docs AS DOUBLE)) -
                       list_reduce(list_transform(cs,
                           c -> CAST(c.n AS DOUBLE)
                                * ln(CAST(c.n AS DOUBLE))),
                         (a, x) -> a + x)
                       / CAST(n_docs AS DOUBLE), 6) AS entropy_l
              FROM q ORDER BY lang, len_bucket""")),

    // Heaps'-law vocabulary-growth diagnostic (Heaps 1978) — the curve a
    // corpus curator reads before sizing a tokenizer vocabulary or judging
    // dedup quality: distinct vocabulary V(n) vs corpus position n, here
    // at 8 equal doc-count checkpoints. The vocabulary unit is the token
    // TRIGRAM (this synthetic corpus's unigram vocabulary saturates at 31
    // tokens by the first checkpoint — flat and useless; trigrams grow
    // 3k → 16k across the checkpoints, a real concave Heaps curve). A
    // sub-linear curve is healthy; a LINEAR tail is the classic signal of
    // boilerplate/noise injection, and a flattened one of heavy
    // duplication. All-integer output, exact hash. Scale: the corpus is
    // scanned twice, both column-pruned (grams carry text; per-doc length
    // carries only size(split)) — the first-occurrence table shuffles ONE
    // row per DISTINCT gram (min(doc_id) partial-aggregates map-side), the
    // checkpoint panel is an 8-row broadcast (the theta join below it is
    // 8×V against a broadcast, never pairwise), and the per-doc length
    // table is lineage-truncated so the checkpoint derivation and the
    // cumulative-gram join read it once.
    Q("j91_heaps_law",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("ts"))
        val tri = docTrigrams(docs)
        val fo = tri.groupBy("g").agg(min(col("doc_id")).as("fd"))
        val dl = truncateLineage(docs.select(col("doc_id"),
          greatest(size(col("ts")) - 2, lit(0)).cast("long").as("ng")))
        val cps = dl.agg((max(col("doc_id")) + lit(1L)).as("nd"))
          .select(explode(expr("sequence(1, 8)")).as("k"), col("nd"))
          .select(col("k").cast("long").as("k"),
            expr("(k * nd) div 8").as("c"))
        val vocab = fo.join(broadcast(cps), col("fd") < col("c"))
          .groupBy("k", "c").agg(count(lit(1)).as("vocab"))
        val grams = dl.join(broadcast(cps), col("doc_id") < col("c"))
          .groupBy("k", "c").agg(sum(col("ng")).as("n_grams"))
        cps.join(vocab, Seq("k", "c"), "left")
          .join(grams, Seq("k", "c"), "left")
          .select(col("k"), col("c").as("c_docs"),
            coalesce(col("n_grams"), lit(0L)).as("n_grams"),
            coalesce(col("vocab"), lit(0L)).as("vocab"))
          .orderBy("k")
      },
      Some("""WITH d AS (
                SELECT doc_id, string_split(text, ' ') AS ts
                FROM documents),
              mx AS (SELECT max(doc_id) + 1 AS nd FROM d),
              cps AS (
                SELECT CAST(t.k AS BIGINT) AS k, (t.k * nd) // 8 AS c
                FROM mx, unnest(generate_series(1, 8)) t(k)),
              tri AS (
                SELECT doc_id,
                       ts[i.i] || ' ' || ts[i.i + 1] || ' ' || ts[i.i + 2]
                         AS g
                FROM d, LATERAL unnest(range(1, greatest(len(ts) - 1, 1)))
                  i(i)
                WHERE len(ts) >= 3),
              fo AS (SELECT g, min(doc_id) AS fd FROM tri GROUP BY 1),
              dl AS (
                SELECT doc_id,
                       CAST(greatest(len(ts) - 2, 0) AS BIGINT) AS ng
                FROM d),
              v AS (SELECT k, c, count(*) AS vocab
                    FROM cps JOIN fo ON fd < c GROUP BY 1, 2),
              t AS (SELECT k, c, sum(ng) AS n_grams
                    FROM cps JOIN dl ON doc_id < c GROUP BY 1, 2)
              SELECT cps.k, cps.c AS c_docs,
                     CAST(coalesce(t.n_grams, 0) AS BIGINT) AS n_grams,
                     CAST(coalesce(v.vocab, 0) AS BIGINT) AS vocab
              FROM cps LEFT JOIN v ON cps.k = v.k
                LEFT JOIN t ON cps.k = t.k
              ORDER BY cps.k""")),

    // Per-document n-gram novelty audit — j91's first-occurrence table
    // turned per-document (the memorization/staleness signal a curriculum
    // or dedup pass reads): for each doc in corpus (doc_id) order, the
    // share of its trigrams NEVER seen in any earlier doc, in exact basis
    // points. A late document scoring near 0 is recombined boilerplate; a
    // tail of high scores means the corpus is still contributing new
    // content (measured here: 0–10000 bp, mean ≈ 6100 — real spread).
    // EXACT INTEGERS end-to-end (count + integer-div basis points — both
    // engines truncate toward zero). Scale: the trigram explode is
    // lineage-truncated ONCE and serves both the min(doc_id)
    // first-occurrence aggregate and the per-gram rejoin (no diamond —
    // the j87 playbook); both wide exchanges key on the gram hash (one
    // row per distinct gram out of the aggregate, corpus-sized into the
    // join, exactly the posting-list shape j62 already carries at 100 TB);
    // the final per-doc rollup partial-aggregates map-side.
    Q("j92_ngram_novelty",
      (s, d) => {
        // per-(doc, gram) occurrence counts — the ONE corpus-sized
        // exchange, partial-aggregated map-side so repeats collapse
        // before the shuffle; the shingling is j91's docTrigrams seam
        // (one definition, two surfaces — the qiTuples discipline)
        val cntDg = truncateLineage(docTrigrams(
          Tables.documentsSpread(s, d)
            .select(col("doc_id"), split(col("text"), " ").as("ts")))
          .groupBy("doc_id", "g").agg(count(lit(1)).as("cnt")))
        // first-occurrence + its in-doc count in ONE min-struct aggregate
        // (doc_id leads the struct, so min picks the earliest doc and
        // carries that doc's count along) — the first cut REJOINED the
        // corpus-sized gram table against the first-occurrence table on
        // the gram string, and the ladder measured it 4.6× slower at 200k
        // docs (40.6 s vs 8.8 s at 50k); this form never joins anything
        // bigger than doc-count-sized tables
        val novel = cntDg.groupBy("g")
          .agg(min(struct(col("doc_id"), col("cnt"))).as("m"))
          .groupBy(col("m.doc_id").as("doc_id"))
          .agg(sum(col("m.cnt")).as("novel"))
        val perDoc = cntDg.groupBy("doc_id")
          .agg(sum(col("cnt")).as("n_grams"))
        perDoc.join(novel, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_grams"),
            coalesce(col("novel"), lit(0L)).as("novel"))
          .select(col("doc_id"), col("n_grams"), col("novel"),
            expr("(novel * CAST(10000 AS BIGINT)) div n_grams")
              .as("novelty_bp"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
                SELECT doc_id, string_split(text, ' ') AS ts
                FROM documents),
              tri AS (
                SELECT doc_id,
                       ts[i.i] || ' ' || ts[i.i + 1] || ' ' || ts[i.i + 2]
                         AS g
                FROM d, LATERAL unnest(range(1, greatest(len(ts) - 1, 1)))
                  i(i)
                WHERE len(ts) >= 3),
              fo AS (SELECT g, min(doc_id) AS fd FROM tri GROUP BY 1)
              SELECT t.doc_id,
                     CAST(count(*) AS BIGINT) AS n_grams,
                     CAST(sum(CASE WHEN f.fd = t.doc_id THEN 1 ELSE 0 END)
                       AS BIGINT) AS novel,
                     CAST((sum(CASE WHEN f.fd = t.doc_id THEN 1 ELSE 0
                       END) * 10000) // count(*) AS BIGINT) AS novelty_bp
              FROM tri t JOIN fo f ON t.g = f.g
              GROUP BY t.doc_id ORDER BY t.doc_id""")),

    // Two-sample Kolmogorov–Smirnov drift test — the DISTRIBUTIONAL
    // complement of j35's unigram drift (which compares token shares):
    // for every source pair, D = max_v |F_a(v) − F_b(v)| over the doc-
    // length empirical CDFs, the classic test for "did this source's
    // length distribution shift" (mixture rebalancing, truncation bugs,
    // boilerplate injection all move it). EXACT INTEGERS: the CDF
    // difference is compared as |le_a·n_b − le_b·n_a| over the common
    // denominator n_a·n_b, and D lands in basis points by one toward-zero
    // division of the max numerator (division is monotone, so max-then-
    // divide ≡ divide-then-max) — no float ever, the hash is exact.
    // Shapes: ONE count scan into the (source, n_chars) table; the value
    // grid is distinct-length-sized; per-source CDFs are linear PREFIX-
    // frame running sums over the densified grid (n8's lesson — never the
    // quadratic following frame); the pair compare is a value-keyed
    // equi-join of the tiny CDF table against itself. The ORACLE builds
    // the same CDFs by an independent theta-grid aggregation, so the hash
    // match crosses two formulations. At ~10⁹⁺ docs per source the
    // integer cross products approach BIGINT range — sample with f6's LCG
    // first (KS power is long saturated) — documented, not needed here.
    Q("j93_ks_drift",
      (s, d) => {
        val cnt = truncateLineage(Tables.documents(s, d)
          .groupBy("source", "n_chars").agg(count(lit(1)).as("c")))
        val n = cnt.groupBy("source").agg(sum(col("c")).as("n"))
        val grid = cnt.select(col("n_chars").as("v")).distinct()
          .crossJoin(broadcast(n))
        val dense = grid.join(
          cnt.select(col("source"), col("n_chars").as("v"), col("c")),
          Seq("source", "v"), "left")
          .select(col("source"), col("v"), col("n"),
            coalesce(col("c"), lit(0L)).as("c"))
        val wCdf = Window.partitionBy("source").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cdf = dense.withColumn("le", sum("c").over(wCdf))
          .select(col("source"), col("v"), col("n"), col("le"))
        val a = cdf.select(col("source").as("source_a"), col("v"),
          col("n").as("n_a"), col("le").as("le_a"))
        val b = cdf.select(col("source").as("source_b"), col("v"),
          col("n").as("n_b"), col("le").as("le_b"))
        a.join(b, Seq("v"))
          .where(col("source_a") < col("source_b"))
          .groupBy("source_a", "source_b")
          .agg(max(abs(col("le_a") * col("n_b") - col("le_b") * col("n_a")))
            .as("num"), max(col("n_a") * col("n_b")).as("den"))
          .select(col("source_a"), col("source_b"),
            expr("(num * CAST(10000 AS BIGINT)) div den").as("d_bp"))
          .orderBy("source_a", "source_b")
      },
      Some("""WITH v AS (SELECT DISTINCT n_chars AS v FROM documents),
              s AS (SELECT source, n_chars, count(*) AS c
                    FROM documents GROUP BY 1, 2),
              n AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
                    FROM s GROUP BY 1),
              cdf AS (
                SELECT n.source, v.v, n.n,
                       CAST(coalesce(sum(s.c), 0) AS BIGINT) AS le
                FROM n CROSS JOIN v
                  LEFT JOIN s ON s.source = n.source AND s.n_chars <= v.v
                GROUP BY 1, 2, 3)
              SELECT a.source AS source_a, b.source AS source_b,
                     CAST(max(abs(a.le * b.n - b.le * a.n)) * 10000
                          // max(a.n * b.n) AS BIGINT) AS d_bp
              FROM cdf a JOIN cdf b
                ON a.v = b.v AND a.source < b.source
              GROUP BY 1, 2 ORDER BY 1, 2"""))
  )

  /** j68/j94's Spark-side seam — the IMI 3-cell probe search returning
    * (probe_id, vec_id, adist, rk ≤ 3) for the 64-probe panel. One
    * definition, two surfaces: j68 registers it; j94 audits its recall
    * against [[bruteTop3]].
    */
  private[graft] def imiSearchTop3(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    graft.functions.SquaredDistance.register(s)
    val qe = graft.operators.IvfKMeans.quantize(Tables.embeddings(s, d))
    val d2 = graft.operators.IvfKMeans.d2Expr _
    val cells = truncateLineage(
      graft.operators.IvfKMeans.imiAssign(qe, kHalf = 4)
        .select("vec_id", "cell"))
    val probes = imiProbes(qe)
    val hp = probes.select(col("probe_id"),
      expr("slice(pqv, 1, 32)").as("plo"),
      expr("slice(pqv, 33, 32)").as("phi"))
    val seeds = qe.filter(col("vec_id") < 4)
    val cl = seeds.select(col("vec_id").as("ci"),
      expr("slice(qv, 1, 32)").as("cvl"))
    val ch = seeds.select(col("vec_id").as("cj"),
      expr("slice(qv, 33, 32)").as("cvh"))
    val dl = hp.crossJoin(broadcast(cl))
      .withColumn("dl", expr(d2("plo", "cvl")))
      .select("probe_id", "ci", "dl")
    val dh = hp.crossJoin(broadcast(ch))
      .withColumn("dh", expr(d2("phi", "cvh")))
      .select("probe_id", "cj", "dh")
    val wCell = Window.partitionBy("probe_id")
      .orderBy(col("dsum").asc, col("pcell").asc)
    val probeCells = dl.join(dh, Seq("probe_id"))
      .withColumn("pcell", col("ci") * 4 + col("cj"))
      .withColumn("dsum", col("dl") + col("dh"))
      .withColumn("crk", row_number().over(wCell))
      .filter(col("crk") <= 3)
      .join(probes, Seq("probe_id"))
      .select("probe_id", "pcell", "pqv")
    // candidates FIRST (cell equi-join on the 1-row-per-vector cell
    // table), vectors fetched per candidate after — never a
    // collection-sized vector shuffle
    val cand = cells.join(broadcast(probeCells),
        col("cell") === col("pcell") && col("vec_id") =!= col("probe_id"))
      .select("probe_id", "vec_id", "pqv")
    val w = Window.partitionBy("probe_id")
      .orderBy(col("adist").asc, col("vec_id"))
    cand.join(qe, Seq("vec_id"))
      .withColumn("adist", expr(d2("qv", "pqv")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select("probe_id", "vec_id", "adist", "rk")
  }

  /** The shared 64-probe panel (every 100th vector, plan-capped). */
  private def imiProbes(qe: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    truncateLineage(qe.filter(col("vec_id") % 100 === 7)
      .orderBy("vec_id").limit(64)
      .select(col("vec_id").as("probe_id"), col("qv").as("pqv")))

  /** j94's exact side: brute-force integer-distance top-3 per probe —
    * the probe panel broadcast once against the whole collection (the
    * offline recall-audit cost at any scale: one brute pass over sampled
    * probes, never probes × probes).
    */
  private[graft] def bruteTop3(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    graft.functions.SquaredDistance.register(s)
    val qe = graft.operators.IvfKMeans.quantize(Tables.embeddings(s, d))
    val d2 = graft.operators.IvfKMeans.d2Expr _
    val w = Window.partitionBy("probe_id")
      .orderBy(col("bdist").asc, col("vec_id"))
    qe.crossJoin(broadcast(imiProbes(qe)))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("bdist", expr(d2("qv", "pqv")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select("probe_id", "vec_id", "bdist", "rk")
  }

  /** j87/j88's core seam — deletion-neighborhood candidate generation +
    * exact verification over a (tok, cnt) vocabulary table, shared by the
    * registered queries, the QueriesSpec brute-force property test, and
    * TypoLadder. `dfCap`: variants posted by more than this many tokens
    * leave the index before the self-join (j88's executable knob).
    */
  private[graft] def typoCandidates(vocab: org.apache.spark.sql.DataFrame,
      dfCap: Option[Int] = None): org.apache.spark.sql.DataFrame = {
    val t = col("tok")
    val bigL = length(t) // codegen'd; evaluated per lambda use site
    // depth-1: delete 0-based position i → keep [1..i] ++ [i+2..L] (1-based)
    val d1 = transform(sequence(lit(0), bigL - 1), i =>
      concat(t.substr(lit(1), i), t.substr(i + lit(2), bigL)))
    // depth-2: delete 0-based i < j. Guarded `when`: Spark's sequence(a, b)
    // steps DOWNWARD when a > b (it would fabricate j < i pairs), so the
    // inner sequence only runs when i + 1 <= L - 1.
    val d2 = flatten(transform(sequence(lit(0), bigL - 1), i =>
      when(i + lit(1) <= bigL - 1,
        transform(sequence(i + lit(1), bigL - 1), j =>
          concat(t.substr(lit(1), i),
            t.substr(i + lit(2), j - i - 1),
            t.substr(j + lit(2), bigL))))
        .otherwise(array().cast("array<string>"))))
    // the posting table IS the index: truncate its lineage once so the
    // self-join (and the cap's groupBy) read the materialized index, not
    // two re-executions of the tokenize→explode subtree (the diamond —
    // PlanSpec pins the final plan reads documents zero times)
    val postedAll = truncateLineage(vocab.select(t, col("cnt"),
      explode(array_distinct(concat(array(t), d1, d2))).as("v")))
    // the df cap groups on the SAME variant key the self-join shuffles on
    // — no extra wide exchange, bucket contribution bounded at cap²
    val posted = dfCap match {
      case Some(cap) =>
        val kept = postedAll.groupBy("v")
          .agg(count(lit(1)).as("df")).where(col("df") <= cap).select("v")
        postedAll.join(kept, Seq("v"))
      case None => postedAll
    }
    val a = posted.select(col("v"), t.as("tok_a"), col("cnt").as("cnt_a"))
    val b = posted.select(col("v"), t.as("tok_b"), col("cnt").as("cnt_b"))
    a.join(b, Seq("v"))
      .where(col("tok_a") < col("tok_b"))
      .select("tok_a", "tok_b", "cnt_a", "cnt_b").distinct()
      .where(levenshtein(col("tok_a"), col("tok_b")) <= 2)
      .select(col("tok_a"), col("tok_b"),
        levenshtein(col("tok_a"), col("tok_b")).cast("int").as("dist"),
        col("cnt_a"), col("cnt_b"))
      .orderBy("tok_a", "tok_b")
  }
}
