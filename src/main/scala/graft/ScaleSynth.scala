package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-experiment corpus synthesizer — generates a `documents.parquet`
  * with the testdata schema (doc_id, text, lang, source, n_chars) at an
  * arbitrary document count, fully deterministic (murmur3 `hash` of the
  * doc id drives every choice — same args, same corpus, no RNG state).
  *
  * Shape: ~95% of docs are independent random-token texts (30–150 tokens
  * from a 100k-word vocabulary — signatures near-uniform, realistic LOW
  * near-dup density); in each consecutive group of 100 ids the first 5 are
  * perturbed clones of one base text (a planted near-dup cluster: clone
  * members differ by one unique token, so sketch paths must both FIND the
  * planted pairs and not drown in a dense signature space).
  *
  * With a third argument it also writes an `embeddings.parquet`
  * (vec_id, 64-dim float embedding, label) of deterministic pseudo-random
  * vectors — the ANN queries' input at arbitrary collection sizes.
  *
  * With `relational <mult>` as the arguments it instead writes the six
  * HEADLINE-shape tables (lineitem, orders, customer, nation, events,
  * embeddings) at `mult`× the sf0.1 row counts, value distributions
  * mirroring the driver testdata (same key fan-outs, date ranges, enum
  * alphabets), so the graded headline queries can be scale-laddered with
  * `SPARK_GRAFT_SF_DIR=<outDir> runMain graft.Bench`. `events.ts` is
  * written as raw long NANOseconds — the same shape `Tables.events`
  * normalizes for the driver testdata's ns-timestamp parquet.
  *
  * A fourth argument `hotEvery` (default 0 = off) appends one SHARED
  * 8-token phrase to every `hotEvery`-th doc — a planted boilerplate gram
  * with df = nDocs/hotEvery, the shape that blows up an uncapped
  * substring-dedup self-join (one gram alone contributes df² candidate
  * pairs) and that j66's df cap exists to drop. Used by the j62-vs-j66
  * cost ladder.
  *
  * Usage: runMain graft.ScaleSynth <outDir> <nDocs> [nVecs] [hotEvery]
  *        runMain graft.ScaleSynth <outDir> relational <mult>
  * then e.g. SPARK_GRAFT_BENCH_ONLY=j10_simhash_neardup
  *           SPARK_GRAFT_SF_DIR=<outDir> runMain graft.Bench
  * (the bench warmup tolerates dirs holding only the tables an experiment
  * reads).
  */
object ScaleSynth {

  private def relational(spark: SparkSession, outDir: String,
      mult: Long): Unit = {
    val (nCust, nOrd, nLi) = (15000L * mult, 150000L * mult, 600000L * mult)
    val (nEv, nUser, nVec) = (100000L * mult, 1500L * mult, 2000L * mult)

    spark.range(25).select(
      col("id").cast("int").as("n_nationkey"),
      concat(lit("NATION_"), col("id")).as("n_name"),
      pmod(col("id"), lit(5)).cast("int").as("n_regionkey"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/nation.parquet")

    spark.range(nCust).select(
      col("id").as("c_custkey"),
      concat(lit("Customer#"), col("id")).as("c_name"),
      pmod(hash(col("id"), lit(21)), lit(25)).cast("int").as("c_nationkey"),
      (pmod(hash(col("id"), lit(22)), lit(1099999)) / 100.0 - 999.99)
        .as("c_acctbal"),
      element_at(array(lit("BUILDING"), lit("AUTOMOBILE"), lit("HOUSEHOLD"),
        lit("FURNITURE"), lit("MACHINERY")),
        (pmod(hash(col("id"), lit(23)), lit(5)) + 1).cast("int"))
        .as("c_mktsegment"))
      .write.mode("overwrite").parquet(s"$outDir/customer.parquet")

    spark.range(nOrd).select(
      col("id").as("o_orderkey"),
      pmod(hash(col("id"), lit(31)), lit(nCust)).as("o_custkey"),
      element_at(array(lit("F"), lit("O"), lit("P")),
        (pmod(hash(col("id"), lit(32)), lit(3)) + 1).cast("int"))
        .as("o_orderstatus"),
      (lit(1000.0) + pmod(hash(col("id"), lit(33)), lit(49899128)) / 100.0)
        .as("o_totalprice"),
      to_timestamp(date_add(lit("1995-01-01").cast("date"),
        pmod(hash(col("id"), lit(34)), lit(2400)).cast("int")))
        .as("o_orderdate"),
      element_at(array(lit("1-URGENT"), lit("2-HIGH"), lit("3-MEDIUM"),
        lit("4-NOT SPECIFIED"), lit("5-LOW")),
        (pmod(hash(col("id"), lit(35)), lit(5)) + 1).cast("int"))
        .as("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")

    spark.range(nLi).select(
      pmod(hash(col("id"), lit(41)), lit(nOrd)).as("l_orderkey"),
      pmod(hash(col("id"), lit(42)), lit(20000L * mult)).as("l_partkey"),
      pmod(hash(col("id"), lit(43)), lit(1000L * mult)).as("l_suppkey"),
      (pmod(hash(col("id"), lit(44)), lit(7)) + 1).cast("int")
        .as("l_linenumber"),
      (pmod(hash(col("id"), lit(45)), lit(50)) + 1).cast("double")
        .as("l_quantity"),
      (lit(900.0) + pmod(hash(col("id"), lit(46)), lit(10410000)) / 100.0)
        .as("l_extendedprice"),
      (pmod(hash(col("id"), lit(47)), lit(11)) / 100.0).as("l_discount"),
      (pmod(hash(col("id"), lit(48)), lit(9)) / 100.0).as("l_tax"),
      element_at(array(lit("N"), lit("A"), lit("R")),
        (pmod(hash(col("id"), lit(49)), lit(3)) + 1).cast("int"))
        .as("l_returnflag"),
      element_at(array(lit("O"), lit("F")),
        (pmod(hash(col("id"), lit(50)), lit(2)) + 1).cast("int"))
        .as("l_linestatus"),
      to_timestamp(date_add(lit("1995-01-02").cast("date"),
        pmod(hash(col("id"), lit(51)), lit(2500)).cast("int")))
        .as("l_shipdate"))
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")

    // ts as long nanos (2024-01-01 + up to 30 days), the shape
    // Tables.events normalizes; ~67 events/user at every mult, matching
    // the testdata density so per-key window work stays comparable
    spark.range(nEv).select(
      col("id").as("event_id"),
      (lit(1704067200L) * lit(1000000000L) +
        pmod(hash(col("id"), lit(61)), lit(2592000L)) * lit(1000000000L) +
        pmod(hash(col("id"), lit(62)), lit(1000000L)) * lit(1000L))
        .as("ts"),
      pmod(hash(col("id"), lit(63)), lit(nUser)).as("user_id"),
      element_at(array(lit("click"), lit("view"), lit("purchase"),
        lit("signup"), lit("error")),
        (pmod(hash(col("id"), lit(64)), lit(5)) + 1).cast("int"))
        .as("event_type"),
      (pmod(hash(col("id"), lit(65)), lit(100000)) / 100.0).as("value"),
      concat(lit("""{"k":"""), pmod(hash(col("id"), lit(66)), lit(100)),
        lit("}")).as("props"))
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")

    spark.range(nVec).select(
      col("id").as("vec_id"),
      expr("""transform(sequence(1, 64),
                i -> cast((pmod(hash(id, i), 2001) - 1000) / 1000.0
                     as float))""").as("embedding"),
      pmod(hash(col("id"), lit(11)), lit(10)).cast("int").as("label"))
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    println(s"[synth] wrote relational corpus at ${mult}x sf0.1 to $outDir " +
      s"(lineitem=$nLi orders=$nOrd customer=$nCust events=$nEv vecs=$nVec)")
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ScaleSynth <outDir> <nDocs> [nVecs] | <outDir> relational <mult>")
    val spark = LocalSession.build(defaultCpus = "32")
    if (args(1) == "relational") {
      relational(spark, args(0), args(2).toLong)
      spark.stop()
      return
    }
    val (outDir, nDocs) = (args(0), args(1).toLong)
    val nVecs = if (args.length >= 3) args(2).toLong else 0L
    val hotEvery = if (args.length >= 4) args(3).toLong else 0L

    val docs = spark.range(nDocs)
      // clone-cluster members read the group base id's token stream; all
      // others read their own — one branchless expression, no joins
      .withColumn("base_id",
        when(pmod(col("id"), lit(100)) < 5,
          col("id") - pmod(col("id"), lit(100))).otherwise(col("id")))
      .withColumn("text", expr(
        """concat_ws(' ', transform(
             sequence(1, 30 + pmod(hash(base_id, 7), 121)),
             i -> concat('w', pmod(hash(base_id, i, 13), 100000))))"""))
      // the perturbation: each clone appends one token unique to ITSELF,
      // so clone signatures are near-identical but not equal
      .withColumn("text",
        when(col("id") =!= col("base_id"),
          concat(col("text"), lit(" u"), col("id")))
          .otherwise(col("text")))
      // planted boilerplate: the identical 8-token tail on every
      // hotEvery-th doc — ONE gram whose df grows with the corpus
      .withColumn("text",
        if (hotEvery <= 0) col("text")
        else when(pmod(col("id"), lit(hotEvery)) === 0,
          concat(col("text"), lit(" k0 k1 k2 k3 k4 k5 k6 k7")))
          .otherwise(col("text")))
      .select(
        col("id").as("doc_id"),
        col("text"),
        element_at(array(lit("en"), lit("de"), lit("fr"), lit("es"),
          lit("it")), (pmod(hash(col("id"), lit(3)), lit(5)) + 1).cast("int"))
          .as("lang"),
        // 'src<N>' — j32's documented naming contract, so mixture-sampling
        // yield audits are valid on synthesized corpora too
        concat(lit("src"), pmod(hash(col("id"), lit(5)), lit(100)))
          .as("source"),
        length(col("text")).cast("long").as("n_chars"))

    docs.write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    println(s"[synth] wrote $nDocs docs to $outDir/documents.parquet")

    if (nVecs > 0) {
      spark.range(nVecs)
        .select(
          col("id").as("vec_id"),
          // 64 uniform floats in [-1, 1), murmur3-derived per (id, dim)
          expr("""transform(sequence(1, 64),
                    i -> cast((pmod(hash(id, i), 2001) - 1000) / 1000.0
                         as float))""").as("embedding"),
          pmod(hash(col("id"), lit(11)), lit(10)).cast("int").as("label"))
        .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
      println(s"[synth] wrote $nVecs vecs to $outDir/embeddings.parquet")
    }
    spark.stop()
  }
}
