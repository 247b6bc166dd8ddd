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
  * Usage: runMain graft.ScaleSynth <outDir> <nDocs> [nVecs]
  * then e.g. SPARK_GRAFT_BENCH_ONLY=j10_simhash_neardup
  *           SPARK_GRAFT_SF_DIR=<outDir> runMain graft.Bench
  * (the bench warmup tolerates dirs holding only the tables an experiment
  * reads).
  */
object ScaleSynth {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleSynth <outDir> <nDocs> [nVecs]")
    val (outDir, nDocs) = (args(0), args(1).toLong)
    val nVecs = if (args.length >= 3) args(2).toLong else 0L
    val spark = LocalSession.build(defaultCpus = "32")

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
