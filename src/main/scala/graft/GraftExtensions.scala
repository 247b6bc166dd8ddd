package graft

import graft.functions.{BloomMightContain, DotProduct, MinHashSignature, SquaredDistance}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Library-style registration of the engine's native expressions:
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)          // or
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * makes `graft_dot` / `graft_minhash` available to every session (SQL and
  * DataFrame `expr`) without per-query registration — the deployment path a
  * consumer of this engine uses on a real cluster. The per-query
  * `DotProduct.register(...)` calls remain for harness entry points that
  * receive an already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (exprs: Seq[Expression]) => MinHashSignature(exprs.head,
        exprs(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("graft_d2"),
      new ExpressionInfo(classOf[SquaredDistance].getName, "graft_d2"),
      (exprs: Seq[Expression]) => SquaredDistance(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_maybe"),
      new ExpressionInfo(classOf[BloomMightContain].getName,
        "graft_bloom_maybe"),
      (exprs: Seq[Expression]) =>
        BloomMightContain(exprs.head, exprs(1), exprs(2))))
    // optimizer extension: equi-keyless bounded range joins rewrite to bin
    // equi-joins (c10's rewrite, automatic; spark.graft.binnedRangeJoin
    // kill switch)
    ext.injectOptimizerRule(_ => graft.plans.BinnedRangeJoinRule)
  }
}
