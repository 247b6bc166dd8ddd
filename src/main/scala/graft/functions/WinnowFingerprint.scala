package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint set of a document (Schleimer/Wilkerson/Aiken):
  * Karp-Rabin rolling hashes of every k-gram — the O(n) recurrence
  * h' = (h − c_out·B^(k−1))·B + c_in (mod M) — then the minimum of every
  * w-window of those hashes, distinct, in first-occurrence order.
  *
  * Why a native expression (custom-operator tier b): a rolling hash is a
  * loop-carried dependency — each hash is derived from the PREVIOUS one —
  * which no SQL higher-order function expresses without redoing the O(k)
  * polynomial per position (the O(n·k) form the DuckDB oracle uses for the
  * cross-check; modular arithmetic is associative so both derivations
  * produce identical residues). This replaces the one Scala UDF the
  * fingerprint path carried: same residues, same window minima, but
  * registered as a Catalyst expression like its siblings (DotProduct,
  * MinHashSignature), keeping the UDF surface to the single intentional
  * k1 demonstration.
  *
  * CodegenFallback is deliberate and matches [[MinHashSignature]]: the
  * expression runs once per DOCUMENT, so per-call overhead is noise next
  * to the fused O(n) loop inside.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  private val B = 257L
  private val M = 1000000007L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(v: Any): Any = {
    // UTF-16 char values, exactly like the oracle's ascii() on this
    // ASCII corpus (and like the UDF this expression replaced)
    val text = v.asInstanceOf[UTF8String].toString
    val n = text.length
    val p = n - k + 1
    if (p < w) return new GenericArrayData(Array.empty[Long])
    val topPow = { var q = 1L; var j = 1
      while (j < k) { q = q * B % M; j += 1 }; q }
    val hs = new Array[Long](p)
    var h = 0L
    var j = 0
    while (j < k) { h = (h * B + text.charAt(j)) % M; j += 1 }
    hs(0) = h
    var i = 1
    while (i < p) {
      h = ((h - text.charAt(i - 1) * topPow % M + M * 127) % M * B +
        text.charAt(i + k - 1)) % M
      hs(i) = h
      i += 1
    }
    // distinct w-window minima, first-occurrence order
    val seen = new java.util.LinkedHashSet[Long]()
    i = 0
    while (i + w <= p) {
      var mn = hs(i)
      j = i + 1
      while (j < i + w) { if (hs(j) < mn) mn = hs(j); j += 1 }
      seen.add(mn)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): WinnowFingerprint =
    copy(child = c)
}

object WinnowFingerprint {
  /** Reject non-literal / non-int k and w with a NAMED analysis error
    * instead of the opaque ClassCastException/NPE a blind
    * `eval().asInstanceOf[Int]` throws on e.g. `graft_winnow(text, 5L, w)`
    * or a column argument.
    */
  private def literalInt(e: Expression, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    // constant-foldable int expressions (4+4, CAST(8 AS INT)) are fixed
    // at plan time too — keep accepting them as the eval()-based builder
    // did, just never a column reference or a non-int type
    case other if other.foldable && other.dataType == IntegerType =>
      other.eval().asInstanceOf[Int]
    case other =>
      throw new IllegalArgumentException(
        s"graft_winnow requires a literal INT for '$arg' " +
          s"(the window shape must be fixed at plan time); got: ${other.sql}")
  }

  /** Register `graft_winnow(text, k, w)` (k and w must be literal ints). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_winnow",
      exprs => WinnowFingerprint(exprs.head,
        literalInt(exprs(1), "k"),
        literalInt(exprs(2), "w")),
      "scala_udf")
}
