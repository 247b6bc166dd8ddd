package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Fused, codegen'd band-key signature for [[graft.operators.CosineBands]]:
  * all `b` bands × `r` hyperplane sign bits of a 64-dim `array<float>`
  * embedding in ONE pass, replacing `r·b` interpreted
  * `aggregate(zip_with(...))` higher-order expressions per row (HOF lambdas
  * never enter whole-stage codegen; this does).
  *
  * Bit-for-bit identical to the interpreted formula and the DuckDB oracle:
  * plane q folds `acc += (double)emb[i-1] · w(q,i)` in ascending i with
  * w(q,i) = ±1 from `(i·(73+151q)) mod 97 < 49`, and multiplying a float
  * by ±1.0 is exact in IEEE arithmetic, so the per-plane accumulator (and
  * its `>= 0` sign bit) cannot diverge from the `zip_with` fold.
  *
  * Degenerate inputs mirror the HOF semantics: a vector whose length ≠ 64
  * or with a null element makes every plane's fold NULL in the interpreted
  * form, so every `CASE WHEN null >= 0` bit is 0 — here: all-zero keys.
  */
case class CosinePlaneKeys(child: Expression, r: Int, b: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_plane_keys"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val keys = new Array[Int](b)
    val n = x.numElements()
    var valid = n == 64
    var i = 0
    while (valid && i < n) { if (x.isNullAt(i)) valid = false; i += 1 }
    if (valid) {
      var j = 0
      while (j < b) {
        var k = 0
        while (k < r) {
          val m = 73 + 151 * (j * r + k)
          var acc = 0.0
          var d = 1
          while (d <= 64) {
            val w = if ((d * m) % 97 < 49) 1.0 else -1.0
            acc += x.getFloat(d - 1).toDouble * w
            d += 1
          }
          if (acc >= 0) keys(j) |= 1 << k
          k += 1
        }
        j += 1
      }
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val keys = ctx.freshName("keys")
      val n = ctx.freshName("n")
      val valid = ctx.freshName("valid")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int[] $keys = new int[$b];
         |int $n = $a.numElements();
         |boolean $valid = ($n == 64);
         |for (int $i = 0; $valid && $i < $n; $i++) {
         |  if ($a.isNullAt($i)) $valid = false;
         |}
         |if ($valid) {
         |  for (int $j = 0; $j < $b; $j++) {
         |    for (int $k = 0; $k < $r; $k++) {
         |      int $m = 73 + 151 * ($j * $r + $k);
         |      double $acc = 0.0;
         |      for (int $d = 1; $d <= 64; $d++) {
         |        $acc += (double)$a.getFloat($d - 1) *
         |          ((($d * $m) % 97 < 49) ? 1.0 : -1.0);
         |      }
         |      if ($acc >= 0) $keys[$j] |= 1 << $k;
         |    }
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): CosinePlaneKeys = copy(child = newChild)
}

object CosinePlaneKeys {
  /** Register `graft_plane_keys(emb, r, b)` (r, b must be int literals). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_plane_keys",
      exprs => {
        def lit(e: Expression): Int =
          e.eval(null).asInstanceOf[Number].intValue()
        CosinePlaneKeys(exprs.head, lit(exprs(1)), lit(exprs(2)))
      },
      "scala_udf")
}
