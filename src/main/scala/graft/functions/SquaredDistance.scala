package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd integer squared euclidean distance over two
  * `array<bigint>` columns — the hot kernel of every fixed-point vector
  * path (IVF cell assignment, exact Lloyd training, PQ encoding, ADC
  * lookup tables).
  *
  * Custom-operator tier (b), same rationale as [[DotProduct]]: the
  * `aggregate(zip_with(...))` formulation it replaces is evaluated by
  * interpreted lambda application with one boxed Long per element — at a
  * 200k-vector collection that is 200M boxed ops on the encode path alone,
  * and it measured ~3× the whole-query runtime. This expression stays
  * inside whole-stage codegen: one primitive `long` loop.
  *
  * Semantics are EXACTLY the interpreted fold `Σ (a[i]-b[i])²` over
  * BIGINT: Java long arithmetic in both the interpreted and generated
  * paths, identical overflow wrapping (unreachable at 1e-6 fixed point),
  * null on length mismatch or any null element — so swapping it in cannot
  * move a hash-matched oracle row (SURVEY §5.3).
  */
case class SquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  // null on length mismatch / null elements even for non-null array inputs
  // (matching zip_with's null-padding fold semantics)
  override def nullable: Boolean = true

  override def prettyName: String = "graft_d2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val dd = ctx.freshName("d")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    long $dd = $a.getLong($i) - $b.getLong($i);
         |    $acc += $dd * $dd;
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredDistance =
    copy(left = newLeft, right = newRight)
}

object SquaredDistance {
  /** Idempotently register `graft_d2` for harness entry points that receive
    * an already-built session (the extension path covers everything else).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_d2",
      exprs => SquaredDistance(exprs.head, exprs(1)),
      "scala_udf")
}
