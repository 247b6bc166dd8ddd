package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, IntegerType, LongType}

/** A partial (or finished — same shape) Bloom bit array. Byte-typed so the
  * finished sketch IS the broadcastable literal the probe expression takes.
  */
final case class BloomBits(bits: Array[Byte])

/** Bloom filter (Bloom, CACM 1970) over Long keys as a mergeable typed
  * `Aggregator` — the build half of semi-join REDUCTION, the runtime-filter
  * pattern Spark's own AQE applies when it can (`InjectRuntimeFilter`) and
  * this repo needs in explicit form for the paths AQE can't see (a
  * pre-filtered dimension computed mid-query, streaming-static prefilters).
  *
  * Execution shape at 100 TB: each partition folds its keys into a FIXED
  * `numBits`-bit array (`reduce`), partials combine by bitwise OR (`merge`
  * — idempotent and commutative, so task retries cannot skew it), and the
  * only shuffle row is one array of `numBits/8` bytes per partition
  * regardless of key count. The finished array is driver-bounded by
  * construction (16 KiB at the default sizing — the same bounded-model
  * exception as the IVF codebooks) and ships to executors as a literal in
  * [[BloomMightContain]].
  *
  * Hash family: double hashing `h1 + i·h2` (Kirsch–Mitzenmacher, ESA'06 —
  * two hashes simulate k independent ones with no asymptotic FP loss) over
  * two splitmix64 finalizer mixes (Steele et al., public domain constants).
  * Everything is exact 64-bit integer arithmetic, identical in the
  * interpreted and generated probe paths.
  */
class BloomAggregator[IN](key: IN => Long,
    val numBits: Int = Bloom.DefaultBits,
    val numHashes: Int = Bloom.DefaultHashes)
    extends Aggregator[IN, BloomBits, Array[Byte]] {
  require(Integer.bitCount(numBits) == 1 && numBits >= 64,
    s"numBits must be a power of two >= 64, got $numBits")

  override def zero: BloomBits = BloomBits(new Array[Byte](numBits / 8))

  override def reduce(b: BloomBits, in: IN): BloomBits = {
    Bloom.add(b.bits, numHashes, key(in)); b
  }

  override def merge(a: BloomBits, b: BloomBits): BloomBits = {
    val out = new Array[Byte](a.bits.length)
    var i = 0
    while (i < out.length) {
      out(i) = (a.bits(i) | b.bits(i)).toByte; i += 1
    }
    BloomBits(out)
  }

  override def finish(r: BloomBits): Array[Byte] = r.bits
  override def bufferEncoder: Encoder[BloomBits] = Encoders.product[BloomBits]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object Bloom {
  /** 2^17 bits = 16 KiB: FP < 1e-8 at 1k keys, < 0.1% at 10k keys with
    * k=5 — sized for a pre-FILTERED dimension key set, not a raw table.
    */
  val DefaultBits: Int = 1 << 17
  val DefaultHashes: Int = 5

  /** splitmix64 finalizer — must stay bit-identical to the inline Java in
    * [[BloomMightContain.doGenCode]].
    */
  private def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def add(bits: Array[Byte], k: Int, key: Long): Unit = {
    val m = bits.length << 3
    val h1 = mix(key)
    val h2 = mix(key + 0x632BE59BD9B4E019L) | 1L
    var i = 0
    while (i < k) {
      val idx = ((h1 + i * h2) & (m - 1).toLong).toInt
      bits(idx >>> 3) = (bits(idx >>> 3) | (1 << (idx & 7))).toByte
      i += 1
    }
  }

  def mightContain(bits: Array[Byte], k: Int, key: Long): Boolean = {
    val m = bits.length << 3
    val h1 = mix(key)
    val h2 = mix(key + 0x632BE59BD9B4E019L) | 1L
    var i = 0
    while (i < k) {
      val idx = ((h1 + i * h2) & (m - 1).toLong).toInt
      if ((bits(idx >>> 3) & (1 << (idx & 7))) == 0) return false
      i += 1
    }
    true
  }
}

/** `graft_bloom_maybe(key, bits, k)` — the probe half: true iff `key` MIGHT
  * be in the set the bit array was built from (no false negatives ever; the
  * false-positive rate is the sizing trade). This is the hot per-fact-row
  * expression, so unlike the per-document [[WinnowFingerprint]] it carries a
  * real `doGenCode`: the double-hash probe inlines into whole-stage codegen
  * (BinaryType literals materialize as a shared `byte[]` reference, so the
  * generated loop reads the broadcast bits with zero per-row allocation).
  * Interpreted eval delegates to [[Bloom.mightContain]], which implements
  * the identical arithmetic.
  */
case class BloomMightContain(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType, BinaryType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, binary, int), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_maybe"

  override def nullSafeEval(key: Any, bloom: Any, k: Any): Any =
    Bloom.mightContain(bloom.asInstanceOf[Array[Byte]],
      k.asInstanceOf[Int], key.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (key, bl, kk) => {
      val m = ctx.freshName("m")
      val z = ctx.freshName("z")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val i = ctx.freshName("i")
      val idx = ctx.freshName("idx")
      val ok = ctx.freshName("ok")
      // keep bit-identical to Bloom.mix / Bloom.mightContain
      s"""
         |int $m = $bl.length << 3;
         |long $z = $key + 0x9E3779B97F4A7C15L;
         |$z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |$z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
         |long $h1 = $z ^ ($z >>> 31);
         |$z = $key + 0x632BE59BD9B4E019L + 0x9E3779B97F4A7C15L;
         |$z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |$z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
         |long $h2 = ($z ^ ($z >>> 31)) | 1L;
         |boolean $ok = true;
         |for (int $i = 0; $i < $kk; $i++) {
         |  int $idx = (int) (($h1 + $i * $h2) & (long) ($m - 1));
         |  if (($bl[$idx >>> 3] & (1 << ($idx & 7))) == 0) {
         |    $ok = false; break;
         |  }
         |}
         |${ev.value} = $ok;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): BloomMightContain =
    copy(first = f, second = s, third = t)
}

object BloomMightContain {
  /** Idempotently register `graft_bloom_maybe(key, bits, k)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_maybe",
      exprs => BloomMightContain(exprs.head, exprs(1), exprs(2)),
      "scala_udf")
}
