package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** A finished (or partial — same shape) HyperLogLog sketch: `M` registers,
  * each the max rank (`rho`) seen in its bucket. Long-typed for encoder
  * simplicity; values fit in 6 bits.
  */
final case class HllSketch(registers: Array[Long])

/** (source, token) element for the grouped per-key sketch (j48). */
final case class SrcTok(source: String, tok: String)

/** HyperLogLog (Flajolet et al., AofA'07) as a mergeable typed `Aggregator`
  * — the cardinality twin of [[CountMinSketch]]'s frequency sketch, and the
  * execution shape that matters at 100 TB: each partition folds its stream
  * into 256 byte-sized registers (`reduce`), partials combine by
  * element-wise max (`merge` — idempotent AND commutative, so task retries
  * and speculative duplicates cannot skew it, unlike a count), and the only
  * shuffle row is one fixed 256-entry array per partition regardless of
  * input size. `approx_count_distinct` is Spark's built-in HLL++; this one
  * exists where the SKETCH ITSELF is the product — persisted per day/shard
  * and re-merged across arbitrary slices later without rescanning data —
  * and where the register derivation must be auditable.
  *
  * Hash family (deliberately md5-hex-reproducible, like CMS, so a DuckDB
  * oracle can derive the registers EXACTLY): for element t,
  * `h = md5("hll:" + t)` as 32 hex chars; bucket = first byte (2 hex chars,
  * 0..255); rho = 1 + leading-zero-bits of the NEXT 32 bits (hex chars
  * 3..10), or 33 if those bits are all zero. Both engines compute rho with
  * exact integer/string ops — no floating point anywhere in the registers.
  */
class HllAggregator[IN](elem: IN => String)
    extends Aggregator[IN, HllSketch, HllSketch] {
  import HyperLogLog.M

  override def zero: HllSketch = HllSketch(new Array[Long](M))

  override def reduce(b: HllSketch, in: IN): HllSketch = {
    val (bucket, rho) = HyperLogLog.bucketRho(elem(in))
    if (rho > b.registers(bucket)) b.registers(bucket) = rho
    b
  }

  override def merge(a: HllSketch, b: HllSketch): HllSketch = {
    val out = new Array[Long](M)
    var i = 0
    while (i < M) {
      out(i) = math.max(a.registers(i), b.registers(i)); i += 1
    }
    HllSketch(out)
  }

  override def finish(r: HllSketch): HllSketch = r

  override def bufferEncoder: Encoder[HllSketch] = Encoders.product[HllSketch]
  override def outputEncoder: Encoder[HllSketch] = Encoders.product[HllSketch]
}

object HyperLogLog extends HllAggregator[String](identity) {
  /** 256 buckets (b=8): standard error 1.04/√256 ≈ 6.5% — the classic
    * accuracy/size trade; the sketch is 256 bytes of real state.
    */
  val M = 256

  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Exactly the oracle's derivation: bucket from the first digest byte,
    * rho from the next 32 bits. `numberOfLeadingZeros` on the 32-bit value
    * equals the hex-string count (4 per leading '0' char + the first
    * nonzero nibble's own leading zeros) the SQL side uses.
    */
  def bucketRho(t: String): (Int, Int) = {
    val d = md5.get().digest(s"hll:$t".getBytes("UTF-8"))
    val bucket = d(0) & 0xff
    val bits = ((d(1) & 0xffL) << 24) | ((d(2) & 0xffL) << 16) |
      ((d(3) & 0xffL) << 8) | (d(4) & 0xffL)
    val rho =
      if (bits == 0L) 33 else Integer.numberOfLeadingZeros(bits.toInt) + 1
    (bucket, rho)
  }

  /** Cardinality estimate: alpha·m²/Σ2^-reg with the small-range linear
    * counting correction (E ≤ 2.5m with empty registers). The 32-bit
    * large-range correction is omitted — irrelevant below ~10⁸ distinct,
    * and the register layout supports adding it without a data change.
    */
  def estimate(sk: HllSketch): Double = {
    val m = M.toDouble
    val alpha = 0.7213 / (1 + 1.079 / m)
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      val r = sk.registers(i)
      sum += java.lang.Math.scalb(1.0, -r.toInt)
      if (r == 0L) zeros += 1
      i += 1
    }
    val e = alpha * m * m / sum
    if (e <= 2.5 * m && zeros > 0) m * math.log(m / zeros.toDouble) else e
  }
}

/** Grouped variant: per-key distinct cardinality (j48) — the production
  * shape ("distinct users per event_type/day" over a 100-TB stream) where
  * each key's shuffle row is one 256-entry register array, never a
  * distinct-value set.
  */
object HyperLogLogBySource extends HllAggregator[SrcTok](_.tok)
