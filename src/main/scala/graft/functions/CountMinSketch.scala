package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** A finished (or partial — the two are the same shape) Count-Min sketch:
  * `Depth × Width` cells flattened row-major into one long array.
  */
final case class CmsSketch(cells: Array[Long])

/** Count-Min sketch (Cormode & Muthukrishnan, J.Alg'05) as a mergeable typed
  * `Aggregator` — the execution shape that makes the sketch worth having at
  * 100 TB: each partition folds its token stream into a local 1,024-cell
  * array (`reduce`), partials merge by cell-wise sum (`merge`), so the
  * shuffle carries ONE fixed-size sketch row per partition regardless of
  * corpus size — never a per-distinct-token row (the exact vocabulary
  * aggregate j22 pays per distinct token; this pays a constant).
  *
  * The hash family is bit-identical to the j41 exact-derived sketch (and its
  * DuckDB oracle): row r's bucket for token t is the first byte of
  * md5("cm" + r + ":" + t) — the first two hex chars of the digest read as a
  * base-16 number, which is exactly `digest(0) & 0xff`. That makes the
  * Aggregator's output cell-for-cell comparable against the SQL derivation,
  * which is the QueriesSpec differential.
  */
class CmsAggregator[IN](elem: IN => String)
    extends Aggregator[IN, CmsSketch, CmsSketch] {
  import CountMinSketch.{Depth, Width}

  override def zero: CmsSketch = CmsSketch(new Array[Long](Depth * Width))

  override def reduce(b: CmsSketch, in: IN): CmsSketch = {
    val bs = CountMinSketch.buckets(elem(in))
    var r = 0
    while (r < Depth) { b.cells(r * Width + bs(r)) += 1L; r += 1 }
    b
  }

  override def merge(a: CmsSketch, b: CmsSketch): CmsSketch = {
    val out = new Array[Long](Depth * Width)
    var i = 0
    while (i < out.length) { out(i) = a.cells(i) + b.cells(i); i += 1 }
    CmsSketch(out)
  }

  override def finish(r: CmsSketch): CmsSketch = r

  override def bufferEncoder: Encoder[CmsSketch] = Encoders.product[CmsSketch]
  override def outputEncoder: Encoder[CmsSketch] = Encoders.product[CmsSketch]
}

object CountMinSketch extends CmsAggregator[String](identity) {
  val Depth = 4
  val Width = 256

  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** The d bucket indices of one token — shared by reduce and estimate. */
  private[graft] def buckets(tok: String): Array[Int] = {
    val m = md5.get()
    Array.tabulate(Depth) { r =>
      m.reset()
      m.digest(s"cm$r:$tok".getBytes("UTF-8"))(0) & 0xff
    }
  }

  /** Point estimate: min over rows of the token's bucket — can only
    * OVERcount (collisions add, never subtract; the j41 invariant).
    */
  def estimate(sk: CmsSketch, tok: String): Long = {
    val bs = buckets(tok)
    var est = Long.MaxValue
    var r = 0
    while (r < Depth) {
      est = math.min(est, sk.cells(r * Width + bs(r))); r += 1
    }
    est
  }
}

/** Grouped variant: per-key frequency sketch (j51's input — the table a
  * daily shard job persists), same hash family so slices stay cell-for-cell
  * comparable and their cell-wise sum IS the global sketch.
  */
object CountMinSketchBySource extends CmsAggregator[SrcTok](_.tok)
