package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Streaming-mergeable moments (Welford/Chan): numerically stable mean and
  * sample stddev in one pass. Each partition folds locally (`reduce`) and
  * partial states merge associatively (`merge`) — the map-side-combine shape
  * that scales: the shuffle carries one 24-byte buffer per (partition ×
  * group) regardless of input size.
  */
final case class Moments(n: Long, mean: Double, m2: Double)

final case class MomentsOut(n: Long, avg: Option[Double], sd: Option[Double])

object WelfordStats extends Aggregator[Double, Moments, MomentsOut] {
  override def zero: Moments = Moments(0L, 0.0, 0.0)

  override def reduce(b: Moments, x: Double): Moments = {
    val n = b.n + 1
    val delta = x - b.mean
    val mean = b.mean + delta / n
    Moments(n, mean, b.m2 + delta * (x - mean))
  }

  override def merge(a: Moments, b: Moments): Moments = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val delta = b.mean - a.mean
      val mean = a.mean + delta * b.n / n
      val m2 = a.m2 + b.m2 + delta * delta * a.n * b.n / n
      Moments(n, mean, m2)
    }
  }

  // SQL aggregate semantics: AVG of zero rows is NULL, stddev_samp of
  // fewer than two rows is NULL (matches DuckDB/Spark built-ins — a
  // singleton group must not report sd = 0.0).
  override def finish(r: Moments): MomentsOut =
    MomentsOut(r.n,
      if (r.n > 0) Some(r.mean) else None,
      if (r.n > 1) Some(math.sqrt(r.m2 / (r.n - 1))) else None)

  override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
  override def outputEncoder: Encoder[MomentsOut] =
    Encoders.product[MomentsOut]
}
