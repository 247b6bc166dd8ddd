package graft

import graft.functions.{MinHashSignature, Moments, WelfordStats}
import graft.multimodal.MediaPipeline
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck laws (SURVEY §5.2.4) for the custom function kernels — pure
  * JVM-level properties, no Spark session needed.
  */
object LawsSpec extends Properties("graft") {

  private val doubles = Gen.listOf(Gen.choose(-1e6, 1e6))

  property("welford: merge of split == reduce of whole (mean/m2 stable)") =
    Prop.forAll(doubles, doubles) { (xs, ys) =>
      val whole = (xs ++ ys).foldLeft(WelfordStats.zero)(WelfordStats.reduce)
      val split = WelfordStats.merge(
        xs.foldLeft(WelfordStats.zero)(WelfordStats.reduce),
        ys.foldLeft(WelfordStats.zero)(WelfordStats.reduce))
      val no = WelfordStats.finish(whole)
      val ns = WelfordStats.finish(split)
      val avgO = no.avg.getOrElse(0.0)
      val avgS = ns.avg.getOrElse(0.0)
      val sdO = no.sd.getOrElse(0.0)
      val sdS = ns.sd.getOrElse(0.0)
      no.n == ns.n && no.avg.isDefined == ns.avg.isDefined &&
        no.sd.isDefined == ns.sd.isDefined &&
        math.abs(avgO - avgS) <= 1e-6 * math.max(1.0, math.abs(avgO)) &&
        math.abs(sdO - sdS) <= 1e-6 * math.max(1.0, sdO)
    }

  property("welford: sd is NULL (None) for n <= 1, like stddev_samp") =
    Prop.forAll(Gen.choose(-1e6, 1e6)) { x =>
      WelfordStats.finish(WelfordStats.zero).sd.isEmpty &&
        WelfordStats.finish(WelfordStats.zero).avg.isEmpty &&
        WelfordStats.finish(
          WelfordStats.reduce(WelfordStats.zero, x)).sd.isEmpty &&
        WelfordStats.finish(
          WelfordStats.reduce(WelfordStats.zero, x)).avg.contains(x)
    }

  property("welford: n counts every element") =
    Prop.forAll(doubles) { xs =>
      xs.foldLeft(WelfordStats.zero)(WelfordStats.reduce).n == xs.length
    }

  property("welford: zero is identity for merge") =
    Prop.forAll(doubles) { xs =>
      val m = xs.foldLeft(WelfordStats.zero)(WelfordStats.reduce)
      WelfordStats.merge(m, WelfordStats.zero) == m &&
        WelfordStats.merge(WelfordStats.zero, m) == m
    }

  private def sig(tokens: Seq[String]): Seq[Long] = {
    val arr = new GenericArrayData(
      tokens.map(t => UTF8String.fromString(t)).toArray[Any])
    MinHashSignature(Literal.create(arr, ArrayType(StringType)), 16)
      .eval(null).asInstanceOf[GenericArrayData].toLongArray().toSeq
  }

  private val tokenSets =
    Gen.nonEmptyListOf(Gen.identifier.map(_.take(8))).map(_.distinct)

  property("minhash: permutation-invariant (set semantics)") =
    Prop.forAll(tokenSets) { ts =>
      sig(ts) == sig(scala.util.Random.shuffle(ts))
    }

  property("minhash: signature of a union is elementwise min") =
    Prop.forAll(tokenSets, tokenSets) { (a, b) =>
      val u = sig((a ++ b).distinct)
      sig(a).zip(sig(b)).map(p => math.min(p._1, p._2)) == u
    }

  property("minhash: equal sets collide on every slot") =
    Prop.forAll(tokenSets) { ts => sig(ts) == sig(ts.reverse) }

  property("fakeDecode: nonempty payload histogram is normalized") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) {
      bs =>
        val h = MediaPipeline.fakeDecode(bs.toArray)
        h.length == 16 && math.abs(h.sum - 1.0) < 1e-9 && h.forall(_ >= 0.0)
    }
}
