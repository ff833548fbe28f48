package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import graft.operators.Similarity

/** quantizeInt8 invariants for arbitrary vectors: codes stay in [0, 255],
  * the extremes map to 0 and 255, and dequantization `lo + code·scale`
  * reconstructs every element within half a quantization step.
  */
object QuantizeProps extends Properties("QuantizeInt8") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private val vecGen: Gen[List[Float]] = for {
    n <- Gen.choose(1, 16)
    v <- Gen.listOfN(n, Gen.choose(-100.0f, 100.0f))
  } yield v

  property("codes bounded, extremes pinned, dequant error <= scale/2") =
    forAllNoShrink(vecGen) { vec =>
      val s = spark; import s.implicits._
      val out = Similarity.quantizeInt8(Seq((1L, vec.toArray)).toDF("vec_id", "embedding"))
        .collect().head
      val (lo, hi, codes) = (out.getDouble(1), out.getDouble(2), out.getSeq[Long](3))
      val constant = vec.distinct.size == 1
      val scale = (hi - lo) / 255.0
      val bounded = codes.forall(c => c >= 0L && c <= 255L)
      // lo/hi in the output are ROUNDED to 6; compare against unrounded
      // bounds within that rounding tolerance
      val trueLo = vec.min.toDouble
      val trueHi = vec.max.toDouble
      val pinned = constant || {
        val iLo = vec.indexWhere(_ == vec.min)
        val iHi = vec.indexWhere(_ == vec.max)
        codes(iLo) == 0L && codes(iHi) == 255L
      }
      val err = codes.zip(vec).forall { case (c, x) =>
        constant || math.abs(trueLo + c * (trueHi - trueLo) / 255.0 - x) <= (trueHi - trueLo) / 255.0 / 2 + 1e-6
      }
      bounded && pinned && err && (lo <= hi)
    }
}
