package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import graft.operators.{Sketches, TextAnalysis}

/** Brute-force oracles for the percentile gate and the seedless
  * hash-membership samplers:
  *
  *   - `percentilesWithGate` vs driver-side `percentile_cont` linear
  *     interpolation (and both gates must hold: the quantile sketch at
  *     accuracy 10⁴ and HLL++'s sparse mode are exact at these sizes);
  *   - `stratifiedSample` membership vs a driver-side md5-based `hash60`
  *     decision (`pmod(hash60(stratum:id), 10⁶) < ⌊rate·10⁶⌋`, NULL
  *     stratum hashing as the empty stratum at defaultRate);
  *   - `sampleNPerStratum` vs per-stratum (hash-rank, id) order take-n.
  */
object SketchSampleProps extends Properties("SketchSample") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def hash60(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)

  // Spark's own interpolation expression (Percentile.getPercentile):
  // lower·(higher−pos) + higher·(pos−lower) — algebraically the usual
  // lo + frac·(hi−lo) but a DIFFERENT fp formulation, and round6 can
  // differ in the last digit between the two
  private def pctCont(sorted: IndexedSeq[Double], p: Double): Double = {
    val pos = p * (sorted.size - 1)
    val lo = math.floor(pos).toInt; val hi = math.ceil(pos).toInt
    if (lo == hi) sorted(lo)
    else sorted(lo) * (hi - pos) + sorted(hi) * (pos - lo)
  }

  // the approx_ok gate itself is NOT asserted: percentile_approx returns
  // an actual element while the exact p50 interpolates, so a small
  // even-sized group with widely spaced middle values makes the gate
  // legitimately false — on the registry's real distributions it holds,
  // but it is no universal law
  property("percentilesWithGate == driver-side percentile_cont (exact p50/p95)") =
    forAllNoShrink(Gen.choose(1, 40).flatMap(m => Gen.listOfN(m,
      Gen.zip(Gen.choose(1, 3), Gen.choose(-1000, 1000).map(_ / 10.0))))) { rows =>
      val s = spark; import s.implicits._
      val got = Sketches.percentilesWithGate(rows.toDF("g", "v"), Seq("g"), "v")
        .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSet
      val want = rows.groupBy(_._1).map { case (g, vs) =>
        val sorted = vs.map(_._2).sorted.toIndexedSeq
        (g, round6(pctCont(sorted, 0.5)), round6(pctCont(sorted, 0.95)))
      }.toSet
      got == want
    }

  private val stratumGen: Gen[Option[String]] =
    Gen.oneOf(Some("en"), Some("fr"), Some("de"), None)

  property("stratifiedSample membership == driver-side hash60 gate (incl. NULL stratum)") =
    forAllNoShrink(
      Gen.choose(5, 40).flatMap(m => Gen.listOfN(m, stratumGen)),
      Gen.mapOf(Gen.zip(Gen.oneOf("en", "fr", "de"), Gen.oneOf(0.0, 0.25, 0.5, 1.0))),
      Gen.oneOf(0.0, 0.5, 1.0)) { (strata, rates, defaultRate) =>
      val s = spark; import s.implicits._
      val rows = strata.zipWithIndex.map { case (st, i) => (i.toLong, st.orNull) }
      val got = TextAnalysis.stratifiedSample(
          rows.toDF("doc_id", "lang"), rates, defaultRate = defaultRate)
        .collect().map(_.getLong(0)).toSet
      val want = rows.filter { case (id, st) =>
        val rate = Option(st).flatMap(rates.get).getOrElse(defaultRate)
        val bucket = hash60(Option(st).getOrElse("") + ":" + id) % 1000000L
        bucket < (rate * 1e6).toLong
      }.map(_._1).toSet
      got == want
    }

  property("sampleNPerStratum == per-stratum (hash-rank, id) order take-n") =
    forAllNoShrink(
      Gen.choose(5, 40).flatMap(m => Gen.listOfN(m, stratumGen)),
      Gen.choose(1, 4)) { (strata, n) =>
      val s = spark; import s.implicits._
      val rows = strata.zipWithIndex.map { case (st, i) => (i.toLong, st.orNull) }
      val got = TextAnalysis.sampleNPerStratum(rows.toDF("doc_id", "lang"), n = n)
        .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2))).toSet
      val want = rows.groupBy(_._2).toSeq.flatMap { case (_, g) =>
        g.map { case (id, st) =>
          (id, st, hash60(Option(st).getOrElse("") + ":" + id) % 1000000000L) }
          .sortBy { case (id, _, rk) => (rk, id) }
          .take(n).zipWithIndex
          .map { case ((id, st, _), i) => (id, Option(st), (i + 1).toLong) }
      }.toSet
      got == want
    }
}
