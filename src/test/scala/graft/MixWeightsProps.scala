package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import graft.operators.Ranking

/** Brute-force and structural invariants for the training-mix family.
  *
  * mixWeights: per-stratum counts, share/weight ppm (IEEE doubles in the
  * operator's own operand order, HALF_UP at ppm scale) and the exact
  * integral sampled_tokens floor re-derived driver-side — including a
  * NULL stratum, which groupBy groups and the join half must keep.
  *
  * applyMixWeights: every document appears ⌊w⌋ or ⌊w⌋+1 times with dense
  * copy indices 0..n-1 (expected multiplicity exactly w via the hash
  * gate — not re-derived, the structural bound is what callers rely on),
  * re-running is bit-identical (seedless determinism), and null-strata
  * documents survive the null-safe join.
  */
object MixWeightsProps extends Properties("MixWeights") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private val docGen = for {
    lang <- Gen.frequency(8 -> Gen.oneOf("en", "fr", "de").map(Option(_)),
      1 -> Gen.const(Option.empty[String]))
    nTok <- Gen.choose(1, 9)
  } yield (lang, List.fill(nTok)("w").mkString(" "))
  private val corpusGen = Gen.listOfN(24, docGen)

  private def corpusDf(rows: List[(Option[String], String)]) = {
    val s = spark; import s.implicits._
    rows.zipWithIndex.map { case ((l, t), i) => (i.toLong, l, t) }
      .toDF("doc_id", "lang", "text")
  }

  private def halfUpPpm(x: Double): Long =
    java.math.BigDecimal.valueOf(x * 1000000.0)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  property("mixWeights == driver-side share/weight/sampled computation (incl. NULL stratum)") =
    forAllNoShrink(corpusGen) { rows =>
      val maxUp = 5.0
      val got = Ranking.mixWeights(corpusDf(rows), Seq("lang"))
        .collect().map { r =>
          (if (r.isNullAt(0)) None else Some(r.getString(0))) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
        }.toMap
      val strata = rows.groupBy(_._1).map { case (l, g) =>
        l -> (g.size.toLong, g.map(_._2.split("\\s+").count(_.nonEmpty).toLong).sum)
      }
      val total = strata.values.map(_._2).sum
      val nStrata = strata.size
      val want = strata.map { case (l, (nDocs, nTokens)) =>
        val share = halfUpPpm(nTokens.toDouble / total)
        val weight = halfUpPpm(math.min(maxUp, (total.toDouble / nStrata) / nTokens))
        l -> ((nDocs, nTokens, share, weight, weight * nTokens / 1000000L))
      }
      got == want
    }

  property("mixTemperature == driver-side exp(α·ln n) quantized flattening (incl. NULL stratum)") =
    forAllNoShrink(corpusGen, Gen.oneOf(0.5, 0.7, 1.0)) { (rows, alpha) =>
      val got = Ranking.mixTemperature(corpusDf(rows), Seq("lang"), alpha = alpha)
        .collect().map { r =>
          (if (r.isNullAt(0)) None else Some(r.getString(0))) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
        }.toMap
      val strata = rows.groupBy(_._1).map { case (l, g) =>
        l -> (g.size.toLong, g.map(_._2.split("\\s+").count(_.nonEmpty).toLong).sum)
      }
      val total = strata.values.map(_._2).sum
      val qs = strata.map { case (l, (_, n)) =>
        l -> (if (n == 0L) 0L
              else java.math.BigDecimal.valueOf(
                math.exp(alpha * math.log(n.toDouble)) * 1000000.0)
                .setScale(0, java.math.RoundingMode.HALF_UP).longValue())
      }
      val qSum = qs.values.sum
      def halfUp(x: Double): Long = java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      val want = strata.map { case (l, (nDocs, nTokens)) =>
        val q = qs(l)
        l -> ((nDocs, nTokens,
          if (total > 0) halfUpPpm(nTokens.toDouble / total) else 0L,
          if (qSum > 0) halfUp(q.toDouble * 1000000.0 / qSum) else 0L,
          if (qSum > 0) halfUp(q.toDouble * total / qSum) else 0L))
      }
      got == want
    }

  // α = 1 must reproduce the natural distribution: temp share == share
  property("mixTemperature at α = 1 leaves shares within 1 ppm of natural") =
    forAllNoShrink(corpusGen) { rows =>
      Ranking.mixTemperature(corpusDf(rows), Seq("lang"), alpha = 1.0)
        .collect().forall(r => math.abs(r.getLong(3) - r.getLong(4)) <= 1L)
    }

  property("applyMixWeights: per-doc multiplicity in {⌊w⌋, ⌊w⌋+1}, dense copies, deterministic") =
    forAllNoShrink(corpusGen, Gen.oneOf(300000L, 1000000L, 1700000L, 3200000L)) { (rows, wPpm) =>
      val s = spark; import s.implicits._
      val docs = corpusDf(rows)
      val weights = rows.map(_._1).distinct
        .map(l => (l, wPpm)).toDF("lang", "weight_ppm")
      def run() = Ranking.applyMixWeights(docs, weights, Seq("lang"))
        .collect().map(r => (r.getLong(0), r.getLong(3))).toList // (doc_id, copy)
      val out = run()
      val whole = wPpm / 1000000L
      val byDoc = out.groupBy(_._1)
      byDoc.size <= rows.size &&
        // every input document appears when w >= 1 (full copies survive)
        (whole < 1 || byDoc.size == rows.size) &&
        byDoc.values.forall { copies =>
          val n = copies.size.toLong
          (n == whole || n == whole + 1) &&
            copies.map(_._2).sorted == (0L until n).toList
        } &&
        out == run() // seedless: bit-identical on re-run
    }
}
