package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import graft.operators.TextAnalysis

/** Brute-force oracle for PMI collocations: adjacent-bigram and unigram
  * counts tallied driver-side over the same tokenizer, PMI restated with
  * the operator's exact operand order
  * (`ln((n_pair/nb) / ((c1/nu)·(c2/nu)))`, HALF_UP round to 6 BEFORE the
  * rank), minCount filter, and the (pmi desc, w1 asc, w2 asc) total
  * order. ASCII vocabulary keeps Java string order identical to Spark's
  * UTF-8 binary sort.
  */
object CollocationsProps extends Properties("Collocations") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private val vocab = Vector("ant", "bee", "cat", "dog")
  private val docGen: Gen[String] = for {
    n <- Gen.choose(0, 6)
    ws <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield ws.mkString(" ")

  private def tokensOf(t: String): Seq[String] =
    t.toLowerCase.replaceAll("\\s+", " ").trim.split("\\s+").toSeq.filter(_.nonEmpty)

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  property("collocations == driver-side PMI tally (counts, rounding, total order)") =
    forAllNoShrink(Gen.choose(5, 25).flatMap(m => Gen.listOfN(m, docGen)),
                   Gen.choose(1L, 3L)) { (texts, minCount) =>
      val s = spark; import s.implicits._
      val k = 10
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = TextAnalysis.collocations(rows.toDF("doc_id", "text"),
          minCount = minCount, k = k)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq

      val toks = rows.map { case (_, t) => tokensOf(t) }
      val uni = toks.flatten.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      val nu = uni.values.sum
      val bi = toks.flatMap(l => l.zip(l.drop(1))).groupBy(identity)
        .map { case (p, g) => p -> g.size.toLong }
      val nb = toks.map(l => math.max(l.size - 1, 0).toLong).sum
      val want = bi.toSeq.filter(_._2 >= minCount).map { case ((w1, w2), np) =>
        val pmi = round6(math.log((np.toDouble / nb) /
          ((uni(w1).toDouble / nu) * (uni(w2).toDouble / nu))))
        (w1, w2, np, pmi)
      }.sortBy { case (w1, w2, _, pmi) => (-pmi, w1, w2) }.take(k)

      got == want
    }
}
