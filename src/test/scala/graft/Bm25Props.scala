package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import graft.operators.Ranking

/** Brute-force oracle for Okapi BM25: random corpora over a small
  * vocabulary, scored by an engine-free restatement of the exact formula
  * the operator documents — same tokenizer (lower, collapse whitespace,
  * trim, split), same term fold order, same `+1` IDF form, same HALF_UP
  * rounding to 6 BEFORE the rank, same (score desc, id asc) total order
  * and positive-score filter. Pins the scoring arithmetic itself, where
  * the hand fixture in RankingSpec pins only a handful of values.
  */
object Bm25Props extends Properties("Bm25") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private val vocab = Vector("ant", "bee", "cat", "dog", "elk", "fox")
  private val docGen: Gen[String] = for {
    n <- Gen.choose(1, 8)
    ws <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield ws.mkString(" ")

  private def tokensOf(t: String): Seq[String] =
    t.toLowerCase.replaceAll("\\s+", " ").trim.split("\\s+").toSeq.filter(_.nonEmpty)

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  property("bm25 == driver-side Okapi restatement (scores, filter, total order)") =
    forAllNoShrink(
      Gen.choose(3, 20).flatMap(m => Gen.listOfN(m, docGen)),
      Gen.choose(1, 3).flatMap(t => Gen.pick(t, vocab :+ "yak"))) { (texts, termsPicked) =>
      val terms = termsPicked.toSeq
      val s = spark; import s.implicits._
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val k1 = 1.2; val b = 0.75; val topK = 5

      val got = Ranking.bm25(rows.toDF("doc_id", "text"), terms, topK = topK)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

      val toks = rows.map { case (id, t) => (id, tokensOf(t)) }
      val n = toks.size
      val sumdl = toks.map(_._2.size.toLong).sum
      val avgdl = sumdl.toDouble / n.toDouble
      val df = terms.map(t => t -> toks.count(_._2.contains(t)).toLong).toMap
      val want = toks.map { case (id, tks) =>
        val dl = tks.size.toDouble
        // same fold order as the operator: terms in the given sequence
        val score = terms.map { t =>
          val tf = tks.count(_ == t).toDouble
          val idf = math.log(1.0 + (n.toDouble - df(t) + 0.5) / (df(t).toDouble + 0.5))
          idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))
        }.reduce(_ + _)
        (id, round6(score))
      }.filter(_._2 > 0.0).sortBy { case (id, sc) => (-sc, id) }.take(topK)

      got == want
    }
}
