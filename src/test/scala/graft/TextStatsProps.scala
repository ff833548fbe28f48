package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import graft.operators.TextAnalysis

/** Brute-force oracles for the corpus-statistics trio — docFrequency,
  * tfidfTopTerms, unigramLogProb — against engine-free tallies over the
  * same tokenizer. Pins each operator's exact arithmetic (HALF_UP
  * rounding points, the micro-quantized log-prob longs, the per-doc
  * (tfidf desc, token asc) rank order) where the hand fixtures pin only
  * sample values, and does so THROUGH the shared token layer these
  * operators now read.
  */
object TextStatsProps extends Properties("TextStats") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private val vocab = Vector("ant", "bee", "cat", "dog", "elk")
  private val docGen: Gen[String] = for {
    n <- Gen.choose(0, 7)
    ws <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield ws.mkString(" ")

  private def tokensOf(t: String): Seq[String] =
    t.toLowerCase.replaceAll("\\s+", " ").trim.split("\\s+").toSeq.filter(_.nonEmpty)

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def corpusGen: Gen[List[(Long, String)]] =
    Gen.choose(4, 20).flatMap(m => Gen.listOfN(m, docGen))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  property("docFrequency == driver-side distinct-doc tally") =
    forAllNoShrink(corpusGen) { rows =>
      val s = spark; import s.implicits._
      val got = TextAnalysis.docFrequency(rows.toDF("doc_id", "text"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val total = rows.map(_._1).distinct.size.toLong
      val toks = rows.map { case (_, t) => tokensOf(t).distinct }
      val want = toks.flatten.groupBy(identity).map { case (w, g) =>
        (w, g.size.toLong, round6(g.size.toDouble / total))
      }.toSet
      got == want
    }

  property("tfidfTopTerms == driver-side tf·ln(N/df) with per-doc total order") =
    forAllNoShrink(corpusGen) { rows =>
      val s = spark; import s.implicits._
      val k = 3
      val got = TextAnalysis.tfidfTopTerms(rows.toDF("doc_id", "text"), k = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
        .toSet
      val n = rows.map(_._1).distinct.size
      val tf = rows.flatMap { case (id, t) =>
        tokensOf(t).groupBy(identity).map { case (w, g) => (id, w, g.size.toLong) } }
      val df = tf.groupBy(_._2).map { case (w, g) => w -> g.size.toLong }
      val want = tf.map { case (id, w, f) =>
        (id, w, f, round6(f.toDouble * math.log(n.toDouble / df(w).toDouble)))
      }.groupBy(_._1).toSeq.flatMap { case (_, terms) =>
        terms.sortBy { case (_, w, _, sc) => (-sc, w) }.zipWithIndex
          .take(k).map { case ((id, w, f, sc), i) => (id, (i + 1).toLong, w, f, sc) }
      }.toSet
      got == want
    }

  property("unigramLogProb == driver-side micro-quantized corpus LM score") =
    forAllNoShrink(corpusGen) { rows =>
      val s = spark; import s.implicits._
      val got = TextAnalysis.unigramLogProb(rows.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
      val tf = rows.map { case (id, t) =>
        id -> tokensOf(t).groupBy(identity).map { case (w, g) => w -> g.size.toLong } }
      val counts = tf.flatMap(_._2).groupBy(_._1).map { case (w, g) => w -> g.map(_._2).sum }
      val total = counts.values.sum
      val lp = counts.map { case (w, c) =>
        w -> BigDecimal(math.log(c.toDouble / total) * 1000000.0)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong }
      val want = tf.map { case (id, terms) =>
        val nTok = terms.values.sum
        if (nTok == 0L) (id, 0L, None)
        else {
          val slp = terms.map { case (w, f) => f * lp(w) }.sum
          (id, nTok, Some(round6(slp.toDouble / nTok.toDouble / 1000000.0)))
        }
      }.toSet
      got == want
    }

  /** Driver-side mirror of the Jelinek-Mercer bigram LM: add-one unigrams
    * over (T + V + 1), λ = 0.9 interpolation in the engine's exact double
    * operation order, per-event micro-quantization before the long sum.
    */
  private def bigramMirror(rows: List[(Long, String)],
                           train: List[(Long, String)]): Set[(Long, Long, Option[Double])] = {
    def quant(p: Double): Long =
      BigDecimal(math.log(p) * 1000000.0).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val trainToks = train.map { case (_, t) => tokensOf(t) }
    val c1 = trainToks.flatten.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val bigT = c1.values.sum
    val v = c1.size.toLong
    val cb = trainToks.flatMap(tk => tk.zip(tk.drop(1)))
      .groupBy(identity).map { case (p, g) => p -> g.size.toLong }
    def p1(w: String): Double =
      (c1.getOrElse(w, 0L) + 1L).toDouble / (bigT + v + 1L).toDouble
    rows.map { case (id, t) =>
      val tk = tokensOf(t)
      if (tk.isEmpty) (id, 0L, None)
      else {
        val first = quant(p1(tk.head))
        val rest = tk.zip(tk.drop(1)).map { case (a, b) =>
          c1.get(a) match {
            case Some(ca) =>
              quant(0.9 * (cb.getOrElse((a, b), 0L).toDouble / ca.toDouble) +
                (1.0 - 0.9) * p1(b))
            case None => quant(p1(b))
          }
        }
        val slp = first + rest.sum
        (id, tk.size.toLong, Some(round6(slp.toDouble / tk.size.toDouble / 1000000.0)))
      }
    }.toSet
  }

  property("bigramLogProb (self-trained) == driver-side quantized JM mirror") =
    forAllNoShrink(corpusGen) { rows =>
      val s = spark; import s.implicits._
      val got = TextAnalysis.bigramLogProb(rows.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
      got == bigramMirror(rows, rows)
    }

  property("bigramLogProb (reference-trained) == mirror; OOV degrades to add-one unigram") =
    forAllNoShrink(corpusGen) { rows =>
      val s = spark; import s.implicits._
      // reference = even ids only — possibly EMPTY, which must degrade to
      // the uniform model (ln 1 = 0 per event), never NULL-poison
      val train = rows.filter(_._1 % 2 == 0)
      val df = rows.toDF("doc_id", "text")
      val got = TextAnalysis.bigramLogProb(df,
          train = Some(df.filter($"doc_id" % 2 === 0)))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
      got == bigramMirror(rows, train)
    }

  property("perplexityBuckets == mirror rank cut; every doc tiered, nulls last") =
    forAllNoShrink(corpusGen) { rows =>
      val s = spark; import s.implicits._
      val got = TextAnalysis.perplexityBuckets(rows.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          r.getLong(3), r.getString(4))).toSet
      val scored = bigramMirror(rows, rows)
      val n = scored.size.toLong
      val want = scored.toSeq
        .sortBy { case (id, _, lp) => (lp.isEmpty, lp.map(-_).getOrElse(0.0), id) }
        .zipWithIndex.map { case ((id, nt, lp), rank) =>
          val b = rank.toLong * 3L / n
          (id, nt, lp, b, Seq("head", "middle", "tail")(b.toInt))
        }.toSet
      got == want
    }
}
