package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import graft.operators.TextAnalysis

/** Brute-force oracles for the training-data hygiene passes:
  *
  *   - `gramRepetition` against a driver-side positional n-gram tally
  *     (`dup_frac = 1 − distinct/total`, zero for short documents);
  *   - `decontaminate` against driver-side distinct-gram intersection
  *     with the benchmark's gram set;
  *   - `qualityBuckets`' BUCKETING against the rank definition it
  *     documents — `bucket = ⌊nBuckets·|{score' < score}|/N⌋` over the
  *     operator's own scores — pinning the histogram prefix-sum + integer
  *     division path (the scoring kernel itself is QualitySignalsProps'
  *     job).
  *
  * Gram comparisons are over token n-gram strings where the operators
  * use 60-bit hashes — identical modulo hash collisions, vanishingly
  * improbable at these sizes.
  */
object TextHygieneProps extends Properties("TextHygiene") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private val vocab = Vector("ant", "bee", "cat", "dog")
  private val docGen: Gen[String] = for {
    m <- Gen.choose(0, 8)
    ws <- Gen.listOfN(m, Gen.oneOf(vocab))
  } yield ws.mkString(" ")

  private def tokensOf(t: String): Seq[String] =
    t.toLowerCase.replaceAll("\\s+", " ").trim.split("\\s+").toSeq.filter(_.nonEmpty)

  private def grams(t: String, n: Int): Seq[String] = {
    val tks = tokensOf(t)
    if (tks.size < n) Seq.empty else tks.sliding(n).map(_.mkString(" ")).toSeq
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def corpusGen: Gen[List[(Long, String)]] =
    Gen.choose(3, 15).flatMap(m => Gen.listOfN(m, docGen))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  property("gramRepetition == driver-side positional gram tally (ns = 2, 3)") =
    forAllNoShrink(corpusGen) { rows =>
      val s = spark; import s.implicits._
      val got = TextAnalysis.gramRepetition(rows.toDF("doc_id", "text"), ns = Seq(2, 3))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))
        .toSet
      val want = rows.map { case (id, t) =>
        def stats(n: Int): (Long, Double) = {
          val g = grams(t, n)
          if (g.isEmpty) (0L, 0.0)
          else (g.size.toLong, round6(1.0 - g.distinct.size.toDouble / g.size))
        }
        val (n2, d2) = stats(2); val (n3, d3) = stats(3)
        (id, n2, d2, n3, d3)
      }.toSet
      got == want
    }

  property("decontaminate == driver-side distinct-gram intersection with the benchmark") =
    forAllNoShrink(corpusGen, Gen.choose(1, 4).flatMap(m => Gen.listOfN(m, docGen))) {
      (rows, benchTexts) =>
        val s = spark; import s.implicits._
        val bench = benchTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        val got = TextAnalysis.decontaminate(
            rows.toDF("doc_id", "text"), bench.toDF("doc_id", "text"), n = 3)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
        val benchGrams = bench.flatMap { case (_, t) => grams(t, 3) }.toSet
        val want = rows.map { case (id, t) =>
          val g = grams(t, 3).distinct
          val hits = g.count(benchGrams.contains).toLong
          (id, g.size.toLong, hits, hits > 0L)
        }.toSet
        got == want
    }

  property("contaminationReport == driver-side per-benchmark exposure tally") =
    forAllNoShrink(corpusGen, Gen.choose(1, 4).flatMap(m => Gen.listOfN(m, docGen))) {
      (rows, benchTexts) =>
        val s = spark; import s.implicits._
        val bench = benchTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        val got = TextAnalysis.contaminationReport(
            rows.toDF("doc_id", "text"), bench.toDF("doc_id", "text"), n = 3)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getDouble(4))).toSet
        val corpusSets = rows.map { case (id, t) => id -> grams(t, 3).toSet }
        val allCorpus = corpusSets.flatMap(_._2).toSet
        val want = bench.map { case (bid, t) =>
          val g = grams(t, 3).distinct
          val hits = g.count(allCorpus.contains).toLong
          val nDocs = corpusSets.count { case (_, cs) => g.exists(cs.contains) }.toLong
          val frac = if (g.isEmpty) 0.0 else round6(hits.toDouble / g.size.toLong)
          (bid, g.size.toLong, hits, nDocs, frac)
        }.toSet
        got == want
    }

  property("qualityBuckets == rank definition over the operator's own scores") =
    forAllNoShrink(corpusGen, Gen.choose(1, 5)) { (rows, nBuckets) =>
      val s = spark; import s.implicits._
      val docs = rows.toDF("doc_id", "text")
      val scores = TextAnalysis.qualityScore(docs)
        .select("doc_id", "quality_score")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val got = TextAnalysis.qualityBuckets(docs, nBuckets = nBuckets)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
      val n = scores.size.toLong
      val want = scores.map { case (id, sc) =>
        val lt = scores.values.count(_ < sc).toLong
        (id, sc, nBuckets * lt / n)
      }.toSet
      got == want
    }

  // C4 line cleaning: random multi-line pages mixing terminated /
  // unterminated / blocklisted / short lines, with occasional page-level
  // poison ("lorem ipsum", a brace) — mirrored by a direct driver filter
  // endings include \r and \t so CRLF pages ("." + "\r" after the \n
  // split) exercise the whitespace-class trim — Spark trim() strips only
  // ASCII spaces and would fail the terminal-punctuation test here
  private val lineGen: Gen[String] = for {
    nw <- Gen.choose(0, 5)
    ws <- Gen.listOfN(nw, Gen.oneOf(vocab :+ "javascript"))
    end <- Gen.oneOf(".", "!", "?", "\"", "", " ", "x", ".\r", "!\t", "\r", "\t.")
  } yield ws.mkString(" ") + end
  private val pageGen: Gen[String] = for {
    nl <- Gen.choose(0, 6)
    ls <- Gen.listOfN(nl, lineGen)
    poison <- Gen.frequency(8 -> "", 1 -> "\nlorem ipsum dolor", 1 -> "\nif (x) { y }")
  } yield ls.mkString("\n") + poison

  property("sourceCap == per-stratum top-k over the operator's own scores") =
    forAllNoShrink(corpusGen, Gen.choose(1, 4)) { (rows, k) =>
      val s = spark; import s.implicits._
      val docs = rows.map { case (id, t) => (id, s"s${id % 3}", t) }
        .toDF("doc_id", "source", "text")
      val scores = TextAnalysis.qualityScore(docs)
        .select("doc_id", "quality_score")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val got = TextAnalysis.sourceCap(docs, k = k)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSet
      val want = rows.map(_._1).groupBy(id => s"s${id % 3}").toSeq.flatMap { case (src, ids) =>
        ids.sortBy(id => (-scores(id), id)).take(k).zipWithIndex
          .map { case (id, i) => (id, src, scores(id), (i + 1).toLong) }
      }.toSet
      got == want
    }

  property("c4LineClean == driver-side line filter + page gates") =
    forAllNoShrink(Gen.choose(2, 12).flatMap(m => Gen.listOfN(m, pageGen))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })) { rows =>
      val s = spark; import s.implicits._
      val got = TextAnalysis.c4LineClean(rows.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      val want = rows.flatMap { case (id, text) =>
        val lines = text.split("\n", -1).toSeq
        val kept = lines.filter { l =>
          val t = l.trim
          t.nonEmpty && ".!?\"".contains(t.last) &&
            t.split("\\s+").count(_.nonEmpty) >= 3 &&
            !l.toLowerCase.contains("javascript")
        }
        val lo = text.toLowerCase
        if (lo.contains("lorem ipsum") || lo.contains("{") || kept.size < 2) None
        else Some((id, kept.mkString("\n"), lines.size.toLong, kept.size.toLong))
      }.toSet
      got == want
    }
}
