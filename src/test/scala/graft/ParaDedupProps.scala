package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import graft.operators.Dedup

/** Brute-force oracle for paragraph-level keep-first dedup: documents are
  * random paragraph lists drawn from a small pool (so cross- and within-
  * document duplicates occur), with random case/whitespace variants (the
  * dedup key is the NORMALIZED paragraph) and blank paragraphs mixed in
  * (structure — they must always survive). The oracle restates the
  * semantics driver-side: winner per normalized paragraph is the smallest
  * (doc, position); every other content instance is removed; documents
  * are rebuilt in original paragraph order.
  */
object ParaDedupProps extends Properties("ParaDedup") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private val paraPool = Vector("alpha beta", "gamma delta", "beta", "epsilon zeta eta")
  private val paraGen: Gen[String] = Gen.frequency(
    6 -> (for {
      base <- Gen.oneOf(paraPool)
      flip <- Gen.oneOf(true, false)
      pad <- Gen.oneOf("", " ", "\t", "  ")
    } yield pad + (if (flip) base.toUpperCase else base)),
    1 -> Gen.oneOf("", " ", "\t "))
  private val docGen: Gen[String] = for {
    n <- Gen.choose(1, 5)
    paras <- Gen.listOfN(n, paraGen)
  } yield paras.mkString("\n")

  private def normalize(t: String) =
    t.toLowerCase.replaceAll("\\s+", " ").trim

  property("dedupParagraphs == keep-first-by-normalized-paragraph, blanks survive") =
    forAllNoShrink(Gen.listOfN(8, docGen)) { texts =>
      val s = spark; import s.implicits._
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = Dedup.dedupParagraphs(rows.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

      // driver-side restatement
      val paras = rows.flatMap { case (id, t) =>
        t.split(java.util.regex.Pattern.quote("\n"), -1).toSeq.zipWithIndex
          .map { case (p, pos) => (id, pos, p) }
      }
      val winners = paras
        .filter { case (_, _, p) => normalize(p).nonEmpty }
        .groupBy { case (_, _, p) => normalize(p) }
        .map { case (_, g) => g.minBy { case (id, pos, _) => (id, pos) } }
        .map { case (id, pos, _) => (id, pos) }.toSet
      val removed = paras.filter { case (id, pos, p) =>
        normalize(p).nonEmpty && !winners((id, pos))
      }.map { case (id, pos, _) => (id, pos) }.toSet
      val want = rows.map { case (id, _) =>
        val kept = paras.filter { case (pid, pos, _) => pid == id && !removed((pid, pos)) }
          .sortBy(_._2).map(_._3)
        val nRemoved = paras.count { case (pid, pos, _) => pid == id && removed((pid, pos)) }
        (id, kept.mkString("\n"), nRemoved.toLong)
      }.toSet
      got == want
    }

  property("againstBaseline == batch semantics restricted to incoming, baseline suppresses") =
    forAllNoShrink(Gen.listOfN(5, docGen), Gen.listOfN(5, docGen)) { (basTexts, incTexts) =>
      val s = spark; import s.implicits._
      val bas = basTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val inc = incTexts.zipWithIndex.map { case (t, i) => (100L + i, t) }
      val got = Dedup.dedupParagraphsAgainstBaseline(
        inc.toDF("doc_id", "text"), bas.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

      val basKeys = bas.flatMap { case (_, t) =>
        t.split(java.util.regex.Pattern.quote("\n"), -1).toSeq.map(normalize)
      }.filter(_.nonEmpty).toSet
      val paras = inc.flatMap { case (id, t) =>
        t.split(java.util.regex.Pattern.quote("\n"), -1).toSeq.zipWithIndex
          .map { case (p, pos) => (id, pos, p) }
      }
      val winners = paras
        .filter { case (_, _, p) => normalize(p).nonEmpty }
        .groupBy { case (_, _, p) => normalize(p) }
        .map { case (_, g) => g.minBy { case (id, pos, _) => (id, pos) } }
        .map { case (id, pos, _) => (id, pos) }.toSet
      val removed = paras.filter { case (id, pos, p) =>
        val k = normalize(p)
        k.nonEmpty && (basKeys(k) || !winners((id, pos)))
      }.map { case (id, pos, _) => (id, pos) }.toSet
      val want = inc.map { case (id, _) =>
        val kept = paras.filter { case (pid, pos, _) => pid == id && !removed((pid, pos)) }
          .sortBy(_._2).map(_._3)
        (id, kept.mkString("\n"),
          paras.count { case (pid, pos, _) => pid == id && removed((pid, pos)) }.toLong)
      }.toSet
      got == want
    }

  property("stripBoilerplate removes exactly the df>=minDf paragraphs, everywhere") =
    forAllNoShrink(Gen.listOfN(8, docGen)) { texts =>
      val s = spark; import s.implicits._
      val minDf = 3
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = Dedup.stripBoilerplate(rows.toDF("doc_id", "text"), minDf = minDf)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

      // driver oracle: DOCUMENT frequency per normalized content paragraph
      // (distinct docs, not instances); every instance of a hot key is
      // removed — including the first — while sub-threshold keys, blanks,
      // and intra-doc-only repeats (df = 1) all survive
      val paras = rows.flatMap { case (id, t) =>
        t.split(java.util.regex.Pattern.quote("\n"), -1).toSeq.zipWithIndex
          .map { case (p, pos) => (id, pos, p) }
      }
      val df = paras.filter { case (_, _, p) => normalize(p).nonEmpty }
        .groupBy { case (_, _, p) => normalize(p) }
        .map { case (k, g) => k -> g.map(_._1).distinct.size }
      val removed = paras.filter { case (_, _, p) =>
        val k = normalize(p); k.nonEmpty && df(k) >= minDf
      }.map { case (id, pos, _) => (id, pos) }.toSet
      val want = rows.map { case (id, _) =>
        val kept = paras.filter { case (pid, pos, _) => pid == id && !removed((pid, pos)) }
          .sortBy(_._2).map(_._3)
        (id, kept.mkString("\n"),
          paras.count { case (pid, pos, _) => pid == id && removed((pid, pos)) }.toLong)
      }.toSet
      got == want
    }

  property("a custom delimiter splits/rebuilds on that delimiter only") =
    forAllNoShrink(Gen.listOfN(6, Gen.listOfN(3, Gen.oneOf(paraPool)))) { docLists =>
      val s = spark; import s.implicits._
      val rows = docLists.zipWithIndex.map { case (ps, i) => (i.toLong, ps.mkString("|")) }
      val got = Dedup.dedupParagraphs(rows.toDF("doc_id", "text"), delim = "|")
        .collect().map(r => (r.getLong(0), r.getString(1))).toMap
      // every surviving paragraph is a first occurrence, in order; blanks
      // are structure and ALWAYS survive (restated here independently of
      // the generator — paraPool happens to never produce blanks, but the
      // oracle must not depend on that)
      val seen = scala.collection.mutable.Set[String]()
      val want = rows.map { case (id, t) =>
        val kept = t.split(java.util.regex.Pattern.quote("|"), -1).filter { p =>
          val k = normalize(p); k.isEmpty || seen.add(k)
        }
        id -> kept.mkString("|")
      }.toMap
      got == want
    }
}
