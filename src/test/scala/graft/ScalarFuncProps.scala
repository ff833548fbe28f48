package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import graft.operators.TextAnalysis

/** Brute-force oracles for the scalar text functions behind the F-family
  * queries: token counting (the `\w+` word and `\w{1,4}|[^\w\s]`
  * BPE-ish subword regexes, replayed with the same Java patterns),
  * fingerprints (driver-side md5 of the normalized text plus the exact
  * Rabin-Karp fold `acc ← (acc·B + h) mod P` over mod-P token hashes,
  * including the zero fold for token-less documents), and language ID
  * (padded-literal marker counts, argmax with declaration-order
  * tie-break and the "en" floor for zero scores).
  */
object ScalarFuncProps extends Properties("ScalarFunc") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private val P = 2147483647L
  private val B = 1000003L

  private val pieceGen: Gen[String] = Gen.oneOf(
    "the", "la", "der", "el", "de", "cat", "dog!", "a.b", "x9", "...", "??", "word")
  private val textGen: Gen[String] = for {
    m <- Gen.choose(0, 8)
    ps <- Gen.listOfN(m, pieceGen)
    sep <- Gen.oneOf(" ", "  ", " \t ")
  } yield ps.mkString(sep)

  private def tokensOf(t: String): Seq[String] =
    t.toLowerCase.replaceAll("\\s+", " ").trim.split("\\s+").toSeq.filter(_.nonEmpty)

  private def md5hex(t: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hash60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16)

  private def countMatches(t: String, re: String): Long = {
    val m = java.util.regex.Pattern.compile(re).matcher(t)
    var c = 0L; while (m.find()) c += 1; c
  }

  property("tokenCounts == driver-side regex tallies (words and subwords)") =
    forAllNoShrink(Gen.listOfN(12, textGen)) { texts =>
      val s = spark; import s.implicits._
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = TextAnalysis.tokenCounts(rows.toDF("doc_id", "text"))
        .select("doc_id", "n_words", "n_subwords")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = rows.map { case (id, t) =>
        (id, countMatches(t, "\\w+"), countMatches(t, "\\w{1,4}|[^\\w\\s]"))
      }.toSet
      got == want
    }

  property("fingerprints == driver-side md5 + Rabin-Karp fold over mod-P token hashes") =
    forAllNoShrink(Gen.listOfN(12, textGen)) { texts =>
      val s = spark; import s.implicits._
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = TextAnalysis.fingerprints(rows.toDF("doc_id", "text"))
        .select("doc_id", "fp_md5", "fp_roll")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val want = rows.map { case (id, t) =>
        val norm = t.toLowerCase.replaceAll("\\s+", " ").trim
        val roll = tokensOf(t).foldLeft(0L)((acc, tk) => (acc * B + hash60(tk) % P) % P)
        (id, md5hex(norm), roll)
      }.toSet
      got == want
    }

  property("langId == argmax of padded marker counts, declaration order, en floor") =
    forAllNoShrink(Gen.listOfN(12, textGen)) { texts =>
      val s = spark; import s.implicits._
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = TextAnalysis.langId(rows.toDF("doc_id", "text"))
        .select("doc_id", "pred_lang")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val want = rows.map { case (id, t) =>
        val padded = " " + t + " "
        val scores = TextAnalysis.langMarkers.map { case (lang, markers) =>
          lang -> markers.map(m =>
            (padded.length - padded.replace(m, "").length).toLong / m.length).sum
        }
        val best = scores.map(_._2).max
        val pred = scores.collectFirst { case (l, c) if c == best && c > 0 => l }.getOrElse("en")
        (id, pred)
      }.toSet
      got == want
    }
}
