package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import graft.operators.Dedup

/** Brute-force oracle for exact dedup: texts generated with random case
  * and random whitespace (spaces/tabs/newlines, leading/trailing) must
  * dedup by the NORMALIZED form — lower-case, whitespace runs collapsed
  * to one space, trimmed — with the min-id row surviving, the md5-hex
  * fingerprint matching a driver-side digest of the normalized text, and
  * n_copies counting every variant. Pins the normalization semantics
  * (the fingerprint contract every inter-run/streaming dedup shares)
  * against an engine-free restatement.
  */
object ExactDedupProps extends Properties("ExactDedup") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private val wordGen = Gen.oneOf("alpha", "Beta", "GAMMA", "delta")
  private val wsGen = Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
  private val textGen: Gen[String] = for {
    n <- Gen.choose(1, 4)
    words <- Gen.listOfN(n, for {
      w <- wordGen
      flip <- Gen.oneOf(true, false)
    } yield if (flip) w.toUpperCase else w.toLowerCase)
    seps <- Gen.listOfN(n + 1, wsGen)
    lead <- Gen.oneOf("", " ", "\t")
  } yield lead + words.zip(seps).map { case (w, s) => w + s }.mkString

  private def normalize(t: String) =
    t.toLowerCase.replaceAll("\\s+", " ").trim

  private def md5hex(t: String) =
    java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString

  property("exact == group-by-normalized-text, min-id survivor, md5 fingerprint") =
    forAllNoShrink(Gen.listOfN(25, textGen)) { texts =>
      val s = spark; import s.implicits._
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = Dedup.exact(rows.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      val want = rows.groupBy { case (_, t) => normalize(t) }.map { case (norm, g) =>
        val survivor = g.minBy(_._1)
        (survivor._1, survivor._2, md5hex(norm), g.size.toLong)
      }.toSet
      got.length == want.size && got.toSet == want
    }

  // exact() with the text projected away runs under MinMaxByPayloadPruning
  // (the payload narrows, the plan changes — PayloadPruningSpec asserts the
  // shape); this property pins the PRUNED plan's RESULTS to the same
  // driver-side ground truth as the full form, so the rule can never flip
  // a survivor or a count. Replaces the retired hand-slimmed exactSlim.
  property("exact minus the text column (pruned payload) == ground-truth survivors") =
    forAllNoShrink(Gen.listOfN(25, textGen), Gen.listOfN(25, Gen.alphaLowerStr.map(_.take(3)))) {
      (texts, metas) =>
        val s = spark; import s.implicits._
        val rows = texts.zip(metas).zipWithIndex.map { case ((t, m), i) => (i.toLong, t, m) }
        val df = rows.toDF("doc_id", "text", "meta")
        val slim = Dedup.exact(df)
          .select("doc_id", "meta", "fp", "n_copies")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        val want = rows.groupBy { case (_, t, _) => normalize(t) }.map { case (norm, g) =>
          val survivor = g.minBy(_._1)
          (survivor._1, survivor._3, md5hex(norm), g.size.toLong)
        }.toSet
        slim.length == want.size && slim.toSet == want
    }

  property("an input already carrying a reserved output column fails fast, any case") =
    forAllNoShrink(
      Gen.listOfN(3, textGen),
      Gen.oneOf("fp", "FP", "Fp", "n_copies", "N_COPIES", "N_Copies")) { (texts, reserved) =>
      // Spark resolves column names case-insensitively by default, so `FP`
      // would be silently REPLACED by the fingerprint withColumn (and an
      // input `N_COPIES` would collide with the appended count) — the
      // guard must catch every casing, not just the exact spelling
      val s = spark; import s.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t, s"v$i") }
        .toDF("doc_id", "text", reserved)
      scala.util.Try(Dedup.exact(df)).isFailure
    }
}
