package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import graft.functions.GraftFunctions
import graft.operators.Dedup

/** Driver-side mirror of `GraftFunctions.canonicalUrl` driven over
  * adversarial URL parts: scheme case/absence, `www.` variants, empty
  * and multi-segment paths, trailing slashes, tracking and non-tracking
  * params interleaved (including `ref_x`, which shares a prefix with the
  * dropped `ref` but must survive), empty params from `&&` runs, and
  * fragments containing `?`/`/`. The keep-first dedup is checked against
  * a groupBy over the mirrored keys.
  */
object UrlCanonProps extends Properties("UrlCanon") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private val trackingPrefix =
    java.util.regex.Pattern.compile("^(utm_[^=]*|fbclid|gclid|ref)(=|$)")

  private def mirror(u: String): String = {
    val nf = u.trim.toLowerCase.replaceAll("#.*$", "")
    val ns = nf.replaceAll("^https?://", "").replaceAll("^www\\.", "")
    val qi = ns.indexOf('?')
    val path = (if (qi >= 0) ns.substring(0, qi) else ns).replaceAll("/$", "")
    val q = if (qi >= 0) ns.substring(qi + 1) else ""
    val kept = q.split("&", -1).filter(x =>
      x.nonEmpty && !trackingPrefix.matcher(x).find())
    path + (if (kept.nonEmpty) "?" + kept.mkString("&") else "")
  }

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http://", "https://", "HTTP://", "Https://", "")
    www <- Gen.oneOf("", "www.", "WWW.")
    host <- Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(8) + ".com")
    segs <- Gen.choose(0, 3).flatMap(n =>
      Gen.listOfN(n, Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(6))))
    slash <- Gen.oneOf("", "/")
    params <- Gen.choose(0, 4).flatMap(n => Gen.listOfN(n, Gen.oneOf(
      "utm_source=a", "utm_campaign=b", "UTM_TERM=c", "fbclid=z", "gclid=q",
      "ref=r", "ref", "ref_x=1", "id=3", "q=x", "page=2", "")))
    frag <- Gen.oneOf("", "#frag", "#a/b?c=d")
  } yield scheme + www + host +
    (if (segs.nonEmpty) "/" + segs.mkString("/") else "") + slash +
    (if (params.nonEmpty) "?" + params.mkString("&") else "") + frag

  property("canonicalUrl == driver mirror") =
    forAllNoShrink(Gen.choose(1, 8).flatMap(Gen.listOfN(_, urlGen))) { urls =>
      val s = spark; import s.implicits._
      val got = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
        .toDF("doc_id", "url")
        .select(org.apache.spark.sql.functions.col("doc_id"),
          GraftFunctions.canonicalUrl(org.apache.spark.sql.functions.col("url")))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val want = urls.zipWithIndex.map { case (u, i) => i.toLong -> mirror(u) }.toMap
      got == want
    }

  property("urlDedup == keep-first groupBy over mirrored keys") =
    forAllNoShrink(Gen.choose(1, 12).flatMap(Gen.listOfN(_, urlGen))) { urls =>
      val s = spark; import s.implicits._
      val rows = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      val got = Dedup.urlDedup(rows.toDF("doc_id", "url"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val want = rows.groupBy { case (_, u) => mirror(u) }.map { case (k, g) =>
        (g.map(_._1).min, k, g.size.toLong)
      }.toSet
      got == want
    }
}
