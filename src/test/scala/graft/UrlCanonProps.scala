package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import graft.functions.GraftFunctions
import graft.operators.Dedup

/** Driver-side mirror of `GraftFunctions.canonicalUrl` driven over
  * adversarial URL parts: scheme case/absence, `www.` variants,
  * whitespace padding (space, `\t`, `\r`, `\n`, vertical tab — the char
  * `String.trim` strips but `\s` and Spark's `trim()` disagree on),
  * default and non-default ports (`:80`, `:443`, `:8080`), IDN hosts in
  * unicode and pre-encoded punycode forms, percent-escapes in both hex
  * cases plus truncated/lone `%`, empty and multi-segment paths,
  * trailing slashes, tracking and non-tracking params interleaved
  * (including `ref_x`, which shares a prefix with the dropped `ref` but
  * must survive), empty params from `&&` runs, and fragments containing
  * `?`/`/`. The percent-escape and port rules are reimplemented
  * independently here (regex + callback vs the engine's char scan); the
  * IDN hop necessarily shares `java.net.IDN` with the engine, so this
  * property pins the COMPOSITION (where in the pipeline the host is
  * encoded) while the graded oracle pins the encoder output itself as an
  * embedded literal. The keep-first dedup is checked against a groupBy
  * over the mirrored keys.
  */
object UrlCanonProps extends Properties("UrlCanon") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private val trackingPrefix =
    java.util.regex.Pattern.compile("^(utm_[^=]*|fbclid|gclid|ref)(=|$)")

  private val pctPair = java.util.regex.Pattern.compile("%[0-9a-fA-F]{2}")

  private def mirror(u: String): String = {
    // Locale.ROOT: bare toLowerCase follows the default locale and would
    // fold ASCII "I" to dotless ı on a tr/az JVM, diverging from Spark's
    // locale-free lower() fast path (the DomainProps mirror's rule)
    val nf = u.replaceAll("^\\s+|\\s+$", "")
      .toLowerCase(java.util.Locale.ROOT).replaceAll("#.*$", "")
    val ns = nf.replaceAll("^https?://", "").replaceAll("^www\\.", "")
    val qi = ns.indexOf('?')
    val path0 = (if (qi >= 0) ns.substring(0, qi) else ns)
      .replaceAll("/$", "")
      .replaceAll("^([^/:]+):(80|443)(/|$)", "$1$3")
    val slash = path0.indexOf('/')
    val host = if (slash >= 0) path0.substring(0, slash) else path0
    val path =
      if (host.forall(_ < 0x80)) path0
      else try {
        val enc = java.net.IDN.toASCII(host)
        if (slash >= 0) enc + path0.substring(slash) else enc
      } catch { case _: IllegalArgumentException => path0 }
    val q = if (qi >= 0) ns.substring(qi + 1) else ""
    val kept = q.split("&", -1).filter(x =>
      x.nonEmpty && !trackingPrefix.matcher(x).find())
    val joined = path + (if (kept.nonEmpty) "?" + kept.mkString("&") else "")
    pctPair.matcher(joined).replaceAll(m => m.group().toUpperCase)
  }

  private val urlGen: Gen[String] = for {
    pad <- Gen.oneOf("", " ", "\r", "\t ", " \r\n", "\u000B")
    scheme <- Gen.oneOf("http://", "https://", "HTTP://", "Https://", "")
    www <- Gen.oneOf("", "www.", "WWW.")
    hostBase <- Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(8) + ".com")
    host <- Gen.oneOf(hostBase, "münchen." + hostBase, "xn--mnchen-3ya." + hostBase,
      "büCHER." + hostBase)
    port <- Gen.oneOf("", ":80", ":443", ":8080", ":8443")
    segs <- Gen.choose(0, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(
        Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(6)),
        Gen.oneOf("a%2fb", "a%2Fb", "x%3A", "100%", "%zz", "%a"))))
    slash <- Gen.oneOf("", "/")
    params <- Gen.choose(0, 4).flatMap(n => Gen.listOfN(n, Gen.oneOf(
      "utm_source=a", "utm_campaign=b", "UTM_TERM=c", "fbclid=z", "gclid=q",
      "ref=r", "ref", "ref_x=1", "id=3", "q=x", "page=2", "", "v=%2f", "v=%2F")))
    frag <- Gen.oneOf("", "#frag", "#a/b?c=d")
  } yield pad + scheme + www + host + port +
    (if (segs.nonEmpty) "/" + segs.mkString("/") else "") + slash +
    (if (params.nonEmpty) "?" + params.mkString("&") else "") + frag + pad.reverse

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
