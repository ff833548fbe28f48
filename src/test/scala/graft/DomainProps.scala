package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import graft.functions.GraftFunctions

/** Driver-side mirror of `GraftFunctions.registrableDomain` driven over
  * adversarial URLs: scheme case/absence, userinfo (with and without a
  * password and with `@` appearing again in the path), default and odd
  * ports (including a bare trailing `:`), trailing FQDN dots, IPv4
  * literals, unicode and pre-encoded punycode IDN labels at both the
  * subdomain and the REGISTRABLE position, hosts that are exactly a
  * public suffix, deep subdomain chains, single-label hosts, empty
  * hosts (scheme-relative `//` or a bare `?query`), and whitespace
  * padding incl. the `\u000B` char Java's `\s` and RE2's disagree on.
  * The suffix-selection logic is reimplemented independently here
  * (string ops over split labels vs the engine's Column branches); the
  * suffix LISTS are shared with the engine by design — the compiled-in
  * core IS the contract, so the property pins the selection rule and
  * the graded oracle pins the interpolated literals.
  */
object DomainProps extends Properties("Domain") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private val suf2 = GraftFunctions.publicSuffixes2.toSet
  private val suf3 = GraftFunctions.publicSuffixes3.toSet

  private val ipv4 = java.util.regex.Pattern.compile("^\\d{1,3}(\\.\\d{1,3}){3}$")

  private def mirror(u: String): String = {
    // Locale.ROOT: Spark's lower() takes a locale-free ASCII fast path,
    // while bare toLowerCase follows the default locale — on a tr/az JVM
    // "API" would fold to a dotless ı and the mirror would diverge
    val ns = u.replaceAll("^\\s+|\\s+$", "").toLowerCase(java.util.Locale.ROOT)
      .replaceAll("^https?://", "")
    val auth = ns.takeWhile(c => c != '/' && c != '?' && c != '#')
    val noUser = auth.substring(auth.indexOf('@') + 1) // -1 + 1 = 0: no userinfo
    val host0 = noUser.replaceAll(":\\d*$", "").replaceAll("\\.$", "")
    val host =
      if (host0.forall(_ < 0x80)) host0
      else try java.net.IDN.toASCII(host0)
      catch { case _: IllegalArgumentException => host0 }
    val ls = host.split("\\.", -1)
    val n = ls.length
    def lastK(k: Int) = ls.takeRight(k).mkString(".")
    if (ipv4.matcher(host).matches() || n <= 2) host
    else if (n >= 4 && suf3(lastK(3))) lastK(4)
    else if (suf2(lastK(2))) lastK(3)
    else lastK(2)
  }

  private val urlGen: Gen[String] = for {
    pad <- Gen.oneOf("", " ", "\t ", " \r\n", "\u000B")
    scheme <- Gen.oneOf("http://", "https://", "HTTP://", "Https://", "", "//")
    user <- Gen.oneOf("", "bob@", "bob:pw@", "a.b@")
    label <- Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(6))
    subs <- Gen.choose(0, 3).flatMap(n => Gen.listOfN(n,
      Gen.oneOf("www", "a", "blog", "münchen", "xn--mnchen-3ya", "API")))
    suffix <- Gen.oneOf("com", "org", "de", "io", "co.uk", "com.au", "gov.au",
      "qld.gov.au", "nsw.gov.au", "co.jp", "com.br", "co.za",
      "münchen.de" /* IDN registrable label */)
    host <- Gen.oneOf(
      (subs :+ label :+ suffix).mkString("."),
      suffix, // host IS a public suffix
      label, // single label
      // 300 is not a valid octet but \d{1,3} matches it — the IP rule is
      // shape-based on BOTH engines by design, so they must agree here too
      "10.0.0.7", "192.168.300.1",
      "")
    dot <- Gen.oneOf("", ".")
    port <- Gen.oneOf("", ":80", ":8080", ":")
    tail <- Gen.oneOf("", "/", "/p/q?x=1@y", "?q=1", "#f", "/a.b.c")
  } yield pad + scheme + user + host + dot + port + tail + pad.reverse

  property("registrableDomain == driver mirror") =
    forAllNoShrink(Gen.choose(1, 8).flatMap(Gen.listOfN(_, urlGen))) { urls =>
      val s = spark; import s.implicits._
      val got = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
        .toDF("doc_id", "url")
        .select(org.apache.spark.sql.functions.col("doc_id"),
          GraftFunctions.registrableDomain(org.apache.spark.sql.functions.col("url")))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val want = urls.zipWithIndex.map { case (u, i) => i.toLong -> mirror(u) }.toMap
      got == want
    }

  property("fixture shapes land in their intended strata") = {
    // the seven shapes the graded fixture uses, pinned as exact pairs so
    // a selection-rule regression names the broken shape directly
    val cases = Seq(
      "https://blog.site3.example.com/post/9" -> "example.com",
      "HTTP://site3.co.uk:8080/a?x=1" -> "site3.co.uk",
      "https://user:pw@data.qld.gov.au/x/9" -> "data.qld.gov.au",
      "http://10.55.3.7/p" -> "10.55.3.7",
      "https://www.münchen.de/seite" -> "xn--mnchen-3ya.de",
      "https://localhost:9090/" -> "localhost",
      "https://a.b.site3.com.au./deep?utm_source=x#f" -> "site3.com.au",
      // a bare public suffix is its own stratum (documented convention)
      "https://qld.gov.au/" -> "qld.gov.au",
      "https://gov.au/" -> "gov.au")
    cases.forall { case (u, want) => mirror(u) == want } && {
      val s = spark; import s.implicits._
      val got = cases.map(_._1).zipWithIndex.map { case (u, i) => (i.toLong, u) }
        .toDF("doc_id", "url")
        .select(org.apache.spark.sql.functions.col("doc_id"),
          GraftFunctions.registrableDomain(org.apache.spark.sql.functions.col("url")))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      cases.zipWithIndex.forall { case ((_, want), i) => got(i.toLong) == want }
    }
  }

  property("a NULL url yields a NULL domain, never the empty-string stratum") = {
    // concat_ws skips nulls and would otherwise fold a null url into the
    // "" domain — silently merging every url-less doc into ONE cap
    // stratum (the null-grouping-key trap urlDedup documents); an empty
    // STRING still maps to "" deterministically, the garbage stratum
    val s = spark; import s.implicits._
    val got = Seq((0L, null: String), (1L, ""), (2L, "https://a.example.com/x"))
      .toDF("doc_id", "url")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        GraftFunctions.registrableDomain(org.apache.spark.sql.functions.col("url")))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    got(0L).isEmpty && got(1L).contains("") && got(2L).contains("example.com")
  }
}
