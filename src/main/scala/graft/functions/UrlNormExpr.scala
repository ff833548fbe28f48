package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Percent-encoding case normalization (RFC 3986 §6.2.2.1): the hex
  * digits of every `%XX` escape are uppercased, everything else is left
  * untouched. `canonicalUrl` lowercases the whole url for its dedup key,
  * which folds `%2F` to `%2f`; this restores the canonical uppercase
  * form so `a%2Fb` and `a%2fb` collapse while the surrounding text stays
  * lowercase. A lone `%` or a truncated escape is not an escape and
  * passes through. Codegen'd (one static call), so it fuses into the
  * same whole-stage span as the rest of the canonicalizer; there is no
  * builtin chain for per-match case mapping (`regexp_replace` cannot
  * transform its captures), which is why this is a native expression.
  * The DuckDB oracle replays it over the fixture's finite escape set
  * with literal `replace()` calls.
  */
case class PercentUpperExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "percent_upper"

  override protected def nullSafeEval(input: Any): Any =
    UrlNorm.percentUpper(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlNorm.percentUpper($c)")

  override protected def withNewChildInternal(newChild: Expression): PercentUpperExpr =
    copy(child = newChild)
}

/** IDN host canonicalization: the input is a scheme-/query-free
  * `host[/path…]` string and the HOST segment (up to the first `/`) is
  * punycode-encoded with `java.net.IDN.toASCII` when it contains any
  * non-ASCII character — so `münchen.example.com` and its wire form
  * `xn--mnchen-3ya.example.com` produce one dedup key. All-ASCII hosts
  * (the overwhelming majority of a real frontier) take a scan-only fast
  * path; a host IDN rejects (bad label length, stray bidi controls) is
  * passed through unchanged — canonicalization must never drop a url.
  * Runs after `canonicalUrl`'s lowercasing, so the encoder sees
  * lowercase labels and emits lowercase `xn--` forms.
  */
case class IdnHostExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "idn_host"

  override protected def nullSafeEval(input: Any): Any =
    UrlNorm.idnHost(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlNorm.idnHost($c)")

  override protected def withNewChildInternal(newChild: Expression): IdnHostExpr =
    copy(child = newChild)
}

object UrlNorm {

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  def percentUpper(u: UTF8String): UTF8String = {
    val s = u.toString
    if (s.indexOf('%') < 0) return u
    val c = s.toCharArray
    var i = 0
    // i caps at length-3: an escape needs two hex chars after the '%'
    while (i < c.length - 2) {
      if (c(i) == '%' && isHex(c(i + 1)) && isHex(c(i + 2))) {
        c(i + 1) = Character.toUpperCase(c(i + 1))
        c(i + 2) = Character.toUpperCase(c(i + 2))
        i += 3
      } else i += 1
    }
    UTF8String.fromString(new String(c))
  }

  def idnHost(u: UTF8String): UTF8String = {
    val s = u.toString
    val slash = s.indexOf('/')
    val hostEnd = if (slash >= 0) slash else s.length
    var ascii = true
    var i = 0
    while (ascii && i < hostEnd) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) return u // fast path: nothing to encode
    try {
      val encoded = java.net.IDN.toASCII(s.substring(0, hostEnd))
      UTF8String.fromString(
        if (slash >= 0) encoded + s.substring(slash) else encoded)
    } catch {
      case _: IllegalArgumentException => u // un-encodable host: keep the url
    }
  }
}
