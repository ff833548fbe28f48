package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All three token-derived quality signals in ONE pass over the token
  * array: struct<n_tokens: long, n_distinct_tokens: long, n_stopwords:
  * long>. Replaces the three separate passes `TextAnalysis.qualityScore`
  * used to run — `size(tokens(t))`, `size(filter(tokens(lower(t)), …))`
  * (an interpreted higher-order filter), and
  * `size(array_distinct(tokens(t)))` — each of which re-tokenized the
  * text, leaving the signal stage as two non-codegen ProjectExecs
  * stacked over three `split` calls per row.
  *
  * The child is the RAW `split(text, "\\s+")` array, not `tokens(text)`:
  * `tokens` only filters out empty strings, and that interposed
  * higher-order `filter` is CodegenFallback — it would knock the whole
  * projection out of whole-stage codegen. The kernel skips zero-length
  * elements itself, so signals over `split` are identical to signals over
  * `tokens` (either child works; `split` keeps the projection codegen).
  *
  * Semantics preserved exactly over any SPLIT-produced child (locked by
  * TextAnalysisSpec, QualitySignalsProps and the quality_score oracle):
  *   - n_tokens counts every non-empty element. A null ELEMENT also
  *     counts — note this is NOT `size(tokens(t))`'s rule: the
  *     higher-order filter inside `tokens` drops elements whose predicate
  *     is null, so it would EXCLUDE them. The divergence is unreachable
  *     from the actual child (`split` never yields null elements) but
  *     latent for any other array<string> input;
  *   - n_distinct_tokens counts distinct non-empty elements, with null
  *     elements collapsing to one extra bucket (`array_distinct`'s rule —
  *     the same null-inclusion caveat as n_tokens applies vs `tokens()`);
  *   - n_stopwords counts elements whose LOWERCASED form is a stopword —
  *     equivalent to the old `tokens(lower(text))` membership because
  *     lowercasing never creates or destroys whitespace (token boundaries
  *     commute with `lower`), and a null element is not a stopword (the
  *     old filter's null predicate dropped it).
  *
  * The stopword set is a constructor constant resolved to a hash set at
  * plan build time — the `SimHash60Expr`/`CodebookExpr` pattern of moving
  * row-invariant work out of the per-row loop. Codegen uses the
  * `addReferenceObj` method-call idiom, so the enclosing projection stays
  * inside whole-stage codegen rather than falling back to interpreted
  * eval.
  */
case class QualitySignalsExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def prettyName: String = "quality_signals"

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct_tokens", LongType, nullable = false),
    StructField("n_stopwords", LongType, nullable = false)))

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  // lazy: an Expression's non-serializable ancestor constructors re-run
  // during Java deserialization before case-class fields are restored
  // (the CodebookExprBase rule)
  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](stopwords.size * 2)
    stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  /** Public entry for generated code (addReferenceObj idiom). */
  final def evalTokens(a: ArrayData): Any = nullSafeEval(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qualitySignals", this, classOf[QualitySignalsExpr].getName)
    val jt = CodeGenerator.javaType(dataType)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = ($jt) $ref.evalTokens($a);")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val m = a.numElements()
    // per-row scratch set: getUTF8String views stay valid for the duration
    // of the eval, so no defensive clone is needed (we never return them)
    val distinct = new java.util.HashSet[UTF8String]()
    var nullSeen = false
    var nTokens = 0L
    var stops = 0L
    var i = 0
    while (i < m) {
      if (a.isNullAt(i)) { nullSeen = true; nTokens += 1L }
      else {
        val t = a.getUTF8String(i)
        if (t.numBytes() > 0) { // empty strings are not tokens (tokens()'s filter)
          nTokens += 1L
          distinct.add(t)
          if (stopSet.contains(t.toLowerCase)) stops += 1L
        }
      }
      i += 1
    }
    val nDistinct = distinct.size.toLong + (if (nullSeen) 1L else 0L)
    new GenericInternalRow(Array[Any](nTokens, nDistinct, stops))
  }

  override protected def withNewChildInternal(newChild: Expression): QualitySignalsExpr =
    copy(child = newChild)
}
