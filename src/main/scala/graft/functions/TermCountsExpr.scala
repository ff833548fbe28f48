package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document term-frequency pairs `array<struct<token, tf>>` in ONE
  * pass over the token array — the shuffle-elimination form of
  * `explode(tokens) → groupBy(doc, term).count()`: that aggregation
  * regrouped rows that were born together in the same document, paying a
  * full N×tokens exchange; here `explode(term_counts(tk))` yields the
  * identical (doc, token, tf) rows as a pure projection, and the first
  * shuffle of every TF pipeline (TF-IDF, unigram LM) disappears.
  *
  * Pairs emit in first-occurrence order (deterministic), which no
  * consumer depends on — downstream is joins/aggregates on the exploded
  * rows, so results are bit-identical (TextAnalysisSpec equivalence).
  * Null tokens are counted like any value by groupBy-count — but
  * upstream `tokens()` never yields them, and the exploded row with a
  * null term would groupBy into a null key all the same; we mirror that
  * by counting nulls under a null token entry. A null array yields null
  * (explode then drops the row, as exploding zero groups did).
  *
  * Tokens are CLONED once per distinct term: the input UTF8Strings may
  * point into a reused unsafe-row buffer, and the output outlives eval.
  */
case class TermCountsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = true),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "term_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val m = a.numElements()
    val counts = new java.util.LinkedHashMap[UTF8String, Long]()
    var nulls = 0L
    var i = 0
    while (i < m) {
      if (a.isNullAt(i)) nulls += 1L
      else {
        val t = a.getUTF8String(i)
        val prev = counts.getOrDefault(t, 0L) // values are ≥ 1 ⇒ 0 = absent
        if (prev == 0L) counts.put(t.clone(), 1L)
        else counts.put(t, prev + 1L)
      }
      i += 1
    }
    val out = new java.util.ArrayList[Any](counts.size + 1)
    counts.forEach((tok, tf) => out.add(InternalRow(tok, tf)))
    if (nulls > 0) out.add(InternalRow(null, nulls))
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): TermCountsExpr =
    copy(child = newChild)
}
