package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Null-guarded raw cosine `dot / (na·nb)` — `null` when the denominator is
  * zero (a zero-norm vector: failed or padded embedding) or the ratio is
  * NaN (NaN elements, Inf/Inf), else the IEEE double ratio. Callers wrap it
  * in `round(·, 6)` for the family's determinism contract (Spark's `round`
  * passes null through, so `round(cos_raw, 6)` is exactly the guarded
  * rounded cosine).
  *
  * Why a native expression and not the builtin form
  * `when(d === 0 || isnan(dot/d), null).otherwise(round(dot/d, 6))`: that
  * tree references the DOT SUBEXPRESSION twice, and neither Catalyst CSE
  * (the `otherwise` occurrence is conditional, so `EquivalentExpressions`
  * never reaches count ≥ 2 in the always-evaluated set) nor
  * `CollapseProject` dedupes it — worse, predicate pushdown inlines the
  * whole CASE (guide §4.4's duplication hazard) into join conditions, so
  * every ANN pair paid the O(dim) `DotExpr` loop two to four times. Here
  * the dot is a CHILD evaluated once into a local; however often the
  * optimizer copies this expression, each evaluation costs one dot.
  *
  * Null/NaN semantics are BIT-IDENTICAL to the builtin form (pinned in
  * FunctionsSpec): any null input → null (the CASE form's null-condition /
  * round(null) path collapses to the same), d == 0 → null, NaN ratio →
  * null, else the plain ratio. NOT registered as a SQL function — the
  * DuckDB oracle mirrors the arithmetic with its own guarded expression.
  */
case class Cos6RawExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cos_raw"

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(first, second, third).forall(_.dataType == DoubleType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires three double arguments, got " +
          Seq(first, second, third).map(_.dataType.catalogString).mkString(", "))

  override protected def nullSafeEval(dot: Any, na: Any, nb: Any): Any = {
    val d = na.asInstanceOf[Double] * nb.asInstanceOf[Double]
    val raw = dot.asInstanceOf[Double] / d
    if (d == 0.0 || java.lang.Double.isNaN(raw)) null else java.lang.Double.valueOf(raw)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (dot, na, nb) => {
      val d = ctx.freshName("d")
      val raw = ctx.freshName("raw")
      s"""
         |final double $d = $na * $nb;
         |final double $raw = $dot / $d;
         |if ($d == 0.0d || Double.isNaN($raw)) { ${ev.isNull} = true; }
         |else { ${ev.value} = $raw; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Cos6RawExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}
