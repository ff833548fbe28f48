package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd element-wise fold over two `array<float|double>` columns — the
  * native-`Expression` replacement for the `aggregate(zip_with(...))`
  * higher-order-function forms in `VectorOps`.
  *
  * Why: Spark evaluates higher-order functions INTERPRETED (a lambda per
  * element, boxed accumulator, no whole-stage codegen), which makes the dot
  * product the hot cost of every ANN query — it runs once per
  * (query, candidate) pair. This compiles to a tight primitive `double`
  * loop inside whole-stage codegen.
  *
  * Semantics are BIT-IDENTICAL to the HOF form (asserted in FunctionsSpec):
  * elements cast to double (exact for float), products/terms accumulated
  * left-to-right from 0.0 — the same IEEE operation sequence — and the
  * same null behavior: null array → null, length mismatch → null (zip_with
  * pads with null, which poisons the HOF sum), null element → null.
  */
abstract class VectorFoldExpr extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // non-null inputs can still produce null (length mismatch / null element)
  override def nullable: Boolean = true

  /** One fold term from a pair of (double-cast) elements. */
  protected def term(x: Double, y: Double): Double
  /** Java source for one fold term; `x`/`y` are double-typed locals. */
  protected def termCode(x: String, y: String): String

  private def okElem(t: DataType): Boolean = t == FloatType || t == DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _)) if okElem(lt) && okElem(rt) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float|double> arguments, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  @transient private lazy val getL: (ArrayData, Int) => Double = getter(elemType(left))
  @transient private lazy val getR: (ArrayData, Int) => Double = getter(elemType(right))

  private def getter(t: DataType): (ArrayData, Int) => Double = t match {
    case FloatType => (a, i) => a.getFloat(i).toDouble
    case _         => (a, i) => a.getDouble(i)
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val la = l.asInstanceOf[ArrayData]
    val ra = r.asInstanceOf[ArrayData]
    val n = la.numElements()
    if (n != ra.numElements()) return null
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (la.isNullAt(i) || ra.isNullAt(i)) return null
      acc += term(getL(la, i), getR(ra, i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val lVal = CodeGenerator.getValue(l, elemType(left), i)
      val rVal = CodeGenerator.getValue(r, elemType(right), i)
      s"""
         |final int $n = $l.numElements();
         |if ($n != $r.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0d;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($l.isNullAt($i) || $r.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $xv = (double)($lVal);
         |    final double $yv = (double)($rVal);
         |    $acc += ${termCode(xv, yv)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
}

/** Σ xᵢ·yᵢ — dot product (and, with `right == left`, the squared norm). */
case class DotExpr(left: Expression, right: Expression) extends VectorFoldExpr {
  override def prettyName: String = "vec_dot"
  override protected def term(x: Double, y: Double): Double = x * y
  override protected def termCode(x: String, y: String): String = s"$x * $y"
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotExpr =
    copy(left = newLeft, right = newRight)
}

/** Σ (xᵢ−yᵢ)² — squared euclidean distance (IVF cell assignment). */
case class Dist2Expr(left: Expression, right: Expression) extends VectorFoldExpr {
  override def prettyName: String = "vec_dist2"
  override protected def term(x: Double, y: Double): Double = (x - y) * (x - y)
  override protected def termCode(x: String, y: String): String = s"($x - $y) * ($x - $y)"
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Dist2Expr =
    copy(left = newLeft, right = newRight)
}
