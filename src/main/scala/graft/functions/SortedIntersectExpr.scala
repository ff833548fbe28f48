package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `size(array_intersect(a, b))` for two SORTED `array<bigint>` columns,
  * as one allocation-free merge — the hot kernel of every pair-verification
  * stage (`Dedup.verifyJaccard`): with ~10⁵–10⁶ candidate pairs per LSH /
  * winnow round, `array_intersect` builds and probes a fresh hash set PER
  * PAIR, while the per-doc sort it needs instead is paid once per DOCUMENT
  * (|docs| ≪ |pairs|) on the join's build side.
  *
  * Matches `array_intersect` cardinality semantics exactly (equivalence-
  * tested in FunctionsSpec on random arrays with duplicates): the count is
  * over DISTINCT common values — duplicates inside either input count
  * once. Null ELEMENTS never occur in shingle arrays (hashes coalesce to
  * 0) and are skipped defensively; `array_sort` places them last, so the
  * merge stops at the first null. A null ARRAY yields null (as
  * `size(array_intersect(...))` does via null propagation).
  *
  * Inputs MUST be ascending-sorted (e.g. via `array_sort`) — unsorted
  * input silently undercounts, which is why this is not a drop-in SQL
  * function: it is package-internal to the verify stages that control
  * both sides.
  */
case class SortedIntersectSizeExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_size"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint>, got ${l.catalogString}, ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0
    var j = 0
    var n = 0
    var havePrev = false
    var prev = 0L
    while (i < nx && j < ny && !x.isNullAt(i) && !y.isNullAt(j)) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else {
        if (!havePrev || xv != prev) { n += 1; prev = xv; havePrev = true }
        i += 1; j += 1
      }
    }
    n
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSizeExpr =
    copy(left = newLeft, right = newRight)
}
