package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Winnowing sketch of an `array<long>` of shingle hashes: the DISTINCT
  * (first-occurrence order) sliding-window minima over windows of `w`
  * consecutive hashes — `array_distinct(transform(sequence(...),
  * i -> array_min(slice(hs, i+1, w))))` as one native expression.
  *
  * Why: the HOF form runs interpreted and does O(m·w) work with an array
  * COPY per window (`slice` materializes each window before `array_min`
  * scans it) — it was the dominant cost of `winnow_dedup`, the most
  * expensive query in the registry. This is the classic monotonic-deque
  * sliding minimum: O(m) total, zero copies, dedup folded into the same
  * pass. Interpreted eval is fine here (`CodegenFallback`): the win is
  * the algorithm, and the surrounding explode pipeline is interpreted
  * anyway.
  *
  * Semantics are IDENTICAL to the HOF form (asserted in FunctionsSpec):
  * window count = max(m − w + 1, 1) — short arrays get one truncated
  * window, an empty array yields `[null]` (array_min of an empty slice),
  * null elements are skipped like `array_min`, an all-null window yields
  * one null kept at first occurrence like `array_distinct`.
  */
case class WinnowSketchExpr(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(w >= 1, "window width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "winnow_sketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val m = a.numElements()
    val nOut = math.max(m - w + 1, 1)
    // monotonic deque of indices whose values increase front→back
    val deque = new Array[Int](math.max(m, 1))
    var head = 0
    var tail = 0 // exclusive
    val seen = new java.util.HashSet[Long]()
    var sawNull = false
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var next = 0 // next element index to feed the deque
    var s = 0
    while (s < nOut) {
      val end = math.min(s + w, m)
      while (next < end) {
        if (!a.isNullAt(next)) { // null elements never enter the deque
          val v = a.getLong(next)
          while (tail > head && a.getLong(deque(tail - 1)) >= v) tail -= 1
          deque(tail) = next
          tail += 1
        }
        next += 1
      }
      while (tail > head && deque(head) < s) head += 1
      if (tail > head) {
        val v = a.getLong(deque(head))
        if (seen.add(v)) out += v
      } else if (!sawNull) { // empty/all-null window → one null, like distinct
        sawNull = true
        out += null
      }
      s += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowSketchExpr =
    copy(child = newChild)
}
