package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 60-bit count-weighted SimHash of a token array, in ONE pass per row —
  * the shuffle-elimination form of the explode→groupBy vote tally: the
  * aggregation existed only because votes were spread across exploded
  * rows; with the tokens already an array, the per-document signature is
  * a pure projection and the N×tokens shuffle disappears from the plan
  * (`Dedup.simhash` keeps only the band join's shuffle).
  *
  * Semantics are IDENTICAL to the aggregate form (equivalence-tested in
  * FunctionsSpec, and `simhash_pairs`' oracle is unchanged): per token
  * OCCURRENCE, `hash60(token)` votes +1 on its set bits; bit b of the
  * result is set iff `2·ones_b > n_tokens` (the ±1-vote rule). A null
  * TOKEN counts toward `n_tokens` but votes on nothing — exactly what
  * the exploded row with a null hash did (skipped by `sum`, counted by
  * `count`). Returns null for a null or EMPTY array — the aggregate form
  * had no group to emit, and callers filter the null out the same way.
  *
  * `preHashed = true` accepts `array<long>` of FULL 60-bit `hash60`
  * values instead of the token strings — the shared `Dedup.fullHashBase`
  * layer, where the md5 pass already ran once for the gram pipelines.
  * Votes land on the same bits by construction (`hash60` is exactly what
  * this expression computes from a string), so the two input modes are
  * value-identical over the same tokens (FunctionsSpec asserts it).
  */
case class SimHash60Expr(child: Expression, preHashed: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash60"

  override def checkInputDataTypes(): TypeCheckResult = (child.dataType, preHashed) match {
    case (ArrayType(StringType, _), false) => TypeCheckResult.TypeCheckSuccess
    case (ArrayType(LongType, _), true) => TypeCheckResult.TypeCheckSuccess
    case (t, pre) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ${if (pre) "array<bigint>" else "array<string>"}, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val m = a.numElements()
    if (m == 0) return null
    val ones = new Array[Int](60)
    var i = 0
    while (i < m) {
      if (!a.isNullAt(i)) {
        var h = if (preHashed) a.getLong(i) else Hash60.hash(a.getUTF8String(i).getBytes)
        while (h != 0L) { // iterate set bits only (~30 per 60-bit hash)
          ones(java.lang.Long.numberOfTrailingZeros(h)) += 1
          h &= h - 1
        }
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 60) {
      if (2 * ones(b) > m) sim |= 1L << b
      b += 1
    }
    sim
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash60Expr =
    copy(child = newChild)
}
