package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All k MinHash signature minima of a shingle-hash array in ONE pass —
  * the shuffle-elimination form of the explode→groupBy-min tally
  * (`Dedup.signatures`): the aggregation existed only to bring each
  * document's per-shingle affine hashes back together, but with the
  * shingles already an array the k minima are a pure projection, and the
  * N×shingles exchange disappears from every LSH plan (minhash_lsh,
  * ngram_jaccard, incremental_lsh, cluster/keep-best collapse).
  *
  * `sig[i] = min over shingles h of pmod(h·aᵢ + bᵢ, P)` with the fixed
  * engine constants (`hashParams`) — the same arithmetic the aggregate
  * evaluated per exploded row, so signatures are bit-identical
  * (DedupSpec equivalence) and the oracle's `sigItems` SQL is untouched.
  * Null SHINGLE entries vote on nothing (the exploded row's null hash was
  * skipped by `min`); a null or EMPTY array — or one of only nulls —
  * yields null, as the aggregate form had no group (or all-null mins) to
  * band, and callers filter it the same way.
  */
case class MinHashSigExpr(child: Expression, params: Seq[(Long, Long)])
    extends UnaryExpression with CodegenFallback {

  import NgramHashExpr.P

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val m = a.numElements()
    val k = params.length
    val mins = Array.fill(k)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < m) {
      if (!a.isNullAt(i)) {
        any = true
        val h = a.getLong(i)
        var j = 0
        while (j < k) {
          val (pa, pb) = params(j)
          val v = Math.floorMod(h * pa + pb, P)
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) null
    else new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}
