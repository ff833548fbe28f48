package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-token content hashing of an `array<string>` in ONE pass: each token
  * maps to `pmod(hash60(t), P)` — the md5-prefix hash reduced into the
  * mod-P gram-fold domain. This is the step feeding every shingle/MinHash/
  * winnowing/repetition pipeline (`Dedup.shingleBase`, `decontaminate`,
  * `gramRepetition`), which previously ran as an interpreted `transform`
  * lambda: per element, a variable binding plus a generic eval of the
  * `pmod(cast(hash60(t)))` tree. The md5 itself (`Hash60.hash`) is the
  * same kernel either way; this removes the per-element interpreter frame
  * around it — the same treatment [[WinnowSketchExpr]] and
  * [[NgramHashExpr]] gave the downstream folds.
  *
  * `fold = true` is the Rabin-Karp variant (`TextAnalysis.fingerprints`):
  * instead of the hash ARRAY, return the single rolling fold
  * `acc ← (acc·B + h) mod P` over the token hashes (LongType, 0 for an
  * empty array). Null semantics mirror the HOF forms exactly (asserted in
  * FunctionsSpec): a null array yields null; a null ELEMENT yields a null
  * hash slot elementwise, and poisons the fold to null from that step on
  * (null propagates through `acc·B + h` to the end).
  */
case class TokenHashExpr(child: Expression, fold: Boolean)
    extends UnaryExpression with CodegenFallback {

  import NgramHashExpr.{B, P}

  override def dataType: DataType =
    if (fold) LongType else ArrayType(LongType, containsNull = true)
  // the fold goes null on a null ELEMENT too, so a non-nullable array of
  // nullable strings can still produce null — element nullability must
  // flow into ours or downstream null-elision optimizes wrongly
  override def nullable: Boolean =
    if (fold) child.nullable || (child.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    })
    else child.nullable
  override def prettyName: String = if (fold) "token_fold_hash" else "token_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val m = a.numElements()
    if (fold) {
      var acc = 0L
      var i = 0
      while (i < m) {
        if (a.isNullAt(i)) return null // null token poisons the whole fold
        val h = Math.floorMod(Hash60.hash(a.getUTF8String(i).getBytes), P)
        acc = Math.floorMod(acc * B + h, P)
        i += 1
      }
      acc
    } else {
      val out = new Array[Any](m)
      var i = 0
      while (i < m) {
        if (!a.isNullAt(i))
          out(i) = Math.floorMod(Hash60.hash(a.getUTF8String(i).getBytes), P)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): TokenHashExpr =
    copy(child = newChild)
}
