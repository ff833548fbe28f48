package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Rolled n-gram hashes of an `array<long>` of token hashes: for each
  * window of `n` consecutive token hashes, the mod-P rolling fold
  * `((h0*B + h1) % P * B + h2) % P` (n = 3 shown) — the gram-hash kernel
  * under every shingle-based operator (MinHash/LSH, n-gram Jaccard,
  * winnowing, decontamination, gram-repetition, collocations).
  *
  * Why native: the HOF form runs `zip_with` over shifted `slice`s once per
  * fold step — n−1 interpreted passes, each materializing a full shifted
  * copy of the hash array, plus an `array_distinct` pass. This expression
  * does the whole thing — fold, short-document padding, optional
  * first-occurrence dedup — in ONE pass with zero array copies, the same
  * treatment [[WinnowSketchExpr]] gave the sliding-window minimum.
  * Interpreted eval (`CodegenFallback`) is fine: the win is eliminating
  * the per-step array materializations, and the surrounding explode
  * pipelines are interpreted anyway.
  *
  * Semantics are IDENTICAL to the HOF forms they replace (asserted
  * element-for-element in FunctionsSpec), which the DuckDB oracle SQL
  * mirrors character-for-character (OracleSql.shingleHashList /
  * rolledGramList):
  *
  *   - `distilled = true` (Dedup.shingleHashes): windows 0..m−n, or ONE
  *     zero-padded window when 0 < m < n, empty for an empty array;
  *     first-occurrence-order dedup fused in.
  *   - `distilled = false` (Dedup.rolledGramHashes): one hash per gram
  *     OCCURRENCE, positional, empty when m < n — the form repetition
  *     metrics count.
  *
  * Null handling matches the fold exactly: a null LEADING hash yields a
  * null gram (null propagates through `a * B + …`); a null TRAILING hash
  * inside a window coalesces to 0, which is also how short-document
  * padding falls out of `zip_with`'s null padding.
  *
  * `reduceInputs = true` accepts FULL 60-bit token hashes (the shared
  * `Dedup.fullHashBase` layer) and applies `pmod(h, P)` per element as it
  * reads — bit-identical to consuming a pre-reduced array (the fold is
  * only defined for h < P: `acc·B + h` with a 60-bit h would overflow),
  * without materializing the reduced copy.
  */
case class NgramHashExpr(child: Expression, n: Int, distilled: Boolean,
                         reduceInputs: Boolean = false)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "gram width must be >= 1")

  import NgramHashExpr.{B, P}

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  // the raw form never returns null: its HOF twin's `when(size(hs) >= n …)`
  // sends a NULL array down the `.otherwise(array())` branch (size(null) is
  // null), as does the oracle's CASE — a null corpus row yields zero grams
  override def nullable: Boolean = child.nullable && distilled
  override def prettyName: String = if (distilled) "shingle_hashes" else "gram_hashes"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) {
      if (distilled) null else new GenericArrayData(Array.empty[Any])
    } else nullSafeEval(v)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.catalogString}")
  }

  // non-null element read, reduced into the mod-P fold domain when the
  // child carries full 60-bit hashes
  @inline private def read(a: ArrayData, i: Int): Long =
    if (reduceInputs) Math.floorMod(a.getLong(i), P) else a.getLong(i)

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val m = a.numElements()
    if (m == 0 || (!distilled && m < n))
      return new GenericArrayData(Array.empty[Any])
    val nGrams = math.max(m - n + 1, 1) // one zero-padded gram when m < n
    val out = new java.util.ArrayList[Any](nGrams)
    val seen = if (distilled) new java.util.HashSet[Long]() else null
    var sawNull = false
    var i = 0
    while (i < nGrams) {
      if (a.isNullAt(i)) { // null leading hash → null gram (a*B+… propagates)
        if (!distilled) out.add(null)
        else if (!sawNull) { sawNull = true; out.add(null) }
      } else {
        var acc = read(a, i)
        var j = 1
        while (j < n) {
          val idx = i + j
          // trailing null / past-end (short-doc padding) both coalesce to 0
          val hv = if (idx < m && !a.isNullAt(idx)) read(a, idx) else 0L
          acc = Math.floorMod(acc * B + hv, P) // pmod: result in [0, P)
          j += 1
        }
        if (!distilled || seen.add(acc)) out.add(acc)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): NgramHashExpr =
    copy(child = newChild)
}

object NgramHashExpr {
  /** 2^31−1 (prime) and the rolling base — MUST stay equal to
    * Dedup.P / Dedup.B and the constants inlined in the oracle SQL.
    */
  val P = 2147483647L
  val B = 1000003L
}
