package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a PLAN-TIME Bloom filter (the runtime-filter
  * idiom, made explicit): `true` iff the string child MIGHT be in the set
  * the filter was built from. No false negatives ever, so callers use it
  * strictly as a PRE-filter in front of an exact join — semantics never
  * depend on it, only the amount of data reaching the shuffle does
  * (`Dedup.dedupAgainstBaselineBloom`).
  *
  * The serialized filter travels to executors inside the expression (the
  * same closure-shipping a broadcast variable would do for this size); it
  * deserializes once per task via the transient lazy val, and each probe
  * is one String materialization plus the filter's item hash. Built on
  * the public `org.apache.spark.util.sketch.BloomFilter`:
  * `mightContainString` is the read path consistent with whatever
  * `DataFrameStatFunctions.bloomFilter` inserted for a string column —
  * the pairing (zero false negatives included) is locked by DedupSpec's
  * randomized equivalence test, not assumed.
  */
case class BloomMightContainExpr(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    bloom.mightContainString(input.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}
