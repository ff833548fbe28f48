package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import graft.functions.BloomMightContainExpr

/** The Bloom gate's entire contract is ZERO false negatives for the
  * insert/probe pairing it uses: items inserted via
  * `DataFrameStatFunctions.bloomFilter` on a string column must ALL probe
  * `true` through `BloomMightContainExpr.mightContainString`. DedupSpec
  * locks this at the operator level with one seeded fixture; this
  * property locks it at the expression level for arbitrary strings —
  * unicode, empty, whitespace-only, near-identical — and undersized
  * filters (expectedItems below the real cardinality drives the fp rate
  * up but must NEVER produce a false negative).
  */
object BloomGateProps extends Properties("BloomGate") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private val str: Gen[String] = Gen.oneOf(
    Gen.stringOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' '))),
    // non-ASCII incl. an astral-plane emoji (surrogate pair in UTF-16)
    Gen.listOf(Gen.oneOf("√", "é", "ß", "中", "🙂", "\t")).map(_.mkString),
    Gen.const(""))

  private val caseGen: Gen[(List[String], Long)] = for {
    n     <- Gen.choose(1, 60)
    items <- Gen.listOfN(n, str)
    // deliberately undersized filters included: fp rate rises, fn never
    cap   <- Gen.oneOf(1L, 8L, 1000L)
  } yield (items, cap)

  property("no false negatives for any inserted string, even undersized") =
    forAllNoShrink(caseGen) { case (items, cap) =>
      val s = spark
      import s.implicits._
      val df = items.toDF("k")
      val bloom = df.stat.bloomFilter(col("k"), math.max(cap, 1L), 0.03)
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      val probe = toCol(BloomMightContainExpr(toExpr(col("k")), bos.toByteArray))
      df.select(col("k"), probe.as("hit")).collect().forall(_.getBoolean(1))
    }
}
