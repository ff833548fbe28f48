package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import graft.functions.{NearestCellExpr, NearestCellsExpr, VectorOps}

/** The native codebook kernels must equal the struct/array_min formulation
  * they replaced for ARBITRARY codebooks, not just the fixed fixture in
  * FunctionsSpec: random k x dim codebooks, random vectors (including
  * duplicated distances via repeated vectors, wrong-length vectors, and
  * null elements), bit-for-bit on the distance and exact on cell ids.
  */
object CodebookProps extends Properties("CodebookExpr") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private val elem: Gen[Double] = Gen.oneOf(
    Gen.choose(-4.0, 4.0),
    // coarse grid makes exact distance TIES likely, exercising the
    // lower-cell-id tie break on both paths
    Gen.choose(-2, 2).map(_.toDouble))

  private case class Case(cb: List[List[Double]], vecs: List[Option[List[Option[Double]]]])

  private val caseGen: Gen[Case] = for {
    k   <- Gen.choose(1, 5)
    dim <- Gen.choose(1, 6)
    cb  <- Gen.listOfN(k, Gen.listOfN(dim, elem))
    n   <- Gen.choose(1, 6)
    vecs <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.listOfN(dim, elem.map(Option(_))).map(Option(_)),
      1 -> Gen.listOfN(dim + 1, elem.map(Option(_))).map(Option(_)), // wrong length
      1 -> Gen.listOfN(dim, Gen.oneOf(elem.map(Option(_)), Gen.const(Option.empty[Double])))
             .map(Option(_)),                                        // null elements
      1 -> Gen.const(Option.empty[List[Option[Double]]])))           // null vector
    dup <- Gen.oneOf(true, false)
  } yield Case(cb, if (dup && vecs.nonEmpty) vecs ++ vecs.take(1) else vecs)

  property("NearestCell(s)Expr == struct/array_min formulation, random codebooks") =
    forAllNoShrink(caseGen) { c =>
      val s = spark
      val cb = c.cb.map(_.toIndexedSeq).toIndexedSeq
      def oldStructs(v: org.apache.spark.sql.Column) =
        array(cb.indices.map { i =>
          struct(VectorOps.dist2(v, array(cb(i).map(lit): _*)).as("d"), lit(i).as("cell"))
        }: _*)
      val nProbe = math.min(2, cb.length)
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{ArrayType, DoubleType, StructField, StructType}
      val schema = StructType(Seq(
        StructField("v", ArrayType(DoubleType, containsNull = true), nullable = true)))
      val data = c.vecs.map(v =>
        Row(v.map(_.map(_.map(java.lang.Double.valueOf).orNull)).orNull))
      val rows = s.createDataFrame(s.sparkContext.parallelize(data, 1), schema)
        .select(
          toCol(NearestCellExpr(toExpr(col("v")), cb)).as("n"),
          array_min(oldStructs(col("v"))).as("o"),
          toCol(NearestCellsExpr(toExpr(col("v")), cb, nProbe)).as("nn"),
          transform(slice(array_sort(oldStructs(col("v"))), 1, nProbe),
            x => x.getField("cell")).as("oo"))
        .collect()
      rows.forall { r =>
        // NULL vector: the kernels null out (documented), while the old
        // struct path degrades to (null, 0) — equivalence only holds for
        // non-null vectors, which is what the pipelines feed them.
        if (r.isNullAt(0)) r.isNullAt(2)
        else {
          val (n, o) = (r.getStruct(0), r.getStruct(1))
          n.isNullAt(0) == o.isNullAt(0) &&
            (n.isNullAt(0) || java.lang.Double.doubleToRawLongBits(n.getDouble(0)) ==
              java.lang.Double.doubleToRawLongBits(o.getDouble(0))) &&
            n.getInt(1) == o.getInt(1) &&
            r.getSeq[Int](2) == r.getSeq[Int](3)
        }
      }
    }
}
