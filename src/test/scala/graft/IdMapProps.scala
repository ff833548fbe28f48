package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import graft.operators.IdMap

/** ScalaCheck strengthening of the id-map invariants (SURVEY §7.4.1)
  * beyond the reference's example-based tests: injectivity, density,
  * cross-run stability, and re-encode idempotence over arbitrary key
  * batches (small alphabet to force overlap between batches).
  */
object IdMapProps extends Properties("IdMap") {

  // Spark round-trips make each case expensive; 10 well-shrunk cases per
  // property is plenty for these algebraic invariants
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private val keyGen = Gen.listOfN(30, Gen.oneOf(
    (1 to 12).map(i => s"iri/k$i") ++ Seq("iri/x", "iri/y")))

  private def df(keys: Seq[String]) = {
    val s = spark; import s.implicits._
    keys.toDF("pk")
  }

  property("injective and dense after any two extends") =
    forAllNoShrink(keyGen, keyGen) { (batch1, batch2) =>
      val m1 = IdMap.extend(IdMap.empty(spark), df(batch1), "pk")
      val m2 = IdMap.extend(m1, df(batch2), "pk")
      val rows = m2.collect().map(r => (r.getString(0), r.getLong(1)))
      val n = rows.length
      rows.map(_._1).distinct.length == n &&
        rows.map(_._2).distinct.length == n &&
        rows.map(_._2).sorted.toSeq == (1L to n)
    }

  property("stability: extend never changes an existing assignment") =
    forAllNoShrink(keyGen, keyGen) { (batch1, batch2) =>
      val m1 = IdMap.extend(IdMap.empty(spark), df(batch1), "pk")
      val before = m1.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val after = IdMap.extend(m1, df(batch2), "pk")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      before.forall { case (k, v) => after(k) == v }
    }

  property("idempotence: extending with an encoded frame mints nothing") =
    forAllNoShrink(keyGen) { batch =>
      val (encoded, map) = IdMap.extendAndEncode(IdMap.empty(spark), df(batch), "pk")
      IdMap.extend(map, encoded, "pk").count() == map.count()
    }

  property("path-invariance: lazy ranked and zipWithIndex assignment agree") =
    // the two independent implementations of the global key rank — extend's
    // lazy range-partition + monotonically_increasing_id layout and
    // extendBulk's RDD sort + zipWithIndex — must produce identical
    // (key, id) assignments over a non-empty base map, including
    // supplementary-plane keys, where a UTF-16 sort would diverge from
    // Spark's UTF-8 binary order
    forAllNoShrink(keyGen, keyGen) { (batch1, batch2) =>
      val base = IdMap.extend(IdMap.empty(spark), df(batch1), "pk")
      val delta = df(batch2 :+ "iri/𐀀" :+ "iri/�")
      def rows(m: org.apache.spark.sql.DataFrame) =
        m.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      rows(IdMap.extend(base, delta, "pk")) ==
        rows(IdMap.extendBulk(base, delta, "pk"))
    }
}
