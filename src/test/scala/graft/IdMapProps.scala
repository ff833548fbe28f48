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

  property("path-invariance: cached and no-cache assignment agree") =
    // extend (guard-persisted delta) and extendBulk (nothing staged) share
    // the sort+zipWithIndex assignment but stage the delta differently —
    // the caching difference must never fork the (key, id) assignments
    // over a non-empty base map
    forAllNoShrink(keyGen, keyGen) { (batch1, batch2) =>
      val base = IdMap.extend(IdMap.empty(spark), df(batch1), "pk")
      val delta = df(batch2 :+ "iri/𐀀" :+ "iri/�")
      def rows(m: org.apache.spark.sql.DataFrame) =
        m.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      rows(IdMap.extend(base, delta, "pk")) ==
        rows(IdMap.extendBulk(base, delta, "pk"))
    }

  property("assignment matches an independent driver-side UTF-8 byte-order oracle") =
    // the engine-independent statement of the ordering contract: new keys
    // get maxId+1.. in UTF-8 BINARY byte order, recomputed here with
    // java.util.Arrays.compareUnsigned over getBytes("UTF-8") — no Spark
    // sort involved, so an ordering bug in assignSorted cannot cancel out
    // (DuckDB's row_number oracle grades this too, but only over ASCII
    // fixture keys). The appended keys force the divergence case: U+10000
    // sorts BEFORE U+FFFF in Java's UTF-16 compareTo but AFTER it in
    // UTF-8 bytes (F0 90 80 80 vs EF BF BF), so a UTF-16-ordered engine
    // sort — or a UTF-16 oracle — fails here.
    forAllNoShrink(keyGen, keyGen) { (batch1, batch2) =>
      val base = IdMap.extend(IdMap.empty(spark), df(batch1), "pk")
      val baseRows = base.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val delta = batch2 :+ "iri/𐀀" :+ "iri/￿" // U+10000, U+FFFF
      val fresh = delta.distinct.filterNot(baseRows.keySet)
        .sortWith((a, b) => java.util.Arrays.compareUnsigned(
          a.getBytes("UTF-8"), b.getBytes("UTF-8")) < 0)
      val maxId = if (baseRows.isEmpty) 0L else baseRows.values.max
      val expected = baseRows ++
        fresh.zipWithIndex.map { case (k, i) => k -> (maxId + 1 + i) }
      val actual = IdMap.extend(base, df(delta), "pk")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      actual == expected
    }
}
