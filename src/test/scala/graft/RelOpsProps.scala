package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import graft.operators.RelOps

/** Upsert/carry-forward algebra over arbitrary overlapping key sets:
  * the invariants the reference gets from `INSERT ... ON CONFLICT`.
  */
object RelOpsProps extends Properties("RelOps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private val rowsGen = Gen.listOfN(20,
    Gen.zip(Gen.choose(1, 8), Gen.alphaLowerStr.map(_.take(4))))

  private def df(rows: Seq[(Int, String)]) = {
    val s = spark; import s.implicits._
    // one row per key (upsert inputs are keyed relations)
    rows.groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).min) }.toSeq.toDF("k", "v")
  }

  property("key set of upsert = keys(base) ∪ keys(updates); updates win") =
    forAllNoShrink(rowsGen, rowsGen) { (b, u) =>
      val base = df(b); val upd = df(u)
      val out = RelOps.upsert(base, upd, Seq("k"))
        .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
      val bm = base.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
      val um = upd.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
      out.keySet == (bm.keySet ++ um.keySet) &&
        um.forall { case (k, v) => out(k) == v } &&
        (bm.keySet -- um.keySet).forall(k => out(k) == bm(k))
    }

  property("idempotence: re-applying the same updates changes nothing") =
    forAllNoShrink(rowsGen, rowsGen) { (b, u) =>
      val base = df(b); val upd = df(u)
      val once = RelOps.upsert(base, upd, Seq("k"))
      val twice = RelOps.upsert(once, upd, Seq("k"))
      once.collect().map(_.toSeq).toSet == twice.collect().map(_.toSeq).toSet
    }
}
