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

  // (key, ts: Option, tieBreak) — duplicated ts values and null ts included,
  // exercising the max_by struct ordering's tie-break and null ranking
  private val keyedRows = Gen.listOfN(24, Gen.zip(
    Gen.choose(1, 5),
    Gen.option(Gen.choose(1, 4)),
    Gen.choose(1, 99)))

  property("latestPerKey == in-memory max by (ts nulls-lowest, tieBreak)") =
    forAllNoShrink(keyedRows) { rows0 =>
      val s = spark; import s.implicits._
      import org.apache.spark.sql.functions.col
      // tieBreak must be a total order per key for the comparison to be fair
      val rows = rows0.zipWithIndex.map { case ((k, ts, _), i) => (k, ts, i) }
      val out = RelOps.latestPerKey(rows.toDF("k", "ts", "tb"), Seq("k"), col("ts"), Seq(col("tb")))
        .collect().map(r => r.getInt(0) -> (Option(r.get(1)).map(_.asInstanceOf[Int]), r.getInt(2))).toMap
      val want = rows.groupBy(_._1).map { case (k, g) =>
        val best = g.maxBy { case (_, ts, tb) => (ts.getOrElse(Int.MinValue), tb) }
        k -> (best._2, best._3)
      }
      out == want
    }

  property("firstWinsDedup == in-memory min by the lexicographic order columns") =
    forAllNoShrink(keyedRows) { rows0 =>
      val s = spark; import s.implicits._
      import org.apache.spark.sql.functions.col
      val rows = rows0.zipWithIndex.map { case ((k, ts, o), i) => (k, ts.getOrElse(0), o, i) }
      val out = RelOps.firstWinsDedup(rows.toDF("k", "a", "b", "i"), Seq("k"), Seq(col("a"), col("b"), col("i")))
        .collect().map(r => r.getInt(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
      val want = rows.groupBy(_._1).map { case (k, g) =>
        val best = g.minBy { case (_, a, b, i) => (a, b, i) }
        k -> (best._2, best._3, best._4)
      }
      out == want
    }
}
