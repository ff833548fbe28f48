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

  property("upsertWithReset: incoming wins WITH resetCols nulled; base rows keep theirs") =
    forAllNoShrink(rowsGen, rowsGen) { (b, u) =>
      val s = spark; import s.implicits._
      def df2(rows: Seq[(Int, String)], tag: String) =
        rows.groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).min, s"$tag$k") }
          .toSeq.toDF("k", "v", "w")
      val base = df2(b, "b"); val inc = df2(u, "i")
      val out = RelOps.upsertWithReset(base, inc, Seq("k"), resetCols = Seq("w"))
        .collect().map(r => r.getInt(0) -> ((r.getString(1), Option(r.getString(2))))).toMap
      val bm = base.collect().map(r => r.getInt(0) -> ((r.getString(1), r.getString(2)))).toMap
      val im = inc.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
      out.keySet == (bm.keySet ++ im.keySet) &&
        im.forall { case (k, v) => out(k) == ((v, None)) } &&
        (bm.keySet -- im.keySet).forall(k => out(k) == ((bm(k)._1, Some(bm(k)._2))))
    }

  property("carryForward == upsert with prev-side nullCols nulled (cur intact, prev carried)") =
    forAllNoShrink(rowsGen, rowsGen) { (p, c) =>
      val s = spark; import s.implicits._
      def df2(rows: Seq[(Int, String)], tag: String) =
        rows.groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).min, s"$tag$k") }
          .toSeq.toDF("k", "v", "w")
      val prev = df2(p, "p"); val cur = df2(c, "c")
      val out = RelOps.carryForward(prev, cur, Seq("k"), nullCols = Seq("w"))
        .collect().map(r => r.getInt(0) -> ((r.getString(1), Option(r.getString(2))))).toMap
      val pm = prev.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
      val cm = cur.collect().map(r => r.getInt(0) -> ((r.getString(1), r.getString(2)))).toMap
      out.keySet == (pm.keySet ++ cm.keySet) &&
        cm.forall { case (k, (v, w)) => out(k) == ((v, Some(w))) } &&
        (pm.keySet -- cm.keySet).forall(k => out(k) == ((pm(k), None)))
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

  property("rangeJoin == all-pairs interval-containment filter") =
    // negative points/bounds pin floor (not truncation) cell ids; inverted
    // intervals must match nothing; a point meets each interval in exactly
    // one cell (its own), so no pair can duplicate across the explode
    forAllNoShrink(
      Gen.listOfN(15, Gen.choose(-20L, 20L)),
      Gen.listOfN(15, Gen.zip(Gen.choose(-20L, 20L), Gen.choose(-20L, 20L))),
      Gen.oneOf(1L, 3L, 7L)) { (ps, ivs, cellSize) =>
      val s = spark; import s.implicits._
      val points = ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
      val intervals = ivs.zipWithIndex.map { case ((lo, hi), j) => (j.toLong, lo, hi) }
        .toDF("iid", "lo", "hi")
      val got = RelOps.rangeJoin(points, intervals, "p", "lo", "hi", cellSize)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val expected = for {
        (p, i) <- ps.zipWithIndex
        ((lo, hi), j) <- ivs.zipWithIndex
        if lo <= hi && lo <= p && p <= hi
      } yield (i.toLong, j.toLong)
      got.length == expected.length && got.toSet == expected.toSet
    }

  property("topKPerKey == per-key sort by (score desc, id asc) take k") =
    forAllNoShrink(
      Gen.listOfN(30, Gen.zip(Gen.choose(1, 5), Gen.choose(0, 9))),
      Gen.choose(1, 4)) { (rows0, k) =>
      val s = spark; import s.implicits._
      import org.apache.spark.sql.functions.col
      // unique ids; scores collide freely so the id tie-break is exercised
      val rows = rows0.zipWithIndex.map { case ((key, sc), i) => (key, sc.toDouble, i.toLong) }
      val out = RelOps.topKPerKey(rows.toDF("k", "score", "id"), Seq("k"),
          col("score"), col("id"), k)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      val want = rows.groupBy(_._1).toSeq.flatMap { case (key, g) =>
        g.sortBy { case (_, sc, id) => (-sc, id) }.take(k).zipWithIndex
          .map { case ((_, sc, id), r) => (key, (r + 1).toLong, id, sc) }
      }
      out.toSet == want.toSet && out.length == want.length
    }

  property("mergeAggState(agg(prev), agg(delta)) == agg(prev ∪ delta)") =
    // the operator's entire claim: per-key incremental merge of
    // decomposable aggregate state equals re-aggregating the full corpus
    forAllNoShrink(
      Gen.listOfN(20, Gen.zip(Gen.choose(1, 6), Gen.choose(-50, 50))),
      Gen.listOfN(20, Gen.zip(Gen.choose(1, 6), Gen.choose(-50, 50)))) { (prevRows, deltaRows) =>
      val s = spark; import s.implicits._
      import org.apache.spark.sql.functions.{col, sum, min, max, count, lit}
      def aggOf(rows: Seq[(Int, Int)]) =
        rows.toDF("k", "v").groupBy("k").agg(
          sum(col("v")).as("s"), count(lit(1)).as("n"),
          min(col("v")).as("lo"), max(col("v")).as("hi"))
      val merged = RelOps.mergeAggState(aggOf(prevRows), aggOf(deltaRows), Seq("k"),
          sumCols = Seq("s", "n"), minCols = Seq("lo"), maxCols = Seq("hi"))
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4))).toMap
      val full = aggOf(prevRows ++ deltaRows)
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4))).toMap
      merged == full
    }

  property("diffFrames classifies exactly the brute-force added/removed/changed sets") =
    forAllNoShrink(rowsGen, rowsGen) { (p, c) =>
      val prev = df(p); val cur = df(c)
      val got = RelOps.diffFrames(prev, cur, Seq("k"))
        .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
      val pm = p.groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).min) }
      val cm = c.groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).min) }
      val want = ((pm.keySet ++ cm.keySet).flatMap { k =>
        (pm.get(k), cm.get(k)) match {
          case (None, Some(_))            => Some(k -> "added")
          case (Some(_), None)            => Some(k -> "removed")
          case (Some(a), Some(b)) if a != b => Some(k -> "changed")
          case _                          => None // unchanged keys are dropped
        }
      }).toMap
      got == want
    }

  property("histogram == brute-force integer binning (edges, out-of-range, hi-inclusive)") =
    forAllNoShrink(
      Gen.listOfN(40, Gen.choose(-15L, 15L)),
      Gen.zip(Gen.choose(-10L, -1L), Gen.choose(1L, 10L)),
      Gen.choose(1, 7)) { case (vs, (lo, hi), nBins) =>
      val s = spark; import s.implicits._
      import org.apache.spark.sql.functions.col
      val got = RelOps.histogram(vs.toDF("v"), col("v"), lo, hi, nBins)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val range = hi - lo
      // floorDiv mirrors the operator's `div` on non-negative operands;
      // hi itself lands in the last bin (the `least` clamp)
      val bins = vs.filter(v => v >= lo && v <= hi)
        .groupBy(v => math.min((v - lo) * nBins / range, nBins - 1L))
      val want = bins.map { case (b, g) =>
        b -> (g.size.toLong, lo + b * range / nBins, lo + (b + 1) * range / nBins)
      }
      got == want
    }
}
