package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import graft.operators.RelOps

/** Brute-force oracles for the maintenance/diagnostic relational ops:
  * pruneUnreferenced (semi-join keep-set), unmatched (anti-join
  * complement — the two must partition the input), backfillFromJoin
  * (null-fill from the per-key MINIMUM mapping value, existing values
  * untouched), and keySkew (top-N key tally with the exact
  * integer-division skew ratio and the `<null>` key placeholder).
  */
object MaintenanceProps extends Properties("Maintenance") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private val rowsGen: Gen[List[(Int, String)]] = Gen.choose(0, 20).flatMap(m =>
    Gen.listOfN(m, Gen.zip(Gen.choose(1, 6), Gen.alphaLowerStr.map(_.take(3)))))

  property("pruneUnreferenced ∪ unmatched partitions the input by key membership") =
    forAllNoShrink(rowsGen, Gen.listOf(Gen.choose(1, 6))) { (rows, refKeys) =>
      val s = spark; import s.implicits._
      val df = rows.toDF("k", "v")
      val ref = refKeys.map(k => (k, "r")).toDF("k", "rv")
      val kept = RelOps.pruneUnreferenced(df, ref, "k")
        .collect().map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
      val gone = RelOps.unmatched(df, ref, "k")
        .collect().map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
      val refSet = refKeys.toSet
      kept == rows.filter(r => refSet(r._1)).sorted &&
        gone == rows.filterNot(r => refSet(r._1)).sorted
    }

  property("backfillFromJoin fills ONLY nulls, from the per-key minimum mapping value") =
    forAllNoShrink(
      Gen.choose(0, 15).flatMap(m => Gen.listOfN(m,
        Gen.zip(Gen.choose(1, 5), Gen.option(Gen.alphaLowerStr.map(_.take(3)))))),
      rowsGen) { (rows, mapping) =>
      val s = spark; import s.implicits._
      val df = rows.zipWithIndex.map { case ((k, v), i) => (i.toLong, k, v.orNull) }
        .toDF("id", "k", "t")
      val m = mapping.toDF("k", "mv")
      val got = RelOps.backfillFromJoin(df, m, "k", "mv", "t")
        .select("id", "k", "t")
        .collect().map(r => (r.getLong(0), r.getInt(1), Option(r.getString(2)))).toSet
      val fills = mapping.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
      val want = rows.zipWithIndex.map { case ((k, v), i) =>
        (i.toLong, k, v.orElse(fills.get(k)))
      }.toSet
      got == want
    }

  property("keySkew == driver tally (null placeholder, total order, integer skew ratio)") =
    forAllNoShrink(Gen.choose(1, 25).flatMap(m => Gen.listOfN(m,
      Gen.option(Gen.choose(1, 5)))), Gen.choose(1, 4)) { (keys, topN) =>
      val s = spark; import s.implicits._
      val df = keys.zipWithIndex.map { case (k, i) => (i.toLong, k.map(_.toString).orNull) }
        .toDF("id", "k")
      // SET compare: the (n_rows desc, key) order picks WHICH rows survive
      // the top-N deterministically, but row order is not part of the
      // contract after the totals join (the oracle compare is row-sorted
      // too)
      val got = RelOps.keySkew(df, Seq("k"), topN)
        .select("key", "n_rows", "total_rows", "n_keys", "skew_x1000")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      val tally = keys.map(_.map(_.toString).getOrElse("<null>"))
        .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
      val total = keys.size.toLong; val nKeys = tally.size.toLong
      val want = tally.toSeq.sortBy { case (k, n) => (-n, k) }.take(topN)
        .map { case (k, n) => (k, n, total, nKeys, n * 1000L / (total / nKeys)) }.toSet
      got == want
    }
}
