package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import org.apache.spark.sql.functions.col
import graft.operators.AsOf

/** Brute-force oracle for the union-sort as-of join: for random
  * left/right sets — dense ordinate ties, null keys, null ordinates,
  * strict and non-strict — every left row must carry exactly the right
  * row a driver-side scan picks: max (ordinate, tieBreak) among
  * same-key rows with ordinate <= (or <) the left ordinate. The window
  * construction (side bits, null routing, tie frames) has example specs
  * in AsOfSpec; this pins the semantics against an implementation-free
  * restatement.
  */
object AsOfProps extends Properties("AsOf") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session

  // small alphabets force key collisions and ordinate ties; None rates
  // exercise the null-key / null-ordinate routing
  private val keyGen = Gen.frequency(9 -> Gen.oneOf("a", "b", "c").map(Option(_)),
    1 -> Gen.const(Option.empty[String]))
  private val ordGen = Gen.frequency(9 -> Gen.choose(0L, 8L).map(Option(_)),
    1 -> Gen.const(Option.empty[Long]))
  private val rowsGen = Gen.listOfN(24, Gen.zip(keyGen, ordGen))

  property("every left row carries the brute-force as-of match; no row lost or duplicated") =
    forAllNoShrink(rowsGen, rowsGen, Gen.oneOf(true, false)) { (ls, rs, strict) =>
      val s = spark; import s.implicits._
      val left = ls.zipWithIndex
        .map { case ((k, ts), i) => (k, ts, i.toLong) }.toDF("k", "lts", "lid")
      val rights = rs.zipWithIndex
        .map { case ((k, ts), i) => (k, ts, i.toLong, s"v$i") }
      val right = rights.toDF("k", "rts", "rid", "v")

      val out = AsOf.asOfJoin(left, right, Seq("k"), col("lts"), col("rts"),
          payloadCols = Seq("rid", "v"), tieBreak = Seq("rid"), strict = strict)
        .collect()
      val got = out.map(r => r.getLong(2) ->
          (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getString(4)))))
        .toMap

      val expected = ls.zipWithIndex.map { case ((lk, lts), i) =>
        val m = for {
          k <- lk; t <- lts
          best <- rights.filter { case (rk, rts, _, _) =>
            rk.contains(k) && rts.exists(rt => if (strict) rt < t else rt <= t)
          }.sortBy { case (_, rts, rid, _) => (rts.get, rid) }.lastOption
        } yield (best._3, best._4)
        i.toLong -> m
      }.toMap

      out.length == ls.size && got == expected
    }
}
