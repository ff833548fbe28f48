package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import graft.operators.Spatial

/** Brute-force oracle for the grid-bucketed spatial joins: for random
  * point sets the 3×3-neighborhood equi join must return EXACTLY the
  * all-pairs distance filter — no pair missed at cell borders (the
  * classic off-by-one in grid schemes), none duplicated (each pair meets
  * only in the right row's home cell), boundary distance inclusive.
  * Coordinates are multiples of 0.25 and radii are binary fractions, so
  * every dist² and r² is IEEE-exact and the boundary compare is
  * deterministic. Negative coordinates exercise floor (not truncation)
  * cell ids.
  */
object SpatialProps extends Properties("Spatial") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private val coordGen: Gen[Double] = Gen.choose(-12, 12).map(_ * 0.25)
  private val pointsGen = Gen.listOfN(18, Gen.zip(coordGen, coordGen))
  private val radiusGen = Gen.oneOf(0.25, 0.5, 0.75, 1.0)

  property("radiusJoin == all-pairs distance filter (exact set, no dups)") =
    forAllNoShrink(pointsGen, pointsGen, radiusGen) { (lps, rps, radius) =>
      val s = spark; import s.implicits._
      val left = lps.zipWithIndex.map { case ((la, lo), i) => (i.toLong, la, lo) }
        .toDF("lid", "lat_l", "lon_l")
      val right = rps.zipWithIndex.map { case ((la, lo), i) => (i.toLong, la, lo) }
        .toDF("rid", "lat_r", "lon_r")
      val got = Spatial.radiusJoin(left, right, "lat_l", "lon_l", "lat_r", "lon_r", radius)
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val expected = for {
        (la, lo, i) <- lps.zipWithIndex.map { case ((a, b), i) => (a, b, i.toLong) }
        (ra, ro, j) <- rps.zipWithIndex.map { case ((a, b), j) => (a, b, j.toLong) }
        if (la - ra) * (la - ra) + (lo - ro) * (lo - ro) <= radius * radius
      } yield (i, j)
      got.length == expected.length && got.toSet == expected.toSet
    }

  property("nearestWithinRadius == brute-force argmin by (dist2, rid)") =
    forAllNoShrink(pointsGen, pointsGen, radiusGen) { (lps, rps, radius) =>
      val s = spark; import s.implicits._
      val left = lps.zipWithIndex.map { case ((la, lo), i) => (i.toLong, la, lo) }
        .toDF("lid", "lat_l", "lon_l")
      val right = rps.zipWithIndex.map { case ((la, lo), i) => (i.toLong, la, lo) }
        .toDF("rid", "lat_r", "lon_r")
      val got = Spatial.nearestWithinRadius(left, right,
          "lat_l", "lon_l", "lat_r", "lon_r", radius,
          leftKeys = Seq("lid"), tieBreak = Seq("rid"))
        .select("lid", "rid").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = lps.zipWithIndex.flatMap { case ((la, lo), i) =>
        val cands = rps.zipWithIndex
          .map { case ((ra, ro), j) =>
            ((la - ra) * (la - ra) + (lo - ro) * (lo - ro), j.toLong) }
          .filter(_._1 <= radius * radius)
        // min by (dist2, rid) — the operator's documented total order
        if (cands.isEmpty) None else Some(i.toLong -> cands.min._2)
      }.toMap
      got == expected
    }
}
