package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink

/** Brute-force oracle for the retention triangle: random event streams —
  * including pre-1970 timestamps, where the exact-floor week idiom
  * (subtract the pmod remainder, then divide) differs from bare
  * truncating division — written to a real parquet dir and run through
  * the registered query, against a driver-side floorDiv tally.
  */
object RetentionProps extends Properties("Retention") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session
  private val WeekMs = 604800000L

  private val query = EventQueries.registry
    .collectFirst { case ("retention_cohorts", q, _) => q }.get

  private val eventsGen: Gen[List[(Long, Long)]] = Gen.choose(1, 30).flatMap(m =>
    Gen.listOfN(m, Gen.zip(
      Gen.choose(1L, 5L),
      // ms around the epoch in both directions: ±4 weeks, so negative
      // weeks and the (−week, 0) band are routinely exercised
      Gen.choose(-4L * WeekMs, 4L * WeekMs))))

  property("retention_cohorts == driver-side floorDiv week triangle (incl. pre-1970)") =
    forAllNoShrink(eventsGen) { rows =>
      val s = spark; import s.implicits._
      val dir = java.nio.file.Files.createTempDirectory("retention").toString
      rows.zipWithIndex.map { case ((u, ms), i) =>
        (i.toLong, new java.sql.Timestamp(ms), u, "click", 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")

      val got = query(s, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

      val byWeek = rows.map { case (u, ms) => (u, Math.floorDiv(ms, WeekMs)) }.distinct
      val cohort = byWeek.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).min }
      val want = byWeek.groupBy { case (u, w) => (cohort(u), w - cohort(u)) }
        .map { case ((c, off), g) => (c, off, g.map(_._1).distinct.size.toLong) }.toSet

      got == want
    }
}
