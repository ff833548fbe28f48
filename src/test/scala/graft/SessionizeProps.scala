package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import graft.streaming.EventsStream

/** Brute-force oracle for batch sessionization: an ordered driver-side
  * fold over each user's events (sorted by (ms, event_id) — the same
  * total order the window uses) splits sessions on the
  * strictly-greater-than-gap rule and must reproduce the operator's
  * (user, session_no, n_events, start_ms, end_ms) rows exactly —
  * including boundary events landing EXACTLY at the gap (same session)
  * and same-millisecond events tie-broken by event id.
  */
object SessionizeProps extends Properties("Sessionize") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private val gapMinutes = 2
  private val gapMs = gapMinutes * 60000L

  // millis drawn from a few gap-widths so runs produce multi-session
  // users, exact-boundary deltas (ms == gap), and same-ms ties
  private val eventGen: Gen[(String, Long)] = for {
    u <- Gen.oneOf("u1", "u2", "u3")
    ms <- Gen.oneOf(Gen.choose(0L, 6 * gapMs), Gen.oneOf(0L, gapMs, 2 * gapMs, 2 * gapMs + 1))
  } yield (u, ms)

  property("sessionize == driver-side ordered gap fold") =
    forAllNoShrink(Gen.choose(1, 40).flatMap(m => Gen.listOfN(m, eventGen))) { evs =>
      val s = spark; import s.implicits._
      val rows = evs.zipWithIndex.map { case ((u, ms), i) =>
        (i.toLong, u, new java.sql.Timestamp(ms)) }
      val got = EventsStream.sessionize(
          rows.toDF("event_id", "user_id", "ts"), gapMinutes = gapMinutes)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet

      val want = rows.groupBy(_._2).toSeq.flatMap { case (u, es) =>
        val ordered = es.map { case (id, _, ts) => (ts.getTime, id) }.sortBy(identity)
        val sessions = ordered.foldLeft(Vector.empty[Vector[Long]]) {
          case (acc, (ms, _)) =>
            if (acc.nonEmpty && ms - acc.last.last <= gapMs) acc.init :+ (acc.last :+ ms)
            else acc :+ Vector(ms)
        }
        sessions.zipWithIndex.map { case (msList, i) =>
          (u, (i + 1).toLong, msList.size.toLong, msList.min, msList.max)
        }
      }.toSet

      got == want
    }
}
