package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import org.apache.spark.sql.functions._
import graft.streaming.EventsStream

/** The distributed flatMapGroupsWithState boundary-crossing alerts must
  * agree with a straightforward in-memory fold on arbitrary event streams —
  * including negative values (totals that fall and re-cross a boundary
  * alert again) and events that jump several boundaries at once.
  */
object SpendAlertsProps extends Properties("SpendAlerts") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private val Step = 1000L

  // (user, ms, value): cents-friendly doubles, a handful of users, events
  // deliberately landing on duplicate timestamps (event_id breaks the tie)
  private val eventsGen: Gen[List[(Long, Long, Double)]] =
    Gen.listOfN(24, Gen.zip(
      Gen.choose(1L, 4L),
      Gen.choose(0L, 5L).map(_ * 60000L),
      Gen.choose(-3000, 3000).map(_ / 100.0)))

  private def oracle(events: Seq[(Long, Long, Long, Double)]): Set[(Long, Long, Long)] =
    events.groupBy(_._1).iterator.flatMap { case (u, es) =>
      var cum = 0L
      es.sortBy(e => (e._2, e._3)).flatMap { e =>
        val prev = cum
        cum += EventsStream.halfUpCents(e._4)
        (Math.floorDiv(prev, Step) + 1 to Math.floorDiv(cum, Step))
          .map(m => (u, m * Step, e._3))
      }
    }.toSet

  property("batch spendAlerts == in-memory ordered fold") =
    forAllNoShrink(eventsGen) { raw =>
      val s = spark; import s.implicits._
      // unique event ids give (ms, event_id) a total order per user
      val events = raw.zipWithIndex.map { case ((u, ms, v), i) => (u, ms, i.toLong, v) }
      val df = events.toDF("user_id", "ms", "event_id", "value")
        .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
      val got = EventsStream.spendAlerts(df, Step).collect().toSet
      got == oracle(events)
    }
}
