package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import graft.operators.Funnel

/** Brute-force oracle for the chained-window funnel: per user, step k's
  * first completion strictly after step k−1's, re-derived as a driver
  * fold over the same packed (ms · 2²⁰ + id mod 2²⁰) order. Generated
  * events include same-millisecond ties (id tie-break), out-of-order
  * steps, NEGATIVE (pre-1970) timestamps — the packed key's floor-
  * division edge — null timestamps (never complete a step, but keep the
  * user in the output), and non-step event types (filtered out, and a
  * user with only those must NOT appear).
  */
object FunnelProps extends Properties("Funnel") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private val Steps = Seq("view", "click", "purchase")
  private val TieMod = 1L << 20

  private val eventGen = Gen.zip(
    Gen.choose(1, 4),
    Gen.oneOf("view", "click", "purchase", "other"),
    Gen.frequency(8 -> Gen.choose(-3L, 5L).map(Option(_)), 1 -> Gen.const(Option.empty[Long])))
  private val eventsGen = Gen.listOfN(30, eventGen)

  property("funnel == driver-side ordered fold (ties, pre-1970, null ts)") =
    forAllNoShrink(eventsGen) { evs =>
      val s = spark; import s.implicits._
      import org.apache.spark.sql.functions.{col, expr}
      val rows = evs.zipWithIndex
        .map { case ((u, t, ms), i) => (u.toLong, t, ms, i.toLong) }
      val df = rows.toDF("user_id", "event_type", "ms", "event_id")
        .withColumn("ts", expr("timestamp_millis(ms)")).drop("ms")
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))

      val out = Funnel.funnel(df).collect().map { r =>
        r.getLong(0) -> (
          Steps.indices.map(i => if (r.isNullAt(1 + i)) None else Some(r.getLong(1 + i))),
          r.getLong(1 + Steps.size))
      }.toMap

      val expected = rows
        .filter { case (_, t, _, _) => Steps.contains(t) }
        .groupBy(_._1).map { case (u, g) =>
          def key(ms: Long, id: Long) = ms * TieMod + java.lang.Math.floorMod(id, TieMod)
          val firsts = Steps.foldLeft(Seq.empty[Option[Long]]) { (acc, st) =>
            val after = acc.lastOption match {
              case Some(None)    => None // previous step never completed
              case Some(Some(p)) => Some(p)
              case None          => Some(Long.MinValue) // first step: no lower bound
            }
            val t = after.flatMap { lo =>
              val ks = g.collect { case (_, `st`, Some(ms), id) if key(ms, id) > lo => key(ms, id) }
              if (ks.isEmpty) None else Some(ks.min)
            }
            acc :+ t
          }
          val ms = firsts.map(_.map(k => java.lang.Math.floorDiv(k, TieMod)))
          val depth = firsts.takeWhile(_.isDefined).size.toLong
          u -> ((ms, depth))
        }
      out == expected
    }
}
