package graft

import org.apache.spark.sql.functions._
import graft.operators.Funnel
import graft.streaming.EventsStream

/** operators.Funnel (batch) and EventsStream.funnelProgress (twin). */
class FunnelSpec extends SparkSpec {

  private def ev(rows: Seq[(Long, Long, String, Long)]) = {
    val s = spark; import s.implicits._
    rows.toDF("user_id", "event_id", "event_type", "ms")
      .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
  }

  private def collectFunnel(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      (r.getLong(0),
        (0 to 2).map(i => if (r.isNullAt(i + 1)) None else Some(r.getLong(i + 1))),
        r.getLong(4))
    }.map(t => t._1 -> ((t._2(0), t._2(1), t._2(2)), t._3)).toMap

  test("funnel: ordered-step semantics, ties, out-of-order, non-step users excluded") {
    val rows = Seq(
      // user 1: clean conversion
      (1L, 1L, "view", 100L), (1L, 2L, "click", 200L), (1L, 3L, "purchase", 300L),
      // user 2: purchase and click BEFORE the first view — depth 1 only
      (2L, 4L, "purchase", 100L), (2L, 5L, "click", 200L), (2L, 6L, "view", 300L),
      // user 3: early click ignored; later click + purchase complete it
      (3L, 7L, "click", 100L), (3L, 8L, "view", 200L), (3L, 9L, "click", 250L),
      (3L, 10L, "purchase", 260L),
      // user 4: skips the click step — purchase can't count
      (4L, 11L, "view", 100L), (4L, 12L, "purchase", 200L),
      // user 5: same-ms tie — click's higher id orders it AFTER the view
      (5L, 13L, "view", 100L), (5L, 14L, "click", 100L),
      // user 6: only non-step events → excluded from the output
      (6L, 15L, "signup", 100L))
    val out = collectFunnel(Funnel.funnel(ev(rows)))
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L))
    assert(out(1L) === (((Some(100L), Some(200L), Some(300L)), 3L)))
    assert(out(2L) === (((Some(300L), None, None), 1L)))
    assert(out(3L) === (((Some(200L), Some(250L), Some(260L)), 3L)))
    assert(out(4L) === (((Some(100L), None, None), 1L)))
    assert(out(5L) === (((Some(100L), Some(100L), None), 2L)))
  }

  test("funnel == brute-force reference on randomized events") {
    val rnd = new scala.util.Random(42)
    val types = Seq("view", "click", "purchase", "signup", "error")
    val rows = (0 until 2000).map { i =>
      ((rnd.nextInt(40) + 1).toLong, i.toLong, types(rnd.nextInt(types.length)),
        1000L + rnd.nextInt(500).toLong) // dense ms range forces ties
    }
    val steps = Seq("view", "click", "purchase")
    val expected = rows.filter(r => steps.contains(r._3)).groupBy(_._1).map { case (u, es) =>
      val sorted = es.sortBy(e => (e._4, e._2 % (1L << 20)))
      var done = Vector.empty[(Long, Long)] // (ms, key)
      sorted.foreach { e =>
        val key = e._4 * (1L << 20) + e._2 % (1L << 20)
        if (done.length < 3 && e._3 == steps(done.length) && done.lastOption.forall(_._2 < key))
          done :+= ((e._4, key))
      }
      u -> ((done.lift(0).map(_._1), done.lift(1).map(_._1), done.lift(2).map(_._1)),
        done.length.toLong)
    }
    assert(collectFunnel(Funnel.funnel(ev(rows))) === expected)
  }

  test("funnelProgress (batch mode) == funnel") {
    val rnd = new scala.util.Random(7)
    val types = Seq("view", "click", "purchase", "signup")
    val rows = (0 until 1000).map { i =>
      ((rnd.nextInt(25) + 1).toLong, i.toLong, types(rnd.nextInt(types.length)),
        1000L + rnd.nextInt(300).toLong)
    }
    val s = spark; import s.implicits._
    val twin = EventsStream.funnelProgress(ev(rows))
      .toDF("user_id", "view_ms", "click_ms", "purchase_ms", "depth")
    assert(collectFunnel(twin) === collectFunnel(Funnel.funnel(ev(rows))))
  }

  test("funnelProgress accumulates across micro-batches (state survives)") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, String, Long)]
    val streamDf = mem.toDF().toDF("user_id", "event_id", "event_type", "ms")
      .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
    val q = EventsStream.funnelProgress(streamDf)
      .toDF("user_id", "view_ms", "click_ms", "purchase_ms", "depth")
      .writeStream.format("memory").queryName("funnel_out").outputMode("update").start()
    try {
      mem.addData((9L, 1L, "view", 100L))
      q.processAllAvailable()
      // click arrives in a LATER micro-batch: the view completion must be
      // remembered in state for the chain to advance
      mem.addData((9L, 2L, "click", 200L), (9L, 3L, "purchase", 150L))
      q.processAllAvailable()
      // purchase at ms=150 preceded the click (key order) → not counted;
      // a later purchase completes the funnel
      mem.addData((9L, 4L, "purchase", 300L))
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("funnel_out").collect()
      .map(r => (r.getLong(0), r.getLong(4))).groupBy(_._1)
      .map { case (u, rs) => u -> rs.map(_._2).max }
    assert(last === Map(9L -> 3L))
  }

  test("step timestamps are exact at production id ranges (div, not double /)") {
    // event_id mod 2^20 = 1048575 puts the packed key's remainder at the
    // top of its range; with 2024-epoch ms the key is ~2^60, past
    // double's 2^53 exact range (ulp 256), so Column `/` would round the
    // quotient up one millisecond. Fixture ids (< 10^5) can't catch this.
    val ms = 1704067798778L
    val rows = Seq(
      (1L, 1048575L, "view", ms),
      (1L, 2097151L, "click", ms + 10),
      (1L, 3145727L, "purchase", ms + 20))
    val out = collectFunnel(Funnel.funnel(ev(rows)))
    assert(out(1L) === (((Some(ms), Some(ms + 10), Some(ms + 20)), 3L)))
    val s = spark; import s.implicits._
    val twin = EventsStream.funnelProgress(ev(rows))
      .toDF("user_id", "view_ms", "click_ms", "purchase_ms", "depth")
    assert(collectFunnel(twin) === out)
  }

  test("pre-1970 timestamps decode exactly (floor division, not truncation)") {
    // negative epoch-ms: truncating division decodes one ms too high
    val rows = Seq(
      (1L, 1L, "view", -5000L), (1L, 2L, "click", -1L), (1L, 3L, "purchase", 100L))
    val out = collectFunnel(Funnel.funnel(ev(rows)))
    assert(out(1L) === (((Some(-5000L), Some(-1L), Some(100L)), 3L)))
    val s = spark; import s.implicits._
    val twin = EventsStream.funnelProgress(ev(rows))
      .toDF("user_id", "view_ms", "click_ms", "purchase_ms", "depth")
    assert(collectFunnel(twin) === out)
  }

  test("funnelProgress out-of-order arrivals degrade conservatively, never rewrite") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, String, Long)]
    val streamDf = mem.toDF().toDF("user_id", "event_id", "event_type", "ms")
      .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
    val q = EventsStream.funnelProgress(streamDf)
      .toDF("user_id", "view_ms", "click_ms", "purchase_ms", "depth")
      .writeStream.format("memory").queryName("funnel_ooo").outputMode("update").start()
    def lastDepth(): Map[Long, Long] = spark.table("funnel_ooo").collect()
      .map(r => (r.getLong(0), r.getLong(4))).groupBy(_._1)
      .map { case (u, rs) => u -> rs.map(_._2).max }
    try {
      mem.addData((1L, 1L, "view", 100L))
      q.processAllAvailable()
      // purchase arrives while click is still awaited: must NOT count
      mem.addData((1L, 2L, "purchase", 300L))
      q.processAllAvailable()
      assert(lastDepth() === Map(1L -> 1L))
      // the click arrives LATE but with a key after the view completion:
      // still counts (conservative degradation, not a rewind)
      mem.addData((1L, 3L, "click", 200L))
      q.processAllAvailable()
      assert(lastDepth() === Map(1L -> 2L))
      // a click whose key precedes the recorded view completion is
      // ignored — completions never rewrite
      mem.addData((1L, 4L, "click", 50L))
      q.processAllAvailable()
      assert(lastDepth() === Map(1L -> 2L))
      // a fresh purchase after the click completion finishes the funnel
      mem.addData((1L, 5L, "purchase", 400L))
      q.processAllAvailable()
      assert(lastDepth() === Map(1L -> 3L))
    } finally q.stop()
  }

  test("funnel plans one exchange: the user_id shuffle feeds windows AND the collapse") {
    val plan = Funnel.funnel(ev(Seq((1L, 1L, "view", 100L)))).queryExecution
      .executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected a single user_id shuffle, got $exchanges:\n$plan")
  }
}
