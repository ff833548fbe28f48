package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.AsOf

/** AsOf.asOfJoin vs a brute-force per-row scan: semantics (<= and strict <),
  * no-match nulls, and tie determinism.
  */
class AsOfSpec extends SparkSpec {

  private def fixture = {
    val s = spark; import s.implicits._
    val left = Seq(
      (1L, 10L, "p1"), (1L, 20L, "p2"), (1L, 5L, "p0"),
      (2L, 100L, "p3"), (3L, 7L, "p4"))
      .toDF("user_id", "ms", "pid")
    val right = Seq(
      (1L, 10L, 100L, 1.0), (1L, 15L, 101L, 2.0), (1L, 3L, 102L, 3.0),
      (2L, 100L, 103L, 4.0), (2L, 101L, 104L, 5.0))
      .toDF("user_id", "click_ms", "click_id", "v")
    (left, right)
  }

  test("<= picks the latest right row at-or-before each left row") {
    val (l, r) = fixture
    val out = AsOf.asOfJoin(l, r, Seq("user_id"), col("ms"), col("click_ms"),
      Seq("click_id", "v"), tieBreak = Seq("click_id"))
      .collect().map(x => (x.getLong(0), x.getLong(1), Option(x.get(3)), Option(x.get(4)))).toSet
    assert(out === Set(
      (1L, 10L, Some(100L), Some(1.0)),  // equal ord matches
      (1L, 20L, Some(101L), Some(2.0)),  // latest before
      (1L, 5L, Some(102L), Some(3.0)),
      (2L, 100L, Some(103L), Some(4.0)), // 101 is after → excluded
      (3L, 7L, None, None)))             // no right rows for key
  }

  test("strict < excludes the equal-ordinate right row") {
    val (l, r) = fixture
    val out = AsOf.asOfJoin(l, r, Seq("user_id"), col("ms"), col("click_ms"),
      Seq("click_id"), tieBreak = Seq("click_id"), strict = true)
      .collect().map(x => (x.getLong(0), x.getLong(1), Option(x.get(3)))).toSet
    assert(out.contains((1L, 10L, Some(102L)))) // 10 itself no longer eligible
    assert(out.contains((2L, 100L, None)))      // only right row was at == 100
  }

  test("right rows tying on the ordinate resolve to the last in tie-break order") {
    val s = spark; import s.implicits._
    val l = Seq((1L, 10L)).toDF("k", "ms")
    val r = Seq((1L, 10L, 7L, "a"), (1L, 10L, 9L, "b"), (1L, 10L, 8L, "c"))
      .toDF("k", "rms", "rid", "tag")
    val out = AsOf.asOfJoin(l, r, Seq("k"), col("ms"), col("rms"),
      Seq("rid", "tag"), tieBreak = Seq("rid"))
      .collect().head
    assert(out.getLong(2) === 9L && out.getString(3) === "b")
  }

  test("matches a brute-force scan on randomized data") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(42)
    val left = (0 until 200).map(i => (rnd.nextInt(10).toLong, rnd.nextInt(100).toLong, i.toLong))
    val right = (0 until 300).map(i => (rnd.nextInt(10).toLong, rnd.nextInt(100).toLong, i.toLong))
    val lDf = left.toDF("k", "ms", "lid")
    val rDf = right.toDF("k", "rms", "rid")
    val got = AsOf.asOfJoin(lDf, rDf, Seq("k"), col("ms"), col("rms"),
      Seq("rid"), tieBreak = Seq("rid"))
      .collect().map(x => (x.getLong(2), Option(x.get(3)))).toMap
    val expected = left.map { case (k, ms, lid) =>
      val cands = right.filter(r => r._1 == k && r._2 <= ms)
      lid -> (if (cands.isEmpty) None
              else Some(cands.maxBy(r => (r._2, r._3))._3))
    }.toMap
    assert(got === expected)
  }

  test("null ordinates never match: null right rows are ignored, null left rows get no match") {
    val s = spark; import s.implicits._
    val l = Seq((1L, Some(10L), "a"), (1L, None, "b")).toDF("k", "ms", "tag")
    val r = Seq((1L, Some(5L), 100L), (1L, None, 999L)).toDF("k", "rms", "rid")
    val out = AsOf.asOfJoin(l, r, Seq("k"), col("ms"), col("rms"),
      Seq("rid"), tieBreak = Seq("rid"))
      .collect().map(x => (x.getString(2), Option(x.get(3)))).toMap
    assert(out("a") === Some(100L)) // the null-ord right row (999) is invisible
    assert(out("b") === None)       // a null left ordinate matches nothing
  }

  test("null KEYS never equi-match: null-key left rows emit unmatched, null-key right rows are invisible") {
    // SQL ASOF LEFT JOIN semantics (NULL ≠ NULL): even though
    // Window.partitionBy groups NULL keys together, a null-key right row
    // must never be carried onto a null-key left row
    val s = spark; import s.implicits._
    val l = Seq((Some(1L), 10L, "a"), (None: Option[Long], 10L, "b"))
      .toDF("k", "ms", "tag")
    val r = Seq((Some(1L), 5L, 100L), (None: Option[Long], 5L, 999L))
      .toDF("k", "rms", "rid")
    val out = AsOf.asOfJoin(l, r, Seq("k"), col("ms"), col("rms"),
      Seq("rid"), tieBreak = Seq("rid"))
      .collect().map(x => (x.getString(2), Option(x.get(3)))).toMap
    assert(out.size === 2)          // null-key left row still emitted once
    assert(out("a") === Some(100L))
    assert(out("b") === None)       // NOT 999 — null-key right row invisible
  }

  test("asOfEnrich: streaming across micro-batches == batch == AsOf.asOfJoin") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark; import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    // (event_id, ts_s, user_id, event_type, value)
    val b1 = Seq((1L, "2026-01-01 10:00:00", 7L, "click", 1.5),
                 (2L, "2026-01-01 10:01:00", 7L, "purchase", 9.0),
                 (3L, "2026-01-01 10:02:00", 8L, "purchase", 2.0)) // no click yet
    val b2 = Seq((4L, "2026-01-01 10:03:00", 7L, "click", 2.5),
                 (5L, "2026-01-01 10:04:00", 7L, "purchase", 1.0), // sees click 4 from b2
                 (6L, "2026-01-01 10:05:00", 8L, "purchase", 3.0)) // still no click for 8
    def mkDf(df: org.apache.spark.sql.DataFrame) = df
      .toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")

    val mem = MemoryStream[(Long, String, Long, String, Double)]
    val q = graft.streaming.EventsStream.asOfEnrich(mkDf(mem.toDF()))
      .toDF("user_id", "event_id", "ms", "click_id", "click_ms", "click_value")
      .writeStream.format("memory").queryName("asof_out").outputMode("append").start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("asof_out").collect()
      .map(r => (r.getLong(1), Option(r.get(3)))).toMap
    assert(streamed === Map(
      2L -> Some(1L), 3L -> None, 5L -> Some(4L), 6L -> None))

    // in-order replay == one batch pass == the batch as-of join operator
    val all = mkDf((b1 ++ b2).toDF())
    val batch = graft.streaming.EventsStream.asOfEnrich(all)
      .collect().map(t => (t._2, t._4)).toMap
    assert(batch === streamed)
    val viaJoin = AsOf.asOfJoin(
      all.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms")),
      all.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          unix_millis(col("ts")).as("click_ms")),
      Seq("user_id"), col("ms"), col("click_ms"),
      Seq("click_id"), tieBreak = Seq("click_id"))
      .collect().map(r => (r.getLong(1), Option(r.get(3)))).toMap
    assert(viaJoin === streamed)
  }

  test("asOfEnrich never leaks a future right event onto a late-arriving left event") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark; import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    def mkDf(df: org.apache.spark.sql.DataFrame) = df
      .toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val mem = MemoryStream[(Long, String, Long, String, Double)]
    val q = graft.streaming.EventsStream.asOfEnrich(mkDf(mem.toDF()))
      .toDF("user_id", "event_id", "ms", "click_id", "click_ms", "click_value")
      .writeStream.format("memory").queryName("asof_late").outputMode("append").start()
    try {
      // batch 1: a click at 10:05
      mem.addData((1L, "2026-01-01 10:05:00", 7L, "click", 1.0)); q.processAllAvailable()
      // batch 2: a LATE purchase at 10:01 — before the only click seen.
      // Attaching click 1 would hand the model data from its future.
      mem.addData((2L, "2026-01-01 10:01:00", 7L, "purchase", 5.0)); q.processAllAvailable()
    } finally q.stop()
    val row = spark.table("asof_late").collect().head
    assert(row.getLong(1) === 2L && row.get(3) == null,
      s"late purchase must get NO match, got click ${row.get(3)}")
  }

  test("plan shuffles once on the key — no range join, no cartesian") {
    val (l, r) = fixture
    val plan = AsOf.asOfJoin(l, r, Seq("user_id"), col("ms"), col("click_ms"),
      Seq("click_id"), tieBreak = Seq("click_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
    // one window over the union — the as-of itself adds exactly one exchange
    assert(plan.contains("Window"), plan)
  }
}
