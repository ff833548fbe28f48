package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{FixtureFetcher, PageFetcher, ScanSpec}
import graft.sources.v2.FetcherRegistry

/** Records every ScanSpec the source receives. Top-level (NOT an inner
  * class of the suite): PageFetchers serialize to executors, and an inner
  * class would drag the non-serializable ScalaTest engine along via $outer.
  */
private[graft] class RecordingFetcher(rows: Seq[Row], schema: StructType)
    extends PageFetcher {
  private val inner = new FixtureFetcher(rows, schema)
  @volatile var lastCountSpec: ScanSpec = _
  // NOTE: count() runs on the DRIVER (planning); fetch() runs on a
  // deserialized executor-side COPY, so recording anything there into
  // this instance would assert nothing — page counts are verified via
  // the plan's BatchScanExec partitions instead
  override def count(spec: ScanSpec): Long = { lastCountSpec = spec; inner.count(spec) }
  override def fetch(offset: Long, limit: Int, spec: ScanSpec): Iterator[Row] =
    inner.fetch(offset, limit, spec)
}

/** Throws an ESRI-498-style TokenExpired from every count/fetch until
  * refreshAuth() is called on THIS instance. Each executor-side
  * deserialized copy starts unauthenticated too, so every partition
  * exercises the expire → re-auth → retry path independently — the
  * assertion is output completeness, which holds regardless of where the
  * copies live.
  */
private[graft] class ExpiringFetcher(rows: Seq[Row], schema: StructType)
    extends PageFetcher {
  private val inner = new FixtureFetcher(rows, schema)
  @volatile private var authed = false
  private def guard(): Unit =
    if (!authed) throw new graft.util.Retry.TokenExpired("498: invalid token")
  override def refreshAuth(): Unit = authed = true
  override def count(spec: ScanSpec): Long = { guard(); inner.count(spec) }
  override def fetch(offset: Long, limit: Int, spec: ScanSpec): Iterator[Row] = {
    guard()
    inner.fetch(offset, limit, spec)
  }
}

/** Fails loudly on any page fetch — proves a pushed-down COUNT(*) never
  * touches the page endpoint (the reference's returnCountOnly contract).
  */
private[graft] class CountOnlyFetcher(rows: Seq[Row], schema: StructType)
    extends PageFetcher {
  private val inner = new FixtureFetcher(rows, schema)
  override def count(spec: ScanSpec): Long = inner.count(spec)
  override def fetch(offset: Long, limit: Int, spec: ScanSpec): Iterator[Row] =
    throw new IllegalStateException("page fetch must not happen under COUNT(*) pushdown")
}

/** The DataSource V2 face: Catalyst must drive ScanSpec pushdown by itself. */
class V2SourceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("seg", StringType),
    StructField("v", LongType), StructField("wm", StringType)))

  private def rows = (0 until 100).map(i =>
    Row(s"k$i", if (i % 3 == 0) "A" else "B", i.toLong, f"2026-01-${i % 28 + 1}%02d"))

  private def readV2(name: String, pageSize: Int = 10) =
    spark.read.format("graft.sources.v2.PagedTableProvider")
      .option("fetcher", name).option("pageSize", pageSize.toString).load()

  test("key-set (In) and column pruning reach the fetcher as ScanSpec pushdown") {
    val f = new RecordingFetcher(rows, schema)
    FetcherRegistry.register("rec1", f, schema)
    val out = readV2("rec1")
      .filter(col("seg").isin("A"))
      .select("k", "v")
      .collect()
    assert(out.length === 34)
    assert(f.lastCountSpec.keys === Some("seg" -> Set("A")))
    // projection reached the source: only the referenced columns cross the wire
    assert(f.lastCountSpec.columns.exists(_.toSet == Set("k", "v", "seg")) ||
      f.lastCountSpec.columns.exists(_.toSet == Set("k", "v")),
      s"columns not pruned: ${f.lastCountSpec.columns}")
  }

  test("string >= watermark predicate pushes as structural lowerBound; others stay post-scan") {
    val f = new RecordingFetcher(rows, schema)
    FetcherRegistry.register("rec2", f, schema)
    val out = readV2("rec2")
      .filter(col("wm") >= "2026-01-20" && col("v") % 2 === 0)
      .select("k", "wm", "v").collect()
    assert(f.lastCountSpec.lowerBound === Some("wm" -> "2026-01-20"))
    assert(f.lastCountSpec.whereClause === None)
    // the numeric predicate was NOT pushable — Spark must still apply it
    val expected = rows.filter(r => r.getString(3) >= "2026-01-20" && r.getLong(2) % 2 == 0)
    assert(out.length === expected.length)
  }

  test(">= pushdown: non-ASCII boundary matches the plain DataFrame path") {
    // supplementary characters are where Java's UTF-16 code-unit order and
    // Spark's UTF8String byte order DISAGREE: surrogate pairs (0xD800-) sort
    // below U+E000 in UTF-16 but above it in UTF-8. A Java-String pre-filter
    // would over-drop these rows, and no post-scan re-check can resurrect
    // them — the fetcher must compare in UTF-8 byte order.
    val vals = Seq("", "￿", "𐀀", "😀", "abc")
    val nrows = vals.zipWithIndex.map { case (s, i) => Row(s"k$i", "A", i.toLong, s) }
    val f = new RecordingFetcher(nrows, schema)
    FetcherRegistry.register("rec6", f, schema)
    val bound = ""
    val got = readV2("rec6").filter(col("wm") >= bound).select("k").collect().map(_.getString(0)).toSet
    val plain = spark.createDataFrame(
      spark.sparkContext.parallelize(nrows), schema)
      .filter(col("wm") >= bound).select("k").collect().map(_.getString(0)).toSet
    assert(got === plain)
    assert(got === Set("k0", "k1", "k2", "k3")) // all four non-ASCII rows survive
  }

  test(">= pushdown: a value containing \">=\" round-trips structurally") {
    val vals = Seq("a>=a", "a>=c", "z", "a")
    val nrows = vals.zipWithIndex.map { case (s, i) => Row(s"k$i", "A", i.toLong, s) }
    val f = new RecordingFetcher(nrows, schema)
    FetcherRegistry.register("rec7", f, schema)
    val bound = "a>=b"
    val got = readV2("rec7").filter(col("wm") >= bound).select("k").collect().map(_.getString(0)).toSet
    val plain = spark.createDataFrame(
      spark.sparkContext.parallelize(nrows), schema)
      .filter(col("wm") >= bound).select("k").collect().map(_.getString(0)).toSet
    assert(f.lastCountSpec.lowerBound === Some("wm" -> "a>=b"))
    assert(got === plain)
    assert(got === Set("k1", "k2"))
  }

  /** Planned page count straight from the V2 scan node — the executor-side
    * fetcher is a deserialized COPY, so recording offsets into the driver's
    * instance (the first version of this test) asserts nothing.
    */
  private def plannedPages(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputPartitions.size
    }.getOrElse(fail("no BatchScanExec in plan"))

  test("pageSize option is honored: pages become input partitions") {
    FetcherRegistry.register("rec3a", new RecordingFetcher(rows, schema), schema)
    assert(plannedPages(readV2("rec3a", pageSize = 10)) === 10) // 100 rows / 10
  }

  test("pushed limit caps the planned pages") {
    FetcherRegistry.register("rec3b", new RecordingFetcher(rows, schema), schema)
    val df = readV2("rec3b", pageSize = 10).limit(25)
    assert(df.count() === 25)
    assert(plannedPages(df) === 3) // ceil(25/10), not the 10 full pages
  }

  test("two pushable filters: one takes the ScanSpec slot, the other still applies post-scan") {
    val f = new RecordingFetcher(rows, schema)
    FetcherRegistry.register("rec5", f, schema)
    // seg='A' rows are k0,k3,k6,... — k1 is seg='B', so the result is EMPTY
    // if BOTH equality filters survive. A pushdown that claims both but
    // keeps only the last returns [k1] (the bug this guards against).
    val out = readV2("rec5")
      .filter(col("seg") === "A" && col("k") === "k1")
      .collect()
    assert(out.isEmpty)
    // exactly one of the two occupies the single key slot
    assert(f.lastCountSpec.keys.exists(k => k == ("seg" -> Set("A")) || k == ("k" -> Set("k1"))))
  }

  test("COUNT(*) pushes completely: one remote count, pages never fetched") {
    FetcherRegistry.register("cntonly", new CountOnlyFetcher(rows, schema), schema)
    val df = readV2("cntonly")
    // plain count: CountOnlyFetcher throws on any page fetch, so this
    // passing PROVES the scan became one count call
    assert(df.count() === 100L)
    assert(df.groupBy().count().queryExecution.executedPlan.toString
      .contains("PagedCountScan"))
    // exact key-set pushdown composes: the In filter reaches ScanSpec.keys
    // and the count stays remote
    assert(df.filter(col("k").isin("k1", "k2", "k5")).count() === 3L)
  }

  test("DISTINCT pushes as a group-by-only aggregate: ScanSpec.distinct reaches the scan") {
    val rec = new RecordingFetcher(rows, schema)
    FetcherRegistry.register("dstfx", rec, schema)
    val df = readV2("dstfx").select("seg").distinct()
    assert(df.collect().map(_.getString(0)).sorted.toSeq === Seq("A", "B"))
    // the count that plans pagination saw the DISTINCT projection
    assert(rec.lastCountSpec.distinct === true)
    assert(rec.lastCountSpec.columns === Some(Seq("seg")))
    // complete pushdown: Spark must not re-aggregate the two rows
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate"), s"re-aggregation planned:\n$plan")
    // composes with an exact key filter; a residual filter refuses instead
    assert(readV2("dstfx").filter(col("k") === "k3").select("seg").distinct()
      .collect().map(_.getString(0)).toSeq === Seq("A"))
    assert(rec.lastCountSpec.distinct === true)
    assert(rec.lastCountSpec.keys === Some("k" -> Set("k3")))
    val res = readV2("dstfx").filter(col("v") > 90).select("seg").distinct()
    assert(res.collect().map(_.getString(0)).sorted.toSeq === Seq("A", "B"))
    assert(rec.lastCountSpec.distinct === false) // residual filter → refused
  }

  test("COUNT(*) refuses pushdown when a residual filter would make it overcount") {
    FetcherRegistry.register("cntres", new FixtureFetcher(rows, schema), schema)
    val df = readV2("cntres")
    // wm >= is pushed only CONSERVATIVELY (echoed back as residual), so the
    // aggregate must stay in Spark and count post-filter rows exactly
    val filtered = df.filter(col("wm") >= "2026-01-15")
    val expected = rows.count(r => r.getString(3) >= "2026-01-15").toLong
    assert(filtered.count() === expected)
    assert(!filtered.groupBy().count().queryExecution.executedPlan.toString
      .contains("PagedCountScan"))
    // a non-pushable predicate refuses too
    assert(df.filter(col("v") % 2 === 0).count() === 50L)
  }

  test("498-style token expiry mid-scan: re-auth + retry returns complete, correct rows") {
    // planning-time count AND every partition's fetch each hit an expired
    // token first; the reader's Retry wiring must refreshAuth and retry
    // rather than fail the scan or drop the page
    FetcherRegistry.register("rec8", new ExpiringFetcher(rows, schema), schema)
    val got = readV2("rec8").collect().map(_.toSeq).toSet
    assert(got === rows.map(_.toSeq).toSet)
  }

  test("graded paged_count: pushes to PagedCountScan AND survives a count-on-top wrapper") {
    val dir = "/root/testdata/sf0.001"
    val q = SparkEntry.queries("paged_count")(spark, dir)
    // the lambda itself requires PagedCountScan; re-assert here so the
    // proof survives a future refactor of that require
    assert(q.queryExecution.executedPlan.toString.contains("PagedCountScan"))
    val expected = sources.Tables.customer(spark, dir)
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY")).count()
    assert(q.collect().map(_.getLong(0)).toSeq === Seq(expected))
    // Bench/Scratch wrap every graded query in .count(): the inner
    // aggregate's output goes dead, Spark strips its CountStar, and the
    // scan legitimately pages — the row must still evaluate, not throw
    assert(q.count() === 1L)
  }

  test("graded paged_distinct: complete pushdown (no re-agg) AND survives count-on-top") {
    val dir = "/root/testdata/sf0.001"
    val q = SparkEntry.queries("paged_distinct")(spark, dir)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate"), s"re-aggregation planned:\n$plan")
    val expected = sources.Tables.customer(spark, dir)
      .select("c_mktsegment", "c_nationkey").distinct().count()
    // count-on-top still needs the distinct rows, so the pushdown holds
    // (DistinctOnlyFixture throws on any non-distinct fetch)
    assert(q.count() === expected)
  }

  test("TopN pushes: fetcher receives the ordering spec, planned pages cap at k, no full scan") {
    val rec = new RecordingFetcher(rows, schema)
    FetcherRegistry.register("topnfx", rec, schema)
    val df = readV2("topnfx", pageSize = 10).select("k", "v").orderBy(col("v").desc).limit(7)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === (93 to 99).reverse.map(i => (s"k$i", i.toLong)))
    // the planning count saw the ordered cap: (col, descending, nullsLast)
    // — Spark's desc default is NULLS LAST
    assert(rec.lastCountSpec.topN === Some(Seq(("v", true, true)) -> 7))
    // one page, not ten: count(spec) reflects the cap
    assert(plannedPages(df) === 1)
    // composes with an exact key filter
    val keyed = readV2("topnfx", pageSize = 10)
      .filter(col("seg") === "A").select("k", "v").orderBy(col("v").asc).limit(3)
    assert(keyed.collect().map(_.getLong(1)).toSeq === Seq(0L, 3L, 6L))
    assert(rec.lastCountSpec.topN === Some(Seq(("v", false, false)) -> 3))
    assert(rec.lastCountSpec.keys === Some("seg" -> Set("A")))
  }

  test("TopN refuses pushdown when a residual filter could crowd out the true top-N") {
    val rec = new RecordingFetcher(rows, schema)
    FetcherRegistry.register("topnres", rec, schema)
    // wm >= is conservative (residual): a remote top-3 of the superset
    // could exclude the true top-3 — Spark must keep the sort+limit and
    // the fetcher must see NO topN spec
    val df = readV2("topnres").filter(col("wm") >= "2026-01-15")
      .select("k", "wm").orderBy(col("wm").desc, col("k").asc).limit(3)
    val expected = rows.filter(_.getString(3) >= "2026-01-15")
      .map(r => (r.getString(0), r.getString(3)))
      .sortBy { case (k, wm) => (wm, k) }(Ordering.Tuple2(Ordering.String.reverse, Ordering.String))
      .take(3)
    assert(df.collect().map(r => (r.getString(0), r.getString(1))).toSeq === expected)
    assert(rec.lastCountSpec.topN === None)
  }

  test("graded paged_topn: ordered fetch only (TopNOnlyFixture) AND survives count-on-top") {
    val dir = "/root/testdata/sf0.001"
    val q = SparkEntry.queries("paged_topn")(spark, dir)
    val expected = sources.Tables.customer(spark, dir)
      .select("c_custkey", "c_name").orderBy(col("c_name").desc).limit(5)
      .collect().map(_.toSeq).toSeq
    // TopNOnlyFixture throws on any un-ordered fetch, so equality PROVES
    // the sort+limit reached the remote call
    assert(q.collect().map(_.toSeq).toSeq === expected)
    assert(q.count() === 5L)
  }

  test("V2 read equals the plain DataFrame over the same rows") {
    val f = new RecordingFetcher(rows, schema)
    FetcherRegistry.register("rec4", f, schema)
    val got = readV2("rec4").collect().map(_.toSeq).toSet
    assert(got === rows.map(_.toSeq).toSet)
  }
}
