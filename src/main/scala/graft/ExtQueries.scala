package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOf, Ranking, RelOps, Sketches, Spatial}
import graft.sources.Tables
import Queries.Q
import OracleSql.{norm, toks}

/** Round-4 extension queries: temporal (as-of), spatial (grid-bucketed),
  * retrieval (BM25), sketches (HLL / quantile with exact gates), and
  * corpus-mixing statistics. Oracle SQL mirrors every float operation
  * order exactly (see Queries' determinism rules).
  */
object ExtQueries {

  // ------------------------------------------------------------------
  // As-of join (point-in-time): last click at-or-before each purchase.
  // ------------------------------------------------------------------

  private val asofJoin: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"))
    // right side made unique per (user, ms) — ties collapse to the max
    // click_id so the as-of match is well-defined in any engine
    val clicks = RelOps.latestPerKey(
      ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          unix_millis(col("ts")).as("click_ms"), col("value").as("click_value")),
      Seq("user_id", "click_ms"), col("click_id"), Nil)
    AsOf.asOfJoin(purchases, clicks, Seq("user_id"), col("ms"), col("click_ms"),
      payloadCols = Seq("click_id", "click_ms", "click_value"),
      tieBreak = Seq("click_ms", "click_id"))
  }

  /** The stateful streaming twin, run in batch mode (like `user_totals` /
    * `spend_alerts`): same enrichment, same oracle shape as `asof_join`.
    */
  private val asofStream: Q = (s, d) =>
    graft.streaming.EventsStream.asOfEnrich(Tables.events(s, d))
      .toDF("user_id", "event_id", "ms", "click_id", "click_ms", "click_value")

  private val asofJoinSql =
    """WITH p AS (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events WHERE event_type = 'purchase'),
      |c0 AS (SELECT user_id, event_id AS click_id, epoch_ms(ts) AS click_ms, value AS click_value
      |       FROM events WHERE event_type = 'click'),
      |c AS (SELECT user_id, click_id, click_ms, click_value FROM
      |        (SELECT *, row_number() OVER (PARTITION BY user_id, click_ms ORDER BY click_id DESC) AS rn FROM c0)
      |      WHERE rn = 1)
      |SELECT p.user_id, p.event_id, p.ms, c.click_id, c.click_ms, c.click_value
      |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.click_ms <= p.ms""".stripMargin

  // ------------------------------------------------------------------
  // Spatial: deterministic synthetic coordinates derived from keys
  // (Queensland-ish degree box), then grid-bucketed radius / nearest.
  // ------------------------------------------------------------------

  private def suppliersGeo(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.supplier(s, d).select(col("s_suppkey"),
      (lit(-29.0) + (col("s_suppkey") * 7 % 997).cast("double") * lit(0.01)).as("s_lat"),
      (lit(151.0) + (col("s_suppkey") * 13 % 1009).cast("double") * lit(0.01)).as("s_lon"))

  private def customersGeo(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.customer(s, d).select(col("c_custkey"),
      (lit(-29.0) + (col("c_custkey") % 997).cast("double") * lit(0.01)).as("c_lat"),
      (lit(151.0) + (col("c_custkey") * 31 % 1009).cast("double") * lit(0.01)).as("c_lon"))

  // bare SQL float literals are DECIMAL in DuckDB — CAST to DOUBLE so the
  // whole coordinate derivation runs in IEEE doubles like the Spark side
  private val geoSql =
    """sg AS (SELECT s_suppkey,
      |         CAST(-29.0 AS DOUBLE) + (s_suppkey * 7 % 997) * CAST(0.01 AS DOUBLE) AS s_lat,
      |         CAST(151.0 AS DOUBLE) + (s_suppkey * 13 % 1009) * CAST(0.01 AS DOUBLE) AS s_lon FROM supplier),
      |cg AS (SELECT c_custkey,
      |         CAST(-29.0 AS DOUBLE) + (c_custkey % 997) * CAST(0.01 AS DOUBLE) AS c_lat,
      |         CAST(151.0 AS DOUBLE) + (c_custkey * 31 % 1009) * CAST(0.01 AS DOUBLE) AS c_lon FROM customer)""".stripMargin

  private val spatialRadius: Q = (s, d) =>
    Spatial.radiusJoin(suppliersGeo(s, d), customersGeo(s, d),
      "s_lat", "s_lon", "c_lat", "c_lon", radius = 0.15)
      .select(col("s_suppkey"), col("c_custkey"), round(col("dist2"), 9).as("dist2"))

  private val spatialRadiusSql =
    s"""WITH $geoSql
      |SELECT s_suppkey, c_custkey,
      |  round((s_lat - c_lat) * (s_lat - c_lat) + (s_lon - c_lon) * (s_lon - c_lon), 9) AS dist2
      |FROM sg, cg
      |WHERE (s_lat - c_lat) * (s_lat - c_lat) + (s_lon - c_lon) * (s_lon - c_lon)
      |      <= CAST(0.15 AS DOUBLE) * CAST(0.15 AS DOUBLE)""".stripMargin

  private val spatialNearest: Q = (s, d) =>
    Spatial.nearestWithinRadius(suppliersGeo(s, d), customersGeo(s, d),
      "s_lat", "s_lon", "c_lat", "c_lon", radius = 0.3,
      leftKeys = Seq("s_suppkey"), tieBreak = Seq("c_custkey"))
      .select(col("s_suppkey"), col("c_custkey"), round(col("dist2"), 9).as("dist2"))

  private val spatialNearestSql =
    s"""WITH $geoSql,
      |cand AS (SELECT s_suppkey, c_custkey,
      |    (s_lat - c_lat) * (s_lat - c_lat) + (s_lon - c_lon) * (s_lon - c_lon) AS dist2
      |  FROM sg, cg
      |  WHERE (s_lat - c_lat) * (s_lat - c_lat) + (s_lon - c_lon) * (s_lon - c_lon)
      |        <= CAST(0.3 AS DOUBLE) * CAST(0.3 AS DOUBLE))
      |SELECT s_suppkey, c_custkey, round(dist2, 9) AS dist2 FROM
      |  (SELECT *, row_number() OVER (PARTITION BY s_suppkey ORDER BY dist2, c_custkey) AS rn FROM cand)
      |WHERE rn = 1""".stripMargin

  // ------------------------------------------------------------------
  // Z-order (Morton) curve values — the spatial write-layout primitive.
  // ------------------------------------------------------------------

  private val zValue: Q = (s, d) =>
    customersGeo(s, d).select(col("c_custkey"),
      Spatial.zValueOf(col("c_lat"), col("c_lon"), 0.01).as("zv"))

  /** Mirrors Spatial.spreadBits' mask-shift chain; nesting duplicates each
    * step (no variables in an expression) but DuckDB evaluates it fine.
    */
  private def spreadSql(e: String): String = {
    var x = s"(($e) & 2147483647)"
    for ((sh, m) <- Seq(16 -> 0x0000FFFF0000FFFFL, 8 -> 0x00FF00FF00FF00FFL,
        4 -> 0x0F0F0F0F0F0F0F0FL, 2 -> 0x3333333333333333L, 1 -> 0x5555555555555555L))
      x = s"(($x | ($x << $sh)) & $m)"
    x
  }

  private val zValueSql =
    s"""WITH $geoSql,
      |cells AS (SELECT c_custkey,
      |  CAST(floor((c_lat + CAST(90.0 AS DOUBLE)) / CAST(0.01 AS DOUBLE)) AS BIGINT) AS cx,
      |  CAST(floor((c_lon + CAST(180.0 AS DOUBLE)) / CAST(0.01 AS DOUBLE)) AS BIGINT) AS cy FROM cg)
      |SELECT c_custkey, (${spreadSql("cx")} | (${spreadSql("cy")} << 1)) AS zv FROM cells""".stripMargin

  // ------------------------------------------------------------------
  // BM25 ranked retrieval (fixed term set over `documents`).
  // ------------------------------------------------------------------

  private val bm25Terms = Seq("spark", "query", "window", "hash")

  private val bm25Search: Q = (s, d) =>
    Ranking.bm25(Tables.documents(s, d), bm25Terms)

  /** Mirrors Ranking.bm25's float-op order exactly (k1=1.2, b=0.75). */
  private val bm25SearchSql: String = {
    val tfDefs = bm25Terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(tk, x -> x = '$t')) AS BIGINT) AS tf$i"
    }.mkString(", ")
    val dfAggs = bm25Terms.indices.map { i =>
      s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i"
    }.mkString(", ")
    val avgdl = "(CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE))"
    val termScores = bm25Terms.indices.map { i =>
      s"""ln(1.0 + (CAST(n AS DOUBLE) - df$i + 0.5) / (CAST(df$i AS DOUBLE) + 0.5))
         | * (CAST(tf$i AS DOUBLE) * CAST(2.2 AS DOUBLE))
         | / (CAST(tf$i AS DOUBLE) + CAST(1.2 AS DOUBLE)
         |    * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * CAST(dl AS DOUBLE) / $avgdl))"""
        .stripMargin.linesIterator.mkString(" ")
    }.mkString(" + ")
    s"""WITH tk AS (SELECT doc_id, ${toks(norm("text"))} AS tk FROM documents),
      |base AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl, $tfDefs FROM tk),
      |stats AS (SELECT count(*) AS n, sum(dl) AS sumdl, $dfAggs FROM base),
      |scored AS (SELECT doc_id, round($termScores, 6) AS score FROM base, stats)
      |SELECT doc_id, score FROM scored WHERE score > CAST(0.0 AS DOUBLE)
      |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
  }

  // ------------------------------------------------------------------
  // Sketch aggregates with exact gates.
  // ------------------------------------------------------------------

  private val hllDistinct: Q = (s, d) =>
    Sketches.distinctWithHllGate(Tables.lineitem(s, d), Seq("l_returnflag"), "l_partkey")

  private val hllDistinctSql =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_exact, true AS hll_ok
      |FROM lineitem GROUP BY 1""".stripMargin

  private val quantiles: Q = (s, d) =>
    Sketches.percentilesWithGate(Tables.lineitem(s, d),
      Seq("l_returnflag", "l_linestatus"), "l_quantity")

  /** Vocabulary head with a Count-Min heavy-hitter gate: exact top-50
    * term frequencies; the sketch estimate stays internal (engine-
    * specific), the oracle asserts the gate.
    */
  private val vocabTopK: Q = (s, d) =>
    Sketches.vocabWithCmsGate(Tables.documents(s, d), topK = 50)

  private val vocabTopKSql =
    s"""WITH t AS (SELECT unnest(${toks(norm("text"))}) AS token FROM documents),
      |c AS (SELECT token, count(*) AS n FROM t GROUP BY 1),
      |r AS (SELECT token, n, CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT) AS rank FROM c)
      |SELECT rank, token, n, true AS cms_ok FROM r WHERE rank <= 50""".stripMargin

  private val quantilesSql =
    """SELECT l_returnflag, l_linestatus,
      |  round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5), 6) AS p50,
      |  round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.95), 6) AS p95,
      |  true AS approx_ok
      |FROM lineitem GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------------------
  // Group-wise top-k through the bounded TopKAgg buffer (aggregate, not
  // a window sort — the oracle IS the window formulation).
  // ------------------------------------------------------------------

  private val topkPerKey: Q = (s, d) =>
    RelOps.topKPerKey(Tables.lineitem(s, d), Seq("l_orderkey"),
      col("l_extendedprice"), col("l_linenumber"), k = 3)
      .select(col("l_orderkey"), col("rank"),
        col("id").as("l_linenumber"), col("score").as("l_extendedprice"))

  private val topkPerKeySql =
    """SELECT l_orderkey, rank, l_linenumber, l_extendedprice FROM (
      |  SELECT l_orderkey,
      |    CAST(row_number() OVER (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC, l_linenumber) AS BIGINT) AS rank,
      |    CAST(l_linenumber AS BIGINT) AS l_linenumber, l_extendedprice
      |  FROM lineitem)
      |WHERE rank <= 3""".stripMargin

  // ------------------------------------------------------------------
  // Training-mix reweighting over (source, lang) strata.
  // ------------------------------------------------------------------

  private val mixWeights: Q = (s, d) =>
    Ranking.mixWeights(Tables.documents(s, d), Seq("source", "lang"))

  // shares/weights as exact BIGINT parts-per-million (mirrors
  // Ranking.mixWeights): no float column survives into the hashed output,
  // so the compare is immune to engine float-formatting conventions
  // DuckDB sum(BIGINT) returns HUGEINT, which pandas materializes as
  // float64 while Spark's parquet reads back int64 — equal values would
  // still hash-mismatch at the driver. Every aggregate/division that
  // reaches the final projection is CAST to BIGINT (oracle-SQL style rule;
  // tools/oracle_check.py lints for it).
  private val mixWeightsSql =
    s"""WITH perdoc AS (SELECT source, lang, CAST(len(${toks(norm("text"))}) AS BIGINT) AS dl FROM documents),
      |strata AS (SELECT source, lang, count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS n_tokens FROM perdoc GROUP BY 1, 2),
      |tot AS (SELECT sum(n_tokens) AS total, count(*) AS n_strata FROM strata),
      |w AS (SELECT source, lang, n_docs, n_tokens,
      |        CAST(round(CAST(n_tokens AS DOUBLE) / total * CAST(1000000 AS DOUBLE)) AS BIGINT) AS share_ppm,
      |        CAST(round(least(CAST(5.0 AS DOUBLE), (CAST(total AS DOUBLE) / n_strata) / n_tokens) * CAST(1000000 AS DOUBLE)) AS BIGINT) AS weight_ppm
      |      FROM strata, tot)
      |SELECT source, lang, n_docs, n_tokens, share_ppm, weight_ppm,
      |       CAST((weight_ppm * n_tokens) // 1000000 AS BIGINT) AS sampled_tokens
      |FROM w""".stripMargin

  private val mixTemperature: Q = (s, d) =>
    Ranking.mixTemperature(Tables.documents(s, d), Seq("source", "lang"))

  // temperature mass q = round(exp(0.7·ln n)·10⁶) as BIGINT per stratum —
  // quantized BEFORE normalization so the normalizing sum is exact integer
  // arithmetic; the explicit DOUBLE casts keep DuckDB out of DECIMAL
  // arithmetic on the 0.7 literal (mirrors Ranking.mixTemperature)
  private val mixTemperatureSql =
    s"""WITH perdoc AS (SELECT source, lang, CAST(len(${toks(norm("text"))}) AS BIGINT) AS dl FROM documents),
      |strata AS (SELECT source, lang, count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS n_tokens FROM perdoc GROUP BY 1, 2),
      |sq AS (SELECT *, CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT)
      |         ELSE CAST(round(exp(CAST(0.7 AS DOUBLE) * ln(CAST(n_tokens AS DOUBLE))) * 1000000.0) AS BIGINT) END AS q
      |       FROM strata),
      |tot AS (SELECT CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS total,
      |          CAST(coalesce(sum(q), 0) AS BIGINT) AS qs FROM sq)
      |SELECT source, lang, n_docs, n_tokens,
      |  CASE WHEN total > 0 THEN CAST(round(CAST(n_tokens AS DOUBLE) / total * 1000000.0) AS BIGINT)
      |    ELSE CAST(0 AS BIGINT) END AS share_ppm,
      |  CASE WHEN qs > 0 THEN CAST(round(CAST(q AS DOUBLE) * 1000000.0 / qs) AS BIGINT)
      |    ELSE CAST(0 AS BIGINT) END AS temp_ppm,
      |  CASE WHEN qs > 0 THEN CAST(round(CAST(q AS DOUBLE) * total / qs) AS BIGINT)
      |    ELSE CAST(0 AS BIGINT) END AS sampled_tokens
      |FROM sq CROSS JOIN tot""".stripMargin

  // ------------------------------------------------------------------
  // Table profile: one-pass per-column data-quality stats.
  // ------------------------------------------------------------------

  private val profileCols =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")

  private val tableProfile: Q = (s, d) =>
    RelOps.profile(Tables.orders(s, d), profileCols)

  private val tableProfileSql = profileCols.map { c =>
    val (minn, maxn, mins, maxs) = c match {
      case "o_orderstatus" =>
        ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)", s"min($c)", s"max($c)")
      case "o_orderdate" =>
        (s"CAST(min(epoch_ms($c)) AS DOUBLE)", s"CAST(max(epoch_ms($c)) AS DOUBLE)",
          "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
      case _ =>
        (s"CAST(min($c) AS DOUBLE)", s"CAST(max($c) AS DOUBLE)",
          "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
    }
    s"""SELECT '$c' AS column_name, count(*) AS n_rows,
       |  count(*) - count($c) AS n_nulls, count(DISTINCT $c) AS n_distinct,
       |  $minn AS min_num, $maxn AS max_num, $mins AS min_str, $maxs AS max_str
       |FROM orders""".stripMargin
  }.mkString("\nUNION ALL\n")

  // ------------------------------------------------------------------
  // OLAP grouping breadth: rollup with grouping_id, pivot, and a
  // sliding-frame window aggregate. All three stay hash-exact across
  // engines by aggregating in integers (counts / decimal-exact sums /
  // cents) and dividing once at the end.
  // ------------------------------------------------------------------

  /** ROLLUP over (returnflag, linestatus): subtotal rows carry NULL group
    * keys plus the grouping_id bitmask (leftmost column = MSB in BOTH
    * Spark and DuckDB). The sum aggregates in DECIMAL — exact and
    * associative — and casts to double once.
    */
  private val rollupAgg: Q = (s, d) =>
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        count(lit(1)).as("n_rows"),
        grouping_id().as("gid"))
      .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
        col("n_rows"), col("gid"))

  private val rollupAggSql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  count(*) AS n_rows,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** Pivot events wide: one row per user, one count column per event
    * type (fixed value list — at scale an unbounded pivot would need a
    * distinct-values pass first; pinning the list keeps the plan a single
    * aggregation). Empty cells coalesce to 0 to match SQL counts.
    */
  private val pivotTypes = Seq("view", "click", "purchase", "signup", "error")

  private val pivotCounts: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", pivotTypes)
      .agg(count(lit(1)))
      .select(col("user_id") +:
        pivotTypes.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)

  private val pivotCountsSql = {
    val cols = pivotTypes.map(t =>
      s"count(CASE WHEN event_type = '$t' THEN 1 END) AS n_$t").mkString(", ")
    s"SELECT user_id, $cols FROM events GROUP BY 1"
  }

  /** Sliding-frame window aggregate: per user, the running 4-event
    * (current + 3 preceding) spend. The frame aggregates CENTS (exact
    * long sum — a double sliding sum is accumulation-order-dependent:
    * Spark rescans the frame per row, DuckDB uses segment trees, and
    * their FP orders differ) and derives the rounded average once.
    */
  private val movingSpend: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("ms"), col("event_id")).rowsBetween(-3, 0)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("win_cents", sum(col("cents")).over(w))
      .withColumn("win_n", count(lit(1)).over(w))
      .select(col("user_id"), col("event_id"), col("win_cents"), col("win_n"),
        round(col("win_cents").cast("double") / col("win_n") / 100.0, 6).as("avg_spend"))
  }

  private val movingSpendSql =
    """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms,
      |                  CAST(round(value * 100) AS BIGINT) AS cents FROM events),
      |w AS (SELECT user_id, event_id,
      |  CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ms, event_id
      |       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS win_cents,
      |  CAST(count(*) OVER (PARTITION BY user_id ORDER BY ms, event_id
      |       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS win_n
      |  FROM e)
      |SELECT user_id, event_id, win_cents, win_n,
      |  round(CAST(win_cents AS DOUBLE) / win_n / 100.0, 6) AS avg_spend
      |FROM w""".stripMargin

  // ------------------------------------------------------------------
  // DataSource V2 paged source: Catalyst-planned pushdown (key set +
  // column pruning reach the fetcher as ScanSpec, driven by the optimizer
  // rather than caller plumbing — see sources/v2/PagedV2.scala).
  // ------------------------------------------------------------------

  private val pagedV2: Q = (s, d) => {
    val name = s"customer:$d"
    // fixture registration (a full collect of the customer table) is
    // one-time per dir: Bench's min-of-two-passes then measures the
    // scan+pushdown, not the fixture setup
    graft.sources.v2.FetcherRegistry.registerOnce(name) {
      val cust = Tables.customer(s, d)
      (new graft.sources.FixtureFetcher(cust.collect().toSeq, cust.schema), cust.schema)
    }
    s.read.format("graft.sources.v2.PagedTableProvider")
      .option("fetcher", name).option("pageSize", "2000").load()
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select("c_custkey", "c_name", "c_mktsegment")
  }

  private val pagedV2Sql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')""".stripMargin

  /** S6 graded: COUNT(*) pushdown through the V2 source (the reference's
    * `returnCountOnly=true` request, `esri_rest_api.py:83-113`). The
    * lambda REQUIRES the planned scan to be `PagedCountScan` — a positive
    * runtime proof the query became one remote count call, failing loudly
    * if a future change makes Catalyst refuse the pushdown. A
    * throwing-on-fetch fixture can NOT serve as that proof here: harness
    * wrappers re-plan the query with `.count()` on top, which makes the
    * inner aggregate's output dead — Spark strips its aggregate
    * expressions, the CountStar disappears from the plan, and the scan
    * legitimately pages (V2SourceSpec keeps the no-fetch contract tests
    * on the unwrapped shape). The key-set filter rides along as exact
    * `ScanSpec.keys` pushdown (a residual filter would correctly veto
    * the count).
    */
  private val pagedCount: Q = (s, d) => {
    val name = s"customer_cnt:$d"
    graft.sources.v2.FetcherRegistry.registerOnce(name) {
      val cust = Tables.customer(s, d)
      (new graft.sources.FixtureFetcher(cust.collect().toSeq, cust.schema), cust.schema)
    }
    val df = s.read.format("graft.sources.v2.PagedTableProvider")
      .option("fetcher", name).load()
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .groupBy().count()
      .select(col("count").as("n"))
    require(df.queryExecution.executedPlan.toString.contains("PagedCountScan"),
      "COUNT(*) did not push to the paged source")
    df
  }

  private val pagedCountSql =
    """SELECT CAST(count(*) AS BIGINT) AS n FROM customer
      |WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')""".stripMargin

  /** A5 graded: DISTINCT pushdown through the V2 source (the reference's
    * `returnDistinctValues=true` request, `geocode.py:331-338`). The
    * group-by-only aggregate pushes completely — the fetcher serves the
    * distinct (segment, nation) pairs and Spark plans NO re-aggregation
    * on top; the fixture fetcher throws on any fetch whose ScanSpec does
    * not carry `distinct=true`, so a green row proves the pushdown ran.
    */
  private val pagedDistinct: Q = (s, d) => {
    val name = s"customer_dst:$d"
    graft.sources.v2.FetcherRegistry.registerOnce(name) {
      val cust = Tables.customer(s, d)
      (new graft.sources.DistinctOnlyFixture(cust.collect().toSeq, cust.schema), cust.schema)
    }
    s.read.format("graft.sources.v2.PagedTableProvider")
      .option("fetcher", name).load()
      .select("c_mktsegment", "c_nationkey").distinct()
  }

  private val pagedDistinctSql =
    "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer"

  /** TopN pushdown graded: `orderBy(desc).limit(k)` through the V2 source
    * becomes ONE capped, ordered remote request (the reference's
    * `orderByFields` + `resultRecordCount` — its latest-snapshot idiom,
    * top-1 by key desc, `s3.py:37-46`). The fixture fetcher throws on any
    * fetch whose ScanSpec lacks `topN`, so a green row proves the sort+
    * limit pushed; the ordering key (c_name) is unique, so the top-5 is a
    * total order on both engines.
    */
  private val pagedTopN: Q = (s, d) => {
    val name = s"customer_topn:$d"
    graft.sources.v2.FetcherRegistry.registerOnce(name) {
      val cust = Tables.customer(s, d)
      (new graft.sources.TopNOnlyFixture(cust.collect().toSeq, cust.schema), cust.schema)
    }
    s.read.format("graft.sources.v2.PagedTableProvider")
      .option("fetcher", name).load()
      .select("c_custkey", "c_name")
      .orderBy(col("c_name").desc)
      .limit(5)
  }

  private val pagedTopNSql =
    "SELECT c_custkey, c_name FROM customer ORDER BY c_name DESC LIMIT 5"

  // ------------------------------------------------------------------
  // Gopher-style duplicate n-gram fraction (repetition quality signal).
  // ------------------------------------------------------------------

  private val gramRepetition: Q = (s, d) =>
    graft.operators.TextAnalysis.gramRepetition(Tables.documents(s, d))

  private val gramRepetitionSql = {
    import OracleSql.{hashList, rolledGramList}
    def frac(g: String) =
      s"round(CASE WHEN len($g) > 0 THEN CAST(1 AS DOUBLE) - CAST(len(list_distinct($g)) AS DOUBLE) / len($g) ELSE CAST(0.0 AS DOUBLE) END, 6)"
    s"""WITH hl AS (SELECT doc_id, ${hashList(toks(norm("text")))} AS hs FROM documents),
      |g AS (SELECT doc_id, ${rolledGramList("hs", 2)} AS g2, ${rolledGramList("hs", 3)} AS g3 FROM hl)
      |SELECT doc_id,
      |  CAST(len(g2) AS BIGINT) AS n_grams_2, ${frac("g2")} AS dup_frac_2,
      |  CAST(len(g3) AS BIGINT) AS n_grams_3, ${frac("g3")} AS dup_frac_3
      |FROM g""".stripMargin
  }

  // ------------------------------------------------------------------
  // Incremental aggregate maintenance: previous agg state ⊕ watermark
  // delta == full re-aggregation (the oracle asserts exactly that).
  // ------------------------------------------------------------------

  private val incrementalAgg: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val wm = lit("1997-06-01").cast("timestamp")
    def aggOf(df: org.apache.spark.sql.DataFrame) = df.groupBy("o_custkey").agg(
      sum(col("o_totalprice").cast("decimal(18,2)")).as("total_price"),
      count(lit(1)).as("n_orders"),
      max(unix_millis(col("o_orderdate"))).as("last_order_ms"))
    // null-ts rows belong to the PREVIOUS side (they can never appear in a
    // watermark delta) — `< wm` alone would drop them from BOTH sides and
    // silently break the prev ⊕ delta == full invariant the oracle asserts
    val prev = aggOf(o.filter(col("o_orderdate") < wm || col("o_orderdate").isNull))
    val delta = aggOf(RelOps.watermarkDelta(o, "o_orderdate", wm))
    RelOps.mergeAggState(prev, delta, Seq("o_custkey"),
      sumCols = Seq("total_price", "n_orders"), maxCols = Seq("last_order_ms"))
      .select(col("o_custkey"), col("total_price").cast("double").as("total_price"),
        col("n_orders"), col("last_order_ms"))
  }

  private val incrementalAggSql =
    """SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
      |  count(*) AS n_orders, max(epoch_ms(o_orderdate)) AS last_order_ms
      |FROM orders GROUP BY 1""".stripMargin

  // ------------------------------------------------------------------
  // Materialized mix: apply the weights as hash-gated sampling/replication.
  // ------------------------------------------------------------------

  private val mixApply: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    Ranking.applyMixWeights(docs, Ranking.mixWeights(docs, Seq("source", "lang")),
      Seq("source", "lang"))
      .select(col("doc_id"), col("source"), col("lang"), col("copy"))
  }

  private val mixApplySql =
    s"""WITH perdoc AS (SELECT source, lang, CAST(len(${toks(norm("text"))}) AS BIGINT) AS dl FROM documents),
      |strata AS (SELECT source, lang, count(*) AS n_docs, sum(dl) AS n_tokens FROM perdoc GROUP BY 1, 2),
      |tot AS (SELECT sum(n_tokens) AS total, count(*) AS n_strata FROM strata),
      |w AS (SELECT source, lang,
      |        CAST(round(least(CAST(5.0 AS DOUBLE), (CAST(total AS DOUBLE) / n_strata) / n_tokens) * CAST(1000000 AS DOUBLE)) AS BIGINT) AS weight_ppm
      |      FROM strata, tot),
      |cand AS (SELECT d.doc_id, d.source, d.lang, w.weight_ppm, c.copy AS copy
      |         FROM documents d
      |         JOIN w ON d.source IS NOT DISTINCT FROM w.source
      |               AND d.lang IS NOT DISTINCT FROM w.lang,
      |         LATERAL unnest(range(0, w.weight_ppm // 1000000 + 1)) AS c(copy)),
      |g AS (SELECT *, CAST('0x' || substr(md5(coalesce(source, '') || ':' || coalesce(lang, '') || ':' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000000 AS u FROM cand)
      |SELECT doc_id, source, lang, copy FROM g
      |WHERE copy < weight_ppm // 1000000
      |   OR u < weight_ppm % 1000000""".stripMargin

  // -- join-key skew profile ------------------------------------------
  // (user_id, event_type) composite key over events: exercises the
  // multi-column concat and a realistic "who stalls my join" question
  private val keySkewQ: Q = (s, d) =>
    RelOps.keySkew(Tables.events(s, d), Seq("user_id", "event_type"), topN = 10)

  private val keySkewSql =
    """WITH k AS (SELECT coalesce(CAST(user_id AS VARCHAR), '<null>') || '|' ||
      |                  coalesce(CAST(event_type AS VARCHAR), '<null>') AS key,
      |            count(*) AS n_rows FROM events GROUP BY 1),
      |t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total_rows, count(*) AS n_keys FROM k),
      |top AS (SELECT key, n_rows FROM k ORDER BY n_rows DESC, key LIMIT 10)
      |SELECT key, CAST(n_rows AS BIGINT) AS n_rows, total_rows, n_keys,
      |  CAST((n_rows * 1000) // (total_rows // n_keys) AS BIGINT) AS skew_x1000
      |FROM top, t""".stripMargin

  // -- exact integral histogram ---------------------------------------
  // order totals in cents (the moving_spend cents idiom), 0..60M cents
  // in 20 bins: covers the TPC-H total-price range with integral edges
  private val histogramQ: Q = (s, d) =>
    RelOps.histogram(Tables.orders(s, d),
      round(col("o_totalprice") * 100).cast("long"), lo = 0L, hi = 60000000L, nBins = 20)

  private val histogramSql =
    """WITH v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
      |f AS (SELECT c FROM v WHERE c >= 0 AND c <= 60000000),
      |b AS (SELECT least((c * 20) // 60000000, 19) AS bin FROM f)
      |SELECT bin, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST((bin * 60000000) // 20 AS BIGINT) AS lo_edge,
      |  CAST(((bin + 1) * 60000000) // 20 AS BIGINT) AS hi_edge
      |FROM b GROUP BY bin""".stripMargin

  // -- link-graph centrality (PageRank over a synthetic URL graph) ---------
  /** PageRank over a deterministic synthetic link graph — node `d` links
    * to `(7d+1)`, `(13d+2)`, `(31d+3)` mod N, self-loops dropped,
    * parallel edges deduped — the Common-Crawl-style centrality prior a
    * web-curation stack weights documents by. `Graph.pageRank`'s
    * all-integer contract (micro-unit ranks, HALF_UP contributions,
    * exact long sums) lets the oracle unroll the five damped power
    * iterations in pure SQL, the classifier-oracle pattern.
    */
  private val pageRankQ: Q = (s, d) => {
    val nodes = Tables.documents(s, d).select(col("doc_id"))
    val n = nodes.count()
    val e0 = Seq((7L, 1L), (13L, 2L), (31L, 3L)).map { case (a, b) =>
      nodes.select(col("doc_id").as("src"),
        pmod(col("doc_id") * a + b, lit(n)).as("dst"))
    }.reduce(_ unionByName _)
    graft.operators.Graph.pageRank(nodes,
      e0.filter(col("src") =!= col("dst")).distinct())
  }

  private val pageRankSql = {
    val iters = 5
    val dmp = 850000L
    val head =
      s"""nodes AS (SELECT doc_id FROM documents),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |e0 AS (SELECT doc_id AS src, (doc_id * 7 + 1) % (SELECT n FROM nn) AS dst FROM nodes
         |       UNION ALL SELECT doc_id, (doc_id * 13 + 2) % (SELECT n FROM nn) FROM nodes
         |       UNION ALL SELECT doc_id, (doc_id * 31 + 3) % (SELECT n FROM nn) FROM nodes),
         |edges AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
         |od AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY 1),
         |pbase AS (SELECT CAST(round((1000000.0 - $dmp) / n) AS BIGINT) AS b FROM nn),
         |r0 AS (SELECT doc_id, CAST(round(1000000.0 / (SELECT n FROM nn)) AS BIGINT) AS r FROM nodes)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""c$i AS (SELECT e.dst, CAST(sum(CAST(round(CAST(r.r AS DOUBLE) / od.outdeg) AS BIGINT)) AS BIGINT) AS s
         |       FROM edges e JOIN r${i - 1} r ON e.src = r.doc_id JOIN od ON od.src = e.src GROUP BY 1),
         |r$i AS (SELECT nodes.doc_id,
         |         (SELECT b FROM pbase) + CAST(round($dmp.0 * coalesce(c$i.s, 0) / 1000000.0) AS BIGINT) AS r
         |       FROM nodes LEFT JOIN c$i ON c$i.dst = nodes.doc_id)""".stripMargin
    }.mkString(",\n")
    s"""WITH $head,
       |$steps
       |SELECT doc_id, r AS rank_micro, round(r / 1000000.0, 6) AS rank FROM r$iters""".stripMargin
  }

  val registry: Vector[(String, Q, Option[String])] = Vector(
    ("pagerank", pageRankQ, Some(pageRankSql)),
    ("asof_join", asofJoin, Some(asofJoinSql)),
    ("key_skew", keySkewQ, Some(keySkewSql)),
    ("histogram", histogramQ, Some(histogramSql)),
    ("asof_stream", asofStream, Some(asofJoinSql)),
    ("spatial_radius", spatialRadius, Some(spatialRadiusSql)),
    ("spatial_nearest", spatialNearest, Some(spatialNearestSql)),
    ("bm25_search", bm25Search, Some(bm25SearchSql)),
    ("hll_distinct", hllDistinct, Some(hllDistinctSql)),
    ("quantiles", quantiles, Some(quantilesSql)),
    ("vocab_topk", vocabTopK, Some(vocabTopKSql)),
    ("table_profile", tableProfile, Some(tableProfileSql)),
    ("rollup_agg", rollupAgg, Some(rollupAggSql)),
    ("pivot_counts", pivotCounts, Some(pivotCountsSql)),
    ("moving_spend", movingSpend, Some(movingSpendSql)),
    ("mix_weights", mixWeights, Some(mixWeightsSql)),
    ("mix_temperature", mixTemperature, Some(mixTemperatureSql)),
    ("paged_v2", pagedV2, Some(pagedV2Sql)),
    ("paged_topn", pagedTopN, Some(pagedTopNSql)),
    ("paged_count", pagedCount, Some(pagedCountSql)),
    ("paged_distinct", pagedDistinct, Some(pagedDistinctSql)),
    ("gram_repetition", gramRepetition, Some(gramRepetitionSql)),
    ("incremental_agg", incrementalAgg, Some(incrementalAggSql)),
    ("z_value", zValue, Some(zValueSql)),
    ("topk_per_key", topkPerKey, Some(topkPerKeySql)),
    ("mix_apply", mixApply, Some(mixApplySql)),
  )
}
