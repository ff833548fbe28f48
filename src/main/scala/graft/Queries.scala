package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._
import graft.operators._
import graft.pipeline.PlsPipeline
import graft.sources.Tables

/** The driver-graded query registry: one entry per implemented operator from
  * SURVEY.md §2 plus the training-data-pipeline extensions, each paired with
  * ANSI SQL that DuckDB runs on the same parquet tables as the correctness
  * oracle.
  *
  * Determinism rules (the oracle compare is exact):
  *   - no raw timestamp outputs — epoch-ms longs or formatted strings only;
  *   - money aggregates sum in DECIMAL (exact, order-independent), then cast
  *     to double;
  *   - every window/rank has a total-order tie-break, and FP scores are
  *     rounded BEFORE ranking;
  *   - hashing is md5-based (GraftFunctions.hash60), reproducible in SQL.
  */
object Queries {
  type Q = (SparkSession, String) => DataFrame

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private def cust(s: SparkSession, d: String) = Tables.customer(s, d)

  // ------------------------------------------------------------------
  // Relational core (SURVEY §2.2-§2.8)
  // ------------------------------------------------------------------

  /** P1/A-agg flagship: pricing summary. DECIMAL sums for exactness. */
  private val q1Agg: Q = (s, d) =>
    li(s, d).groupBy("l_returnflag", "l_linestatus").agg(
      sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
      sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
      sum(col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))).cast("double").as("sum_disc_price"),
      count(lit(1)).as("count_order"))

  private val q1AggSql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem GROUP BY 1, 2""".stripMargin

  /** A1/W1 — latest order per customer. */
  private val latestPerKey: Q = (s, d) =>
    RelOps.latestPerKey(ord(s, d), Seq("o_custkey"), col("o_orderdate"), Seq(col("o_orderkey")))
      .select(col("o_custkey"), col("o_orderkey"),
        unix_millis(col("o_orderdate")).as("o_date_ms"), col("o_totalprice"))

  private val latestPerKeySql =
    """SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS o_date_ms, o_totalprice
      |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
      |WHERE rn = 1""".stripMargin

  /** A3 — deterministic first-wins dedup: first line per order. The
    * ordering is a TOTAL order ((linenumber, partkey, suppkey) is unique
    * here) — SURVEY §7.4.3: the reference is only accidentally
    * deterministic; we make the tie-break explicit.
    */
  private val firstWins: Q = (s, d) =>
    RelOps.firstWinsDedup(li(s, d), Seq("l_orderkey"),
      Seq(col("l_linenumber"), col("l_partkey"), col("l_suppkey")))
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity")

  private val firstWinsSql =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
      |FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn FROM lineitem)
      |WHERE rn = 1""".stripMargin

  /** M1/M2 — upsert: modified rows win per key. */
  private val upsert: Q = (s, d) => {
    val c = cust(s, d)
    val upd = c.filter(col("c_custkey") % 3 === 0)
      .withColumn("c_name", concat(lit("upd_"), col("c_name")))
      .withColumn("c_acctbal", col("c_acctbal") + 100.0)
    RelOps.upsert(c, upd, Seq("c_custkey"))
  }

  private val upsertSql =
    """WITH upd AS (SELECT c_custkey, 'upd_' || c_name AS c_name, c_nationkey, c_acctbal + 100.0 AS c_acctbal, c_mktsegment
      |             FROM customer WHERE c_custkey % 3 = 0)
      |SELECT * FROM upd
      |UNION ALL
      |SELECT * FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM upd)""".stripMargin

  /** M3 — upsert with column reset on the incoming side. */
  private val upsertReset: Q = (s, d) => {
    val c = cust(s, d)
    val inc = c.filter(col("c_custkey") % 4 === 0).withColumn("c_mktsegment", lit("RESET"))
    RelOps.upsertWithReset(c, inc, Seq("c_custkey"), Seq("c_acctbal"))
  }

  private val upsertResetSql =
    """WITH inc AS (SELECT c_custkey, c_name, c_nationkey, CAST(NULL AS DOUBLE) AS c_acctbal, 'RESET' AS c_mktsegment
      |             FROM customer WHERE c_custkey % 4 = 0)
      |SELECT * FROM inc
      |UNION ALL
      |SELECT * FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM inc)""".stripMargin

  /** U3/M5 — carry-forward with column nulling; current rows win. */
  private val carryForward: Q = (s, d) => {
    val o = ord(s, d)
    val prev = o.filter(col("o_orderkey") % 2 === 0)
    val cur = o.filter(col("o_orderkey") % 3 === 0).withColumn("o_orderstatus", lit("N"))
    RelOps.carryForward(prev, cur, Seq("o_orderkey"), Seq("o_orderpriority"))
      .select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
  }

  private val carryForwardSql =
    """WITH cur AS (SELECT o_orderkey, 'N' AS o_orderstatus, o_orderpriority, o_totalprice FROM orders WHERE o_orderkey % 3 = 0),
      |     prev AS (SELECT o_orderkey, o_orderstatus, CAST(NULL AS VARCHAR) AS o_orderpriority, o_totalprice FROM orders WHERE o_orderkey % 2 = 0)
      |SELECT * FROM cur
      |UNION ALL
      |SELECT * FROM prev WHERE o_orderkey NOT IN (SELECT o_orderkey FROM cur)""".stripMargin

  /** J4/J5 — referential prune (semi join on the survivors). */
  private val pruneUnref: Q = (s, d) =>
    RelOps.pruneUnreferenced(cust(s, d),
      ord(s, d).select(col("o_custkey").as("c_custkey")), "c_custkey")

  private val pruneUnrefSql =
    "SELECT * FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)"

  /** J7/J8 — unmatched rows (anti join). The orders side is restricted to
    * recent orders so the result is NON-EMPTY at every fixture sf (135
    * customers at sf0.01): every fixture customer has at least one order,
    * so the unfiltered anti join returned 0 rows — proving only that the
    * operator never over-returns, while the keep side went ungraded.
    */
  private val unmatched: Q = (s, d) =>
    RelOps.unmatched(cust(s, d),
      ord(s, d).filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select(col("o_custkey").as("c_custkey")), "c_custkey")

  private val unmatchedSql =
    """SELECT * FROM customer WHERE c_custkey NOT IN
      |  (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01')""".stripMargin

  /** J6 — backfill join with one-row-per-key pre-aggregation. */
  private val backfill: Q = (s, d) => {
    val o = ord(s, d).withColumn("o_totalprice",
      when(col("o_orderkey") % 2 === 1, lit(null)).otherwise(col("o_totalprice")))
    RelOps.backfillFromJoin(o,
      li(s, d).select(col("l_orderkey").as("o_orderkey"), col("l_extendedprice")),
      "o_orderkey", "l_extendedprice", "o_totalprice")
      .select("o_orderkey", "o_custkey", "o_totalprice")
  }

  private val backfillSql =
    """SELECT o_orderkey, o_custkey,
      |  coalesce(CASE WHEN o_orderkey % 2 = 1 THEN NULL ELSE o_totalprice END, m.f) AS o_totalprice
      |FROM orders LEFT JOIN (SELECT l_orderkey, min(l_extendedprice) AS f FROM lineitem GROUP BY 1) m
      |  ON o_orderkey = m.l_orderkey""".stripMargin

  /** P11/J10 — constraint validation counts. */
  private val validate: Q = (s, d) => {
    val c = cust(s, d); val o = ord(s, d); val l = li(s, d)
    val n = Tables.nation(s, d)
    RelOps.validate(Seq(
      "customer_nation_fk" -> c.join(n, c("c_nationkey") === n("n_nationkey"), "left_anti"),
      "lineitem_order_fk" -> l.join(o, l("l_orderkey") === o("o_orderkey"), "left_anti"),
      "orders_price_positive" -> o.filter(col("o_totalprice") <= 0)))
  }

  private val validateSql =
    """SELECT 'customer_nation_fk' AS check_name, (SELECT count(*) FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)) AS violations
      |UNION ALL
      |SELECT 'lineitem_order_fk', (SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
      |UNION ALL
      |SELECT 'orders_price_positive', (SELECT count(*) FROM orders WHERE o_totalprice <= 0)""".stripMargin

  /** I1/P8 — watermark delta scan (predicate reaches the parquet scan). */
  private val watermark: Q = (s, d) =>
    RelOps.watermarkDelta(ord(s, d), "o_orderdate", lit("1997-06-01").cast("timestamp"))
      .select(col("o_orderkey"), unix_millis(col("o_orderdate")).as("o_date_ms"))

  private val watermarkSql =
    """SELECT o_orderkey, epoch_ms(o_orderdate) AS o_date_ms
      |FROM orders WHERE o_orderdate >= TIMESTAMP '1997-06-01'""".stripMargin

  /** J3/P7 — semi join via a key set (the VALUES pushdown analogue). */
  private val semiKeys: Q = (s, d) =>
    li(s, d).join(
      ord(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("l_orderkey")),
      Seq("l_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber", "l_quantity")

  private val semiKeysSql =
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')""".stripMargin

  /** A2/A4 — DISTINCT projection. */
  private val distinctVals: Q = (s, d) =>
    li(s, d).select("l_returnflag", "l_linestatus").distinct()

  private val distinctValsSql =
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"

  /** O1/O3 — top-k by sort + limit (deterministic tie-break). */
  private val topN: Q = (s, d) =>
    ord(s, d).orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10).select("o_orderkey", "o_totalprice")

  private val topNSql =
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"

  /** Skew-salted join, oracle-proved equal to the PLAIN join — the salt
    * is pure execution strategy (scatter a hot key over `salt` reducers)
    * and must never change the result set. The oracle is the unsalted SQL
    * join, so any multiplicity drift the salting could introduce
    * (a dropped replica, a double match) breaks the hash.
    */
  private val saltedJoin: Q = (s, d) =>
    RelOps.saltedJoin(
      li(s, d).filter(col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_suppkey"),
      Tables.supplier(s, d).select(col("s_suppkey").as("l_suppkey"), col("s_name")),
      Seq("l_suppkey"), salt = 8)
      .select("l_orderkey", "l_linenumber", "l_suppkey", "s_name")

  private val saltedJoinSql =
    """SELECT l_orderkey, l_linenumber, l_suppkey, s_name
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |WHERE l_quantity > 45""".stripMargin

  /** Snapshot diff (audit/CDC): synthesize "previous" and "current" runs
    * from the documents table — ids under 10 exist only in previous
    * (removed), 400+ only in current (added), every seventh id carries a
    * text edit (changed) — and classify each key through ONE full-outer
    * join of per-side payload fingerprints.
    */
  private val snapshotDiff: Q = (s, d) => {
    val all = Tables.documents(s, d).select("doc_id", "text", "lang", "source")
    val prev = all.filter(col("doc_id") < 400)
      .withColumn("text", when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" v1"))).otherwise(col("text")))
    RelOps.diffFrames(prev, all.filter(col("doc_id") >= 10), Seq("doc_id"))
  }

  private val snapshotDiffSql =
    """WITH o AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN text || ' v1' ELSE text END AS text,
      |                  lang, source FROM documents WHERE doc_id < 400),
      |n AS (SELECT doc_id, text, lang, source FROM documents WHERE doc_id >= 10),
      |fo AS (SELECT doc_id, md5(concat_ws(chr(1), coalesce(text, chr(0)), coalesce(lang, chr(0)), coalesce(source, chr(0)))) AS h FROM o),
      |fn AS (SELECT doc_id, md5(concat_ws(chr(1), coalesce(text, chr(0)), coalesce(lang, chr(0)), coalesce(source, chr(0)))) AS h FROM n),
      |j AS (SELECT coalesce(fo.doc_id, fn.doc_id) AS doc_id,
      |        CASE WHEN fo.doc_id IS NULL THEN 'added'
      |             WHEN fn.doc_id IS NULL THEN 'removed'
      |             WHEN fo.h <> fn.h THEN 'changed' END AS op
      |      FROM fo FULL OUTER JOIN fn ON fo.doc_id = fn.doc_id)
      |SELECT doc_id, op FROM j WHERE op IS NOT NULL""".stripMargin

  // ------------------------------------------------------------------
  // Stable surrogate-key dictionary (M6)
  // ------------------------------------------------------------------

  private val idMapExtend: Q = (s, d) =>
    IdMap.extend(IdMap.empty(s), Tables.part(s, d), "p_name")

  private val idMapExtendSql =
    """SELECT p_name AS key, CAST(row_number() OVER (ORDER BY p_name) AS BIGINT) AS id
      |FROM (SELECT DISTINCT p_name FROM part WHERE p_name IS NOT NULL)""".stripMargin

  /** M6 cold-start path: `extendBulk` (the same sort + zipWithIndex
    * assignment with nothing staged in the cache) must assign the SAME
    * ids as `extend` — so it shares `idMapExtendSql` verbatim, and the
    * 100 TB first-run bulk path is driver-graded, not just
    * equality-tested in IdMapSpec.
    */
  private val idMapBulk: Q = (s, d) =>
    IdMap.extendBulk(IdMap.empty(s), Tables.part(s, d), "p_name")

  private val idMapEncode: Q = (s, d) => {
    val p = Tables.part(s, d)
    val map = IdMap.extend(IdMap.empty(s), p, "p_name")
    IdMap.encode(p, map, "p_name")
      .select(col("p_partkey"), col("p_name").as("p_name_id"), col("p_brand"))
  }

  private val idMapEncodeSql =
    """WITH map AS (SELECT p_name AS key, CAST(row_number() OVER (ORDER BY p_name) AS BIGINT) AS id
      |             FROM (SELECT DISTINCT p_name FROM part WHERE p_name IS NOT NULL))
      |SELECT p.p_partkey, m.id AS p_name_id, p.p_brand FROM part p JOIN map m ON p.p_name = m.key""".stripMargin

  // ------------------------------------------------------------------
  // Scalar-function surface (F1-F10)
  // ------------------------------------------------------------------

  private val scalarText: Q = (s, d) =>
    Tables.part(s, d).select(
      col("p_partkey"),
      initialism(col("p_type"), " ").as("type_initialism"),
      zeroToSentinel((col("p_size") % 7).cast("string")).as("size_sent"),
      synthKey("/", col("p_brand"), col("p_type")).as("brand_key"),
      stripUrlSuffix(concat(col("p_brand"), lit("/query"))).as("brand_stripped"),
      upper(col("p_name")).as("name_upper"))

  private val scalarTextSql =
    """SELECT p_partkey,
      |  substr(upper(array_to_string(list_transform(string_split(p_type, ' '), t -> substr(t, 1, 1)), '')), 1, 4) AS type_initialism,
      |  CASE WHEN CAST(p_size % 7 AS VARCHAR) = '0' THEN '9999' ELSE CAST(p_size % 7 AS VARCHAR) END AS size_sent,
      |  concat_ws('/', p_brand, p_type) AS brand_key,
      |  regexp_replace(p_brand || '/query', '/query$', '') AS brand_stripped,
      |  upper(p_name) AS name_upper
      |FROM part""".stripMargin

  private val scalarTime: Q = (s, d) =>
    ord(s, d).select(
      col("o_orderkey"),
      brisbaneIso(col("o_orderdate")).as("iso_bne"),
      esriDatetime(col("o_orderdate")).as("esri_dt"),
      unix_millis(epochMillisToTs(unix_millis(col("o_orderdate")))).as("epoch_ms"),
      durationSeconds(col("o_orderdate"),
        col("o_orderdate") + expr("INTERVAL 90 MINUTE")).as("dur_s"))

  private val scalarTimeSql =
    """SELECT o_orderkey,
      |  strftime(o_orderdate + INTERVAL 10 HOUR, '%Y-%m-%dT%H:%M:%S') || '+1000' AS iso_bne,
      |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS esri_dt,
      |  epoch_ms(o_orderdate) AS epoch_ms,
      |  printf('%.3f', (epoch_ms(o_orderdate + INTERVAL 90 MINUTE) - epoch_ms(o_orderdate)) / 1000.0) AS dur_s
      |FROM orders""".stripMargin

  // ------------------------------------------------------------------
  // Address assembly (SURVEY §3.2: A1 ⋈ P4/P5 anti ⋈ J1 inner ⋈ J2 left
  // ×4 ⋈ F1 synthesis ⋈ J9 PID enrichment/prune) over the TPC-H frames.
  // ------------------------------------------------------------------

  private val addressAssembly: Q = (s, d) => {
    val o = ord(s, d); val c = cust(s, d)
    val n = Tables.nation(s, d); val r = Tables.region(s, d)
    import s.implicits._
    // A1: latest lifecycle row per key
    val latest = RelOps.latestPerKey(o, Seq("o_custkey"), col("o_orderdate"), Seq(col("o_orderkey")))
    // P4/P5: current-stage + private-tag anti filters
    val notPrivate = RelOps.unmatched(
      latest.filter(col("o_orderstatus") =!= "C"),
      c.filter(col("c_mktsegment") === "MACHINERY").select(col("c_custkey").as("o_custkey")),
      "o_custkey")
    // J6-style one-row-per-key pre-aggregation feeding the OPTIONALs —
    // ONE pass over lineitem also carries the line count (join #10), so
    // the table is scanned/shuffled once, not twice
    val lineAgg = li(s, d).groupBy(col("l_orderkey").as("o_orderkey")).agg(
      min("l_partkey").as("first_partkey"),
      min("l_suppkey").as("first_suppkey"),
      max("l_shipdate").as("last_ship"),
      count(lit(1)).as("n_lines"))
    // vocab notation lookups (the reference's P3 datatype-vocab pattern)
    val prioVocab = Seq("1-URGENT" -> "U", "2-HIGH" -> "H", "3-MEDIUM" -> "M",
      "4-NOT SPECIFIED" -> "N", "5-LOW" -> "L").toDF("o_orderpriority", "prio_code")
    val segVocab = Seq("AUTOMOBILE" -> "AU", "BUILDING" -> "BU", "FURNITURE" -> "FU",
      "HOUSEHOLD" -> "HO", "MACHINERY" -> "MA").toDF("c_mktsegment", "seg_code")
    // J1 inner spine + J2: ten left-outer OPTIONALs
    val supp = Tables.supplier(s, d)
    val n2 = n.select(col("n_nationkey").as("s_nationkey"), col("n_name").as("supp_nation"))
    val detail = notPrivate
      .join(c.withColumnRenamed("c_custkey", "o_custkey"), Seq("o_custkey")) // inner spine
      .join(n, col("c_nationkey") === col("n_nationkey"), "left")            // 1 nation
      .join(r, col("n_regionkey") === col("r_regionkey"), "left")            // 2 region
      .join(lineAgg, Seq("o_orderkey"), "left")                              // 3 line agg
      .join(Tables.part(s, d).select(col("p_partkey").as("first_partkey"),
        col("p_name"), col("p_brand")), Seq("first_partkey"), "left")        // 4 part
      .join(supp.select(col("s_suppkey").as("first_suppkey"), col("s_name"),
        col("s_nationkey")), Seq("first_suppkey"), "left")                   // 5 supplier
      .join(n2, Seq("s_nationkey"), "left")                                  // 6 supplier nation
      .join(broadcast(prioVocab), Seq("o_orderpriority"), "left")            // 7 vocab
      .join(broadcast(segVocab), Seq("c_mktsegment"), "left")                // 8 vocab
      .join(o.filter(col("o_totalprice") > 200000.0)
        .select(col("o_orderkey"), lit("BIG").as("size_tag")), Seq("o_orderkey"), "left") // 9 tag
      // (10th OPTIONAL, the per-order line count, rides the lineAgg join)
    // F1 key synthesis + J9 PID enrichment (inner: unmapped rows drop)
    val pidMap = o.filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey"), concat(lit("PID_"), col("o_orderkey")).as("address_pid"))
    detail.join(pidMap, Seq("o_orderkey"))
      .select(
        synthKey("/", col("o_orderkey"), col("o_custkey"), upper(col("n_name"))).as("addr_key"),
        col("o_orderkey"), col("o_custkey"),
        upper(col("n_name")).as("nation"), col("r_name").as("region"),
        col("p_name").as("first_part"), col("p_brand").as("first_brand"),
        col("s_name").as("supp_name"), col("supp_nation"),
        unix_millis(col("last_ship")).as("last_ship_ms"),
        col("prio_code"), col("seg_code"),
        coalesce(col("size_tag"), lit("STD")).as("size_tag"),
        col("n_lines"), col("address_pid"))
  }

  private val addressAssemblySql =
    """WITH latest AS (
      |  SELECT * FROM (SELECT o.*, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders o) WHERE rn = 1),
      |np AS (SELECT * FROM latest WHERE o_orderstatus <> 'C'
      |       AND o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')),
      |la AS (SELECT l_orderkey AS o_orderkey, min(l_partkey) AS first_partkey, min(l_suppkey) AS first_suppkey, max(l_shipdate) AS last_ship FROM lineitem GROUP BY 1),
      |lc AS (SELECT l_orderkey AS o_orderkey, count(*) AS n_lines FROM lineitem GROUP BY 1),
      |pv AS (SELECT * FROM (VALUES ('1-URGENT','U'),('2-HIGH','H'),('3-MEDIUM','M'),('4-NOT SPECIFIED','N'),('5-LOW','L')) AS t(o_orderpriority, prio_code)),
      |sv AS (SELECT * FROM (VALUES ('AUTOMOBILE','AU'),('BUILDING','BU'),('FURNITURE','FU'),('HOUSEHOLD','HO'),('MACHINERY','MA')) AS t(c_mktsegment, seg_code)),
      |big AS (SELECT o_orderkey, 'BIG' AS size_tag FROM orders WHERE o_totalprice > 200000.0),
      |pid AS (SELECT o_orderkey, 'PID_' || o_orderkey AS address_pid FROM orders WHERE o_orderkey % 7 <> 0)
      |SELECT concat_ws('/', np.o_orderkey, np.o_custkey, upper(n.n_name)) AS addr_key,
      |       np.o_orderkey, np.o_custkey, upper(n.n_name) AS nation, r.r_name AS region,
      |       p.p_name AS first_part, p.p_brand AS first_brand,
      |       s.s_name AS supp_name, n2.n_name AS supp_nation,
      |       epoch_ms(la.last_ship) AS last_ship_ms,
      |       pv.prio_code, sv.seg_code,
      |       coalesce(big.size_tag, 'STD') AS size_tag,
      |       lc.n_lines, pid.address_pid
      |FROM np
      |JOIN customer c ON np.o_custkey = c.c_custkey
      |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      |LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
      |LEFT JOIN la ON np.o_orderkey = la.o_orderkey
      |LEFT JOIN part p ON la.first_partkey = p.p_partkey
      |LEFT JOIN supplier s ON la.first_suppkey = s.s_suppkey
      |LEFT JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      |LEFT JOIN pv ON np.o_orderpriority = pv.o_orderpriority
      |LEFT JOIN sv ON c.c_mktsegment = sv.c_mktsegment
      |LEFT JOIN big ON np.o_orderkey = big.o_orderkey
      |LEFT JOIN lc ON np.o_orderkey = lc.o_orderkey
      |JOIN pid ON np.o_orderkey = pid.o_orderkey""".stripMargin

  // ------------------------------------------------------------------
  // Full PLS run (§3.1) over TPC-H-derived fixture frames
  // ------------------------------------------------------------------

  /** Shared fixture inputs for the PLS pipeline queries. */
  private def plsInputs(s: SparkSession, d: String): PlsPipeline.RunInputs = {
    val c = cust(s, d); val o = ord(s, d); val sup = Tables.supplier(s, d)
    val importedPid = c.filter(col("c_custkey") % 5 =!= 0).select(
      concat(lit("iri_"), col("c_custkey")).as("address_iri"),
      concat(lit("pidB_"), col("c_custkey")).as("address_pid"))
    val prevPid = c.filter(col("c_custkey") % 2 === 0).select(
      concat(lit("iri_"), col("c_custkey")).as("address_iri"),
      concat(lit("pidA_"), col("c_custkey")).as("address_pid"))
    val addresses = o.select(
      concat(lit("iri_"), col("o_custkey")).as("address_iri"),
      concat(lit("pid_"), col("o_custkey")).as("address_pid"),
      concat(lit("s"), col("o_custkey") % 50).as("site_id")).distinct()
    val prevGeo = sup.select(
      concat(lit("g"), col("s_suppkey")).as("geocode_id"),
      lit("PC").as("geocode_type"),
      concat(lit("pid_"), col("s_suppkey") % 30).as("address_pid"),
      lit("old").as("site_id"),
      col("s_acctbal").as("centoid_lat"),
      (col("s_acctbal") + 1.0).as("centoid_lon"))
    val impGeo = sup.filter(col("s_suppkey") % 3 === 0).select(
      concat(lit("g"), col("s_suppkey")).as("geocode_id"),
      lit("SP").as("geocode_type"),
      concat(lit("pid_"), col("s_suppkey") % 30).as("address_pid"),
      lit(null).cast("string").as("site_id"),
      (col("s_acctbal") * 2.0).as("centoid_lat"),
      (col("s_acctbal") * 2.0 + 1.0).as("centoid_lon"))
    PlsPipeline.RunInputs(Some(prevGeo), Some(prevPid), importedPid, impGeo, addresses)
  }

  private[graft] val plsRun: Q = (s, d) =>
    PlsPipeline.run(plsInputs(s, d)).geocodes
      .select("geocode_id", "geocode_type", "address_pid", "site_id",
        "centoid_lat", "centoid_lon")

  /** M6 in-pipeline: surviving addresses with their PK dictionary-encoded
    * to stable dense ids (`PlsPipeline.encodeEntityKeys`).
    */
  private val plsEncoded: Q = (s, d) => {
    val out = PlsPipeline.run(plsInputs(s, d))
    val (encoded, _) = PlsPipeline.encodeEntityKeys(
      Map("addresses" -> out.addresses),
      Map("addresses" -> IdMap.empty(s)),
      Map("addresses" -> "address_iri"))
    encoded("addresses").select(col("address_iri").as("addr_id"),
      col("address_pid"), col("site_id"))
  }

  private val plsRunSql =
    """WITH imported_pid AS (SELECT 'iri_' || c_custkey AS address_iri, 'pidB_' || c_custkey AS address_pid FROM customer WHERE c_custkey % 5 <> 0),
      |prev_pid AS (SELECT 'iri_' || c_custkey AS address_iri, 'pidA_' || c_custkey AS address_pid FROM customer WHERE c_custkey % 2 = 0),
      |pid_map AS (SELECT * FROM imported_pid UNION ALL SELECT * FROM prev_pid WHERE address_iri NOT IN (SELECT address_iri FROM imported_pid)),
      |addresses AS (SELECT DISTINCT 'iri_' || o_custkey AS address_iri, 'pid_' || o_custkey AS address_pid, 's' || (o_custkey % 50) AS site_id FROM orders),
      |addr_kept AS (SELECT * FROM addresses WHERE address_iri IN (SELECT address_iri FROM pid_map)),
      |imp_geo AS (SELECT 'g' || s_suppkey AS geocode_id, 'SP' AS geocode_type, 'pid_' || (s_suppkey % 30) AS address_pid, CAST(NULL AS VARCHAR) AS site_id, s_acctbal * 2.0 AS centoid_lat, s_acctbal * 2.0 + 1.0 AS centoid_lon FROM supplier WHERE s_suppkey % 3 = 0),
      |prev_geo AS (SELECT 'g' || s_suppkey AS geocode_id, 'PC' AS geocode_type, 'pid_' || (s_suppkey % 30) AS address_pid, CAST(NULL AS VARCHAR) AS site_id, s_acctbal AS centoid_lat, s_acctbal + 1.0 AS centoid_lon FROM supplier),
      |geo_base AS (SELECT * FROM imp_geo UNION ALL SELECT * FROM prev_geo WHERE geocode_id NOT IN (SELECT geocode_id FROM imp_geo)),
      |mapping AS (SELECT address_pid, min(site_id) AS f FROM addr_kept WHERE address_pid IS NOT NULL AND site_id IS NOT NULL GROUP BY 1),
      |filled AS (SELECT g.geocode_id, g.geocode_type, g.address_pid, coalesce(g.site_id, m.f) AS site_id, g.centoid_lat, g.centoid_lon
      |           FROM geo_base g LEFT JOIN mapping m ON g.address_pid = m.address_pid)
      |SELECT * FROM filled WHERE address_pid IN (SELECT address_pid FROM addr_kept)""".stripMargin

  private val plsEncodedSql =
    """WITH imported_pid AS (SELECT 'iri_' || c_custkey AS address_iri FROM customer WHERE c_custkey % 5 <> 0),
      |prev_pid AS (SELECT 'iri_' || c_custkey AS address_iri FROM customer WHERE c_custkey % 2 = 0),
      |pid_map AS (SELECT address_iri FROM imported_pid UNION SELECT address_iri FROM prev_pid),
      |addresses AS (SELECT DISTINCT 'iri_' || o_custkey AS address_iri, 'pid_' || o_custkey AS address_pid, 's' || (o_custkey % 50) AS site_id FROM orders),
      |addr_kept AS (SELECT * FROM addresses WHERE address_iri IN (SELECT address_iri FROM pid_map)),
      |map AS (SELECT address_iri AS key, CAST(row_number() OVER (ORDER BY address_iri) AS BIGINT) AS id
      |        FROM (SELECT DISTINCT address_iri FROM addr_kept))
      |SELECT m.id AS addr_id, a.address_pid, a.site_id FROM addr_kept a JOIN map m ON a.address_iri = m.key""".stripMargin

  // ------------------------------------------------------------------
  // Registry
  // ------------------------------------------------------------------

  /** name -> (query, oracle SQL). None = non-SQL-expressible (rows-only). */
  val registry: Vector[(String, Q, Option[String])] = Vector(
    ("q1_agg", q1Agg, Some(q1AggSql)),
    ("latest_per_key", latestPerKey, Some(latestPerKeySql)),
    ("first_wins_dedup", firstWins, Some(firstWinsSql)),
    ("upsert", upsert, Some(upsertSql)),
    ("upsert_with_reset", upsertReset, Some(upsertResetSql)),
    ("carry_forward", carryForward, Some(carryForwardSql)),
    ("prune_unreferenced", pruneUnref, Some(pruneUnrefSql)),
    ("unmatched", unmatched, Some(unmatchedSql)),
    ("backfill_from_join", backfill, Some(backfillSql)),
    ("validate", validate, Some(validateSql)),
    ("watermark_delta", watermark, Some(watermarkSql)),
    ("semi_key_batch", semiKeys, Some(semiKeysSql)),
    ("salted_join", saltedJoin, Some(saltedJoinSql)),
    ("snapshot_diff", snapshotDiff, Some(snapshotDiffSql)),
    ("distinct_vals", distinctVals, Some(distinctValsSql)),
    ("top_n", topN, Some(topNSql)),
    ("id_map_extend", idMapExtend, Some(idMapExtendSql)),
    ("id_map_bulk", idMapBulk, Some(idMapExtendSql)),
    ("id_map_encode", idMapEncode, Some(idMapEncodeSql)),
    ("scalar_funcs_text", scalarText, Some(scalarTextSql)),
    ("scalar_funcs_time", scalarTime, Some(scalarTimeSql)),
    ("address_assembly", addressAssembly, Some(addressAssemblySql)),
    ("pls_run", plsRun, Some(plsRunSql)),
    ("pls_encoded", plsEncoded, Some(plsEncodedSql)),
  ) ++ TextQueries.registry ++ VectorQueries.registry ++ EventQueries.registry ++
    SourceQueries.registry ++ ExtQueries.registry
}
