package graft

import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, RelOps}

/** MinMaxByPayloadPruning: callers that project a subset of a per-key
  * dedup result must not shuffle the untouched payload fields — stock
  * column pruning stops at the aggregate boundary, so without the rule
  * the full-row struct (at corpus scale: document text) rides the
  * aggregation buffer and the exchange.
  */
class PayloadPruningSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Field names inside the first min_by/max_by struct payload of the
    * plan's Aggregate node.
    */
  private def payloadFields(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectFirst { case a: Aggregate =>
      a.aggregateExpressions.collectFirst {
        case al if al.collectFirst { case _: AggregateExpression => () }.isDefined =>
          al.collectFirst {
            case s: org.apache.spark.sql.catalyst.expressions.CreateNamedStruct =>
              s.names.map(_.toString)
          }
      }.flatten
    }.flatten.getOrElse(Seq.empty)

  test("latestPerKey projected to a subset prunes the payload AND the scan") {
    val q = RelOps.latestPerKey(sources.Tables.orders(spark, dir),
        Seq("o_custkey"), col("o_orderdate"), Seq(col("o_orderkey")))
      .select("o_custkey", "o_orderkey", "o_totalprice")
    assert(payloadFields(q).toSet == Set("o_custkey", "o_orderkey", "o_totalprice"),
      s"payload not pruned: ${payloadFields(q)}")
    // pruning must reach the scan: unused columns leave the read schema
    val scanned = q.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.output.map(_.name)
      case p: org.apache.spark.sql.catalyst.plans.logical.Project
          if p.child.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LeafNode] =>
        p.projectList.map(_.name)
    }.getOrElse(Seq.empty)
    assert(!scanned.contains("o_orderpriority") && !scanned.contains("o_orderstatus"),
      s"scan not pruned: $scanned")
    // semantics: identical to the window form on the same subset
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val oracle = sources.Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    assert(q.collect().map(_.toSeq).toSet == oracle.collect().map(_.toSeq).toSet)
  }

  test("whole-struct consumption disables pruning") {
    val q = RelOps.latestPerKey(sources.Tables.orders(spark, dir),
      Seq("o_custkey"), col("o_orderdate"), Seq(col("o_orderkey")))
    // every orders column survives in the payload
    assert(payloadFields(q).toSet ==
      sources.Tables.orders(spark, dir).columns.toSet)
    assert(q.count() == 150L)
  }

  test("fields used inside expressions count as used; only dead fields drop") {
    val q = RelOps.firstWinsDedup(sources.Tables.lineitem(spark, dir),
        Seq("l_orderkey"), Seq(col("l_linenumber"), col("l_partkey"), col("l_suppkey")))
      .select(col("l_orderkey"),
        coalesce(col("l_quantity"), lit(0.0)).as("qty"),
        (col("l_extendedprice") * 2).as("px2"))
    val fields = payloadFields(q).toSet
    assert(fields.contains("l_quantity") && fields.contains("l_extendedprice")
      && fields.contains("l_orderkey"))
    assert(!fields.contains("l_returnflag") && !fields.contains("l_linestatus"),
      s"dead fields kept: $fields")
  }

  test("the filtered form prunes too, and filter-condition fields count as used") {
    // latestPerKey → filter on one payload field → select others: the
    // address-assembly spine. The filter's field must SURVIVE in the
    // payload (it is consumed), the untouched ones must drop.
    val q = RelOps.latestPerKey(sources.Tables.orders(spark, dir),
        Seq("o_custkey"), col("o_orderdate"), Seq(col("o_orderkey")))
      .filter(col("o_orderstatus") =!= "C")
      .select("o_custkey", "o_orderkey")
    val fields = payloadFields(q).toSet
    assert(fields.contains("o_orderstatus") && fields.contains("o_custkey")
      && fields.contains("o_orderkey"), s"payload: $fields")
    assert(!fields.contains("o_totalprice") && !fields.contains("o_orderpriority"),
      s"dead fields kept: $fields")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val oracle = sources.Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .filter(col("o_orderstatus") =!= "C").select("o_custkey", "o_orderkey")
    assert(q.collect().map(_.toSeq).toSet == oracle.collect().map(_.toSeq).toSet)
  }

  test("exact dedup projected without text drops the text from the payload") {
    val q = Dedup.exact(sources.Tables.documents(spark, dir))
      .select("doc_id", "lang", "n_copies")
    val fields = payloadFields(q).toSet
    assert(fields == Set("doc_id", "lang"), s"payload: $fields")
  }

  test("multi-consumer tradeoff: different subsets defeat reuse; ensurePersisted restores it") {
    // The rule's documented cost (scaladoc TRADEOFF note): two consumers
    // of the SAME dedup subtree projecting DIFFERENT subsets get
    // differently-pruned min_by structs — no longer canonically equal, so
    // exchange/aggregate reuse can't deduplicate them and the upstream
    // scan+shuffle runs twice. The remedy is pinning the dedup output
    // with Caching.ensurePersisted: one materialization, every consumer
    // reads the cache. This test locks BOTH halves.
    def latest = RelOps.latestPerKey(sources.Tables.orders(spark, dir),
      Seq("o_custkey"), col("o_orderdate"), Seq(col("o_orderkey")))
    def fanOut(base: org.apache.spark.sql.DataFrame) =
      base.select("o_custkey", "o_totalprice").join(
        base.select(col("o_custkey"), col("o_orderpriority")), Seq("o_custkey"))
    // half 1: the two pruned aggregates are distinct (different payloads)
    val unpinned = fanOut(latest)
    val aggs = unpinned.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a.canonicalized
    }
    assert(aggs.size == 2 && aggs.head != aggs(1),
      "expected two differently-pruned aggregates (reuse defeated)")
    // half 2: ensurePersisted pins ONE full-width materialization; both
    // consumers read InMemoryTableScan instead of re-running the dedup
    val (pinnedBase, release) = graft.util.Caching.acquire(latest)
    try {
      val pinned = fanOut(pinnedBase)
      // collect() first: AdaptiveSparkPlanExec hides its inner plan from
      // tree traversal, so probe the FINALIZED plan's rendering
      assert(pinned.collect().map(_.toSeq).toSet == unpinned.collect().map(_.toSeq).toSet)
      val scans = "InMemoryTableScan".r
        .findAllIn(pinned.queryExecution.executedPlan.toString).size
      assert(scans >= 2, s"expected both consumers on the cache, got $scans")
    } finally release()
  }

  test("curation pipeline's dedup payload carries no text (rule fires through the split chain)") {
    val q = Queries.registry.collectFirst { case ("curation_pipeline", qq, _) => qq }
      .get(spark, dir)
    val fields = payloadFields(q)
    assert(fields.nonEmpty && !fields.contains("text"),
      s"text rides the curation dedup exchange: $fields")
  }
}
