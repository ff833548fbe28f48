package graft

/** Plan hygiene across the ENTIRE registry: no query may plan a
  * CartesianProduct — every pair-generating operator must go through an
  * equi join (LSH buckets, band keys, blocking) or an explicit broadcast.
  * This is the executable form of the 100 TB design rule.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("no registered query plans a CartesianProduct") {
    val offenders = Queries.registry.flatMap { case (name, q, _) =>
      val plan = q(spark, dir).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian plans: $offenders")
  }

  test("address assembly broadcasts its small dimension sides") {
    val plan = Queries.registry.collectFirst { case ("address_assembly", q, _) => q }
      .get(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast joins in:\n$plan")
  }

  test("per-key dedup queries aggregate — no whole-table Window sort may reappear") {
    // latestPerKey/firstWinsDedup/exact are max_by/min_by aggregates whose
    // shuffle carries ~|keys|; a row_number Window (shuffle-sorts the whole
    // table) sneaking back in is a 100 TB regression, caught here
    for (name <- Seq("latest_per_key", "first_wins_dedup", "exact_dedup")) {
      val plan = Queries.registry.collectFirst { case (`name`, q, _) => q }
        .get(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"$name plans a Window:\n$plan")
      assert(plan.contains("Aggregate"), s"$name lost its aggregate:\n$plan")
    }
  }

  test("scans prune columns: q1_agg reads only the needed lineitem columns") {
    val plan = Queries.registry.collectFirst { case ("q1_agg", q, _) => q }
      .get(spark, dir).queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_returnflag") && !readSchema.contains("l_shipdate"),
      s"column pruning failed: $readSchema")
  }
}
