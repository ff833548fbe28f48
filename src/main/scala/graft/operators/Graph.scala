package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality — the web-corpus curation signal the per-document
  * operators cannot see: a page's quality prior comes from its position in
  * the URL graph (Common Crawl publishes harmonic centrality for exactly
  * this use; PageRank is the classic form), and a 100 TB crawl curation
  * stack weights or gates documents by it alongside the content scores.
  *
  * Determinism contract (the classifier/unigram rule — no float ever sums
  * across rows): ranks live in MICRO units (`long`, initial mass
  * `round(10⁶/N)` per node); a node's per-edge contribution is the
  * HALF_UP-rounded long `round(rank/outdeg)`; the per-node inbound total
  * is an exact long sum; and the update
  * `round((10⁶−d)/N) + round(d·Σ/10⁶)` is per-node scalar arithmetic —
  * so the whole iteration is bit-identical across partitionings, engines,
  * and runs, and the oracle unrolls it in pure SQL.
  *
  * Semantics: fixed `iters` damped power iterations; a DANGLING node
  * (no out-edges) contributes nothing — its mass leaks, one of the two
  * standard conventions (redistribution is the other) and the one that
  * keeps every step a pure edge join; nodes without in-edges settle at
  * the teleport floor `(10⁶−d)/N`.
  *
  * Shape at 100 TB (per iteration): out-degrees are computed ONCE and
  * live with the edge list; the iteration is one equi join
  * (ranks ⨝ edges on src — co-partitioned by bucketing the edge list on
  * src, the layout a link graph is stored in anyway) plus one map-side-
  * combined sum keyed by dst, then a left join back to the node spine.
  * Every round ends in `localCheckpoint`: the lineage cut that keeps
  * round k's plan constant-size instead of k-fold nested (the
  * `dedupClusters` rule; swap reliable `checkpoint` for executor-loss
  * recovery). Driver traffic per round is ZERO — no collect; the loop is
  * driver-SCHEDULED but executor-resident, the GraphX pregel shape.
  */
object Graph {

  /** Drop the block-store registration behind an eagerly-localCheckpointed
    * frame once a LATER checkpoint has severed its lineage — shared with
    * the pointer-doubling clustering loop via `Caching.dropLocalCheckpoint`
    * (see its scaladoc for why the acquire discipline cannot reach these).
    */
  private def dropLocalCheckpoint(df: DataFrame): Unit =
    graft.util.Caching.dropLocalCheckpoint(df)

  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int = 5,
               dampingPpm: Long = 850000L, idCol: String = "doc_id"): DataFrame = {
    require(iters >= 1, "need at least one power iteration")
    require(dampingPpm >= 0L && dampingPpm <= 1000000L, "dampingPpm is parts-per-million")
    // the node spine is read iters+1 times (initial ranks + each round's
    // left join); checkpointing it materializes the distinct ONCE — the
    // per-round recompute (a full nodes scan + exchange per round) was
    // half of the r20 loop's per-round wall (guide §2.4 / §5)
    val spine = nodes.select(col(idCol)).distinct().localCheckpoint()
    val n = spine.count() // counts the materialized blocks — no second scan
    require(n > 0, "empty node set")
    // out-degrees ride the edge list — computed once, reused every round;
    // ACQUIRED (not ensurePersisted) so the registration is released once
    // the final ranks are checkpointed — a distinct edge frame per caller
    // must not pin a session-lifetime cache entry (the trainLogistic
    // acquire/release discipline). Cached HASH-PARTITIONED ON `src` (the
    // layout a production link graph is bucketed in anyway): every round's
    // rank join then exchanges only the node-sized rank frame, never the
    // edge list — EnsureRequirements reuses the cached partitioning
    // (guide §2.4: two operations keyed the same way share one exchange).
    // out-degree via a count window over the src partitioning the fill
    // establishes anyway: ONE pass over the (often expensive) caller edge
    // plan instead of the previous groupBy+self-join's two, and one fewer
    // exchange in the fill — identical values (count(*) per src)
    val (ed, releaseEd) = graft.util.Caching.acquire(
      edges.select(col("src"), col("dst"))
        .repartition(col("src"))
        .withColumn("outdeg", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("src")))))
    val baseMicro = math.round((1000000L - dampingPpm).toDouble / n) // HALF_UP: args positive
    // round 1's ranks are a constant-literal projection over the
    // materialized spine — no separate checkpoint needed
    var ranks = spine.withColumn("r", lit(math.round(1000000.0 / n)))
    // Checkpoint every SECOND round (and at the end), not every round: the
    // lineage stays ≤ 2 rounds deep (constant-size plans, same guarantee),
    // but the loop runs ceil(iters/2) jobs and writes half the
    // checkpoint bytes — the GraphX checkpoint-interval knob (its default
    // is 25 rounds; 2 keeps replans cheap while halving materializations).
    // The un-checkpointed intermediate round's frame is referenced twice
    // by the next round (rank join + spine side), but both subtrees share
    // their exchanges, so ReuseExchange computes the round once.
    var lastCkpt = spine
    try {
      for (i <- 1 to iters) {
        val inbound = ed
          .join(ranks.select(col(idCol).as("src"), col("r")), Seq("src"))
          .select(col("dst"),
            round(col("r").cast("double") / col("outdeg"), 0).cast("long").as("__c"))
          .groupBy(col("dst")).agg(sum("__c").as("__s"))
        // the spine side of the teleport join is ranks' OWN id column —
        // identical rows to `spine`, read from the last checkpoint's
        // materialized blocks (round 1 reads the spine blocks directly)
        ranks = ranks.select(col(idCol))
          .join(inbound.select(col("dst").as(idCol), col("__s")), Seq(idCol), "left")
          .select(col(idCol),
            (lit(baseMicro) +
              round(lit(dampingPpm.toDouble) * coalesce(col("__s"), lit(0L)) / lit(1000000.0), 0)
                .cast("long")).as("r"))
        if (i % 2 == 0 || i == iters) {
          val prev = lastCkpt
          ranks = ranks.localCheckpoint() // eager — prev's blocks unreachable now
          lastCkpt = ranks
          dropLocalCheckpoint(prev)
        }
      }
    } finally {
      releaseEd() // final ranks are materialized; nothing re-reads ed
      dropLocalCheckpoint(spine) // no-op when a later checkpoint already dropped it
    }
    ranks.select(col(idCol), col("r").as("rank_micro"),
      round(col("r") / lit(1000000.0), 6).as("rank"))
  }
}
