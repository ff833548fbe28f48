package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, Project}

/** Size-gated parallelism floor for corpus-heavy single-scan inputs.
  *
  * A small parquet corpus arrives as ONE scan partition (a 100 TB corpus
  * arrives as thousands), so every expensive per-row kernel downstream —
  * tokenize+md5, winnow sketches, quality signals — would run on one core
  * of the whole box. [[spread]] repartitions up to the session's default
  * parallelism ONLY when the frame plans fewer partitions than that: the
  * shuffle it inserts moves the (tiny, by construction — that is what the
  * gate measured) raw rows once, after which the heavy projection and any
  * cache fill run machine-wide. At cluster scale the gate never fires —
  * scans already exceed default parallelism — so plans are untouched
  * exactly where a blanket repartition would be a catastrophic full-corpus
  * shuffle. The same runtime-measured-size discipline as
  * `Dedup.dedupClusters`' union-find gate and `IdMap`'s assignment paths.
  *
  * Row-level semantics are unaffected (every consumer is
  * partitioning-invariant by the engine's determinism rules — seedless
  * hashes, exact sums, total-order ranks), and canonical plan equality is
  * preserved across invocations, so guarded layer caches keep matching.
  */
object Partitioning {

  /** True iff the plan is scan + Project/Filter only — no node that could
    * plan an exchange. Decided on the OPTIMIZED LOGICAL plan, which never
    * runs a job; the check exists because the gate below calls `.rdd`,
    * and under AQE `.rdd` on a plan containing exchanges FINALIZES the
    * adaptive plan — eagerly executing every upstream query stage at
    * plan-construction time, work the repartitioned plan built afterwards
    * would not reuse (a nominally lazy API silently running its upstream
    * twice). Derived frames skip the gate instead: anything downstream of
    * a shuffle already runs at `spark.sql.shuffle.partitions`-wide
    * parallelism, so the floor has nothing to add there.
    */
  private def scanShaped(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.find {
      case _: Project | _: Filter => false
      case p => !p.isInstanceOf[LeafNode]
    }.isEmpty

  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // getNumPartitions is plan-derived for the exchange-free plans the
    // scanShaped precondition admits (file-split enumeration, no job)
    if (scanShaped(df) && df.rdd.getNumPartitions < target) df.repartition(target)
    else df
  }
}
