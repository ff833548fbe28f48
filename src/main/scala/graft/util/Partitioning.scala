package graft.util

import org.apache.spark.sql.DataFrame

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

  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // getNumPartitions is plan-derived (no job); cheap for the scan-shaped
    // frames this guards
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
