package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Guarded persist for operators whose plans have multiple consumers.
  *
  * `Dataset.persist` on a plan the CacheManager already tracks logs an
  * `Asked to cache already cached data` warning and pays registry
  * bookkeeping without adding reuse — and several graft operators are
  * invoked repeatedly over the SAME logical plan (bench warm-up + two
  * timed passes; cluster_dedup and dedup_keep_best sharing one pair
  * graph; five-entity id-map chains). `Dataset.storageLevel` consults the
  * CacheManager by canonicalized plan, so the guard is cross-invocation
  * safe: the first caller persists, every later caller (even holding a
  * different Dataset object over an equal plan) reuses the entry silently.
  *
  * Cache ownership: entries registered here are deliberately LEFT for
  * Spark's LRU to manage — blocks evict under memory pressure with
  * recompute-on-eviction as the fallback (the lineage stays valid), so a
  * long-lived session holds at most one entry per distinct operator plan,
  * not one per invocation. A caller that wants deterministic release
  * (e.g. a pipeline that is done with an entity frame) calls
  * `df.unpersist()` itself once its downstream results are materialized —
  * unpersisting earlier would silently recompute the whole upstream DAG
  * per remaining consumer.
  */
object Caching {
  def ensurePersisted(df: DataFrame,
                      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    if (df.storageLevel == StorageLevel.NONE) df.persist(level) else df
}
