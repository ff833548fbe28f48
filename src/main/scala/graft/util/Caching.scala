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
  * not one per invocation. For deterministic release there are two levels:
  *
  *   - [[acquire]] returns a release handle that unpersists ONLY when this
  *     call was the one that registered the entry. When the guard found an
  *     existing equal-plan entry, the handle is a no-op — another
  *     consumer's cache is never pulled out from under it (correctness
  *     would survive via lineage recompute, but its cache would silently
  *     vanish).
  *   - [[releaseAll]] drops every entry the guard registered in this
  *     process — the session-teardown hook for a long-lived application
  *     embedding the engine (`SparkEntry.releaseSharedCaches`).
  *
  * Ownership refs are STRONG, held until release: Spark's own CacheManager
  * already holds every registered plan tree strongly until unpersist (a
  * weak registry here would unpin nothing — it would only let wrapper GC
  * silently disown entries, leaving them unreleasable by [[releaseAll]]
  * for the session's lifetime). So the registry's footprint tracks the
  * set of LIVE cache registrations — exactly what the CacheManager pins
  * anyway — and [[releaseAll]] can always drop all of it. Entries a
  * caller unpersists directly (not through their handle) are swept lazily:
  * each registration prunes refs whose cache registration is gone, so an
  * externally-released entry's wrapper is not pinned forever.
  */
object Caching {

  // identity set of the exact Dataset objects THIS guard persisted —
  // ownership for release()'s no-op-on-foreign-entry contract and for
  // releaseAll(). Strong refs by design (see scaladoc).
  private val owned = java.util.Collections.synchronizedMap(
    new java.util.IdentityHashMap[DataFrame, java.lang.Boolean]())

  def ensurePersisted(df: DataFrame,
                      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    acquire(df, level)._1

  /** Guarded persist WITH an ownership-scoped release handle. The handle
    * unpersists iff this invocation registered the entry; if an equal plan
    * was already cached (by another operator, a prior invocation, or the
    * caller itself), the handle no-ops and cache lifetime stays with the
    * original owner / LRU.
    */
  def acquire(df: DataFrame,
              level: StorageLevel = StorageLevel.MEMORY_AND_DISK): (DataFrame, () => Unit) =
    // check-then-persist is atomic w.r.t. other acquire calls: without the
    // monitor, two threads acquiring equal-canonical-plan frames could both
    // see NONE, both register ownership, and either handle's release would
    // then unpersist the shared entry out from under the other's live
    // consumers — the exact scenario the ownership contract rules out.
    // (persist() takes the CacheManager's own lock inside this monitor;
    // safe — Spark never calls back into this object.)
    acquireMonitor.synchronized {
      if (df.storageLevel == StorageLevel.NONE) {
        if (owned.size() >= PruneThreshold) prune()
        df.persist(level)
        owned.put(df, java.lang.Boolean.TRUE)
        (df, () => release(df))
      } else (df, () => ())
    }

  private val acquireMonitor = new Object

  private def release(df: DataFrame): Unit =
    if (owned.remove(df) != null) { df.unpersist(); () }

  // Sweep owned refs whose CacheManager registration is gone (the caller
  // unpersisted directly instead of through the handle) — storageLevel is
  // the same by-canonical-plan lookup the guard itself uses. The sweep
  // walks ALL live refs (each an O(#cached) CacheManager lookup), so it is
  // gated behind a registry-size threshold instead of running on every
  // registration: below the threshold stale wrappers are a handful of
  // pinned objects, above it the sweep amortizes to rare.
  private val PruneThreshold = 64

  private def prune(): Unit = {
    val stale = new java.util.ArrayList[DataFrame]()
    owned.synchronized {
      owned.keySet().forEach { df =>
        if (df.storageLevel == StorageLevel.NONE) stale.add(df)
      }
      stale.forEach { df => owned.remove(df); () }
    }
  }

  /** Unpersist every entry this guard registered — the deterministic drop
    * for a long-lived session done with the engine's shared frames
    * (shingle bases, the LSH pair graph, id-map deltas). Safe to call at
    * any time: lineage stays valid, so later queries recompute (and
    * re-register) what they need.
    */
  def releaseAll(): Unit = {
    val snapshot = new java.util.ArrayList[DataFrame]()
    owned.synchronized { snapshot.addAll(owned.keySet()); owned.clear() }
    snapshot.forEach { df =>
      try df.unpersist()
      catch { case _: Throwable => () } // session may already be stopped
    }
  }
}
