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
  *     call was the one that registered the entry AND the registration is
  *     still the plan's current one. When the guard found an existing
  *     equal-plan entry — or when the entry was dropped externally and a
  *     NEWER registration owns the plan — the handle is a no-op: another
  *     consumer's cache is never pulled out from under it (correctness
  *     would survive via lineage recompute, but its cache would silently
  *     vanish). Per-plan ownership is tracked in [[ownerByPlan]], keyed by
  *     the same canonicalized plan the CacheManager compares with.
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
  * caller unpersists directly (not through their handle) lose plan
  * ownership the moment an equal plan re-registers, and their wrapper
  * refs are swept lazily once the registry is large enough to matter.
  *
  * All registry transitions run under ONE monitor (acquire's
  * check-then-persist, release, releaseAll, the sweep), so two threads
  * acquiring equal canonical plans cannot both register, and a release
  * cannot interleave with a concurrent acquire's storageLevel check.
  * Spark's CacheManager locks nest INSIDE this monitor everywhere and
  * Spark never calls back into this object, so the ordering is acyclic.
  */
object Caching {

  // identity map of the exact Dataset objects THIS guard persisted — for
  // releaseAll() and handle idempotence…
  private val owned =
    new java.util.IdentityHashMap[DataFrame, java.lang.Boolean]()
  // …plus the CURRENT registration per canonicalized plan: a handle whose
  // entry was unpersisted externally and re-registered by a newer caller
  // must not unpersist the newer caller's cache (same canonical plan!)
  private val ownerByPlan =
    new java.util.HashMap[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, DataFrame]()

  private val monitor = new Object

  private def canon(df: DataFrame) = df.queryExecution.analyzed.canonicalized

  def ensurePersisted(df: DataFrame,
                      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    acquire(df, level)._1

  /** Guarded persist WITH an ownership-scoped release handle. The handle
    * unpersists iff this invocation registered the entry and still owns
    * the plan; otherwise it no-ops and cache lifetime stays with the
    * current owner / LRU.
    */
  def acquire(df: DataFrame,
              level: StorageLevel = StorageLevel.MEMORY_AND_DISK): (DataFrame, () => Unit) =
    monitor.synchronized {
      if (df.storageLevel == StorageLevel.NONE) {
        if (owned.size() >= PruneThreshold) prune()
        df.persist(level)
        owned.put(df, java.lang.Boolean.TRUE)
        ownerByPlan.put(canon(df), df)
        (df, () => release(df))
      } else (df, () => ())
    }

  private def release(df: DataFrame): Unit = monitor.synchronized {
    if (owned.remove(df) != null) {
      val c = canon(df)
      // unpersist only while this registration is the plan's CURRENT one —
      // after an external unpersist + re-registration by a newer caller,
      // this handle is stale and must not drop the newer entry
      if (ownerByPlan.get(c) eq df) {
        ownerByPlan.remove(c)
        df.unpersist()
      }
      ()
    }
  }

  // Sweep wrapper refs whose CacheManager registration is gone (the caller
  // unpersisted directly instead of through the handle) — storageLevel is
  // the same by-canonical-plan lookup the guard itself uses. The sweep
  // walks ALL live refs (each an O(#cached) CacheManager lookup), and when
  // every entry is live it removes nothing — the size gate is a cap on how
  // many stale wrappers can accumulate before we pay that walk, NOT an
  // amortization guarantee (correctness never depends on the sweep: stale
  // HANDLES are already neutralized by the ownerByPlan current-owner
  // check). Caller must hold `monitor`.
  private val PruneThreshold = 64

  private def prune(): Unit = {
    val stale = new java.util.ArrayList[DataFrame]()
    owned.keySet().forEach { df =>
      if (df.storageLevel == StorageLevel.NONE) stale.add(df)
    }
    stale.forEach { df =>
      owned.remove(df)
      val c = canon(df)
      if (ownerByPlan.get(c) eq df) { ownerByPlan.remove(c); () }
    }
  }

  /** Unpersist every entry this guard registered — the deterministic drop
    * for a long-lived session done with the engine's shared frames
    * (shingle bases, the LSH pair graph, id-map deltas). Safe to call at
    * any time: lineage stays valid, so later queries recompute (and
    * re-register) what they need.
    */
  def releaseAll(): Unit = monitor.synchronized {
    // unpersist inside the monitor too: a concurrent acquire must not
    // observe the entry as cached after its registration has been cleared
    // (it would hand out a no-op handle over a cache about to vanish)
    owned.keySet().forEach { df =>
      try df.unpersist()
      catch { case _: Throwable => () } // session may already be stopped
    }
    owned.clear()
    ownerByPlan.clear()
  }
}
