package graft

import org.apache.spark.storage.StorageLevel

/** The guarded persist three operator families rely on (shingle bases,
  * the shared LSH pair graph, id-map entity frames): registration is by
  * CANONICALIZED plan, so a freshly rebuilt equal plan sees the existing
  * entry and the guard declines to re-persist — the CacheManager
  * "already cached" churn this replaced.
  */
class CachingSpec extends SparkSpec {

  test("ensurePersisted registers once per canonical plan; equal rebuilds are no-ops") {
    import org.apache.spark.sql.functions.col
    val build = () => sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("lang")).filter(col("doc_id") % 97 === 0)
    val a = graft.util.Caching.ensurePersisted(build())
    try {
      assert(a.storageLevel == StorageLevel.MEMORY_AND_DISK)
      // a DIFFERENT Dataset object over an equal plan resolves to the same
      // cache entry — storageLevel consults the CacheManager by plan, so
      // the guard must not (and does not) re-persist
      val b = build()
      assert(b.storageLevel == StorageLevel.MEMORY_AND_DISK)
      val c = graft.util.Caching.ensurePersisted(b)
      assert(c eq b, "guard must return the frame unchanged when already cached")
    } finally a.unpersist()
    assert(build().storageLevel == StorageLevel.NONE)
  }

  test("acquire: release is ownership-scoped — foreign equal-plan entries survive") {
    import org.apache.spark.sql.functions.col
    val build = () => sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("source")).filter(col("doc_id") % 89 === 0)
    val (a, releaseA) = graft.util.Caching.acquire(build())
    try {
      assert(a.storageLevel == StorageLevel.MEMORY_AND_DISK)
      // a second acquire over an equal plan did NOT register the entry, so
      // its release must be a no-op — the first consumer keeps its cache
      val (b, releaseB) = graft.util.Caching.acquire(build())
      releaseB()
      assert(b.storageLevel == StorageLevel.MEMORY_AND_DISK,
        "non-owner release() evicted the owner's cache entry")
      // the owner's release drops it
      releaseA()
      assert(build().storageLevel == StorageLevel.NONE)
      // and a second owner-release is harmlessly idempotent
      releaseA()
    } finally a.unpersist()
  }

  test("a stale handle (entry dropped externally, plan re-registered) never evicts the new owner") {
    import org.apache.spark.sql.functions.col
    val build = () => sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id")).filter(col("doc_id") % 73 === 0)
    val (a, releaseA) = graft.util.Caching.acquire(build())
    // the documented anti-pattern: the caller unpersists directly instead
    // of through its handle…
    a.unpersist()
    // …and a NEWER caller re-registers the same canonical plan
    val (b, releaseB) = graft.util.Caching.acquire(build())
    try {
      assert(b.storageLevel == StorageLevel.MEMORY_AND_DISK)
      // the stale handle must be a no-op — same canonical plan, but the
      // registration it refers to is gone; unpersisting here would drop
      // the new owner's cache out from under it
      releaseA()
      assert(b.storageLevel == StorageLevel.MEMORY_AND_DISK,
        "a stale release handle evicted a newer registration's cache")
    } finally releaseB()
    assert(build().storageLevel == StorageLevel.NONE)
  }

  test("same-OBJECT re-registration: the older handle no-ops (epoch, not identity)") {
    import org.apache.spark.sql.functions.col
    val df = sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id")).filter(col("doc_id") % 71 === 0)
    val (_, rel1) = graft.util.Caching.acquire(df)
    df.unpersist() // the documented anti-pattern, same wrapper object
    val (_, rel2) = graft.util.Caching.acquire(df) // same object re-registers
    assert(df.storageLevel == StorageLevel.MEMORY_AND_DISK)
    // identity alone cannot tell the registrations apart — the epoch must
    rel1()
    assert(df.storageLevel == StorageLevel.MEMORY_AND_DISK,
      "a stale same-object handle evicted the newer registration's cache")
    rel2()
    assert(df.storageLevel == StorageLevel.NONE)
  }

  test("releaseAll drops every guard-registered entry still owned") {
    import org.apache.spark.sql.functions.col
    val b1 = () => sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id")).filter(col("doc_id") % 83 === 0)
    val b2 = () => sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id")).filter(col("doc_id") % 79 === 0)
    graft.util.Caching.ensurePersisted(b1())
    graft.util.Caching.ensurePersisted(b2())
    assert(b1().storageLevel == StorageLevel.MEMORY_AND_DISK)
    assert(b2().storageLevel == StorageLevel.MEMORY_AND_DISK)
    SparkEntry.releaseSharedCaches() // the public handle delegates here
    assert(b1().storageLevel == StorageLevel.NONE)
    assert(b2().storageLevel == StorageLevel.NONE)
  }

  test("the size-gated sweep drops registrations whose entries were unpersisted directly") {
    // correctness never depends on the sweep (stale handles are epoch-
    // neutralized); what it bounds is strong-ref accumulation from caches
    // dropped OUTSIDE the ownership API. Cross the gate with stale
    // entries and assert they are swept on the next registration.
    graft.util.Caching.releaseAll() // isolate from other suites' entries
    val frames = (0 until 64).map(i => spark.range(1000 + i).toDF("v"))
    frames.foreach(f => graft.util.Caching.ensurePersisted(f))
    assert(graft.util.Caching.registeredCount == 64)
    frames.foreach(_.unpersist()) // direct drops: all 64 now stale
    // next acquire crosses the PruneThreshold and sweeps before registering
    val fresh = spark.range(5000).toDF("v")
    graft.util.Caching.ensurePersisted(fresh)
    assert(graft.util.Caching.registeredCount == 1,
      s"sweep left ${graft.util.Caching.registeredCount} registrations")
    graft.util.Caching.releaseAll()
  }
}
