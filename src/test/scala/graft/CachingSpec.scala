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
}
