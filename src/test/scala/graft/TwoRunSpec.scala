package graft

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.IdMap
import graft.pipeline.{EtlRun, PlsPipeline}
import graft.sinks.Sinks
import graft.sources.SnapshotStore
import graft.util.FileRunLock

/** Two consecutive ETL runs through the real snapshot store — the
  * reference's core cross-run behavior (`main_pls.py:101-186`): run 2
  * restores run 1's snapshot (S7, latest-by-key-desc), reads the watermark
  * from its metadata (I1), carries state forward (U3/M5), upserts the delta
  * (M1/M3), and keeps surrogate ids stable (M6). No fakes on the storage
  * path — parquet in a temp dir.
  */
class TwoRunSpec extends SparkSpec {

  test("run 2 restores run 1's snapshot and preserves state invariants") {
    val s = spark; import s.implicits._
    val root = Files.createTempDirectory("tworun").toString
    val store = new SnapshotStore(root)
    val lock = new FileRunLock("tworun", Files.createTempDirectory("tworun-lock"))
    val artifacts = new Sinks.FakeArtifactStore
    val t0 = Instant.parse("2026-08-01T00:00:00Z")

    // ---- run 1: cold start (no previous snapshot) ----
    assert(store.latestRun(spark).isEmpty)
    val pid1 = Seq(("iri-1", "p1"), ("iri-2", "p2")).toDF("address_iri", "address_pid")
    val addr1 = Seq(("iri-1", "p1", "s1"), ("iri-2", "p2", "s2"))
      .toDF("address_iri", "address_pid", "site_id")
    val geo1 = Seq(("g1", "PC", "p1", Option.empty[String], 1.0, 2.0),
                   ("g2", "PC", "p2", Option.empty[String], 3.0, 4.0))
      .toDF("geocode_id", "geocode_type", "address_pid", "site_id", "centoid_lat", "centoid_lon")
    val map1 = IdMap.extend(IdMap.empty(spark), addr1.select(col("address_iri").as("pk")), "pk")

    val times1 = Iterator(t0, t0.plusSeconds(60), t0.plusSeconds(61))
    val out1 = PlsPipeline.run(PlsPipeline.RunInputs(None, None, pid1, geo1, addr1))
    val r1 = EtlRun.run(spark, EtlRun.Config("pls", "bkt", "pls-etl/", "geocodes"),
      lock, store, artifacts, new Sinks.CollectingNotifier(), "t",
      () => Map("geocodes" -> out1.geocodes, "addresses" -> out1.addresses,
        "pid_map" -> out1.pidMap, "id_map_address" -> map1),
      now = () => times1.next())

    // ---- run 2: restore, watermark, carry forward, delta upsert ----
    val latest = store.latestRun(spark)
    assert(latest.contains(r1.runId))
    val prevMeta = store.read(spark, latest.get, "metadata").head()
    assert(prevMeta.getString(0) == "2026-08-01T10:00:00+1000") // I1 watermark source
    val prevPid = store.readIfExists(spark, latest.get, "pid_map")
    val prevGeo = store.readIfExists(spark, latest.get, "geocodes")
    val prevMap = store.readIfExists(spark, latest.get, "id_map_address").get
    assert(prevPid.isDefined && prevGeo.isDefined)
    assert(store.readIfExists(spark, latest.get, "not_a_table").isEmpty) // S8

    // delta: iri-2 remapped, iri-3 new; g2 re-imported, g3 new
    val pid2 = Seq(("iri-2", "p2b"), ("iri-3", "p3")).toDF("address_iri", "address_pid")
    val addr2 = Seq(("iri-1", "p1", "s1"), ("iri-2", "p2b", "s2b"), ("iri-3", "p3", "s3"))
      .toDF("address_iri", "address_pid", "site_id")
    val geo2 = Seq(("g2", "SP", "p2b", Option.empty[String], 5.0, 6.0),
                   ("g3", "SP", "p3", Option.empty[String], 7.0, 8.0))
      .toDF("geocode_id", "geocode_type", "address_pid", "site_id", "centoid_lat", "centoid_lon")

    val out2 = PlsPipeline.run(PlsPipeline.RunInputs(
      prevGeo, prevPid, pid2, geo2, addr2))
    val map2 = IdMap.extend(prevMap, addr2.select(col("address_iri").as("pk")), "pk")

    // pid map: upserted (iri-2 -> p2b), carried (iri-1), new (iri-3)
    val pids = out2.pidMap.orderBy("address_iri").as[(String, String)].collect().toSeq
    assert(pids == Seq(("iri-1", "p1"), ("iri-2", "p2b"), ("iri-3", "p3")))
    // geocodes: g1 carried (site nulled then backfilled from addr1's s1),
    // g2 incoming wins (SP, p2b -> s2b), g3 new (p3 -> s3)
    val geos = out2.geocodes.orderBy("geocode_id")
      .select("geocode_id", "geocode_type", "address_pid", "site_id")
      .collect().toSeq
    assert(geos == Seq(Row("g1", "PC", "p1", "s1"), Row("g2", "SP", "p2b", "s2b"),
      Row("g3", "SP", "p3", "s3")))
    // id map: run-1 assignments unchanged, iri-3 got the next id (M6)
    val ids1 = map1.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ids2 = map2.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ids1.forall { case (k, v) => ids2(k) == v })
    assert(ids2("iri-3") == 3L)
    // artifact contract: run-1 upload preceded run-2, key embeds Brisbane end time
    assert(artifacts.uploads.head._3 == s"pls-etl/${r1.runId}/geocodes")
  }
}
