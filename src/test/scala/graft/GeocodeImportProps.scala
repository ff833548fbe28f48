package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.pipeline.GeocodeImport
import graft.sources.FixtureFetcher

/** Randomized incremental==full invariant for the §3.3 import flow: when
  * every changed-or-new source row carries an edit date past the
  * watermark and nothing was deleted (the regime incremental import is
  * FOR — deletions are the documented divergence, handled by the
  * downstream prune), an incremental run merged into the previous
  * import's state must equal a cold full refresh over the current source
  * — across random mutation subsets, additions, type-cache hits,
  * initialism fallbacks, and null pids. Also pins the M4 degradation:
  * a layer that lost its watermark column full-refreshes to the same
  * result with carried state dropped.
  */
object GeocodeImportProps extends Properties("GeocodeImport") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private val schema = StructType(Seq(
    StructField("objectid", LongType), StructField("pid", StringType),
    StructField("type", StringType), StructField("lat", DoubleType),
    StructField("lon", DoubleType), StructField("last_edited_date", StringType)))
  private val schemaNoWm = StructType(schema.fields.dropRight(1))

  private val iris = Seq("urn:g/structural", "urn:g/property-centroid",
    "urn:g/water-meter-location")

  private def typeCodes = {
    val s = spark; import s.implicits._
    Seq(("urn:g/structural", "STRU")).toDF("geocode_type_iri", "code")
  }

  private case class Attrs(pid: Option[String], iri: String, lat: Double, lon: Double)
  private val attrsGen: Gen[Attrs] = for {
    pid <- Gen.option(Gen.oneOf("p1", "p2", "p3"))
    iri <- Gen.oneOf(iris)
    lat <- Gen.choose(-90, 90).map(_.toDouble)
    lon <- Gen.choose(-180, 180).map(_.toDouble)
  } yield Attrs(pid, iri, lat, lon)

  private def row(id: Long, a: Attrs, date: String) =
    Row(id, a.pid.orNull, a.iri, a.lat, a.lon, date)

  private val stateGen = for {
    n <- Gen.choose(1, 6)
    olds <- Gen.listOfN(n, attrsGen)
    mutated <- Gen.listOfN(n, Gen.oneOf(true, false))
    nNew <- Gen.choose(0, 3)
    news <- Gen.listOfN(nNew, attrsGen)
    muts <- Gen.listOfN(n, attrsGen)
  } yield {
    val oldRows = olds.zipWithIndex.map { case (a, i) => row(i + 1L, a, "2026-01-01") }
    val currentRows = olds.lazyZip(mutated).lazyZip(muts).toList.zipWithIndex.map {
      case ((a, m, a2), i) => if (m) row(i + 1L, a2, "2026-01-09") else row(i + 1L, a, "2026-01-01")
    } ++ news.zipWithIndex.map { case (a, j) => row(100L + j, a, "2026-01-09") }
    (oldRows, currentRows)
  }

  private def collect(df: org.apache.spark.sql.DataFrame) = df
    .select("geocode_id", "geocode_type", "address_pid", "site_id", "centoid_lat", "centoid_lon")
    .collect().map(_.toSeq).toSet

  property("incremental merge == cold full refresh when the delta covers every change") =
    forAllNoShrink(stateGen) { case (oldRows, currentRows) =>
      val s = spark
      val prevA = GeocodeImport.importGeocodes(s,
        new FixtureFetcher(oldRows, schema), schema, typeCodes, None, None).geocodes
      val inc = GeocodeImport.importGeocodes(s,
        new FixtureFetcher(currentRows, schema), schema, typeCodes,
        Some(prevA), Some("2026-01-05"))
      val full = GeocodeImport.importGeocodes(s,
        new FixtureFetcher(currentRows, schema), schema, typeCodes, None, None).geocodes
      // M4 twin: watermark column gone — carried state must be DROPPED and
      // the full fetch must land on the same result
      val degraded = GeocodeImport.importGeocodes(s,
        new FixtureFetcher(currentRows.map(r => Row(r.toSeq.dropRight(1): _*)), schemaNoWm),
        schemaNoWm, typeCodes, Some(prevA), Some("2026-01-05"))
      !inc.fullRefresh && degraded.fullRefresh &&
        collect(inc.geocodes) == collect(full) &&
        collect(degraded.geocodes) == collect(full)
    }
}
