package graft

import graft.sources.{EsriSource, LayerSchema}

/** The FIXTURES.md §2 wire shapes verbatim: the drifted feature normalizes
  * to string-cast attributes + geometry, exactly like the reference's
  * `normalize_geocode_feature` (`tests/test_geocode_schema.py:157-175`).
  */
class EsriSourceSpec extends SparkSpec {

  private val page =
    """{"features": [
      |{"attributes": {"objectid": 1, "pid": 444541,
      |  "type": "https://linked.data.gov.au/def/geocode-types/property-centroid"},
      | "geometry": {"x": 153.1, "y": -27.6}},
      |{"attributes": {"objectid": 2, "pid": 444542,
      |  "type": "https://linked.data.gov.au/def/geocode-types/property-centroid"}}
      |]}""".stripMargin

  test("feature page parses on executors; numbers become strings (F7); geometry optional") {
    val s = spark; import s.implicits._
    val feats = EsriSource.features(spark.createDataset(Seq(page)))
    val rows = feats.orderBy("lat").collect()
    assert(rows.length == 2)
    val layer = LayerSchema.geocodeSchema(Set("objectid", "pid", "type"))
    val norm = EsriSource.normalizeGeocodes(feats, layer)
      .orderBy("geocode_id").collect()
    assert(norm(0).getString(0) == "1")        // objectid, string-cast
    assert(norm(0).getString(1) == "444541")   // pid resolved via drift schema
    assert(norm(0).getString(2).endsWith("property-centroid"))
    assert(norm(0).getDouble(3) == -27.6 && norm(0).getDouble(4) == 153.1)
    assert(norm(1).isNullAt(3) && norm(1).isNullAt(4)) // geometry absent -> nulls
  }

  test("malformed or error page documents raise instead of silently dropping the page") {
    val s = spark; import s.implicits._
    val truncated = """{"features": [{"attributes": {"objectid"""
    val errorDoc = """{"error": {"code": 498, "message": "Invalid token"}}"""
    for (bad <- Seq(truncated, errorDoc)) {
      val e = intercept[Exception] {
        EsriSource.features(spark.createDataset(Seq(page, bad))).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("malformed ESRI page")), s"got: $e")
    }
    // a VALID page with zero features is fine (end of pagination), not an error
    assert(EsriSource.features(spark.createDataset(Seq("""{"features": []}"""))).count() == 0)
  }

  test("normalized IRIs feed the F6 initialism fallback (example-new-geocode -> ENG)") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    val out = Seq("https://x/def/geocode-types/example-new-geocode").toDF("iri")
      .select(graft.functions.GraftFunctions.normalizeGeocodeType(lit(null), col("iri")))
      .head().getString(0)
    assert(out == "ENG")
  }
}
