package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S3/S4 wire-format leg: ESRI FeatureServer JSON pages
  * (`{"features": [{"attributes": {...}, "geometry": {"x":..,"y":..}}]}`,
  * reference `address_etl/geocode.py:205-222`) parsed into a DataFrame on
  * executors — one page document per input row, like SparqlSource.
  *
  * Attributes land as map<string,string> (the reference eagerly casts every
  * attribute to str, F7 — and physical field NAMES drift, so a fixed struct
  * would fight S5); geometry becomes plain lon/lat doubles.
  */
object EsriSource {

  val pageSchema: StructType = StructType(Seq(
    StructField("features", ArrayType(StructType(Seq(
      StructField("attributes", MapType(StringType, StringType)),
      StructField("geometry", StructType(Seq(
        StructField("x", DoubleType), StructField("y", DoubleType))))))))))

  /** One row per feature: `attrs` map + lon/lat (null without geometry).
    * A page that does not parse to the expected shape (truncated body, an
    * ESRI `{"error": ...}` document) RAISES — `from_json` yields null on
    * parse failure and a plain `explode` would silently swallow the whole
    * 2000-row page, the reference's `json.loads` raises instead. The check
    * sits in a Filter (assert_true is null = pass) so it cannot be pruned.
    */
  def features(pages: Dataset[String]): DataFrame =
    pages.select(col("value"), from_json(col("value"), pageSchema).as("p"))
      .where(assert_true(col("p").isNotNull && col("p.features").isNotNull,
        concat(lit("malformed ESRI page document: "), substring(col("value"), 1, 200))).isNull)
      .select(explode(col("p.features")).as("f"))
      .select(col("f.attributes").as("attrs"),
        col("f.geometry.x").as("lon"), col("f.geometry.y").as("lat"))

  /** Normalize features to the geocode shape using RESOLVED physical field
    * names (S5 — `pid` vs `address_pid`, `type` vs `geocode_type`), mirror
    * of `normalize_geocode_feature`.
    */
  def normalizeGeocodes(feats: DataFrame, layer: LayerSchema.GeocodeLayerSchema): DataFrame =
    feats.select(
      col("attrs")(layer.objectIdField).as("geocode_id"),
      col("attrs")(layer.addressPidField).as("address_pid"),
      col("attrs")(layer.geocodeTypeField).as("geocode_type_iri"),
      col("lat").as("centoid_lat"), col("lon").as("centoid_lon"))
}
