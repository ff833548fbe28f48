package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.functions.GraftFunctions
import graft.operators.RelOps
import graft.sources.{LayerSchema, PagedSource, PageFetcher, ScanSpec}

/** §3.3 — the incremental remote-scan-and-merge flow
  * (`GeocodeImporter.import_geocodes`, reference `geocode.py:398-488`):
  * introspect the layer schema (S5), build the watermark predicate (P8),
  * degrade to a full refresh when the watermark column disappeared —
  * dropping carried-forward state (I3/M4), fetch pages in parallel,
  * normalize (F7 string casts, F6 type-code cache with initialism
  * fallback), and merge into the carried state resetting site_id (M3/M5).
  */
object GeocodeImport {

  final case class Result(geocodes: DataFrame, fullRefresh: Boolean)

  /** @param physicalSchema the remote layer's schema (physical field names)
    * @param typeCodes (geocode_type_iri, code) cache — stored ∪ fetched (U2)
    * @param previous carried-forward geocodes from the last snapshot
    * @param watermark previous run's start time, ESRI datetime format (I1)
    */
  def importGeocodes(spark: SparkSession, fetcher: PageFetcher,
                     physicalSchema: StructType, typeCodes: DataFrame,
                     previous: Option[DataFrame], watermark: Option[String],
                     pageSize: Int = 2000): Result = {
    val layer = LayerSchema.geocodeSchema(physicalSchema.fieldNames.toSet)
    val fullRefresh = LayerSchema.requiresFullRefresh(layer, watermark)
    val where = LayerSchema.whereClause(layer, watermark)

    // P2: project only the fields the normalization reads (the reference's
    // outFields pushdown, `geocode.py:420-427`) — a wide layer otherwise
    // ships every attribute over the wire on every incremental run
    val raw = PagedSource.read(spark, fetcher, physicalSchema, pageSize,
      ScanSpec(whereClause = Some(where),
        columns = Some(Seq(layer.objectIdField, layer.geocodeTypeField,
          layer.addressPidField, "lat", "lon"))))

    // physical -> logical names + eager string casts (F7,
    // `geocode.py:205-222`), then type normalization (F6)
    val renamed = raw.select(
      col(layer.objectIdField).cast("string").as("geocode_id"),
      col(layer.geocodeTypeField).cast("string").as("geocode_type_iri"),
      col(layer.addressPidField).cast("string").as("address_pid"),
      col("lat").cast("double").as("centoid_lat"),
      col("lon").cast("double").as("centoid_lon"))
    // defensive one-row-per-iri: a duplicate iri in the cache (stored and
    // fetched both carrying a changed code) would otherwise FAN OUT the
    // left join and duplicate every geocode of that type downstream
    val codes = broadcast(typeCodes
      .groupBy("geocode_type_iri").agg(min("code").as("__code")))
    val normalized = renamed
      .join(codes, Seq("geocode_type_iri"), "left")
      .withColumn("geocode_type",
        GraftFunctions.normalizeGeocodeType(col("__code"), col("geocode_type_iri")))
      .select("geocode_id", "geocode_type", "address_pid", "centoid_lat", "centoid_lon")
      .withColumn("site_id", lit(null).cast("string"))
      .select("geocode_id", "geocode_type", "address_pid", "site_id",
        "centoid_lat", "centoid_lon")

    // M4: watermark loss clears carried state; M3/M5 otherwise
    val merged = previous.filterNot(_ => fullRefresh) match {
      case Some(prev) =>
        RelOps.carryForward(prev, normalized, Seq("geocode_id"), Seq("site_id"))
      case None => normalized
    }
    Result(merged, fullRefresh)
  }
}
