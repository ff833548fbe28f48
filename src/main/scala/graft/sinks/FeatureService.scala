package graft.sinks

import org.apache.spark.sql.DataFrame

/** ESRI FeatureServer WRITE-BACK (`applyEdits`) — the one capability the
  * driver brief names ("write to feature service") that the reference
  * never exercises (it reads layers — `address_etl/geocode.py:398-466`,
  * `address_etl/address_iri_pid_map.py:192-256` — and publishes
  * SQLite→S3→Kafka instead). Modeled on the public ArcGIS REST
  * `applyEdits` operation: one POST per batch carrying `adds` and
  * `updates` feature arrays (updates keyed by the layer's objectId
  * attribute), each feature an `attributes` map plus optional point
  * geometry, the response one per-feature result in request order.
  *
  * Same trait+fake discipline as [[Sinks.Notifier]]/[[Sinks.ArtifactStore]]
  * (no egress in this sandbox): the contract — batching, add/update
  * split, attribute stringification, per-feature error surfacing, raise
  * semantics — is asserted against [[FeatureService.RecordingEditor]] in
  * SinksSpec; a deployment supplies an HTTP implementation.
  */
object FeatureService {

  /** One feature edit: eagerly-stringified attributes (the reference's
    * `str(attrs[...])` discipline for everything it moves over this wire,
    * `address_etl/geocode.py:214-215`; null attribute values stay null)
    * plus optional point geometry `(x, y)`.
    */
  final case class FeatureEdit(attributes: Map[String, String],
                               geometry: Option[(Double, Double)] = None)

  /** Per-feature applyEdits outcome, request order. */
  final case class EditResult(objectId: Option[Long], success: Boolean,
                              error: Option[String] = None)

  /** One applyEdits POST: adds then updates, results in the same order
    * (adds' results first, like the REST response's `addResults` +
    * `updateResults`). Implementations MUST be synchronous and return a
    * result per submitted feature.
    */
  trait FeatureEditor {
    def applyEdits(layerUrl: String, adds: Seq[FeatureEdit],
                   updates: Seq[FeatureEdit]): Seq[EditResult]
  }

  /** Batch summary returned by [[writeBack]]. */
  final case class WriteBackResult(nAdds: Long, nUpdates: Long, nBatches: Long)

  final class ApplyEditsException(msg: String) extends RuntimeException(msg)

  /** Every plan-time config check [[writeBack]] performs, factored out so
    * an orchestrator ([[graft.pipeline.EtlRun]]) can run the FULL set
    * before its first durable side effect — not just the checks writeBack
    * happens to hit first. Zero Spark jobs: schema-only.
    */
  def validateWriteBack(df: DataFrame, objectIdCol: String,
                        xCol: Option[String], yCol: Option[String],
                        pageSize: Int): Unit = {
    require(pageSize > 0, "pageSize must be positive")
    require(xCol.isDefined == yCol.isDefined,
      "xCol and yCol must be supplied together (or both omitted)")
    val cols = df.columns
    require(cols.contains(objectIdCol), s"missing objectId column $objectIdCol")
    for (c <- xCol ++ yCol)
      require(cols.contains(c), s"missing coordinate column $c (columns: ${cols.mkString(", ")})")
  }

  /** Push a DataFrame's rows to a feature layer in page-size-bounded
    * applyEdits batches. Rows with a non-null `objectIdCol` become
    * UPDATES (keyed by that attribute); null-objectId rows become ADDS.
    * Optional `xCol`/`yCol` map to point geometry. Any per-feature error
    * in a batch raises [[ApplyEditsException]] naming the batch and the
    * failed features — the reference's raise-on-delivery-error posture
    * ([[Sinks.CollectingNotifier]]); batches already applied stay applied
    * (applyEdits is idempotent per objectId for updates, so a retried run
    * converges).
    *
    * Shape: the rows stream through `toLocalIterator` — bounded driver
    * memory (one partition at a time), ONE REST client — deliberately
    * mirroring the reference's single-session pagination in the opposite
    * direction: a feature service is a rate-limited shared endpoint, and
    * hammering it from a thousand executors is the anti-pattern, not the
    * scale path. A deployment that owns a high-throughput layer can wrap
    * the same `FeatureEditor` contract in `df.foreachPartition` unchanged.
    */
  def writeBack(df: DataFrame, editor: FeatureEditor, layerUrl: String,
                objectIdCol: String = "objectid",
                xCol: Option[String] = None, yCol: Option[String] = None,
                pageSize: Int = 2000): WriteBackResult = {
    validateWriteBack(df, objectIdCol, xCol, yCol, pageSize)
    val cols = df.columns
    val attrCols = cols.filterNot(c => xCol.contains(c) || yCol.contains(c))
    // With geometry columns there are TWO passes (the pre-scan below, then
    // toLocalIterator), so pin ONE materialization in a guarded cache —
    // uncached, each pass recomputes the upstream plan, and a
    // NON-deterministic plan could even pass the pre-scan yet stream a bad
    // row. Without geometry columns there is no pre-scan and exactly one
    // consumer: caching would be pure cost, so skip it.
    val (cached, releaseCache) =
      if (xCol.isDefined) graft.util.Caching.acquire(df) else (df, () => ())
    try {
      // data-quality gate BEFORE the first edit is applied: adds are not
      // idempotent (a re-run would duplicate features already added by
      // batches that succeeded before a mid-stream abort), so a
      // half-specified-geometry row must fail the run while the layer is
      // still untouched — one distributed pre-scan, not a driver loop
      for (x <- xCol; y <- yCol) {
        import org.apache.spark.sql.functions.col
        val bad = cached.filter(col(x).isNull =!= col(y).isNull)
          .select(col(objectIdCol).cast("string")).take(1)
        if (bad.nonEmpty) throw new ApplyEditsException(
          s"half-specified geometry (exactly one of $x/$y is null) for " +
            s"$objectIdCol=${bad.head.getString(0)}; no edits applied")
      }
      writeBackRows(cached, editor, layerUrl, objectIdCol, xCol, yCol, pageSize, attrCols)
    } finally releaseCache()
  }

  private def writeBackRows(df: DataFrame, editor: FeatureEditor, layerUrl: String,
                            objectIdCol: String, xCol: Option[String], yCol: Option[String],
                            pageSize: Int, attrCols: Array[String]): WriteBackResult = {
    val it = df.toLocalIterator()
    var nAdds = 0L; var nUpdates = 0L; var nBatches = 0L
    val adds = scala.collection.mutable.ArrayBuffer[FeatureEdit]()
    val updates = scala.collection.mutable.ArrayBuffer[FeatureEdit]()
    def flush(): Unit = if (adds.nonEmpty || updates.nonEmpty) {
      val results = editor.applyEdits(layerUrl, adds.toSeq, updates.toSeq)
      nBatches += 1
      val submitted = adds.size + updates.size
      if (results.size != submitted)
        throw new ApplyEditsException(
          s"applyEdits batch $nBatches returned ${results.size} results for $submitted features")
      val failed = results.zipWithIndex.filterNot(_._1.success)
      if (failed.nonEmpty)
        throw new ApplyEditsException(
          s"applyEdits batch $nBatches failed for ${failed.size}/$submitted features: " +
            failed.take(5).map { case (r, i) =>
              s"#$i oid=${r.objectId.getOrElse("?")} ${r.error.getOrElse("unknown error")}"
            }.mkString("; "))
      nAdds += adds.size; nUpdates += updates.size
      adds.clear(); updates.clear()
    }
    while (it.hasNext) {
      val row = it.next()
      val attrs = attrCols.map { c =>
        val i = row.fieldIndex(c)
        c -> (if (row.isNullAt(i)) null else String.valueOf(row.get(i)))
      }.toMap
      // BOTH coordinates null = an attributes-only row in a point layer →
      // geometry=None (an NPE here would fail mid-stream AFTER earlier
      // batches were already applied, with no batch context in the error).
      // Exactly ONE null is half-specified geometry — corrupt input. The
      // PRE-SCAN in writeBack is the primary gate (it fails before any
      // edit is applied); this row-level raise is only the backstop for a
      // row the cached pre-scan could not have seen, never the path a
      // deterministic input reaches.
      val geom = (xCol, yCol) match {
        case (Some(x), Some(y)) =>
          val xNull = row.isNullAt(row.fieldIndex(x))
          val yNull = row.isNullAt(row.fieldIndex(y))
          if (xNull != yNull) throw new ApplyEditsException(
            s"half-specified geometry (exactly one of $x/$y is null) for " +
              s"$objectIdCol=${attrs.getOrElse(objectIdCol, null)}")
          if (xNull) None
          else Some((row.getAs[Number](x).doubleValue(), row.getAs[Number](y).doubleValue()))
        case _ => None
      }
      val edit = FeatureEdit(attrs, geom)
      if (attrs(objectIdCol) == null) adds += edit else updates += edit
      if (adds.size + updates.size >= pageSize) flush()
    }
    flush()
    WriteBackResult(nAdds, nUpdates, nBatches)
  }

  /** Recording fake: captures every batch, mints sequential objectIds for
    * adds, echoes update objectIds, and injects a per-feature failure for
    * any attribute value in `failValues` — SinksSpec drives the contract
    * through it.
    */
  final class RecordingEditor(failValues: Set[String] = Set.empty) extends FeatureEditor {
    val batches = scala.collection.mutable.ArrayBuffer[(String, Seq[FeatureEdit], Seq[FeatureEdit])]()
    private var nextOid = 1000L
    override def applyEdits(layerUrl: String, adds: Seq[FeatureEdit],
                            updates: Seq[FeatureEdit]): Seq[EditResult] = {
      batches += ((layerUrl, adds, updates))
      def result(e: FeatureEdit, oid: Option[Long]): EditResult =
        if (e.attributes.values.exists(v => v != null && failValues.contains(v)))
          EditResult(oid, success = false, error = Some("injected failure"))
        else EditResult(oid, success = true)
      adds.map { e => nextOid += 1; result(e, Some(nextOid)) } ++
        updates.map(e => result(e, e.attributes.get("objectid").filter(_ != null).map(_.toLong)))
    }
  }
}
