package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** S3/S4 — paginated remote-layer ingest (the reference walks an ESRI
  * FeatureServer with `resultOffset`/`resultRecordCount` pages of 2,000;
  * `address_etl/geocode.py:398-466`).
  *
  * Spark-native shape: the page space is partitioned with `spark.range`
  * and each executor fetches its own offset ranges via a pluggable,
  * serializable `PageFetcher` — pagination becomes parallelism instead of a
  * driver-side loop. Retry/backoff (reference I6) belongs inside the
  * fetcher; token refresh is per-executor state.
  *
  * The engine ships a deterministic in-memory fetcher for tests; a real
  * HTTP fetcher implements the same trait (no egress in this environment).
  */
trait PageFetcher extends Serializable {
  /** Total row count (the reference's `returnCountOnly` pushdown, S6). */
  def count(whereClause: Option[String]): Long
  /** Fetch rows [offset, offset+limit) as Rows of `schema`. */
  def fetch(offset: Long, limit: Int, whereClause: Option[String]): Iterator[Row]
}

object PagedSource {
  /** Read a full remote layer as a DataFrame, `pageSize` rows per request,
    * pages distributed across executors. `whereClause` is the pushed-down
    * predicate (the reference's watermark `last_edited_date >= ...`, P8).
    */
  def read(spark: SparkSession, fetcher: PageFetcher, schema: StructType,
           pageSize: Int = 2000, whereClause: Option[String] = None): DataFrame = {
    val total = fetcher.count(whereClause)
    if (total == 0) return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    val rdd = spark.range(0, total, pageSize).rdd.flatMap { offset =>
      fetcher.fetch(offset, pageSize, whereClause)
    }
    spark.createDataFrame(rdd, schema)
  }
}

/** In-memory fixture fetcher: serves a pre-materialized Seq[Row], applying a
  * `last_edited >= <ts>` watermark when given — mirrors the drift/full-
  * refresh behavior tests need (S5/I3).
  */
class FixtureFetcher(rows: Seq[Row], lastEditedIdx: Option[Int]) extends PageFetcher {
  private def filtered(whereClause: Option[String]): Seq[Row] = (whereClause, lastEditedIdx) match {
    case (Some(w), Some(idx)) =>
      // whereClause fixture format: "last_edited >= <ISO>"
      val ts = w.split(">=")(1).trim
      rows.filter(r => r.getString(idx) >= ts)
    case _ => rows
  }
  override def count(whereClause: Option[String]): Long = filtered(whereClause).size.toLong
  override def fetch(offset: Long, limit: Int, whereClause: Option[String]): Iterator[Row] =
    filtered(whereClause).slice(offset.toInt, offset.toInt + limit).iterator
}
