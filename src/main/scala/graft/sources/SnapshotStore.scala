package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S7/K1 — versioned snapshot persistence. The reference keeps each run's
  * whole SQLite DB at `pls-etl/<endTs>/pls.db` on S3 and restores the
  * lexicographically-latest one (`main_pls.py:101-186`, `s3.py:111-121`).
  *
  * Spark-native shape: one directory per run (`<root>/<runTs>/<table>/`,
  * parquet), latest = max directory name. Parquet per table replaces the
  * monolithic DB so the next run prunes columns/partitions on read instead
  * of copying everything.
  */
class SnapshotStore(root: String) {
  private def fs(spark: SparkSession) = {
    val conf = spark.sparkContext.hadoopConfiguration
    new org.apache.hadoop.fs.Path(root).getFileSystem(conf)
  }

  /** Latest run id under the root, by descending lexicographic order —
    * exactly the reference's `get_latest_file` selection.
    */
  def latestRun(spark: SparkSession): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val f = fs(spark)
    if (!f.exists(p)) None
    else f.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).sorted(Ordering[String].reverse).headOption
  }

  def tablePath(runId: String, table: String): String = s"$root/$runId/$table"

  def write(df: DataFrame, runId: String, table: String): Unit =
    df.write.mode("overwrite").parquet(tablePath(runId, table))

  def read(spark: SparkSession, runId: String, table: String): DataFrame =
    spark.read.parquet(s"$root/$runId/$table")

  /** S8 — conditional scan: the reference checks `sqlite_master` before
    * copying carried-forward tables that older snapshots may lack.
    */
  def readIfExists(spark: SparkSession, runId: String, table: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$root/$runId/$table")
    if (fs(spark).exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  /** K1 at 100 TB — bucketed snapshot write: hash-bucket the table by its
    * join key on the way out. The snapshot is rewritten every run anyway,
    * so the bucketing costs one extra sort within the write — and every
    * keyed join of the NEXT run (previous snapshot ⋈ current delta on the
    * entity key, the recurring big⋈big join of the incremental flow) then
    * reads both sides pre-partitioned and skips the shuffle entirely when
    * bucket layouts line up (asserted in SinksSpec). Bucket metadata lives
    * in the session catalog (`bucketBy` requires `saveAsTable`); the files
    * stay under the snapshot layout via the external-table path.
    *
    * Returns the catalog table name to `spark.table(...)` (reading the
    * path directly would see the data but not the bucketing).
    */
  def writeBucketed(df: DataFrame, runId: String, table: String,
                    key: String, numBuckets: Int): String = {
    val name = s"snap_${runId}_$table".replaceAll("[^A-Za-z0-9_]", "_")
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", tablePath(runId, table))
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(name)
    name
  }
}
