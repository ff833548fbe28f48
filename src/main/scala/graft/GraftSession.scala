package graft

import org.apache.spark.sql.SparkSession

/** One place for engine session defaults, shared by Verify/Bench/tests.
  *
  * local-mode sizing: shuffle partitions = cores (not the 200 default);
  * AQE on (runtime coalescing + skew-join splitting — the knobs that keep
  * the same plans healthy on a real cluster);
  * nanosAsLong so the ns-precision `events` parquet is readable (Spark's
  * TimestampType is µs) — see sources.Tables.events.
  */
object GraftSession {
  def configure(b: SparkSession.Builder, cpus: String): SparkSession.Builder =
    b.config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // read no-tz parquet timestamps as LTZ (session UTC): the engine's
      // time math (unix_millis, watermarks) is instant-based end to end
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")

  def local(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors() - 0).toString)
    val spark = configure(SparkSession.builder().master(s"local[$cpus]").appName(appName), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
