package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the driver-provided parquet fixtures
  * (`/root/testdata/sf*`; see TESTDATA.md).
  *
  * All reads go through here so that scan-level concerns live in one place:
  *   - column pruning / predicate pushdown happen naturally because callers
  *     compose on the returned (lazy) DataFrame before any action;
  *   - the `events` table carries nanosecond-precision parquet timestamps,
  *     which Spark cannot represent (TimestampType is microseconds). We read
  *     them as `Long` nanos (legacy nanosAsLong) and downcast to a proper
  *     TimestampType column, so every downstream operator sees a real
  *     timestamp. DuckDB oracles must compare at millisecond-or-coarser
  *     granularity (epoch_ms / date_trunc), which survives the truncation.
  */
object Tables {
  def path(dir: String, table: String): String = s"$dir/$table.parquet"

  /** Fixture scans are memoized per (session, path): every query in the
    * registry re-reads its input tables, and each fresh `spark.read.parquet`
    * re-lists the directory and re-parses footers ON THE DRIVER — dozens of
    * redundant metadata passes per Verify/Bench run (the data path is lazy
    * and unaffected). Safe because the driver fixtures are immutable for a
    * session's lifetime; mutable paths (snapshot stores, state dirs) do not
    * read through here precisely so they re-list every time.
    */
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  // the memo strongly retains sessions via their DataFrames; the cap keeps
  // a long-lived JVM cycling many sessions from accumulating dead plans
  // (the rare clear just re-lists on the next read)
  private val MemoCap = 128

  def read(spark: SparkSession, dir: String, table: String): DataFrame = {
    if (memo.size > MemoCap) memo.clear()
    memo.computeIfAbsent((spark, path(dir, table)), kv => kv._1.read.parquet(kv._2))
  }

  def region(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** `events` with `ts` as a true TimestampType (µs), derived from the
    * nanosecond parquet column. `ts_ns` (raw Long) is kept for callers that
    * need full precision.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    memo.computeIfAbsent((spark, path(dir, "events") + "#events"),
      _ => eventsUncached(spark, dir))

  private def eventsUncached(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read
      .option("timestampNTZFormat", "")
      .parquet(path(dir, "events"))
    val tsField = raw.schema("ts")
    tsField.dataType match {
      case org.apache.spark.sql.types.LongType =>
        // nanosAsLong mode: Long nanos since epoch
        // integral division: `/` on Columns is double division, and 2026-era
        // epoch nanos exceed double's 2^53 exact range (rounds up to ~256ns
        // and half-even instead of truncating) — `div` is exact.
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _: org.apache.spark.sql.types.TimestampType =>
        raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        // parquet ns read as NTZ in some Spark configs; treat as UTC instant
        raw.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", unix_micros(col("ts").cast("timestamp")) * 1000L)
      case other =>
        throw new IllegalStateException(s"unexpected events.ts type: $other")
    }
  }
}
