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
      // size post-shuffle partitions by BYTES, not core count: with the
      // default parallelismFirst=true, AQE refuses to coalesce below the
      // core count, so a 1.5 MB iteration frame fans out to 32×48 KB tasks
      // whose per-task scheduling + execution-memory-lock contention cost
      // 40× the actual work (quality_classifier measured 72 s task time
      // for 4.8 s wall at local[32]; 1.9 s task time at local[8]). With
      // bytes-first coalescing the SAME setting is the production one —
      // big shuffles still fan out to advisory-sized partitions (guide
      // §2.2: partitions in the 100 MB–1 GB range, never a few KB). The
      // advisory is env-overridable for cluster profiles (production sets
      // 64m-256m per guide §9); the 1 MB local default — measured against
      // 2m/8m on the sf0.1 board — keeps compute-dense-but-small stages
      // (gram self-joins, sketch verifies) spread across cores while
      // still collapsing the KB-scale iteration shuffles that dominated
      // the driver-loop rows.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", "1m"))
      // let AQE coalesce INSIDE cached plans too (off by default): the
      // guard-persisted iteration frames (classifier featsY, the PageRank
      // edge list, banded streams) are exactly the caches whose KB-scale
      // partitions every loop round re-reads — without this the fill's
      // repartition pins the core-count partitioning into the cache and
      // the bytes-first rule above never reaches it
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
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
