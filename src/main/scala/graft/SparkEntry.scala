package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The actual registry lives in Queries.registry (one entry per SURVEY §2
  * operator / pipeline extension, each with its DuckDB oracle SQL).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full PLS run (§3.1) — carry-forward, upsert, prune, backfill.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.plsRun(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.registry.map { case (n, q, _) => n -> q }.toMap
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.registry.collect { case (n, _, Some(sql)) => n -> sql }.toMap
  /** Named shared-layer fills (image/video decode layers, pair graphs) —
    * `Bench` times each once as a `layer:<name>` row before the query
    * passes so per-query numbers measure the query, not whichever
    * consumer happened to pay a family's one-time fill. Not part of the
    * graded `queries` registry (a fill has no oracle semantics).
    */
  def layerWarmups: Vector[(String, (SparkSession, String) => DataFrame)] =
    TextQueries.layers
  /** Deterministically drop every shared frame the engine's guarded
    * persists registered (shingle/token-hash bases, the LSH pair graph,
    * id-map deltas, term-count frames) — for long-lived sessions embedding
    * the engine that want the memory back without waiting for LRU
    * eviction. Queries issued afterwards recompute (and re-cache) what
    * they need; results are unaffected.
    */
  def releaseSharedCaches(): Unit = graft.util.Caching.releaseAll()
}
