package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** M6 — stable surrogate-key dictionary encoding (reference
  * `address_etl/id_map.py:8-84`, invoked ×5 at `address_etl/pls/tables.py:934-938`).
  *
  * Invariants (the reference gets them from SQLite AUTOINCREMENT + UNIQUE;
  * SURVEY.md §7.4.1):
  *   - injective: one id per key, one key per id;
  *   - stable: once a key has an id, every later run returns the same id;
  *   - monotonic/dense: new keys get maxExistingId+1, +2, ... in a
  *     deterministic (sorted-by-key) order, so re-runs are reproducible;
  *   - idempotent: encoding an already-encoded input is a no-op.
  *
  * Scale notes: the `row_number` over new keys is a single-partition window,
  * but only over the DELTA (keys never seen before), which in steady-state
  * incremental runs is tiny relative to the corpus — the same asymmetry the
  * reference exploits. The map itself is shuffled on `key` once and is
  * broadcast when small. If a cold-start bulk load ever made the delta huge,
  * swap `assignIds` for the zipWithIndex variant below without changing the
  * contract.
  */
object IdMap {
  val KEY = "key"
  val ID  = "id"

  /** An empty map with the canonical (key STRING, id BIGINT) schema. */
  def empty(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField(KEY, StringType, nullable = false), StructField(ID, LongType, nullable = false))))
  }

  /** Extend `map` with ids for every key of `df(keyCol)` not yet mapped.
    * Returns the NEW map (old ∪ new assignments).
    *
    * The anti join guards against BOTH the iri and the id key space —
    * `NOT IN (SELECT iri FROM map UNION SELECT id FROM map)`, reference
    * `address_etl/id_map.py:36-45` — so extending over an already-encoded
    * frame is a no-op (idempotence). Null keys are excluded: the reference's
    * PKs are NOT NULL, and a null can neither join nor be encoded.
    */
  def extend(map: DataFrame, df: DataFrame, keyCol: String): DataFrame = {
    val keys = df.select(col(keyCol).cast("string").as(KEY))
      .filter(col(KEY).isNotNull).distinct()
    val known = map.select(KEY).unionByName(map.select(col(ID).cast("string").as(KEY)))
    val fresh = keys.join(known, Seq(KEY), "left_anti")
    val maxId = map.agg(coalesce(max(col(ID)), lit(0L)).as("m")) // 1-based like AUTOINCREMENT
    val assigned = fresh
      .withColumn(ID, row_number().over(Window.orderBy(col(KEY))).cast("long"))
      .crossJoin(broadcast(maxId))
      .withColumn(ID, col(ID) + col("m"))
      .select(KEY, ID)
    map.select(KEY, ID).unionByName(assigned)
  }

  /** Rewrite `df(keyCol)` text keys to their integer ids using (an already
    * extended) `map`. LEFT join + keep-as-is, mirroring the reference's
    * UPDATE (`id_map.py:59-84`): a non-null key that matches no map entry
    * is — by `extend`'s iri ∪ id guard — an id-space string from an
    * already-encoded frame, and passes through unchanged (this is what
    * makes double-encoding a no-op). A key that is neither mapped nor a
    * valid id raises rather than silently nulling or dropping the row.
    * Null-key rows are rejected up front. No broadcast hint — the map
    * grows with every distinct key ever seen, so at scale AQE must pick
    * the strategy (it still broadcasts genuinely-small maps at runtime).
    */
  def encode(df: DataFrame, map: DataFrame, keyCol: String): DataFrame = {
    val m = map.withColumnRenamed(KEY, "__k").withColumnRenamed(ID, "__id")
    df.filter(col(keyCol).isNotNull)
      .join(m, col(keyCol).cast("string") === col("__k"), "left")
      // try_cast: under ANSI mode a plain cast on a non-numeric key would
      // throw CAST_INVALID_INPUT before the diagnostic below can fire
      .withColumn("__asId", expr(s"try_cast(`$keyCol` AS BIGINT)"))
      // assert_true lives in a Filter (null = pass = keep), NOT a dropped
      // projection — Catalyst prunes unused project columns, which would
      // silently optimize the check away
      .where(assert_true(col("__id").isNotNull || col("__asId").isNotNull,
        concat(lit(s"unmappable $keyCol (neither a mapped key nor an id): "), col(keyCol))).isNull)
      .withColumn(keyCol, coalesce(col("__id"), col("__asId")))
      .drop("__k", "__id", "__asId")
  }

  /** Bulk variant of `extend` for cold-start loads where the delta is NOT
    * small: ids come from Spark's own `orderBy(key)` (a distributed
    * range-partitioned sort) followed by `zipWithIndex` (one per-partition
    * offset pass) instead of a single-partition window. Sorting with the
    * SAME engine sort as `extend`'s `Window.orderBy` matters: Spark orders
    * strings by UTF-8 binary bytes, while Scala's `String` ordering compares
    * UTF-16 code units — the two disagree on supplementary-plane characters,
    * which would silently destabilize ids if the paths were mixed across
    * runs. Identical assignments — zipWithIndex over the key-sorted RDD IS
    * row_number by key — so the two are interchangeable per data size
    * (IdMapSpec asserts equality, including on supplementary-plane keys).
    */
  def extendBulk(map: DataFrame, df: DataFrame, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    val keys = df.select(col(keyCol).cast("string").as(KEY))
      .filter(col(KEY).isNotNull).distinct()
    val known = map.select(KEY).unionByName(map.select(col(ID).cast("string").as(KEY)))
    val fresh = keys.join(known, Seq(KEY), "left_anti")
    val maxId = map.agg(coalesce(max(col(ID)), lit(0L))).head().getLong(0)
    val assignedRdd = fresh.orderBy(KEY).rdd.map(_.getString(0))
      .zipWithIndex()
      .map { case (k, i) => org.apache.spark.sql.Row(k, i + 1 + maxId) }
    val assigned = spark.createDataFrame(assignedRdd, fresh.schema
      .add(org.apache.spark.sql.types.StructField(ID, org.apache.spark.sql.types.LongType, nullable = false)))
    map.select(KEY, ID).unionByName(assigned)
  }

  /** extend + encode in one step; returns (encoded entity, new map).
    *
    * The entity frame has THREE consumers in the fused plan — `extend`'s
    * distinct-key scan, `encode`'s probe side, and the map side again via
    * the fresh assignments — so it is persisted here (spill-to-disk at
    * scale) rather than recomputed: for a pipeline output like the PLS
    * addresses, each consumer would otherwise re-run the entire upstream
    * join DAG. The reference materializes every entity to a SQLite table
    * before encoding (`pls/tables.py:934-938`) — this is the same staging,
    * minus the disk round-trip when it fits in memory.
    *
    * The persist is GUARDED (`Caching.ensurePersisted`): re-invoking over
    * an equal plan — repeated incremental runs, an entity chain whose
    * frames share upstream plans, a bench's warm-up + timed passes —
    * reuses the existing cache entry instead of re-registering it (the
    * `CacheManager: Asked to cache already cached data` churn this
    * replaced). Cache ownership stays with the CALLER: the entry is left
    * for LRU eviction (recompute-on-eviction keeps it correct), and a
    * caller that wants deterministic release calls `df.unpersist()` after
    * materializing both returned frames — never before, since both read
    * through the cached plan.
    */
  def extendAndEncode(map: DataFrame, df: DataFrame, keyCol: String): (DataFrame, DataFrame) = {
    val cached = graft.util.Caching.ensurePersisted(df)
    val m2 = extend(map, cached, keyCol)
    (encode(cached, m2, keyCol), m2)
  }
}
