package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregates with EXACT verification gates.
  *
  * At 100 TB, exact `count(DISTINCT)` and exact percentiles are among the
  * most expensive aggregations Spark runs (distinct forces a two-phase
  * expand/shuffle; exact percentile buffers whole groups). The sketch forms
  * — HyperLogLog++ (`approx_count_distinct`) and the Greenwald-Khanna /
  * KLL-style quantile sketch (`approx_percentile`) — are single-pass,
  * map-side-combined, fixed-memory aggregates: the scalable defaults.
  *
  * Sketch values are engine-specific, so they can never be graded against
  * another engine's output directly. The queries built here therefore emit
  * the EXACT statistic alongside a BOOLEAN gate asserting the sketch landed
  * within tolerance of it — the exact value and the gate are deterministic
  * and portable (the oracle asserts `true`), while the sketch estimate
  * itself stays internal. Both Spark sketches are deterministic functions
  * of their input multiset, so the gate cannot flap between runs.
  */
object Sketches {

  /** Per-group exact distinct count + a gate that HLL++ (at `rsd` target
    * relative standard deviation) agreed within `tol` relative error.
    */
  /** Default `tol` is 5σ of the sketch's target rsd: at 2.5σ (the old
    * 0.05) roughly 1% of large-cardinality groups land outside the gate
    * on HONEST sketch behavior — and since the sketch is deterministic
    * per dataset, such a failure is permanent for that input. 5σ makes a
    * legitimate excursion astronomically unlikely while still catching a
    * broken sketch outright. The gate is a DIAGNOSTIC sanity bound, not
    * a proof.
    */
  def distinctWithHllGate(df: DataFrame, groupCols: Seq[String], valueCol: String,
                          rsd: Double = 0.02, tol: Double = 0.10): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        countDistinct(col(valueCol)).as("n_exact"),
        approx_count_distinct(col(valueCol), rsd).as("__n_hll"))
      .withColumn("hll_ok",
        abs(col("__n_hll") - col("n_exact")).cast("double") <=
          lit(tol) * col("n_exact").cast("double"))
      .select(groupCols.map(col) ++ Seq(col("n_exact"), col("hll_ok")): _*)

  /** Corpus vocabulary head — the top-`topK` tokens by total term
    * frequency with a stable dense rank (count desc, token asc) — plus a
    * gate that a Count-Min sketch over the same token stream agreed on
    * every emitted count.
    *
    * The CMS is the 100 TB path for heavy hitters: a fixed
    * `depth × width` integer grid, merged associatively map-side, never
    * proportional to the vocabulary (billions of distinct n-grams at
    * corpus scale — the exact groupBy this query also runs is the thing
    * that stops scaling first). Like `distinctWithHllGate`, the sketch
    * estimate itself is engine-specific and stays internal; the graded
    * output is the exact count plus the deterministic `cms_ok` gate
    * (seeded sketch + associative merge ⇒ the estimate is a pure
    * function of the input multiset; the oracle asserts `true`).
    *
    * The CMS one-sided guarantee (`exact ≤ est ≤ exact + ε·N` w.p.
    * `confidence` per query) is union-bounded over `topK` gate lookups,
    * so the gate allows 2·⌈ε·N⌉ slack. Driver traffic is bounded: the
    * `topK` collected rows and one sketch object.
    */
  def vocabWithCmsGate(docs: DataFrame, topK: Int = 50, textCol: String = "text",
                       eps: Double = 0.0005, confidence: Double = 0.999,
                       seed: Int = 42, idCol: String = "doc_id"): DataFrame = {
    // both actions — the exact top-K job and the sketch job — read the
    // SHARED TextAnalysis.tokenBase layer and explode the cached token
    // arrays on the fly (explode from cached columnar batches is cheap;
    // persisting the EXPLODED stream, as this operator once did
    // privately, costs strictly more memory than the array layer and is
    // shared with nobody). The layer follows shared-layer lifecycle —
    // left for sibling consumers / LRU, dropped by
    // `SparkEntry.releaseSharedCaches` — rather than this operator's old
    // acquire/release pair, which evicted a cache the text family reuses.
    // NOTE this operator is EAGER (two actions at call time) — the
    // returned frame is the driver-local gate result, not a lazy plan.
    // The layer is read only when the id column exists: this operator
    // never needed an id before it joined the shared layer, so an
    // id-less corpus keeps working on the direct-tokenize path — under
    // its OWN guarded persist of the token-ARRAY frame (acquired, then
    // released once both actions have run): without it the corpus
    // tokenizes twice, once per eager action. The array form is cached,
    // not the exploded stream, for the same memory reason as the layer;
    // both actions explode from the cached columnar batches on the fly.
    val (base, releaseBase) =
      if (docs.columns.contains(idCol))
        (TextAnalysis.tokenBase(docs, idCol, textCol), () => ())
      else {
        import graft.functions.GraftFunctions.{normalizeText, tokens}
        graft.util.Caching.acquire(
          docs.select(tokens(normalizeText(col(textCol))).as("__tok")))
      }
    val toks = base.select(explode(col("__tok")).as("token"))
    val (top, sketch) =
      try {
        val t = toks.groupBy("token").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token")).limit(topK) // TakeOrdered: k·partitions driver merge
          .collect()
        (t, toks.stat.countMinSketch("token", eps, confidence, seed))
      } finally releaseBase()
    val tol = 2L * math.ceil(eps * sketch.totalCount()).toLong
    val spark = docs.sparkSession
    import spark.implicits._
    top.toSeq.zipWithIndex.map { case (r, i) =>
      val (t, n) = (r.getString(0), r.getLong(1))
      val est = sketch.estimateCount(t)
      ((i + 1).toLong, t, n, est >= n && est <= n + tol)
    }.toDF("rank", "token", "n", "cms_ok")
  }

  /** Per-group exact percentiles (linear interpolation — the SQL
    * `percentile_cont` definition both Spark and DuckDB implement) + a gate
    * that the single-pass quantile sketch at `accuracy` agreed within `tol`
    * relative error on the median. Exact values are rounded to 6 for
    * cross-engine FP stability.
    */
  def percentilesWithGate(df: DataFrame, groupCols: Seq[String], valueCol: String,
                          accuracy: Int = 10000, tol: Double = 0.01): DataFrame = {
    val v: Column = col(valueCol).cast("double")
    // the gate is RANK-honest as well as value-relative: percentile_approx
    // guarantees rank error (and returns only ACTUAL data values), while
    // the exact p50 interpolates — on a 2-row group {1.0, 1.1} the sketch
    // correctly answers 1.0 but sits 0.05 from the interpolated 1.05, and
    // a value-only tolerance would flag honest behavior. The disc window
    // [percentile_disc(0.45), percentile_disc(0.55)] over-covers the
    // sketch's tiny rank error with actual data values, and the
    // value-relative clause still catches gross value corruption on
    // near-constant groups. Diagnostic sanity bound, not a proof.
    df.select(groupCols.map(col) :+ v.as("__v"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(
        percentile(col("__v"), lit(0.5)).as("__p50"),
        percentile(col("__v"), lit(0.95)).as("__p95"),
        percentile_approx(col("__v"), lit(0.5), lit(accuracy)).as("__a50"),
        expr("percentile_disc(0.45) WITHIN GROUP (ORDER BY __v)").as("__d45"),
        expr("percentile_disc(0.55) WITHIN GROUP (ORDER BY __v)").as("__d55"))
      .withColumn("approx_ok",
        (col("__a50") >= col("__d45") && col("__a50") <= col("__d55")) ||
          abs(col("__a50") - col("__p50")) <= lit(tol) * greatest(abs(col("__p50")), lit(1.0)))
      .select(groupCols.map(col) ++ Seq(
        round(col("__p50"), 6).as("p50"),
        round(col("__p95"), 6).as("p95"),
        col("approx_ok")): _*)
  }
}
