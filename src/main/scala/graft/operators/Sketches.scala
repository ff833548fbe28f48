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
  def distinctWithHllGate(df: DataFrame, groupCols: Seq[String], valueCol: String,
                          rsd: Double = 0.02, tol: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        countDistinct(col(valueCol)).as("n_exact"),
        approx_count_distinct(col(valueCol), rsd).as("__n_hll"))
      .withColumn("hll_ok",
        abs(col("__n_hll") - col("n_exact")).cast("double") <=
          lit(tol) * col("n_exact").cast("double"))
      .select(groupCols.map(col) ++ Seq(col("n_exact"), col("hll_ok")): _*)

  /** Per-group exact percentiles (linear interpolation — the SQL
    * `percentile_cont` definition both Spark and DuckDB implement) + a gate
    * that the single-pass quantile sketch at `accuracy` agreed within `tol`
    * relative error on the median. Exact values are rounded to 6 for
    * cross-engine FP stability.
    */
  def percentilesWithGate(df: DataFrame, groupCols: Seq[String], valueCol: String,
                          accuracy: Int = 10000, tol: Double = 0.01): DataFrame = {
    val v: Column = col(valueCol).cast("double")
    df.groupBy(groupCols.map(col): _*)
      .agg(
        percentile(v, lit(0.5)).as("__p50"),
        percentile(v, lit(0.95)).as("__p95"),
        percentile_approx(v, lit(0.5), lit(accuracy)).as("__a50"))
      .withColumn("approx_ok",
        abs(col("__a50") - col("__p50")) <= lit(tol) * greatest(abs(col("__p50")), lit(1.0)))
      .select(groupCols.map(col) ++ Seq(
        round(col("__p50"), 6).as("p50"),
        round(col("__p95"), 6).as("p95"),
        col("approx_ok")): _*)
  }
}
