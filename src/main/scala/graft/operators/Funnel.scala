package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-sequence (funnel) analysis over an event stream: per user, the
  * first time each step of `steps` was completed, where step k counts only
  * if it happens strictly AFTER the user's step k−1 completion — the
  * standard conversion-funnel semantics (view → click → purchase), which a
  * plain per-type `min(ts)` gets wrong (a purchase before the first view
  * must not count as a conversion).
  *
  * Event order is the total order (ms, event_id). It is encoded into ONE
  * sortable long — `ms · 2²⁰ + (event_id mod 2²⁰)` — so "strictly after"
  * is a single integer comparison in both Spark and any oracle engine.
  * The modulo keeps the encoding in range for arbitrary id spaces; ids
  * only tie-break events in the same millisecond, so the reduction
  * changes nothing unless two same-step events share BOTH ms and id-mod —
  * and even then both engines agree, because they compare equal keys the
  * same way. Null-timestamp events can never complete a step (null key
  * comparisons are false in both engines).
  *
  * Shape at 100 TB: filter to step types (pushed to the scan), then ONE
  * hash shuffle on user_id; each step is an UNORDERED window aggregate
  * (`min(when(...)) over (partition by user)` — whole-partition frame, no
  * sort), chained left to right because step k's predicate reads step
  * k−1's column. The final per-user collapse groups on the partitioning
  * already in place, so no second shuffle. Nothing is collected; state
  * per user is k longs. The streaming twin is
  * `EventsStream.funnelProgress` (one k-slot state row per user).
  */
object Funnel {

  private val TieMod = 1L << 20

  /** One row per user having at least one step-type event:
    * `<step>_ms` (nullable) per step — epoch-ms of the first in-order
    * completion — plus `depth` = number of consecutive steps completed.
    */
  def funnel(events: DataFrame, steps: Seq[String] = Seq("view", "click", "purchase"),
             userCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    val w = Window.partitionBy(userCol)
    var df = events
      .filter(col(typeCol).isin(steps: _*))
      .select(col(userCol), col(typeCol),
        (unix_millis(col(tsCol)) * TieMod + pmod(col(idCol), lit(TieMod))).as("__k"))
    steps.zipWithIndex.foreach { case (st, i) =>
      val hit =
        if (i == 0) col(typeCol) === st
        else col(typeCol) === st && col("__k") > col(s"__t${i - 1}")
      df = df.withColumn(s"__t$i", min(when(hit, col("__k"))).over(w))
    }
    val stepCols = steps.indices.map { i =>
      // every __t column is constant across the user's partition — max is
      // just the per-user collapse, not a real aggregation choice
      max(col(s"__t$i")).as(s"__m$i")
    }
    // ascending fold nests the DEEPEST step's test outermost:
    // when(m_last, k)…otherwise(when(m_0, 1).otherwise(0))
    val depth = steps.indices.foldLeft(lit(0L)) { case (acc, i) =>
      when(col(s"__m$i").isNotNull, lit((i + 1).toLong)).otherwise(acc)
    }
    df.groupBy(col(userCol))
      .agg(stepCols.head, stepCols.tail: _*)
      .select(col(userCol) +:
        // exact FLOOR division, in integers end to end: `/` is double
        // division (the packed key is ~2⁶⁰, past double's 2⁵³ exact
        // range — a remainder near 2²⁰ rounds the quotient up one ms),
        // and bare `div` truncates toward zero, which is one too high
        // for pre-1970 (negative) timestamps. Subtracting the pmod
        // remainder first makes the key an exact multiple, so `div` IS
        // floor — mirrored verbatim in the oracle.
        steps.indices.map { i =>
          expr(s"(__m$i - pmod(__m$i, ${TieMod}L)) div ${TieMod}L")
            .cast("long").as(s"${steps(i)}_ms")
        } :+
        depth.as("depth"): _*)
  }
}
