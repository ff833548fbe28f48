package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** End-to-end training-data curation: the standard pre-training corpus
  * pass, composed from the engine's own operators in the order every
  * public pipeline (C4, Gopher, RefinedWeb) runs them —
  *
  *   1. language ID (`TextAnalysis.langId`, heuristic marker argmax)
  *   2. quality scoring + threshold gate (`TextAnalysis.qualityScore`)
  *   3. exact first-wins dedup (`Dedup.exact`, lowest-id survivor)
  *   4. referentially-stable train/val/test split
  *      (`TextAnalysis.splitAssign`)
  *
  * The composition itself is the point: each stage is a pure
  * DataFrame → DataFrame function, so Catalyst fuses the whole pipeline
  * into one plan — lang-ID and quality signals evaluate in the same scan
  * projection, the quality gate filters BEFORE the dedup shuffle (the
  * only shuffle in the pipeline, ~one row per fingerprint after map-side
  * combine), and the split assignment is a shuffle-free projection on the
  * survivors. Nothing materializes between stages.
  *
  * Dedup runs AFTER the quality gate deliberately: a duplicate group's
  * survivor should be chosen among documents that passed the gate, not
  * dropped because a low-quality copy with a smaller id won the group
  * first. Ordering the stages differently is a one-line recomposition.
  */
object CurationPipeline {

  /** Returns one row per surviving document: ids, declared + predicted
    * language, quality score, duplicate-group size, and split.
    */
  def run(docs: DataFrame, minQuality: Double = 0.05,
          idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // no Partitioning.spread here: the r13 placement won standalone on an
    // idle box (machine-wide scoring scan) but LOST under the driver's
    // loaded full-suite conditions (0.67→0.83 s) — on a box already
    // saturated by concurrent queries the inserted exchange competes with
    // the very parallelism it buys, while the single-partition scoring
    // scan it replaced overlapped with the ambient load for free. Callers
    // with a genuinely cold single-partition corpus can pre-spread it.
    val scored = TextAnalysis.qualityScore(TextAnalysis.langId(docs, textCol), textCol)
      .filter(col("quality_score") >= lit(minQuality))
      .select(col(idCol), col(textCol), col("lang"), col("pred_lang"),
        col("source"), col("quality_score"))
    // plain exact(): this pipeline's output is ids + metadata + split,
    // never the text — MinMaxByPayloadPruning narrows the min_by payload
    // to the columns the final projection consumes, so no text rides the
    // dedup exchange (plan-asserted in PayloadPruningSpec; a hand-slimmed
    // exactSlim variant existed for one round before the rule subsumed it)
    val deduped = Dedup.exact(scored, idCol, textCol)
    TextAnalysis.splitAssign(deduped, idCol = idCol)
      .select(col(idCol), col("lang"), col("pred_lang"), col("source"),
        col("quality_score"), col("n_copies"), col("split"))
  }
}
