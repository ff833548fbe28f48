package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}
import graft.pipeline.CurationPipeline

/** pipeline.CurationPipeline — composition of langId → quality gate →
  * exact dedup → split. */
class CurationPipelineSpec extends SparkSpec {

  private def fixture = {
    val s = spark; import s.implicits._
    Seq(
      // 10 distinct tokens, no punct: score = 0.2·1·1 = 0.2 → passes 0.15
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "web"),
      // byte-identical duplicate with a HIGHER id: must collapse into doc 0
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "web"),
      // 5 tokens, 1 distinct: score = 0.1·0.2 = 0.02 → gated out
      (2L, "x x x x x", "en", "spam"),
      // distinct passing doc, its own fingerprint group
      (3L, "one two three four five six seven eight nine ten", "fr", "books"))
      .toDF("doc_id", "text", "lang", "source")
  }

  test("gate drops low-quality docs, dedup collapses to lowest id, split assigned") {
    val out = CurationPipeline.run(fixture, minQuality = 0.15).collect()
      .map(r => r.getLong(0) -> ((r.getString(3), r.getDouble(4), r.getLong(5), r.getString(6))))
      .toMap
    assert(out.keySet === Set(0L, 3L))
    val (src0, score0, copies0, split0) = out(0L)
    assert(src0 === "web" && score0 === 0.2 && copies0 === 2L)
    assert(out(3L)._3 === 1L)
    assert(Set("train", "val", "test").contains(split0))
  }

  test("pipeline == manual chain of its stage operators") {
    val docs = fixture
    val manual = TextAnalysis.splitAssign(
      Dedup.exact(
        TextAnalysis.qualityScore(TextAnalysis.langId(docs))
          .filter(col("quality_score") >= 0.15)
          .select("doc_id", "text", "lang", "pred_lang", "source", "quality_score")))
      .select("doc_id", "lang", "pred_lang", "source", "quality_score", "n_copies", "split")
    val got = CurationPipeline.run(docs, minQuality = 0.15)
    assert(got.collect().map(_.toSeq).toSet === manual.collect().map(_.toSeq).toSet)
  }

  test("single shuffle: only the fingerprint aggregation exchanges") {
    val plan = CurationPipeline.run(fixture, minQuality = 0.15)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected one fp shuffle, got $exchanges:\n$plan")
  }
}
