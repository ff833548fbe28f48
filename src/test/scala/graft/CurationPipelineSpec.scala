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

  test("runV2: url aliases drop pre-content, exact dups collapse, near-dup cluster keeps best prob6") {
    // fixture roles (v2Fixture): doc 0 the keeper; doc 1 a URL ALIAS of 0
    // with different text (its absence isolates the pre-content gate);
    // doc 2 byte-identical to 0 under a fresh url (exact-dedup collapse);
    // doc 3 a near-dup of 0, one token changed (LSH cluster-collapse);
    // doc 4 out-of-domain (no label token)
    val out = CurationPipeline.runV2(v2Fixture, col("text").contains("customer"), minProb = 0.0)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(4), r.getLong(5), r.getLong(6)))).toMap // prob6, n_copies, n_members
    // doc 1 gone (url alias), doc 2 gone (exact dup), one of {0, 3} gone
    // (near-dup cluster keeps the higher-prob6 member, lowest id on ties)
    assert(!out.contains(1L) && !out.contains(2L))
    val clusterSurvivor = Seq(0L, 3L).filter(out.contains)
    assert(clusterSurvivor.size == 1, s"expected one of 0/3, got: ${out.keySet}")
    val (survProb, survCopies, survMembers) = out(clusterSurvivor.head)
    assert(survMembers == 2L) // {0, 3} clustered
    assert(survCopies == (if (clusterSurvivor.head == 0L) 2L else 1L)) // {0,2} exact group
    assert(out(4L)._3 == 1L && out(4L)._2 == 1L)
    // the trained gate orders in-domain above out-of-domain
    assert(survProb > out(4L)._1,
      s"classifier did not separate: $survProb vs ${out(4L)._1}")
  }

  private def v2Fixture = {
    val s = spark; import s.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    Seq(
      (0L, "customer story " + base, "en", "web", "https://site.example.com/page"),
      (1L, "customer duplicate crawl of the same page body", "en", "web",
        "HTTP://WWW.site.example.com/page/?utm_source=x"),
      (2L, "customer story " + base, "en", "web", "https://other.example.com/a"),
      (3L, "customer story " + base.replace("upsilon", "omega"), "en", "web",
        "https://other.example.com/b"),
      (4L, "boring unrelated filler words nothing here at all today okay fine", "en", "spam",
        "https://other.example.com/c"))
      .toDF("doc_id", "text", "lang", "source", "url")
  }

  test("runV3: the centrality gate drops low-rank docs pre-content; rank rides to the output") {
    val s = spark; import s.implicits._
    val docs = v2Fixture
    val label = col("text").contains("customer")
    // doc 4 sits below the centrality bar: it must vanish from the output
    // even though runV2 keeps it (the gate fires on the url-survivor
    // spine, before any content stage sees the row)
    val prior = Seq((0L, 5000L), (1L, 5000L), (2L, 5000L), (3L, 5000L), (4L, 100L))
      .toDF("doc_id", "rank_micro")
    val out = CurationPipeline.runV3(docs, label, prior,
        minRankMicro = 1000L, minProb = 0.0).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("rank_micro")).toMap
    assert(!out.contains(4L), s"low-rank doc survived the gate: ${out.keySet}")
    assert(out.nonEmpty && out.values.forall(_ >= 1000L))
    // the same structural survivors as runV2 minus doc 4: url alias 1 and
    // exact dup 2 still collapse, one of the near-dup pair {0, 3} survives
    assert(!out.contains(1L) && !out.contains(2L))
    assert(Seq(0L, 3L).count(out.contains) == 1)
    // an ALL-pass prior degenerates to runV2 plus the rank column: the
    // gated corpus is identical, so the trained gate and every downstream
    // stage reproduce v2 row-for-row
    val allPass = Seq((0L, 5000L), (1L, 5000L), (2L, 5000L), (3L, 5000L), (4L, 5000L))
      .toDF("doc_id", "rank_micro")
    val v3 = CurationPipeline.runV3(docs, label, allPass,
      minRankMicro = 1000L, minProb = 0.0)
    val v2 = CurationPipeline.runV2(docs, label, minProb = 0.0)
    assert(v3.drop("rank_micro").collect().map(_.toSeq).toSet ===
      v2.collect().map(_.toSeq).toSet)
    assert(v3.columns.contains("rank_micro"))
  }

  test("runV4: the domain cap binds per REGISTRABLE domain, not hostname") {
    val s = spark; import s.implicits._
    val docs = v2Fixture
    val label = col("text").contains("customer")
    val allPass = Seq((0L, 5000L), (1L, 5000L), (2L, 5000L), (3L, 5000L), (4L, 5000L))
      .toDF("doc_id", "rank_micro")
    // every fixture url lives under SOME subdomain of example.com — the
    // eTLD+1 stratum is one domain, so cap=1 must keep exactly the
    // highest-prob6 survivor however many hostnames the crawl used
    val capped = CurationPipeline.runV4(docs, label, allPass,
      minRankMicro = 1000L, domainCapK = 1, minProb = 0.0).collect()
    assert(capped.length == 1, s"cap=1 kept ${capped.length} rows")
    val row = capped.head
    assert(row.getAs[String]("domain") == "example.com")
    assert(row.getAs[Long]("rank_in_domain") == 1L)
    // the kept doc is the top prob6 of the v3 survivor set
    val v3 = CurationPipeline.runV3(docs, label, allPass,
        minRankMicro = 1000L, minProb = 0.0).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("prob6")).toMap
    assert(row.getAs[Double]("prob6") == v3.values.max)
    // a non-binding cap degenerates to v3 plus the two stratum columns
    val roomy = CurationPipeline.runV4(docs, label, allPass,
      minRankMicro = 1000L, domainCapK = 100, minProb = 0.0)
    val v3Again = CurationPipeline.runV3(docs, label, allPass,
      minRankMicro = 1000L, minProb = 0.0)
    assert(roomy.drop("domain", "rank_in_domain").collect().map(_.toSeq).toSet ===
      v3Again.collect().map(_.toSeq).toSet)
  }

  test("single shuffle: only the fingerprint aggregation exchanges") {
    val plan = CurationPipeline.run(fixture, minQuality = 0.15)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected one fp shuffle, got $exchanges:\n$plan")
  }
}
