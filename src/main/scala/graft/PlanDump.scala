package graft

import java.nio.file.{Files, Paths}

/** Dev tool: dump `explain formatted` for the headline queries to
  * docs/PLANS.md — the per-round evidence that plans stay the plans we
  * want (pushed filters, pruned schemas, broadcasts, no cartesians).
  * Usage: `sbt "runMain graft.PlanDump [sfDir]"`.
  */
object PlanDump {
  private val headline = Seq("q1_agg", "latest_per_key", "address_assembly",
    "pls_run", "watermark_delta", "minhash_lsh", "brute_force_topk", "sessionize",
    "asof_join", "spatial_radius", "mix_apply", "decontaminate",
    "pack_sequences", "tfidf_top_terms", "quantize_int8",
    "split_assign", "quality_buckets", "salted_join", "kmeans_assign",
    // vocab_topk is deliberately absent: vocabWithCmsGate is eager (the
    // gate needs two actions), so its "plan" is a vacuous LocalTableScan
    "budget_sample", "incremental_dedup", "unigram_logprob", "collocations",
    "funnel", "curation_pipeline", "range_join", "rollup_agg",
    "retention_cohorts",
    // incremental_dedup_bloom and incremental_lsh_bloom are deliberately
    // absent like vocab_topk: their gates are eager (the Bloom filter must
    // exist before the baseline plan is built)
    "incremental_lsh",
    // corpus_shuffle is deliberately absent: positions come through the
    // RDD bridge, so its DataFrame "plan" is a vacuous scan-of-RDD
    // dup_spans_intra is deliberately absent: its plan is dup_spans' with
    // the self-join predicate swapped — no new shape to evidence
    "dup_spans", "excise_spans", "para_dedup", "inc_para_dedup", "rp_topk",
    "span_evolve", "training_order", "novelty_rate", "vocab_drift",
    // bpe_train and bpe_encode are deliberately absent like vocab_topk:
    // training is eager (a driver loop collects the best pair per round),
    // so their "plan" is the final vacuous projection — bpe_pairs carries
    // the pair-aggregate evidence and bpe_pack the fused emission plan
    // (the pack exchange after the dictionary join)
    "bpe_pairs", "bpe_pack",
    // novelty_evolve mirrors novelty_rate's plan with the carried set in
    // place of the baseline side — vocab_evolve carries the evolve
    // family's evidence (the vocab-sized union-merge aggregate, no text)
    "vocab_evolve",
    // tokenizer_pipeline's training rounds are eager, but its FINAL plan
    // (excise -> clean-corpus counts -> pack window) is the fused
    // emission DAG worth evidencing
    "tokenizer_pipeline", "quality_drift",
    // dsir_select is deliberately absent: its plan is dsir_weights' with a
    // TakeOrderedAndProject on top — no new shape to evidence
    "dsir_weights", "strip_boilerplate", "semantic_decon",
    // quality_classifier's training rounds are eager (driver GD loop, like
    // bpe_train); the dumped plan is the final scoring pass — the
    // literal-indexed weight fold (r21: one pass, no broadcast join)
    // worth evidencing
    "quality_classifier",
    // ccnet_buckets is deliberately absent like corpus_shuffle: tier
    // positions come through the RDD zipWithIndex bridge, so its
    // DataFrame "plan" is a vacuous scan-of-RDD — bigram_logprob below
    // carries the LM family's evidence (the projection-born pair tallies,
    // the three broadcast count attaches, one map-side-combined doc sum)
    "bigram_logprob",
    // c4_clean evidences the hygiene family's zero-shuffle ideal: the
    // whole operator must stay one WholeStageCodegen projection + filter
    // over the scan — any exchange appearing here is a regression
    "c4_clean",
    // source_cap evidences the stratum-partitioned window + shared-score
    // join; mix_temperature mirrors mix_weights' aggregate shape (not
    // separately dumped, same rule as dsir_select)
    "source_cap",
    // ivfpq_topk evidences the IVFADC shape: the broadcast per-query LUT
    // frame joining the code table on the COARSE CELL key — the equi join
    // that replaces pq_topk's corpus-wide ADC crossJoin (pq_topk itself is
    // deliberately absent: its plan is this one minus the cell key, the
    // dsir_select rule). registrable_domain is deliberately absent (a
    // zero-shuffle codegen projection, the c4_clean ideal already
    // evidenced) and so is domain_cap (source_cap's stratum-window plan
    // with the stratum key swapped, the mix_temperature rule).
    "ivfpq_topk",
    // mm_near_dup evidences the perceptual-hash banding shape over the
    // decode RDD bridge: id-only band join + pair dedup + hamming verify
    // (simhash_pairs' discipline on a 64-bit perceptual fingerprint);
    // mm_semantic_dedup is deliberately absent — its plan is
    // cosine_near_dup's with the embedding scan swapped, no new shape —
    // and so is mm_near_dup_audio, which runs the SAME bandedHammingPairs
    // plan as mm_near_dup with the fingerprint scan swapped.
    // The remaining mm_* rows are single RDD-bridge scans or projections
    // (vacuous plans, the corpus_shuffle rule).
    "mm_near_dup")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local("plandump")
    val sb = new StringBuilder
    sb ++= "# Physical plans (generated by graft.PlanDump; do not edit)\n\n"
    sb ++= s"Source data: `$sfDir`. Regenerate with `sbt \"runMain graft.PlanDump\"`.\n"
    Queries.registry.filter(q => headline.contains(q._1)).foreach { case (name, q, _) =>
      val plan = q(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb ++= s"\n## $name\n\n```\n$plan```\n"
    }
    // ungraded 100 TB twins: plan evidence for variants that deliberately
    // have no oracle row (the exact version stays the graded one) — here
    // the point IS the plan: profileApprox must aggregate without the
    // per-column Expand its exact sibling pays for countDistinct
    val approxProfile = graft.operators.RelOps.profileApprox(
      graft.sources.Tables.orders(spark, sfDir),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"))
    sb ++= s"\n## table_profile_approx (ungraded twin of table_profile)\n\n```\n" +
      approxProfile.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode) + "```\n"
    Files.writeString(Paths.get("docs/PLANS.md"), sb.toString)
    println(s"[plandump] wrote docs/PLANS.md")
    spark.stop()
  }
}
