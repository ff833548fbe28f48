package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.{Classifier, Dedup, TextAnalysis}

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

  /** The v2 corpus pass — the full production stack the operator families
    * were built for, composed end to end:
    *
    *   1. URL dedup (`Dedup.urlDedup`) — the PRE-content stage: survivor
    *      ids come from a scan pruned to (id, url) and gate the corpus
    *      through one id-keyed semi join. On a corpus bucketed by its id
    *      (the layout `SnapshotStore` writes) that join plans exchange-
    *      free on the big side; the url aggregate itself shuffles
    *      (canonical_url, id, count) triples only — no text, no payload.
    *   2. language ID (`TextAnalysis.langId`) — a pure projection.
    *   3. TRAINED quality gate: `Classifier.trainScoreLogistic` trains a
    *      hashed-bigram logistic model ON the url-deduped corpus under
    *      `label` and gates at `minProb` — replacing v1's heuristic
    *      score with the CCNet-style learned filter. Training is the
    *      bounded driver loop (dictionary-sized state, 3 local jobs per
    *      iteration); scoring is one broadcast join + map-side fold.
    *   4. exact first-wins dedup (`Dedup.exact`) — one map-side-combined
    *      groupBy; `MinMaxByPayloadPruning` keeps text off the exchange
    *      wherever the final projection allows.
    *   5. near-dup collapse: `Dedup.minhashLsh` pairs over the exact
    *      survivors, clustered and collapsed to the HIGHEST-prob6 member
    *      (`collapseKeepBest`) — the near-dup cluster keeps its most
    *      in-domain copy, not its lowest id.
    *   6. referentially-stable split (`TextAnalysis.splitAssign`).
    *
    * Output: one row per surviving document — ids, declared + predicted
    * language, source, classifier probability, exact-duplicate group
    * size, near-dup cluster size, split. Text appears in no output
    * column, so nothing after the semi join carries it further than its
    * own per-row projections (grams, fingerprints, shingles).
    */
  def runV2(docs: DataFrame, label: Column, minProb: Double = 0.5,
            iters: Int = 8, buckets: Int = 1024, lr: Double = 1.0,
            decay: Double = 0.8, k: Int = 32, bands: Int = 8,
            threshold: Double = 0.3, shingleN: Int = 3,
            idCol: String = "doc_id", textCol: String = "text",
            urlCol: String = "url"): DataFrame =
    runImpl(docs, label, None, 0L, 0, minProb, iters, buckets, lr, decay,
      k, bands, threshold, shingleN, idCol, textCol, urlCol)

  /** The v3 corpus pass: v2 plus a LINK-GRAPH CENTRALITY PRIOR — the
    * signal the per-document stages cannot see (`Graph.pageRank`'s
    * scaladoc cites the Common-Crawl-centrality use). `rankPrior` is a
    * (id, rank_micro) frame — typically `Graph.pageRank` over the crawl's
    * URL graph — and documents below `minRankMicro` are dropped at the
    * URL-SURVIVOR SPINE, before any content stage runs: centrality is a
    * graph property known before a byte of body text is fetched, so the
    * gate belongs with URL dedup on the pre-content side, where it
    * shrinks the corpus every later stage (lang ID, classifier training,
    * both dedups) scans. The join is id-keyed and text-free by
    * construction (spine and prior are id + long columns only —
    * plan-asserted in PlanSpec), and the surviving rank rides to the
    * output as `rank_micro` via one id-keyed join on the (small) final
    * survivor set.
    */
  def runV3(docs: DataFrame, label: Column, rankPrior: DataFrame,
            minRankMicro: Long, minProb: Double = 0.5,
            iters: Int = 8, buckets: Int = 1024, lr: Double = 1.0,
            decay: Double = 0.8, k: Int = 32, bands: Int = 8,
            threshold: Double = 0.3, shingleN: Int = 3,
            idCol: String = "doc_id", textCol: String = "text",
            urlCol: String = "url"): DataFrame =
    runImpl(docs, label, Some(rankPrior), minRankMicro, 0, minProb, iters, buckets,
      lr, decay, k, bands, threshold, shingleN, idCol, textCol, urlCol)

  /** The v4 corpus pass: v3 plus the PER-REGISTERED-DOMAIN CAP — the
    * RefinedWeb frequency control the stack was missing: however good
    * one domain's pages score, it must not dominate the mix, and the
    * stratum is the REGISTRABLE domain
    * (`GraftFunctions.registrableDomain`'s eTLD+1), not the hostname —
    * one site's crawl arrives under thousands of subdomain spellings.
    * The cap runs LAST, over the near-dup survivors: within each domain,
    * rank by (prob6 desc, id) and keep the top `domainCapK` — selection
    * among documents every earlier gate already passed, the same
    * post-gate placement `run`'s dedup argues for. Domains come from a
    * second (id, url)-pruned projection of the source scan joined
    * id-keyed onto the SURVIVOR set (post-collapse, the smallest frame
    * in the pipeline), so no url or text rides the window exchange; the
    * window partitions by the high-cardinality domain stratum, where it
    * parallelizes perfectly. Output gains `domain` and
    * `rank_in_domain` (≤ `domainCapK`), so a downstream tighter cap
    * re-cuts without re-ranking.
    */
  def runV4(docs: DataFrame, label: Column, rankPrior: DataFrame,
            minRankMicro: Long, domainCapK: Int, minProb: Double = 0.5,
            iters: Int = 8, buckets: Int = 1024, lr: Double = 1.0,
            decay: Double = 0.8, k: Int = 32, bands: Int = 8,
            threshold: Double = 0.3, shingleN: Int = 3,
            idCol: String = "doc_id", textCol: String = "text",
            urlCol: String = "url"): DataFrame = {
    require(domainCapK > 0, "the per-domain cap must be positive")
    runImpl(docs, label, Some(rankPrior), minRankMicro, domainCapK, minProb,
      iters, buckets, lr, decay, k, bands, threshold, shingleN,
      idCol, textCol, urlCol)
  }

  private def runImpl(docs: DataFrame, label: Column, rankPrior: Option[DataFrame],
                      minRankMicro: Long, domainCapK: Int, minProb: Double,
                      iters: Int, buckets: Int, lr: Double,
                      decay: Double, k: Int, bands: Int,
                      threshold: Double, shingleN: Int,
                      idCol: String, textCol: String,
                      urlCol: String): DataFrame = {
    val urlDeduped = Dedup.urlDedup(docs, urlCol, idCol).select(col(idCol))
    // with a prior: the spine gains the centrality gate and a rank_micro
    // payload, and is guard-persisted — it has TWO consumers (the corpus
    // semi join and the final rank attach); without one, v2's single-
    // consumer spine stays un-materialized inside the semi join's plan
    val (urlSurvivors, attachRank) = rankPrior match {
      case Some(rp) =>
        val spine = graft.util.Caching.ensurePersisted(
          urlDeduped.join(
            rp.filter(col("rank_micro") >= lit(minRankMicro))
              .select(col(idCol), col("rank_micro")), Seq(idCol)))
        (spine.select(col(idCol)),
          (out: DataFrame) => out.join(spine, Seq(idCol)))
      case None => (urlDeduped, identity[DataFrame] _)
    }
    // guard-persisted: the gated corpus has three whole-plan consumers
    // (the lang→gate chain, the classifier's gram-layer build, and the
    // scorer's id spine) — uncached, each re-runs the url aggregate and
    // the semi join. MEMORY_AND_DISK + LRU + lineage recompute, the
    // engine-wide layer discipline.
    val corpus = graft.util.Caching.ensurePersisted(
      docs.join(urlSurvivors, Seq(idCol), "left_semi"))
    val lang = TextAnalysis.langId(corpus, textCol)
    val scored = Classifier.trainScoreLogistic(
      corpus, label, iters, buckets, lr, decay, idCol, textCol)
    val gated = lang.join(scored.select(col(idCol), col("prob6")), Seq(idCol))
      .filter(col("prob6") >= lit(minProb))
      .select(col(idCol), col(textCol), col("lang"), col("pred_lang"),
        col("source"), col("prob6"))
    // localCheckpoint — materialize AND cut the logical lineage at the
    // pipeline's seam (the dedupClusters rule applied here): `deduped` has
    // four consumers (the LSH shingle-layer build, the cluster population,
    // the keep-best score frame, the final metadata join) and its tree
    // embeds the scorer, whose feature frame itself multiplies the corpus
    // scan — without the cut the composed plan is megabytes of duplicated
    // subtree and every downstream action pays analysis + AQE
    // canonicalization over it (measured: ~6 s/pass of driver gaps at
    // sf0.1). With the cut, every consumer plans against a constant-size
    // scan of the materialized stage output. For recovery under executor
    // loss a production deployment swaps in reliable `checkpoint`.
    val deduped = Dedup.exact(gated, idCol, textCol).localCheckpoint()
    val pairs = Dedup.minhashLsh(deduped, idCol, textCol, k, bands, threshold, shingleN)
    val best = Dedup.collapseKeepBest(deduped.select(col(idCol)), pairs,
      deduped.select(col(idCol), col("prob6").as("score")), idCol, "score")
    val survivors = best.select(col(idCol), col("n_members"))
      .join(deduped.select(col(idCol), col("lang"), col("pred_lang"),
        col("source"), col("prob6"), col("n_copies")), Seq(idCol))
    val out = attachRank(TextAnalysis.splitAssign(survivors, idCol = idCol)
      .select(col(idCol), col("lang"), col("pred_lang"), col("source"),
        col("prob6"), col("n_copies"), col("n_members"), col("split")))
    if (domainCapK <= 0) out
    else {
      // domains from a second (id, url)-pruned scan projection, joined
      // onto the SURVIVOR set — url never rides further than this
      // survivor-sized join, and the window partitions by the
      // high-cardinality domain stratum
      val dom = docs.select(col(idCol),
        graft.functions.GraftFunctions.registrableDomain(col(urlCol)).as("domain"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("domain"))
        .orderBy(col("prob6").desc, col(idCol).asc)
      // registrableDomain returns NULL for a null url precisely so url-less
      // docs do NOT merge into one stratum — but Window.partitionBy groups
      // nulls together like groupBy, so without the guard every url-less
      // survivor would compete in ONE shared "null domain" and all but
      // domainCapK of them silently drop. They pass through uncapped with
      // a null rank instead (the sourceCap null-stratum contract), in one
      // pass: the rank is nulled WHEN the domain is null and the filter
      // keeps null ranks.
      out.join(dom, Seq(idCol))
        .withColumn("rank_in_domain",
          when(col("domain").isNotNull, row_number().over(w).cast("long")))
        .filter(col("rank_in_domain").isNull || col("rank_in_domain") <= domainCapK)
    }
  }
}
