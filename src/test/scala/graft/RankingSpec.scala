package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ranking, Sketches}

/** Ranking.bm25 / mixWeights and the Sketches gates. */
class RankingSpec extends SparkSpec {

  test("bm25 reproduces a hand-rolled reference scorer") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (0L, "spark query spark table"),
      (1L, "query window row"),
      (2L, "table value row batch"),
      (3L, "spark spark spark spark")).toDF("doc_id", "text")
    val terms = Seq("spark", "query")
    val got = Ranking.bm25(docs, terms, topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // reference implementation (same formula, plain Scala)
    val toks = Map(0L -> Seq("spark", "query", "spark", "table"),
      1L -> Seq("query", "window", "row"), 2L -> Seq("table", "value", "row", "batch"),
      3L -> Seq("spark", "spark", "spark", "spark"))
    val n = toks.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    def score(id: Long): Double = {
      val dl = toks(id).size.toDouble
      terms.map { t =>
        val tf = toks(id).count(_ == t).toDouble
        val df = toks.values.count(_.contains(t)).toDouble
        val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
      }.sum
    }
    val expected = toks.keys.map(id => id -> BigDecimal(score(id))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      .filter(_._2 > 0).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (id, sc) => assert(math.abs(sc - expected(id)) < 1e-9, s"doc $id") }
  }

  test("bm25 returns at most topK rows, ranked desc with id tie-break") {
    val s = spark; import s.implicits._
    val docs = (0 until 50).map(i => (i.toLong, if (i % 2 == 0) "alpha beta" else "gamma"))
      .toDF("doc_id", "text")
    val rows = Ranking.bm25(docs, Seq("alpha"), topK = 5).collect()
    assert(rows.length === 5)
    // all even ids score identically → ties resolve by ascending id
    assert(rows.map(_.getLong(0)).toSeq === Seq(0L, 2L, 4L, 6L, 8L))
  }

  test("mixWeights: shares sum to ~1, uniform target capped by maxUpsample") {
    val s = spark; import s.implicits._
    val docs = Seq.fill(90)(("big", "en", "a b c d e f g h i j")) ++
      Seq.fill(2)(("tiny", "en", "a b"))
    val out = Ranking.mixWeights(docs.toDF("source", "lang", "text"),
      Seq("source", "lang"), maxUpsample = 5.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val (_, bigTok, bigSharePpm, bigWPpm, _) = out("big")
    val (_, tinyTok, _, tinyWPpm, tinySampled) = out("tiny")
    assert(bigTok === 900L && tinyTok === 4L)
    assert(bigSharePpm === math.round(900.0 / 904.0 * 1e6))
    // target = 452 tokens/stratum → big downsampled, tiny capped at ×5
    assert(bigWPpm < 1000000L)
    assert(tinyWPpm === 5000000L)
    assert(tinySampled === 20L)
  }

  test("applyMixWeights: expected multiplicity per stratum, deterministic, copy-indexed") {
    val s = spark; import s.implicits._
    // big stratum (downsampled, w<1) and tiny stratum (upsampled, capped ×5)
    val docs = ((0 until 400).map(i => (i.toLong, "big", "en", "a b c d e f g h i j")) ++
      (400 until 410).map(i => (i.toLong, "tiny", "en", "a b"))).toDF("doc_id", "source", "lang", "text")
    val w = Ranking.mixWeights(docs, Seq("source", "lang"))
    val out = Ranking.applyMixWeights(docs, w, Seq("source", "lang"))
      .select("doc_id", "source", "copy").collect()
    val wMap = w.collect() // weight_ppm col, back to fractional for the asserts
      .map(r => r.getString(0) -> r.getLong(5).toDouble / 1e6).toMap
    val byDoc = out.groupBy(_.getLong(0))
    // every replica count is floor(w) or floor(w)+1 for its stratum
    byDoc.foreach { case (id, rs) =>
      val wt = wMap(rs.head.getString(1))
      assert(rs.length == math.floor(wt).toLong || rs.length == math.floor(wt).toLong + 1, s"doc $id")
      assert(rs.map(_.getLong(2)).sorted.toSeq == (0L until rs.length).toSeq, s"doc $id copies")
    }
    // aggregate multiplicity tracks the weight (hash gate is unbiased-ish)
    val bigN = out.count(_.getString(1) == "big").toDouble / 400
    assert(math.abs(bigN - wMap("big")) < 0.1, s"big multiplicity $bigN vs ${wMap("big")}")
    val tinyN = out.count(_.getString(1) == "tiny").toDouble / 10
    assert(math.abs(tinyN - wMap("tiny")) < 1.0, s"tiny multiplicity $tinyN vs ${wMap("tiny")}")
    // deterministic: a second run is identical
    val out2 = Ranking.applyMixWeights(docs, w, Seq("source", "lang"))
      .select("doc_id", "source", "copy").collect()
    assert(out.map(_.toSeq).toSet === out2.map(_.toSeq).toSet)
  }

  test("applyMixWeights: null-strata documents keep their weight row (null-safe join)") {
    val s = spark; import s.implicits._
    val docs = ((0 until 50).map(i => (i.toLong, Option("web"), "a b c d")) ++
      (50 until 60).map(i => (i.toLong, None: Option[String], "a b")))
      .toDF("doc_id", "source", "text")
    val w = Ranking.mixWeights(docs, Seq("source"))
    val out = Ranking.applyMixWeights(docs, w, Seq("source"))
    // null stratum: 20 of 220 tokens, target 110/stratum → w = cap(5.5) = 5
    // exactly — so every null-source doc appears exactly 5 times
    assert(out.filter(col("source").isNull).count() === 50L)
    assert(out.filter(col("source") === "web").count() > 0L)
  }

  test("applyMixWeights: null strata in BOTH columns — multiplicity, dense copies, stable gate") {
    val s = spark; import s.implicits._
    // four strata incl. every null combination; the null-safe join
    // (Ranking.scala:147) and the gate key's coalesce(…, "") (:142-143)
    // are what keep these rows alive and deterministic
    val docs = ((0 until 50).map(i => (i.toLong, Option("web"), Option("en"), "a b c d")) ++
      (50 until 60).map(i => (i.toLong, None: Option[String], Option("en"), "a b")) ++
      (60 until 70).map(i => (i.toLong, Option("web"), None: Option[String], "a b")) ++
      (70 until 80).map(i => (i.toLong, None: Option[String], None: Option[String], "a b")))
      .toDF("doc_id", "source", "lang", "text")
    val w = Ranking.mixWeights(docs, Seq("source", "lang"))
    val out = Ranking.applyMixWeights(docs, w, Seq("source", "lang"))
      .select("doc_id", "source", "lang", "copy").collect()
    // 260 tokens / 4 strata → target 65: each 20-token null-ish stratum has
    // w = 3.25, so every one of its docs appears 3 or 4 times with a dense
    // 0-based copy index; the big stratum (w = 0.325) keeps ≤1 copy per doc
    val byDoc = out.groupBy(_.getLong(0))
    (50L until 80L).foreach { id =>
      val rs = byDoc.getOrElse(id, Array.empty)
      assert(rs.length == 3 || rs.length == 4, s"doc $id multiplicity ${rs.length}")
      assert(rs.map(_.getLong(3)).sorted.toSeq == (0L until rs.length).toSeq, s"doc $id copies")
    }
    (0L until 50L).foreach { id =>
      assert(byDoc.getOrElse(id, Array.empty).length <= 1, s"doc $id over-replicated")
    }
    // no stratum silently dropped by the join
    assert(out.count(r => r.isNullAt(1) && !r.isNullAt(2)) > 0)
    assert(out.count(r => !r.isNullAt(1) && r.isNullAt(2)) > 0)
    assert(out.count(r => r.isNullAt(1) && r.isNullAt(2)) > 0)
    // gate stability: identical under re-run AND under a repartitioned input
    val out2 = Ranking.applyMixWeights(docs.repartition(7), w, Seq("source", "lang"))
      .select("doc_id", "source", "lang", "copy").collect()
    assert(out.map(_.toSeq).toSet === out2.map(_.toSeq).toSet)
  }

  test("vocabWithCmsGate: exact head counts, count-desc/token-asc rank, gate holds") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (0L, "red red red blue blue green"),
      (1L, "blue red amber"),
      (2L, "green blue red")).toDF("doc_id", "text")
    // counts: red=5, blue=4, green=2, amber=1 → tie-free head; then ties
    // (green=2 vs a second token at 2) break by token asc
    val out = Sketches.vocabWithCmsGate(docs, topK = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq === Seq((1L, "red", 5L, true), (2L, "blue", 4L, true), (3L, "green", 2L, true)))
    // tie at the cut: topK=4 must include amber deterministically
    val out4 = Sketches.vocabWithCmsGate(docs, topK = 4).collect().map(_.getString(1))
    assert(out4.toSeq === Seq("red", "blue", "green", "amber"))
  }

  // -- DSIR importance weights / selection --------------------------------

  /** Feature stream via the SAME hashed-gram layer the operator consumes
    * (pinned independently by the dedup suites); the distributional math
    * on top — smoothing, per-bucket micro-quantization, exact long fold —
    * is mirrored driver-side in plain Scala below.
    */
  private def dsirFeatPairs(df: org.apache.spark.sql.DataFrame, buckets: Int): Seq[(Long, Long)] = {
    import graft.operators.Dedup
    val base = Dedup.fullHashBase(df, "doc_id", "text")
    def g(n: Int) = base.select(col("doc_id"),
      explode(Dedup.rolledGramHashes(col("__fh"), n, reduceInputs = true)).as("__g"))
    g(1).unionByName(g(2))
      .select(col("doc_id"), pmod(col("__g"), lit(buckets.toLong)).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  private def dsirCorpus(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    // target-flavored docs (share "spark shuffle stage" vocabulary), noise
    // docs, one doc straddling both, and an empty doc (no features at all)
    ((0L to 3L).map(i => (i, s"spark shuffle stage executor task $i")) ++
      (4L to 9L).map(i => (i, s"lorem ipsum dolor sit amet $i consectetur")) ++
      Seq((10L, "spark shuffle lorem ipsum"), (11L, ""))).toDF("doc_id", "text")
  }

  test("dsirWeights matches a driver-side mirror of the smoothed log-ratio fold") {
    val s = spark
    val B = 64
    val corpus = dsirCorpus(s)
    val target = corpus.filter(col("doc_id") <= 3L)
    val corpusF = dsirFeatPairs(corpus, B)
    val targetF = dsirFeatPairs(target, B)
    val tc = targetF.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val sc = corpusF.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val tt = tc.values.sum; val ts = sc.values.sum
    def lrOf(b: Long): Long = BigDecimal(
      (math.log((tc.getOrElse(b, 0L) + 1).toDouble / (tt + B)) -
        math.log((sc(b) + 1).toDouble / (ts + B))) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val byDoc = corpusF.groupBy(_._1)
    val expected = corpus.select("doc_id").collect().map(_.getLong(0)).map { id =>
      val fs = byDoc.getOrElse(id, Seq.empty)
      id -> ((fs.size.toLong, fs.map(p => lrOf(p._2)).sum))
    }.toMap
    val got = Ranking.dsirWeights(corpus, target, buckets = B)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
    // the empty doc survives the left join with zero features and weight
    assert(got(11L) === ((0L, 0L)))
    // directionality: every pure-target doc outranks every pure-noise doc
    val worstTarget = (0L to 3L).map(got(_)._2).min
    val bestNoise = (4L to 9L).map(got(_)._2).max
    assert(worstTarget > bestNoise, s"target floor $worstTarget vs noise ceiling $bestNoise")
    // exact long arithmetic → identical under repartition
    val got2 = Ranking.dsirWeights(corpus.repartition(7), target, buckets = B)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got2 === expected)
  }

  test("dsirSelect is the deterministic Gumbel top-k over dsirWeights") {
    val s = spark
    val B = 64
    val corpus = dsirCorpus(s)
    val target = corpus.filter(col("doc_id") <= 3L)
    // expected: recompute keys from the weights via the same seeded-hash
    // noise, rank driver-side with the id tie-break
    import graft.functions.GraftFunctions.hash60
    val keyed = Ranking.dsirWeights(corpus, target, buckets = B)
      .withColumn("u", (pmod(hash60(concat(lit("dsir:7:"), col("doc_id").cast("string"))),
        lit(1000000L)).cast("double") + lit(0.5d)) / lit(1000000d))
      .withColumn("k", round(col("dsir_micro").cast("double") / 1000000d + -log(-log(col("u"))), 6))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getAs[Double]("k")))
    val expTop = keyed.sortBy(t => (-t._3, t._1)).take(5)
      .map(t => (t._1, t._2, t._3)).toSeq
    val got = Ranking.dsirSelect(corpus, target, k = 5, seed = "7", buckets = B)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expTop)
    // deterministic: same seed → same selection; different seed → (here) different
    val again = Ranking.dsirSelect(corpus, target, k = 5, seed = "7", buckets = B)
      .collect().map(_.getLong(0)).toSeq
    assert(again === got.map(_._1))
    val other = Ranking.dsirSelect(corpus, target, k = 5, seed = "8", buckets = B)
      .collect().map(_.getLong(0)).toSeq
    assert(other !== got.map(_._1), "seed change should perturb the Gumbel draw")
  }

  test("sketch gates hold on fixture data and exact stats are right") {
    val s = spark; import s.implicits._
    val df = (1 to 1000).map(i => (i % 3, i.toDouble, (i % 101).toLong))
      .toDF("g", "v", "k")
    val hll = Sketches.distinctWithHllGate(df, Seq("g"), "k").collect()
    assert(hll.forall(_.getBoolean(2)), "HLL gate failed")
    assert(hll.map(_.getLong(1)).forall(n => n > 30 && n <= 101))
    val q = Sketches.percentilesWithGate(df, Seq("g"), "v").collect()
    assert(q.forall(_.getBoolean(3)), "quantile sketch gate failed")
    // group g=0: 333 values 3,6,...,999 → median = the 167th = 501
    val g0 = q.find(_.getInt(0) == 0).get
    assert(g0.getDouble(1) === 501.0)
  }
}
