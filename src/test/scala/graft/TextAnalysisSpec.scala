package graft

import org.apache.spark.sql.functions.col
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {

  private def one(text: String) = {
    val s = spark; import s.implicits._
    Seq((1L, text)).toDF("doc_id", "text")
  }

  test("langId: marker-word argmax with declaration-order tie-break, en default") {
    def lang(t: String) =
      TextAnalysis.langId(one(t)).head().getAs[String]("pred_lang")
    assert(lang("we saw the dog and the cat near a tree") == "en")
    assert(lang("je vois le chien et la porte du jardin") == "fr")
    assert(lang("ich sah der hund und die katze dort") == "de")
    assert(lang("xyzzy plugh") == "en") // no markers anywhere -> default
  }

  test("quality signals on a curated string") {
    val r = TextAnalysis.qualityScore(one("the the cat!! sat.")).head()
    assert(r.getAs[Long]("n_tokens") == 4)
    assert(r.getAs[Long]("n_distinct_tokens") == 3)   // the, cat!!, sat.
    assert(r.getAs[Long]("n_stopwords") == 2)         // the x2
    assert(r.getAs[Double]("stopword_ratio") == 0.5)
    assert(r.getAs[Double]("punct_ratio") == math.rint(3.0 / 18 * 10000) / 10000)
  }

  test("token counts: words vs BPE-ish subwords") {
    val r = TextAnalysis.tokenCounts(one("internationalization is fun!")).head()
    assert(r.getAs[Long]("n_words") == 3)
    // internationalization(20) -> 5 chunks, is -> 1, fun -> 1, ! -> 1
    assert(r.getAs[Long]("n_subwords") == 8)
  }

  test("docFrequency counts documents-per-token over distinct per-doc tokens") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "a b a"), (2L, "a"), (3L, "c a")).toDF("doc_id", "text")
    val out = TextAnalysis.docFrequency(df).orderBy("token")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq(("a", 3L, 1.0), ("b", 1L, 0.333333), ("c", 1L, 0.333333)))
  }

  test("sourceQualityFilter drops every document of a low-mean source") {
    val s = spark; import s.implicits._
    val good = (1 to 5).map(i => (i.toLong, s"alpha beta gamma delta epsilon zeta$i", "good"))
    val junk = (6 to 10).map(i => (i.toLong, "!!! ??? !!! ??? !!!", "junk"))
    val df = (good ++ junk).toDF("doc_id", "text", "source")
    val kept = TextAnalysis.sourceQualityFilter(df, minMean = 0.05)
      .select("source").distinct().collect().map(_.getString(0)).toSeq
    assert(kept == Seq("good"))
  }

  test("stratifiedSample: deterministic, rate-monotone, exact at the extremes") {
    val s = spark; import s.implicits._
    val df = (1L to 400L).map(i => (i, if (i % 2 == 0) "en" else "fr")).toDF("doc_id", "lang")
    def ids(rates: Map[String, Double], default: Double) =
      TextAnalysis.stratifiedSample(df, rates, default)
        .collect().map(_.getLong(0)).toSet
    assert(ids(Map("en" -> 1.0), 1.0).size == 400)
    assert(ids(Map("en" -> 0.0), 1.0).forall(_ % 2 == 1)) // en stratum emptied
    val quarter = ids(Map("en" -> 0.25), 0.25)
    val threeQ = ids(Map("en" -> 0.75), 0.75)
    assert(quarter.subsetOf(threeQ)) // raising the rate only adds rows
    assert(quarter == ids(Map("en" -> 0.25), 0.25)) // reproducible, no seed state
  }

  test("stratifiedSample: NULL stratum hashes as empty stratum at the default rate") {
    val s = spark; import s.implicits._
    val df = Seq((1L, Some("en")), (2L, Option.empty[String])).toDF("doc_id", "lang")
    val all = TextAnalysis.stratifiedSample(df, Map("en" -> 1.0), defaultRate = 1.0)
      .collect().map(_.getLong(0)).toSet
    assert(all == Set(1L, 2L)) // null-stratum row is sampled, not nulled away
    val none = TextAnalysis.stratifiedSample(df, Map("en" -> 1.0), defaultRate = 0.0)
      .collect().map(_.getLong(0)).toSet
    assert(none == Set(1L)) // and it follows defaultRate, not a named stratum
  }

  test("redactPii scrubs emails, IPv4s, and AU phone numbers with typed placeholders") {
    val s = spark; import s.implicits._
    val out = Seq(
      "mail me at jo.smith+x@dept.example.org thanks",
      "server 192.168.0.1 and mobile 0412 345 678",
      "no pii here, just 12 plain words and 3.14").toDF("t")
      .select(TextAnalysis.redactPii(col("t")).as("clean"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq(
      "mail me at <EMAIL> thanks",
      "server <IP> and mobile <PHONE>",
      "no pii here, just 12 plain words and 3.14"))
  }

  test("chunkTokens: overlapping fixed windows, short tail, empty doc keeps one empty chunk") {
    val s = spark; import s.implicits._
    val df = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")), (2L, " ")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(df, window = 4, overlap = 1)
      .orderBy("doc_id", "chunk_no")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(out == Seq(
      (1L, 0L, 4L, "w1 w2 w3 w4"),
      (1L, 1L, 4L, "w4 w5 w6 w7"),
      (1L, 2L, 4L, "w7 w8 w9 w10"),
      (1L, 3L, 1L, "w10"),
      (2L, 0L, 0L, "")))
  }

  test("fingerprints: whitespace-insensitive md5, order-sensitive rolling hash") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "a b  c"), (2L, "A B C"), (3L, "c b a"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.fingerprints(df).orderBy("doc_id").collect()
    assert(out(0).getString(2) == out(1).getString(2)) // fp_md5 normalize-equal
    assert(out(0).getLong(3) == out(1).getLong(3))     // fp_roll too
    assert(out(0).getLong(3) != out(2).getLong(3))     // order matters
  }

  test("sampleNPerStratum: exactly n per stratum, deterministic, referentially stable") {
    val s = spark; import s.implicits._
    val df = ((1L to 50L).map(i => (i, "en")) ++ (51L to 53L).map(i => (i, "fr")))
      .toDF("doc_id", "lang")
    val out = TextAnalysis.sampleNPerStratum(df, n = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.count(_._2 == "en") === 10)
    assert(out.count(_._2 == "fr") === 3)   // stratum smaller than n → all kept
    assert(out.filter(_._2 == "fr").map(_._3).sorted.toSeq === Seq(1L, 2L, 3L))
    // deterministic: identical second run
    val out2 = TextAnalysis.sampleNPerStratum(df, n = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSet === out2.toSet)
    // referential stability: n=5 sample is a prefix of the n=10 sample
    val small = TextAnalysis.sampleNPerStratum(df, n = 5)
      .collect().map(r => r.getLong(0)).toSet
    assert(small.subsetOf(out.map(_._1).toSet))
  }

  test("collocations: the planted phrase tops PMI; singletons below minCount vanish") {
    val s = spark; import s.implicits._
    // "hong kong" always co-occurs (6×); "the" pairs promiscuously
    val df = (1L to 6L).map { i =>
      (i, s"the visit to hong kong was the trip number $i of the year")
    }.toDF("doc_id", "text")
    val out = TextAnalysis.collocations(df, minCount = 3, k = 10)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2), r.getDouble(3)))
    val top = out.head
    assert(top._1 === ("hong", "kong") && top._2 === 6L)
    // every returned PMI is finite and the list is rank-ordered
    assert(out.map(_._3).toSeq === out.map(_._3).sortBy(-_).toSeq)
    // pairs occurring under minCount never appear ("number 1" is unique per doc)
    assert(!out.exists(p => p._1._1 == "number"))
  }

  test("unigramLogProb: common-word docs outscore rare-word docs; empty doc survives") {
    val s = spark; import s.implicits._
    // corpus: "a" appears 6 times, each rare word once (T = 9)
    val df = Seq(
      (1L, "a a a"), (2L, "a a a"),          // all common tokens
      (3L, "x y z"),                          // all rare tokens
      (4L, "")                                // zero tokens
    ).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(df)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toList
    val byId = out.map(r => r._1 -> r).toMap
    assert(out.size === 4)
    assert(byId(4L)._2 === 0L && byId(4L)._3.isEmpty)      // empty doc kept, null score
    assert(byId(1L)._3 === byId(2L)._3)                     // identical docs score alike
    assert(byId(1L)._3.get > byId(3L)._3.get)               // common >> rare
    // exact value: ln(6/9) for every token of doc 1, micro-quantized
    val lp = math.round(math.log(6.0 / 9.0) * 1000000).toDouble
    val expected = BigDecimal(3 * lp / 3 / 1000000.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byId(1L)._3.get === expected)
  }

  test("bigramLogProb: context beats unigram frequency; empty and 1-token docs survive") {
    val s = spark; import s.implicits._
    // docs 1 and 2 are the SAME bag of tokens in opposite orders: the
    // reversed doc starts from the rarer initial state and shifts
    // transition mass to the weaker "b a" bigram, so it must score
    // strictly below — exactly what a unigram model cannot distinguish
    val df = Seq(
      (1L, "a b a b a b"),
      (2L, "b a b a b a"),
      (3L, "a b a b a b"),
      (4L, "a"),
      (5L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(df)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toList
    val byId = out.map(r => r._1 -> r).toMap
    assert(out.size === 5)
    assert(byId(5L)._2 === 0L && byId(5L)._3.isEmpty)  // empty doc kept, null score
    assert(byId(1L)._3 === byId(3L)._3)                // identical docs score alike
    // same unigram bag, different order → bigram model separates them
    assert(byId(1L)._3.get > byId(2L)._3.get)
    // 1-token doc scores exactly the add-one unigram of its only token:
    // c(a) = 10, T = 19, V = 2 → ln(11/22), micro-quantized then /1
    val lp = math.round(math.log(11.0 / 22.0) * 1000000).toDouble
    val want = BigDecimal(lp / 1 / 1000000.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byId(4L)._3.get === want)
  }

  test("perplexityBuckets: reference-trained tiers rank by score desc, nulls in the tail") {
    val s = spark; import s.implicits._
    // reference = the three 'en' docs; 'xx' docs score against it.
    // 6 docs → tiers of exactly 2; the empty doc must land in 'tail'.
    val df = Seq(
      (1L, "en", "a b a b a b"),
      (2L, "en", "a b a b"),
      (3L, "en", "c c c c"),
      (4L, "xx", "a b a b a b"),   // in-reference order → head
      (5L, "xx", "z z z z z z"),   // out-of-vocabulary → low score
      (6L, "xx", "")               // zero tokens → null score, ranks last
    ).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.perplexityBuckets(df,
        train = Some(df.filter($"lang" === "en")))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getLong(3), r.getString(4)))
    assert(out.length === 6)
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(6L)._5 === "tail" && byId(6L)._3.isEmpty)  // null score → tail
    assert(byId(4L)._5 === "head")                          // fluent doc leads
    assert(byId(5L)._4 >= byId(4L)._4)                      // OOV never outranks fluent
    // tiers partition the corpus 2/2/2 and ordering respects the score
    assert(out.groupBy(_._5).view.mapValues(_.size).toMap ===
      Map("head" -> 2, "middle" -> 2, "tail" -> 2))
    val ranked = out.sortBy(r => (r._4, r._1))
    val scores = ranked.flatMap(_._3)
    assert(scores === scores.sortBy(-(_: Double)))
  }

  test("c4LineClean: terminal-punct/min-words/blocklist line rules, page gates drop whole docs") {
    val s = spark; import s.implicits._
    val df = Seq(
      // 5 lines: keep "good line one." and the quote-terminated line;
      // drop the 1-worder, the unterminated line, and the javascript line
      (1L, "good line one.\nshort.\nno terminal punct\nthis uses JavaScript badly.\nhe said \"stop right there\""),
      (2L, "lorem ipsum dolor sit.\nanother fine line here.\nand one more line."),  // page gate: lorem ipsum
      (3L, "braces are code { so }.\nanother fine line here.\nand one more line."), // page gate: brace
      (4L, "only one good line here.\nnope\nnah"),                                  // < 2 kept lines
      (5L, "first decent line stays!\nsecond decent line stays?\ntail")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.c4LineClean(df)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(1L, 5L))
    val d1 = out.find(_._1 == 1L).get
    assert(d1._2 === "good line one.\nhe said \"stop right there\"")
    assert(d1._3 === 5L && d1._4 === 2L)
    val d5 = out.find(_._1 == 5L).get
    assert(d5._2 === "first decent line stays!\nsecond decent line stays?")
    assert(d5._3 === 3L && d5._4 === 2L)
  }

  test("contaminationReport: exposure per benchmark item — hit grams, fraction, distinct sources") {
    val s = spark; import s.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),   // contains bench 10's full text
      (2L, "the quick brown cat sleeps"),  // shares only "the quick brown"
      (3L, "totally unrelated words here")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (10L, "the quick brown fox"),        // 2 grams, both in corpus
      (11L, "never seen anywhere at all"), // 3 grams, none in corpus
      (12L, "xy")                          // < n tokens → zero grams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.contaminationReport(corpus, bench, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).sortBy(_._1).toList
    // bench 10: grams {the quick brown, quick brown fox} — first hits docs
    // 1 AND 2, second hits doc 1 only → 2/2 grams, 2 distinct corpus docs
    assert(out === List(
      (10L, 2L, 2L, 2L, 1.0),
      (11L, 3L, 0L, 0L, 0.0),
      (12L, 0L, 0L, 0L, 0.0)))
  }

  test("sourceCap: keeps each stratum's top-k by (quality desc, id), ranks dense from 1") {
    val s = spark; import s.implicits._
    // src A: 3 docs of visibly different quality; src B: 1 doc — a cap of
    // 2 keeps A's best two and all of B
    val df = Seq(
      (1L, "A", "the quick brown fox jumps over the lazy dog and runs far away today"),
      (2L, "A", "aaa aaa aaa aaa aaa aaa aaa aaa"),
      (3L, "A", "a solid readable sentence with varied common words in it."),
      (4L, "B", "another perfectly normal document with some words here.")
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.sourceCap(df, k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(out.length === 3)
    val bySrc = out.groupBy(_._2)
    assert(bySrc("A").map(_._1).toSet.size === 2 && bySrc("B").map(_._1).toSeq === Seq(4L))
    // within A, rank 1 outscores rank 2; the dropped doc scores ≤ both
    val a = bySrc("A").sortBy(_._4)
    assert(a.map(_._4).toSeq === Seq(1L, 2L))
    assert(a(0)._3 >= a(1)._3)
    val aScores = TextAnalysis.qualityScore(df.filter($"source" === "A"))
      .collect().map(r => r.getLong(0) -> r.getDouble(8)).toMap
    val dropped = (Set(1L, 2L, 3L) -- a.map(_._1).toSet).head
    assert(a.forall(kept => aScores(kept._1) >= aScores(dropped) ||
      (aScores(kept._1) == aScores(dropped) && kept._1 < dropped)))
  }

  test("sampleToTokenBudget: greedy hash-order prefix fills the budget, crossing doc kept") {
    val s = spark; import s.implicits._
    // every doc is exactly 10 tokens; budget 35 → keep while tokens_before < 35:
    // prefixes 0,10,20,30 pass, 40 fails → exactly 4 docs per stratum
    val df = ((1L to 20L).map(i => (i, "en")) ++ (21L to 22L).map(i => (i, "fr")))
      .map { case (i, l) => (i, l, (1 to 10).map(j => s"t$j").mkString(" ")) }
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.sampleToTokenBudget(df, budgetPerStratum = 35)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.count(_._2 == "en") === 4)
    assert(out.count(_._2 == "fr") === 2)   // small stratum: all kept, budget unmet
    assert(out.filter(_._2 == "en").map(_._4).sorted.toSeq === Seq(0L, 10L, 20L, 30L))
    // referential stability: a smaller budget selects a prefix of the larger one
    val small = TextAnalysis.sampleToTokenBudget(df, budgetPerStratum = 15)
      .collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(out.map(_._1).toSet))
    assert(small.size === 4)                // 2 en (0,10 < 15) + 2 fr
  }

  test("splitAssign: total, deterministic, referentially stable, fractions roughly honored") {
    val s = spark; import s.implicits._
    val df = (1L to 1000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val out = TextAnalysis.splitAssign(df,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    assert(out.size === 1000)                       // every row assigned, none dropped
    assert(out.values.toSet === Set("train", "val", "test"))
    val train = out.values.count(_ == "train")
    assert(train > 700 && train < 900)              // hash-uniform ≈ 800
    // referential stability: a 100-doc subset gets identical assignments
    val sub = TextAnalysis.splitAssign(df.filter(col("doc_id") <= 100),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    assert(sub === out.filter(_._1 <= 100L))
    // repartitioning cannot move a document between splits
    val re = TextAnalysis.splitAssign(df.repartition(7),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    assert(re === out)
  }

  test("qualityBuckets: rank-defined quartiles — monotone in score, ties share a bucket") {
    val s = spark; import s.implicits._
    // 8 docs with clearly distinct quality: longer, more diverse text scores higher
    val df = (1L to 8L).map { i =>
      (i, (1L to i * 6).map(j => s"w${i}_$j").mkString(" "))
    }.toDF("doc_id", "text")
    val out = TextAnalysis.qualityBuckets(df, nBuckets = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(out.length === 8)
    assert(out.forall(r => r._3 >= 0 && r._3 < 4))
    // bucket is monotone in score, and exactly 2 docs land in each quartile
    val byScore = out.sortBy(r => (r._2, r._1))
    assert(byScore.map(_._3).toSeq === Seq(0L, 0L, 1L, 1L, 2L, 2L, 3L, 3L))
    // ties: duplicate documents (identical scores) must share a bucket
    val dup = Seq((1L, "same text here"), (2L, "same text here"),
      (3L, "a much longer and more varied document body entirely"))
      .toDF("doc_id", "text")
    val db = TextAnalysis.qualityBuckets(dup, nBuckets = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(db(1L) === db(2L))
    assert(db(3L) > db(1L))
  }

  test("tfidfTopTerms: tf x ln(N/df) ranking with term tie-break, k caps rows") {
    val s = spark; import s.implicits._
    // N=3; "rare" in 1 doc, "pair" in 2, "common" in all 3
    val df = Seq(
      (1L, "common rare rare"),
      (2L, "common pair"),
      (3L, "common pair pair pair")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(df, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getString(2), r.getLong(3), r.getDouble(4)))).toMap
    def sc(tf: Long, dfc: Long) = BigDecimal(tf * math.log(3.0 / dfc))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out((1L, 1L)) === (("rare", 2L, sc(2, 1))))
    assert(out((1L, 2L)) === (("common", 1L, 0.0)))    // ln(3/3) = 0
    assert(out((2L, 1L)) === (("pair", 1L, sc(1, 2))))
    assert(out((3L, 1L)) === (("pair", 3L, sc(3, 2))))
    assert(out.size === 6)                             // k=2 per doc
  }

  test("decontaminate: n-gram collision with the benchmark flags docs; clean and short docs pass") {
    val s = spark; import s.implicits._
    val train = Seq(
      (0L, "the quick brown fox jumps"),   // contains benchmark 3-gram
      (1L, "totally unrelated training text here"),
      (2L, "quick brown"),                  // shorter than n=3 → no grams
      (3L, "brown fox jumps over it")).toDF("doc_id", "text")
    val bench = Seq((100L, "a quick brown fox appeared")).toDF("doc_id", "text")
    val out = TextAnalysis.decontaminate(train, bench)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out.keySet === Set(0L, 1L, 2L, 3L))     // every input doc survives
    assert(out(0L)._3 && out(0L)._2 === 1L)        // "quick brown fox" collides
    assert(out(1L) === ((3L, 0L, false)))
    assert(out(2L) === ((0L, 0L, false)))          // no grams → clean
    assert(out(3L)._3 === false)                   // "brown fox jumps" not in bench
  }

  test("packSequences: per-stream running offsets, integral seq ids, straddling allowed") {
    val s = spark; import s.implicits._
    // stream A: 3+4+5 tokens at budget 6 → cum-before 0, 3, 7
    val df = Seq(
      (1L, "A", "a b c"), (2L, "A", "a b c d"), (3L, "A", "a b c d e"),
      (10L, "B", "x y")).toDF("doc_id", "source", "text")
    val out = TextAnalysis.packSequences(df, budget = 6)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) === ((3L, 0L, 0L)))  // starts seq 0 offset 0
    assert(out(2L) === ((4L, 0L, 3L)))  // same seq, offset 3 — straddles into seq 1
    assert(out(3L) === ((5L, 1L, 1L)))  // cum-before 7 → seq 1, offset 1
    assert(out(10L) === ((2L, 0L, 0L))) // stream B packs independently
  }

  test("gramRepetition: duplicate n-gram fractions, short docs score zero") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (0L, "a b a b a b"),   // 2-grams: ab ba ab ba ab → 5 total, 2 distinct
      (1L, "x y z"),          // all grams unique
      (2L, "w"),              // shorter than any n → zero
      (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.gramRepetition(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out(0L) === ((5L, 0.6, 4L, 0.5)))  // 3-grams: aba bab aba bab → 4 total, 2 distinct
    assert(out(1L) === ((2L, 0.0, 1L, 0.0)))
    assert(out(2L) === ((0L, 0.0, 0L, 0.0)))
    assert(out(3L) === ((0L, 0.0, 0L, 0.0)))
  }

  test("collocations and vocabWithCmsGate keep working on an id-less corpus (fallback path)") {
    // both operators read the shared token layer only when the id column
    // exists; a (text)-only frame — their pre-layer contract — must fall
    // back to the direct tokenize and produce identical results
    val s = spark; import s.implicits._
    val withId = (1L to 6L).map(i => (i, "hong kong hong kong visit")).toDF("doc_id", "text")
    val noId = withId.select("text")
    val a = TextAnalysis.collocations(withId, minCount = 2, k = 5).collect().map(_.toSeq).toSeq
    val b = TextAnalysis.collocations(noId, minCount = 2, k = 5).collect().map(_.toSeq).toSeq
    assert(a === b)
    val va = operators.Sketches.vocabWithCmsGate(withId, topK = 3).collect().map(_.toSeq).toSeq
    val vb = operators.Sketches.vocabWithCmsGate(noId, topK = 3).collect().map(_.toSeq).toSeq
    assert(va === vb)
  }

  test("shuffleOrder: positions are the dense rank of (hash60(seed,id), id), a permutation") {
    val s = spark; import s.implicits._
    val docs = (1L to 97L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
      .repartition(7) // positions must not depend on input partitioning
    val out = TextAnalysis.shuffleOrder(docs, seed = "t").collect()
    assert(out.map(_.getAs[Long]("position")).sorted.toSeq == (0L until 97L))
    // order matches the portable-hash total order
    val expected = docs
      .withColumn("k", graft.functions.GraftFunctions.hash60Portable(
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("shuffle:t:"), col("doc_id").cast("string"))))
      .collect().sortBy(r => (r.getAs[Long]("k"), r.getAs[Long]("doc_id")))
      .map(_.getAs[Long]("doc_id")).toSeq
    assert(out.sortBy(_.getAs[Long]("position")).map(_.getAs[Long]("doc_id")).toSeq == expected)
    // same seed -> identical layout; different seed -> a different permutation
    val again = TextAnalysis.shuffleOrder(docs, seed = "t").collect()
      .sortBy(_.getAs[Long]("position")).map(_.getAs[Long]("doc_id")).toSeq
    assert(again == expected)
    val other = TextAnalysis.shuffleOrder(docs, seed = "u").collect()
      .sortBy(_.getAs[Long]("position")).map(_.getAs[Long]("doc_id")).toSeq
    assert(other != expected)
  }

  test("qualityDrift: full spine, zero deltas on identical sides, shares sum to ±0") {
    val s = spark; import s.implicits._
    val side = Seq((1L, "the cat sat on the mat"), (2L, "x! y! z!")).toDF("doc_id", "text")
    val same = TextAnalysis.qualityDrift(side, side, nBins = 10).collect()
    assert(same.length == 10) // every bucket emits, occupied or not
    assert(same.forall(_.getAs[Double]("share_delta") == 0.0))
    assert(same.map(_.getAs[Long]("c_inc")).sum == 2L)

    // a one-sided shift: incoming all low-ish, baseline all high-ish —
    // deltas must be positive where incoming concentrates, negative where
    // baseline does, and the occupied buckets differ
    val inc = Seq((1L, "x! y! z! w! v! u!")).toDF("doc_id", "text")
    val bas = Seq((2L, "the cat sat on the mat quietly today")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityDrift(inc, bas, nBins = 10).collect()
      .map(row => row.getAs[Int]("bucket") -> row.getAs[Double]("share_delta")).toMap
    assert(math.abs(r.values.sum) < 1e-9)
    assert(r.values.exists(_ > 0) && r.values.exists(_ < 0))
  }

  test("advanceUnigrams: two advances == stateless drift against the union corpus") {
    val s = spark; import s.implicits._
    val b0 = Seq((0L, "a a b")).toDF("doc_id", "text")
    val b1 = Seq((1L, "b c c")).toDF("doc_id", "text")
    val b2 = Seq((2L, "a c d d")).toDF("doc_id", "text")
    val (d1, c1) = TextAnalysis.advanceUnigrams(TextAnalysis.unigramCounts(b0), b1)
    val (d2, _) = TextAnalysis.advanceUnigrams(c1, b2)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    assert(rows(d1) == rows(TextAnalysis.vocabDrift(b1, b0)))
    assert(rows(d2) == rows(TextAnalysis.vocabDrift(b2, b0.unionByName(b1))))
  }

  test("vocabDrift: identical sides score zero, one-sided tokens take the closed form") {
    val s = spark; import s.implicits._
    val base = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    val same = TextAnalysis.vocabDrift(base, base).collect()
    assert(same.forall(_.getAs[Double]("js_micro") == 0.0))

    // incoming {x}, baseline {y}: each side's token is fully one-sided,
    // p = 1 (resp. q = 1), m = 1/2 -> contribution = 0.5 * ln 2 exactly
    val inc = Seq((1L, "x")).toDF("doc_id", "text")
    val bas = Seq((2L, "y")).toDF("doc_id", "text")
    val r = TextAnalysis.vocabDrift(inc, bas).collect()
      .map(row => row.getAs[String]("token") -> row.getAs[Double]("js_micro")).toMap
    val half = math.rint(0.5 * math.log(2.0) * 1e6 * 1000) / 1000
    assert(r == Map("x" -> half, "y" -> half))

    // ranking: the drifted token outranks the balanced one, and counts ride along
    val inc2 = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val bas2 = Seq((2L, "a b b b")).toDF("doc_id", "text")
    val top = TextAnalysis.vocabDrift(inc2, bas2, k = 1).head()
    assert(top.getAs[String]("token") == "a" || top.getAs[String]("token") == "b")
    assert(top.getAs[Long]("c_inc") + top.getAs[Long]("c_bas") == 4L)
    assert(top.getAs[Double]("js_micro") > 0.0)
  }

  test("NULL text degrades to zero counts everywhere, never NULL rows or phantom chunks") {
    val s2 = spark; import s2.implicits._
    val docs = Seq((0L, "alpha beta gamma", "en", "web"),
      (1L, null.asInstanceOf[String], "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    // qualityScore: counts agree with the 0.0 ratio columns (a consumer
    // filtering n_tokens = 0 must see NULL-text docs)
    val q = TextAnalysis.qualityScore(docs).filter(col("doc_id") === 1L).collect().head
    assert(q.getAs[Long]("n_tokens") == 0L && q.getAs[Long]("n_distinct_tokens") == 0L
      && q.getAs[Long]("n_stopwords") == 0L && q.getAs[Double]("quality_score") == 0.0)
    // chunkTokens: the empty-document path, not a phantom window-sized chunk
    val ch = TextAnalysis.chunkTokens(docs).filter(col("doc_id") === 1L).collect()
    assert(ch.length == 1 && ch.head.getAs[Long]("n_tokens") == 0L
      && ch.head.getAs[String]("chunk_text") == "")
    // packSequences / sampleToTokenBudget: zero tokens, never a NULL count
    val pk = TextAnalysis.packSequences(docs, budget = 10)
      .filter(col("doc_id") === 1L).collect().head
    assert(pk.getAs[Long]("n_tokens") == 0L)
    val bu = TextAnalysis.sampleToTokenBudget(docs, budgetPerStratum = 100,
      stratumCol = "lang").filter(col("doc_id") === 1L).collect().head
    assert(bu.getAs[Long]("n_tokens") == 0L)
    // qualityDrift vs an EMPTY incoming side: deltas show the baseline
    // draining (negative shares), never an all-NULL masked report
    val drift = TextAnalysis.qualityDrift(docs.filter(col("doc_id") < 0), docs, nBins = 4)
      .agg(org.apache.spark.sql.functions.sum("share_delta")).collect().head.getDouble(0)
    assert(math.abs(drift + 1.0) < 1e-6, s"baseline share must drain to -1.0, got $drift")
    // stratifiedSample thresholds ROUND (0.3 * 1e6 is 299999.999... in
    // double; truncation dropped the boundary bucket)
    val kept = TextAnalysis.stratifiedSample(docs, rates = Map("en" -> 0.3),
      stratumCol = "lang")
    assert(kept.count() >= 0) // threshold construction itself must not throw
  }
}
