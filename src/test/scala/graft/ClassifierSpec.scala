package graft

import org.apache.spark.sql.functions._
import graft.operators.{Classifier, Dedup}

/** Classifier.trainScoreLogistic against a full driver-side mirror of the
  * quantized training loop. The feature stream is taken from the SAME
  * shared hash layer the operator consumes (pinned independently by the
  * dedup suites); the gradient-descent math on top — micro weights, nano
  * gradients, HALF_UP updates — is re-implemented in plain Scala below.
  */
class ClassifierSpec extends SparkSpec {

  private def rnd6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def rnd0(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** (doc_id, bucket) per feature occurrence, via the engine's layer. */
  private def featPairs(df: org.apache.spark.sql.DataFrame, buckets: Int): Seq[(Long, Long)] = {
    val base = Dedup.fullHashBase(df, "doc_id", "text")
    def g(n: Int) = base.select(col("doc_id"),
      explode(Dedup.rolledGramHashes(col("__fh"), n, reduceInputs = true)).as("__g"))
    g(1).unionByName(g(2))
      .select(col("doc_id"), pmod(col("__g"), lit(buckets.toLong)).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  /** Driver mirror of train (iters full-batch steps) + score — including
    * the intercept as the virtual feature at index `buckets` with
    * cnt = n_feats.
    */
  /** GraftFunctions.hash60 on the driver: first 15 md5 hex chars as Long. */
  private def h60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  private def mirror(pairs: Seq[(Long, Long)], allIds: Seq[Long], y: Map[Long, Long],
                     buckets: Int, iters: Int, lr: Double, decay: Double,
                     batchPpm: Int = 1000000)
      : Map[Long, (Long, Long, Double, Boolean)] = {
    val realCnt = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nf = realCnt.keys.toSeq.groupBy(_._1).view
      .mapValues(ks => ks.map(realCnt).sum).toMap
    val cnt = realCnt ++ nf.map { case (id, v) => (id, buckets.toLong) -> v }
    val byDoc = cnt.keys.toSeq.groupBy(_._1)
    val n = nf.size.toLong
    val nPos = nf.keys.count(y(_) == 1L).toLong
    val w = Array.fill(buckets + 1)(0L)
    w(buckets) = rnd0(math.log((nPos + 1).toDouble / (n - nPos + 1).toDouble) * 1000000.0)
    val q = Array.fill(buckets + 1)(0L)
    for ((k, c) <- cnt)
      q(k._2.toInt) += rnd0((c * c).toDouble * 1000000000.0 / nf(k._1) / nf(k._1))
    for (it <- 1 to iters) {
      val rate = lr * math.pow(decay, it - 1) * (1000000.0 / batchPpm)
      val grad = Array.fill(buckets + 1)(0L)
      for ((id, ks) <- byDoc
           if batchPpm >= 1000000 || h60(s"mb:$it:$id") % 1000000L < batchPpm) {
        val sm = ks.map(k => cnt(k) * w(k._2.toInt)).sum
        val p6 = rnd6(1.0 / (1.0 + math.exp(-(sm.toDouble / 1000000.0 / nf(id)))))
        val g = rnd0((p6 - y(id)) / nf(id) * 1000000000.0)
        for (k <- ks) grad(k._2.toInt) += cnt(k) * g
      }
      for (b <- 0 to buckets)
        w(b) -= rnd0(rate * grad(b) / math.max(q(b), 1L) * 1000000.0)
    }
    allIds.map { id =>
      val ks = byDoc.getOrElse(id, Seq.empty)
      val sm = ks.map(k => cnt(k) * w(k._2.toInt)).sum
      val nfv = nf.getOrElse(id, 0L)
      val p6 = rnd6(1.0 / (1.0 + math.exp(-(sm.toDouble / 1000000.0 / math.max(nfv, 1L)))))
      id -> ((nfv, sm, p6, p6 >= 0.5))
    }.toMap
  }

  private def corpus(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    // en-flavored positives, noise negatives, one straddler, one empty doc
    ((0L to 4L).map(i => (i, s"the quick brown fox jumps over dog $i", 1L)) ++
      (5L to 10L).map(i => (i, s"zug blorf quix nalp $i wemb trosk", 0L)) ++
      Seq((11L, "the quick zug blorf", 0L), (12L, "", 0L))).toDF("doc_id", "text", "y")
  }

  test("trainScoreLogistic matches the driver mirror exactly, on every column") {
    val s = spark
    val df = corpus(s)
    val B = 64
    val pairs = featPairs(df, B)
    val ids = df.select("doc_id").collect().map(_.getLong(0)).toSeq
    val ys = df.select("doc_id", "y").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = mirror(pairs, ids, ys, B, iters = 4, lr = 1.0, decay = 0.8)
    val got = Classifier.trainScoreLogistic(df, col("y") === 1L,
      iters = 4, buckets = B, lr = 1.0, decay = 0.8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got === expected)
    // exact long/quantized arithmetic → identical under repartition
    val got2 = Classifier.trainScoreLogistic(df.repartition(7), col("y") === 1L,
      iters = 4, buckets = B, lr = 1.0, decay = 0.8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got2 === expected)
  }

  test("minibatch training matches the gated driver mirror; full ppm is bit-identical to the old path") {
    val s = spark
    val df = corpus(s)
    val B = 64
    val pairs = featPairs(df, B)
    val ids = df.select("doc_id").collect().map(_.getLong(0)).toSeq
    val ys = df.select("doc_id", "y").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // half-corpus subsample per iteration, rate-compensated
    val expectedMb = mirror(pairs, ids, ys, B, iters = 4, lr = 1.0, decay = 0.8,
      batchPpm = 500000)
    val gotMb = Classifier.trainScoreLogistic(df, col("y") === 1L,
      iters = 4, buckets = B, lr = 1.0, decay = 0.8, batchPpm = 500000)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(gotMb === expectedMb)
    // batchPpm = 10^6 takes the ungated path: identical to the default API
    val full = Classifier.trainScoreLogistic(df, col("y") === 1L,
      iters = 4, buckets = B, lr = 1.0, decay = 0.8)
      .collect().map(_.toSeq).toSet
    val fullPpm = Classifier.trainScoreLogistic(df, col("y") === 1L,
      iters = 4, buckets = B, lr = 1.0, decay = 0.8, batchPpm = 1000000)
      .collect().map(_.toSeq).toSet
    assert(full === fullPpm)
    // the subsample really bites: some weight diverges from full-batch
    assert(gotMb !== full.map(r => r.head.asInstanceOf[Long] ->
      ((r(1).asInstanceOf[Long], r(2).asInstanceOf[Long],
        r(3).asInstanceOf[Double], r(4).asInstanceOf[Boolean]))).toMap)
  }

  test("disjoint-vocabulary classes separate: every positive outscores every negative") {
    val s = spark
    val df = corpus(s).filter(col("doc_id") <= 10L) // drop the straddler + empty doc
    val got = Classifier.trainScoreLogistic(df, col("y") === 1L, iters = 8, buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val worstPos = (0L to 4L).map(got).min
    val bestNeg = (5L to 10L).map(got).max
    assert(worstPos > bestNeg, s"positive floor $worstPos vs negative ceiling $bestNeg")
  }

  test("a featureless document scores at the sigmoid midpoint") {
    val s = spark
    val got = Classifier.trainScoreLogistic(corpus(s), col("y") === 1L,
      iters = 3, buckets = 64)
      .filter(col("doc_id") === 12L).collect().head
    assert(got.getLong(1) === 0L)    // n_feats
    assert(got.getLong(2) === 0L)    // score_micro
    assert(got.getDouble(3) === 0.5) // prob6
    assert(got.getBoolean(4))        // 0.5 >= 0.5
  }

  test("evaluateHoldout: counts come from held-out docs only and reconcile; train split never scored") {
    val s = spark
    val docs = sources.Tables.documents(s, "/root/testdata/sf0.001")
    val fr = Seq("train" -> 0.6, "val" -> 0.2, "test" -> 0.2)
    val out = Classifier.evaluateHoldout(docs, col("text").contains("customer"),
        fractions = fr, iters = 3, buckets = 256)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          (r.getDouble(6), r.getDouble(7), r.getDouble(8), r.getDouble(9)))))
      .toMap
    assert(out.keySet.subsetOf(Set("val", "test")) && out.nonEmpty)
    val split = operators.TextAnalysis.splitAssign(docs, fr)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    out.foreach { case (sp, (n, tp, fp, tn, fn, (acc, prec, rec, f1))) =>
      assert(n == split(sp), s"$sp: evaluated $n of ${split(sp)} docs")
      assert(tp + fp + tn + fn == n)
      assert(acc == r6((tp + tn).toDouble / n))
      // zero denominators report 0.0; f1 derives from the RAW counts, so
      // it must sit between min and max of the unrounded P/R pair
      assert(prec == (if (tp + fp == 0) 0.0 else r6(tp.toDouble / (tp + fp))))
      assert(rec == (if (tp + fn == 0) 0.0 else r6(tp.toDouble / (tp + fn))))
      assert(f1 == (if (2 * tp + fp + fn == 0) 0.0
                    else r6(2.0 * tp / (2 * tp + fp + fn))))
      if (tp > 0) assert(f1 >= math.min(prec, rec) - 1e-6 && f1 <= math.max(prec, rec) + 1e-6)
    }
  }

  test("trainWeights emits the bucket-space table plus the intercept row") {
    val s = spark
    val w = Classifier.trainWeights(corpus(s), col("y") === 1L, iters = 3, buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w.size === 65)
    assert(w.keys.toSeq.sorted === (0L to 64L))
    assert(w.values.exists(_ != 0L), "all-zero weights after three gradient steps")
    // most docs are negative, so the trained intercept pulls below zero
    assert(w(64L) < 0L, s"intercept ${w(64L)} should reflect the negative base rate")
  }
}
