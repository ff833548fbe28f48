package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import graft.operators.Dedup

/** `Dedup.advanceSpanBaseline` against driver-side oracles.
  *
  * Two angles: (1) a single advance must coincide EXACTLY with
  * `duplicateSpansAgainstBaseline` at every maxOcc — the cumulative count
  * state (init counts + batch counts) is definitionally the union count
  * that operator caps on, so the evolution layer adds state without
  * changing first-crawl semantics; (2) a full two-crawl replay (cap off)
  * must match a driver-side fold: run-1 spans from the brute-force
  * cross-side oracle, batch 1 excised at those positions, run-2 spans
  * brute-forced against (seed ∪ excised batch 1), and the state's docs
  * frame must hold exactly the seed plus the excised survivors.
  * Generators share DupSpansProps' tiny-vocab token lists so
  * normalize+tokenize is the identity and oracles compare raw tokens.
  */
object SpanEvolveProps extends Properties("SpanEvolve") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private val n = 3

  private val tokenGen = Gen.oneOf("aa", "bb", "cc", "dd")
  private val docGen = Gen.chooseNum(0, 12).flatMap(Gen.listOfN(_, tokenGen))

  private def df(side: Seq[(Long, Seq[String])]) = {
    val s = spark; import s.implicits._
    side.map { case (i, tk) => (i, tk.mkString(" ")) }.toDF("doc_id", "text")
  }

  /** Cross-side spans (id_in, id_bas, start_in, start_bas, len) via the
    * full-corpus brute oracle; requires every bas id < every inc id.
    */
  private def crossSpans(inc: Seq[(Long, Seq[String])],
                         bas: Seq[(Long, Seq[String])]): Set[(Long, Long, Int, Int, Long)] = {
    val basIds = bas.map(_._1).toSet
    DupSpansProps.bruteSpans(bas ++ inc).collect {
      case (ia, ib, sa, sb, len) if basIds(ia) && !basIds(ib) => (ib, ia, sb, sa, len)
    }
  }

  /** Keep-first excision of the incoming side at its span positions. */
  private def excise(inc: Seq[(Long, Seq[String])],
                     spans: Set[(Long, Long, Int, Int, Long)]): Seq[(Long, Seq[String])] = {
    val rm = spans.toSeq
      .flatMap { case (idIn, _, sIn, _, len) => (sIn until sIn + len.toInt).map(p => (idIn, p)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    inc.map { case (i, tk) =>
      (i, tk.zipWithIndex.collect { case (t, p) if !rm.getOrElse(i, Set.empty[Int])(p) => t })
    }
  }

  private def collectSpans(sp: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int, Int, Long)] =
    sp.collect().map(r => (r.getAs[Long]("id_in"), r.getAs[Long]("id_bas"),
      r.getAs[Int]("start_in"), r.getAs[Int]("start_bas"), r.getAs[Long]("n_tokens"))).toSet

  property("first advance == duplicateSpansAgainstBaseline at every maxOcc (cumulative = union count)") =
    forAllNoShrink(
      Gen.chooseNum(2, 6).flatMap(k =>
        Gen.listOfN(k, docGen).map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })),
      Gen.oneOf(1, 3, 8, 1000000)) { (docs, maxOcc) =>
      val (bas, inc) = docs.partition(_._1 < docs.length / 2)
      val adv = Dedup.advanceSpanBaseline(
        Dedup.initSpanBaseline(df(bas), n = n), df(inc), maxOcc = maxOcc)
      val want = collectSpans(
        Dedup.duplicateSpansAgainstBaseline(df(inc), df(bas), n = n, maxOcc = maxOcc))
      val got = collectSpans(adv.spans)
      adv.release()
      got == want
    }

  property("two-crawl replay == driver-side fold oracle (spans, state docs), cap off") =
    forAllNoShrink(Gen.chooseNum(3, 7).flatMap(k =>
      Gen.listOfN(k, docGen).map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) }))) { docs =>
      val third = math.max(1, docs.length / 3)
      val b0 = docs.filter(_._1 < third)
      val b1 = docs.filter(d => d._1 >= third && d._1 < 2 * third)
      val b2 = docs.filter(_._1 >= 2 * third)
      val big = 1000000
      val a1 = Dedup.advanceSpanBaseline(Dedup.initSpanBaseline(df(b0), n = n), df(b1), maxOcc = big)
      val a2 = Dedup.advanceSpanBaseline(a1.state, df(b2), maxOcc = big)

      val want1 = crossSpans(b1, b0)
      val cleaned1 = excise(b1, want1)
      val want2 = crossSpans(b2, b0 ++ cleaned1)
      val wantDocs = (b0 ++ cleaned1 ++ excise(b2, want2))
        .map { case (i, tk) => (i, tk.mkString(" ")) }.toSet

      val got1 = collectSpans(a1.spans)
      val got2 = collectSpans(a2.spans)
      val gotDocs = a2.state.docs.collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toSet
      a2.release(); a1.release()
      got1 == want1 && got2 == want2 && gotDocs == wantDocs
    }
}
