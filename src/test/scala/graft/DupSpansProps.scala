package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import graft.operators.Dedup

/** `Dedup.duplicateSpans` against a driver-side brute-force span oracle:
  * for every document pair and every alignment (diagonal), the maximal
  * runs of positionwise-equal tokens of length ≥ n must match the
  * operator's output EXACTLY — ids, both start offsets, and token
  * length. Texts are generated from a tiny lowercase vocabulary with no
  * punctuation, so the operator's normalize+tokenize is the identity on
  * the generator's token lists and the oracle can compare raw tokens.
  * Hash collisions in the 60-bit verification space would be the only
  * divergence — vanishingly improbable at these sizes (and the mod-P
  * candidate keys are exactly what verification exists to correct).
  */
object DupSpansProps extends Properties("DupSpans") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private val n = 3

  // small vocab + short docs => shared runs are common, intra-doc
  // repetition is common (stressing multi-occurrence gram joins)
  private val tokenGen = Gen.oneOf("aa", "bb", "cc", "dd")
  private val docGen = Gen.chooseNum(0, 12).flatMap(Gen.listOfN(_, tokenGen))

  private[graft] def bruteSpans(docs: Seq[(Long, Seq[String])]): Set[(Long, Long, Int, Int, Long)] =
    (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      diag <- -(tb.length) to ta.length
      span <- {
        // walk the diagonal, emitting maximal equal-token runs
        val pairs = (0 until ta.length).flatMap { pa =>
          val pb = pa - diag
          if (pb >= 0 && pb < tb.length && ta(pa) == tb(pb)) Some(pa) else None
        }
        // group consecutive pa into runs
        pairs.foldLeft(List.empty[(Int, Int)]) {
          case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
          case (acc, p) => (p, p) :: acc
        }.collect { case (s, e) if e - s + 1 >= n =>
          (ia, ib, s, s - diag, (e - s + 1).toLong)
        }
      }
    } yield span).toSet

  property("spans == brute-force maximal equal-token runs per pair and diagonal") =
    forAllNoShrink(Gen.chooseNum(2, 6).flatMap(k =>
      Gen.listOfN(k, docGen).map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) }))) { docs =>
      val s = spark; import s.implicits._
      val df = docs.map { case (i, tk) => (i, tk.mkString(" ")) }.toDF("doc_id", "text")
      val got = Dedup.duplicateSpans(df, n = n, maxOcc = 1000000).collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          r.getAs[Int]("start_a"), r.getAs[Int]("start_b"), r.getAs[Long]("n_tokens"))).toSet
      got == bruteSpans(docs)
    }

  property("exciseSpans == rebuild from the brute-force removed-position union (keep-first)") =
    forAllNoShrink(Gen.chooseNum(2, 5).flatMap(k =>
      Gen.listOfN(k, docGen).map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) }))) { docs =>
      val s = spark; import s.implicits._
      val df = docs.map { case (i, tk) => (i, tk.mkString(" ")) }.toDF("doc_id", "text")
      val removedByDoc = bruteSpans(docs)
        .flatMap { case (_, idB, _, startB, len) =>
          (startB until (startB + len.toInt)).map(p => (idB, p))
        }
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val want = docs.map { case (i, tk) =>
        val rm = removedByDoc.getOrElse(i, Set.empty[Int])
        (i, tk.zipWithIndex.collect { case (t, p) if !rm(p) => t }.mkString(" "),
          rm.size.toLong)
      }.toSet
      val got = Dedup.exciseSpans(df, n = n, maxOcc = 1000000).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("clean_text"),
          r.getAs[Long]("n_removed"))).toSet
      got == want
    }

  property("againstBaseline == brute-force spans restricted to cross-side pairs") =
    forAllNoShrink(Gen.chooseNum(2, 6).flatMap(k =>
      Gen.listOfN(k, docGen).map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) }))) { docs =>
      val s = spark; import s.implicits._
      val (bas, inc) = docs.partition(_._1 < docs.length / 2)
      def df(side: Seq[(Long, Seq[String])]) =
        side.map { case (i, tk) => (i, tk.mkString(" ")) }.toDF("doc_id", "text")
      val got = Dedup.duplicateSpansAgainstBaseline(df(inc), df(bas), n = n, maxOcc = 1000000)
        .collect()
        .map(r => (r.getAs[Long]("id_in"), r.getAs[Long]("id_bas"),
          r.getAs[Int]("start_in"), r.getAs[Int]("start_bas"), r.getAs[Long]("n_tokens"))).toSet
      // the full-corpus oracle keys pairs (lower, higher); baseline ids are
      // the lower half here, so flip its (id_a=bas, id_b=inc) rows
      val want = bruteSpans(docs).collect {
        case (ia, ib, sa, sb, len) if ia < docs.length / 2 && ib >= docs.length / 2 =>
          (ib, ia, sb, sa, len)
      }
      got == want
    }

  property("spanCoverage == interval-union fraction from the brute-force spans, both sides") =
    forAllNoShrink(Gen.chooseNum(2, 5).flatMap(k =>
      Gen.listOfN(k, docGen).map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) }))) { docs =>
      val s = spark; import s.implicits._
      val df = docs.map { case (i, tk) => (i, tk.mkString(" ")) }.toDF("doc_id", "text")
      val coveredByDoc = bruteSpans(docs)
        .flatMap { case (ia, ib, sa, sb, len) =>
          (sa until sa + len.toInt).map(p => (ia, p)) ++
            (sb until sb + len.toInt).map(p => (ib, p))
        }
        .groupBy(_._1).view.mapValues(_.map(_._2).size.toLong).toMap
      val want = docs.map { case (i, tk) =>
        val dup = coveredByDoc.getOrElse(i, 0L)
        val frac = if (tk.nonEmpty) BigDecimal(dup.toDouble / tk.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble else 0.0
        (i, tk.length.toLong, dup, frac)
      }.toSet
      val got = Dedup.spanCoverage(df, n = n, maxOcc = 1000000).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_dup_tokens"), r.getAs[Double]("dup_frac"))).toSet
      got == want
    }

  property("spanContainment == brute-force best-partner coverage with (cov desc, id asc) tie-break") =
    forAllNoShrink(Gen.chooseNum(2, 5).flatMap(k =>
      Gen.listOfN(k, docGen).map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) }))) { docs =>
      val s = spark; import s.implicits._
      val df = docs.map { case (i, tk) => (i, tk.mkString(" ")) }.toDF("doc_id", "text")
      val covByPair = bruteSpans(docs)
        .flatMap { case (ia, ib, sa, sb, len) =>
          (sa until sa + len.toInt).map(p => ((ia, ib), p)) ++
            (sb until sb + len.toInt).map(p => ((ib, ia), p))
        }
        .groupBy(_._1).view.mapValues(_.map(_._2).size.toLong).toMap
      val want = docs.map { case (i, tk) =>
        val partners = covByPair.collect { case ((d, p), c) if d == i => (p, c) }
        if (partners.isEmpty) (i, tk.length.toLong, None, 0L, 0.0)
        else {
          val (p, c) = partners.toSeq.minBy { case (pid, cov) => (-cov, pid) }
          val frac = if (tk.nonEmpty) BigDecimal(c.toDouble / tk.length)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble else 0.0
          (i, tk.length.toLong, Some(p), c, frac)
        }
      }.toSet
      val got = Dedup.spanContainment(df, n = n, maxOcc = 1000000).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
          if (r.isNullAt(2)) None else Some(r.getAs[Long]("partner_id")),
          r.getAs[Long]("covered_tokens"), r.getAs[Double]("containment_frac"))).toSet
      got == want
    }

  property("spanContainment tie-break survives Long.MinValue partner ids (complement, not negation)") = {
    // three docs share one identical n-token span, so every doc sees TWO
    // partners tied on coverage; the smallest-partner rule must pick
    // Long.MinValue — the id whose negation overflows back to itself,
    // which a max(struct(cov, -id)) argmax would silently lose
    val s = spark; import s.implicits._
    val span = Seq("aa", "bb", "cc").mkString(" ") // exactly n = 3 tokens
    val df = Seq(
      (5L, span + " xx"),
      (Long.MinValue, span + " yy"),
      (7L, span + " zz")).toDF("doc_id", "text")
    val got = Dedup.spanContainment(df, n = n, maxOcc = 1000000).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("partner_id")).toMap
    got == Map(5L -> Long.MinValue, Long.MinValue -> 5L, 7L -> Long.MinValue)
  }

  property("reverifySpans keeps exactly the maximal 60-bit-true sub-runs of a failed span") =
    forAllNoShrink(Gen.chooseNum(0, 6), Gen.chooseNum(0, 6)) { (trueLeft, trueRight) =>
      // fabricate the collision shape that whole-slice verification fails
      // on: `trueLeft` agreeing tokens, a disagreeing middle token, then
      // `trueRight` agreeing tokens — the claimed span covers all of it.
      // Expected output: the maximal runs of agreeing n-windows on each
      // side of the break (real mod-P collisions cannot be synthesized,
      // but this drives the identical arithmetic).
      val s = spark; import s.implicits._
      val total = trueLeft + 1 + trueRight
      val fhA = (0 until total).map(_.toLong + 100)
      val fhB = fhA.updated(trueLeft, -1L) // the break
      val failed = Seq((1L, 2L, 0, 0, total.toLong, fhA, fhB))
        .toDF("id_a", "id_b", "start_a", "start_b", "n_tokens", "__fh_a", "__fh_b")
      val got = Dedup.reverifySpans(failed, n)
        .collect().map(r => (r.getAs[Int]("start_a"), r.getAs[Long]("n_tokens"))).toSet
      val want = Seq(
        (0, trueLeft.toLong),                       // run before the break
        (trueLeft + 1, trueRight.toLong))           // run after the break
        .collect { case (st, len) if len >= n => (st, len) }.toSet
      got == want
    }

  /** Brute-force INTRA-document oracle: for every offset d ≥ 1, the
    * maximal runs where token(p) == token(p + d), length ≥ n — the
    * mirror of the engine's (id, diagonal) islands with pos_a < pos_b.
    */
  private def bruteIntraSpans(docs: Seq[(Long, Seq[String])]): Set[(Long, Int, Int, Long)] =
    (for {
      (id, t) <- docs
      d <- 1 to t.length
      span <- {
        val pairs = (0 until t.length).flatMap { pa =>
          if (pa + d < t.length && t(pa) == t(pa + d)) Some(pa) else None
        }
        pairs.foldLeft(List.empty[(Int, Int)]) {
          case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
          case (acc, p) => (p, p) :: acc
        }.collect { case (s, e) if e - s + 1 >= n =>
          (id, s, s + d, (e - s + 1).toLong)
        }
      }
    } yield span).toSet

  // self-repetition-heavy generator: plain docs, doubled docs (the
  // whole-document repeat at diagonal −m), and partial self-prefixes
  private val selfRepGen: Gen[List[String]] =
    docGen.flatMap(t => Gen.oneOf(t, t ++ t, t ++ t.take(t.length / 2)))

  property("intra spans == brute-force maximal same-doc runs per offset (incl. tandem overlaps)") =
    forAllNoShrink(Gen.chooseNum(1, 5).flatMap(k =>
      Gen.listOfN(k, selfRepGen).map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) }))) { docs =>
      val s = spark; import s.implicits._
      val df = docs.map { case (i, tk) => (i, tk.mkString(" ")) }.toDF("doc_id", "text")
      val got = Dedup.duplicateSpansIntra(df, n = n, maxOcc = 1000000).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("start_a"),
          r.getAs[Int]("start_b"), r.getAs[Long]("n_tokens"))).toSet
      got == bruteIntraSpans(docs)
    }

  property("exciseSpans(includeIntra) removes the cross id_b ∪ intra start_b position union") =
    forAllNoShrink(Gen.chooseNum(2, 4).flatMap(k =>
      Gen.listOfN(k, selfRepGen).map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) }))) { docs =>
      val s = spark; import s.implicits._
      val df = docs.map { case (i, tk) => (i, tk.mkString(" ")) }.toDF("doc_id", "text")
      val removedByDoc = (bruteSpans(docs)
        .flatMap { case (_, idB, _, startB, len) =>
          (startB until (startB + len.toInt)).map(p => (idB, p))
        } ++
        bruteIntraSpans(docs).flatMap { case (id, _, startB, len) =>
          (startB until (startB + len.toInt)).map(p => (id, p))
        })
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val want = docs.map { case (i, tk) =>
        val rm = removedByDoc.getOrElse(i, Set.empty[Int])
        (i, tk.zipWithIndex.collect { case (t, p) if !rm(p) => t }.mkString(" "),
          rm.size.toLong)
      }.toSet
      val got = Dedup.exciseSpans(df, n = n, maxOcc = 1000000, includeIntra = true).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("clean_text"),
          r.getAs[Long]("n_removed"))).toSet
      got == want
    }

  property("the occurrence cap is all-or-nothing: maxOcc below any dup gram's count kills all spans") =
    forAllNoShrink(Gen.listOfN(2, docGen)) { ts =>
      val s = spark; import s.implicits._
      // every gram backing a span occurs >= 2 times corpus-wide by
      // definition (once per side) — maxOcc = 1 must gate them all
      val df = ts.zipWithIndex.map { case (t, i) => (i.toLong, t.mkString(" ")) }
        .toDF("doc_id", "text")
      Dedup.duplicateSpans(df, n = n, maxOcc = 1).count() == 0L
    }
}
