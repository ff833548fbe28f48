package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import graft.operators.Dedup

/** `Dedup.capBuckets` is load-bearing in five candidate-generation
  * pipelines (minhash_lsh, incremental_lsh[_bloom], simhash_pairs,
  * winnow_dedup, ngram_jaccard): a hot LSH bucket of m rows yields m²/2
  * candidate pairs, so the cap is what keeps those joins linear at corpus
  * scale. Its contract is EXACT, not sampling:
  *
  *   - a bucket whose row count is ≤ maxBucket keeps EVERY row;
  *   - a bucket over the cap contributes NOTHING (whole-bucket drop — the
  *     oracle SQL mirrors `count(*) OVER (PARTITION BY keys) <= cap`
  *     exactly, so partial retention would break every pair oracle);
  *   - non-key columns ride along untouched — in the incremental
  *     variants the `__side` tag is payload, NOT a key, so the cap
  *     decision is taken on the COMBINED (batch ∪ baseline) bucket size:
  *     capping per side would let |inc|·|bas| pairs through a bucket that
  *     self-LSH would have dropped (Dedup.minhashLshAgainstBaseline's
  *     documented union-side rule).
  *
  * Exact multiset equality against an independently computed expectation
  * implies determinism (there is exactly one correct output).
  */
object CapBucketsProps extends Properties("CapBuckets") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  private lazy val spark = SparkSpec.session

  // skewed generator: a tiny key alphabet so buckets routinely straddle
  // the cap from both sides
  private val rowGen: Gen[(Long, Int, String)] = for {
    id   <- Gen.choose(0L, 40L)
    band <- Gen.choose(0, 2)
    bk   <- Gen.oneOf("a", "b", "c")
  } yield (id, band, bk)

  private val caseGen: Gen[(List[(Long, Int, String)], Int)] = for {
    n    <- Gen.choose(0, 120)
    rows <- Gen.listOfN(n, rowGen)
    cap  <- Gen.choose(1, 6)
  } yield (rows, cap)

  private def multiset[A](xs: Seq[A]): Map[A, Int] =
    xs.groupBy(identity).view.mapValues(_.size).toMap

  property("keeps exactly the rows of buckets within the cap — all or nothing per bucket") =
    forAllNoShrink(caseGen) { case (rows, cap) =>
      val s = spark
      import s.implicits._
      val df = rows.toDF("doc_id", "band", "bk")
      val out = Dedup.capBuckets(df, Seq("band", "bk"), cap)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
      val sizes = rows.groupBy(r => (r._2, r._3)).view.mapValues(_.size).toMap
      val expected = rows.filter(r => sizes((r._2, r._3)) <= cap)
      multiset(out) == multiset(expected)
    }

  // per-bucket side splits generated directly so "over the cap only when
  // combined" buckets always occur
  private val sidedGen: Gen[(List[(Long, String, String, String)], Int)] = for {
    nBuckets <- Gen.choose(1, 6)
    cap      <- Gen.choose(2, 5)
    buckets  <- Gen.listOfN(nBuckets, for {
      bk <- Gen.oneOf("a", "b", "c", "d", "e", "f")
      nI <- Gen.choose(0, 4)
      nB <- Gen.choose(0, 4)
    } yield (bk, nI, nB))
  } yield {
    val rows = buckets.zipWithIndex.flatMap { case ((bk, nI, nB), bi) =>
      (0 until nI).map(j => ((bi * 100 + j).toLong, "0", bk, "i")) ++
        (0 until nB).map(j => ((bi * 100 + 50 + j).toLong, "0", bk, "b"))
    }
    (rows, cap)
  }

  property("union-side cap decides on the COMBINED bucket size, sides are payload") =
    forAllNoShrink(sidedGen) { case (rows, cap) =>
      val s = spark
      import s.implicits._
      val df = rows.toDF("doc_id", "band", "bk", "__side")
      val out = Dedup.capBuckets(df, Seq("band", "bk"), cap)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSeq
      val sizes = rows.groupBy(r => (r._2, r._3)).view.mapValues(_.size).toMap
      val expected = rows.filter(r => sizes((r._2, r._3)) <= cap)
      // the formula: combined size governs — a bucket whose sides are each
      // within the cap but whose union exceeds it must vanish entirely
      multiset(out) == multiset(expected)
    }
}
