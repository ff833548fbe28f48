package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import graft.operators.Similarity

/** Brute-force oracle for the exact ANN baseline: `bruteForceTopKAgg`
  * (the bounded-buffer scale path) must reproduce a driver-side cosine
  * ranking computed with the same arithmetic — index-order dot
  * accumulation, sqrt norms, one rounded division per pair, (cosine
  * desc, neighbor asc) total order, self-pairs excluded. SimilaritySpec
  * already pins agg == window; this pins BOTH against an engine-free
  * restatement of the scoring itself.
  */
object AnnProps extends Properties("Ann") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private val vecsGen: Gen[List[IndexedSeq[Double]]] = for {
    dim <- Gen.choose(2, 5)
    m <- Gen.choose(4, 12)
    vs <- Gen.listOfN(m, Gen.listOfN(dim, Gen.choose(-100, 100).map(_ / 100.0))
      .map(_.toIndexedSeq).suchThat(v => v.exists(_ != 0.0)))
  } yield vs

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def dot(a: IndexedSeq[Double], b: IndexedSeq[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  property("semanticDecontaminate == driver-side max/count/argmax fold") =
    forAllNoShrink(vecsGen, Gen.choose(0, 50).map(_ / 100.0)) { (vecs, thr) =>
      val s = spark; import s.implicits._
      val rows = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
      val corpus = rows.toDF("vec_id", "embedding")
      val bench = rows.filter(_._1 % 3 == 0)
      val got = Similarity.semanticDecontaminate(corpus, bench.toDF("vec_id", "embedding"), thr)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getBoolean(4)))
        .toSet

      val norm = vecs.map(v => math.sqrt(dot(v, v)))
      val want = vecs.indices.map { ci =>
        val scored = bench.map { case (bi, _) =>
          (bi, round6(dot(vecs(ci), vecs(bi.toInt)) / (norm(ci) * norm(bi.toInt)))) }
        val maxC = scored.map(_._2).max
        val nearest = scored.filter(_._2 == maxC).map(_._1).min
        (ci.toLong, scored.count(_._2 >= thr).toLong, maxC, nearest, maxC >= thr)
      }.toSet

      got == want
    }

  /** Recall pinned at the exact setting: with every cell probed AND a
    * corpus-deep rerank, IVF-PQ can drop no true neighbor — its output
    * must equal the brute-force baseline row-for-row (which the property
    * below pins engine-free). Any loss of a neighbor from an unprobed
    * cell or a short shortlist would break the equality.
    */
  property("ivfPqTopK at full probe + corpus rerank == brute force") =
    forAllNoShrink(vecsGen.suchThat(_.head.length % 2 == 0), Gen.choose(1, 3)) { (vecs, k) =>
      val s = spark; import s.implicits._
      val rows = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
      val corpus = rows.toDF("vec_id", "embedding")
      val queries = rows.take(math.min(3, rows.size)).toDF("vec_id", "embedding")
      val dim = vecs.head.length
      val got = Similarity.ivfPqTopK(corpus, queries, k, dim,
          nCentroids = 4, nProbe = 4, m = 2, ksub = 4, iters = 1, rerank = rows.size)
        .collect().map(_.toSeq).toSet
      val want = Similarity.bruteForceTopKAgg(corpus, queries, k)
        .collect().map(_.toSeq).toSet
      got == want
    }

  property("bruteForceTopKAgg == driver-side cosine ranking") =
    forAllNoShrink(vecsGen, Gen.choose(1, 5)) { (vecs, k) =>
      val s = spark; import s.implicits._
      val rows = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
      val corpus = rows.toDF("vec_id", "embedding")
      val nQueries = math.min(3, rows.size)
      val queries = rows.take(nQueries).toDF("vec_id", "embedding")

      val got = Similarity.bruteForceTopKAgg(corpus, queries, k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

      val norm = vecs.map(v => math.sqrt(dot(v, v)))
      val want = (0 until nQueries).flatMap { qi =>
        vecs.indices.filter(_ != qi)
          .map { ci =>
            (ci.toLong, round6(dot(vecs(qi), vecs(ci)) / (norm(qi) * norm(ci)))) }
          .sortBy { case (id, c) => (-c, id) }
          .take(k).zipWithIndex
          .map { case ((id, c), r) => (qi.toLong, (r + 1).toLong, id, c) }
      }.toSet

      got == want
    }
}
