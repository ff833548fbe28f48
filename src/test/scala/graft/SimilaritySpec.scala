package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

class SimilaritySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bounded-buffer top-k aggregation == window top-k, exactly") {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < 4)
    val viaWindow = Similarity.bruteForceTopK(emb, q, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sorted.toSeq
    val viaAgg = Similarity.bruteForceTopKAgg(emb, q, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sorted.toSeq
    assert(viaAgg == viaWindow)
    assert(viaAgg.nonEmpty && viaAgg.groupBy(_._1).forall(_._2.size == 5))
  }

  test("kmeansAssign: one Lloyd round separates two well-split clusters seeded inside one") {
    val s = spark; import s.implicits._
    // both seeds (2 lowest ids) start inside the near-origin cluster; the
    // mean-update round must pull centroid 1 to the far cluster
    val pts = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(10.0f, 10.0f)), (3L, Array(10.0f, 11.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kmeansAssign(pts, k = 2, iters = 1, dim = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) === out(1L))
    assert(out(2L) === out(3L))
    assert(out(0L) !== out(2L))
    // iters = 0 scores against the raw seeds: seed vectors sit at distance 0
    val raw = Similarity.kmeansAssign(pts, k = 2, iters = 0, dim = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(raw.filter(r => r._1 < 2).forall(_._3 === 0.0))
    // deterministic: a repartitioned input gives identical assignments
    val re = Similarity.kmeansAssign(pts.repartition(3), k = 2, iters = 1, dim = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re === out)
  }

  test("semanticDecontaminate: benchmark members self-flag at 1.0; empty benchmark is total") {
    val emb = Tables.embeddings(spark, dir)
    val bench = emb.filter(pmod(col("vec_id"), lit(41L)) === 0L)
    val out = Similarity.semanticDecontaminate(emb, bench, threshold = 0.99)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out.size.toLong === emb.count())
    val members = bench.select("vec_id").collect().map(_.getLong(0))
    assert(members.nonEmpty)
    // a benchmark member's nearest neighbor is itself at rounded cosine 1.0
    members.foreach { id =>
      val (nHits, maxC, nearest, flagged) = out(id)
      assert(maxC === 1.0 && nearest === id && flagged && nHits >= 1L)
    }
    // empty benchmark: every corpus row survives with zero hits, null audit
    val none = Similarity.semanticDecontaminate(
      emb, emb.filter(col("vec_id") < 0L), threshold = 0.2).collect()
    assert(none.length.toLong === emb.count())
    assert(none.forall(r => r.getLong(1) == 0L && r.isNullAt(2) && r.isNullAt(3) && !r.getBoolean(4)))
  }

  test("ivfTopK with a kmeans-refined codebook: exact scores, k rows per query") {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < 4)
    val refined = Similarity.kmeansCodebook(emb, k = 8, iters = 2)
    val out = Similarity.ivfTopK(emb, q, k = 5, dim = 64,
      nCentroids = 8, nProbe = 3, codebook = Some(refined))
    val exact = Similarity.bruteForceTopK(emb, q, Int.MaxValue)
      .select("query_id", "neighbor_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val rows = out.collect()
    assert(rows.groupBy(_.getLong(0)).forall(_._2.length == 5))
    rows.foreach { r =>
      assert(exact((r.getLong(0), r.getLong(2))) === r.getDouble(3))
    }
  }

  test("lshTopK returns a subset of the exact neighbors' pairs, all within-bucket") {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < 4)
    val approx = Similarity.lshTopK(emb, q, 5, dim = 64, nPlanes = 4)
    // every (query, neighbor) it returns must score identically to brute force
    val exact = Similarity.bruteForceTopK(emb, q, Int.MaxValue)
      .select("query_id", "neighbor_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    approx.collect().foreach { r =>
      assert(math.abs(exact((r.getLong(0), r.getLong(2))) - r.getDouble(3)) < 1e-9)
    }
  }

  test("multi-probe LSH candidates are a superset of single-probe") {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < 6)
    def pairs(mp: Boolean) =
      Similarity.lshTopK(emb, q, Int.MaxValue, dim = 64, nPlanes = 8, multiProbe = mp)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = pairs(mp = false)
    val multi = pairs(mp = true)
    assert(single.subsetOf(multi))
    assert(multi.size > single.size) // Hamming-1 probes actually add recall
  }

  test("classCentroids: exact quantized means per (class, dim)") {
    val s = spark; import s.implicits._
    val df = Seq((1L, Seq(1.0f, 3.0f), "x"), (2L, Seq(3.0f, 5.0f), "x"),
      (3L, Seq(10.0f, 0.0f), "y")).toDF("vec_id", "embedding", "label")
    val out = Similarity.classCentroids(df).orderBy("label", "dim")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(out == Seq(("x", 0L, 2L, 2.0), ("x", 1L, 2L, 4.0),
      ("y", 0L, 1L, 10.0), ("y", 1L, 1L, 0.0)))
  }

  test("quantizeInt8: codes span [0,255], bounds ride along, dequantization error <= scale/2") {
    val s = spark; import s.implicits._
    val vecs = Seq(
      (1L, Array(0.0f, 0.5f, 1.0f, 0.25f)),
      (2L, Array(-2.0f, 2.0f, 0.0f, -1.0f)),
      (3L, Array(0.7f, 0.7f, 0.7f, 0.7f)))   // constant vector → all-zero codes
      .toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(vecs)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getSeq[Long](3)))).toMap
    assert(out(1L) === ((0.0, 1.0, Seq(0L, 128L, 255L, 64L))))  // 0.5*255=127.5 → HALF_UP 128
    assert(out(3L) === ((0.7, 0.7, Seq(0L, 0L, 0L, 0L))))
    val (lo, hi, codes) = out(2L)
    assert(codes.forall(c => c >= 0L && c <= 255L))
    val scale = (hi - lo) / 255.0
    val orig = Seq(-2.0, 2.0, 0.0, -1.0)
    codes.zip(orig).foreach { case (c, x) =>
      assert(math.abs(lo + c * scale - x) <= scale / 2 + 1e-9, s"dequant err for $x")
    }
  }

  test("ivfTopK scores match brute force on the pairs it returns; k rows per query") {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < 4)
    val approx = Similarity.ivfTopK(emb, q, 5, dim = 64, nCentroids = 8, nProbe = 3)
    val exact = Similarity.bruteForceTopK(emb, q, Int.MaxValue)
      .select("query_id", "neighbor_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val rows = approx.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(exact((r.getLong(0), r.getLong(2))) - r.getDouble(3)) < 1e-9)
    }
    // probing 3/8 cells caps candidate work at ~3/8 of the corpus
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("quantizedTopK: full-depth rerank == exact brute force; shallow rerank ranks exactly") {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < 4)
    val n = emb.count().toInt
    // rerank = corpus: the quantized stage cannot drop a true neighbor,
    // so the exact-rerank output must equal brute force row-for-row
    val full = Similarity.quantizedTopK(emb, q, k = 5, rerank = n)
      .collect().map(_.toSeq).toSet
    val exact = Similarity.bruteForceTopKAgg(emb, q, k = 5)
      .collect().map(_.toSeq).toSet
    assert(full === exact)
    // shallow rerank: every returned cosine is an EXACT cosine (stage 2
    // re-scores), ranks are dense 1..5 per query
    val shallow = Similarity.quantizedTopK(emb, q, k = 5, rerank = 16).collect()
    assert(shallow.length === 4 * 5)
    val exactAll = Similarity.bruteForceTopK(emb, q, Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    shallow.foreach { r =>
      assert(r.getDouble(3) === exactAll((r.getLong(0), r.getLong(2))), s"not an exact score: $r")
    }
    shallow.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.map(_.getLong(1)).sorted.toSeq === (1L to 5L))
    }
  }

  test("rpTopK: corpus-wide shortlist == exact brute force; shallow shortlist reranks exactly") {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < 4)
    val n = emb.count().toInt
    // shortlist = corpus: the projected stage cannot drop a true neighbor,
    // so the exact-rerank output must equal brute force row-for-row
    val full = Similarity.rpTopK(emb, q, k = 5, dim = 64, rpDim = 16, shortlist = n)
      .collect().map(_.toSeq).toSet
    val exact = Similarity.bruteForceTopKAgg(emb, q, k = 5)
      .collect().map(_.toSeq).toSet
    assert(full === exact)
    // shallow shortlist: every returned cosine is an EXACT cosine (the
    // rerank re-scores full-width), ranks are dense 1..5 per query, and a
    // repartitioned input gives identical rows (deterministic planes +
    // total order)
    val shallow = Similarity.rpTopK(emb, q, k = 5, dim = 64, rpDim = 16, shortlist = 16)
    val rows = shallow.collect()
    assert(rows.length === 4 * 5)
    val exactAll = Similarity.bruteForceTopK(emb, q, Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    rows.foreach { r =>
      assert(r.getDouble(3) === exactAll((r.getLong(0), r.getLong(2))), s"not an exact score: $r")
    }
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.map(_.getLong(1)).sorted.toSeq === (1L to 5L))
    }
    val re = Similarity.rpTopK(emb.repartition(7), q, k = 5, dim = 64, rpDim = 16, shortlist = 16)
      .collect().map(_.toSeq).toSet
    assert(re === rows.map(_.toSeq).toSet)
  }

  test("pqTopK: corpus-wide rerank == exact brute force; shallow rerank ranks exactly; partition-invariant") {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < 4)
    val n = emb.count().toInt
    // rerank = corpus: the ADC stage cannot drop a true neighbor, so the
    // exact-rerank output must equal brute force row-for-row
    val full = Similarity.pqTopK(emb, q, k = 5, dim = 64, rerank = n)
      .collect().map(_.toSeq).toSet
    val exact = Similarity.bruteForceTopKAgg(emb, q, k = 5)
      .collect().map(_.toSeq).toSet
    assert(full === exact)
    // shallow rerank: every returned cosine is an EXACT cosine (stage 2
    // re-scores full-width), ranks are dense 1..5 per query, and a
    // repartitioned input gives identical rows (deterministic id-ordered
    // seeds, exact Lloyd sums, total-order ranking)
    val shallow = Similarity.pqTopK(emb, q, k = 5, dim = 64, rerank = 16)
    val rows = shallow.collect()
    assert(rows.length === 4 * 5)
    val exactAll = Similarity.bruteForceTopK(emb, q, Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    rows.foreach { r =>
      assert(r.getDouble(3) === exactAll((r.getLong(0), r.getLong(2))), s"not an exact score: $r")
    }
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.map(_.getLong(1)).sorted.toSeq === (1L to 5L))
    }
    val re = Similarity.pqTopK(emb.repartition(7), q, k = 5, dim = 64, rerank = 16)
      .collect().map(_.toSeq).toSet
    assert(re === rows.map(_.toSeq).toSet)
  }

  test("ivfPqTopK: full probe == pqTopK; shallow probe reranks exactly; partition-invariant") {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < 4)
    // nProbe = nCentroids: every cell is probed, so the ADC candidate set
    // (and the shortlist, and the rerank) is exactly pqTopK's — the
    // raw-vector sub-codebooks make codes cell-independent by construction
    val fullProbe = Similarity.ivfPqTopK(emb, q, k = 5, dim = 64,
      nCentroids = 8, nProbe = 8, rerank = 16)
      .collect().map(_.toSeq).toSet
    val pq = Similarity.pqTopK(emb, q, k = 5, dim = 64, rerank = 16)
      .collect().map(_.toSeq).toSet
    assert(fullProbe === pq)
    // shallow probe: every returned cosine is an EXACT cosine (stage 2
    // re-scores full-width), ranks are dense 1..5 per query
    val shallow = Similarity.ivfPqTopK(emb, q, k = 5, dim = 64,
      nCentroids = 8, nProbe = 3, rerank = 16)
    val rows = shallow.collect()
    assert(rows.length === 4 * 5)
    val exactAll = Similarity.bruteForceTopK(emb, q, Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    rows.foreach { r =>
      assert(r.getDouble(3) === exactAll((r.getLong(0), r.getLong(2))), s"not an exact score: $r")
    }
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.map(_.getLong(1)).sorted.toSeq === (1L to 5L))
    }
    // deterministic: id-ordered seeds + exact Lloyd sums both quantizers,
    // total-order ranking — a repartitioned corpus gives identical rows
    val re = Similarity.ivfPqTopK(emb.repartition(7), q, k = 5, dim = 64,
      nCentroids = 8, nProbe = 3, rerank = 16)
      .collect().map(_.toSeq).toSet
    assert(re === rows.map(_.toSeq).toSet)
    // the inverted file prunes candidates: the probed ADC scan scores a
    // strict subset of full probe's pairs — and never via a cartesian
    assert(!shallow.queryExecution.executedPlan.toString.contains("CartesianProduct"))
  }

  test("semanticDedup: same-cell near-dups collapse to the min id; distinct vectors keep") {
    val s = spark; import s.implicits._
    // two tight groups far apart: ids 0-2 identical-ish (cosine ~1),
    // ids 3-4 a second duplicate pair, id 5 orthogonal to its cellmates
    val pts = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.01f, 0.0f)),
      (3L, Array(0.0f, 5.0f, 5.0f)), (4L, Array(0.0f, 5.0f, 5.0f)),
      (5L, Array(0.0f, -5.0f, 5.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(pts, k = 2, iters = 1, dim = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byId = out.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byId(0L) === ((0L, true)))
    assert(byId(1L) === ((0L, false)))
    assert(byId(2L) === ((0L, false)))
    assert(byId(3L)._1 === byId(4L)._1)
    assert(byId(3L) === ((3L, true)) && byId(4L) === ((3L, false)))
    // orthogonal to everything above threshold: its own singleton cluster
    assert(byId(5L) === ((5L, true)))
    // exactly one keeper per cluster
    val keepers = out.filter(_._3).map(_._2).toSet
    assert(keepers === out.map(_._2).toSet)
  }

  test("cosineNearDup emits only within-bucket pairs above threshold, no cartesian") {
    val emb = Tables.embeddings(spark, dir)
    val out = Similarity.cosineNearDup(emb, threshold = 0.0, dim = 64, nPlanes = 6)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"all-pairs join:\n$plan")
    out.collect().foreach(r => assert(r.getDouble(2) >= 0.0))
  }

  test("cosineNearDupAgainstBaseline == full cosineNearDup restricted to cross-side pairs") {
    val s = spark
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(s, dir)
    val split = 30L
    val cross = Similarity.cosineNearDupAgainstBaseline(
        emb.filter(col("vec_id") >= split), emb.filter(col("vec_id") < split),
        threshold = 0.1, dim = 64, nPlanes = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    cross.foreach { case (in, bas, _) => assert(in >= split && bas < split) }
    // same planes both sides → identical buckets → exactly the straddling
    // subset of the self-join (which orders id_a < id_b = (baseline, inc))
    val full = Similarity.cosineNearDup(emb, threshold = 0.1, dim = 64, nPlanes = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => a < split && b >= split }
      .map { case (a, b, c) => (b, a, c) }.toSet
    assert(cross === full)
    assert(cross.nonEmpty, "fixture must produce straddling pairs")
  }

  test("dirty corpus: zero-norm / NaN / wrong-length vectors drop out instead of crashing") {
    val s = spark; import s.implicits._
    // four clean vectors + the three malformed shapes a 100 TB crawl
    // actually ships: an all-zero (failed/padded) embedding, a NaN
    // element, a wrong-length vector. Under Spark 4's default ANSI mode
    // the zero norm used to throw DIVIDE_BY_ZERO; the NaN cosine broke
    // TopKAgg's comparator totality; both now yield null and are
    // EXCLUDED — by the agg path and the window path identically.
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)), (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)), (3L, Array(0.1f, 0.9f, 0.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 0.0f, 0.0f)),           // zero norm
      (5L, Array(Float.NaN, 1.0f, 0.0f, 0.0f)),      // NaN element
      (6L, Array(1.0f, 0.0f)))                        // wrong length
      .toDF("vec_id", "embedding")
    val q = corpus.filter(col("vec_id") === 0L)
    val agg = Similarity.bruteForceTopKAgg(corpus, q, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sorted.toSeq
    val win = Similarity.bruteForceTopK(corpus, q, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sorted.toSeq
    assert(agg == win, "agg and window formulations must stay identical on dirty input")
    val neighbors = agg.map(_._3).toSet
    assert(!neighbors.contains(4L) && !neighbors.contains(5L),
      s"malformed vectors fabricated neighbors: $neighbors")
    assert(neighbors.contains(1L), "the true nearest neighbor survived")
    // a zero-norm QUERY returns no rows rather than crashing
    assert(Similarity.bruteForceTopKAgg(corpus, corpus.filter(col("vec_id") === 4L), 3)
      .count() == 0L)
    // the malformed rows must not kill the kmeans index build either
    val cb = Similarity.kmeansCodebook(corpus, k = 2, iters = 1)
    assert(cb.size == 2 && cb.forall(_.forall(v => !v.isNaN && !v.isInfinite)))
  }
}
