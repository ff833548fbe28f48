package graft

import graft.operators.Similarity
import graft.sources.Tables
import Queries.Q

/** Similarity-search query registrations over the `embeddings` table
  * (dim-64 float vectors). Oracles reproduce the engine's FP math with the
  * SAME accumulation order (list_reduce over a prepended 0.0 mirrors
  * `functions.aggregate`), so doubles are bit-identical, and all ranking is
  * on round(cosine, 6) with id tie-breaks.
  */
object VectorQueries {

  private val DIM = 64

  /** VectorOps.dot with left-to-right accumulation. */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, ${DIM + 1}), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (acc, x) -> acc + x)"

  /** VectorOps.norm2: acc + v*v per element, left to right. */
  private def norm2Sql(a: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform($a, x -> CAST(x AS DOUBLE))), (acc, v) -> acc + v * v)"

  private def cosineSql(a: String, b: String): String =
    s"round(${dotSql(a, b)} / (sqrt(${norm2Sql(a)}) * sqrt(${norm2Sql(b)})), 6)"

  /** VectorOps.lshBucket(v, DIM, nPlanes) as a SQL expression over col `v`. */
  private def bucketSql(v: String, nPlanes: Int): String = {
    val bits = (0 until nPlanes).map { p =>
      val coef = s"(CAST('0x' || substr(md5('${p}_' || (i - 1)), 1, 15) AS BIGINT) % 1000003) / 500001.5 - 1.0"
      val proj = s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, ${DIM + 1}), i -> CAST($v[i] AS DOUBLE) * ($coef))), (acc, x) -> acc + x)"
      s"CASE WHEN ($proj) >= 0 THEN CAST(${1L << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    }
    bits.mkString("(", " + ", ")")
  }

  // -- exact brute-force top-k (bounded-buffer aggregation) -------------
  private val bruteForce: Q = (s, d) =>
    Similarity.bruteForceTopKAgg(
      Tables.embeddings(s, d),
      Tables.embeddings(s, d).filter(org.apache.spark.sql.functions.col("vec_id") < 8),
      k = 5)

  private val bruteForceSql =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
       |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
       |sc AS (SELECT query_id, neighbor_id, ${cosineSql("qv", "cv")} AS cosine FROM c, q WHERE neighbor_id <> query_id),
       |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank FROM sc)
       |SELECT query_id, rank, neighbor_id, cosine FROM r WHERE rank <= 5""".stripMargin

  // -- LSH-bucketed top-k -------------------------------------------------
  private val lshTopK: Q = (s, d) =>
    Similarity.lshTopK(
      Tables.embeddings(s, d),
      Tables.embeddings(s, d).filter(org.apache.spark.sql.functions.col("vec_id") < 8),
      k = 5, dim = DIM, nPlanes = 8)

  private val lshTopKSql = {
    val probeList = (s"b0" +: (0 until 8).map(p => s"xor(b0, CAST(${1L << p} AS BIGINT))")).mkString("[", ", ", "]")
    s"""WITH e AS (SELECT vec_id, embedding AS v, ${bucketSql("embedding", 8)} AS bucket FROM embeddings),
       |q AS (SELECT query_id, qv, unnest($probeList) AS bucket
       |      FROM (SELECT vec_id AS query_id, v AS qv, bucket AS b0 FROM e WHERE vec_id < 8)),
       |c AS (SELECT vec_id AS neighbor_id, v AS cv, bucket FROM e),
       |sc AS (SELECT query_id, neighbor_id, ${cosineSql("qv", "cv")} AS cosine
       |       FROM c JOIN q USING (bucket) WHERE neighbor_id <> query_id),
       |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank FROM sc)
       |SELECT query_id, rank, neighbor_id, cosine FROM r WHERE rank <= 5""".stripMargin
  }

  // -- IVF-partitioned top-k -----------------------------------------------
  private val ivfTopK: Q = (s, d) =>
    Similarity.ivfTopK(
      Tables.embeddings(s, d),
      Tables.embeddings(s, d).filter(org.apache.spark.sql.functions.col("vec_id") < 8),
      k = 5, dim = DIM, nCentroids = 16, nProbe = 4)

  private val ivfTopKSql = {
    val d2 = s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, ${DIM + 1}), i -> (CAST(v[i] AS DOUBLE) - CAST(cv[i] AS DOUBLE)) * (CAST(v[i] AS DOUBLE) - CAST(cv[i] AS DOUBLE)))), (acc, x) -> acc + x)"
    s"""WITH cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS cv
       |              FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
       |e AS (SELECT vec_id, embedding AS v FROM embeddings),
       |dists AS (SELECT e.vec_id, cent.cell, $d2 AS dist FROM e, cent),
       |assign AS (SELECT vec_id, cell FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn FROM dists) WHERE rn = 1),
       |qprobe AS (SELECT vec_id AS query_id, cell FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn FROM dists WHERE vec_id < 8) WHERE rn <= 4),
       |c AS (SELECT e.vec_id AS neighbor_id, e.v AS cv2, a.cell FROM e JOIN assign a ON e.vec_id = a.vec_id),
       |q AS (SELECT qp.query_id, qp.cell, e2.v AS qv FROM qprobe qp JOIN e e2 ON qp.query_id = e2.vec_id),
       |sc AS (SELECT query_id, neighbor_id, ${cosineSql("qv", "cv2")} AS cosine
       |       FROM c JOIN q USING (cell) WHERE neighbor_id <> query_id),
       |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank FROM sc)
       |SELECT query_id, rank, neighbor_id, cosine FROM r WHERE rank <= 5""".stripMargin
  }

  // -- LSH-bucketed near-dup pairs -----------------------------------------
  private val nearDup: Q = (s, d) =>
    Similarity.cosineNearDup(Tables.embeddings(s, d), threshold = 0.2, dim = DIM, nPlanes = 8)

  private val nearDupSql =
    s"""WITH e AS (SELECT vec_id, embedding AS v, ${bucketSql("embedding", 8)} AS bucket FROM embeddings),
       |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, ${cosineSql("a.v", "b.v")} AS cosine
       |      FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT id_a, id_b, cosine FROM p WHERE cosine >= 0.2""".stripMargin

  /** Incremental cosine near-dup: incoming half (vec_id >= 250) vs
    * baseline half only (Similarity.cosineNearDupAgainstBaseline).
    */
  private val incrementalCosine: Q = (s, d) => {
    import org.apache.spark.sql.functions.col
    val all = Tables.embeddings(s, d)
    Similarity.cosineNearDupAgainstBaseline(
      all.filter(col("vec_id") >= 250), all.filter(col("vec_id") < 250),
      threshold = 0.2, dim = DIM, nPlanes = 8)
  }

  private val incrementalCosineSql =
    s"""WITH e AS (SELECT vec_id, embedding AS v, ${bucketSql("embedding", 8)} AS bucket FROM embeddings),
       |p AS (SELECT a.vec_id AS id_in, b.vec_id AS id_bas, ${cosineSql("a.v", "b.v")} AS cosine
       |      FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id >= 250 AND b.vec_id < 250)
       |SELECT id_in, id_bas, cosine FROM p WHERE cosine >= 0.2""".stripMargin

  // -- Lloyd's k-means codebook refinement + assignment ---------------------
  private val kmeans: Q = (s, d) =>
    Similarity.kmeansAssign(Tables.embeddings(s, d), k = 8, iters = 1, dim = DIM)

  /** One unrolled Lloyd round as a CTE chain (`e` … `fin`): seed (the k
    * lowest-id vectors) → assign → exact micro-quantized means (empty
    * cells keep their seed via the LEFT JOIN coalesce) → final
    * assignment with (dist, cell) tie-break. Distance folds replay the
    * engine's left-to-right accumulation. Shared by the kmeans_assign
    * and semantic_dedup oracles (parameterized by k).
    */
  private def kmeansCtes(k: Int): String = {
    def d2(v: String, cv: String): String =
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, ${DIM + 1}), i -> (CAST($v[i] AS DOUBLE) - CAST($cv[i] AS DOUBLE)) * (CAST($v[i] AS DOUBLE) - CAST($cv[i] AS DOUBLE)))), (acc, x) -> acc + x)"
    s"""e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |cent0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
       |          FROM (SELECT * FROM e ORDER BY vec_id LIMIT $k)),
       |d0 AS (SELECT e.vec_id, cent0.cell, ${d2("e.v", "cent0.cv")} AS dist FROM e, cent0),
       |a0 AS (SELECT vec_id, cell FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn FROM d0) WHERE rn = 1),
       |sums AS (SELECT a0.cell, dd.dim, sum(CAST(round(e.v[dd.dim + 1] * 1000000) AS BIGINT)) AS sq, count(*) AS n
       |         FROM e JOIN a0 USING (vec_id) CROSS JOIN (SELECT unnest(range(0, $DIM)) AS dim) dd
       |         GROUP BY 1, 2),
       |cent1 AS (SELECT c0.cell, list(coalesce(round(s.sq / s.n / 1000000.0, 6), c0.cv[dd.dim + 1]) ORDER BY dd.dim) AS cv
       |          FROM cent0 c0 CROSS JOIN (SELECT unnest(range(0, $DIM)) AS dim) dd
       |          LEFT JOIN sums s ON s.cell = c0.cell AND s.dim = dd.dim
       |          GROUP BY c0.cell),
       |d1 AS (SELECT e.vec_id, c.cell, ${d2("e.v", "c.cv")} AS dist FROM e, cent1 c),
       |fin AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn FROM d1)""".stripMargin
  }

  private val kmeansSql =
    s"""WITH ${kmeansCtes(8)}
       |SELECT vec_id, CAST(cell AS BIGINT) AS cell, round(dist, 6) AS dist2 FROM fin WHERE rn = 1""".stripMargin

  // -- quantized-scan ANN (int8 codes + exact rerank) ----------------------
  private val quantizedTopK: Q = (s, d) =>
    Similarity.quantizedTopK(
      Tables.embeddings(s, d),
      Tables.embeddings(s, d).filter(org.apache.spark.sql.functions.col("vec_id") < 8),
      k = 5, rerank = 32)

  /** Mirrors both stages: dequantized approx scores (codes built with the
    * UNROUNDED bounds, dequantized with the ROUNDED emitted bounds —
    * exactly what a consumer of the stored codes has) → 32-deep
    * shortlist → exact cosine rerank to top-5.
    */
  private val quantizedTopKSql =
    s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |mm AS (SELECT vec_id, v, list_min(v) AS lo, list_max(v) AS hi FROM v),
       |q8 AS (SELECT vec_id, round(lo, 6) AS rlo, round(hi, 6) AS rhi,
       |         list_transform(v, x -> CASE WHEN hi = lo THEN CAST(0 AS BIGINT)
       |           ELSE CAST(round((x - lo) * CAST(255.0 AS DOUBLE) / (hi - lo)) AS BIGINT) END) AS codes
       |       FROM mm),
       |dq AS (SELECT vec_id, rlo, rhi, (rhi - rlo) / CAST(255.0 AS DOUBLE) AS sc, codes FROM q8),
       |dv AS (SELECT vec_id, list_transform(codes, c -> rlo + c * sc) AS dv FROM dq),
       |qd AS (SELECT vec_id AS query_id, dv AS qdv FROM dv WHERE vec_id < 8),
       |ap AS (SELECT query_id, c.vec_id AS neighbor_id, ${cosineSql("qdv", "c.dv")} AS ac
       |       FROM dv c, qd WHERE c.vec_id <> query_id),
       |sl AS (SELECT query_id, neighbor_id FROM
       |         (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY ac DESC, neighbor_id) AS rn FROM ap)
       |       WHERE rn <= 32),
       |ex AS (SELECT sl.query_id, sl.neighbor_id, ${cosineSql("qv.v", "cv.v")} AS cosine
       |       FROM sl JOIN v qv ON qv.vec_id = sl.query_id JOIN v cv ON cv.vec_id = sl.neighbor_id),
       |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank FROM ex)
       |SELECT query_id, rank, neighbor_id, cosine FROM r WHERE rank <= 5""".stripMargin

  // -- product-quantized ANN (ADC over sub-codebooks + exact rerank) --------
  private val pqTopK: Q = (s, d) =>
    Similarity.pqTopK(
      Tables.embeddings(s, d),
      Tables.embeddings(s, d).filter(org.apache.spark.sql.functions.col("vec_id") < 8),
      k = 5, dim = DIM, m = 4, ksub = 8, iters = 1, rerank = 32)

  /** The PQ-ADC CTE chain shared by the pq_topk and ivfpq_topk oracles
    * (`ev` → `apx` → `nrm`): per-subspace Lloyd round (the kmeansCtes
    * recipe on each quarter slice), nearest-sub-cell encode, per-(query,
    * neighbor, subspace) exact sub-dot partials summed in subspace order
    * (list_reduce over a j-ordered list replays the engine's zip_with +
    * aggregate fold), stored norms. Queries = vec_id < 8; m=4, ksub=8,
    * one Lloyd round — the graded knobs of both rows.
    */
  private lazy val pqAdcCtes: String = {
    val m = 4
    val ksub = 8
    val dsub = DIM / m
    def d2sub(v: String, cv: String): String =
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, ${dsub + 1}), i -> (CAST($v[i] AS DOUBLE) - CAST($cv[i] AS DOUBLE)) * (CAST($v[i] AS DOUBLE) - CAST($cv[i] AS DOUBLE)))), (acc, x) -> acc + x)"
    def dotsub(a: String, b: String): String =
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, ${dsub + 1}), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (acc, x) -> acc + x)"
    val subs = (0 until m).map { j =>
      val o = j * dsub
      s"""e$j AS (SELECT vec_id, v[${o + 1}:${o + dsub}] AS sv FROM ev),
         |c0$j AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, sv AS cv
         |        FROM (SELECT * FROM e$j ORDER BY vec_id LIMIT $ksub)),
         |d0$j AS (SELECT e$j.vec_id, c0$j.cell, ${d2sub(s"e$j.sv", s"c0$j.cv")} AS dist FROM e$j, c0$j),
         |a0$j AS (SELECT vec_id, cell FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn FROM d0$j) WHERE rn = 1),
         |sm$j AS (SELECT a0$j.cell, dd.dim, sum(CAST(round(e$j.sv[dd.dim + 1] * 1000000) AS BIGINT)) AS sq, count(*) AS n
         |        FROM e$j JOIN a0$j USING (vec_id) CROSS JOIN (SELECT unnest(range(0, $dsub)) AS dim) dd
         |        GROUP BY 1, 2),
         |c1$j AS (SELECT c0.cell, list(coalesce(round(s.sq / s.n / 1000000.0, 6), c0.cv[dd.dim + 1]) ORDER BY dd.dim) AS cv
         |        FROM c0$j c0 CROSS JOIN (SELECT unnest(range(0, $dsub)) AS dim) dd
         |        LEFT JOIN sm$j s ON s.cell = c0.cell AND s.dim = dd.dim
         |        GROUP BY c0.cell),
         |d1$j AS (SELECT e$j.vec_id, c.cell, ${d2sub(s"e$j.sv", "c.cv")} AS dist FROM e$j, c1$j c),
         |enc$j AS (SELECT vec_id, cell FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn FROM d1$j) WHERE rn = 1),
         |pj$j AS (SELECT qe.vec_id AS query_id, enc$j.vec_id AS neighbor_id, ${dotsub("qe.sv", "c.cv")} AS part
         |        FROM enc$j JOIN c1$j c USING (cell)
         |        CROSS JOIN (SELECT vec_id, sv FROM e$j WHERE vec_id < 8) qe)""".stripMargin
    }.mkString(",\n")
    val parts = (0 until m)
      .map(j => s"SELECT query_id, neighbor_id, $j AS j, part FROM pj$j")
      .mkString("\n       UNION ALL ")
    s"""ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |$subs,
       |parts AS ($parts),
       |apx AS (SELECT query_id, neighbor_id,
       |          list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(part ORDER BY j)), (acc, x) -> acc + x) AS adot
       |        FROM parts GROUP BY 1, 2),
       |nrm AS (SELECT vec_id, sqrt(${norm2Sql("v")}) AS nm FROM ev)""".stripMargin
  }

  /** The shared shortlist-then-exact tail over an `ap(query_id,
    * neighbor_id, ac)` approx-score CTE: 32-deep shortlist on (ac desc,
    * id), exact cosine rerank to top-5 — both rankings with id
    * tie-breaks, reading full vectors from `ev` only for the shortlist.
    */
  private lazy val pqRerankTail: String =
    s"""sl AS (SELECT query_id, neighbor_id FROM
       |         (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY ac DESC, neighbor_id) AS rn FROM ap)
       |       WHERE rn <= 32),
       |ex AS (SELECT sl.query_id, sl.neighbor_id, ${cosineSql("qv.v", "cv.v")} AS cosine
       |       FROM sl JOIN ev qv ON qv.vec_id = sl.query_id JOIN ev cv ON cv.vec_id = sl.neighbor_id),
       |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank FROM ex)
       |SELECT query_id, rank, neighbor_id, cosine FROM r WHERE rank <= 5""".stripMargin

  /** Mirrors the whole PQ path: [[pqAdcCtes]] machinery, approx cosine
    * over stored norms, then [[pqRerankTail]].
    */
  private lazy val pqTopKSql =
    s"""WITH $pqAdcCtes,
       |ap AS (SELECT a.query_id, a.neighbor_id, round(a.adot / (qn.nm * cn.nm), 6) AS ac
       |       FROM apx a JOIN nrm qn ON qn.vec_id = a.query_id JOIN nrm cn ON cn.vec_id = a.neighbor_id
       |       WHERE a.neighbor_id <> a.query_id),
       |$pqRerankTail""".stripMargin

  // -- IVF-PQ ANN (coarse cells bound the ADC scan) --------------------------
  private val ivfPqTopK: Q = (s, d) =>
    Similarity.ivfPqTopK(
      Tables.embeddings(s, d),
      Tables.embeddings(s, d).filter(org.apache.spark.sql.functions.col("vec_id") < 8),
      k = 5, dim = DIM, nCentroids = 16, nProbe = 4, m = 4, ksub = 8,
      iters = 1, rerank = 32)

  /** Mirrors the IVFADC composition: the kmeans CTE chain (k=16, one Lloyd
    * round — the coarse quantizer) assigns every vector a cell (`fin`
    * rn=1) and gives each query its 4 nearest cells (`fin` rn<=4, the
    * NearestCellsExpr (dist, cell) order); `cand` is the inverted-file
    * restriction — (query, neighbor) pairs whose cell is probed; the
    * [[pqAdcCtes]] machinery scores exactly those pairs, then
    * [[pqRerankTail]]. Full-probe (rn <= 16) would reduce `cand` to all
    * pairs and this query to the pq_topk oracle — the identity the engine
    * spec asserts.
    */
  private lazy val ivfPqTopKSql =
    s"""WITH ${kmeansCtes(16)},
       |asg AS (SELECT vec_id, cell FROM fin WHERE rn = 1),
       |qprobe AS (SELECT vec_id AS query_id, cell FROM fin WHERE vec_id < 8 AND rn <= 4),
       |cand AS (SELECT qp.query_id, a.vec_id AS neighbor_id
       |         FROM qprobe qp JOIN asg a USING (cell) WHERE a.vec_id <> qp.query_id),
       |$pqAdcCtes,
       |ap AS (SELECT a.query_id, a.neighbor_id, round(a.adot / (qn.nm * cn.nm), 6) AS ac
       |       FROM apx a JOIN cand USING (query_id, neighbor_id)
       |       JOIN nrm qn ON qn.vec_id = a.query_id JOIN nrm cn ON cn.vec_id = a.neighbor_id),
       |$pqRerankTail""".stripMargin

  // -- random-projection ANN (JL shortlist + exact rerank) -----------------
  private val rpTopK: Q = (s, d) =>
    Similarity.rpTopK(
      Tables.embeddings(s, d),
      Tables.embeddings(s, d).filter(org.apache.spark.sql.functions.col("vec_id") < 8),
      k = 5, dim = DIM, rpDim = 16, shortlist = 32)

  /** VectorOps.randomProject as a SQL list literal: component j is the dot
    * product with the md5("rp_j_d") plane, folded in dimension order.
    */
  private def rpSql(v: String, rpDim: Int): String =
    (0 until rpDim).map { j =>
      val coef = s"(CAST('0x' || substr(md5('rp_${j}_' || (i - 1)), 1, 15) AS BIGINT) % 1000003) / 500001.5 - 1.0"
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, ${DIM + 1}), i -> CAST($v[i] AS DOUBLE) * ($coef))), (acc, x) -> acc + x)"
    }.mkString("[", ", ", "]")

  /** Mirrors both stages: projected cosines (16-dim dot/norm folds replay
    * the engine's left-to-right accumulation over DOUBLE components) →
    * 32-deep shortlist on (approx desc, id) → exact cosine rerank to
    * top-5 — the quantized_topk oracle pattern with a JL shortlist.
    */
  private val rpTopKSql = {
    def dot16(a: String, b: String): String =
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 17), i -> $a[i] * $b[i])), (acc, x) -> acc + x)"
    def n16(a: String): String =
      s"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform($a, x -> x)), (acc, v) -> acc + v * v))"
    s"""WITH e AS (SELECT vec_id, embedding AS v, ${rpSql("embedding", 16)} AS rv FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv, rv AS qrv FROM e WHERE vec_id < 8),
       |ap AS (SELECT query_id, c.vec_id AS neighbor_id,
       |         round(${dot16("qrv", "c.rv")} / (${n16("qrv")} * ${n16("c.rv")}), 6) AS ac
       |       FROM e c, q WHERE c.vec_id <> query_id),
       |sl AS (SELECT query_id, neighbor_id FROM
       |         (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY ac DESC, neighbor_id) AS rn FROM ap)
       |       WHERE rn <= 32),
       |ex AS (SELECT sl.query_id, sl.neighbor_id, ${cosineSql("qv.v", "cv.v")} AS cosine
       |       FROM sl JOIN e qv ON qv.vec_id = sl.query_id
       |       JOIN e cv ON cv.vec_id = sl.neighbor_id),
       |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank FROM ex)
       |SELECT query_id, rank, neighbor_id, cosine FROM r WHERE rank <= 5""".stripMargin
  }

  // -- SemDeDup-style semantic dedup ---------------------------------------
  private val semantic: Q = (s, d) =>
    Similarity.semanticDedup(Tables.embeddings(s, d), k = 16, iters = 1,
      dim = DIM, threshold = 0.2)

  /** k-means cells (k=16, one Lloyd round — the same CTE chain as the
    * kmeans oracle), within-cell cosine pairs at ≥ 0.2, then recursive
    * min-reachable clustering (the cluster_dedup oracle pattern).
    */
  private val semanticSql =
    s"""WITH RECURSIVE ${kmeansCtes(16)},
       |asg AS (SELECT vec_id, cell FROM fin WHERE rn = 1),
       |p AS (SELECT aa.vec_id AS id_a, bb.vec_id AS id_b, ${cosineSql("va.v", "vb.v")} AS cosine
       |      FROM asg aa JOIN asg bb ON aa.cell = bb.cell AND aa.vec_id < bb.vec_id
       |      JOIN e va ON va.vec_id = aa.vec_id
       |      JOIN e vb ON vb.vec_id = bb.vec_id),
       |pr AS (SELECT id_a, id_b FROM p WHERE cosine >= CAST(0.2 AS DOUBLE)),
       |eg AS (SELECT id_a AS src, id_b AS dst FROM pr UNION SELECT id_b, id_a FROM pr),
       |r(id, m) AS (
       |  SELECT vec_id, vec_id FROM embeddings
       |  UNION
       |  SELECT eg.src, r.m FROM eg JOIN r ON eg.dst = r.id)
       |SELECT id AS vec_id, min(m) AS cluster_id, id = min(m) AS keep FROM r GROUP BY id""".stripMargin

  // -- mean-pooled class centroids -----------------------------------------
  private val centroids: Q = (s, d) =>
    Similarity.classCentroids(Tables.embeddings(s, d))

  private val centroidsSql =
    s"""WITH x AS (SELECT label, d.dim AS dim,
       |  CAST(round(CAST(embedding[d.dim + 1] AS DOUBLE) * 1000000) AS BIGINT) AS q
       |  FROM embeddings, (SELECT unnest(range(0, $DIM)) AS dim) d)
       |SELECT label, CAST(dim AS BIGINT) AS dim, count(*) AS n,
       |  round(sum(q) / count(*) / 1000000.0, 6) AS centroid
       |FROM x GROUP BY 1, 2""".stripMargin

  // -- int8 affine quantization (embedding storage path) -----------------
  // The operator API returns `codes` as array<long> (the shape real
  // consumers want); the GRADED projection flattens it to a comma-joined
  // string because the driver's pandas row sort cannot canonicalize an
  // array cell (r7: `TypeError: unhashable type: 'numpy.ndarray'`). No
  // registered query may emit an array/struct/map column — see
  // tools/oracle_check.py's lint and OutputShapeSpec.
  private val quantize: Q = (s, d) =>
    Similarity.quantizeInt8(Tables.embeddings(s, d))
      .withColumn("codes", org.apache.spark.sql.functions.array_join(
        org.apache.spark.sql.functions.col("codes").cast("array<string>"), ","))

  private val quantizeSql =
    """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |mm AS (SELECT vec_id, v, list_min(v) AS lo, list_max(v) AS hi FROM v)
      |SELECT vec_id, round(lo, 6) AS lo, round(hi, 6) AS hi,
      |  array_to_string(list_transform(v, x -> CASE WHEN hi = lo THEN CAST(0 AS BIGINT)
      |    ELSE CAST(round((x - lo) * CAST(255.0 AS DOUBLE) / (hi - lo)) AS BIGINT) END), ',') AS codes
      |FROM mm""".stripMargin

  // -- semantic benchmark decontamination -----------------------------------
  /** Benchmark = every 41st vector (≈12 rows at sf0.01) — tiny relative to
    * the corpus, the real shape of an eval set. Benchmark vectors are a
    * subset of the corpus, so each flags itself at cosine 1.0 — exactly
    * what decontamination should do to verbatim leakage.
    */
  private val semanticDecon: Q = (s, d) => {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val all = Tables.embeddings(s, d)
    Similarity.semanticDecontaminate(
      all, all.filter(pmod(col("vec_id"), lit(41L)) === 0L), threshold = 0.2)
  }

  private val semanticDeconSql =
    s"""WITH b AS (SELECT vec_id AS bench_id, embedding AS bv FROM embeddings WHERE vec_id % 41 = 0),
       |c AS (SELECT vec_id, embedding AS cv FROM embeddings),
       |sc AS (SELECT vec_id, bench_id, ${cosineSql("cv", "bv")} AS cosine FROM c, b),
       |ag AS (SELECT vec_id,
       |         CAST(count(*) FILTER (WHERE cosine >= 0.2) AS BIGINT) AS n_hits,
       |         max(cosine) AS max_cosine FROM sc GROUP BY 1),
       |nn AS (SELECT vec_id, bench_id AS nearest_id FROM
       |        (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, bench_id) AS rn
       |         FROM sc) WHERE rn = 1)
       |SELECT e.vec_id, coalesce(ag.n_hits, 0) AS n_hits, ag.max_cosine, nn.nearest_id,
       |  coalesce(ag.max_cosine >= 0.2, FALSE) AS contaminated
       |FROM (SELECT vec_id FROM embeddings) e
       |LEFT JOIN ag USING (vec_id) LEFT JOIN nn USING (vec_id)""".stripMargin

  val registry: Vector[(String, Q, Option[String])] = Vector(
    ("brute_force_topk", bruteForce, Some(bruteForceSql)),
    ("semantic_decon", semanticDecon, Some(semanticDeconSql)),
    ("quantize_int8", quantize, Some(quantizeSql)),
    ("lsh_topk", lshTopK, Some(lshTopKSql)),
    ("ivf_topk", ivfTopK, Some(ivfTopKSql)),
    ("kmeans_assign", kmeans, Some(kmeansSql)),
    ("cosine_near_dup", nearDup, Some(nearDupSql)),
    ("incremental_cosine", incrementalCosine, Some(incrementalCosineSql)),
    ("semantic_dedup", semantic, Some(semanticSql)),
    ("quantized_topk", quantizedTopK, Some(quantizedTopKSql)),
    ("pq_topk", pqTopK, Some(pqTopKSql)),
    ("ivfpq_topk", ivfPqTopK, Some(ivfPqTopKSql)),
    ("rp_topk", rpTopK, Some(rpTopKSql)),
    ("class_centroids", centroids, Some(centroidsSql)),
  )
}
