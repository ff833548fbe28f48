package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *   - `bruteForceTopK` is the exact baseline: broadcast the (small) query
  *     set against the corpus — one scan of the corpus, no corpus shuffle,
  *     top-k per query via a window over queries×k rows. At 100 TB the
  *     corpus side streams; only queries×corpus similarity rows reach the
  *     shuffle, already pre-filtered per partition is future work (round 2:
  *     partial top-k via Aggregator before the window).
  *   - `lshTopK` is the scale path: random-hyperplane buckets on both sides;
  *     a query only scans its own bucket, turning the cross product into an
  *     equi join. Recall < 1 by construction (probe multiple buckets for
  *     higher recall — future `nProbes`).
  */
object Similarity {

  /** Exact cosine top-k neighbors for each query vector (excluding self). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = c.crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", VectorOps.cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
  }

  /** LSH-bucketed ANN: candidates limited to the query's hyperplane bucket. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int, nPlanes: Int = 8,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucket = VectorOps.lshBucket(col(vecCol), dim, nPlanes)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"), bucket.as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"), bucket.as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", VectorOps.cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
  }

  /** Embedding-cosine near-duplicate pairs above `threshold` (exact over the
    * full pair space — use for corpora already blocked/bucketed; the LSH
    * variant is the scale path).
    */
  def cosineNearDup(vectors: DataFrame, threshold: Double,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val l = vectors.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val r = vectors.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    l.crossJoin(r)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", VectorOps.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }
}
