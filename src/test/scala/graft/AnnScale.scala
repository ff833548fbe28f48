package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Measurement harness for the ANN family's recall/cost trade (dev
  * tool, test scope): SCALE.md names `rerank`/`nProbe`/`rpDim` as "the
  * recall knob" — this measures recall@10 and wall for every
  * approximate index against exact brute force on the sf0.1 embeddings,
  * at the GRADED defaults and one deeper setting each, so the
  * trade-offs are numbers. Run with `sbt "Test/runMain graft.AnnScale"`;
  * paste the table into SCALE.md.
  */
object AnnScale {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = GraftSession.local("ann-scale")
    val dim = 64
    val k = 10
    val corpus = graft.util.Caching.ensurePersisted(
      sources.Tables.embeddings(spark, dir))
    val queries = corpus.filter(col("vec_id") < 32)
    println(s"corpus: ${corpus.count()} vectors, ${queries.count()} queries, k=$k ($dir)")

    def pairs(df: DataFrame): Set[(Long, Long)] = df
      .select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val truth = pairs(Similarity.bruteForceTopK(corpus, queries, k))
    println(f"${"method"}%-26s ${"recall@10"}%10s ${"wall_s"}%8s")
    def row(name: String)(f: => DataFrame): Unit = {
      SparkEntry.releaseSharedCaches()
      val t0 = System.nanoTime()
      val got = pairs(f)
      val wall = (System.nanoTime() - t0) / 1e9
      val recall = (got & truth).size.toDouble / truth.size
      println(f"$name%-26s $recall%10.3f $wall%8.2f")
    }
    row("brute_force (exact)")(Similarity.bruteForceTopK(corpus, queries, k))
    row("lsh nPlanes=8 multiprobe")(Similarity.lshTopK(corpus, queries, k, dim))
    row("lsh nPlanes=8 exact-bkt")(
      Similarity.lshTopK(corpus, queries, k, dim, multiProbe = false))
    row("ivf 16c probe=4 (graded)")(Similarity.ivfTopK(corpus, queries, k, dim))
    row("ivf 16c probe=8")(Similarity.ivfTopK(corpus, queries, k, dim, nProbe = 8))
    row("rp rpDim=16 sl=32 (grd)")(Similarity.rpTopK(corpus, queries, k, dim))
    row("rp rpDim=16 sl=128")(
      Similarity.rpTopK(corpus, queries, k, dim, shortlist = 128))
    row("quant rerank=32 (graded)")(Similarity.quantizedTopK(corpus, queries, k, rerank = 32))
    row("quant rerank=128")(Similarity.quantizedTopK(corpus, queries, k, rerank = 128))
    spark.stop()
  }
}
