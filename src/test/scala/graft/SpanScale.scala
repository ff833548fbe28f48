package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Measurement harness for the span family at PRODUCTION thresholds
  * (dev tool, test scope): SCALE.md's claim that the published
  * exact-substring threshold n ≈ 50 shrinks match volume by orders of
  * magnitude — and that the occurrence cap bounds the hot-gram blowup —
  * was a stated posture; this measures it. Run with
  * `sbt "Test/runMain graft.SpanScale"`; paste the table into SCALE.md.
  *
  * Corpus: sf0.1 documents glued into ~4× longer documents (so m ≫ 50
  * and the gram-stream size is genuinely ~m per doc at BOTH n), then made
  * boilerplate-heavy the way web corpora are: every 2nd long doc appends
  * one of 12 rotating 64-token passages (~52 copies each — under the
  * default cap), and every 12th long doc also appends one global 64-token
  * banner (~104 copies — over the 64 cap, under 256). So maxOcc 64 vs 256
  * decides whether the banner pairs quadratically, and n=8 vs n=50
  * decides how much of the natural short-run duplication pairs at all.
  */
object SpanScale {

  private def boilerplateCorpus(spark: SparkSession, dir: String): DataFrame = {
    val docs = sources.Tables.documents(spark, dir)
    // deterministic synthetic passages: 12 rotating + 1 banner, 64 tokens
    def passage(tag: String) = (0 until 64).map(j => s"bp${tag}w$j").mkString(" ")
    val rotating = array((0 until 12).map(i => lit(passage(s"r$i"))): _*)
    val glued = docs
      .groupBy((col("doc_id") / 4).cast("long").as("doc_id"))
      .agg(concat_ws(" ", array_sort(collect_list(struct(col("doc_id").as("i"), col("text"))))
        .getField("text")).as("text"))
    glued.withColumn("text", concat_ws(" ", col("text"),
        when(pmod(col("doc_id"), lit(2L)) === 0L,
          element_at(rotating, (pmod(col("doc_id"), lit(24L)) / 2 + 1).cast("int")))
          .otherwise(lit(""))))
      .withColumn("text", concat_ws(" ", col("text"),
        when(pmod(col("doc_id"), lit(12L)) === 0L, lit(passage("banner"))).otherwise(lit(""))))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = GraftSession.local("span-scale")
    val corpus = graft.util.Caching.ensurePersisted(boilerplateCorpus(spark, dir))
    val nDocs = corpus.count()
    val nTokens = corpus.select(sum(size(graft.functions.GraftFunctions.tokens(
      graft.functions.GraftFunctions.normalizeText(col("text")))))).head().getLong(0)
    println(s"corpus: $nDocs docs, $nTokens tokens ($dir)")
    // one untimed pass so the first table row doesn't carry JIT/codegen warm-up
    Dedup.duplicateSpans(corpus, n = 8, maxOcc = 64).count()
    SparkEntry.releaseSharedCaches()
    println(f"${"n"}%4s ${"maxOcc"}%7s ${"gramRows"}%12s ${"cappedRows"}%12s ${"matchRows"}%12s ${"spans"}%9s ${"wall_s"}%8s")
    for (n <- Seq(8, 50); maxOcc <- Seq(64, 256)) {
      SparkEntry.releaseSharedCaches()
      val base = Dedup.fullHashBase(corpus, "doc_id", "text")
      val grams = base
        .select(col("doc_id"), posexplode(Dedup.rolledGramHashes(col("__fh"), n, reduceInputs = true)))
        .withColumnRenamed("col", "g")
      val gramRows = grams.count()
      val capped = Dedup.capBuckets(grams, Seq("g"), maxOcc)
      val cappedRows = capped.count()
      val matchRows = capped.select(col("g"), col("doc_id").as("id_a"), col("pos").as("pos_a"))
        .join(capped.select(col("g"), col("doc_id").as("id_b"), col("pos").as("pos_b")), Seq("g"))
        .filter(col("id_a") < col("id_b")).count()
      SparkEntry.releaseSharedCaches() // time the operator cold, end to end
      val t0 = System.nanoTime()
      val spans = Dedup.duplicateSpans(corpus, n = n, maxOcc = maxOcc).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"$n%4d $maxOcc%7d $gramRows%12d $cappedRows%12d $matchRows%12d $spans%9d $wall%8.2f")
    }
    spark.stop()
  }
}
