package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** Measurement harness for BPE training's heap gate (dev tool, test
  * scope): SCALE.md claims the dictionary-collect driver loop is "the
  * only way numMerges in the tens of thousands is practical" and the
  * distributed per-round loop is the unbounded-vocabulary fallback —
  * this measures both walls on the same dictionary so the gate's
  * crossover is a number, not a posture. Run with
  * `sbt "Test/runMain graft.BpeScale"`; paste the table into SCALE.md.
  *
  * Corpus: 50 000 one-word documents, word = 8 hex chars of md5(id) —
  * ~50k distinct words over a 16-symbol alphabet, the shape (not the
  * content) of a real web-corpus dictionary; BPE cost depends on |dict|,
  * word length, and merge count, not on which letters occur. Zipf-ish
  * frequency comes free from hex-prefix collisions.
  */
object BpeScale {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("bpe-scale")
    val docs = graft.util.Caching.ensurePersisted(
      spark.range(50000).select(col("id").as("doc_id"),
        substring(md5(col("id").cast("string")), 1, 8).as("text")))
    val stat = Bpe.wordFreqs(docs)
      .agg(count(lit(1)), sum(length(col("word")))).head()
    println(s"dict: ${stat.getLong(0)} words, ${stat.getLong(1)} chars " +
      s"(gate estimate ${stat.getLong(1) * 2 + stat.getLong(0) * 64} bytes " +
      s"vs heap/8 ${Runtime.getRuntime.maxMemory() / 8})")
    Bpe.trainMerges(docs, 2) // warm-up: JIT + the shared wordFreq layer fill
    println(f"${"k"}%6s ${"driver_s"}%9s ${"distrib_s"}%10s ${"encode_s"}%9s")
    for (k <- Seq(8, 32, 128)) {
      val t0 = System.nanoTime()
      val viaDriver = Bpe.trainMerges(docs, k, driverMaxBytes = Long.MaxValue)
      val tDriver = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val viaCluster = Bpe.trainMerges(docs, k, driverMaxBytes = 0L)
      val tCluster = (System.nanoTime() - t1) / 1e9
      assert(viaDriver == viaCluster, s"path divergence at k=$k")
      val t2 = System.nanoTime()
      Bpe.subwordFreqs(docs, viaDriver.map(m => (m._1, m._2))).count()
      val tEncode = (System.nanoTime() - t2) / 1e9
      println(f"$k%6d $tDriver%9.2f $tCluster%10.2f $tEncode%9.2f")
    }
    spark.stop()
  }
}
