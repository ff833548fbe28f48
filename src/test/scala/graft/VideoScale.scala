package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Measurement harness for the perceptual VIDEO family (dev tool, test
  * scope): SCALE.md's claims — the container-parse + per-frame dHash
  * decode dominates and is paid once behind the persisted frame-hash
  * layer, the winnow window `w` trades sketch density (rows per video
  * crossing the exchange) against near-dup recall, and the hot-bucket
  * cap binds ALL-or-nothing on degenerate sketch keys (a black-frame
  * run) instead of letting one key emit n² pairs — were argued from the
  * plan; this measures them at sf0.1. Run with
  * `sbt "Test/runMain graft.VideoScale"`; paste the table into SCALE.md.
  */
object VideoScale {

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = GraftSession.local("video-scale")
    val docs = sources.Tables.documents(spark, dir)
    val nDocs = docs.count()
    println(s"corpus: $nDocs videos ($dir)")

    // decode layer: the one-time fill every consumer amortizes
    val media = Multimodal.syntheticVideoPatterned(
      graft.util.Partitioning.spread(docs))
    val hashes = graft.util.Caching.ensurePersisted(
      Multimodal.videoFrameHashes(media))
    val (nFrames, wallFp) = time(hashes.count())
    println(f"frame-hash layer: $nFrames frame rows in $wallFp%6.2f s " +
      f"(${nFrames.toDouble / nDocs}%.1f frames/video)")

    // sketch density vs w: rows per video crossing the exchange, and the
    // pair volume + wall the banded join sees downstream of each density
    for (w <- Seq(2, 4, 8)) {
      val sk = Multimodal.videoSketch(hashes, w)
      val (nSk, wallSk) = time(sk.count())
      val (nPairs, wallPairs) = time(
        Multimodal.nearDupVideoSketches(sk, minShared = 2).count())
      println(f"w=$w: sketch rows: $nSk%8d (${nSk.toDouble / nDocs}%5.2f/video) " +
        f"in $wallSk%6.2f s | pairs: $nPairs in $wallPairs%6.2f s")
    }

    // cap binding on a black-frame run: every video's sketch collapses to
    // ONE shared hash (a constant frame stream's window minima are all the
    // same value) — the degenerate key that would emit n(n-1)/2 pairs.
    // Constructed directly at the sketch layer (the decode path is already
    // measured above; the cap's contract is about sketch KEYS, not pixels).
    val degenerate = docs.select(col("doc_id"), lit(42L).as("sketch_hash"))
    val maxBucket = 1000
    val (withCap, wCap) = time(
      Multimodal.nearDupVideoSketches(degenerate, minShared = 1, maxBucket = maxBucket)
        .count())
    val uncapBound = nDocs * (nDocs - 1) / 2
    // the verdict keys on whether the bucket EXCEEDS the cap: at a small
    // sf the 42-bucket sits under maxBucket, capBuckets correctly leaves
    // it alone, and n(n-1)/2 pairs are the RIGHT answer, not a failure
    val verdict =
      if (nDocs <= maxBucket)
        s"bucket ($nDocs) under the cap — correctly NOT dropped"
      else if (withCap == 0) "cap BINDS all-or-nothing"
      else s"cap FAILED TO BIND ($withCap pairs leaked)"
    println(f"black-frame run ($nDocs videos on one sketch key): capped pairs: " +
      f"$withCap in $wCap%6.2f s (uncapped would be $uncapBound); $verdict")

    spark.stop()
  }
}
