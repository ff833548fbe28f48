package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard. Designed scale-first:
  *
  *   - exact dedup is one hash-shuffle on the fingerprint;
  *   - MinHash/LSH never compares all pairs: signatures are computed in a
  *     single scan (map-side), candidates come from an equi self-join on
  *     (band, bandHash) — i.e. a shuffle whose key cardinality grows with
  *     corpus size, not corpus²;
  *   - SimHash bands 64 bits into 16-bit chunks the same way;
  *   - exact verification runs only on candidate pairs.
  */
object Dedup {

  private val P = 2147483647L // 2^31-1, prime; keeps a*h+b inside a Long

  /** Deterministic affine hash constants (fixed, engine-version stable). */
  private def hashParams(k: Int): Seq[(Long, Long)] =
    (0 until k).map { i =>
      val a = (i * 2654435761L + 1013904223L) % (P - 1) + 1
      val b = (i * 97531L + 12345L) % P
      (a, b)
    }

  /** Word n-gram shingles of the normalized text (distinct). */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(normalizeText(text))
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n), i => concat_ws(" ", slice(toks, i + 1, n))))
      .otherwise(array(concat_ws(" ", toks))))
  }

  /** Exact dedup: group on the md5 fingerprint of normalized text, keep the
    * lowest id per group. Returns the surviving rows plus the group size.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .withColumn("fp", fingerprint(col(textCol)))
      .groupBy("fp")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).cast("long").as("n_copies"))

  /** MinHash signature column: array of k minima of affine-permuted shingle
    * hashes. One scan, no shuffle; k array traversals stay in codegen.
    */
  def minhashSignature(sh: Column, k: Int = 32): Column = {
    val hashes = transform(sh, s => pmod(xxhash64(s), lit(P)))
    array(hashParams(k).map { case (a, b) =>
      array_min(transform(hashes, h => pmod(h * lit(a) + lit(b), lit(P))))
    }: _*)
  }

  /** MinHash+LSH candidate pairs with exact Jaccard verification.
    *
    * bands × rowsPerBand must equal the signature length. A pair collides if
    * any band's sub-signature matches exactly; candidates are then verified
    * against `threshold` with the true shingle-set Jaccard.
    */
  def minhashLsh(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                 k: Int = 32, bands: Int = 8, threshold: Double = 0.5, shingleN: Int = 3): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rowsPer = k / bands
    val withSig = docs
      .select(col(idCol), shingles(col(textCol), shingleN).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), k))
    val banded = withSig.select(
      col(idCol), col("sh"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        xxhash64(concat_ws(",", slice(col("sig"), b * rowsPer + 1, rowsPer)), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    val l = banded.select(col("band"), col("band_hash"), col(idCol).as("id_a"), col("sh").as("sh_a"))
    val r = banded.select(col("band"), col("band_hash"), col(idCol).as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").dropDuplicates("id_a", "id_b")
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash per document over token unigrams (count-weighted).
    * Computed with one explode + one groupBy (a single shuffle keyed by the
    * document id, which is already the table's natural partitioning).
    */
  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tok = docs.select(col(idCol), explode(tokens(normalizeText(col(textCol)))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { b =>
      sum(when(col("h").bitwiseAND(lit(1L) << b) =!= 0, 1).otherwise(-1)).as(s"b$b")
    }
    val agg = tok.groupBy(idCol).agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 64).map { b =>
      when(col(s"b$b") > 0, lit(1L) << b).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col(idCol), sim.as("simhash"))
  }

  /** SimHash near-dup pairs: band the 64-bit hash into four 16-bit chunks
    * (any equal chunk -> candidate; guarantees recall for hamming distance
    * <= 3), verify with `bit_count(xor) <= maxHamming`.
    */
  def simhashPairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                   maxHamming: Int = 8): DataFrame = {
    val sh = simhash(docs, idCol, textCol)
    val banded = sh.select(col(idCol), col("simhash"),
      posexplode(transform(sequence(lit(0), lit(3)), b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL)))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
    val l = banded.select(col("band"), col("chunk"), col(idCol).as("id_a"), col("simhash").as("sh_a"))
    val r = banded.select(col("band"), col("chunk"), col(idCol).as("id_b"), col("simhash").as("sh_b"))
    l.join(r, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** N-gram Jaccard near-dup over *blocked* pairs: documents are compared
    * only within a cheap blocking key (language × length bucket) — the
    * blocking keeps the join's key cardinality linear in corpus size and is
    * exactly reproducible in the SQL oracle.
    */
  def ngramJaccard(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                   langCol: String = "lang", shingleN: Int = 3,
                   lenBucket: Int = 100, threshold: Double = 0.5): DataFrame = {
    val base = docs.select(
      col(idCol), col(langCol).as("blk_lang"),
      (floor(length(col(textCol)) / lenBucket)).as("blk_len"),
      shingles(col(textCol), shingleN).as("sh"))
    val l = base.select(col("blk_lang"), col("blk_len"), col(idCol).as("id_a"), col("sh").as("sh_a"))
    val r = base.select(col("blk_lang"), col("blk_len"), col(idCol).as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("blk_lang", "blk_len"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
