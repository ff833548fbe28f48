package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * language ID, quality scoring, token counting, fingerprinting. All are
  * embarrassingly parallel scans (no shuffle) built from codegen'd
  * expressions, so throughput scales linearly with executors at 100 TB.
  */
object TextAnalysis {

  /** Marker words per language for the n-gram-heuristic language ID.
    * (A real pipeline would use character n-gram profiles; the heuristic
    * keeps the op deterministic and oracle-checkable.)
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " a "),
    "fr" -> Seq(" le ", " la "),
    "de" -> Seq(" der ", " die "),
    "es" -> Seq(" el ", " los "),
    "zh" -> Seq(" de ", " shi "),
  )

  /** Heuristic language ID: argmax of marker-word hit counts with a
    * deterministic tie-break (marker list order; default "en").
    */
  def langIdCol(text: Column): Column = {
    val scores = langMarkers.map { case (lang, markers) =>
      lang -> markers.map(m => markerCount(text, m)).reduce(_ + _)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first language (in declaration order) achieving the max score
    scores.reverse.foldLeft(lit("en")) { case (acc, (lang, s)) =>
      when(s === best && s > 0, lit(lang)).otherwise(acc)
    }
  }

  def langId(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("pred_lang", langIdCol(col(textCol)))

  /** English stopword list for the stopword-ratio signal (Gopher uses the
    * presence of common function words as a natural-language indicator).
    */
  val stopwords: Seq[String] = Seq("the", "a", "an", "of", "and", "or", "to",
    "in", "is", "are", "was", "for", "on", "with", "that", "this", "it", "as")

  /** Quality signals: token count, mean token length, distinct-token ratio,
    * punctuation ratio, stopword ratio, plus a composite [0,1] score.
    * Mirrors the public C4/Gopher-style filters (length + repetition +
    * symbol + stopword ratios).
    */
  def qualityScore(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val stopArr = array(stopwords.map(lit): _*)
    docs
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_stopwords",
        size(filter(tokens(lower(t)), tk => array_contains(stopArr, tk))).cast("long"))
      .withColumn("stopword_ratio",
        round(when(col("n_tokens") > 0, col("n_stopwords").cast("double") / col("n_tokens")).otherwise(lit(0.0d)), 4))
      .withColumn("n_distinct_tokens", size(array_distinct(toks)).cast("long"))
      .withColumn("mean_token_len",
        round(when(col("n_tokens") > 0, length(regexp_replace(t, "\\s+", "")).cast("double") / col("n_tokens")).otherwise(lit(0.0d)), 4))
      .withColumn("distinct_ratio",
        round(when(col("n_tokens") > 0, col("n_distinct_tokens").cast("double") / col("n_tokens")).otherwise(lit(0.0d)), 4))
      .withColumn("punct_ratio",
        round(when(length(t) > 0, (length(t) - length(regexp_replace(t, "[^\\w\\s]", ""))).cast("double") / length(t)).otherwise(lit(0.0d)), 4))
      .withColumn("quality_score",
        round(least(lit(1.0d), col("n_tokens").cast("double") / lit(50.0d)) * col("distinct_ratio") * (lit(1.0d) - col("punct_ratio")), 4))
  }

  /** Token budget estimate: whitespace words + BPE-ish subword count. */
  def tokenCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_words", wordCount(col(textCol)).cast("long"))
      .withColumn("n_subwords", subwordCount(col(textCol)).cast("long"))

  /** PII redaction: emails, IPv4 addresses, and AU-format phone numbers
    * replaced with typed placeholders — the standard scrub pass before
    * training-data release. Pure codegen'd `regexp_replace` chain (no UDF,
    * no shuffle); the patterns stay within the regex subset Java and RE2
    * interpret identically, so the DuckDB oracle replays them verbatim
    * (with the explicit 'g' flag — DuckDB replaces first-match by
    * default, Spark replaces globally). Email first: an address contains
    * digit runs and dots that the later patterns could clip.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text,
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
      "\\b\\d{4} \\d{3} \\d{3}\\b", "<PHONE>")

  /** Fixed-size token windows with overlap — context-window chunking for
    * training-sequence packing. Chunk `i` covers tokens
    * `[i·stride, i·stride + window)` with `stride = window − overlap`; the
    * final chunk may be short, and an empty document yields one empty
    * chunk (rows never vanish). The token array is materialized in its own
    * projection BEFORE the per-chunk lambda references it — an inlined
    * tokenization would re-run per chunk (interpreted HOFs have no CSE).
    * Output: (id, chunk_no, n_tokens, chunk_text), one row per chunk —
    * a pure per-row explode, no shuffle.
    */
  def chunkTokens(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                  window: Int = 32, overlap: Int = 8): DataFrame = {
    require(window > 0 && overlap >= 0 && overlap < window, "need 0 <= overlap < window")
    val stride = window - overlap
    docs
      .select(col(idCol), tokens(normalizeText(col(textCol))).as("__tk"))
      .select(col(idCol), col("__tk"),
        posexplode(sequence(lit(0), greatest(size(col("__tk")) - 1, lit(0)), lit(stride))))
      .select(
        col(idCol),
        col("pos").cast("long").as("chunk_no"),
        least(size(col("__tk")) - col("col"), lit(window)).cast("long").as("n_tokens"),
        concat_ws(" ", slice(col("__tk"), col("col") + 1, lit(window))).as("chunk_text"))
  }

  /** Content fingerprint (md5 of normalized text) + a 31-bit rolling
    * polynomial hash over tokens (Rabin-Karp style), for cheap
    * order-sensitive near-identity checks. The accumulator is reduced
    * mod 2^31-1 each step so intermediate products stay < 2^52 —
    * overflow-free in any engine's 64-bit integers (Java would wrap
    * silently; SQL engines raise), keeping the fold oracle-portable.
    */
  def fingerprints(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val P = 2147483647L
    val toks = tokens(normalizeText(col(textCol)))
    docs
      .withColumn("fp_md5", fingerprint(col(textCol)))
      .withColumn("fp_roll",
        aggregate(toks, lit(0L), (acc, t) => pmod(acc * lit(1000003L) + pmod(hash60(t), lit(P)), lit(P))))
  }
}
