package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // steady-state measurement: one warm-up pass at the smallest sf triggers
    // JIT + codegen compilation for every query plan shape, so the timed
    // pass measures the operators, not JVM warm-up (order-dependent noise
    // of up to ±20% otherwise)
    // optional local-iteration filter: SPARK_GRAFT_ONLY=q1,q2 limits the run
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    val warmDir = "/root/testdata/sf0.001"
    // canonical-path compare (exception-safe): a trailing slash or
    // symlinked spelling of SPARK_GRAFT_SF_DIR must not let the warm-up
    // run over the timed data
    if (new java.io.File(warmDir).exists() && !graft.util.PathsUtil.samePath(warmDir, sfDir))
      selected.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
    // two timed passes, per-query minimum: steady-state cost with
    // machine-load spikes (this box is shared) filtered out — the same
    // reasoning as the JIT warm-up pass above
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    def timedPass(names: Option[Set[String]] = None): Seq[(String, Double)] =
      selected.toSeq.sortBy(_._1)
        .filter { case (name, _) => names.forall(_.contains(name)) }
        .map { case (name, fn) =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count() } catch { case e: Throwable =>
            // a crashing query must not read as a near-zero-time perf win
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            failed += name
          }
          name -> (System.nanoTime() - t0) / 1e9
        }
    val (p1, p2) = (timedPass(), timedPass())
    val twoPass = p1.zip(p2).map { case ((n, a), (_, b)) => n -> math.min(a, b) }
    // third timed pass for the SLOW rows: the ±12% ambient variance this
    // shared box shows (docs/SCALE.md) is decisecond-scale on the 1 s-class
    // rows — exactly where cross-round regressions matter — so min-of-3
    // there bounds the noise at the top, while the sub-second tail stays at
    // min-of-2. Membership is top-8 OR two-pass min ≥ 0.6 s (not top-8
    // alone): rows hovering at the #9-#12 boundary used to flap between
    // min-of-2 and min-of-3 across rounds, which was itself a noise source
    val slowest = twoPass.filterNot(t => failed.contains(t._1))
      .sortBy(-_._2).zipWithIndex
      .collect { case ((n, v), i) if i < 8 || v >= 0.6 => n }.toSet
    val p3 = timedPass(Some(slowest)).toMap
    val results = twoPass.map { case (n, v) => n -> math.min(v, p3.getOrElse(n, v)) }
    // The harness tail window is exactly 2000 bytes of stdout, and sbt
    // prints "[success] Total time: ..." (~75 bytes) AFTER this line
    // (visible at the end of BENCH_r09.json's tail) — so the line itself
    // must stay ≤ ~1920 bytes or its HEAD gets cut and the parse fails.
    // The 104-query map's NAMES alone cost ~1330 bytes: integer
    // milliseconds can never fit, so the unit is chosen adaptively — the
    // finest of cs → ds → s whose line stays ≤ 1920 bytes, self-described
    // by the "unit" field ("q" = the per-query map; the sf suffix is
    // dropped — the driver records sf in its own capture metadata).
    // Three fidelity rules on the compact line:
    //   - "total" carries the EXACT suite seconds (%.2f, ~16 bytes), so
    //     cross-round comparisons never depend on the quantized entries or
    //     on two rounds having picked the same unit;
    //   - quantization rounds to NEAREST with no floor — a 1 ms query
    //     prints as 0, and the unit field carries the scale (the old
    //     max(1, …) floor overstated sub-half-unit queries up to 100×);
    //   - a FAILED query's entry is null (its elapsed-until-crash time is
    //     meaningless as a timing and must never read as a fast success);
    //     the "failed" list names the casualties, and null rows are
    //     excluded from "total".
    // Full-precision seconds additionally go to bench_full.json, plus a
    // round-stamped bench_full_r{N}.json (N inferred from the BENCH_r*.json
    // already committed) so per-round history survives the overwrite.
    def sec(v: Double): String = String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    def quant(v: Double, perSec: Long): String = math.round(v * perSec).toString
    def entry(k: String, render: Double => String, v: Double): String =
      "\"" + k + "\":" + (if (failed.contains(k)) "null" else render(v))
    val qsFull = results.map { case (k, v) => entry(k, sec, v) }.mkString("{", ",", "}")
    val total = results.collect { case (k, v) if !failed.contains(k) => v }.sum
    val totalStr = String.format(java.util.Locale.ROOT, "%.2f", Double.box(total))
    val failedField =
      if (failed.isEmpty) ""
      else failed.map("\"" + _ + "\"").mkString(""","failed":[""", ",", "]")
    try {
      // Run provenance (the r13 lesson): the committed bench_full_r{N}.json
      // must be the DRIVER's own run, never a hand-picked idle-box rerun.
      // Policy (docs/SCALE.md "Bench provenance"): every builder-initiated
      // run sets SPARK_GRAFT_BENCH_CONDITIONS (e.g. "builder-idle"), so an
      // UNLABELED artifact is by construction the driver harness's — and
      // only unlabeled artifacts may be committed as the round's numbers.
      // label charset is restricted to [A-Za-z0-9_-] (anything else maps
      // to '_'): the value is interpolated into a JSON string, and a quote
      // or backslash in the env var would otherwise emit malformed JSON
      // that downstream artifact tooling fails to parse
      val conditions = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONDITIONS", "unlabeled")
        .map(c => if (c.isLetterOrDigit && c < 128 || c == '_' || c == '-') c else '_')
      val full = s"""{"metric":"total","value":${sec(total)},"unit":"sec","conditions":"$conditions","queries":$qsFull$failedField,"sf":"$sfDir"}"""
      java.nio.file.Files.write(java.nio.file.Paths.get("bench_full.json"),
        (full + "\n").getBytes("UTF-8"))
      // BENCH_r{N}.json for round N is captured by the driver AFTER this
      // run, so the next round number is max(existing) + 1
      val re = "BENCH_r0*(\\d+)\\.json".r
      val rounds = Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
        .flatMap(f => re.unapplySeq(f.getName).flatMap(_.headOption)).map(_.toInt)
      if (rounds.nonEmpty)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"bench_full_r${rounds.max + 1}.json"),
          (full + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () } // best-effort artifact; never fail the run
    // stop BEFORE printing so executor/context shutdown logging cannot land
    // after (or interleave into) the JSON — it must be the LAST line out
    spark.stop()
    def lineFor(unit: String, perSec: Long, withTotal: Boolean): String = {
      val qs = results.map { case (k, v) => entry(k, quant(_, perSec), v) }
        .mkString("{", ",", "}")
      val totalField = if (withTotal) s""","total":$totalStr""" else ""
      s"""{"unit":"$unit"$totalField,"q":$qs$failedField}"""
    }
    // Budget: BENCH_r10.json's captured tail ends at the JSON line + "\n"
    // (no sbt suffix), but BENCH_r09's tail DID include sbt's ~76-byte
    // "[success] Total time" line after it — 1920 is safe under both
    // capture modes (1920 + 77 + newline <= 2000, so the line's head
    // survives the tail cut either way). Fallback order values per-query
    // RESOLUTION over the inline total once cs/ds-with-total miss: the
    // exact total also lives in the committed bench_full_r{N}.json, but a
    // whole-seconds q map loses 70+ sub-second queries outright.
    val attempts = Seq(
      ("cs", 100L, true), ("ds", 10L, true), ("ds", 10L, false), ("s", 1L, true))
    val line = attempts
      .map { case (u, p, t) => lineFor(u, p, t) }
      .find(_.getBytes("UTF-8").length <= 1920)
      .getOrElse(lineFor("s", 1L, withTotal = false))
    println(line)
    Console.out.flush()
  }
}
