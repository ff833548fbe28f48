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
    // Ambient-load calibration (the r15 lesson: the whole driver board
    // shifted +20% in one round with ZERO structural changes — pure box
    // load — and the artifact carried nothing to tell a reader that).
    // A fixed single-thread CPU workload is timed min-of-3 immediately
    // BEFORE and AFTER the timed passes; on an idle box it is a constant,
    // so its ratio across rounds quantifies CPU contention at run time,
    // and the before/after pair shows load CHANGE during the run. The
    // 1-min loadavg at start is captured alongside (same diagnosis from
    // the OS's view). All three ride in bench_full + the compact line.
    def calibrate(): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        var x = 0x9E3779B97F4A7C15L; var i = 0
        while (i < 200000000) { // xorshift64*, ~0.2 s single-thread idle
          x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27; i += 1
        }
        if (x == 42L) System.err.println("") // defeat dead-code elimination
        (System.nanoTime() - t0) / 1e9
      }
      Seq(once(), once(), once()).min
    }
    // Multi-thread calibration twin (the r20 lesson: the single-thread
    // probe missed 32-way contention — a 0.45 end-calib coincided with a
    // 1.38× board). The SAME fixed workload runs once on EVERY bench core
    // simultaneously; the reported figure is the SLOWEST thread's seconds
    // (what a straggler task experiences). On an idle box with real cores
    // it matches the single-thread probe; co-tenant load or oversold
    // vCPUs inflate it roughly linearly with contention, which is exactly
    // the signal round-over-round comparisons need.
    def calibrateMt(): Double = {
      val n = math.max(1, cpus.toInt)
      def once(): Double = {
        val times = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
        val threads = (1 to n).map { _ =>
          new Thread(() => {
            val t0 = System.nanoTime()
            var x = 0x9E3779B97F4A7C15L; var i = 0
            while (i < 200000000) {
              x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27; i += 1
            }
            if (x == 42L) System.err.println("")
            times.add((System.nanoTime() - t0) / 1e9): Unit
          })
        }
        threads.foreach(_.start()); threads.foreach(_.join())
        import scala.jdk.CollectionConverters._
        times.asScala.max
      }
      Seq(once(), once()).min
    }
    val loadAvg = try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.getLines().next().split(" ")(0).toDouble finally src.close()
    } catch { case _: Throwable => -1.0 }
    val calibBefore = calibrate()
    val calibMtBefore = calibrateMt()
    // Shared-layer fills, timed ONCE as their own `layer:<name>` rows
    // (docs/SCALE.md "Bench layer attribution"): a family's one-time
    // decode/pair-graph fill used to land on whichever consumer ran
    // first, so per-row numbers drifted across rounds while family sums
    // stayed flat. Single-timed by design — a second fill would read the
    // now-warm cache and min() would report the read, not the fill. The
    // SPARK_GRAFT_ONLY filter sees the full `layer:<name>` spelling.
    val layerResults: Seq[(String, Double)] = SparkEntry.layerWarmups
      .map { case (n, fn) => (s"layer:$n", fn) }
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case e: Throwable =>
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
    // layer rows merge into the same name-sorted result vector the line
    // encodes positionally (qv is in name order; bench_full keys likewise)
    val results = (layerResults ++
      twoPass.map { case (n, v) => n -> math.min(v, p3.getOrElse(n, v)) })
      .sortBy(_._1)
    val calibAfter = calibrate()
    val calibMtAfter = calibrateMt()
    def num(v: Double): String = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    // "calib":[before,after] fixed-workload single-thread seconds;
    // "calib_mt":[before,after] the same workload on every core at once
    // (slowest thread — the straggler's view of the box, VERDICT r20 #6);
    // "load": 1-min loadavg
    val calibField = s""","calib":[${num(calibBefore)},${num(calibAfter)}]""" +
      s""","calib_mt":[${num(calibMtBefore)},${num(calibMtAfter)}]""" +
      (if (loadAvg >= 0) s""","load":${num(loadAvg)}""" else "")
    // The captured stdout line itself is built by `compactLine` below
    // (budget rationale + encoding documented there). Full-precision
    // seconds additionally go to bench_full.json, plus a round-stamped
    // bench_full_r{N}.json (N inferred from the BENCH_r*.json already
    // committed) so per-round history survives the overwrite; a FAILED
    // query's entry is null everywhere (its elapsed-until-crash time
    // must never read as a fast success) and excluded from totals.
    def sec(v: Double): String = String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    def entry(k: String, render: Double => String, v: Double): String =
      "\"" + k + "\":" + (if (failed.contains(k)) "null" else render(v))
    val qsFull = results.map { case (k, v) => entry(k, sec, v) }.mkString("{", ",", "}")
    val total = results.collect { case (k, v) if !failed.contains(k) => v }.sum
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
      val full = s"""{"metric":"total","value":${sec(total)},"unit":"sec","conditions":"$conditions"$calibField,"queries":$qsFull$failedField,"sf":"$sfDir"}"""
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
    println(compactLine(results, failed.toSet, extraFields = calibField))
    Console.out.flush()
  }

  /** The ONE stdout JSON line the driver harness captures (last ~2000
    * bytes of the run's tail — BENCH_r10.json's capture ends at the line
    * + "\n", BENCH_r09's included sbt's ~76-byte "[success] Total time"
    * suffix after it, so ≤1920 bytes keeps the line's head intact under
    * both capture modes).
    *
    * r15 lesson: the previous adaptive-UNIT fallback hit a fidelity
    * cliff — at 107 queries the name bytes alone (~1800) sank every
    * full-map unit, and the round's driver artifact quantized to whole
    * seconds (every entry 0 or 1, no total). Names, not values, are the
    * budget hog, so the line now pays them only where per-name
    * readability matters and ships the rest positionally:
    *   - `total`: exact suite seconds (%.2f) — never quantized;
    *   - `q`: the SLOWEST K queries as a name→centisecond map (K chosen
    *     adaptively to fit the budget) — regressions live at the top, so
    *     the name-readable rows are exactly the ones worth names;
    *   - `qv`: ALL queries as a centisecond array in query-NAME order
    *     (ascending — the order this file times them in, and the key
    *     order of the committed bench_full_r{N}.json, which carries the
    *     name list at full precision);
    *   - `k`: a one-line self-description so the artifact explains its
    *     own encoding; failed queries are null in both `q` and `qv` and
    *     named in `failed` (elapsed-until-crash must never read as a
    *     fast pass) — null `qv` slots keep the array position-aligned;
    *   - `extraFields` carries run-context fields verbatim (the
    *     `calib`/`load` ambient-load calibration from `main`), so a
    *     cross-round reader can separate box load from regression.
    *
    * `results` must already be in ascending query-name order (the timing
    * loop sorts by name); `BenchLineSpec` pins the byte budget and the
    * minimum named-row count at the real suite size.
    */
  private[graft] def compactLine(results: Seq[(String, Double)], failed: Set[String],
                                 budgetBytes: Int = 1920,
                                 extraFields: String = ""): String = {
    def cs(v: Double): String = math.round(v * 100).toString
    val total = results.collect { case (k, v) if !failed.contains(k) => v }.sum
    val totalStr = String.format(java.util.Locale.ROOT, "%.2f", Double.box(total))
    val failedField =
      if (failed.isEmpty) ""
      else failed.toSeq.sorted.map("\"" + _ + "\"").mkString(""","failed":[""", ",", "]")
    val qvField = results.map { case (k, v) => if (failed.contains(k)) "null" else cs(v) }
      .mkString(""","qv":[""", ",", "]")
    val keyField =
      ""","k":"cs; qv=all queries in name order (names: bench_full.json); q=slowest subset""""
    def lineFor(topK: Int): String = {
      val top = results.filterNot(t => failed.contains(t._1)).sortBy(-_._2).take(topK)
      val qs = top.map { case (k, v) => "\"" + k + "\":" + cs(v) }.mkString("{", ",", "}")
      s"""{"unit":"cs","total":$totalStr$extraFields,"q":$qs$qvField$keyField$failedField}"""
    }
    // widest top map that fits; topK = results.size degenerates to the
    // old full-fidelity line (plus qv) when the suite is small enough
    (results.size to 0 by -1).iterator.map(lineFor)
      .find(_.getBytes("UTF-8").length <= budgetBytes)
      .getOrElse {
        // failure-heavy degenerate case: the FIXED fields (a ~full-suite
        // failed list + qv of nulls) can exceed the budget on their own —
        // exactly the runs whose artifact must stay parseable. Degrade to
        // a diagnostic line: total, failure count, and as many failed
        // names as fit (the tail capture would otherwise cut the line's
        // HEAD and the round's JSON parse dies with it).
        val base = s"""{"unit":"cs","total":$totalStr,"n_failed":${failed.size}"""
        val names = failed.toSeq.sorted.map("\"" + _ + "\"")
        val kept = names.indices.reverse.iterator
          .map(i => base + names.take(i + 1).mkString(""","failed":[""", ",", "]") + "}")
          .find(_.getBytes("UTF-8").length <= budgetBytes)
        kept.getOrElse(base + "}")
      }
  }
}
