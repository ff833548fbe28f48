package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench stdout line's byte budget and encoding at the REAL
  * suite size — the r15 driver artifact lost all per-query resolution
  * because nothing asserted the line still carried it as queries were
  * added (107 names sank every full-map unit and the run quantized to
  * whole seconds). These asserts run against `SparkEntry.queries.keys`
  * itself, so adding a query that would push the line past its budget
  * or below a useful named-row count fails HERE, not in the round
  * artifact.
  */
class BenchLineSpec extends AnyFunSuite {
  // the real line carries the shared-layer fill rows alongside the
  // graded queries, so the budget is pinned over BOTH name sets
  private val names = (SparkEntry.queries.keys.toSeq ++
    SparkEntry.layerWarmups.map("layer:" + _._1)).sorted

  /** worst case the suite has ever plausibly hit: every query at 99.99 s
    * (4-digit centiseconds) — real rounds are 10-100× tighter
    */
  private def worst: Seq[(String, Double)] = names.map(_ -> 99.99)

  /** widest calib/load context fields main can emit (all 4-digit) */
  private val worstExtra = ""","calib":[99.99,99.99],"load":99.99"""

  test("line fits the 1920-byte tail budget at the real query count, worst-case values") {
    val line = Bench.compactLine(worst, Set.empty, extraFields = worstExtra)
    assert(line.getBytes("UTF-8").length <= 1920, s"line is ${line.length} bytes")
  }

  test("qv carries every query positionally and total survives full-precision") {
    // +0.002 keeps every value OFF the .xx5 rounding boundary: the r16
    // form used +0.005 and assumed "half rounds up", which is false for
    // binary-unrepresentable halves (1.195 is stored as 1.19499…, so the
    // 120th query's row rounded DOWN and the assert broke on suite growth)
    val results = names.zipWithIndex.map { case (n, i) => n -> (i * 0.01 + 0.002) }
    val line = Bench.compactLine(results, Set.empty)
    val qv = line.split("\"qv\":\\[")(1).split("]")(0).split(",")
    assert(qv.length == names.length)
    // spot-check position alignment: qv is name-ascending, centiseconds,
    // round-to-nearest (+0.002 rounds down → index i prints i)
    assert(qv(0) == "0" && qv(names.length - 1) == (names.length - 1).toString)
    val expectedTotal = results.map(_._2).sum
    val totalStr = line.split("\"total\":")(1).split(",")(0)
    assert(math.abs(totalStr.toDouble - expectedTotal) < 0.005 + 1e-9)
  }

  test("the named slowest-subset map keeps at least the 0.2 s-regression class readable") {
    // realistic round shape: a handful of 1 s-class rows, a broad
    // sub-second tail (bench_full_r14/r15 distribution) — the named map
    // must cover AT LEAST the top 40, which is every row that has ever
    // moved ≥0.2 s between rounds
    val results = names.zipWithIndex.map { case (n, i) => n -> (if (i % 7 == 0) 1.3 else 0.35) }
    val line = Bench.compactLine(results, Set.empty)
    val qMap = line.split("\"q\":\\{")(1).split("}")(0)
    val namedRows = if (qMap.isEmpty) 0 else qMap.split(",").length
    assert(namedRows >= 40, s"only $namedRows named rows")
    // and even in the all-4-digit worst case, the top stays named
    val worstLine = Bench.compactLine(worst, Set.empty, extraFields = worstExtra)
    val worstMap = worstLine.split("\"q\":\\{")(1).split("}")(0)
    assert(worstMap.split(",").length >= 30)
  }

  test("failed queries are null in qv, absent from q, named in failed, excluded from total") {
    val results = names.zipWithIndex.map { case (n, i) => n -> (i * 0.01 + 5.0) }
    val dead = names.take(2).toSet
    val line = Bench.compactLine(results, dead)
    val qv = line.split("\"qv\":\\[")(1).split("]")(0).split(",")
    assert(qv(0) == "null" && qv(1) == "null" && qv(2) != "null")
    dead.foreach { d =>
      assert(line.contains("\"failed\":"))
      assert(line.split("\"failed\":")(1).contains("\"" + d + "\""))
      assert(!line.split("\"q\":\\{")(1).split("}")(0).contains("\"" + d + "\""))
    }
    val totalStr = line.split("\"total\":")(1).split(",")(0)
    val expected = results.filterNot(r => dead.contains(r._1)).map(_._2).sum
    assert(math.abs(totalStr.toDouble - expected) < 0.005 + 1e-9)
  }

  test("an all-queries-failed round still emits a parseable, in-budget diagnostic line") {
    // fixture missing/corrupt -> every query fails: the full failed list
    // plus a qv of nulls exceeds the budget on their own, so the line must
    // degrade to total + n_failed + a failed prefix, never print over
    // budget (the tail capture would cut the HEAD and kill the parse)
    val results = names.map(_ -> 0.01)
    val line = Bench.compactLine(results, names.toSet, extraFields = worstExtra)
    assert(line.getBytes("UTF-8").length <= 1920, s"line is ${line.length} bytes")
    val parsed = org.json4s.jackson.JsonMethods.parse(line)
    val org.json4s.JObject(fields) = parsed
    assert(fields.map(_._1).contains("n_failed"))
  }

  test("the line is valid JSON under a strict parser, calib fields included") {
    // the driver json-parses the captured tail line; malformed output
    // (e.g. via a pathological failed-name) must fail here first
    val line = Bench.compactLine(worst, Set(names.head), extraFields = worstExtra)
    val parsed = org.json4s.jackson.JsonMethods.parse(line)
    val org.json4s.JObject(fields) = parsed
    val keys = fields.map(_._1)
    assert(Seq("unit", "total", "calib", "load", "q", "qv", "k", "failed").forall(keys.contains))
  }
}
