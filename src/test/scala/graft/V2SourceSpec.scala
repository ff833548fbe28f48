package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{FixtureFetcher, PageFetcher, ScanSpec}
import graft.sources.v2.FetcherRegistry

/** Records every ScanSpec the source receives. Top-level (NOT an inner
  * class of the suite): PageFetchers serialize to executors, and an inner
  * class would drag the non-serializable ScalaTest engine along via $outer.
  */
private[graft] class RecordingFetcher(rows: Seq[Row], schema: StructType)
    extends PageFetcher {
  private val inner = new FixtureFetcher(rows, schema)
  @volatile var lastCountSpec: ScanSpec = _
  val fetchOffsets = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
  override def count(spec: ScanSpec): Long = { lastCountSpec = spec; inner.count(spec) }
  override def fetch(offset: Long, limit: Int, spec: ScanSpec): Iterator[Row] = {
    fetchOffsets.add(offset); inner.fetch(offset, limit, spec)
  }
}

/** The DataSource V2 face: Catalyst must drive ScanSpec pushdown by itself. */
class V2SourceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("seg", StringType),
    StructField("v", LongType), StructField("wm", StringType)))

  private def rows = (0 until 100).map(i =>
    Row(s"k$i", if (i % 3 == 0) "A" else "B", i.toLong, f"2026-01-${i % 28 + 1}%02d"))

  private def readV2(name: String, pageSize: Int = 10) =
    spark.read.format("graft.sources.v2.PagedTableProvider")
      .option("fetcher", name).option("pageSize", pageSize.toString).load()

  test("key-set (In) and column pruning reach the fetcher as ScanSpec pushdown") {
    val f = new RecordingFetcher(rows, schema)
    FetcherRegistry.register("rec1", f, schema)
    val out = readV2("rec1")
      .filter(col("seg").isin("A"))
      .select("k", "v")
      .collect()
    assert(out.length === 34)
    assert(f.lastCountSpec.keys === Some("seg" -> Set("A")))
    // projection reached the source: only the referenced columns cross the wire
    assert(f.lastCountSpec.columns.exists(_.toSet == Set("k", "v", "seg")) ||
      f.lastCountSpec.columns.exists(_.toSet == Set("k", "v")),
      s"columns not pruned: ${f.lastCountSpec.columns}")
  }

  test("string >= watermark predicate pushes as whereClause; others stay post-scan") {
    val f = new RecordingFetcher(rows, schema)
    FetcherRegistry.register("rec2", f, schema)
    val out = readV2("rec2")
      .filter(col("wm") >= "2026-01-20" && col("v") % 2 === 0)
      .select("k", "wm", "v").collect()
    assert(f.lastCountSpec.whereClause === Some("wm >= 2026-01-20"))
    // the numeric predicate was NOT pushable — Spark must still apply it
    val expected = rows.filter(r => r.getString(3) >= "2026-01-20" && r.getLong(2) % 2 == 0)
    assert(out.length === expected.length)
  }

  test("pages become input partitions; limit caps the planned pages") {
    val f = new RecordingFetcher(rows, schema)
    FetcherRegistry.register("rec3", f, schema)
    val n = readV2("rec3", pageSize = 10).limit(25).count()
    assert(n === 25)
    // 100 rows would be 10 pages; the pushed limit plans only ceil(25/10)=3
    assert(f.fetchOffsets.size <= 3, s"planned ${f.fetchOffsets.size} pages")
  }

  test("V2 read equals the plain DataFrame over the same rows") {
    val f = new RecordingFetcher(rows, schema)
    FetcherRegistry.register("rec4", f, schema)
    val got = readV2("rec4").collect().map(_.toSeq).toSet
    assert(got === rows.map(_.toSeq).toSet)
  }
}
