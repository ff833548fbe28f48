package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

class FunctionsSpec extends SparkSpec {

  test("native hash60 expression == builtin-only chain, on real text and edge cases") {
    val s = spark; import s.implicits._
    val samples = Seq("abc", "", " ", "the quick brown fox", "üñïçødé", "0", "a" * 500)
      .toDF("t")
    val diff = samples
      .withColumn("a", GraftFunctions.hash60(col("t")))
      .withColumn("b", GraftFunctions.hash60Portable(col("t")))
      .filter(col("a") =!= col("b"))
    assert(diff.count() == 0)
    // and over a real table slice
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val diff2 = docs
      .withColumn("a", GraftFunctions.hash60(col("text")))
      .withColumn("b", GraftFunctions.hash60Portable(col("text")))
      .filter(col("a") =!= col("b"))
    assert(diff2.count() == 0)
  }

  test("hash60 is registered for SQL via GraftExtensions") {
    val got = spark.sql("SELECT hash60('abc') AS h").head().getLong(0)
    val expected = spark.range(1).select(
      GraftFunctions.hash60Portable(lit("abc")).as("h")).head().getLong(0)
    assert(got == expected)
  }

  test("scalar surface: initialism, zeroToSentinel, stripUrlSuffix, durationSeconds") {
    val s = spark; import s.implicits._
    val row = Seq(("property-centroid", "0", "https://x/api/query"))
      .toDF("slug", "lot", "url")
      .select(
        GraftFunctions.initialism(col("slug")).as("init"),
        GraftFunctions.zeroToSentinel(col("lot")).as("lot"),
        GraftFunctions.stripUrlSuffix(col("url")).as("url"),
        GraftFunctions.durationSeconds(
          lit("2026-01-01 00:00:00").cast("timestamp"),
          lit("2026-01-01 01:30:00").cast("timestamp")).as("dur"))
      .head()
    assert(row.getString(0) == "PC")
    assert(row.getString(1) == "9999")
    assert(row.getString(2) == "https://x/api")
    assert(row.getString(3) == "5400.000")
    // 4-char truncation: water-meter-location-extra-parts -> WMLE
    val init4 = Seq("water-meter-location-extra-parts").toDF("s")
      .select(GraftFunctions.initialism(col("s"))).head().getString(0)
    assert(init4 == "WMLE")
  }
}
