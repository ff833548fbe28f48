package graft

import graft.sources.SparqlSource

class SparqlSourceSpec extends SparkSpec {

  private val json =
    """{"head":{"vars":["a","b"]},
      |"results":{"bindings":[
      |{"a":{"type":"uri","value":"iri:1"},"b":{"type":"literal","value":"5","datatype":"urn:int"}},
      |{"a":{"type":"uri","value":"iri:2"}}
      |]}}""".stripMargin

  test("vars parses the projection header") {
    assert(SparqlSource.vars(spark, json) == Seq("a", "b"))
  }

  test("bindings become value + datatype columns; optional bindings are null (P9)") {
    val rows = SparqlSource.fromJson(spark, json).collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "iri:1" && rows(0).getString(2) == "5")
    assert(rows(0).getString(3) == "urn:int") // b_datatype
    assert(rows(1).getString(2) == null && rows(1).getString(3) == null)
  }

  test("multi-document parse distributes over executors (one row per page doc)") {
    val s = spark; import s.implicits._
    val docs = spark.createDataset(Seq(json, json))
    val out = SparqlSource.bindings(docs, Seq("a", "b"))
    assert(out.count() == 4)
    assert(out.rdd.getNumPartitions >= 1)
  }

  test("malformed or error-shaped result documents fail LOUDLY, never silently drop a page") {
    val s2 = spark; import s2.implicits._
    // truncated body -> FAILFAST parse error
    val truncated = s2.createDataset(Seq("""{"head":{"vars":["a"]},"results"""))
    intercept[org.apache.spark.SparkException] {
      SparqlSource.bindings(truncated, Seq("a")).collect()
    }
    // well-formed JSON with the WRONG shape (a SPARQL error object):
    // parses cleanly, but results is null -> raise_error, not zero rows
    val errDoc = s2.createDataset(Seq("""{"error": "rate limited"}"""))
    val e = intercept[Exception] {
      SparqlSource.bindings(errDoc, Seq("a")).collect()
    }
    assert(e.getMessage.contains("no expected shape") ||
      Option(e.getCause).exists(_.getMessage.contains("no expected shape")))
    // an EMPTY but well-shaped result stays a legitimate zero-row page
    val empty = s2.createDataset(
      Seq("""{"head":{"vars":["a"]},"results":{"bindings":[]}}"""))
    assert(SparqlSource.bindings(empty, Seq("a")).count() == 0L)
  }
}
