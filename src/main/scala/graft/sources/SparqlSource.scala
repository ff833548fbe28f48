package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S1/S2 — SPARQL SELECT results (`application/sparql-results+json`,
  * reference `address_etl/crud.py:25-48`) as a DataFrame.
  *
  * Wire shape: `{"head":{"vars":[...]}, "results":{"bindings":[{var:
  * {"type":..,"value":..,"datatype":?}, ...}]}}`. Each var becomes a string
  * column plus a `<var>_datatype` companion (SURVEY §1.2: RDF typed literals
  * carried as (value, datatype) pairs; datatype filters P3/F5 become plain
  * column predicates). Missing optional bindings (P9) surface as nulls.
  *
  * Scale shape: `bindings(docs, vars)` takes a Dataset of result DOCUMENTS
  * (one per fetched page), so the JSON parse + explode runs on executors —
  * pagination becomes partition parallelism exactly like PagedSource; only
  * the tiny header peek (`vars`) is driver-side.
  */
object SparqlSource {

  private val cellSchema = StructType(Seq(
    StructField("type", StringType), StructField("value", StringType),
    StructField("datatype", StringType)))

  val resultSchema: StructType = StructType(Seq(
    StructField("head", StructType(Seq(StructField("vars", ArrayType(StringType))))),
    StructField("results", StructType(Seq(
      StructField("bindings", ArrayType(MapType(StringType, cellSchema))))))))

  /** Parse with a LOUD failure contract — a SOURCE is the opposite of the
    * crawl-media operators: a truncated body, an HTML error page, or a
    * SPARQL error object mid-pagination is missing REFERENCE data, and
    * PERMISSIVE `from_json` would turn it into a null struct whose
    * `explode(null)` silently drops the whole page's bindings. FAILFAST
    * raises on malformed JSON; the `raise_error` guard catches the
    * well-formed-but-wrong-shape case (`{"error": ...}` parses cleanly
    * to a struct with null `results`).
    */
  private def parsed(c: Column): Column =
    from_json(c, resultSchema, Map("mode" -> "FAILFAST"))

  private def requireShape(r: Column, field: Column): Column =
    when(r.isNull || field.isNull,
      raise_error(concat(lit("SPARQL result document has no expected shape: "),
        substring(col("value"), 1, 200)))).otherwise(field)

  /** Projection variables, parsed from one (small) result document. */
  def vars(spark: SparkSession, json: String): Seq[String] =
    spark.createDataset(Seq(json))(Encoders.STRING)
      .select(parsed(col("value")).as("r"), col("value"))
      .select(explode(requireShape(col("r"), col("r.head.vars"))).as("v"))
      .collect().map(_.getString(0)).toSeq

  /** One row per binding across all result documents; executors do the
    * parsing. Column order: var, var_datatype per var in `varNames`.
    */
  def bindings(docs: Dataset[String], varNames: Seq[String]): DataFrame = {
    val exploded = docs
      .select(parsed(col("value")).as("r"), col("value"))
      .select(explode(requireShape(col("r"), col("r.results.bindings"))).as("b"))
    exploded.select(varNames.flatMap(v =>
      Seq(col("b")(v)("value").as(v), col("b")(v)("datatype").as(s"${v}_datatype"))): _*)
  }

  /** Convenience: parse a single result document (header + bindings). */
  def fromJson(spark: SparkSession, json: String): DataFrame =
    bindings(spark.createDataset(Seq(json))(Encoders.STRING), vars(spark, json))
}
