package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType, BinaryType}

/** Registry-wide lint on GRADED output shapes (the r7 lesson).
  *
  * The driver canonicalizes each query's parquet via a pandas row sort:
  * an array/struct/map cell is unhashable there and crashes the gate
  * (`quantize_int8`, r7), and dtype-shifting oracle types (HUGEINT)
  * hash-mismatch on equal values. The JVM can't see DuckDB's types —
  * tools/oracle_check.py lints that side — but the Spark-side schema IS
  * visible at plan time, so this spec locks it: every registered query's
  * output must be flat scalar columns.
  *
  * Schema resolution is lazy for all but two queries (no job runs), so
  * the lint costs analysis only — the exceptions are `vocab_topk`, whose
  * operator is eager by design (its sketch gate needs two actions), and
  * `inc_dedup_stream`, which runs its MemoryStream to completion when
  * invoked.
  */
class OutputShapeSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("no registered query emits a nested or binary output column") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val bad = fn(spark, dir).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] ||
          f.dataType == BinaryType => s"$name.${f.name}: ${f.dataType.simpleString}"
      }
      bad
    }
    assert(offenders.isEmpty,
      s"graded outputs must be flat scalars (driver pandas sort crashes on nested cells): $offenders")
  }

  test("every oracle key has a matching query") {
    // key-set containment: an oracle without a query is a silent coverage
    // hole. (Oracle result TYPES — no HUGEINT, no nested columns — are
    // linted by tools/oracle_check.py, which can see DuckDB's types.)
    val qk = SparkEntry.queries.keySet
    val ok = SparkEntry.oracleSql.keySet
    assert((ok -- qk).isEmpty, s"oracle entries without a query: ${ok -- qk}")
  }
}
