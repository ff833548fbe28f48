package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // dev-only subset filter for local iteration (tools/oracle_check.py):
    // the driver never sets VERIFY_ONLY, so its runs dump everything
    val only = sys.env.get("VERIFY_ONLY").map(_.split(",").map(_.trim).toSet)
    def selected(name: String) = only.forall(_.contains(name))
    SparkEntry.queries.filter(q => selected(q._1)).foreach { case (name, fn) =>
      // remove any PREVIOUS run's output first: a failing query must leave
      // NO parquet behind, or a reused outDir would let the oracle compare
      // stale results and grade a broken query as a MATCH
      val dest = java.nio.file.Paths.get(s"$outDir/$name")
      if (Files.exists(dest)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dest).iterator().asScala.toSeq
          .sortBy(-_.getNameCount).foreach(Files.deleteIfExists(_))
      }
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => selected(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
