package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session — Spark
  * startup dominates test wall-clock otherwise). Use
  * `val s = spark; import s.implicits._` inside tests for encoders.
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = GraftSession.configure(
      SparkSession.builder().master("local[4]").appName("graft-test"), "4").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
