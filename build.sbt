ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "camlocationaddressingfeatureserviceetlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// surface deprecations at every compile so they can't silently accumulate
// (the round-13 sweep cleared the board)
ThisBuild / scalacOptions += "-deprecation"
Test / fork := true
run / fork := true
// Forked `run` output goes straight to stdout (no `[info] ` logger prefix) —
// Bench's one-line JSON must be machine-parseable from the sbt output.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// The harness captures only the last ~2000 bytes of sbt output; sbt's
// "[success] Total time: ..." epilogue would eat ~74 of them and truncate
// the head of Bench's JSON line. Suppress it — exit code still signals
// success/failure.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess // consumed by the command layer, not a task
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
