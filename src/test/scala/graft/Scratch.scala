package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Local-iteration probe (dev tool, test scope): per-query job/stage
  * accounting for the bench rows under the knife this round.
  * Run with `sbt "Test/runMain graft.Scratch"`; SCRATCH_ONLY selects
  * queries, SCRATCH_VERBOSE prints per-stage timings.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var stageTime = 0L
    val verbose = sys.env.contains("SCRATCH_VERBOSE")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1
        val si = sc.stageInfo
        val dt = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        stageTime += dt
        if (verbose)
          println(f"[stage] ${si.stageId}%3d ${dt}%5d ms tasks=${si.numTasks}%3d ${si.name.takeWhile(_ != '\n').take(90)}")
      }
    })
    val names = sys.env.getOrElse("SCRATCH_ONLY", "pls_run,pls_encoded,id_map_extend").split(",")
    val qs = SparkEntry.queries
    // warm-up (skipped when the small fixture is absent, or when it IS the
    // timed dir — then pass1 deliberately measures cold start). Canonical
    // paths via the shared exception-safe helper: a trailing slash or
    // symlinked spelling must not defeat the cold-start guard
    val warmDir = sys.env.getOrElse("SCRATCH_WARM_DIR", "/root/testdata/sf0.001")
    if (new java.io.File(warmDir).exists() && !graft.util.PathsUtil.samePath(warmDir, sfDir))
      names.foreach(n => qs(n)(spark, warmDir).count())
    Thread.sleep(500)
    names.foreach { n =>
      (1 to 3).foreach { i =>
        jobs = 0; stages = 0; stageTime = 0L
        val t0 = System.nanoTime()
        qs(n)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"[scratch] $n pass$i%d: $dt%.3f s  jobs=$jobs stages=$stages stageTime=${stageTime / 1e3}%.2f s")
      }
      val plan = qs(n)(spark, sfDir).queryExecution.executedPlan.toString
      val scans = "InMemoryTableScan".r.findAllIn(plan).length
      println(s"[scratch] $n rebuilt plan InMemoryTableScans=$scans len=${plan.length}")
    }
    spark.stop()
  }
}
