package graft

import org.apache.spark.sql.functions._

/** Measurement harness for the link-graph family (dev tool, test
  * scope): SCALE.md's PageRank claims — per-round cost is one src join
  * plus one map-side-combined dst sum (so wall grows with edges, not
  * rounds²), the localCheckpoint lineage cut keeps round k's plan
  * constant-size, and driver traffic per round is zero — were argued
  * from the plan; this measures wall vs node/edge volume and isolates
  * the per-iteration slope from the fixed setup (spine count + degree
  * join + first checkpoint). Run with
  * `sbt "Test/runMain graft.GraphScale"`; paste the table into SCALE.md.
  */
object GraphScale {

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = GraftSession.local("graph-scale")
    val docs = sources.Tables.documents(spark, dir).select(col("doc_id"))
    val nAll = docs.count()
    println(s"corpus: $nAll nodes ($dir)")

    // the graded row's synthetic link shape (node d → (ad+b) mod n) at
    // three node scales and two fan-outs; iters=1 vs iters=5 separates
    // the fixed setup (spine, out-degree join, first checkpoint) from
    // the per-round slope — the number that predicts a 50-round run
    for (frac <- Seq(4L, 2L, 1L); fan <- Seq(3, 6)) {
      val n = nAll / frac
      val nodes = docs.filter(col("doc_id") < n)
      val coefs = Seq((7L, 1L), (13L, 2L), (31L, 3L),
        (43L, 4L), (61L, 5L), (89L, 6L)).take(fan)
      val edges = coefs.map { case (a, b) =>
        nodes.select(col("doc_id").as("src"),
          pmod(col("doc_id") * a + b, lit(n)).as("dst"))
      }.reduce(_ unionByName _)
        .filter(col("src") =!= col("dst")).distinct()
      val nEdges = edges.count()
      spark.catalog.clearCache()
      val (_, w1) = time(operators.Graph.pageRank(nodes, edges, iters = 1).count())
      spark.catalog.clearCache()
      val (_, w5) = time(operators.Graph.pageRank(nodes, edges, iters = 5).count())
      val perIter = (w5 - w1) / 4.0
      println(f"n=$n%7d fan=$fan edges=$nEdges%8d | iters=1: $w1%6.2f s | " +
        f"iters=5: $w5%6.2f s | per-round slope: $perIter%6.2f s")
    }

    // localCheckpoint cost in isolation: the lineage cut each round pays —
    // materializing one node-spine-sized frame to local blocks vs merely
    // counting it (the delta is the cut's own price at this spine size)
    val spine = docs
    val (_, wCount) = time(spine.count())
    val (ck, wCk) = time {
      val c = spine.withColumn("r", lit(1000L)).localCheckpoint(); c.count(); c
    }
    ck.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false); ()
      case _ => ()
    }
    println(f"spine count: $wCount%6.3f s | localCheckpoint+count: $wCk%6.3f s " +
      f"(cut overhead ~${wCk - wCount}%6.3f s per round at $nAll rows)")

    spark.stop()
  }
}
