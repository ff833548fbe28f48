package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import graft.operators.Graph

/** Driver-side mirror of `Graph.pageRank`'s all-integer iteration over
  * random digraphs (duplicate edges collapse, self-loops dropped by the
  * generator's consumer, dangling nodes leak mass, isolated nodes settle
  * at the teleport floor) — exact long arithmetic end to end, so the
  * comparison is equality, not tolerance. A partitioned rerun must be
  * bit-identical (the determinism contract).
  */
object GraphProps extends Properties("Graph") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private def rndHalfUp(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def mirror(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int,
                     dampingPpm: Long): Map[Long, Long] = {
    val es = edges.distinct.filter(e => e._1 != e._2)
    val outdeg = es.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = nodes.size
    val base = rndHalfUp((1000000L - dampingPpm).toDouble / n)
    var r = nodes.map(_ -> rndHalfUp(1000000.0 / n)).toMap
    for (_ <- 1 to iters) {
      val inbound = es.groupBy(_._2).view.mapValues(
        _.map { case (src, _) => rndHalfUp(r(src).toDouble / outdeg(src)) }.sum).toMap
      r = nodes.map(v => v ->
        (base + rndHalfUp(dampingPpm.toDouble * inbound.getOrElse(v, 0L) / 1000000.0))).toMap
    }
    r
  }

  private val graphGen: Gen[(Seq[Long], Seq[(Long, Long)])] = for {
    n <- Gen.choose(2, 12)
    m <- Gen.choose(0, 3 * n)
    es <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
  } yield ((0L until n.toLong), es)

  property("pageRank == exact long-arithmetic driver mirror; partition-invariant") =
    forAllNoShrink(graphGen, Gen.choose(1, 4)) { case ((nodes, edges), iters) =>
      val s = spark; import s.implicits._
      val nodesDf = nodes.toDF("doc_id")
      val edgesDf = edges.toDF("src", "dst")
        .filter(org.apache.spark.sql.functions.col("src") =!=
          org.apache.spark.sql.functions.col("dst")).distinct()
      val got = Graph.pageRank(nodesDf, edgesDf, iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = mirror(nodes, edges, iters, 850000L)
      val re = Graph.pageRank(nodesDf.repartition(5), edgesDf.repartition(3), iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == want && re == want
    }
}
