package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import graft.operators.Dedup

/** The distributed min-label propagation must agree with an in-memory
  * union-find on arbitrary small graphs (chains, cliques, singletons,
  * disconnected pieces — whatever the generator produces).
  */
object DedupClusterProps extends Properties("DedupClusters") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private val N = 10L
  private val edgeGen = Gen.listOfN(8,
    Gen.zip(Gen.choose(1L, N), Gen.choose(1L, N)).suchThat(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))))

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map((1L to N).map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    edges.foreach { case (a, b) => parent(find(a)) = find(b) }
    // canonical label = min id in the component
    val byRoot = (1L to N).groupBy(find)
    byRoot.flatMap { case (_, ids) => ids.map(_ -> ids.min) }
  }

  property("distributed labels == union-find component minima") =
    forAllNoShrink(edgeGen) { edges =>
      val s = spark; import s.implicits._
      val docs = (1L to N).toDF("doc_id")
      val pairs = edges.distinct.toDF("id_a", "id_b")
      // maxLocalEdges = 0 forces the distributed pointer-doubling path
      val got = Dedup.dedupClusters(docs, pairs, maxLocalEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == unionFind(edges.distinct)
    }

  property("size-gated local labels == union-find component minima") =
    forAllNoShrink(edgeGen) { edges =>
      val s = spark; import s.implicits._
      val docs = (1L to N).toDF("doc_id")
      val pairs = edges.distinct.toDF("id_a", "id_b")
      // default gate: these graphs are far under maxLocalEdges → local path
      val got = Dedup.dedupClusters(docs, pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == unionFind(edges.distinct)
    }
}
