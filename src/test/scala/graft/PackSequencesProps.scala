package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import graft.operators.TextAnalysis

/** packSequences must reproduce exactly the reference packing: within each
  * stream, documents in id order, each assigned
  * (cum-before div budget, cum-before mod budget) — no document lost or
  * reassigned for arbitrary corpora, stream skews, and budgets.
  */
object PackSequencesProps extends Properties("PackSequences") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private val caseGen: Gen[(List[(Long, String, Int)], Long)] = for {
    n <- Gen.choose(0, 30)
    rows <- Gen.listOfN(n, for {
      stream <- Gen.oneOf("A", "B", "C")
      nTok <- Gen.choose(0, 20)
    } yield (stream, nTok))
    budget <- Gen.choose(1L, 16L)
  } yield (rows.zipWithIndex.map { case ((st, t), i) => (i.toLong, st, t) }, budget)

  property("seq_id/seq_offset == running-sum reference per stream") =
    forAllNoShrink(caseGen) { case (rows, budget) =>
      val s = spark; import s.implicits._
      val df = rows.map { case (id, st, t) =>
        (id, st, List.fill(t)("w").mkString(" "))
      }.toDF("doc_id", "source", "text")
      val got = TextAnalysis.packSequences(df, budget)
        .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      val want = rows.groupBy(_._2).values.flatMap { stream =>
        stream.sortBy(_._1).scanLeft((-1L, 0L, 0L)) { case ((_, _, cumAfter), (id, _, t)) =>
          (id, cumAfter, cumAfter + t)
        }.drop(1).map { case (id, cumBefore, _) =>
          val t = rows.find(_._1 == id).get._3.toLong
          id -> ((t, cumBefore / budget, cumBefore % budget))
        }
      }.toMap
      got == want
    }
}
