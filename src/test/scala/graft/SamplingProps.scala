package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import graft.operators.TextAnalysis

/** The curation-sampling invariants that make incremental 100 TB runs
  * safe: split assignment is a total, referentially stable partition of
  * the corpus, and budget sampling is monotone in the budget (growing a
  * mix only ADDS documents). Checked for arbitrary corpora.
  */
object SamplingProps extends Properties("Sampling") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private val corpusGen: Gen[List[(Long, String, Int)]] = for {
    n <- Gen.choose(0, 40)
    rows <- Gen.listOfN(n, for {
      lang <- Gen.oneOf("en", "fr", "de")
      nTok <- Gen.choose(0, 12)
    } yield (lang, nTok))
  } yield rows.zipWithIndex.map { case ((l, t), i) => (i.toLong, l, t) }

  private def df(rows: List[(Long, String, Int)]) = {
    val s = spark; import s.implicits._
    rows.map { case (id, l, t) => (id, l, List.fill(t)("w").mkString(" ")) }
      .toDF("doc_id", "lang", "text")
  }

  property("splitAssign partitions totally and subsets keep their assignments") =
    forAllNoShrink(corpusGen) { rows =>
      val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
      val full = TextAnalysis.splitAssign(df(rows), fr)
        .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
      val half = rows.filter(_._1 % 2 == 0)
      val sub = TextAnalysis.splitAssign(df(half), fr)
        .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
      full.size == rows.size &&
        full.values.forall(Set("train", "val", "test")) &&
        sub == full.filter(_._1 % 2 == 0)
    }

  property("sampleToTokenBudget is budget-monotone and meets or exhausts the budget") =
    forAllNoShrink(corpusGen, Gen.choose(1L, 40L)) { (rows, budget) =>
      def picked(b: Long) = TextAnalysis.sampleToTokenBudget(df(rows), b)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList
      val small = picked(budget)
      val large = picked(budget + 7)
      val smallIds = small.map(_._1).toSet
      // monotone: a larger budget never drops a selected document
      smallIds.subsetOf(large.map(_._1).toSet) && {
        // per stratum: either the budget is met (kept tokens >= budget) or
        // the stratum is exhausted (every document kept)
        val byStratum = rows.groupBy(_._2)
        byStratum.forall { case (lang, members) =>
          val kept = small.filter(_._2 == lang)
          kept.map(_._3).sum >= budget || kept.size == members.size
        }
      }
    }
}
