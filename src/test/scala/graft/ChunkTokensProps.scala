package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import graft.operators.TextAnalysis

/** chunkTokens must reproduce exactly the windows `tokens.slice(i·stride,
  * i·stride + window)` for every chunk index — no token lost, duplicated
  * beyond the declared overlap, or reordered — for arbitrary documents,
  * windows, and overlaps.
  */
object ChunkTokensProps extends Properties("ChunkTokens") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private val caseGen: Gen[(List[String], Int, Int)] = for {
    n <- Gen.choose(0, 40)
    toks <- Gen.listOfN(n, Gen.choose('a', 'z').map(c => s"w$c"))
    window <- Gen.choose(1, 12)
    overlap <- Gen.choose(0, window - 1)
  } yield (toks, window, overlap)

  property("every chunk == tokens.slice(start, start + window)") =
    forAllNoShrink(caseGen) { case (toks, window, overlap) =>
      val s = spark; import s.implicits._
      val stride = window - overlap
      val df = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
      val got = TextAnalysis.chunkTokens(df, window = window, overlap = overlap)
        .orderBy("chunk_no")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3))).toList
      val starts = if (toks.isEmpty) List(0) else (0 until toks.length by stride).toList
      val want = starts.zipWithIndex.map { case (st, i) =>
        val w = toks.slice(st, st + window)
        (i.toLong, w.length.toLong, w.mkString(" "))
      }
      got == want
    }
}
