package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import graft.operators.Bpe

/** Engine-free restatements of the BPE contracts:
  *
  *   - a NAIVE driver reference (recount pairs from scratch each round
  *     with a sorted-map argmax, apply merges by rebuilding each word
  *     symbol-by-symbol) must learn the same merges the engine's driver
  *     path learns, and the distributed path must agree with both —
  *     pinning counting, tie-break, and fold semantics three ways;
  *   - encoding the TRAINING corpus under the learned merges must equal
  *     the final training dictionary state (training and encoding are the
  *     same fold, so a word's trained symbols ARE its encoding);
  *   - merge application never changes the concatenation of symbols
  *     (tokenization is a segmentation, never a rewrite).
  *
  * Generators lean on tandem repeats ("aaaa", "abab") — the overlap
  * cases where greedy-fold implementations classically diverge.
  */
object BpeProps extends Properties("Bpe") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private val wordGen: Gen[String] = Gen.frequency(
    4 -> (for {
      n <- Gen.choose(1, 6)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString),
    2 -> (for {
      c <- Gen.oneOf('a', 'b')
      n <- Gen.choose(2, 7)
    } yield c.toString * n),
    1 -> (for (n <- Gen.choose(1, 3)) yield "ab" * n),
  )

  private val corpusGen: Gen[List[String]] = for {
    n <- Gen.choose(3, 10)
    words <- Gen.listOfN(n, wordGen)
  } yield words

  // -- naive reference ------------------------------------------------------

  private def naiveFold(syms: List[String], a: String, b: String): List[String] =
    syms match {
      case x :: y :: rest if x == a && y == b => (a + b) :: naiveFold(rest, a, b)
      case x :: rest                          => x :: naiveFold(rest, a, b)
      case Nil                                => Nil
    }

  private def naiveTrain(words: Map[String, Long], numMerges: Int): Seq[(String, String, Long)] = {
    var dict: Map[List[String], Long] = words.toSeq
      .map { case (w, f) => (w.map(_.toString).toList :+ Bpe.EOW) -> f }
      .groupMapReduce(_._1)(_._2)(_ + _)
    val out = Seq.newBuilder[(String, String, Long)]
    var k = 0
    var stop = false
    while (k < numMerges && !stop) {
      val counts = scala.collection.immutable.SortedMap.from(
        dict.toSeq.flatMap { case (syms, f) =>
          syms.zip(syms.tail).map(p => p -> f)
        }.groupMapReduce(_._1)(_._2)(_ + _))
      if (counts.isEmpty) stop = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((best._1._1, best._1._2, best._2))
        dict = dict.toSeq
          .map { case (syms, f) => naiveFold(syms, best._1._1, best._1._2) -> f }
          .groupMapReduce(_._1)(_._2)(_ + _)
        k += 1
      }
    }
    out.result()
  }

  private def df(words: List[String]) = {
    val s = spark; import s.implicits._
    // one word per document: doc freq == corpus word freq
    words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
  }

  property("driver path == distributed path == naive reference") =
    forAllNoShrink(corpusGen, Gen.choose(1, 6)) { (words, k) =>
      val want = naiveTrain(
        words.groupMapReduce(identity)(_ => 1L)(_ + _), k)
      val viaDriver = Bpe.trainMerges(df(words), k, driverMaxBytes = Long.MaxValue)
      val viaCluster = Bpe.trainMerges(df(words), k, driverMaxBytes = 0L)
      val ok = viaDriver == want && viaCluster == want
      if (!ok) println(s"words=$words k=$k want=$want driver=$viaDriver cluster=$viaCluster")
      ok
    }

  property("encoding the training corpus == final training dictionary state") =
    forAllNoShrink(corpusGen, Gen.choose(1, 5)) { (words, k) =>
      val merges = Bpe.trainMerges(df(words), k, driverMaxBytes = Long.MaxValue)
      words.distinct.forall { w =>
        val enc = Bpe.encodeWord(w, merges.map(m => (m._1, m._2)))
        val replay = merges.foldLeft(w.map(_.toString).toList :+ Bpe.EOW) {
          case (syms, (a, b, _)) => naiveFold(syms, a, b)
        }
        enc == replay
      }
    }

  property("tokenization is a segmentation: concatenation is invariant") =
    forAllNoShrink(corpusGen, Gen.choose(1, 5)) { (words, k) =>
      val merges = Bpe.trainMerges(df(words), k, driverMaxBytes = Long.MaxValue)
        .map(m => (m._1, m._2))
      words.forall { w =>
        Bpe.encodeWord(w, merges).mkString == w + Bpe.EOW
      }
    }
}
