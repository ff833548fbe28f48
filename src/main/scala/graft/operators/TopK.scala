package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregation: the buffer never holds more than k (score, id)
  * entries, so map-side partial aggregation reduces each partition's
  * contribution to k rows BEFORE the shuffle. For ANN scoring this turns the
  * shuffle from |corpus|×|queries| scored rows (the naive window plan) into
  * numPartitions×|queries|×k — the difference between "spills at 100 TB" and
  * "trivial".
  *
  * Ordering: score DESC, id ASC (deterministic under score ties — callers
  * pre-round scores so cross-engine rank order is stable).
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], (Array[Double], Array[Long])] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Insert into a descending-sorted list, keeping at most k entries. */
  private def insert(buf: List[(Double, Long)], e: (Double, Long)): List[(Double, Long)] = {
    val (pre, post) = buf.span(better(_, e))
    if (pre.length >= k) buf else (pre ::: e :: post).take(k)
  }

  override def zero: List[(Double, Long)] = Nil
  override def reduce(buf: List[(Double, Long)], e: (Double, Long)): List[(Double, Long)] =
    insert(buf, e)
  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(insert)
  override def finish(buf: List[(Double, Long)]): (Array[Double], Array[Long]) =
    (buf.map(_._1).toArray, buf.map(_._2).toArray)

  // buffer is at most k tuples — kryo keeps this simple; the shuffled bytes
  // are bounded by k regardless of encoding
  override def bufferEncoder: Encoder[List[(Double, Long)]] = Encoders.kryo
  override def outputEncoder: Encoder[(Array[Double], Array[Long])] =
    Encoders.product[(Array[Double], Array[Long])]
}
