package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Monoid-style typed aggregation — the reference merges aggregate values
  * with `Value::operator+` only, no zero element
  * (reference: src/lambdas/headers/AggregateComp.h:27-34; map-side combine =
  * CombinerProcessor.h:17-20, reproduced for free by Spark's partial
  * aggregation). Spark's `Aggregator` needs a zero, so the buffer is
  * Option-wrapped (SURVEY.md §7.4 risk 2). Buffers use Kryo (opaque but
  * compact); the *output* uses a real Encoder so downstream ops stay
  * relational.
  */
object MonoidAggregator {
  def apply[I, V](valueProjection: I => V)(plus: (V, V) => V)(
      implicit outEnc: Encoder[V]): Aggregator[I, Option[V], V] =
    new Aggregator[I, Option[V], V] {
      override def zero: Option[V] = None
      override def reduce(b: Option[V], a: I): Option[V] = {
        val v = valueProjection(a)
        Some(b.fold(v)(plus(_, v)))
      }
      override def merge(b1: Option[V], b2: Option[V]): Option[V] = (b1, b2) match {
        case (Some(x), Some(y)) => Some(plus(x, y))
        case (x, y)             => x.orElse(y)
      }
      override def finish(reduction: Option[V]): V = reduction.get
      override def bufferEncoder: Encoder[Option[V]] =
        Encoders.kryo(scala.reflect.ClassTag(classOf[Option[_]]).asInstanceOf[scala.reflect.ClassTag[Option[V]]])
      override def outputEncoder: Encoder[V] = outEnc
    }
}

/** Built-in monoid value types, mirroring the reference's aggregate value
  * library (reference: src/builtInPDBObjects/headers/Avg.h:11, Count.h:16,
  * SumResult.h:11; min-via-operator+ per src/tpch/headers/Query02.h:312-330;
  * multi-measure structs per Query01.h:62-115).
  */
object Monoids {
  final case class AvgState(sum: Double, cnt: Long) {
    def +(o: AvgState): AvgState = AvgState(sum + o.sum, cnt + o.cnt)
    def avg: Double = sum / cnt
  }

  /** Multi-measure state for the Q1-style pricing summary
    * (reference: src/tpch/headers/Query01.h:62-115 Q01ValueClass).
    */
  final case class PricingState(
      sumQty: Double, sumBase: Double, sumDisc: Double, sumCharge: Double,
      sumDiscount: Double, cnt: Long) {
    def +(o: PricingState): PricingState = PricingState(
      sumQty + o.sumQty, sumBase + o.sumBase, sumDisc + o.sumDisc,
      sumCharge + o.sumCharge, sumDiscount + o.sumDiscount, cnt + o.cnt)
  }
}

/** TopKComp — global top-k as a bounded priority queue merged as a monoid
  * (reference: src/queryExecution/headers/TopKComp.h:21-37, queue
  * src/builtInPDBObjects/headers/TopKQueue.h:19). The buffer keeps at most k
  * entries, so partial aggregation bounds shuffle volume to
  * (numPartitions × k) rows regardless of input size — the same property the
  * reference's TopKQueue monoid provides.
  */
class TopKAggregator[T](k: Int, score: T => Double)
    extends Aggregator[T, List[(Double, T)], Seq[T]] {

  private def trim(xs: List[(Double, T)]): List[(Double, T)] =
    xs.sortBy(-_._1).take(k)

  override def zero: List[(Double, T)] = Nil
  override def reduce(b: List[(Double, T)], a: T): List[(Double, T)] =
    trim((score(a), a) :: b)
  override def merge(b1: List[(Double, T)], b2: List[(Double, T)]): List[(Double, T)] =
    trim(b1 ::: b2)
  override def finish(r: List[(Double, T)]): Seq[T] = r.sortBy(-_._1).map(_._2)
  override def bufferEncoder: Encoder[List[(Double, T)]] =
    Encoders.kryo(scala.reflect.ClassTag(classOf[List[_]]).asInstanceOf[scala.reflect.ClassTag[List[(Double, T)]]])
  override def outputEncoder: Encoder[Seq[T]] =
    Encoders.kryo(scala.reflect.ClassTag(classOf[Seq[_]]).asInstanceOf[scala.reflect.ClassTag[Seq[T]]])
}
