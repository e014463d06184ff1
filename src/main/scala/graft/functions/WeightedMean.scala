package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate via the `Aggregator[IN, BUF, OUT]` API — the
  * Spark surface for user-defined aggregates (the reference carries every
  * aggregate as a named UDAF on the wire, `AggregateUDFExprNode`
  * proto:513 / `PhysicalAggregateExprNode` proto:869-879; this is the
  * Spark-native equivalent of registering one).
  *
  * Weighted mean over integral (value, weight) pairs. The buffer keeps
  * exact Long sums — associative and commutative, so partial aggregation
  * (map-side combine) and any merge order give bit-identical results, and
  * the single final division is reproducible across engines (oracle:
  * `SUM(v*w)::DOUBLE / SUM(w)`). */
object WeightedMean extends Aggregator[(Long, Long), (Long, Long), Double] {
  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), a: (Long, Long)): (Long, Long) =
    (b._1 + a._1 * a._2, b._2 + a._2)
  override def merge(b1: (Long, Long), b2: (Long, Long)): (Long, Long) =
    (b1._1 + b2._1, b1._2 + b2._2)
  override def finish(r: (Long, Long)): Double =
    if (r._2 == 0) Double.NaN else r._1.toDouble / r._2
  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
