package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` (SURVEY §2.9's custom-aggregate tier): the
  * element-wise mean of a float-vector column — the centroid primitive
  * an IVF index trains with (x12 uses fixed centroids; k-means
  * iterations are exactly repeated `VecMean` passes).
  *
  * Partial aggregation falls out of the Aggregator contract: `reduce`
  * runs map-side per partition, `merge` combines partial (sum, count)
  * states — one shuffle of 64 doubles + a long per group, never the
  * raw vectors.
  */
object VecMean extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), a: Array[Float]): (Array[Double], Long) = {
    if (a == null) b
    else {
      val sums = if (b._1.isEmpty) new Array[Double](a.length) else b._1
      var i = 0
      while (i < a.length && i < sums.length) { sums(i) += a(i); i += 1 }
      (sums, b._2 + 1)
    }
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    if (x._1.isEmpty) y
    else if (y._1.isEmpty) x
    else {
      var i = 0
      while (i < x._1.length && i < y._1.length) { x._1(i) += y._1(i); i += 1 }
      (x._1, x._2 + y._2)
    }
  }

  override def finish(b: (Array[Double], Long)): Array[Double] =
    if (b._2 == 0) Array.empty[Double] else b._1.map(_ / b._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
