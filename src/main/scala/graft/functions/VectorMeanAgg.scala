package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Accumulator for [[VectorMeanAgg]]: elementwise running sum + row count.
  * Top-level public case class — the ObjectHashAggregate encoder codegen
  * needs a visible constructor. */
final case class VecSum(sum: Array[Double], n: Long)

/** Partial-aggregating elementwise vector mean over `array<double>`.
  *
  * The scale-correct way to compute k-means cell means: one primitive
  * double[] accumulator per (partition, key), merged associatively — the
  * map-side combine shrinks a cell's contribution to a single dim-length
  * array per partition. The posexplode alternative (explode to (cid, d, x)
  * and avg per dimension) inflates the shuffle by dim x rows, which at
  * corpus scale makes the TRAINING loop the dominant cost of IVF.
  */
object VectorMeanAgg extends Aggregator[Seq[Double], VecSum, Seq[Double]] {
  override def zero: VecSum = VecSum(Array.emptyDoubleArray, 0L)

  override def reduce(b: VecSum, v: Seq[Double]): VecSum =
    if (b.n == 0L) VecSum(v.toArray, 1L)
    else {
      val s = b.sum
      var i = 0
      while (i < s.length) { s(i) += v(i); i += 1 }
      VecSum(s, b.n + 1L)
    }

  override def merge(x: VecSum, y: VecSum): VecSum =
    if (x.n == 0L) y
    else if (y.n == 0L) x
    else {
      val s = x.sum
      var i = 0
      while (i < s.length) { s(i) += y.sum(i); i += 1 }
      VecSum(s, x.n + y.n)
    }

  override def finish(b: VecSum): Seq[Double] =
    if (b.n == 0L) Seq.empty else b.sum.map(_ / b.n).toSeq

  override def bufferEncoder: Encoder[VecSum] = Encoders.product[VecSum]
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}
