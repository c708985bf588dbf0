package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Accumulator for [[VectorMomentsAgg]]: count, per-dimension sum, and the
  * packed upper-triangle outer-product sum. Top-level public case class —
  * the ObjectHashAggregate encoder codegen needs a visible constructor. */
final case class VecMoments(n: Long, s: Array[Long], ss: Array[Long])

/** Partial-aggregating EXACT second moments of a quantized vector corpus:
  * `n`, `Σ q_i` per dimension, and `Σ q_i·q_j` for every i ≤ j — the
  * integer numerators of the d×d covariance matrix (the PCA/whitening/OPQ
  * preprocessing statistic of an embedding pipeline).
  *
  * The scale-correct shape: ONE pass over the corpus with a single
  * `long[d(d+1)/2]` accumulator per partition, merged associatively —
  * the map-side combine reduces each partition's contribution to d(d+3)/2
  * longs regardless of row count. The posexplode alternative (explode
  * d²/2 (i, j, q_i·q_j) rows per vector and sum per pair) inflates each
  * row 2000× before the partial aggregate gets to shrink it. Inputs are
  * 1e4-quantized BIGINTs, so every sum is exact integer arithmetic: with
  * |q| ≤ ~1e5, `Σ q_i·q_j` stays inside int64 up to ~1e8 rows per
  * partition-merge chain — beyond that, widen the accumulator to two
  * longs (hi/lo) or pre-scale the quantization; the driver corpora are
  * orders of magnitude below the bound.
  *
  * `finish` expands the packed triangle into the full row-major d×d
  * matrix so the caller can address entries with plain `i*d + j`
  * arithmetic instead of inverting triangle numbers in SQL.
  */
object VectorMomentsAgg extends Aggregator[Seq[Long], VecMoments, VecMoments] {

  override def zero: VecMoments =
    VecMoments(0L, Array.emptyLongArray, Array.emptyLongArray)

  @inline private def packedLength(d: Int): Int = d * (d + 1) / 2

  override def reduce(b: VecMoments, v: Seq[Long]): VecMoments = {
    val q = v.toArray
    val d = q.length
    val acc =
      if (b.n == 0L) VecMoments(0L, new Array[Long](d), new Array[Long](packedLength(d)))
      else b
    val s = acc.s
    val ss = acc.ss
    var i = 0
    var idx = 0
    while (i < d) {
      s(i) += q(i)
      val qi = q(i)
      var j = i
      while (j < d) { ss(idx) += qi * q(j); j += 1; idx += 1 }
      i += 1
    }
    VecMoments(acc.n + 1L, s, ss)
  }

  override def merge(x: VecMoments, y: VecMoments): VecMoments =
    if (x.n == 0L) y
    else if (y.n == 0L) x
    else {
      val s = x.s
      val ss = x.ss
      var i = 0
      while (i < s.length) { s(i) += y.s(i); i += 1 }
      i = 0
      while (i < ss.length) { ss(i) += y.ss(i); i += 1 }
      VecMoments(x.n + y.n, s, ss)
    }

  override def finish(b: VecMoments): VecMoments = {
    val d = b.s.length
    if (d == 0) return b
    val full = new Array[Long](d * d)
    var i = 0
    var idx = 0
    while (i < d) {
      var j = i
      while (j < d) {
        full(i * d + j) = b.ss(idx)
        full(j * d + i) = b.ss(idx)
        j += 1; idx += 1
      }
      i += 1
    }
    VecMoments(b.n, b.s, full)
  }

  override def bufferEncoder: Encoder[VecMoments] = Encoders.product[VecMoments]
  override def outputEncoder: Encoder[VecMoments] = Encoders.product[VecMoments]
}
