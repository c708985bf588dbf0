package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.util.sketch.BloomFilter

/** Partial-aggregating Bloom-filter builder over a long key column — the
  * per-GROUP bloom aggregate Spark doesn't expose publicly
  * (`DataFrameStatFunctions.bloomFilter` builds exactly one filter for a
  * whole frame; ClickHouse builds its `bloom_filter` skip index per part).
  * With this, per-file index sidecars come out of ONE distributed pass:
  * `groupBy(input_file_name()).agg(bloom bytes)` — each task folds its
  * rows into an in-memory filter, filters merge associatively by bitwise
  * OR (`mergeInPlace`), and only the finished BIT ARRAYS cross the wire.
  *
  * The buffer is the live `BloomFilter` object (ObjectHashAggregate keeps
  * object buffers in memory; the Java-serialization encoder is used only
  * if a buffer must cross a partial/final boundary). Expected-items and
  * fpp are constructor knobs FIXED for the aggregation — mergeInPlace
  * requires identical sizing, which is also why the knobs are part of a
  * stored index's contract (the `wh_sketch_state_merge` lgConfigK lesson).
  */
final class BloomAgg(expectedItems: Long, fpp: Double)
    extends Aggregator[Long, BloomFilter, Array[Byte]] {

  override def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)

  override def reduce(b: BloomFilter, v: Long): BloomFilter = { b.putLong(v); b }

  override def merge(x: BloomFilter, y: BloomFilter): BloomFilter = {
    x.mergeInPlace(y); x
  }

  override def finish(b: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    b.writeTo(out)
    out.toByteArray
  }

  override def bufferEncoder: Encoder[BloomFilter] =
    Encoders.javaSerialization[BloomFilter]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
