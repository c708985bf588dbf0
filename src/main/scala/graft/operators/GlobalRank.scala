package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.GraftSession

/** Distributed TOTAL-ORDER ranking — global `row_number` / `ntile` without
  * the single-partition WindowExec.
  *
  * `row_number().over(Window.orderBy(...))` (no partitionBy) is a scale
  * trap: Spark moves EVERY row to one partition and warns about it
  * (`WindowExec: No Partition Defined`) — at 100 TB that task simply never
  * finishes. The distributed formulation is the classic range-partitioned
  * two-pass rank:
  *
  *   1. `repartitionByRange` on the sort key — partition i holds a
  *      contiguous slice of the global order (boundaries from Spark's
  *      reservoir sample over the key; skew in the key distribution is
  *      absorbed by the sampler picking denser boundaries there).
  *   2. `sortWithinPartitions` — each slice sorted locally; the global sort
  *      order is now (partition index, local position) with NO global
  *      shuffle beyond the one range exchange.
  *   3. One tiny counting job collects the per-partition row counts
  *      (`spark_partition_id` groupBy — P longs to the driver, never rows)
  *      and prefix-sums them into slice offsets.
  *   4. Map-side rank: `monotonically_increasing_id()` on the sorted slices
  *      encodes (partition id << 33 | local position) — documented layout —
  *      so `offset(pid) + localPos + 1` IS the global row number. No second
  *      shuffle, no window exec at all; the rank projection is codegen'd
  *      arithmetic.
  *
  * The caller must pass a TOTAL order (tiebreak column included): range
  * boundaries may split equal keys across partitions, and only a total
  * order makes the two-pass rank equal to the single-partition one
  * row-for-row.
  *
  * The range-partitioned frame is computed twice (counting pass + rank
  * pass); it goes behind a tracked cache. Even on cache eviction the
  * recompute is consistent: the range sampler's seed derives from the RDD
  * id, so the same plan re-samples the same boundaries.
  */
object GlobalRank {

  /** `df` + a global 1-based `row_number` column `out`, ordered by
    * `sortCols` (must be a total order). */
  def rowNumbered(df: DataFrame, out: String, sortCols: Column*): DataFrame =
    ranked(df, out, sortCols) { (rn, _) => rn }

  /** Row numbers for a frame a LIMIT already bounded: one slice, one local
    * sort, `monotonically_increasing_id` arithmetic — no sampling pass, no
    * counting job, no WindowExec. ONLY for inputs with a row-count bound
    * that is independent of data scale (a top-N result, a collected
    * dimension); anything unbounded belongs on [[rowNumbered]]'s
    * range-partitioned path. */
  def boundedRowNumbered(df: DataFrame, out: String, sortCols: Column*): DataFrame =
    df.coalesce(1).sortWithinPartitions(sortCols: _*)
      .withColumn(out, monotonically_increasing_id() + 1)

  /** `df` + an `ntile(n)` bucket column `out` over the `sortCols` total
    * order: bucket sizes differ by at most one, the first `N mod n`
    * buckets take the extra row — exactly ANSI / ClickHouse / DuckDB
    * `ntile` semantics, derived from the global row number with map-side
    * arithmetic instead of a single-partition window.
    *
    * Long division is double-backed in Spark SQL; the cast-to-long after a
    * nonnegative division is a floor, exact while quotients stay below
    * 2^53 — i.e. for any feasible row count. */
  def ntiled(df: DataFrame, n: Int, out: String, sortCols: Column*): DataFrame =
    ranked(df, out, sortCols) { (rn, total) => ntileOf(rn, total, n) }

  private def ntileOf(rn: Column, total: Long, n: Int): Column = {
    val q = total / n // base bucket size
    val r = total % n // first r buckets hold q+1 rows
    val cut = r * (q + 1) // rows 1..cut live in the fat buckets
    val tile =
      if (q == 0L) rn - 1 // N < n: row i alone in bucket i
      else when(rn <= cut, ((rn - 1) / lit(q + 1)).cast("long"))
        .otherwise(lit(r) + ((rn - cut - 1) / lit(q)).cast("long"))
    (tile + 1).cast("long")
  }

  /** `df` + a global INCLUSIVE running sum of `value` column `out` over the
    * `sortCols` total order — the distributed prefix sum, same two-pass
    * shape as [[rowNumbered]]: range-partition, collect per-slice TOTALS
    * (P longs, never rows), prefix-sum them into slice offsets, and add
    * the within-slice running sum (a window PARTITIONED by slice — never
    * a single-partition WindowExec). This is the scalable backbone for
    * sequence packing / byte-offset assignment over a whole corpus. */
  def prefixSummed(df: DataFrame, value: Column, out: String, sortCols: Column*): DataFrame =
    prefixSummedAll(df, Seq(value -> out), sortCols: _*)

  /** Several prefix sums over ONE range exchange: each `(value, out)` pair
    * gets its own global running sum, but the slicing, local sorts, and
    * the per-slice-totals collect (P rows of k longs) are shared — the
    * k-column generalization [[Analytics.ksTest]] needs (its two empirical
    * CDFs must cumulate over the SAME score order; two prefixSummed calls
    * would pay the range shuffle twice and could even sample different
    * slice boundaries). */
  def prefixSummedAll(df: DataFrame, values: Seq[(Column, String)],
      sortCols: Column*): DataFrame = {
    require(sortCols.nonEmpty, "prefix sum needs a (total) sort order")
    require(values.nonEmpty, "prefix sum needs at least one value column")
    val work = values.indices.map(i => s"__v$i") :+ "__pid"
    require(!work.exists(df.columns.contains),
      s"prefix sum reserves the working columns ${work.mkString("/")}; rename them in the input")
    val p = math.max(df.sparkSession.sparkContext.defaultParallelism, 1)
    val in = GraftSession.trackCache(values.zipWithIndex.foldLeft(df) {
      case (d, ((v, _), i)) => d.withColumn(s"__v$i", v)
    })
    // the per-slice offsets are carried as exact longs; an integral value
    // column is a hard requirement, not a cast we can paper over (a double
    // prefix sum would also be order-sensitive and non-reproducible)
    values.indices.foreach { i =>
      in.schema(s"__v$i").dataType match {
        case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType => ()
        case t => throw new IllegalArgumentException(
          s"prefix sum needs an integral value column (sums read as long); got $t for ${values(i)._2}")
      }
    }
    val sliced = GraftSession.trackCache(
      in.repartitionByRange(p, sortCols: _*).sortWithinPartitions(sortCols: _*)
        .withColumn("__pid", spark_partition_id()))
    val totals = sliced.groupBy("__pid")
      .agg(sum(s"__v0").cast("long").as("t0"),
        values.indices.tail.map(i => sum(s"__v$i").cast("long").as(s"t$i")): _*)
      .collect()
      .map(r => (r.getInt(0), values.indices.map(i => r.getLong(i + 1))))
      .sortBy(_._1)
    val summed = values.indices.foldLeft(sliced) { case (d, i) =>
      val offsets = totals.map(_._1).zip(totals.map(_._2(i)).scanLeft(0L)(_ + _))
      val offMap = map(offsets.flatMap { case (pid, off) => Seq(lit(pid), lit(off)) }: _*)
      val local = sum(col(s"__v$i")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("__pid")
          .orderBy(sortCols: _*).rowsBetween(Long.MinValue, 0))
      d.withColumn(values(i)._2, element_at(offMap, col("__pid")) + local)
    }
    summed.drop(work: _*)
  }

  private def ranked(df: DataFrame, out: String, sortCols: Seq[Column])(
      rank: (Column, Long) => Column): DataFrame = {
    require(sortCols.nonEmpty, "global rank needs a (total) sort order")
    val p = math.max(df.sparkSession.sparkContext.defaultParallelism, 1)
    // cache the INPUT too: repartitionByRange computes its child twice (the
    // boundary-sampling pass, then the real shuffle), and our callers feed
    // it aggregation outputs whose recompute is a full upstream scan. The
    // ranked domain is always the post-aggregation frame (rank raw
    // 100 TB rows with approx-quantile bucketing instead), so caching it
    // is cheap by construction.
    val in = GraftSession.trackCache(df)
    val sliced = GraftSession.trackCache(
      in.repartitionByRange(p, sortCols: _*).sortWithinPartitions(sortCols: _*))
    val counts = sliced
      .groupBy(spark_partition_id().as("pid")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val total = counts.map(_._2).sum
    val offsets = counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _))
    // the offset lookup is a tiny literal map (P entries), codegen'd
    val offMap = map(offsets.flatMap { case (pid, off) => Seq(lit(pid), lit(off)) }: _*)
    val localPos = col("__mid").bitwiseAND(lit((1L << 33) - 1))
    val rn = element_at(offMap, col("__pid")) + localPos + 1
    sliced
      .withColumn("__pid", spark_partition_id())
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn(out, rank(rn, total))
      .drop("__pid", "__mid")
  }
}
