package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The distributed two-pass rank must agree ROW-FOR-ROW with Spark's own
  * single-partition window on the same total order — and must plan with no
  * WindowExec at all. */
class GlobalRankSpec extends SparkSpec {

  private def fixture(n: Int, dups: Boolean) = {
    import spark.implicits._
    // deterministic pseudo-random values; with dups=true each value appears
    // ~4x so range boundaries land inside runs of equal keys — the case
    // that breaks any non-total-order formulation
    (1 to n).map(i => (i.toLong, if (dups) (i * 2654435761L % 97) / 4 else i * 2654435761L % 10007))
      .toDF("id", "v")
  }

  test("rowNumbered equals the single-partition row_number on a total order") {
    for (dups <- Seq(false, true)) {
      val df = fixture(500, dups)
      val got = GlobalRank.rowNumbered(df, "rn", col("v").desc, col("id"))
      val want = df.withColumn("rn",
        row_number().over(Window.partitionBy(lit(0)).orderBy(col("v").desc, col("id"))).cast("long"))
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"dups=$dups: distributed row_number diverged from the window one")
    }
  }

  test("ntiled equals the single-partition ntile, incl. N % n != 0 and N < n") {
    for ((n, buckets) <- Seq((500, 4), (503, 7), (3, 8))) {
      val df = fixture(n, dups = false)
      val got = GlobalRank.ntiled(df, buckets, "t", col("v").desc, col("id"))
      val want = df.withColumn("t",
        ntile(buckets).over(Window.partitionBy(lit(0)).orderBy(col("v").desc, col("id"))).cast("long"))
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"N=$n buckets=$buckets: distributed ntile diverged from the window one")
    }
  }

  test("boundedRowNumbered equals the window row_number on a limited frame") {
    val df = fixture(300, dups = true)
      .orderBy(col("v").desc, col("id")).limit(25)
    val got = GlobalRank.boundedRowNumbered(df, "rn", col("v").desc, col("id"))
    val want = df.withColumn("rn",
      row_number().over(Window.partitionBy(lit(0)).orderBy(col("v").desc, col("id"))).cast("long"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    assert(!got.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("prefixSummed equals the single-partition running sum") {
    val df = fixture(400, dups = true)
    val got = GlobalRank.prefixSummed(df, col("v"), "cum", col("id"))
    val want = df.withColumn("cum", sum(col("v")).over(
      Window.partitionBy(lit(0)).orderBy(col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "distributed prefix sum diverged from the window running sum")
  }

  test("the distributed rank plans with no WindowExec") {
    val df = fixture(200, dups = true)
    val plan = GlobalRank.ntiled(df, 4, "t", col("v").desc, col("id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"expected a window-free plan, got:\n$plan")
  }

  test("spendQuartiles (q_ntile) itself plans window-free") {
    val plan = Analytics.spendQuartiles(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"expected a window-free q_ntile plan, got:\n$plan")
  }
}
