package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-9 invariants: the shared-exchange multi prefix sum, the exact KS
  * statistic against a single-partition brute force, and the LIMIT-BY key
  * actually running on the bounded-heap TopKPerKeyExec. */
class Round9Spec extends SparkSpec {

  test("prefixSummedAll: k columns over one exchange == k independent window prefix sums") {
    import spark.implicits._
    val df = spark.range(5000)
      .select(
        (col("id") * 2654435761L % 997L).as("key"),
        (col("id") % 13).as("a"),
        (col("id") % 7).as("b"))
      .groupBy("key")
      .agg(sum("a").as("a"), sum("b").as("b"))
    val got = GlobalRank
      .prefixSummedAll(df, Seq(col("a") -> "ca", col("b") -> "cb"), col("key"))
      .select("key", "ca", "cb").as[(Long, Long, Long)].collect().toSet
    // baseline: the trap formulation (fine at spec scale, 4 partitions)
    val w = Window.orderBy("key").rowsBetween(Window.unboundedPreceding, 0)
    val want = df
      .withColumn("ca", sum("a").over(w)).withColumn("cb", sum("b").over(w))
      .select("key", "ca", "cb").as[(Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("q_ks_test equals the single-partition brute force, and its bounds hold") {
    val got = Analytics.ksTest(spark, sf).collect().head
    val (d, p, v) = (got.getDouble(0), got.getLong(1), got.getLong(2))
    // brute force: per-score window CDFs on one partition, driver math
    val rows = graft.Tables(spark, sf).events
      .filter(col("event_type").isin("purchase", "view"))
      .select(expr("cast(round(value * 100) as bigint)").as("score"),
        (col("event_type") === "purchase").cast("long").as("isp"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byScore = rows.groupBy(_._1).view
      .mapValues(xs => (xs.map(_._2).sum, xs.size - xs.map(_._2).sum)).toSeq.sortBy(_._1)
    val (totP, totV) = (byScore.map(_._2._1).sum, byScore.map(_._2._2).sum)
    assert(p == totP && v == totV)
    var (cp, cv, m) = (0L, 0L, BigInt(0))
    byScore.foreach { case (_, (np, nv)) =>
      cp += np; cv += nv
      m = m.max((BigInt(cp) * totV - BigInt(cv) * totP).abs)
    }
    val want = math.rint(m.toDouble / (totP.toDouble * totV.toDouble) * 1e4) / 1e4
    assert(d == want, s"ks_d $d != brute $want")
    assert(d > 0.0 && d <= 1.0)
  }

  test("q_limit_by runs on TopKPerKeyExec (no WindowExec sort) and equals the window baseline") {
    val df = Olap.limitByCustomer(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("Window "), s"WindowExec still present:\n$plan")
    val fast = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = saved.filterNot(_ == graft.plans.TopKPerKeyRewrite)
    try {
      val slow = Olap.limitByCustomer(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      assert(fast == slow)
      // every customer contributes, nobody exceeds 3 rows
      assert(fast.groupBy(_._1).values.forall(g => g.nonEmpty && g.size <= 3))
    } finally spark.experimental.extraOptimizations = saved
  }
}
