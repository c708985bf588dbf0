package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WarehouseSpec extends SparkSpec {

  test("bucketed orders x lineitem joins without shuffling either side") {
    Warehouse.bucketizeOrders(spark, sf, buckets = 4, prefix = "whtest")
    // the tiny test tables would be broadcast (also shuffle-free); disable
    // that to prove the bucket-to-bucket SMJ path a fact-fact join takes
    val savedThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val q = Warehouse.revenueByPriorityCoLocated(spark, prefix = "whtest")
    val plan = q.queryExecution.executedPlan.toString

    assert(plan.contains("SortMergeJoin"), s"expected a bucket-to-bucket SMJ:\n$plan")
    // the join inputs must NOT be re-shuffled: the only Exchange allowed is
    // the final aggregation's, which sits ABOVE the join in the plan text
    val joinAt = plan.indexOf("SortMergeJoin")
    val belowJoin = plan.substring(joinAt)
    assert(!belowJoin.contains("Exchange"),
      s"join inputs were shuffled despite bucketing:\n$plan")
    assert(plan.contains("Bucketed: true"), s"scan did not use buckets:\n$plan")

    // and the co-located result equals the plain (shuffling) join
    val t = graft.Tables(spark, sf)
    val expected = t.orders
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
        count(lit(1)).as("n_items"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val got = q.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThreshold)
  }
}
