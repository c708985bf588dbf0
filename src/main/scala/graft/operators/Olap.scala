package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** General OLAP surface (TPC-H-shaped) over the driver's star schema.
  *
  * Scale notes (the part that matters at 100 TB):
  *  - Dimension tables (`region`, `nation`, `supplier`, and `customer` up
  *    to ~GB) are explicitly `broadcast()` — fact-side rows never shuffle
  *    for those joins.
  *  - Fact-fact joins (`orders` ⋈ `lineitem`) shuffle once on the orderkey;
  *    AQE handles skew splitting at runtime.
  *  - All aggregates run partial (map-side) first; `round(...)` is applied
  *    only on the final aggregate so it doesn't break partial aggregation.
  *  - Filters sit directly on the scans → parquet `PushedFilters`, and
  *    min/max row-group pruning kicks in on sorted columns.
  */
object Olap {

  private def revenue = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** Price-magnitude money sum with the exact-cents contract: the per-row
    * cents rounding is one fixed IEEE sequence (identical in any engine),
    * the BIGINT sum is addition-order-independent, and the single final
    * division of an exact integer reproduces bit-for-bit. The naive
    * `round(sum(double), 4)` is NOT reproducible at price magnitudes —
    * for sums ~1e9 the double accumulation error (~ulp·sqrt(n)) straddles
    * the 1e-4 rounding boundary, which the sf0.1 oracle sweep caught on
    * `wh_colocated_join`. Small-magnitude sums (event values, ~1e6) stay
    * on the plain pattern, where the error is 1e5 times below the
    * boundary. */
  private[operators] def centsSum(e: Column): Column =
    sum(round(e * 100).cast("long")) / 100.0

  /** TPC-H Q1: pricing summary. Single scan, single shuffle on a 4-ish-row
    * key space; everything codegen'd. */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .filter(col("l_shipdate") <= lit("2000-09-02").cast("date"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 4).as("sum_qty"),
        centsSum(col("l_extendedprice")).as("sum_base_price"),
        centsSum(revenue).as("sum_disc_price"),
        centsSum(revenue * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3: shipping priority. customer is broadcast; orders ⋈ lineitem
    * shuffles on orderkey. Top-10 by rounded revenue with a key tiebreak
    * (deterministic under float reassociation). */
  def q3Shipping(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val cutoff = lit("1998-03-15").cast("date")
    t.lineitem
      .filter(col("l_shipdate") > cutoff)
      .join(t.orders.filter(col("o_orderdate") < cutoff), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer.filter(col("c_mktsegment") === "BUILDING")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("o_orderdate"),
        col("o_orderpriority"))
      .agg(centsSum(revenue).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
      .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
  }

  /** TPC-H Q5: local supplier volume. region→nation→supplier chain and
    * customer are all broadcast; the only shuffles are the orders⋈lineitem
    * join and the final tiny groupBy. */
  def q5RegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val asiaNations = t.nation.join(
      broadcast(t.region.filter(col("r_name") === "ASIA")),
      col("n_regionkey") === col("r_regionkey"))
    val localSuppliers = t.supplier.join(broadcast(asiaNations),
      col("s_nationkey") === col("n_nationkey"))
    t.lineitem
      .join(t.orders.filter(
        col("o_orderdate") >= lit("1996-01-01").cast("date") &&
        col("o_orderdate") < lit("1997-01-01").cast("date")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(localSuppliers), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(centsSum(revenue).as("revenue"))
  }

  /** Top-20 customers by lifetime order value: grouped agg then a window
    * rank ordered on the ROUNDED total + key tiebreak (`row_number`, never
    * `rank` over raw floats — deterministic across engines). */
  def topCustomers(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val spend = t.orders.groupBy("o_custkey")
      .agg(centsSum(col("o_totalprice")).as("total_spent"),
        count(lit(1)).as("n_orders"))
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
    // top-20 via orderBy+limit first: Catalyst plans a TakeOrderedAndProject
    // (per-partition heaps, no global sort/shuffle); the rank over those 20
    // rows is the bounded-input path — one slice, local sort, arithmetic —
    // because the limit made the rank domain scale-independent. Unbounded
    // global ranks (q_ntile) take GlobalRank's range-partitioned path; a
    // constant-key window is NOT an option for either (Catalyst folds a
    // literal partition spec to empty and the single-partition WindowExec
    // scale warning fires anyway).
    GlobalRank.boundedRowNumbered(
        spend.orderBy(col("total_spent").desc, col("c_custkey")).limit(20),
        "rnk", col("total_spent").desc, col("c_custkey"))
      .select("rnk", "c_custkey", "c_name", "total_spent", "n_orders")
  }

  /** Per-brand part statistics with a distinct count (two-phase distinct:
    * partial de-dup map-side, exact count after one shuffle).
    *
    * avg_price is computed over exact integer cents, then rounded with a
    * single float division — plain `round(avg(double))` is not reproducible
    * across engines when the true mean lands on a rounding half-way point
    * (summation order differs, and at 100 TB it differs run-to-run too). */
  def partStats(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).part
      .groupBy("p_brand")
      .agg(
        count(lit(1)).as("n_parts"),
        countDistinct("p_type").as("n_types"),
        sum(expr("cast(round(p_retailprice * 100) as bigint)")).as("cents"),
        round(max("p_retailprice"), 4).as("max_price"),
        min("p_size").cast("long").as("min_size"))
      .withColumn("avg_price",
        floor(col("cents").cast("double") * 100.0 / col("n_parts") + 0.5) / 10000.0)
      .select("p_brand", "n_parts", "n_types", "avg_price", "max_price", "min_size")

  /** Hierarchical ROLLUP over order status/priority — the grouping-set
    * operator. NULL grouping slots are coalesced to 'ALL' so the contract
    * is engine-neutral. */
  def ordersRollup(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), centsSum(col("o_totalprice")).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("total"))

  /** Full CUBE over the same two dimensions — [[ordersRollup]]'s sibling
    * that also emits the (ALL, priority) slices. Same scale shape: Spark
    * expands the grouping sets map-side and aggregates through ONE shuffle
    * (no per-grouping-set rescan). */
  def ordersCube(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), centsSum(col("o_totalprice")).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("total"))

  /** Explicit GROUPING SETS — the generalization ROLLUP and CUBE are sugar
    * for: exactly the (status) and (priority) marginals in ONE pass (no
    * (status, priority) cell, no grand total — the sets a dashboard
    * actually wants). Same scale shape as rollup/cube: Spark Expands each
    * row once per set map-side and aggregates through a single
    * partial/final shuffle; no per-set rescan of the fact table. */
  def ordersGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir).orders.createOrReplaceTempView("gs_orders")
    spark.sql(
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       count(1) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
        |FROM gs_orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""".stripMargin)
  }

  /** Priority columns pivoted wide (`groupBy.pivot` with the value list
    * given EXPLICITLY — without it Spark runs an extra distinct-collect job
    * to discover the columns, a driver round-trip a 100 TB pipeline never
    * wants). One partial-aggregated shuffle; each cell is a conditional
    * sum, exactly the ClickHouse `sumIf` per column. */
  def pivotPriorities(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .groupBy("o_orderstatus")
      .pivot("o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      .agg(centsSum(col("o_totalprice")))
      .select(col("o_orderstatus").as("status"),
        col("`1-URGENT`").as("p_urgent"), col("`2-HIGH`").as("p_high"),
        col("`3-MEDIUM`").as("p_medium"), col("`4-NOT SPECIFIED`").as("p_notspec"),
        col("`5-LOW`").as("p_low"))

  /** Customers with no URGENT order, per nation — the LEFT ANTI join
    * surface (ClickHouse `ANTI JOIN` / `NOT EXISTS`). The priority filter
    * is pushed into the orders scan BEFORE the anti join, the join shuffles
    * both sides on custkey once and streams; no null-padded rows ever
    * materialize. (Every custkey in the driver data has at least one order,
    * so the unfiltered variant is vacuous — the predicate makes the anti
    * semantics observable.) */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer.select(col("c_custkey"), col("c_nationkey"))
      .join(t.orders.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("c_custkey")), Seq("c_custkey"), "left_anti")
      .groupBy(col("c_nationkey").cast("long").as("nationkey"))
      .agg(count(lit(1)).as("n_customers"))
  }

  /** The anti join's complement — LEFT SEMI (`EXISTS`): customers with at
    * least one URGENT order, per nation. Same scale shape as
    * [[customersWithoutOrders]]: filter pushed into the orders scan, one
    * custkey shuffle, the semi join streams without materializing matches
    * (a row is emitted on the FIRST match, duplicates on the build side
    * never multiply the output). */
  def customersWithUrgentOrders(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer.select(col("c_custkey"), col("c_nationkey"))
      .join(t.orders.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("c_custkey")), Seq("c_custkey"), "left_semi")
      .groupBy(col("c_nationkey").cast("long").as("nationkey"))
      .agg(count(lit(1)).as("n_customers"))
  }

  /** ClickHouse `LIMIT 3 BY o_custkey`: each customer's three priciest
    * orders — per-key top-N as a QUERY shape, written as the declarative
    * row_number-then-filter pattern so [[graft.plans.TopKPerKeyRewrite]]
    * replaces the WindowExec sort with the bounded-heap
    * [[graft.plans.TopKPerKeyExec]] (one custkey shuffle, O(n log k) per
    * key, no partition sort — the custom physical operator under the
    * driver's SQL oracle, not just the ANN rerank specs). The sort key
    * (price desc, orderkey) is total, so heap output == window output
    * row-for-row and DuckDB's row_number agrees. The rank column is cast
    * to long AFTER the bound filter — the rewrite pattern matches the raw
    * integer row_number attribute. */
  def limitByCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(spark, dir).orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rnk").cast("long").as("rnk"))
  }
}
