package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HammingDistance64Spec extends SparkSpec {

  test("hamming64 matches Long.bitCount(a ^ b) and the builtin bit_count") {
    import spark.implicits._
    val pairs = Seq(
      (0L, 0L), (0L, -1L), (Long.MaxValue, Long.MinValue),
      (0x5555555555555555L, -6148914691236517206L), // alternating bits vs 0xAAAA...
      (123456789L, 987654321L))
    val df = pairs.toDF("a", "b")
      .select(expr("hamming64(a, b)").as("h"), expr("bit_count(a ^ b)").as("ref"),
        col("a"), col("b"))
    df.collect().foreach { r =>
      val expected = java.lang.Long.bitCount(r.getLong(2) ^ r.getLong(3))
      assert(r.getInt(0) == expected)
      assert(r.getInt(1) == expected)
    }
  }

  test("hamming64 stays inside whole-stage codegen") {
    val df = spark.range(100).selectExpr("hamming64(id, id + 3) AS h")
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks WholeStageCodegen stages in the plan string
    assert(plan.contains("*(1) Project"), s"plan lost codegen:\n$plan")
    val expected = (0L until 100L).map(i => java.lang.Long.bitCount(i ^ (i + 3)).toLong).sum
    assert(df.agg(sum("h")).head.getLong(0) == expected)
  }

  test("hamming64 is null-safe") {
    val r = spark.sql("SELECT hamming64(CAST(NULL AS BIGINT), 5L)").collect()
    assert(r.head.isNullAt(0))
  }
}
