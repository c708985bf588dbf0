package graft

import org.apache.spark.sql.functions._

class SqlSpec extends SparkSpec {

  test("reference SQL statements run verbatim and agree with the DataFrame operators") {
    Sql.registerTables(spark, sf)
    val sqlCount = Sql.run(spark, sf, "count_all").head.getLong(0)
    assert(sqlCount == operators.RefPipeline.eventsCount(spark, sf).head.getLong(0))

    val sqlPoints = Sql.run(spark, sf, "points_by_house").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val dfPoints = operators.RefPipeline.pointsByType(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("total_points")).toMap
    assert(sqlPoints == dfPoints)

    val latestSql = Sql.run(spark, sf, "latest_event").head.getLong(0)
    val latestDf = operators.RefPipeline.latestEvent(spark, sf).head.getLong(0)
    assert(latestSql == latestDf)
  }

  test("graft native functions are callable from spark.sql") {
    Sql.registerTables(spark, sf)
    val r = spark.sql(
      """SELECT hamming64(1L, 2L) AS h,
        |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       simhash64(array(0L)) AS s
        |FROM (SELECT 1)""".stripMargin).head
    assert(r.getInt(0) == 2)
    assert(r.getDouble(1) == 11.0)
    assert(r.getLong(2) == 0L)
  }
}
