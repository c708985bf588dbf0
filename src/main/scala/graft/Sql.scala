package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-first surface: the reference's users write SQL against ClickHouse;
  * this registers the same tables as temp views (plus graft's native
  * functions) so the equivalent statements run verbatim through
  * `spark.sql`. Catalyst plans SQL and DataFrame code identically, so
  * everything in PLANS.md (pushdown, broadcasts, TopKPerKey) applies here
  * too.
  */
object Sql {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Registers every driver table as a temp view + graft's functions. */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    GraftSession.registerFunctions(spark)
    val t = Tables(spark, dir)
    Seq(
      "region" -> t.region, "nation" -> t.nation, "customer" -> t.customer,
      "supplier" -> t.supplier, "part" -> t.part, "orders" -> t.orders,
      "lineitem" -> t.lineitem, "events" -> t.events,
      "documents" -> t.documents, "embeddings" -> t.embeddings)
      .foreach { case (name, df) => df.createOrReplaceTempView(name) }
  }

  /** The reference's ad-hoc statements (README.rst Step 2.4/3.2),
    * translated to the events schema — runnable verbatim after
    * [[registerTables]]. */
  val referenceQueries: Map[String, String] = Map(
    "count_all" -> "SELECT count(*) AS n FROM events",
    "points_by_house" ->
      """SELECT event_type, round(sum(value), 4) AS total_points
        |FROM events GROUP BY event_type""".stripMargin,
    "latest_event" ->
      "SELECT event_id FROM events ORDER BY ts DESC, event_id DESC LIMIT 1",
    "attendance_granular" ->
      """SELECT to_date(ts) AS day, hour(ts) AS hr, event_type, count(*) AS n
        |FROM events GROUP BY to_date(ts), hour(ts), event_type""".stripMargin)

  def run(spark: SparkSession, dir: String, name: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(referenceQueries(name))
  }
}
