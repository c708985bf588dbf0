package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Parquet table loaders for the driver's TPC-H-ish star schema.
  *
  * Column pruning + predicate pushdown happen automatically because callers
  * select/filter on the returned (lazy) DataFrame before any action — check
  * `.explain("formatted")`: `ReadSchema` must list only the used columns and
  * `PushedFilters` must carry the query predicates.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 only reads via
    * the nanosAsLong legacy conf (runtime-settable, so we set it here and
    * it works on driver-owned sessions too). The raw nanos are truncated to
    * microseconds — exactly what a native TimestampType read would hold. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t("events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => df
    }
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
