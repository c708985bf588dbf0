package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference README's literal SQL scripts (README.rst Steps 2-4), run
  * end-to-end through [[ClickHouseSql]] as CHECKED keys: the porting story
  * is not "equivalent capabilities exist" but "the demo's own statements
  * execute and produce the oracle-verified numbers".
  *
  * The statements below are the README's text verbatim, with exactly two
  * parameterizations the README itself instructs the reader to make:
  * the broker address (irrelevant here — the topic binds to the simulated
  * wire frame; a cluster with the connector jar would bind
  * `format("kafka")` instead) and the Step-3/4 future-timestamp cutover
  * placeholder `'use-your-future-time-stamp-here'`, for which the README
  * says "select a timestamp a bit farther in the future" — both the MV leg
  * (`>= cutoff`) and the INSERT backfill (`< cutoff`) run, and the
  * SummingMergeTree-style final merge must make the split invisible
  * (ClickHouseSqlSpec asserts cutoff-invariance explicitly). */
object ClickHouseDemo {

  /** README.rst Step 2.1 — the Kafka engine queue. */
  val queueDdl: String =
    """CREATE TABLE entry_events_queue
      |(
      |    `message` String
      |)
      |ENGINE = Kafka
      |SETTINGS
      |    kafka_broker_list = 'host.docker.internal:9092',
      |    kafka_topic_list = 'entry-events',
      |    kafka_group_name = 'group1',
      |    kafka_format = 'JSONAsString'""".stripMargin

  /** README.rst Step 2.2 — the typed destination table. */
  val eventsDdl: String =
    """CREATE TABLE student_entry_events
      |(
      |    `timestamp` DateTime,
      |    `subject` String,
      |    `teacher` String,
      |    `room` String,
      |    `points` Int8,
      |    `student` Tuple(name String, house String)
      |)
      |ENGINE = MergeTree
      |ORDER BY timestamp""".stripMargin

  /** README.rst Step 2.3 — the extraction materialized view. */
  val eventsMv: String =
    """CREATE MATERIALIZED VIEW materialized_view TO student_entry_events
      |AS SELECT
      |    fromUnixTimestamp64Milli(JSONExtractUInt(message, 'timestamp')) AS timestamp,
      |    JSONExtractString(message, 'subject') AS subject,
      |    JSONExtractString(message, 'teacher') AS teacher,
      |    JSONExtractString(message, 'room') AS room,
      |    toInt8(JSONExtractInt(message, 'points')) AS points,
      |    JSONExtract(message, 'student', 'Tuple(String,String)') AS student
      |FROM entry_events_queue""".stripMargin

  /** README.rst Step 2.4 — the house aggregate, verbatim. */
  val pointsByHouseQuery: String =
    """SELECT student.house as house, sum(points)
      |FROM default.student_entry_events
      |GROUP BY student.house""".stripMargin

  /** README.rst Step 3.1 / 3.4 / 3.7 and Step 4.1 / 4.2 / 4.3 / 4.4,
    * with the future-timestamp placeholder bound to `cutoff`. */
  def granularDdl: String =
    """CREATE TABLE class_attendance_granular
      |(
      |    `timestamp` DateTime,
      |    `subject` String,
      |    `studentCount` UInt16
      |)
      |ENGINE = MergeTree
      |ORDER BY timestamp""".stripMargin

  def granularMv(cutoff: String): String =
    s"""CREATE MATERIALIZED VIEW default.materialized_view_class_attendance_granular TO default.class_attendance_granular
       |AS SELECT
       |  timestamp,
       |  subject,
       |  count(student) as studentCount
       |FROM default.student_entry_events
       |WHERE timestamp >= '$cutoff'
       |Group by (timestamp, subject)
       |ORDER BY timestamp;""".stripMargin

  def granularBackfill(cutoff: String): String =
    s"""INSERT INTO default.class_attendance_granular
       |SELECT
       |  timestamp,
       |  subject,
       |  count(student) as studentCount
       |FROM default.student_entry_events
       |WHERE timestamp < '$cutoff'
       |GROUP BY (timestamp, subject)""".stripMargin

  def dailyDdl: String =
    """CREATE TABLE class_attendance_daily
      |(
      |    `day` DateTime,
      |    `subject` String,
      |    `max_intermediate_state` AggregateFunction(max, UInt16),
      |    `min_intermediate_state` AggregateFunction(min, UInt16),
      |    `avg_intermediate_state` AggregateFunction(avg, UInt16)
      |)
      |ENGINE = SummingMergeTree
      |PARTITION BY tuple()
      |ORDER BY (day, subject)""".stripMargin

  def dailyMv(cutoff: String): String =
    s"""CREATE MATERIALIZED VIEW class_attendance_daily_mv TO class_attendance_daily AS
       |SELECT
       |    toStartOfDay(timestamp) AS day,
       |    subject,
       |    maxState(studentCount) AS max_intermediate_state,
       |    minState(studentCount) AS min_intermediate_state,
       |    avgState(studentCount) AS avg_intermediate_state
       |FROM default.class_attendance_granular
       |WHERE timestamp >= '$cutoff'
       |GROUP BY
       |    day,
       |    subject
       |ORDER BY
       |    day ASC,
       |    subject ASC""".stripMargin

  def dailyBackfill(cutoff: String): String =
    s"""INSERT INTO class_attendance_daily
       |SELECT
       |  toStartOfDay(timestamp) as day,
       |  subject,
       |  maxState(studentCount) AS max_intermediate_state,
       |  minState(studentCount) AS min_intermediate_state,
       |  avgState(studentCount) AS avg_intermediate_state
       |FROM default.class_attendance_granular
       |WHERE timestamp < '$cutoff'
       |GROUP BY day, subject
       |ORDER BY day, subject""".stripMargin

  /** README.rst Step 4 final merge select, verbatim. */
  val dailyMergeQuery: String =
    """SELECT
      |  day,
      |  subject,
      |  maxMerge(max_intermediate_state) AS max,
      |  minMerge(min_intermediate_state) AS min,
      |  avgMerge(avg_intermediate_state) AS avg
      |FROM class_attendance_daily
      |GROUP BY (day, subject)
      |ORDER BY (day, subject)""".stripMargin

  /** A dialect session bound to the simulated `entry-events` topic. */
  private def session(spark: SparkSession, frame: DataFrame): ClickHouseSql =
    new ClickHouseSql(spark, {
      case "entry-events" => frame
      case other => throw new IllegalArgumentException(s"unknown topic $other")
    })

  /** `ref_ch_points_by_house`: Step 2 end-to-end through the dialect —
    * queue DDL, typed table, extraction MV, then the literal Step-2.4
    * query. Shares `ref_points_by_house`'s oracle (same wire arithmetic,
    * same aggregate), so dialect == native is DRIVER-checked; the
    * unaliased `sum(points)` column is renamed for the name-matching
    * harness only. `dir` unused by design — the input is the reference's
    * own wire format. */
  def refChPointsByHouse(spark: SparkSession, dir: String): DataFrame = {
    val ch = session(spark, EventsSource.syntheticKafkaFrame(spark, 100000L, 16))
    ch.executeAll(Seq(queueDdl, eventsDdl, eventsMv, pointsByHouseQuery)).get
      .withColumnRenamed("sum(points)", "total_points")
  }

  /** `ref_ch_attendance_daily`: Steps 2-4 end-to-end through the dialect —
    * extraction MV, the granular attendance MV + its INSERT backfill split
    * at the README's future-timestamp cutover, the SummingMergeTree-style
    * daily state table (maxState/minState/avgState), and the final
    * *Merge select. Runs on the COARSE wire frame — 37 students per
    * class slot: coarse because the default frame's unique-per-event
    * timestamps would make Step 3's per-(timestamp, subject) counts
    * degenerate to 1, and 37 because it is NOT divisible by the
    * 4-subject cycle, so slot counts VARY ({10, 9, 9, 9} rotating with
    * slot phase) and the daily max/min/avg genuinely discriminate — at
    * perSlot 40 every count is the constant 10 and a swapped
    * maxMerge/minMerge translation would pass every check. The `day`
    * column is date-normalized for the cross-engine harness (timestamp
    * hashing is timezone-fragile between engines; ClickHouseSqlSpec
    * asserts the verbatim select in-engine instead). */
  def refChAttendanceDaily(spark: SparkSession, dir: String): DataFrame = {
    // midday on purpose: the cutover day gets state rows from BOTH legs,
    // so the final *Merge select must really merge two partial states
    val cutoff = "2013-10-15 12:00:00"
    val ch = session(spark, EventsSource.syntheticKafkaFrameCoarse(spark, 100000L, 37, 16))
    ch.executeAll(Seq(
      queueDdl, eventsDdl, eventsMv,
      granularDdl, granularMv(cutoff), granularBackfill(cutoff),
      dailyDdl, dailyMv(cutoff), dailyBackfill(cutoff),
      dailyMergeQuery)).get
      .withColumn("day", to_date(col("day")))
  }
}
