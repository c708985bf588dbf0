package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates for the ClickHouse-SQL dialect front-end: expression translation
  * units, the README scripts end-to-end, dialect == native equality, and
  * the cutover-invariance property the MV + INSERT split depends on. */
class ClickHouseSqlSpec extends SparkSpec {

  private def ch = new ClickHouseSql(spark,
    t => EventsSource.syntheticKafkaFrame(spark, 1000L, 4))

  test("expression translation: the README's dialect constructs map to Spark SQL") {
    val c = ch
    assert(c.translateQuery("SELECT count() FROM t") == "SELECT count(*) FROM t")
    assert(c.translateQuery("SELECT x FROM t GROUP BY (a, b) ORDER BY (a, b)") ==
      "SELECT x FROM t GROUP BY a, b ORDER BY a, b")
    assert(c.translateQuery("SELECT JSONExtractString(message, 'subject') AS s FROM q") ==
      "SELECT get_json_object(message, '$.subject') AS s FROM q")
    assert(c.translateQuery("SELECT toInt8(JSONExtractInt(message, 'points')) AS p FROM q") ==
      "SELECT CAST(CAST(get_json_object(message, '$.points') AS BIGINT) AS TINYINT) AS p FROM q")
    assert(c.translateQuery("SELECT fromUnixTimestamp64Milli(JSONExtractUInt(m, 'timestamp')) FROM q") ==
      "SELECT timestamp_millis(CAST(get_json_object(m, '$.timestamp') AS BIGINT)) FROM q")
    assert(c.translateQuery("SELECT toStartOfDay(timestamp) AS day FROM t") ==
      "SELECT date_trunc('DAY', timestamp) AS day FROM t")
    assert(c.translateQuery("SELECT maxState(x) AS m FROM t") == "SELECT max(x) AS m FROM t")
    assert(c.translateQuery("SELECT avgState(x) AS a FROM t") ==
      "SELECT named_struct('s', CAST(sum(x) AS BIGINT), 'c', count(x)) AS a FROM t")
    assert(c.translateQuery("SELECT avgMerge(st) AS avg FROM t") ==
      "SELECT (CAST(sum(st.s) AS DOUBLE) / sum(st.c)) AS avg FROM t")
    assert(c.translateQuery("SELECT x FROM default.t2") == "SELECT x FROM t2")
    // word-boundary safety: a column whose name CONTAINS a function name
    assert(c.translateQuery("SELECT mytoInt8(x) FROM t") == "SELECT mytoInt8(x) FROM t")
    // rewrap recursion: same-function nesting and sibling calls both hold
    assert(c.translateQuery("SELECT toInt8(toInt8(x)) FROM t") ==
      "SELECT CAST(CAST(x AS TINYINT) AS TINYINT) FROM t")
    assert(c.translateQuery("SELECT maxState(a), maxState(b) FROM t") ==
      "SELECT max(a), max(b) FROM t")
    // parens inside string literals would break a naive scanner only if
    // unbalanced — balanced-in-practice SQL stays correct; the demo's
    // scripts contain none, and unbalanced args throw loudly
    assertThrows[IllegalArgumentException](
      c.translateQuery("SELECT toInt8(broken FROM t"))
  }

  test("README Step 2 end-to-end: dialect result equals the native pipeline") {
    val viaDialect = ClickHouseDemo.refChPointsByHouse(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val native = EventsSource.refPointsByHouse(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(viaDialect == native,
      s"dialect diverged from native: ${viaDialect.diff(native)} / ${native.diff(viaDialect)}")
  }

  test("Step 2 queue: the typed extraction preserves the wire schema") {
    val c = ch
    c.execute(ClickHouseDemo.queueDdl)
    c.execute(ClickHouseDemo.eventsDdl)
    c.execute(ClickHouseDemo.eventsMv)
    val df = c.execute("SELECT count() AS n FROM student_entry_events").get
    assert(df.collect().head.getLong(0) == 1000L)
    val row = c.execute(
      "SELECT timestamp, subject, points, student.house AS house " +
        "FROM student_entry_events ORDER BY timestamp LIMIT 1").get.collect().head
    assert(row.getAs[java.sql.Timestamp]("timestamp").getTime == 1378022400000L)
    assert(row.getAs[String]("subject") == "Potions")
    assert(row.getAs[Byte]("points") == -10) // i=0: 0 % 21 - 10, through toInt8
    assert(row.getAs[String]("house") == "Gryffindor")
    // the README's other ad-hoc statements run as-is
    assert(c.execute("SHOW TABLES").get.collect().map(_.getString(0)).toSet ==
      Set("entry_events_queue", "student_entry_events"))
    val latest = c.execute(
      """SELECT timestamp
        |FROM default.student_entry_events
        |ORDER BY timestamp DESC
        |LIMIT 1""".stripMargin).get.collect().head
    assert(latest.getTimestamp(0).getTime == 1378022400000L + 999L * 3600000L)
    assert(c.execute("SELECT * FROM default.student_entry_events LIMIT 20").get.count() == 20)
  }

  test("the Kafka-engine MV is continuous: streaming the queue through the translated MV equals the dialect table") {
    // a CH Kafka-engine MV consumes the topic in batches, continuously;
    // the dialect applies it one-shot over the replayed topic. This test
    // closes the triangle: the SAME translated MV select, run as a
    // Structured Streaming projection over the staged queue in two
    // micro-batches, must converge to the dialect's one-shot table.
    val records = EventsSource.syntheticKafkaFrame(spark, 2000L, 4)
    val frame = records.select(col("value").cast("string").as("message"))
    // translate the MV's select with the destination's tuple declared
    // (the executor takes the RAW record frame; JSONAsString is its job)
    val c = new ClickHouseSql(spark, _ => records)
    c.execute(ClickHouseDemo.queueDdl)
    c.execute(ClickHouseDemo.eventsDdl)
    c.execute(ClickHouseDemo.eventsMv)
    val dialect = c.execute("SELECT * FROM default.student_entry_events").get
    val selectPart = "(?s)AS\\s+(SELECT.*)".r.findFirstMatchIn(ClickHouseDemo.eventsMv)
      .get.group(1)
    val translated = c.translateQuery(selectPart, tupleOwner = Some("student_entry_events"))
    // stage the queue as two files -> two micro-batches
    val stage = java.nio.file.Files.createTempDirectory("graft-ch-stream")
    graft.TempSweep.register(stage)
    frame.repartition(2).write.mode("overwrite").parquet(stage.toString)
    spark.readStream.schema(frame.schema)
      .option("maxFilesPerTrigger", "1").parquet(stage.toString)
      .createOrReplaceTempView("entry_events_queue")
    val sink = "graft_ch_stream_mv"
    spark.catalog.dropTempView(sink)
    val q = spark.sql(translated).writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .selectExpr("timestamp", "subject", "teacher", "room", "points",
        "student.name AS sn", "student.house AS sh")
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getString(2),
        r.getString(3), r.getByte(4), r.getString(5), r.getString(6)))
      .toSet
    val streamed = rows(spark.table(sink))
    assert(streamed == rows(dialect),
      s"streamed MV diverged from the one-shot dialect table (${streamed.size} rows)")
    assert(streamed.size == 2000)
  }

  test("the future-timestamp cutover is invisible: any cutoff yields the identical final table") {
    // the README's Step 3/4 correctness hinges on MV (>= t) + backfill
    // (< t) composing seamlessly; the *Merge select must collapse the
    // split state rows — so the result must be independent of t
    def runAt(cutoff: String): Set[(java.sql.Date, String, Int, Int, Double)] = {
      val c = new ClickHouseSql(spark,
        _ => EventsSource.syntheticKafkaFrameCoarse(spark, 5000L, 37, 4))
      c.executeAll(Seq(
        ClickHouseDemo.queueDdl, ClickHouseDemo.eventsDdl, ClickHouseDemo.eventsMv,
        ClickHouseDemo.granularDdl, ClickHouseDemo.granularMv(cutoff),
        ClickHouseDemo.granularBackfill(cutoff),
        ClickHouseDemo.dailyDdl, ClickHouseDemo.dailyMv(cutoff),
        ClickHouseDemo.dailyBackfill(cutoff),
        ClickHouseDemo.dailyMergeQuery)).get
        .withColumn("day", to_date(col("day")))
        .collect()
        .map(r => (r.getDate(0), r.getString(1), r.getInt(2), r.getInt(3), r.getDouble(4)))
        .toSet
    }
    val mid = runAt("2013-09-03 07:00:00") // mid-corpus, mid-day
    val early = runAt("2013-01-01 00:00:00") // everything through the MV leg
    val late = runAt("2030-01-01 00:00:00") // everything through the backfill
    assert(mid == early && mid == late,
      s"cutover leaked into the final table: mid/early diff ${mid.diff(early).take(3)}")
    assert(mid.nonEmpty)
    // the coarse frame really is non-degenerate: counts above 1 exist,
    // AND max != min on some day — a swapped maxMerge/minMerge (or an
    // avgMerge that averaged per-leg averages) cannot pass this corpus
    assert(mid.exists(_._3 > 1), "expected class slots with >1 student")
    assert(mid.exists(r => r._3 != r._4),
      "expected days where max != min — the frame lost its checking power")
  }
}
