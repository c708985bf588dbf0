package graft.sources

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{StructType, TimestampType}

/** End-to-end exercise of the reference's REAL wire format
  * (anelook/apache-kafka-clickhouse-demo README.rst Step 2):
  * `{timestamp: unix-ms, subject, teacher, room, points: Int8,
  * student: {name, house}}` — the nested tuple the flat driver schema
  * never touches.
  *
  * The repository's events_years_13_22.ndjson.zip (README: 2,649,615 rows,
  * timestamps 1378022400000..1652450400000) ships as a ZERO-BYTE
  * placeholder in this build environment, so the published corpus itself
  * cannot be replayed; this spec generates a deterministic slice in the
  * identical format and drives it through the same batch + streaming
  * extraction the full file would take.
  */
class ReferenceCorpusSpec extends SparkSpec {

  private val houses = Seq("Gryffindor", "Hufflepuff", "Ravenclaw", "Slytherin")
  private val subjects = Seq("Potions", "Charms", "Herbology", "Transfiguration")

  /** Deterministic sample: i-th event at reference epoch + i hours. */
  private def lines(n: Int): Seq[String] = (0 until n).map { i =>
    val ts = 1378022400000L + i * 3600000L
    val house = houses(i % houses.length)
    val subject = subjects(i % subjects.length)
    val points = (i % 21) - 10 // Int8 range incl. negative house points
    s"""{"timestamp": $ts, "subject": "$subject", "teacher": "T${i % 7}", """ +
      s""""room": "R${i % 9}", "points": $points, """ +
      s""""student": {"name": "S${i % 50}", "house": "$house"}}"""
  }

  private val n = 200
  private def expectedByHouse: Map[String, Long] =
    (0 until n).groupBy(i => houses(i % houses.length))
      .map { case (h, is) => h -> is.map(i => ((i % 21) - 10).toLong).sum }

  private def writeCorpus(): String = {
    val dir = Files.createTempDirectory("graft-refcorpus").toFile
    Files.write(new java.io.File(dir, "events.ndjson").toPath,
      lines(n).mkString("\n").getBytes("utf-8"))
    dir.getAbsolutePath
  }

  test("batch: the Step-2.3 MV projection extracts the nested student tuple") {
    val dir = writeCorpus()
    val parsed = EventsSource.parseReference(
      spark.read.text(dir).withColumnRenamed("value", "message"))
    assert(parsed.schema("student").dataType.isInstanceOf[StructType])
    assert(parsed.schema("timestamp").dataType == TimestampType)
    assert(parsed.schema("points").dataType.typeName == "byte") // toInt8 analog
    assert(parsed.count() == n.toLong)
    val first = parsed.orderBy("timestamp").head
    assert(first.getAs[java.sql.Timestamp]("timestamp").getTime == 1378022400000L)
    assert(first.getAs[org.apache.spark.sql.Row]("student").getAs[String]("house") == "Gryffindor")
  }

  test("Step 2.4: sum(points) GROUP BY student.house matches the hand-computed totals") {
    val dir = writeCorpus()
    val parsed = EventsSource.parseReference(
      spark.read.text(dir).withColumnRenamed("value", "message"))
    val byHouse = EventsSource.pointsByHouse(parsed)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byHouse == expectedByHouse)
  }

  test("streaming: the identical extraction runs over the file stream (the kcat flow)") {
    val dir = writeCorpus()
    val stream = EventsSource.parseReference(
      spark.readStream
        .schema(new StructType().add("value", "string"))
        .text(dir).withColumnRenamed("value", "message"))
    val q = stream.writeStream.format("memory").queryName("ref_corpus")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("ref_corpus")
      assert(rows.count() == n.toLong)
      assert(rows.select(countDistinct(col("student.house"))).head.getLong(0) == houses.length.toLong)
    } finally q.stop()
  }

  test("full cascade: stream -> nested extraction -> windowed house points -> idempotent sink") {
    // the reference's Steps 1-4 end-to-end on the REAL wire format:
    // kcat flow (file stream) -> Step-2.3 MV projection (nested tuple) ->
    // Step-3/4 style windowed aggregate -> MergeTree-analog upsert sink
    val dir = writeCorpus()
    val sinkDir = Files.createTempDirectory("graft-refsink").toFile.getAbsolutePath
    val stream = EventsSource.parseReference(
      spark.readStream
        .schema(new StructType().add("value", "string"))
        .text(dir).withColumnRenamed("value", "message"))
    val daily = stream
      .withWatermark("timestamp", "1 hour")
      .groupBy(window(col("timestamp"), "1 day"), col("student.house").as("house"))
      .agg(sum(col("points").cast("long")).as("points"))
      .select(col("window.start").as("day"), col("house"), col("points"))
    val q = graft.streaming.ParquetUpsertSink.attach(daily, sinkDir).start()
    try q.processAllAvailable() finally q.stop()

    val landed = graft.streaming.ParquetUpsertSink.read(spark, sinkDir, Seq("day", "house"))
    val byHouse = landed.groupBy("house").agg(sum("points").as("total_points"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byHouse == expectedByHouse,
      s"streamed cascade totals $byHouse != batch ground truth $expectedByHouse")
  }

  test("the in-query generator emits byte-identical lines to this spec's file generator") {
    // ref_points_by_house's distributed generator and this spec's
    // driver-side one must never drift: both claim to be THE wire format
    val inQuery = EventsSource.syntheticReferenceLines(spark, n.toLong)
      .collect().map(_.getString(0)).sorted
    assert(inQuery.toSeq == lines(n).sorted.toSeq)
  }

  test("kafka reader path is wired; executing it without the connector names the missing source") {
    val e = intercept[Exception](EventsSource.kafkaStream(spark))
    assert(Option(e.getMessage).exists(_.toLowerCase.contains("kafka")),
      s"expected the missing kafka source to be named, got: ${e.getMessage}")
  }

  test("synthetic kafka frame has the exact format(\"kafka\") schema and offset discipline") {
    val frame = EventsSource.syntheticKafkaFrame(spark, 1000L, 4)
    // the seven columns spark-sql-kafka yields, same names, same types —
    // downstream code written against this frame runs unchanged on the
    // real connector
    assert(frame.schema.map(f => (f.name, f.dataType.simpleString)) == Seq(
      "key" -> "binary", "value" -> "binary", "topic" -> "string",
      "partition" -> "int", "offset" -> "bigint",
      "timestamp" -> "timestamp", "timestampType" -> "int"))
    // offsets are per-partition monotone AND dense from 0 — what a real
    // broker hands a consumer, and what a checkpoint can commit
    import org.apache.spark.sql.functions._
    val perPart = frame.groupBy("partition")
      .agg(count(lit(1)).as("n"), min("offset").as("lo"), max("offset").as("hi"),
        countDistinct("offset").as("d"))
      .collect()
    assert(perPart.length == 4)
    perPart.foreach { r =>
      assert(r.getLong(2) == 0L && r.getLong(3) == r.getLong(1) - 1 &&
        r.getLong(4) == r.getLong(1),
        s"offsets not dense-from-zero in partition ${r.getInt(0)}: $r")
    }
    // the value bytes ARE the shared wire line — parseReference round-trips
    val parsed = EventsSource.parseReference(
      frame.withColumn("message", col("value").cast("string")))
    assert(parsed.filter(col("subject").isNull).count() == 0)
    assert(parsed.count() == 1000L)
  }
}
