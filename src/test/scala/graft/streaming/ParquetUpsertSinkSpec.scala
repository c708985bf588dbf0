package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.sources.EventsSource

class ParquetUpsertSinkSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("replaying a batchId is a no-op: the partition is overwritten, never duplicated") {
    import spark.implicits._
    val path = tmp("graft-upsert")
    val b5 = Seq(("click", 3L), ("buy", 1L)).toDF("event_type", "n")
    ParquetUpsertSink.writeBatch(b5, 5L, path)
    // crash-replay: the SAME batch lands again under the SAME id
    ParquetUpsertSink.writeBatch(b5, 5L, path)
    val afterReplay = ParquetUpsertSink.read(spark, path, Seq("event_type"))
    assert(afterReplay.count() == 2L, "replay must not duplicate keys")
    assert(afterReplay.filter($"event_type" === "click").head.getAs[Long]("n") == 3L)

    // a later batch refines one key; latest batch wins on read
    ParquetUpsertSink.writeBatch(Seq(("click", 7L)).toDF("event_type", "n"), 6L, path)
    val state = ParquetUpsertSink.read(spark, path, Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(state == Map("click" -> 7L, "buy" -> 1L))
  }

  test("kill + restart from checkpoint continues the aggregation without duplicates") {
    val inDir = tmp("graft-in")
    val outDir = tmp("graft-out")
    val chkDir = tmp("graft-chk")

    def line(id: Long, t: Long, typ: String, v: Double): String =
      s"""{"event_id": $id, "timestamp": $t, "user_id": ${id % 5}, "event_type": "$typ", "value": $v, "props": "{}"}"""

    def writeFile(name: String, lines: Seq[String]): Unit =
      Files.write(new java.io.File(inDir, name).toPath, lines.mkString("\n").getBytes("utf-8"))

    def counts = EventsSource.fileStream(spark, inDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("value").as("total"))

    def start() = ParquetUpsertSink.attach(counts, outDir)
      .option("checkpointLocation", chkDir).start()

    writeFile("a.ndjson", Seq(
      line(1, 1700000000000L, "click", 1.0), line(2, 1700000001000L, "click", 2.0),
      line(3, 1700000002000L, "buy", 10.0)))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // the stream is DOWN; more data arrives; a new query resumes from the
    // same checkpoint (same aggregation state, next batchId)
    writeFile("b.ndjson", Seq(
      line(4, 1700000003000L, "click", 4.0), line(5, 1700000004000L, "refund", 1.5)))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val state = ParquetUpsertSink.read(spark, outDir, Seq("event_type"))
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"), r.getAs[Double]("total"))).toSet
    assert(state == Set(("click", 3L, 7.0), ("buy", 1L, 10.0), ("refund", 1L, 1.5)),
      s"restart must refine, not duplicate; got $state")
    // exactly one surviving row per key even though click was emitted twice
    val resolved = ParquetUpsertSink.read(spark, outDir, Seq("event_type"))
    assert(resolved.groupBy("event_type").count().filter(col("count") > 1).isEmpty)
  }
}
