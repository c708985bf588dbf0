package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.functions._

class EventPipelineSpec extends SparkSpec {
  import EventPipeline._

  private def ev(id: Long, sec: Long, user: Long, typ: String, value: Double): RawEvent =
    RawEvent(id, new Timestamp(sec * 1000), user, typ, value, s"""{"k": $id}""")

  test("typed extraction parses the JSON props column") {
    import spark.implicits._
    val df = typed(Seq(ev(7, 1000, 1, "click", 1.5)).toDF())
    val r = df.head
    assert(r.getAs[Long]("prop_k") == 7L)
    assert(r.getAs[String]("event_type") == "click")
  }

  test("hourlyCounts maintains windowed counts over a memory stream (the MV analog)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RawEvent]
    val q = hourlyCounts(typed(input.toDF()))
      .writeStream.format("memory").queryName("hourly").outputMode(OutputMode.Update()).start()
    try {
      val h0 = 1700000000L - (1700000000L % 3600)
      input.addData(ev(1, h0 + 10, 1, "click", 1.0), ev(2, h0 + 20, 2, "click", 2.0),
        ev(3, h0 + 3700, 1, "buy", 5.0))
      q.processAllAvailable()
      val rows = spark.table("hourly").collect()
      val clicks = rows.filter(_.getAs[String]("event_type") == "click")
      assert(clicks.map(_.getAs[Long]("n")).sum == 2L)
      assert(rows.exists(r => r.getAs[String]("event_type") == "buy" && r.getAs[Long]("n") == 1L))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization closes a session after a 30-min gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val input = MemoryStream[RawEvent]
    val q = sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions").outputMode(OutputMode.Append()).start()
    try {
      val t0 = 1700000000L
      // session 1: two events 10s apart; then a 1h gap opens session 2
      input.addData(ev(1, t0, 42, "click", 1.0), ev(2, t0 + 10, 42, "click", 2.0))
      q.processAllAvailable()
      input.addData(ev(3, t0 + 3610, 42, "click", 3.0))
      q.processAllAvailable()
      // watermark advance so the first session's timeout fires
      input.addData(ev(4, t0 + 9000, 7, "click", 0.5))
      q.processAllAvailable()
      input.addData(ev(5, t0 + 12000, 7, "click", 0.5))
      q.processAllAvailable()
      val sessions = spark.table("sessions").filter(col("user_id") === 42).collect()
      assert(sessions.nonEmpty, "expected the first session for user 42 to be emitted")
      val first = sessions.minBy(_.getAs[Long]("start_s"))
      assert(first.getAs[Long]("n_events") == 2L)
      assert(first.getAs[Long]("end_s") - first.getAs[Long]("start_s") == 10L)
      assert(first.getAs[Double]("total_value") == 3.0)
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases only to an in-window signup") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RawEvent]
    val q = purchaseAttribution(typed(input.toDF()))
      .writeStream.format("memory").queryName("attrib").outputMode(OutputMode.Append()).start()
    try {
      val t0 = 1700000000L
      val week = 7L * 24 * 3600
      input.addData(
        ev(1, t0, 42, "signup", 0.0),
        ev(2, t0 + 100, 42, "purchase", 9.5), // in window -> attributed
        ev(3, t0 + 100, 7, "purchase", 3.0), // user 7 never signed up -> dropped
        ev(4, t0 + week + 3600, 42, "purchase", 1.0)) // past the 7-day window -> dropped
      q.processAllAvailable()
      // advance both watermarks so the join state for t0's signup can close
      input.addData(ev(5, t0 + week + 7200, 9, "signup", 0.0),
        ev(6, t0 + week + 7200, 9, "purchase", 2.0))
      q.processAllAvailable()
      val rows = spark.table("attrib").collect()
      val attributed = rows.map(r => r.getAs[Long]("purchase_id")).toSet
      assert(attributed == Set(2L, 6L), s"got $attributed")
      val r2 = rows.find(_.getAs[Long]("purchase_id") == 2L).get
      assert(r2.getAs[Long]("user_id") == 42L)
      assert(r2.getAs[Timestamp]("signup_ts").getTime == t0 * 1000)
    } finally q.stop()
  }

  test("batch and streaming sessionization agree on closed sessions") {
    // RefPipeline.sessionize (batch) on the events table is the ground
    // truth; the streaming operator must produce the same closed sessions.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    val batch = graft.operators.RefPipeline.sessionize(spark, sf)
      .select("user_id", "start_s", "end_s", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    val events = graft.Tables(spark, sf).events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))
      .as[RawEvent].collect().sortBy(_.ts.getTime)
    val input = MemoryStream[RawEvent]
    val q = sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions_full").outputMode(OutputMode.Append()).start()
    try {
      input.addData(events.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("sessions_full")
        .select("user_id", "start_s", "end_s", "n_events").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      // streaming only emits sessions closed by the watermark; all of those
      // must exist identically in the batch result
      assert(streamed.nonEmpty)
      assert(streamed.subsetOf(batch),
        s"streaming emitted sessions absent from batch: ${streamed.diff(batch).take(5)}")
    } finally q.stop()
  }
}
