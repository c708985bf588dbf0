package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twin of the reference's Kafka → ClickHouse pipeline
  * (anelook/apache-kafka-clickhouse-demo README.rst Steps 1-4).
  *
  * Reference concept            → Spark-native form here
  *  - Kafka engine table          `readStream` source (kafka/file/memory —
  *                                the transforms are source-agnostic)
  *  - JSONAsString + MV extract   [[typed]] (`from_json` projection)
  *  - MV → MergeTree table        `writeStream.foreachBatch` idempotent
  *                                append/upsert ([[toSink]])
  *  - class_attendance_granular   [[hourlyCounts]] (watermark + window agg;
  *                                the watermark replaces the reference's
  *                                manual "future timestamp cutover" trick
  *                                for the backfill/live seam)
  *  - SummingMergeTree *State     Spark's partial aggregation + state store
  *                                (update-mode windowed agg IS maxState/
  *                                maxMerge, maintained incrementally)
  *  - (beyond the reference)      [[sessionize]]: gap-based sessions with
  *                                `flatMapGroupsWithState`
  */
object EventPipeline {

  final case class RawEvent(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  final case class SessionOut(user_id: Long, start_s: Long, end_s: Long,
      n_events: Long, total_value: Double)

  /** Internal per-user state for [[sessionize]] (public: the state-store
    * encoder's generated code needs a visible constructor). */
  final case class SessionState(start_s: Long, last_s: Long,
      n_events: Long, total_value: Double)

  /** JSON-as-string → typed columns (the materialized-view extraction). */
  def typed(raw: DataFrame): DataFrame =
    raw.select(
      col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"),
      get_json_object(col("props"), "$.k").cast("long").as("prop_k"))

  /** Watermarked hourly counts per event type — the continuously-maintained
    * `class_attendance_granular`. Late data beyond 30 min is dropped
    * deterministically instead of the reference's manual cutover. */
  def hourlyCounts(typedEvents: DataFrame): DataFrame =
    typedEvents
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("window.start").as("bucket"), col("event_type"), col("n"), col("total_value"))

  /** Gap-based sessionization (30-min inactivity timeout) with explicit
    * per-key state — the streaming twin of RefPipeline.sessionize. State is
    * one small record per active user; the state store shuffles once on
    * user_id and stays partitioned there. */
  def sessionize(typedEvents: Dataset[RawEvent])(implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    typedEvents
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, events: Iterator[RawEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.start_s, s.last_s, s.n_events, s.total_value))
          } else {
            val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime / 1000
              cur match {
                case Some(s) if t - s.last_s <= 1800 =>
                  cur = Some(s.copy(last_s = t, n_events = s.n_events + 1,
                    total_value = s.total_value + e.value))
                case Some(s) =>
                  closed += SessionOut(userId, s.start_s, s.last_s, s.n_events, s.total_value)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last_s * 1000 + 30 * 60 * 1000)
            }
            closed.result().iterator
          }
      }
  }

  /** Stream-stream interval join: every purchase attributed to the same
    * user's signup within the preceding 7 days — the streaming twin of the
    * batch funnel (Analytics.funnel). Both sides carry a watermark and the
    * join condition bounds event time on BOTH ends, so the state store can
    * evict: a signup is held for the 7-day attribution window plus the
    * 1-hour late allowance (the inherent state floor of the semantics —
    * nothing extra is retained), and each side shuffles once on user_id. */
  def purchaseAttribution(typedEvents: DataFrame): DataFrame = {
    val signups = typedEvents.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
      .withWatermark("s_ts", "1 hour")
    val purchases = typedEvents.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("value"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    purchases.join(signups,
      expr("p_user = s_user AND p_ts >= s_ts AND p_ts <= s_ts + interval 7 days"))
      .select(col("purchase_id"), col("p_user").as("user_id"), col("value"),
        col("s_ts").as("signup_ts"), col("p_ts").as("purchase_ts"))
  }

  /** The "MergeTree sink": idempotent micro-batch upsert into a parquet
    * table via [[ParquetUpsertSink]] (overwrite-by-batchId, so a replayed
    * batch rewrites its own partition instead of duplicating). The
    * exactly-once behavior is DEMONSTRATED, not asserted:
    * ParquetUpsertSinkSpec replays a batchId and kills/restarts a
    * checkpointed stream mid-flow. A JDBC/warehouse writer slots into the
    * same contract with a keyed MERGE per (batchId, key). */
  def toSink(aggregated: DataFrame, sinkPath: String)(implicit spark: SparkSession) =
    ParquetUpsertSink.attach(aggregated, sinkPath)
}
