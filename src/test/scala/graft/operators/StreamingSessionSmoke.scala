package graft.operators

import graft.SparkSpec

/** streaming_session_window == batch q_session_window, full-frame — the
  * checked key's contract, exercised in-suite so a staging/watermark/file-
  * order regression can never reach the driver gate first. */
class StreamingSessionSmoke extends SparkSpec {
  test("streaming session_window equals the batch rendition frame-for-frame") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    val batch = RefPipeline.sessionWindowAgg(spark, sf).collect().map(key).toSet
    val stream = RefPipeline.streamingSessionWindow(spark, sf).collect().map(key).toSet
    assert(stream == batch,
      s"missing=${(batch -- stream).take(3)} extra=${(stream -- batch).take(3)}")
    assert(batch.nonEmpty)
  }
}
