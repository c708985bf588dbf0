package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {

  test("approx_count_distinct stays within 5% of the exact distinct count") {
    Analytics.approxDistinct(spark, sf).collect().foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getAs[String]("event_type")}: approx=$approx exact=$exact")
    }
  }

  test("approx_percentile stays within 5% of the exact interpolated quantiles") {
    Analytics.approxQuantiles(spark, sf).collect().foreach { r =>
      Seq(("p50_approx", "p50_exact"), ("p90_approx", "p90_exact")).foreach { case (a, e) =>
        val approx = r.getAs[Double](a)
        val exact = r.getAs[Double](e)
        assert(math.abs(approx - exact) / math.max(exact, 1e-9) <= 0.05,
          s"${r.getAs[String]("event_type")} $a=$approx vs $e=$exact")
      }
    }
  }

  test("as-of join only ever pairs a purchase with an EARLIER error of the same user") {
    val events = graft.Tables(spark, sf).events
      .select(col("event_id"), col("user_id"), col("event_type"), unix_micros(col("ts")).as("tus"))
    val byId = events.collect().map(r => r.getLong(0) -> r).toMap
    Analytics.asofJoin(spark, sf).collect().foreach { r =>
      if (!r.isNullAt(2)) {
        val purchase = byId(r.getLong(0))
        val error = byId(r.getLong(2))
        assert(error.getString(2) == "error")
        assert(error.getLong(1) == purchase.getLong(1))
        assert(error.getLong(3) <= purchase.getLong(3))
      }
    }
  }

  test("heavy-hitters sketch equals the exact ranked top-10 at this vocabulary size") {
    val sketch = Analytics.heavyHitters(spark, sf)
      .orderBy("rnk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Long]("rnk")))
    assert(sketch.length == 10)
    assert(sketch.map(_._3).toSeq == (1L to 10L), "ranks must be 1..10")
    val exact = Analytics.topTerms(spark, sf)
      .orderBy(col("cf").desc, col("term")).limit(10).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("cf"))
    // tracker capacity covers the vocabulary, so counts are exact and the
    // deterministic re-rank makes the whole ranked list equal — the same
    // equality the SQL oracle checks
    assert(sketch.map(t => (t._1, t._2)).toSeq == exact.toSeq,
      s"sketch=${sketch.toSeq} exact=${exact.toSeq}")
  }

  test("window funnel levels partition the signup cohort") {
    val lvls = Analytics.windowFunnel(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val signups = graft.Tables(spark, sf).events
      .filter(col("event_type") === "signup").select("user_id").distinct().count()
    assert(lvls.keySet.subsetOf(Set(1L, 2L, 3L)))
    assert(lvls.values.sum == signups, s"levels $lvls must cover all $signups signup users")
  }

  test("streaming dedup drops replayed event_ids within the watermark") {
    import graft.streaming.EventPipeline.RawEvent
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[RawEvent]
    val deduped = input.toDF()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      val t0 = 1700000000000L
      def ev(id: Long, off: Long) =
        RawEvent(id, new java.sql.Timestamp(t0 + off), 1, "click", 1.0, "{}")
      input.addData(ev(1, 0), ev(2, 1000), ev(1, 2000)) // replayed id=1
      q.processAllAvailable()
      input.addData(ev(2, 3000), ev(3, 4000)) // replayed id=2 in a later batch
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select("event_id").collect().map(_.getLong(0))
      assert(ids.sorted.toSeq == Seq(1L, 2L, 3L), s"got ${ids.toSeq}")
    } finally q.stop()
  }
}
