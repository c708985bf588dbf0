package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

class BenchSpec extends SparkSpec {

  test("a throwing query is reported as an error and excluded from the total") {
    val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
      "ok" -> ((s, dir) => s.read.parquet(s"$dir/region.parquet")),
      "boom" -> ((_, _) => throw new IllegalStateException("synthetic failure")))
    val (timings, errors, probes) = Bench.run(spark, sf, Seq("ok", "boom"), queries, instrument = true)
    assert(timings.map(_._1) == Seq("ok"))
    assert(errors.map(_._1) == Seq("boom"))
    assert(errors.head._2.contains("IllegalStateException"))
    // only the successful query carries probe evidence
    assert(probes.map(_._1) == Seq("ok"))
    val json = Bench.renderJson(timings, errors, sf)
    // the failed query must not appear among the timings nor inflate value
    assert(json.contains("\"errors\":{\"boom\":"))
    assert(!json.contains("\"boom\":-"))
    // probe evidence goes to the SIDECAR json, never the driver line
    assert(!json.contains("\"probe\""))
    val probeJson = Bench.renderProbeJson(timings, probes, sf)
    assert(probeJson.contains("\"ok\":{\"wallS\":"))
    assert(probeJson.contains("\"cpuS\":"))
    val value = json.split("\"value\":")(1).split(",")(0).toDouble
    assert(math.abs(value - timings.map(_._2).sum) < 0.01)
  }

  test("headline JSON stays well-formed with no errors") {
    val json = Bench.renderJson(Seq("a" -> 1.5, "b" -> 0.5), Nil, "/x")
    assert(json == """{"metric":"total","value":2.0,"unit":"sec","queries":{"a":1.5,"b":0.5},"errors":{},"sf":"/x"}""")
  }
}
