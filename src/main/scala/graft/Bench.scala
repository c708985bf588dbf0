package graft

import org.apache.spark.sql.SparkSession

/** Benchmark entrypoint: runs the headline queries on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line for the driver. */
object Bench {
  // Headline set: the scale-sensitive operators (scans+joins+aggs, the
  // shingle-join dedups, ANN, sessionization windows).
  val headline: Seq[String] = Seq(
    "q1_pricing", "q3_shipping", "q5_region_revenue", "q_top_customers",
    "attendance_daily", "sessionize", "q_asof_join",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_embedding", "dedup_simhash",
    "ann_topk", "text_quality", "text_fingerprint")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.queries
    // one warm-up pass on the smallest table to absorb JVM/codegen startup
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val results = headline.flatMap { name =>
      queries.get(name).map { fn =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
