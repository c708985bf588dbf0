package graft

/** Per-operator wall-clock profiler (dev utility, NOT part of the driver
  * contract). Times any subset of `SparkEntry.queries` on
  * SPARK_GRAFT_SF_DIR with the same sweep-between-queries discipline the
  * bench uses, so a regression can be localized without editing
  * [[Bench]]'s headline list.
  *
  * Usage (sbt shell): `runMain graft.Probe dedup_simhash dedup_ngram_jaccard`
  * — no args runs the full bench headline set.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    spark.read.parquet(s"$dir/region.parquet").count() // JVM/codegen warmup
    val names = if (args.nonEmpty) args.toSeq else Bench.headline
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          val t0 = System.nanoTime()
          val n = fn(spark, dir).count()
          println(f"PROBE $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
        case None => println(s"PROBE $name UNKNOWN (not a SparkEntry.queries key)")
      }
    }
    GraftSession.sweepCaches(spark)
    spark.stop()
  }
}
