package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Dev scratch: per-exchange shuffle byte audit for q_pagerank (deleted
  * before round close). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "data/sf1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val df = operators.Graph.pageRank(spark, dir, iters = 5)
    val n = df.collect().length
    println(f"rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s")

    def walk(p: SparkPlan, depth: Int): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth)
        case q: QueryStageExec => walk(q.plan, depth)
        case s: ShuffleExchangeLike =>
          val m = s.metrics
          def g(k: String): Long = m.get(k).map(_.value).getOrElse(-1L)
          println("  " * depth + f"EXCHANGE write=${g("shuffleBytesWritten") / 1e6}%.1f MB " +
            f"records=${g("shuffleRecordsWritten")} parts=${s.numPartitions} " +
            s"node=${s.child.nodeName}")
          s.children.foreach(walk(_, depth + 1))
        case _ =>
          p.children.foreach(walk(_, depth + 1))
          p.subqueries.foreach(walk(_, depth + 1))
      }
    }
    walk(df.queryExecution.executedPlan, 0)
    
    spark.stop()
  }
}
