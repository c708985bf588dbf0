package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: prints the formatted physical plan of selected queries so the
  * scan pruning (`ReadSchema`), predicate pushdown (`PushedFilters`),
  * broadcast choices, and WholeStageCodegen spans can be audited.
  * Usage: runMain graft.Explain [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_pricing", "q3_shipping", "q5_region_revenue")
    val out = sys.env.get("GRAFT_EXPLAIN_OUT").map(p => new java.io.PrintWriter(p))
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          val header = s"\n========== $name =========="
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          println(header); println(plan)
          out.foreach { w => w.println(header); w.println(plan) }
        case None => println(s"unknown query: $name")
      }
    }
    out.foreach(_.close())
    spark.stop()
  }
}
