package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation: the composition every LLM data
  * pipeline runs before tokenization —
  *
  *   quality filter  →  near-dup clustering  →  keep one doc per cluster
  *
  * Each stage is one of the already-verified operators; composing them stays
  * fully declarative, so Catalyst fuses the quality projection into the scan
  * and the dedup anti-join is the only extra shuffle beyond the cluster
  * computation itself.
  */
object Pipeline {

  /** Documents surviving quality >= 0.2 and near-dup representative
    * selection (cluster representative = min doc_id, from
    * [[Dedup.clusters]]). */
  def cleanCorpus(spark: SparkSession, dir: String): DataFrame = {
    val quality = TextAnalysis.quality(spark, dir)
      .select("doc_id", "n_tokens", "quality_score")
    val nonRepresentatives = Dedup.clusters(spark, dir)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")
    quality
      .filter(col("quality_score") >= 0.2)
      .join(nonRepresentatives, Seq("doc_id"), "left_anti")
  }
}
