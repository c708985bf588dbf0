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
    // cache boundary before the quality filter: filtering directly on the
    // computed quality_score predicate-pushes the whole HOF expression tree
    // below the scatter Exchange (re-inlined per reference, evaluated twice,
    // single-threaded pre-shuffle — see Dedup.shingled). On a many-split
    // 100 TB table there is no scatter and a pushed quality predicate riding
    // the scan is exactly what we'd want; there you would drop this cache.
    val quality = graft.GraftSession.trackCache(
      TextAnalysis.quality(spark, dir)
        .select("doc_id", "n_tokens", "quality_score"))
    val nonRepresentatives = Dedup.clusters(spark, dir)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")
    quality
      .filter(col("quality_score") >= 0.2)
      .join(nonRepresentatives, Seq("doc_id"), "left_anti")
  }

  /** Deterministic stratified training mixture: per predicted language,
    * keep a fixed fraction of documents selected by a reproducible hash
    * bucket (0..15 from the first md5 hex digit of doc_id — any engine
    * computes the same md5, so the "sample" is the same everywhere, the
    * ClickHouse SAMPLE-BY idea applied per stratum). en is downsampled to
    * 5/16, unknown to 2/16, the low-resource languages keep everything —
    * the up/down-weighting every LLM data-mixture step performs. The
    * predicate is a per-row hash compare: no shuffle beyond what langId
    * already does, no driver-side sampling state. */
  def trainMix(spark: SparkSession, dir: String): DataFrame = {
    val rate = when(col("pred_lang") === "en", 5)
      .when(col("pred_lang") === "unknown", 2)
      .otherwise(16)
    // cache boundary: the mixture filter references pred_lang, and without
    // the boundary the whole langId HOF tree predicate-pushes below the
    // scatter Exchange (evaluated twice, once single-threaded — see
    // Dedup.shingled for the full analysis)
    graft.GraftSession.trackCache(
      TextAnalysis.langId(spark, dir).select("doc_id", "pred_lang"))
      .withColumn("bucket", expr(
        "cast(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 1, 1)) - 1 as bigint)"))
      .filter(col("bucket") < rate)
      .select("doc_id", "pred_lang", "bucket")
  }
}
