package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for LLM training-data pipelines, over the
  * `documents` table.
  *
  * Everything here is per-document (embarrassingly parallel, zero shuffle)
  * and built from codegen'd builtin higher-order functions
  * (`filter`/`transform`/`aggregate` on arrays) — no UDFs, so the whole
  * stage stays inside WholeStageCodegen and scales linearly with input
  * splits at 100 TB.
  */
object TextAnalysis {

  /** Non-empty whitespace tokens. */
  val tokensExpr = "filter(split(text, ' '), x -> x != '')"

  private def withTokens(df: DataFrame): DataFrame =
    df.withColumn("tk", expr(tokensExpr))

  /** Token + character counting (the `tiktoken`-shaped pre-pass: whitespace
    * tokens plus a BPE-ish sub-word estimate of ~4 chars/token). */
  def tokens(spark: SparkSession, dir: String): DataFrame =
    withTokens(Tables(spark, dir).documents.select("doc_id", "text"))
      .select(
        col("doc_id"),
        size(col("tk")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars"),
        expr("cast(aggregate(tk, 0L, (a, x) -> a + length(x)) as bigint)").as("n_token_chars"),
        expr("cast(size(regexp_extract_all(text, '[a-z0-9]+', 0)) as bigint)").as("n_regex_tokens"),
        expr("cast(ceil(length(text) / 4.0) as bigint)").as("n_bpe_est"))

  /** Quality scoring: stopword ratio, mean token length, and a composite
    * score — the usual cheap filters before expensive dedup/classify
    * stages. */
  def quality(spark: SparkSession, dir: String): DataFrame =
    withTokens(Tables(spark, dir).documents.select("doc_id", "text"))
      .withColumn("n_tok", size(col("tk")).cast("long"))
      .withColumn("n_stop", expr(
        "cast(size(filter(tk, x -> x IN ('the','a','of','and','in','to','is'))) as bigint)"))
      .select(
        col("doc_id"),
        col("n_tok").as("n_tokens"),
        when(col("n_tok") > 0,
          round(expr("aggregate(tk, 0L, (a, x) -> a + length(x))") /
            col("n_tok").cast("double"), 4)).otherwise(0.0).as("avg_token_len"),
        when(col("n_tok") > 0,
          round(col("n_stop") / col("n_tok").cast("double"), 4))
          .otherwise(0.0).as("stop_ratio"),
        when(col("n_tok") > 0,
          round(least(lit(1.0), col("n_tok") / lit(100.0)) *
            (lit(1.0) - col("n_stop") / col("n_tok").cast("double")), 4))
          .otherwise(0.0).as("quality_score"))

  private def hits(markers: Seq[String]): Column = {
    val cond = markers.map(m => s"x = '$m'").mkString(" OR ")
    expr(s"cast(size(filter(tk, x -> $cond)) as bigint)")
  }

  /** Language-ID by marker-stopword voting (the classic fastText-free
    * n-gram heuristic). Deterministic argmax with fixed priority order. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val en = Seq("the", "a", "of", "and", "is")
    val de = Seq("der", "die", "das", "und", "ist")
    val fr = Seq("le", "la", "et", "est", "les")
    val es = Seq("el", "los", "y", "es", "las")
    withTokens(Tables(spark, dir).documents.select("doc_id", "text"))
      .withColumn("hits_en", hits(en))
      .withColumn("hits_de", hits(de))
      .withColumn("hits_fr", hits(fr))
      .withColumn("hits_es", hits(es))
      .select(
        col("doc_id"), col("hits_en"), col("hits_de"), col("hits_fr"), col("hits_es"),
        when(col("hits_en") + col("hits_de") + col("hits_fr") + col("hits_es") === 0, "unknown")
          .when(col("hits_en") >= col("hits_de") && col("hits_en") >= col("hits_fr") &&
            col("hits_en") >= col("hits_es"), "en")
          .when(col("hits_de") >= col("hits_fr") && col("hits_de") >= col("hits_es"), "de")
          .when(col("hits_fr") >= col("hits_es"), "fr")
          .otherwise("es").as("pred_lang"))
  }

  /** Corpus bigram statistics (df/cf) — the 2-gram language-model pre-pass
    * next to [[Analytics.topTerms]]'s unigram inverted index. Bigrams are
    * built map-side from the token array (no shuffle of text), then one
    * partial-aggregated shuffle on the bigram key. */
  def bigrams(spark: SparkSession, dir: String): DataFrame =
    withTokens(Tables(spark, dir).documents.select("doc_id", "text"))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(tk) >= 2
          |  THEN transform(sequence(0, size(tk) - 2), i -> concat(tk[i], ' ', tk[i + 1]))
          |  ELSE cast(array() as array<string>) END""".stripMargin)).as("bigram"))
      .groupBy("bigram")
      .agg(countDistinct("doc_id").as("df"), count(lit(1)).as("cf"))

  /** Per-document top keyword by tf-idf (idf = ln(N/df)) — the classic
    * keyword-extraction pass. Corpus stats (N, per-term df) are computed
    * once and broadcast onto the per-doc term frequencies; the winner is a
    * row_number over the ROUNDED score with a term tiebreak, so the answer
    * is deterministic under float noise. Nothing is collected to the
    * driver — N rides a broadcast single-row frame. */
  def tfidfTop(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val tok = withTokens(docs.select("doc_id", "text"))
      .select(col("doc_id"), explode(col("tk")).as("term"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    // tf has exactly one row per (doc, term), so df is a plain count over
    // it - no second tokenize pass and no countDistinct shuffle
    val tf = graft.GraftSession.trackCache(
      tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf") * log(col("n_docs").cast("double") / col("df")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(round(col("score"), 6).desc, col("term"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("term").as("top_term"),
        col("tf"), col("df"), round(col("score"), 4).as("tfidf"))
  }

  /** Order-sensitive document fingerprint: position-weighted polynomial over
    * (token length, leading byte). Cheap rolling-hash-style signature whose
    * arithmetic is reproducible in any ANSI-ish SQL engine (the oracle). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    withTokens(Tables(spark, dir).documents.select("doc_id", "text"))
      .select(
        col("doc_id"),
        expr("cast(aggregate(transform(tk, (x, i) -> cast(i + 1 as bigint) * (length(x) * 17 + ascii(x))), 0L, (a, b) -> a + b) as bigint)")
          .as("fp"))
}
