package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

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

  /** Positional W-token window hashes over a `tk` array column —
    * `transform(sequence(0, size(tk) - w), i -> xxhash64(tk[i..i+w-1]))`,
    * the boundary-safe chained-hash contract of [[Dedup.shinglesExpr]]
    * (the paired DuckDB oracles join STRING grams, so a hash collision
    * surfaces as a driver mismatch). One definition shared by
    * [[dupSpans]] (intra+inter-doc repetition) and
    * [[Dedup.substringDedup]] (strictly cross-doc) so the gram identity
    * cannot silently diverge between them. */
  private[operators] def posGramsExpr(w: Int): String = {
    val hashArgs = (0 until w).map(i => s"tk[i + $i]").mkString(", ")
    s"transform(sequence(0, size(tk) - $w), i -> xxhash64($hashArgs))"
  }

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
    qualityOf(Tables(spark, dir).documents.select("doc_id", "text"))

  /** [[quality]] over a caller-supplied `(doc_id, text)` frame — the same
    * expressions, so a consumer that only needs scores for a SUBSET of
    * documents (e.g. [[Pipeline.keepBest]]'s cluster members) can
    * restrict the frame first and pay the tokenize pass only on the
    * surviving rows (r20, guide §8: decide with small rows, run the
    * expensive per-row work after the decision). */
  private[operators] def qualityOf(docs: DataFrame): DataFrame =
    withTokens(docs)
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

  /** Appends `hits_en/de/fr/es` and the `pred_lang` vote to any frame
    * carrying a `tk` token column — ONE source of truth for the marker
    * lists and the argmax priority order, shared by [[langId]] and
    * `Pipeline.dataCard` (which inlines the vote into its own scan pass
    * instead of self-joining two documents-derived frames). */
  private[operators] def withLangVote(df: DataFrame): DataFrame = {
    val en = Seq("the", "a", "of", "and", "is")
    val de = Seq("der", "die", "das", "und", "ist")
    val fr = Seq("le", "la", "et", "est", "les")
    val es = Seq("el", "los", "y", "es", "las")
    df.withColumn("hits_en", hits(en))
      .withColumn("hits_de", hits(de))
      .withColumn("hits_fr", hits(fr))
      .withColumn("hits_es", hits(es))
      .withColumn("pred_lang",
        when(col("hits_en") + col("hits_de") + col("hits_fr") + col("hits_es") === 0, "unknown")
          .when(col("hits_en") >= col("hits_de") && col("hits_en") >= col("hits_fr") &&
            col("hits_en") >= col("hits_es"), "en")
          .when(col("hits_de") >= col("hits_fr") && col("hits_de") >= col("hits_es"), "de")
          .when(col("hits_fr") >= col("hits_es"), "fr")
          .otherwise("es"))
  }

  /** Language-ID by marker-stopword voting (the classic fastText-free
    * n-gram heuristic). Deterministic argmax with fixed priority order. */
  def langId(spark: SparkSession, dir: String): DataFrame =
    withLangVote(withTokens(Tables(spark, dir).documents.select("doc_id", "text")))
      .select("doc_id", "hits_en", "hits_de", "hits_fr", "hits_es", "pred_lang")

  /** Adjacent word pairs from the token array (empty below 2 tokens). */
  private[operators] val bigramsExpr =
    """CASE WHEN size(tk) >= 2
      |  THEN transform(sequence(0, size(tk) - 2), i -> concat(tk[i], ' ', tk[i + 1]))
      |  ELSE cast(array() as array<string>) END""".stripMargin

  /** Corpus bigram statistics (df/cf) — the 2-gram language-model pre-pass
    * next to [[Analytics.topTerms]]'s unigram inverted index. Bigrams are
    * built map-side from the token array (no shuffle of text), then one
    * partial-aggregated shuffle on the bigram key. */
  def bigrams(spark: SparkSession, dir: String): DataFrame =
    withTokens(Tables(spark, dir).documents.select("doc_id", "text"))
      // explode_outer + null-drop, the [[bpeEncode]] idiom (r20): plain
      // explode makes the optimizer infer `size(bigrams) > 0` from the
      // Generate and predicate-push it below the scatter Exchange — the
      // whole tokenize tree re-evaluated in the single-row-group scan
      // task, once per document, before the parallel pass even starts.
      // Bigram elements are concat()s of non-null tokens, so the
      // generated column is null ONLY for the empty/absent arrays inner
      // explode would have dropped — the null-drop restores exact inner
      // semantics and evaluates on the exploded stream, above the
      // exchange.
      .select(col("doc_id"), explode_outer(expr(bigramsExpr)).as("bigram"))
      .where(col("bigram").isNotNull)
      .groupBy("bigram")
      .agg(countDistinct("doc_id").as("df"), count(lit(1)).as("cf"))

  /** Repetition signals per document — the Gopher/MassiveText-style
    * within-doc quality battery: duplicate-token and duplicate-bigram
    * fractions plus the most-frequent-n-gram counts. LLM corpus filters
    * drop documents whose text loops (boilerplate menus, crawler traps,
    * degenerate generations); these are the standard cheap detectors.
    *
    * Scale shape: ZERO shuffle. The statistics are per document and a
    * document always fits in a task, so the native `gram_stats`
    * expression ([[graft.functions.GramStats]]) computes each family in
    * one map-side pass next to the scan — the dataflow alternative
    * (explode every gram, count per (doc, gram), roll up per doc) ships
    * the whole exploded gram stream through two aggregation exchanges
    * for numbers a single scan pass produces. Ratios are single
    * divisions of exact longs with an explicit double cast, so any
    * engine reproduces them bit-for-bit. Documents under 2 tokens carry
    * no repetition signal and are excluded by declared semantics (the
    * filter sits above a cache boundary so the stats tree never enters
    * a pushed scan predicate — the round-3 trap). */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftSession.registerFunctions(spark)
    val stats = graft.GraftSession.trackCache(
      withTokens(Tables(spark, dir).documents.select("doc_id", "text"))
        .select(col("doc_id"),
          expr("gram_stats(tk, 1)").as("u"),
          expr("gram_stats(tk, 2)").as("b")))
    stats.filter(col("u.n_grams") >= 2)
      .select(col("doc_id"),
        col("u.n_grams").as("n_tokens"),
        col("u.n_uniq").as("n_uniq_tokens"),
        col("u.top_cf").as("top_tokens_cf"),
        round((col("u.n_grams") - col("u.n_uniq")) / col("u.n_grams").cast("double"), 4)
          .as("dup_token_ratio"),
        col("b.n_grams").as("n_bigrams"),
        col("b.n_uniq").as("n_uniq_bigrams"),
        col("b.top_cf").as("top_bigrams_cf"),
        round((col("b.n_grams") - col("b.n_uniq")) / col("b.n_grams").cast("double"), 4)
          .as("dup_bigram_ratio"))
  }

  /** Per-document top keyword by tf-idf (idf = ln(N/df)) — the classic
    * keyword-extraction pass. The winner is a row_number over the ROUNDED
    * score with a term tiebreak, so the answer is deterministic under
    * float noise. Nothing is collected to the driver — N rides a
    * broadcast single-row frame.
    *
    * The per-term df frame carries NO broadcast on purpose: the
    * distinct-term universe of a web-scale corpus is billions of entries
    * (URLs, typos, code tokens), and a forced `broadcast()` overrides
    * Spark's size check into an OOM-at-scale plan.
    *
    * The join is a SALTED SHUFFLE-HASH join (r12, replacing "let AQE
    * pick"): keyed on `term` alone it serializes on a low-cardinality or
    * head-heavy term universe (the uniform 31-word fixture is the
    * extreme: every shuffle partition but ~31 empty — measured ~3
    * effective cores of 32 inside the full sf5 bench pass), so tf rows
    * route by (term, xxhash64(doc_id) mod S) and the df side replicates
    * each term S times — S× a one-row-per-TERM frame, the strictly
    * smaller side, so the overhead is bounded and hot-key rows spread
    * over S partitions regardless of the df curve. The shuffle_hash hint
    * (the jaccardPairs verify-join idiom) makes the probe side keep that
    * exchange: the event-logged alternative was AQE converting to
    * broadcast and then LOCAL-reading the probe side at ONE partition,
    * which ran join+score+window-partial single-task (22.9 s of an
    * isolated 23 s sf5 wall, stage-log-verified) — and a driver-side
    * broadcast hash build of a web-scale term table is the OOM plan the
    * no-broadcast rule exists to prevent. */
  def tfidfTop(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    // explode_outer + null-drop (r20, the [[bigrams]] rationale): keeps
    // the Generate-inferred `size(tk) > 0` filter — and with it the whole
    // re-inlined tokenize — out of the single-row-group scan stage
    val tok = withTokens(docs.select("doc_id", "text"))
      .select(col("doc_id"), explode_outer(col("tk")).as("term"))
      .where(col("term").isNotNull)
    val n = docs.agg(count(lit(1)).as("n_docs"))
    // tf has exactly one row per (doc, term), so df is a plain count over
    // it - no second tokenize pass and no countDistinct shuffle
    val tf = graft.GraftSession.trackCache(
      tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
    val salts = 8
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .withColumn("__salt", explode(expr(s"sequence(0, ${salts - 1})")))
    tf.withColumn("__salt",
        pmod(xxhash64(col("doc_id")), lit(salts)).cast("int"))
      .join(df.hint("shuffle_hash"), Seq("term", "__salt"))
      .drop("__salt")
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

  /** BM25 retrieval top-k (`text_bm25`) — the production keyword-retrieval
    * scorer (Robertson & Zaragoza 2009, the Lucene/Okapi form with the
    * +1-shifted always-positive idf; k1 = 1.2, b = 0.75): score every
    * document against a DETERMINISTIC three-term probe query — the
    * df-ranked terms at positions 1, 7 and 23 (a high/mid/low
    * document-frequency spread that exists in any corpus with ≥ 23
    * distinct terms; df ties break on term text) — and return the global
    * top 20 documents.
    *
    * Scale shape: `tf` is the same one-row-per-(doc, term) aggregate
    * [[tfidfTop]] builds (df = a plain count over it — no second tokenize
    * pass, no countDistinct); the probe-term table is THREE rows, so the
    * scoring join is a genuine `broadcast` (contrast tfidf's deliberately
    * unhinted full-vocabulary df join); `avgdl` is one map-side scan
    * aggregate (two exact BIGINTs to one row, no shuffle), quantized to
    * 1e-4 in-engine before use; per-(doc, term) scores quantize to 1e-4
    * BIGINTs BEFORE the per-doc sum, so float summation order can never
    * move the result (SURVEY §5); the final top-20 is a constant-k
    * TakeOrderedAndProject (per-partition heaps — k is 20, never a
    * corpus fraction). The one float expression is written once in the
    * exact operand order the DuckDB oracle mirrors. */
  def bm25(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    // explode_outer + null-drop (r20, the [[bigrams]] rationale). The old
    // explicit `size(tk) >= 1` pre-filter was itself the round-3 trap (a
    // predicate on the computed token column, pushed below the scatter
    // Exchange with the whole tokenize re-inlined) AND redundant: a
    // 0-token doc emits no term row under inner-explode semantics either.
    val tok = withTokens(docs.select("doc_id", "text"))
      .select(col("doc_id"), expr("cast(size(tk) as bigint)").as("dl"),
        explode_outer(col("tk")).as("term"))
      .where(col("term").isNotNull)
    val tf = graft.GraftSession.trackCache(
      tok.groupBy("doc_id", "term")
        .agg(count(lit(1)).as("tf"), max("dl").as("dl")))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // probe-query selection: vocabulary-sized frame, bounded 1-partition
    // rank (the wh_dictionary_encode contract — never corpus-sized)
    val q = GlobalRank.boundedRowNumbered(df, "r", col("df").desc, col("term"))
      .filter(col("r").isin(1L, 7L, 23L)).select("term", "df")
    val n = docs.agg(count(lit(1)).as("n_docs"))
    // avgdl off the CACHED tf aggregate (per-doc dl rides every tf row),
    // not a second tokenize scan — the dsir "heavy string work never
    // runs twice" rule; same doc set (both exclude zero-token docs)
    val ad = tf.groupBy("doc_id").agg(max("dl").as("dl"))
      .agg((floor(sum(col("dl")).cast("double")
        / count(lit(1)) * 1e4 + 0.5) / 1e4).as("avgdl"))
    tf.join(broadcast(q), Seq("term"))
      .crossJoin(broadcast(n)).crossJoin(broadcast(ad))
      .withColumn("s_q4", floor(
        log((col("n_docs").cast("double") - col("df") + 0.5)
            / (col("df") + 0.5) + 1.0)
          * ((col("tf").cast("double") * 2.2)
            / (col("tf").cast("double")
              + lit(1.2) * (lit(0.25)
                + lit(0.75) * (col("dl").cast("double") / col("avgdl")))))
          * 1e4 + 0.5).cast("long"))
      .groupBy("doc_id").agg(sum("s_q4").as("score_q4"))
      .orderBy(col("score_q4").desc, col("doc_id"))
      .limit(20)
      .select("doc_id", "score_q4")
  }

  /** PII patterns, written in the regex subset Java (Spark) and RE2
    * (DuckDB, Go tooling) interpret identically: character classes, bounded
    * repetition, optional groups — no backreferences, no lookaround. */
  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val PhoneRe = "(\\+[0-9]{1,2}[- ])?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}"
  private[graft] val IpRe = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** PII scrubbing core over a (doc_id, text) frame — public so the spec
    * can drive it with synthetic PII-laden documents (the driver corpus
    * contains no digits or '@', so on it every count is zero and the
    * redacted hash equals the original's; the oracle still proves the
    * Spark and DuckDB regex engines agree on that). Counts are taken on
    * the ORIGINAL text; redaction applies email → phone → IP in that
    * fixed order (the oracle mirrors it, so overlapping matches resolve
    * identically). */
  def piiRedact(df: DataFrame): DataFrame = {
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), lit(EmailRe), lit("<EMAIL>")),
          lit(PhoneRe), lit("<PHONE>")),
        lit(IpRe), lit("<IP>"))
    df.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0))).cast("long").as("n_phones"),
      size(regexp_extract_all(col("text"), lit(IpRe), lit(0))).cast("long").as("n_ips"),
      length(redacted).cast("long").as("n_chars_redacted"),
      md5(redacted).as("redacted_md5"))
  }

  /** PII redaction pass over the corpus — the compliance scrub every
    * training pipeline runs (emails, phone numbers, IP addresses → typed
    * placeholder tags). Pure map-side regex work in one codegen'd
    * projection: text never shuffles, and at 100 TB the pass scales with
    * scan splits exactly like [[tokens]]. */
  def pii(spark: SparkSession, dir: String): DataFrame =
    piiRedact(Tables(spark, dir).documents.select("doc_id", "text"))

  /** Order-sensitive document fingerprint: position-weighted polynomial over
    * (token length, leading byte). Cheap rolling-hash-style signature whose
    * arithmetic is reproducible in any ANSI-ish SQL engine (the oracle). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    withTokens(Tables(spark, dir).documents.select("doc_id", "text"))
      .select(
        col("doc_id"),
        expr("cast(aggregate(transform(tk, (x, i) -> cast(i + 1 as bigint) * (length(x) * 17 + ascii(x))), 0L, (a, b) -> a + b) as bigint)")
          .as("fp"))

  /** Unigram-LM perplexity scoring — the KenLM-shaped quality signal
    * (CCNet/RefinedWeb/FineWeb all gate on LM perplexity): each document's
    * mean token surprisal `-ln p(token)` under the corpus's own unigram
    * model. Degenerate/repetitive text scores low (its tokens are the
    * corpus's commonest), rare-garbage scores high — documents far from
    * either tail are the keepers.
    *
    * Cross-engine float contract (SURVEY §5): `ln` is NOT correctly
    * rounded by either engine's libm, so per-term surprisal is QUANTIZED
    * once to 1e-4 nats (`floor(ln(T/cf)*1e4 + 0.5)` — a last-ulp
    * disagreement flips the floor only within ~2e-15 of a boundary, odds
    * ~1e-9 over a 31-term vocabulary) and every downstream step is exact
    * BIGINT arithmetic until one final identical double division.
    *
    * Scale shape: tf comes from the one tokenize pass (cached, same frame
    * [[tfidfTop]] derives df from), cf/T are one partial-agg shuffle over
    * (term) — vocabulary-sized, not corpus-sized — and the per-doc sum is
    * one shuffle on doc_id. The single-row total rides a broadcast; the
    * cf side joins unhinted so AQE broadcasts it exactly while the
    * vocabulary fits (the tfidf lesson). */
  def perplexity(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    // explode_outer + null-drop (r20, the [[bigrams]] rationale)
    val tok = withTokens(docs.select("doc_id", "text"))
      .select(col("doc_id"), explode_outer(col("tk")).as("term"))
      .where(col("term").isNotNull)
    val tf = graft.GraftSession.trackCache(
      tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
    val cf = tf.groupBy("term").agg(sum("tf").as("cf"))
    val total = cf.agg(sum("cf").as("t_total"))
    tf.join(cf, Seq("term"))
      .crossJoin(broadcast(total))
      // surprisal in 1e-4-nat units, exact BIGINT from here on
      .withColumn("s_q", expr(
        "cast(floor(ln(cast(t_total as double) / cast(cf as double)) * 10000 + 0.5) as bigint)"))
      .groupBy("doc_id")
      .agg(sum("tf").cast("long").as("n_tok"),
        sum(col("tf") * col("s_q")).cast("long").as("sum_s_q"))
      .select(col("doc_id"), col("n_tok"), col("sum_s_q"),
        // one double division both engines perform identically, then the
        // HALF_UP floor trick (round() differs cross-engine on ties);
        // sum_s_q/n_tok is already in 1e-4-nat units, so rounding it to an
        // integer IS rounding the nat value to 4 decimals
        expr("floor(cast(sum_s_q as double) / cast(n_tok as double) + 0.5) / 1e4")
          .as("avg_nll"))
  }

  /** Character-class ratios + character entropy per document — the
    * char-side half of the Gopher/FineWeb filter battery next to
    * [[quality]]'s token side (alpha ratio catches markup/binary spill,
    * char entropy catches one-character floods and base64-ish noise).
    *
    * Scale shape: ZERO shuffle — the native `char_stats` expression
    * ([[graft.functions.CharStats]]) computes counts and the quantized
    * entropy numerator in one map-side pass next to the scan, exactly
    * like `gram_stats`. Ratios are single divisions of exact longs;
    * entropy follows [[perplexity]]'s quantize-once-then-exact-BIGINT
    * contract, so the DuckDB oracle replays every bit. */
  def charStats(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftSession.registerFunctions(spark)
    Tables(spark, dir).documents
      // empty/NULL docs carry no character signal and are excluded by
      // declared semantics BOTH sides (the oracle's per-char unnest drops
      // them implicitly; this filter makes the Spark frame agree instead
      // of emitting a zero row). Raw-column predicate — pushes to the scan.
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .select(col("doc_id"), expr("char_stats(text)").as("cs"))
      .select(col("doc_id"),
        col("cs.n_chars").as("n_chars"),
        col("cs.n_alpha").as("n_alpha"),
        col("cs.n_space").as("n_space"),
        col("cs.n_uniq").as("n_uniq_chars"),
        expr("cast(cs.n_alpha as double) / cast(nullif(cs.n_chars, 0) as double)")
          .as("ratio_alpha"),
        expr("cast(cs.n_space as double) / cast(nullif(cs.n_chars, 0) as double)")
          .as("ratio_space"),
        // ent_q/n_chars is already in 1e-4-nat units; HALF_UP floor then
        // rescale = entropy rounded to 4 decimals, identically in DuckDB
        expr("floor(cast(cs.ent_q as double) / cast(nullif(cs.n_chars, 0) as double) + 0.5) / 1e4")
          .as("char_entropy"))
  }

  /** Zipf rank-frequency fit over the corpus vocabulary — the classic
    * LM-corpus health check (natural text follows cf ∝ rank^s with
    * s ≈ −1; a corpus of boilerplate or generated spam bends the line):
    * global term ranks by collection frequency, then the least-squares
    * slope/intercept of ln(cf) against ln(rank).
    *
    * Composes three proven contracts: the rank comes from
    * [[GlobalRank.rowNumbered]] (range-partitioned two-pass rank — no
    * single-partition WindowExec on a 100 TB-scale vocabulary), the
    * ln values follow [[perplexity]]'s quantize-once-to-1e-4-then-exact-
    * BIGINT drill, and the regression is [[Analytics.corrStats]]'s exact
    * integer moments finished by one identical IEEE double chain (wide
    * products held as decimal(38) — HUGEINT in the oracle).
    *
    * The (cf desc, term) tie-break makes the rank a total order, but the
    * RESULT doesn't depend on it: equal-cf terms swap ranks without
    * changing the (ln rank, ln cf) multiset, so the moments — and the one
    * output row — are tie-insensitive by construction.
    *
    * Scale shape: cf is one vocabulary-sized partial-agg shuffle off the
    * tokenize pass; the rank is the two-pass range exchange; the moments
    * collapse map-side to ONE row. */
  def zipfFit(spark: SparkSession, dir: String): DataFrame = {
    val d = (c: Column) => c.cast("double")
    // explode_outer + null-drop (r20, the [[bigrams]] rationale)
    val cf = withTokens(Tables(spark, dir).documents.select("doc_id", "text"))
      .select(explode_outer(col("tk")).as("term"))
      .where(col("term").isNotNull)
      .groupBy("term").agg(count(lit(1)).as("cf"))
    val ranked = GlobalRank.rowNumbered(cf, "rank", col("cf").desc, col("term"))
    val q = ranked.select(
      expr("cast(floor(ln(cast(rank as double)) * 10000 + 0.5) as bigint)").as("qx"),
      expr("cast(floor(ln(cast(cf as double)) * 10000 + 0.5) as bigint)").as("qy"))
    val m = q.agg(count(lit(1)).as("n"),
      sum("qx").as("sx"), sum("qy").as("sy"),
      sum(col("qx").cast("decimal(38,0)") * col("qx")).as("sxx"),
      sum(col("qx").cast("decimal(38,0)") * col("qy")).as("sxy"))
    val cxy = d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    val vx = d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val slope = cxy / vx // quantization units cancel: nats per nat
    m.select(col("n").as("n_terms"),
      // HALF_UP floor instead of round(): identical on both engines
      (floor(slope * 1e4 + lit(0.5)) / 1e4).as("zipf_slope"),
      // (sy - slope*sx)/n is already in 1e-4-nat units, so HALF_UP-flooring
      // it to an integer IS rounding the nat value to 4 decimals
      (floor((d(col("sy")) - slope * d(col("sx"))) / d(col("n")) + lit(0.5)) / 1e4)
        .as("intercept_ln_cf"))
  }

  /** Adjacent character-pair statistics (`text_bpe_pairs`) — the FIRST
    * iteration of BPE tokenizer training (count every within-word symbol
    * pair, merge the most frequent): pairs are built map-side from each
    * word with builtin `sequence`/`substring` (ASCII corpus — both
    * engines count substring positions in characters), one
    * vocabulary-sized partial-agg shuffle counts them, and the top 20 by
    * (count desc, pair) is a bounded TakeOrdered — never a global sort.
    * A full BPE trainer iterates this exact query, re-tokenizing against
    * the grown merge table each round; the per-iteration data shape is
    * what has to scale, and it is one map + one tiny-key aggregate. */
  def bpePairs(spark: SparkSession, dir: String): DataFrame =
    withTokens(Tables(spark, dir).documents.select("doc_id", "text"))
      // explode_outer (r20, the [[bigrams]] rationale); the length filter
      // right below already drops the null rows inner explode would have
      // skipped (length(NULL) >= 2 is NULL)
      .select(explode_outer(col("tk")).as("w"))
      .filter(length(col("w")) >= 2)
      // second explode likewise: for w with length >= 2 the pair array is
      // non-empty and substring() never null, so outer == inner here and
      // no inferred filter re-runs the transform
      .select(explode_outer(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair")).limit(20)

  /** URL canonicalization (`text_url_normalize`) — the CommonCrawl-era
    * dedup pre-pass: strip tracking parameters (`utm_*`, `ref`) so that
    * the same page fetched from different campaigns collapses to ONE
    * canonical URL, then roll up per host. The corpus has no URL column,
    * so the input is a deterministic in-query generator (the
    * `ref_points_by_house` precedent: row i is a pure function of i, so
    * the oracle replays the generation with no side channel); the
    * generator always emits the `id` parameter first, so tracking params
    * are strictly `&`-led and one regex strips them without re-gluing
    * separators — that invariant is declared, not assumed.
    *
    * Scale shape: generation + regex normalization + host extraction are
    * all map-side codegen'd string ops (the regexes live in the Java/RE2
    * common subset the PII key established); the only shuffles are the
    * host aggregate and the distinct for unique-clean counts — both on
    * already-collapsed frames. */
  def urlNormalize(spark: SparkSession, dir: String): DataFrame = {
    val hosts = array(Seq("example.com", "news.site.org", "blog.example.net",
      "shop.example.com", "docs.example.io").map(lit): _*)
    val urls = spark.range(0, 50000L).select(concat(
      lit("https://"),
      element_at(hosts, (col("id") % 5 + 1).cast("int")),
      lit("/p"), (col("id") % 97).cast("string"),
      lit("?id="), (col("id") % 1000).cast("string"),
      when(col("id") % 3 === 0, lit("&utm_source=feed")).otherwise(lit("")),
      // modulus 4, deliberately coprime-ish to the host modulus 5: a
      // campaign modulus of 5 would make one whole host 100% tracked
      when(col("id") % 4 === 0, concat(lit("&utm_campaign=c"), (col("id") % 7).cast("string")))
        .otherwise(lit("")),
      when(col("id") % 11 === 0, lit("&ref=tw")).otherwise(lit(""))).as("url"))
    urls
      .withColumn("norm", regexp_replace(col("url"), "&(utm_[a-z]+|ref)=[^&]*", ""))
      .withColumn("host", regexp_extract(col("url"), "^https://([^/]+)/", 1))
      .groupBy("host")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct("norm").as("n_unique_clean"),
        sum(when(col("norm") =!= col("url"), 1L).otherwise(0L)).as("n_tracked"))
  }

  /** Repeated-substring span statistics per document — the EXACT substring
    * dedup signal (Lee et al. "Deduplicating Training Data Makes Language
    * Models Better" find verbatim ≥50-token repeats; here the unit is the
    * 8-token window): a position is DUPLICATED iff its 8-token sequence
    * occurs anywhere else in the corpus (another document OR another
    * position of the same one), and consecutive duplicated windows merge
    * into maximal spans with exact token coverage.
    *
    * NO pair join anywhere — the published suffix-array formulation is a
    * global sort; this one needs only occurrence COUNTS: (1) positional
    * 8-gram hashes explode map-side (one row per token, the same linear
    * fan-out `text_tokens` pays); (2) one gram-keyed count aggregation
    * (map-side combined, gram-vocabulary-sized output) filtered to
    * df > 1 — on natural text almost everything drops here, so the join
    * back to positions carries a sliver; (3) islands under doc-keyed
    * windows: a new span starts where `pos > lag(pos) + 8` (the previous
    * window's token range [p, p+7] no longer touches this one), so
    * `sum(flag)` numbers spans and per-span coverage is
    * `max(pos) − min(pos) + 8` — exact interval union, never double
    * counted. All windows are keyed by doc (per-doc sort only).
    *
    * Cross-engine contract: Spark grams are variadic `xxhash64` over the
    * 8 tokens, the DuckDB oracle uses the joined token strings — equal
    * df classification barring xxhash64 collisions inside one corpus (the
    * declared `dedup_ngram_jaccard` convention); all outputs are exact
    * BIGINTs except `dup_frac`, one division of exact ints rounded 1e-4. */
  def dupSpans(spark: SparkSession, dir: String): DataFrame =
    dupSpansCore(Tables(spark, dir).documents)

  /** [[dupSpans]] over any (doc_id, text) frame — spec entry point for
    * planted corpora. */
  private[operators] def dupSpansCore(documents: DataFrame): DataFrame = {
    val docs = GraftSession.trackCache(
      documents
        .select(col("doc_id"), expr(tokensExpr).as("tk"))
        .select(col("doc_id"), size(col("tk")).cast("long").as("n_tokens"), col("tk")))
    // posexplode_outer + null-drop (r20, the [[bigrams]] rationale): the
    // inferred `size(grams) > 0` filter re-evaluated the whole 8-hash
    // chain per token a second time in a Filter below the Generate;
    // grams are xxhash64 longs (never null), so the null-drop restores
    // exact inner semantics
    val pos = docs.filter(col("n_tokens") >= 8)
      .select(col("doc_id"), posexplode_outer(expr(posGramsExpr(8))).as(Seq("pos", "g")))
      .where(col("g").isNotNull)
    val dupGrams = pos.groupBy("g").count().filter(col("count") > 1).select("g")
    val dup = pos.join(dupGrams, "g").select("doc_id", "pos")
    val wOrd = Window.partitionBy("doc_id").orderBy("pos")
    val spans = dup
      .withColumn("brk",
        when(col("pos") > lag("pos", 1).over(wOrd) + 8 ||
          lag("pos", 1).over(wOrd).isNull, 1L).otherwise(0L))
      .withColumn("span_id", sum("brk").over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "span_id")
      .agg(count(lit(1)).as("n_dup_windows"),
        (max("pos") - min("pos") + 8).cast("long").as("span_tokens"))
      .groupBy("doc_id")
      .agg(sum("n_dup_windows").as("n_dup_windows"),
        count(lit(1)).as("n_spans"),
        max("span_tokens").as("max_span_tokens"),
        sum("span_tokens").as("dup_tokens"))
    docs.select("doc_id", "n_tokens")
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        greatest(col("n_tokens") - 7, lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("max_span_tokens"), lit(0L)).as("max_span_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        when(col("n_tokens") > 0,
          round(coalesce(col("dup_tokens"), lit(0L)).cast("double") /
            col("n_tokens").cast("double"), 4)).otherwise(lit(0.0)).as("dup_frac"))
  }

  /** Fuzzy dimension matching by edit distance (ClickHouse
    * `editDistance`, `text_edit_distance`): every unordered pair of
    * nation names with its Levenshtein distance — the
    * dictionary-reconciliation shape (matching free-text country
    * mentions against a canonical dimension; CHAD↔CHINA at distance 3,
    * not a corpus-side near-dup pass — that is
    * [[graft.operators.Dedup.ngramJaccard]]'s job at corpus width).
    * Scale shape: DIMENSION-sized all-pairs — |dim|² of a 25-row
    * broadcast table is 300 pairs no matter how big the fact data gets,
    * so the cross join is the honest plan; a corpus-side fuzzy join
    * would go through shingle candidates first. `levenshtein` is the
    * standard unit-cost DP — exact integer, identical in any engine. */
  def editDistancePairs(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables(spark, dir).nation.select(col("n_name"))
    val a = n.select(col("n_name").as("name_a"))
    val b = n.select(col("n_name").as("name_b"))
    a.crossJoin(broadcast(b))
      .filter(col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("edit_dist"))
  }

  /** Feature-hashing bag-of-words (`text_hashed_bow`) — the hashing
    * trick: each token maps to one of 64 dimensions by a hash of the
    * TOKEN (not a learned vocabulary), so the featurizer needs no
    * dictionary pass, no driver state, and new tokens never resize
    * anything — the classic streaming-friendly vectorizer
    * (HashingVectorizer / Vowpal Wabbit). Emitted sparse as
    * (doc_id, dim, n) rows — the layout a downstream trainer scans —
    * rather than a dense array column (which the driver's comparator
    * cannot hash, the `emb_pca` lesson).
    *
    * Scale shape: tokens explode map-side and collapse in ONE partial/
    * final aggregate keyed by (doc_id, dim) — ≤64 rows per doc reach
    * the exchange, the same per-doc-bounded shuffle every text key
    * rides. Cross-engine hash contract: dim = (first two md5 hex
    * nibbles of the token) mod 64 — the md5-based determinism
    * [[graft.operators.Pipeline]] `bucket256` established, reproducible
    * in any engine (Spark's `hash()` is Murmur3-with-Spark-seed and
    * would pin the contract to one engine). */
  def hashedBow(spark: SparkSession, dir: String): DataFrame =
    withTokens(Tables(spark, dir).documents.select("doc_id", "text"))
      // explode_outer + null-drop (r20, the [[bigrams]] rationale)
      .select(col("doc_id"), explode_outer(col("tk")).as("tok"))
      .where(col("tok").isNotNull)
      .select(col("doc_id"),
        (conv(substring(md5(col("tok")), 1, 2), 16, 10).cast("long") % 64L)
          .as("dim"))
      .groupBy("doc_id", "dim")
      .agg(count(lit(1)).as("n"))

  /** The frozen BPE merge table — the production pipeline applies a
    * tokenizer ARTIFACT (a GPT-2/Llama-style ordered merge list shipped
    * with the model), it does not train one mid-pipeline, so the list is
    * a literal here and in the DuckDB oracle (one source of truth: this
    * val renders into both engines' expressions). Rank = position
    * (1-based); pair key = `a + " " + b` — whitespace tokenization
    * guarantees tokens never contain the separator. */
  private[graft] val bpeMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "o" -> "r",
    "e" -> "r", "s" -> "t", "a" -> "t", "r" -> "o", "ro" -> "w",
    "j" -> "o", "jo" -> "i", "joi" -> "n", "s" -> "c", "sc" -> "a",
    "sca" -> "n", "h" -> "a", "ha" -> "s", "has" -> "h", "d" -> "a",
    "da" -> "t", "dat" -> "a", "k" -> "e", "ke" -> "y")

  /** One deterministic encode step shared by the corpus operator and the
    * Round12Spec driver replay: merge the LEFTMOST occurrence of the
    * MINIMUM-rank adjacent pair, one merge per step (re-ranking after
    * every merge — a tie-free refinement of the classic merge-all-at-
    * once encode; budgeting `len(word)-1` steps covers every productive
    * merge, later steps are no-ops once no pair ranks). */
  private def bpeStepExpr: String = {
    val rmap = bpeMerges.zipWithIndex
      .map { case ((a, b), i) => s"'$a $b', ${i + 1}" }
      .mkString("map(", ", ", ")")
    // pair ranks via two shifted slices — no sequence(), so the 1-char
    // case degrades to [] instead of a descending range
    def prOf(s: String) =
      s"zip_with(slice($s, 1, size($s) - 1), slice($s, 2, size($s) - 1), " +
        s"(x, y) -> element_at($rmap, concat(x, ' ', y)))"
    // single-element-array transform = a `let`: pr / best / pos each
    // computed once instead of re-inlining the rank-map expression
    s"""(syms, it) -> element_at(transform(array(${prOf("syms")}), pr ->
       |  element_at(transform(array(array_min(filter(pr, r -> r IS NOT NULL))), best ->
       |    CASE WHEN best IS NULL THEN syms ELSE
       |      element_at(transform(array(cast(array_position(pr, best) as int)), pos ->
       |        concat(slice(syms, 1, pos - 1),
       |               array(concat(element_at(syms, pos), element_at(syms, pos + 1))),
       |               slice(syms, pos + 2, greatest(size(syms) - pos - 1, 0)))), 1)
       |    END), 1)), 1)""".stripMargin
  }

  /** BPE tokenizer application (`text_bpe_encode`): encode the corpus
    * with the frozen [[bpeMerges]] table and report the top-30 resulting
    * token histogram — the vocabulary-coverage QA every tokenization run
    * ships (are merges firing? what reaches the model as one token?).
    *
    * Scale shape — encode cost rides the VOCABULARY, not the corpus:
    * the token stream collapses map-side into per-word counts first
    * (partial agg, ≤vocab rows reach the exchange), the iterative merge
    * loop (a nested-HOF fold: `len-1` steps of [[bpeStepExpr]]) runs
    * once per DISTINCT word, and the histogram re-expands by weight
    * without ever touching documents again. 100 TB of text with a 10M-
    * word vocabulary pays the HOF ~10M times total, not per token. */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val words = withTokens(Tables(spark, dir).documents.select("text"))
      // explode_outer + null-drop (r20, the [[bigrams]] rationale — same
      // trap this function's OWN syms explode below already documents)
      .select(explode_outer(col("tk")).as("w"))
      .where(col("w").isNotNull)
      .groupBy("w").agg(count(lit(1)).as("c"))
    val enc = words.withColumn("syms",
      expr(s"""CASE WHEN length(w) < 2 THEN array(w)
              | ELSE aggregate(sequence(1, length(w) - 1),
              |   filter(split(w, ''), ch -> ch <> ''),
              |   $bpeStepExpr) END""".stripMargin))
    // explode_outer, deliberately: plain explode makes the optimizer
    // infer a `size(syms) > 0` pruning filter and PUSH IT BELOW the
    // per-word aggregate (syms is a function of the group key), which
    // re-evaluates the whole interpreted merge fold twice per corpus
    // TOKEN instead of once per distinct word — measured 1812 cpu-s vs
    // ~tokenize-cost at sf5. syms is never empty (CASE guards the 1-char
    // path), so outer ≡ inner here and the inferred filter disappears.
    enc.select(col("w"), col("c"), explode_outer(col("syms")).as("token"))
      .groupBy("token")
      .agg(sum("c").as("n_tokens"), countDistinct("w").as("n_words"))
      .orderBy(col("n_tokens").desc, col("token"))
      .limit(30)
  }

  /** BPE tokenizer TRAINING (`text_bpe_train`, Sennrich, Haddow & Birch,
    * ACL 2016) — `rounds` merge rounds learned from the corpus, closing
    * the tokenizer loop the repo already brackets: [[bpePairs]] is
    * round 1's pair census, [[bpeEncode]] applies a FROZEN table; this
    * learns one. Per round, exactly the pairs query + argmax + re-pair,
    * all on the VOCABULARY-sized word histogram (the [[bpeEncode]]
    * scale contract: corpus tokens collapse to distinct-word counts
    * map-side ONCE, then every round's cost rides the vocabulary —
    * 100 TB of text with a 10M-word vocabulary pays each round ~10M
    * rows, not a corpus pass).
    *
    * Symbol-state representation, the cross-engine trick: each word's
    * symbol sequence lives as a `||`-wrapped string (`"the"` →
    * `"||t||h||e||"`), so one round's merge-ALL of the argmax pair
    * (a, b) is ONE builtin `replace(st, '|a||b|', '|ab|')` — both
    * engines' replace scans left-to-right over non-overlapping matches,
    * which IS greedy leftmost BPE merging (for `a a a` under pair
    * (a,a): first match consumes `|a||a|`, the overlapping second
    * cannot match → `aa, a` — the reference semantics), and the double
    * delimiter makes the pattern anchor on whole symbols while leaving
    * one `|` on each side for the neighbor's own pattern (a single
    * delimiter either under-anchors — `|xa|b|` matches `a|b` — or
    * consumes the separator the next match needs). Symbols never
    * contain `|`: the vocabulary is filtered to `^[a-z0-9]+$` (a
    * DECLARED contract; the driver corpus is entirely alnum).
    *
    * The per-round argmax is a bounded single-row collect (top-1 by
    * `(n DESC, a, b)` — a total order, so the learned table is
    * deterministic and the oracle's unrolled per-round CTEs replay it
    * exactly); the merge table accumulates driver-side like any trained
    * artifact. The histogram is cached once; each round's state is the
    * accumulated replace chain applied map-side over it, and the chain
    * is capped at [[BpeMatEvery]] = 32 by periodic localCheckpoint of
    * the advanced state — train cost is O(R·vocab), not the O(R²·vocab)
    * an unbounded chain re-derivation would pay, so the designed-for
    * regime is R up to the low thousands (the per-round driver argmax
    * barrier is inherent to greedy BPE; a 30k-50k-merge production
    * vocabulary would want batched argmax rounds on top). Fails loudly if
    * the corpus runs out of pairs before `rounds` (fixed-round contract
    * mirrored by the oracle). Output: `(round, lhs, rhs, merged, n)`.
    * Round15Spec pins the first `rounds` merges against an independent
    * driver-side reference trainer. */
  def bpeTrain(spark: SparkSession, dir: String, rounds: Int = BpeTrainRounds): DataFrame =
    bpeTrainCore(spark, Tables(spark, dir).documents, rounds)

  /** The `text_bpe_train` round count — shared with the oracle builder. */
  val BpeTrainRounds = 8

  /** The vocabulary histogram both BPE corpus passes share: distinct
    * alnum words with counts and the `||`-wrapped initial symbol state
    * (see [[bpeTrain]]'s scaladoc for the encoding contract). Cached —
    * the ONE corpus-sized pass; everything downstream rides it. */
  private def bpeHist(documents: DataFrame): DataFrame =
    GraftSession.trackCache(
      withTokens(documents.select("text"))
        // explode_outer (r20, the [[bigrams]] rationale); the rlike
        // filter below already drops the null rows (rlike(NULL) is NULL)
        .select(explode_outer(col("tk")).as("w"))
        .where(col("w").rlike("^[a-z0-9]+$"))
        .groupBy("w").agg(count(lit(1)).as("c"))
        .select(col("w"), col("c"), concat(lit("||"),
          array_join(expr("filter(split(w, ''), ch -> ch <> '')"), "||"),
          lit("||")).as("st")))

  /** A merge table applied to a symbol-state column as a replace chain —
    * one builtin `replace` per learned merge, in training order (both
    * engines' replace is non-overlapping left-to-right = greedy-leftmost
    * merge-all; the derivation lives in [[bpeTrain]]'s scaladoc). */
  private def bpeChain(ms: Seq[(Int, String, String, String, Long)],
      st: Column): Column =
    ms.foldLeft(st) { case (s, (_, la, lb, m, _)) =>
      replace(s, lit("|" + la + "||" + lb + "|"), lit("|" + m + "|"))
    }

  /** Materialize the advanced state every this many rounds: the replace
    * chain over the round-0 histogram is k replaces re-derived at round
    * k, so an unbounded chain is O(R²·vocab) string work plus an
    * R-deep expression tree. Checkpointing the advanced state every 32
    * rounds caps the chain at 32 and cuts lineage (the q_seed_distance
    * lesson), making train cost O(R·vocab) with R/32 materializations.
    * Never fires at the declared [[BpeTrainRounds]] = 8. */
  private val BpeMatEvery = 32

  /** The learned merge table as driver-side rows — the artifact both
    * [[bpeTrain]] (reports it) and [[bpeApply]] (applies it) consume.
    * One bounded single-row collect per round (the greedy argmax is
    * inherently sequential — merge k+1's census depends on merge k);
    * designed for the 10¹..10³-round regime where the per-round driver
    * barrier is noise next to the vocab-sized census job. A full
    * production vocabulary (30k-50k merges) would want batched argmax
    * rounds on top; the [[BpeMatEvery]] materialization already keeps
    * the state cost linear in R. */
  private def bpeTrainMerges(hist: DataFrame,
      rounds: Int): Vector[(Int, String, String, String, Long)] = {
    var base = hist.select(col("c"), col("st"))
    var chain = Vector.empty[(Int, String, String, String, Long)]
    var merges = Vector.empty[(Int, String, String, String, Long)]
    for (k <- 1 to rounds) {
      // pairs query: adjacent symbol pairs of the CURRENT state, weighted
      // by word count — one vocab-sized explode + one tiny-key aggregate
      val best = base.select(col("c"), bpeChain(chain, col("st")).as("st"))
        .select(col("c"),
          expr("filter(split(st, '\\\\|'), x -> x <> '')").as("sy"))
        .where(size(col("sy")) >= 2)
        .select(col("c"), explode(expr(
          "zip_with(slice(sy, 1, size(sy) - 1), slice(sy, 2, size(sy) - 1)," +
            " (x, y) -> named_struct('a', x, 'b', y))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("c").as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      require(best.nonEmpty,
        s"bpeTrain: corpus ran out of adjacent pairs at round $k of $rounds " +
          "(the fixed-round contract the oracle unrolls needs every round " +
          "productive); lower rounds for this corpus")
      val (a, b, n) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      merges :+= ((k, a, b, a + b, n))
      chain :+= ((k, a, b, a + b, n))
      if (chain.length >= BpeMatEvery && k < rounds) {
        base = base.select(col("c"), bpeChain(chain, col("st")).as("st"))
          .localCheckpoint()
        chain = Vector.empty
      }
    }
    merges
  }

  private[graft] def bpeTrainCore(spark: SparkSession, documents: DataFrame,
      rounds: Int): DataFrame = {
    import spark.implicits._
    bpeTrainMerges(bpeHist(documents), rounds)
      .toDF("round", "lhs", "rhs", "merged", "n")
      .select(col("round").cast("long"), col("lhs"), col("rhs"),
        col("merged"), col("n"))
  }

  /** Train→apply BPE (`text_bpe_apply`, Sennrich, Haddow & Birch, ACL
    * 2016 — the full Algorithm 1 loop): encode the corpus with the table
    * [[bpeTrain]] JUST LEARNED from it, closing the tokenizer bracket
    * end-to-end ([[bpePairs]] = round 1's census, [[bpeTrain]] = the
    * learned table, [[bpeEncode]] = a frozen artifact applied; this key
    * is learn-then-apply in one operator — the self-tokenization QA a
    * tokenizer-training run ships: what does the corpus look like under
    * its own vocabulary?). Application is training-order merge-all —
    * for merges learned greedily, applying them in learned order
    * reproduces the training-time states exactly, so the encoded corpus
    * IS the final training state: a [[bpeChain]] fold (R builtin
    * replaces, segmented every [[BpeMatEvery]] like training — see
    * [[bpeChainSegmented]]) over the cached vocabulary histogram, then
    * split, explode and the top-30 token histogram in [[bpeEncode]]'s
    * output shape.
    *
    * Scale contract = [[bpeTrain]]'s: the corpus collapses to the
    * distinct-word histogram ONCE (cached — training and application
    * share the same frame, no second corpus pass), and both the R
    * training rounds and the R-replace application ride the vocabulary.
    * Everything after the learned table is pure string + exact integer
    * work, so the oracle replays it bit-for-bit by composing the
    * unrolled train CTEs with one final state advance + tokenization. */
  def bpeApply(spark: SparkSession, dir: String,
      rounds: Int = BpeTrainRounds): DataFrame =
    bpeApplyCore(Tables(spark, dir).documents, rounds)

  /** The merge table applied to the full histogram in [[BpeMatEvery]]-sized
    * [[bpeChain]] segments with a localCheckpoint between — application's
    * analog of [[bpeTrainMerges]]' periodic materialization: caps the
    * Catalyst expression depth at BpeMatEvery replaces regardless of R
    * (an unbounded chain is an R-deep tree — analysis/codegen cost and
    * stack risk at the documented low-thousands regime), so apply rides
    * the same O(R·vocab) contract as training. Below the cap this is the
    * single fold it always was — the declared R=8 path plans identically. */
  private def bpeChainSegmented(hist: DataFrame,
      merges: Seq[(Int, String, String, String, Long)]): DataFrame = {
    var base = hist
    var rest = merges
    while (rest.length > BpeMatEvery) {
      base = base.select(col("w"), col("c"),
        bpeChain(rest.take(BpeMatEvery), col("st")).as("st")).localCheckpoint()
      rest = rest.drop(BpeMatEvery)
    }
    base.select(col("w"), col("c"), bpeChain(rest, col("st")).as("st"))
  }

  /** [[bpeApply]] over any documents frame — split out so the spec can
    * plant single-char words and words the merges erase to one symbol
    * (paths the driver corpus reaches rarely or not at all). */
  private[graft] def bpeApplyCore(documents: DataFrame, rounds: Int): DataFrame = {
    val hist = bpeHist(documents)
    val merges = bpeTrainMerges(hist, rounds)
    bpeChainSegmented(hist, merges)
      // explode_outer + null-drop (r20, the [[bigrams]] rationale): the
      // inferred size()>0 filter re-ran the split of the merge-segmented
      // string a second time per word
      .select(col("w"), col("c"),
        explode_outer(expr("filter(split(st, '\\\\|'), x -> x <> '')")).as("token"))
      .where(col("token").isNotNull)
      .groupBy("token")
      .agg(sum("c").as("n_tokens"), countDistinct("w").as("n_words"))
      .orderBy(col("n_tokens").desc, col("token"))
      .limit(30)
  }

  /** Context-window chunking (`text_chunk`) — the RAG / pretraining
    * sequence-packing primitive: split each document's token stream into
    * overlapping windows of `win` tokens advancing by `stride`
    * (production values are model-context-sized, e.g. 1024/896; the key
    * uses 16/12 so the driver fixture's ~54-token docs genuinely
    * overlap). Chunk count k = 1 + ceil((n − win) / stride) for n > win
    * else 1 — integer ceil as `(n − win + stride − 1) div stride`, so
    * the chunk grid is exact arithmetic in both engines; the last chunk
    * is the residual `n − (k−1)·stride ∈ (win − stride, win]` tokens, so
    * every token is covered and no window is empty. Zero-token docs emit
    * no chunks.
    *
    * Scale shape: ONE narrow map-side pass — tokenize, a per-doc
    * `sequence(0, k−1)` explode, `slice` + `md5` per window. No shuffle,
    * no state, embarrassingly parallel at 100 TB; chunk identity is the
    * deterministic (doc_id, chunk_idx) pair and the content hash is what
    * downstream exact-dedup / packing keys on (Round12Spec pins the
    * no-keyed-exchange plan and a full driver-side replay). */
  def chunk(spark: SparkSession, dir: String,
      win: Int = 16, stride: Int = 12): DataFrame =
    // The empty-doc guard moved from a `size(tk) > 0` PRE-filter to a
    // `size(ctk) > 0` POST-filter (r20): the pre-filter was the round-3
    // trap verbatim — a predicate on the computed token column,
    // predicate-pushed below the scatter Exchange with the whole
    // tokenize re-inlined into the single-row-group scan task — and the
    // Generate additionally inferred a `sequence(0, k-1)` filter that
    // re-inlined the tokenize a THIRD time (k is a function of tk).
    // Equivalence: k >= 1 always, so the sequence is never empty
    // (outer == inner explode); for a doc with tokens every emitted
    // chunk has >= 1 token by the k/stride construction, and for an
    // empty/null-text doc the single k=1 chunk has an empty/null ctk —
    // exactly the rows the post-filter drops and the old pre-filter
    // never admitted. The post-filter references the generated
    // chunk_idx, so it cannot be pushed below the Generate; it
    // re-evaluates only the cheap slice, never the tokenize.
    Tables(spark, dir).documents
      .select(col("doc_id"), expr(tokensExpr).as("tk"))
      .withColumn("k",
        expr(s"1 + CASE WHEN size(tk) > $win THEN (size(tk) - $win + $stride - 1) div $stride ELSE 0 END"))
      .select(col("doc_id"), col("tk"),
        explode_outer(expr("sequence(0, k - 1)")).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        expr(s"slice(tk, chunk_idx * $stride + 1, least($win, size(tk) - chunk_idx * $stride))").as("ctk"))
      .where(size(col("ctk")) > 0)
      .select(col("doc_id"), col("chunk_idx"),
        size(col("ctk")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("ctk"))).as("chunk_hash"))

  /** PMI collocations (`text_collocations`) — pointwise mutual
    * information over adjacent word pairs, the corpus-linguistics
    * standard for "which bigrams are units, not coincidences" (Church &
    * Hanks 1990). Tokenizer-vocabulary curation ranks merge candidates
    * and multi-word-expression lists exactly this way; it is the
    * association-scored sibling of the raw-count [[bigrams]].
    *
    * PMI = ln(N·c(a,b) / (c(a)·c(b))) with N = total bigram positions
    * (unfiltered — the c(a,b) ≥ 5 support floor prunes the REPORTED
    * pairs, the probability space stays the whole corpus). The float
    * contract is [[text_tfidf]]'s: one double expression with pinned
    * operand order — `ln((N·cab) / (ca·cb))`, numerator and denominator
    * each an exact-BIGINT product cast once — quantized ONCE to 1e-6 by
    * the HALF-UP floor, so both engines evaluate the identical libm call
    * on the identical double.
    *
    * Scale shape: both aggregates are map-side partial (token and bigram
    * streams collapse before their exchanges); the scored join routes
    * the support-filtered pair table through TWO natural-cardinality
    * unigram joins (vocabulary keys — the [[tfidf]] salting lesson does
    * not apply because c(a)·c(b) needs the UNIGRAM table, which is
    * head-heavy only in value, not in join key count after the ≥5 pair
    * floor); N rides a broadcast single row; top-30 is a constant-k
    * TakeOrderedAndProject. */
  def collocations(spark: SparkSession, dir: String,
      minCount: Int = 5): DataFrame = {
    val docs = withTokens(Tables(spark, dir).documents.select("text"))
    // explode_outer + null-drop on BOTH legs (r20, the [[bigrams]]
    // rationale) — each leg scans documents raw, so each inferred filter
    // was its own single-row-group-stage tokenize
    val uni = docs.select(explode_outer(col("tk")).as("w"))
      .where(col("w").isNotNull)
      .groupBy("w").agg(count(lit(1)).as("cu"))
    val bgAll = graft.GraftSession.trackCache(
      docs.select(explode_outer(expr(bigramsExpr)).as("bigram"))
        .where(col("bigram").isNotNull)
        .groupBy("bigram").agg(count(lit(1)).as("cab")))
    val n = bgAll.select(sum("cab").as("n"))
    bgAll.where(col("cab") >= minCount)
      .select(
        col("bigram"), col("cab"),
        expr("substring_index(bigram, ' ', 1)").as("w1"),
        expr("substring_index(bigram, ' ', -1)").as("w2"))
      .join(uni.select(col("w").as("w1"), col("cu").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("cu").as("c2")), "w2")
      .crossJoin(broadcast(n))
      .select(col("bigram"), col("cab").as("n_pair"),
        col("c1").as("n_w1"), col("c2").as("n_w2"),
        expr("cast(floor(ln(cast(n * cab as double) / cast(c1 * c2 as double)) * 1e6 + 0.5) as bigint)")
          .as("pmi_q6"))
      .orderBy(col("pmi_q6").desc, col("bigram"))
      .limit(30)
  }
}
