package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Second-wave analytics surface: the ClickHouse-adjacent capabilities the
  * reference's README points at (SAMPLE clause, array functions, window
  * analytics) plus the as-of join and funnel operators every event
  * warehouse grows.
  *
  * Scale notes: the as-of join is the union+window formulation — one
  * shuffle on user_id, no range-join pair explosion; sampling is a
  * deterministic hash predicate evaluated at the scan (ClickHouse's
  * intHash32 sampling key, md5-flavored so any engine reproduces it).
  */
object Analytics {

  /** SAMPLE-clause analog: deterministic 2/16 hash sample by event_id.
    * The predicate is pushed into the scan stage; every engine computes the
    * same md5, so the "sample" is reproducible anywhere. */
  def sample(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .filter(substring(md5(col("event_id").cast("string")), 1, 1).isin("0", "1"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total"))

  /** Array-function analog (groupArray / arraySort): per event type, the
    * top-3 users by lifetime value, emitted as an ordered CSV string (a
    * string survives any engine's array-representation quirks). */
  def topSpenders(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables(spark, dir).events
      .groupBy("event_type", "user_id")
      .agg(round(sum("value"), 4).as("total"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("event_type").orderBy(col("total").desc, col("user_id"))))
      .filter(col("rnk") <= 3)
    perUser
      .groupBy("event_type")
      .agg(concat_ws(",",
        expr("transform(array_sort(collect_list(struct(rnk, user_id))), s -> cast(s.user_id as string))"))
        .as("top_users"))
  }

  /** Running cumulative revenue per event type (ordered-window fold — the
    * summation order is the window order, so it is engine-reproducible). */
  def runningTotal(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir).events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(round(sum("value"), 4).as("daily"))
    daily.withColumn("running",
      round(sum("daily").over(
        Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4))
  }

  /** Exact distinct users per event type (ClickHouse `uniqExact`) beside
    * the plain count. A distinct aggregate inside a groupBy plans as the
    * two-phase Expand+HashAggregate — partial de-dup map-side, one shuffle
    * keyed (event_type, user_id), then the final count; the approximate
    * sibling at 100 TB is [[approxDistinct]] (HLL, no second phase). */
  def distinctUsers(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n_users"), count(lit(1)).as("n_events"))

  /** 7-row moving window per event type over the daily revenue series
    * (ClickHouse neighbor()/moving-sum analog): the bounded-frame sibling
    * of [[runningTotal]]'s unbounded fold. Both window functions share one
    * event_type shuffle; the frame sums at most 7 already-rounded daily
    * values in window order, so the result is engine-reproducible. */
  def movingSum(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir).events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(round(sum("value"), 4).as("daily"))
    val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, Window.currentRow)
    daily
      .withColumn("sum_7d", round(sum("daily").over(w), 4))
      .withColumn("n_7d", count(lit(1)).over(w))
  }

  /** ANSI/ClickHouse `ntile`: every customer ranked into 4 equal-depth
    * buckets by lifetime spend (deterministic total order: spend desc,
    * custkey) and each bucket aggregated — the equal-depth sibling of
    * [[histogram]]'s fixed-width bins. The ntile needs a global order, but
    * NOT a single-partition window: [[GlobalRank.ntiled]] range-partitions
    * on the sort key and derives the exact ntile from slice offsets +
    * map-side arithmetic, so the per-customer rows never collapse onto one
    * task (the approximate equal-depth sibling for when even one range
    * shuffle is too much is [[approxQuantiles]]). */
  def spendQuartiles(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables(spark, dir).orders
      .groupBy("o_custkey")
      .agg(Olap.centsSum(col("o_totalprice")).as("total_spent"))
    GlobalRank.ntiled(spend, 4, "quartile", col("total_spent").desc, col("o_custkey"))
      .groupBy("quartile")
      .agg(count(lit(1)).as("n_customers"), Olap.centsSum(col("total_spent")).as("total"))
  }

  /** As-of join: each purchase event paired with the most recent PRIOR
    * error event of the same user. Union+window formulation: both sides
    * shuffle once on user_id and the "join" is an ignore-nulls last_value
    * over the interleaved timeline — no per-row range probe, no pair
    * explosion, skew handled by AQE like any single shuffle. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables(spark, dir).events
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"))
      .withColumn("prev_error_id",
        last(when(col("event_type") === "error", col("event_id")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "prev_error_id")
  }

  /** Signup -> purchase-within-7-days conversion funnel per user. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
      .select(col("user_id"), col("event_type"), col("value"), unix_micros(col("ts")).as("tus"))
    val signups = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("tus").as("first_signup"))
    val purchases = e.filter(col("event_type") === "purchase")
      .join(signups, "user_id")
      .filter(col("tus") >= col("first_signup") &&
        col("tus") < col("first_signup") + lit(604800000000L))
      .groupBy("user_id")
      .agg(count(lit(1)).as("purchases_7d"), round(sum("value"), 4).as("spend_7d"))
    signups.join(purchases, Seq("user_id"), "left")
      .select(
        col("user_id"),
        when(col("purchases_7d").isNull, 0L).otherwise(1L).as("converted"),
        coalesce(col("purchases_7d"), lit(0L)).as("purchases_7d"),
        coalesce(col("spend_7d"), lit(0.0)).as("spend_7d"))
  }

  /** Exact interpolated quantiles per event type (the quantile() /
    * quantileExact() surface of the reference's engine — exact flavor so
    * any engine reproduces it; percentile_approx is the sketch sibling). */
  def quantiles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        round(max("value"), 4).as("max_value"),
        count(lit(1)).as("n"))

  /** Approximate distinct counting (HyperLogLog++ — ClickHouse `uniq`
    * analog) side-by-side with the exact count. Sketches merge
    * associatively, so the partial/final aggregation pattern holds at any
    * scale; no SQL oracle (sketch values are engine-specific), accuracy is
    * asserted in AnalyticsSpec instead. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy("event_type")
      .agg(
        approx_count_distinct("user_id", rsd = 0.02).as("approx_users"),
        countDistinct("user_id").as("exact_users"),
        count(lit(1)).as("n"))

  /** Approximate quantiles (ClickHouse `quantileTDigest` analog):
    * percentile_approx keeps a bounded sketch per group that merges
    * associatively, so the partial/final pattern holds at any scale where
    * the exact `percentile` would buffer every value. Sits beside
    * [[quantiles]] the way [[approxDistinct]] sits beside the exact
    * distinct; no SQL oracle (sketch internals are engine-specific),
    * accuracy asserted in AnalyticsSpec against the exact values. */
  def approxQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy("event_type")
      .agg(
        round(expr("approx_percentile(value, 0.5, 1000)"), 4).as("p50_approx"),
        round(expr("approx_percentile(value, 0.9, 1000)"), 4).as("p90_approx"),
        round(expr("percentile(value, 0.5)"), 4).as("p50_exact"),
        round(expr("percentile(value, 0.9)"), 4).as("p90_exact"),
        count(lit(1)).as("n"))

  /** Multimodal fusion: text metadata joined with the embedding modality on
    * the shared id — the row shape a multimodal trainer consumes. */
  def textEmbedJoin(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftSession.registerFunctions(spark)
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"), expr(s"cast(size(${TextAnalysis.tokensExpr}) as bigint)").as("n_tokens"))
    val vecs = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("label").cast("long").as("label"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("vec_norm", round(expr("sqrt(dot_product(v, v))"), 4))
      .drop("v")
    docs.join(vecs, col("doc_id") === col("vec_id"))
      .select("doc_id", "n_tokens", "label", "vec_norm")
  }

  /** Corpus term statistics (document frequency / collection frequency) —
    * the inverted-index pre-pass of every text pipeline. */
  def topTerms(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), explode(expr(TextAnalysis.tokensExpr)).as("term"))
      .groupBy("term")
      .agg(countDistinct("doc_id").as("df"), count(lit(1)).as("cf"))

  /** ClickHouse `argMax(arg, val)` analog: per event type, the event that
    * carries the maximum value. One partial-aggregated shuffle; the
    * lexicographic max over struct(value, event_id) makes the answer
    * deterministic under value ties (largest event_id wins), where a bare
    * max_by would be tie-arbitrary. */
  def argMax(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy("event_type")
      .agg(max(struct(col("value"), col("event_id"))).as("m"))
      .select(col("event_type"), round(col("m.value"), 4).as("max_value"),
        col("m.event_id").as("argmax_event"))

  /** ClickHouse `retention(cond1, cond2, ...)` analog, aggregated to signup
    * cohorts: per signup day, how many users came back within 1 day, within
    * 7 days, and purchased within 7 days. Two shuffles total (per-user
    * flags, then per-cohort rollup) — the per-user conditional-max flags
    * are exactly retention()'s array of 0/1s. */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val day = 86400000000L
    val e = Tables(spark, dir).events
      .select(col("user_id"), col("event_type"), col("ts"), unix_micros(col("ts")).as("tus"))
    val signups = e.filter(col("event_type") === "signup")
      .groupBy("user_id")
      .agg(min("tus").as("t0"), to_date(min("ts")).as("cohort_day"))
    val flags = e.join(signups, "user_id")
      .groupBy("user_id")
      .agg(
        first("cohort_day").as("cohort_day"),
        max(when(col("tus") > col("t0") && col("tus") <= col("t0") + day, 1L)
          .otherwise(0L)).as("r1"),
        max(when(col("tus") > col("t0") && col("tus") <= col("t0") + 7 * day, 1L)
          .otherwise(0L)).as("r7"),
        max(when(col("event_type") === "purchase" &&
          col("tus") > col("t0") && col("tus") <= col("t0") + 7 * day, 1L)
          .otherwise(0L)).as("p7"))
    flags.groupBy("cohort_day")
      .agg(count(lit(1)).as("n_users"), sum("r1").as("returned_1d"),
        sum("r7").as("returned_7d"), sum("p7").as("purchased_7d"))
  }

  /** ClickHouse `windowFunnel(window)(ts, cond1, cond2, cond3)` analog:
    * the deepest prefix of signup -> view -> purchase each user completes
    * IN ORDER within 7 days of the signup, rolled up to users-per-level.
    * Each step is one conditional min-aggregation + join on user_id (the
    * sequence probe never explodes into per-pair rows). */
  def windowFunnel(spark: SparkSession, dir: String): DataFrame = {
    val win = 604800000000L
    val e = Tables(spark, dir).events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tus"))
    val s1 = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("tus").as("t1"))
    val s2 = e.filter(col("event_type") === "view")
      .join(s1, "user_id").filter(col("tus") > col("t1"))
      .groupBy("user_id").agg(min("tus").as("t2"))
    val s3 = e.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("tus") > col("t2"))
      .groupBy("user_id").agg(min("tus").as("t3"))
    s1.join(s2.select("user_id", "t2"), Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("t3").isNotNull && col("t3") <= col("t1") + win, 3L)
          .when(col("t2").isNotNull && col("t2") <= col("t1") + win, 2L)
          .otherwise(1L).as("funnel_level"))
      .groupBy("funnel_level")
      .agg(count(lit(1)).as("n_users"))
  }

  /** ClickHouse `topK(k)` analog: approximate heavy hitters over the term
    * stream via Spark's ApproxTopK sketch aggregate (mergeable partial
    * states — one pass, no exact groupBy over the full vocabulary first).
    *
    * The sketch is over-provisioned (64 items retained for a top-10
    * answer — the standard headroom that keeps boundary items honest) and
    * the final 10 are re-ranked deterministically by (count desc, term)
    * on the driver-bounded result. While the tracker capacity covers the
    * distinct-term universe (it does on this corpus: ~31 terms vs 4096
    * tracked) every count is exact, so the output equals the exact top-10
    * with the same tiebreak — which is what the SQL oracle checks; on a
    * larger-than-capacity vocabulary the counts degrade gracefully to
    * sketch estimates and AnalyticsSpec's exact-agreement invariant is
    * the contract instead. The re-rank runs on the <= 64 sketch rows via
    * the bounded one-slice path — never a single-partition WindowExec. */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val sketched = Tables(spark, dir).documents
      .select(explode(expr(TextAnalysis.tokensExpr)).as("term"))
      .agg(expr("approx_top_k(term, 64, 4096)").as("top"))
      .select(explode(col("top")).as("s"))
      .select(col("s.item").as("term"), col("s.count").cast("long").as("cnt"))
    GlobalRank.boundedRowNumbered(sketched, "rnk", col("cnt").desc, col("term"))
      .filter(col("rnk") <= 10)
  }

  /** Fixed-width value histogram (ClickHouse `histogram()` surface, exact
    * flavor): bin = floor(value / 50). The bin id is computed map-side, so
    * the whole histogram is one partial-aggregated shuffle over ~10 keys —
    * the same plan shape at any scale. */
  def histogram(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy(floor(col("value") / 50.0).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        round(min("value"), 4).as("min_v"),
        round(max("value"), 4).as("max_v"))
      .withColumn("lo", round(col("bin") * lit(50.0), 4))
      .select("bin", "lo", "n", "min_v", "max_v")

  /** Fixed-size patch layout over the binary payload — the batch shape a
    * vision encoder consumes (one row per 256-byte patch, computed without
    * ever shuffling the bytes themselves). */
  def mediaPatches(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"),
        length(encode(col("text"), "utf-8")).cast("long").as("n_bytes"))
      // zero-byte docs emit NO patches: an unguarded sequence(0, -1) yields
      // the descending [0, -1] and two bogus rows, while the oracle's
      // range(0, 0) is empty — explode drops the empty array instead
      .select(col("doc_id"), col("n_bytes"),
        explode(expr(
          """CASE WHEN n_bytes > 0
            |  THEN sequence(0L, cast(ceil(n_bytes / 256.0) as bigint) - 1)
            |  ELSE cast(array() as array<bigint>) END""".stripMargin)).as("patch_idx"))
      .withColumn("patch_len", least(lit(256L), col("n_bytes") - col("patch_idx") * 256L))
      .select("doc_id", "patch_idx", "patch_len")

  /** Extended statistics (ClickHouse `corr` / `covarPop` /
    * `simpleLinearRegression` surface): per return flag, the correlation
    * and least-squares line between item quantity and price.
    *
    * Exactness contract: builtin `corr()` sums doubles, and double
    * summation is order-dependent — at 100 TB the result differs run to
    * run, and it never matches another engine bit-for-bit. Instead the
    * five moment sums are accumulated as exact integers (quantity, price
    * cents — one partial-aggregated shuffle, same plan as any groupBy),
    * and the closed-form corr/slope/intercept is ONE identical chain of
    * IEEE double ops on both engines. Every sum stays below 2^53 at these
    * scales except Σy² (held as decimal(38) here, HUGEINT in the oracle);
    * casts of exact integers to double round to nearest identically, so
    * the chain is reproducible bit-for-bit. */
  def corrStats(spark: SparkSession, dir: String): DataFrame = {
    val d = (c: Column) => c.cast("double")
    val g = Tables(spark, dir).lineitem
      .select(col("l_returnflag"),
        expr("cast(round(l_quantity) as bigint)").as("x"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("y"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * x")).as("sxx"),
        sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"),
        sum(expr("x * y")).as("sxy"))
    val cxy = d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    val vx = d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val vy = d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))
    val slope = cxy / vx
    g.select(col("l_returnflag"), col("n"),
      round(cxy / (sqrt(vx) * sqrt(vy)), 4).as("corr_qty_price"),
      round(cxy / (d(col("n")) * d(col("n"))), 4).as("covar_pop_cents"),
      round(slope, 4).as("slope_cents_per_qty"),
      round((d(col("sy")) - slope * d(col("sx"))) / d(col("n")), 4).as("intercept_cents"))
  }

  /** Pairwise audience overlap between event types (the "segment
    * overlap" warehouse staple; ClickHouse would reach for
    * `uniqCombined`/theta sketches at extreme cardinality — here the
    * exact rendition, which stays tractable because the heavy step is
    * distinct-reduced BEFORE any pairing): for each unordered type pair,
    * |users(A) ∩ users(B)|, the per-type audience sizes, and Jaccard.
    *
    * Scale shape: ONE distinct over (event_type, user_id) collapses the
    * event stream to audience membership (partial-aggregated — the
    * corpus-sized step); the self-join pairs only the DISTINCT rows on
    * user_id (each user contributes |their types|² pairs, bounded by the
    * tiny type vocabulary, never by event count); audience sizes ride a
    * broadcast |types|-row frame, twice. Jaccard = one double chain over
    * exact BIGINTs (|A∪B| = |A|+|B|−|A∩B|, inclusion–exclusion — no
    * second pass). */
  def audienceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val membership = graft.GraftSession.trackCache(
      Tables(spark, dir).events.select("event_type", "user_id").distinct())
    val sizes = membership.groupBy("event_type")
      .agg(count(lit(1)).as("aud"))
    val pairs = membership.select(col("event_type").as("type_a"), col("user_id"))
      .join(membership.select(col("event_type").as("type_b"), col("user_id")), Seq("user_id"))
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(sizes.select(col("event_type").as("type_a"), col("aud").as("aud_a"))), Seq("type_a"))
      .join(broadcast(sizes.select(col("event_type").as("type_b"), col("aud").as("aud_b"))), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("n_both"), col("aud_a"), col("aud_b"),
        // HALF-UP floor, not round(): round() tie behavior differs
        // cross-engine, the floor chain does not (SURVEY §5)
        expr("""floor(cast(n_both as double)
               / cast(aud_a + aud_b - n_both as double) * 10000 + 0.5) / 1e4""")
          .as("jaccard"))
  }

  /** Exponentially time-decayed engagement per user (ClickHouse
    * `exponentialMovingAverage` / feature-store "recency-weighted sum"):
    * each event contributes `value · e^(-Δt/τ)` with Δt = seconds before
    * the corpus's latest event and τ = 1 day — yesterday's click counts
    * ~37% of one now.
    *
    * Cross-engine float contract (SURVEY §5): `exp` is not correctly
    * rounded by either engine's libm, so each ROW's contribution
    * `value · e^(-Δt/τ)` is quantized ONCE to 1e-4 units (the
    * `text_perplexity` drill, with exp in place of ln — Δt is exact
    * BIGINT seconds, so both engines feed exp the identical double);
    * the per-user sum is exact BIGINT and ONE final division scales back.
    *
    * Scale shape: the single latest-timestamp scalar rides a broadcast
    * single-row frame; the weight is a map-side projection; the only
    * shuffle is the final per-user partial-aggregated groupBy. */
  def decayedSum(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
      .select(col("user_id"), col("value"), unix_timestamp(col("ts")).as("t"))
    val tmax = e.agg(max("t").as("t_max"))
    e.crossJoin(broadcast(tmax))
      .withColumn("c_q", expr(
        "cast(floor(value * exp(-cast(t_max - t as double) / 86400.0d) * 10000 + 0.5) as bigint)"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("c_q").cast("long").as("sum_c_q"))
      .select(col("user_id"), col("n_events"), col("sum_c_q"),
        (col("sum_c_q").cast("double") / lit(10000.0)).as("decayed_value"))
  }

  /** Time-series gap filling (ClickHouse `ORDER BY ... WITH FILL` /
    * `WITH FILL STEP 1 DAY`): the daily per-type revenue series with every
    * missing (type, day) bucket materialized as an explicit zero row —
    * dashboards and window functions downstream need dense series, and at
    * 100 TB the dense calendar must NOT be built by scanning the data
    * twice per bucket.
    *
    * Shape: the fact scan aggregates ONCE to (type, day) — the only
    * data-sized shuffle. The dense calendar is |types| x days rows, built
    * from two scalar bounds and a distinct type list via builtin
    * `sequence`+`explode` (no generator UDF, no driver loop), and the
    * left join that stitches facts onto it joins two ALREADY-AGGREGATED
    * frames whose sizes depend on the vocabulary and the time span, never
    * on the event count — AQE broadcasts the small side at any scale.
    * Money is exact integer cents so the filled zeros and the summed
    * buckets live in the same exact domain. */
  def fillGaps(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
    val daily = e.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("cast(round(value * 100) as bigint)")).as("sum_cents"))
    val span = e.agg(to_date(min("ts")).as("d0"), to_date(max("ts")).as("d1"))
    val calendar = e.select("event_type").distinct()
      .crossJoin(span) // 1-row bounds frame: broadcast-nested-loop, |types| rows out
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    calendar.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sum_cents"), lit(0L)).as("sum_cents"))
  }

  /** Carry-forward gap interpolation (ClickHouse `WITH FILL ...
    * INTERPOLATE`, the feature-store LOCF staple — a gauge keeps its
    * last observed value until the next observation, where
    * [[fillGaps]]'s zeros are the right semantics only for additive
    * counters): the same dense type × day calendar, with missing days
    * taking the LAST observed daily total (0 before the first
    * observation, by declared convention).
    *
    * The fill is `last(..., ignoreNulls)` under a KEYED window — one
    * event_type shuffle, per-type ordered scan of |days| rows (SURVEY
    * §4's rule: keyed windows scale like aggregations; a timeline per
    * key is exactly what they're for). `observed` rides along so a
    * consumer can tell measurement from interpolation — the column every
    * LOCF bug hunt wishes existed. Exact integer cents end-to-end. */
  def interpolateFill(spark: SparkSession, dir: String): DataFrame = {
    val filled = fillGaps(spark, dir)
      .withColumn("observed", when(col("n_events") > 0, 1L).otherwise(0L))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filled.select(col("event_type"), col("day"), col("observed"),
      coalesce(
        last(when(col("observed") === 1L, col("sum_cents")), ignoreNulls = true).over(w),
        lit(0L)).as("filled_cents"))
  }

  /** ANSI `percent_rank` over every customer's lifetime spend — the
    * continuous sibling of [[spendQuartiles]]'s ntile, completing the
    * global-rank family (row_number / ntile / prefix-sum / percent_rank)
    * on the same WindowExec-free backbone: [[GlobalRank.rowNumbered]]
    * range-partitions on the sort key and derives the global row number
    * from slice offsets, so no single task ever holds the whole frame.
    *
    * Determinism contract: the sort key (spend desc, custkey) is UNIQUE,
    * so row_number == rank and percent_rank is exactly
    * (rn - 1) / (N - 1) — one IEEE division of the same two integers in
    * any engine, bit-reproducible with no quantization step needed (the
    * same trick [[spendQuartiles]] uses for tie-free ntile). Spend is
    * summed as exact integer cents first. The N comes from a count() of
    * the ALREADY-AGGREGATED per-customer frame — customer-vocabulary
    * work, and GlobalRank's two-pass shape pays an equivalent counting
    * pass anyway. */
  def percentRank(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables(spark, dir).orders
      .groupBy("o_custkey")
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("spend_cents"))
    val total = spend.count()
    GlobalRank.rowNumbered(spend, "rn", col("spend_cents").desc, col("o_custkey"))
      .select(col("o_custkey"), col("spend_cents"),
        ((col("rn") - 1).cast("double") / lit(math.max(total - 1, 1L).toDouble))
          .as("pct_rank"))
  }

  /** Mann–Whitney U rank-sum test (`q_mann_whitney`) — the nonparametric
    * sibling of [[welchTTest]]: do purchase and click event values come
    * from the same distribution? Completes the two-sample battery
    * (Welch t / KS / rank correlation) with the test practitioners
    * reach for when values are heavy-tailed.
    *
    * The scalable shape is rank statistics WITHOUT ranking rows: group
    * by exact value (integer cents — a vocabulary-sized frame), take the
    * distributed prefix sum of the tie-block sizes over the value order
    * ([[GlobalRank.prefixSummed]]'s two-pass backbone — no
    * single-partition window at any scale), and derive each tie block's
    * midrank algebraically. Everything stays EXACT integer: midranks are
    * carried DOUBLED (`2·cum_before + m + 1`, always integral), so the
    * rank sum `R1` and `U1` are exact BIGINTs in any engine; the only
    * doubles are the final z-score's one fixed IEEE sequence (normal
    * approximation WITH the tie correction `Σ(t³−t)`), rounded once to
    * 1e-4 — the [[welchTTest]] contract. */
  def mannWhitney(spark: SparkSession, dir: String): DataFrame = {
    val byV = Tables(spark, dir).events
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_type"), expr("cast(round(value * 100) as bigint)").as("v"))
      .groupBy("v")
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n1"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n2"))
      .withColumn("m", col("n1") + col("n2"))
    val cum = GlobalRank.prefixSummed(byV, col("m"), "cum_m", col("v"))
    cum
      .select(col("n1"), col("n2"), col("m"),
        (lit(2L) * (col("cum_m") - col("m")) + col("m") + 1L).as("r2"))
      .agg(sum("n1").as("n1"), sum("n2").as("n2"),
        sum(col("n1") * col("r2")).as("r1_x2"),
        sum(col("m") * col("m") * col("m") - col("m")).as("tie3"))
      .select(lit("purchase").as("group_a"), lit("click").as("group_b"),
        col("n1"), col("n2"),
        (col("r1_x2") - col("n1") * (col("n1") + 1)).as("u1_x2"),
        round(expr(
          """(cast(r1_x2 - n1 * (n1 + 1) as double) / 2.0d
            |   - cast(n1 as double) * cast(n2 as double) / 2.0d) /
            |sqrt(cast(n1 as double) * cast(n2 as double) / 12.0d *
            |     (cast(n1 + n2 + 1 as double)
            |        - cast(tie3 as double) /
            |          (cast(n1 + n2 as double) * cast(n1 + n2 - 1 as double))))""".stripMargin), 4)
          .as("z_score"))
  }

  /** Salted skew join as a CHECKED key — SURVEY §4's skew technique made
    * checkable instead of prose. `event_type` is the textbook hot key: a
    * 5-value vocabulary means a plain shuffle join lands EVERY row of a
    * type on one task — at 100 TB that task runs for hours while 999
    * executors idle. The cure when the dim side is too big to broadcast:
    * replicate each dim row S ways (salt 0..S-1), give every fact row ONE
    * deterministic salt, and join on (key, salt) — each hot key now
    * spreads over S tasks, and every fact row still matches exactly one
    * replica, so semantics are untouched (the spec proves equality with
    * the plain join; the oracle is the unsalted SQL).
    *
    * The salt is `xxhash64(event_id) mod S` — engine-SPECIFIC, and
    * deliberately so: salt only routes rows and never reaches the output,
    * the one legitimate place for a non-portable hash (SURVEY §5). The
    * SHUFFLE_HASH hint keeps the demonstration honest at test scale —
    * without it AQE rightly broadcasts the tiny dim and the salt would be
    * dead code; at the scale this key models, the dim doesn't fit a
    * broadcast and the salted shuffle IS the plan.
    *
    * The query itself is the deviation-from-segment-mean enrichment:
    * per-row |value·N_t − S_t| stays in exact scaled BIGINTs (the mean
    * S_t/N_t is never materialized as a double), and the final mean
    * absolute deviation divides once at the end — the same exact-integer
    * contract as every money path in this repo.
    *
    * HEADROOM CONTRACT: scaling by N_t means each term is
    * O(v_cents · N_t) and the per-group sum is O(n_group · v_cents · N_t)
    * — exact while that product stays under 2^63 (comfortable through
    * ~1e12-row segments at these value magnitudes). Beyond that, quantize
    * the mean ONCE to integer units (the decayedSum drill) instead of
    * scaling every row by N_t. */
  def skewJoin(spark: SparkSession, dir: String): DataFrame = {
    val S = 8
    val e = Tables(spark, dir).events
      .select(col("event_type"), to_date(col("ts")).as("day"),
        expr("cast(round(value * 100) as bigint)").as("v_cents"),
        pmod(xxhash64(col("event_id")), lit(S.toLong)).as("salt"))
    val dim = Tables(spark, dir).events
      .groupBy("event_type")
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("type_sum_cents"),
        count(lit(1)).as("type_n"))
      .withColumn("salt", explode(sequence(lit(0L), lit(S.toLong - 1))))
    e.join(dim.hint("shuffle_hash"), Seq("event_type", "salt"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n_events"),
        sum(abs(col("v_cents") * col("type_n") - col("type_sum_cents")))
          .as("dev_scaled"),
        max("type_n").as("type_n"))
      .select(col("event_type"), col("day"), col("n_events"), col("dev_scaled"),
        (col("dev_scaled").cast("double") /
          (col("n_events") * col("type_n")).cast("double") / lit(100.0))
          .as("mad_value"))
  }

  /** Point-in-interval range join WITHOUT a nested-loop join — the time
    * analog of [[asofJoin]]'s union trick. Spark plans a raw
    * `ts BETWEEN t_start AND t_end` join as BroadcastNestedLoopJoin:
    * fine while the interval side broadcasts, catastrophic when it
    * doesn't (every task re-scans every interval — the one join shape
    * with NO shuffle-based fallback). The scalable rewrite BUCKETS the
    * intervals: each interval explodes into the calendar days it covers
    * (bounded fan-out: ceil(length/1 day) + 1 rows per interval), facts
    * carry their day, and the join is an ordinary (type, day) EQUI-join
    * with the exact `[t_start, t_end)` comparison left as a residual
    * filter — hash-joinable, AQE-skew-handled, scaling with data instead
    * of data × intervals.
    *
    * The interval dim is synthesized deterministically from the corpus
    * bounds (per type: a 36-hour window opening 6 h into every 7th day —
    * deliberately NOT day-aligned, so the residual filter does real work
    * and the day bucketing alone would be WRONG; windows are disjoint so
    * no post-join dedup is needed). The oracle replays the same interval
    * arithmetic and joins with the plain BETWEEN — equality proves the
    * bucketed rewrite IS the range join. Money stays exact integer
    * cents; interval bounds sit on exact hour boundaries so timestamp
    * comparisons never meet float arithmetic. */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables(spark, dir).events
      .select(col("event_type"), col("ts"),
        expr("cast(round(value * 100) as bigint)").as("v_cents"))
    // ONE bounded collect builds the whole interval dim: the per-type
    // min/max aggregate returns <= |type enum| rows (a fixed small
    // vocabulary), giving both the global corpus bounds and the distinct
    // type list in a single pass. The r9 shape paid THREE full fact
    // scans (bounds agg, distinct-types exchange, fact side) and left
    // the dim's lineage rooted in the fact table, so the (type, day)
    // join could not be statically broadcast — the measured sf5
    // superlinearity (0.69 s -> 43.4 s for 50x) was scan multiplication,
    // not candidate growth (each calendar day meets <= 1 disjoint
    // window, so join fan-out is bounded by 1). Now the dim is a pure
    // driver literal: the fact table is scanned ONCE for the aggregate
    // and ONCE for the join, and the join side is a statically-sized
    // local relation Spark broadcasts outright.
    val perType = e.groupBy("event_type")
      .agg(to_date(min("ts")).as("d0"), to_date(max("ts")).as("d1")).collect()
    // an empty (or fully-filtered) corpus has no bounds to build
    // intervals from — return the empty frame with the output schema
    // instead of dying in empty.min below
    if (perType.isEmpty)
      return e.select(col("event_type"), lit(0L).as("promo_id"),
        lit(0L).as("n_events"), lit(0L).as("sum_cents")).limit(0)
    val types = perType.map(_.getString(0)).toSeq.sorted
    val d0 = perType.map(_.getDate(1).toLocalDate).min(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    val d1 = perType.map(_.getDate(2).toLocalDate).max(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    val weeks = java.time.temporal.ChronoUnit.DAYS.between(d0, d1) / 7
    val intervals = types.toDF("event_type")
      .select(col("event_type"), explode(expr(s"sequence(0L, ${weeks}L)")).as("promo_id"))
      .withColumn("t_start",
        expr(s"cast(date_add(date'$d0', cast(promo_id * 7 as int)) as timestamp)")
          + expr("interval 6 hours"))
      .withColumn("t_end", col("t_start") + expr("interval 36 hours"))
    val expanded = intervals
      .select(col("event_type"), col("promo_id"), col("t_start"), col("t_end"),
        explode(expr("sequence(to_date(t_start), to_date(t_end - interval 1 microsecond))"))
          .as("day"))
    e.withColumn("day", to_date(col("ts")))
      .join(broadcast(expanded), Seq("event_type", "day"))
      .filter(col("ts") >= col("t_start") && col("ts") < col("t_end"))
      .groupBy("event_type", "promo_id")
      .agg(count(lit(1)).as("n_events"), sum("v_cents").as("sum_cents"))
  }

  /** EXACT trailing-7-day distinct users per (type, day) — the sliding
    * uniques every dashboard wants and most engines approximate, because
    * the naive formulation re-scans 7 days of raw events per output day
    * and `COUNT(DISTINCT) OVER (RANGE ...)` isn't supported anywhere.
    * The scalable exact shape inverts it: collapse the stream ONCE to
    * distinct (type, day, user) membership (the same first move as
    * [[audienceOverlap]]), emit each membership row to the ≤7 window-end
    * days it can influence (bounded fan-out, map-side `sequence`+
    * `explode`), de-dup per window, count. Two key shuffles total, both
    * on already-collapsed frames that scale with membership (users ×
    * days), never with raw event count. The approximate sibling at
    * larger windows is daily HLL state + window merges
    * ([[Warehouse.sketchStateMerge]]'s machinery).
    *
    * Window-end days outside the corpus span are cut by two collected
    * bound dates (driver data bounded by definition); the first 6 days
    * report their partial (shorter) windows, the standard trailing-window
    * convention. Everything is integer/date arithmetic — bit-identical in
    * any engine. */
  def slidingDistinct(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
    val b = e.agg(to_date(min("ts")).as("d0"), to_date(max("ts")).as("d1")).collect()(0)
    val (d0, d1) = (b.getDate(0), b.getDate(1))
    val membership = e
      .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
    membership
      .select(col("event_type"), col("user_id"),
        explode(expr("sequence(day, date_add(day, 6))")).as("win_day"))
      .filter(col("win_day").between(lit(d0), lit(d1)))
      .distinct()
      .groupBy("event_type", "win_day")
      .agg(count(lit(1)).as("uniques_7d"))
  }

  /** Per-user inter-event gap statistics (ClickHouse `runningDifference` /
    * `neighbor` surface — the LAG half of the window family next to
    * [[runningTotal]]'s cumulative fold and [[movingSum]]'s bounded
    * frame): each user's event timeline differenced once, then collapsed
    * to (count, max, sum) of the gaps.
    *
    * The window is PARTITIONED BY user_id — a keyed window, so the work is
    * one user_id shuffle and a per-user in-memory sort of that user's own
    * rows, never a global sort (SURVEY §4's WindowExec rule: partition-less
    * windows are forbidden, keyed ones scale like any aggregation). The
    * order key is (timestamp-micros, event_id) — event_id is unique, so
    * `lag` is deterministic under ties. Gaps are exact BIGINT microseconds
    * end-to-end: difference, max, and sum all stay in integer space, so
    * any engine reproduces the result bit-for-bit (SURVEY §5). */
  def eventGaps(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
    Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
      .withColumn("prev_tus", lag("tus", 1).over(w))
      .filter(col("prev_tus").isNotNull)
      .select(col("user_id"), (col("tus") - col("prev_tus")).as("gap_us"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"),
        max("gap_us").as("max_gap_us"),
        sum("gap_us").as("sum_gap_us"))
  }

  /** Per-user consecutive-day activity streaks — the gaps-and-islands
    * rewrite (day-number − row_number is constant within a consecutive
    * run) every engine spells the same way; complements [[eventGaps]]
    * (time deltas between events) with the calendar-run statistic product
    * analytics asks for ("longest daily streak").
    *
    * Scale: one distinct-shuffle on (user_id, day) — far smaller than the
    * event stream — then a KEYED window (per-user sort of that user's own
    * few hundred days, never global) and two partial-aggregable rollups.
    * Everything stays in exact integer space (epoch-day arithmetic), so
    * any engine reproduces it bit-for-bit (SURVEY §5). */
  def userStreaks(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables(spark, dir).events
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    days
      .withColumn("grp",
        datediff(col("day"), lit("1970-01-01").cast("date")).cast("long")
          - row_number().over(w))
      .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
      .groupBy("user_id").agg(
        sum("len").as("active_days"),
        count(lit(1)).as("n_streaks"),
        max("len").as("longest_streak"))
  }

  /** Weekly cohort retention matrix (the warehouse triangle every product
    * analytics stack draws; ClickHouse pairs `retention()` with exactly
    * this cohort grid): users grouped by their FIRST-activity ISO week,
    * then for each (cohort week, weeks-since-cohort offset) the count of
    * distinct users active in that later week. [[retention]] covers the
    * per-signup-event flag battery; this is the cohort-level matrix over
    * the whole activity stream.
    *
    * Scale shape: ONE distinct collapses the event stream to (user, week)
    * membership (partial-aggregated — the only corpus-sized step); the
    * per-user cohort week is a min over that SAME membership frame (both
    * aggregations key on user_id, so the frames arrive co-partitioned and
    * the join is Exchange-free on the membership side — at most AQE
    * broadcasts the user-level cohort frame); offsets are exact integer
    * day arithmetic on Monday-truncated dates (ISO weeks in both engines),
    * and each membership row is unique per (user, week), so the final
    * count needs no second distinct. */
  def cohortMatrix(spark: SparkSession, dir: String): DataFrame = {
    val membership = graft.GraftSession.trackCache(
      Tables(spark, dir).events
        .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
        .distinct())
    val cohorts = membership.groupBy("user_id").agg(min("wk").as("cohort_week"))
    membership.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_week"),
        expr("cast(datediff(wk, cohort_week) div 7 as bigint)").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Exact weighted median (ClickHouse `quantileExactWeighted(0.5)`):
    * the median item price with each price weighted by its quantity —
    * the exact-percentile sibling [[quantiles]]'s unweighted
    * interpolation and [[approxQuantiles]]'s sketch can't answer.
    *
    * Scale shape — BUCKET THEN REFINE, the classic exact distributed
    * quantile: a naive per-group cumulative window over distinct prices
    * is a trap here because prices are nearly unique (the "vocabulary"
    * is row-sized, so one task per group sorts the group's whole
    * domain — measured 3.2 s at sf0.1 before this shape). Instead:
    * (1) the corpus collapses once to (group, value, weight) — the only
    * row-scaled shuffle; (2) a COARSE bucket histogram (4096-cent
    * ranges) cumulates under a keyed window over the SMALL buckets
    * frame and picks the pivot bucket containing the median plus the
    * weight strictly before it; (3) the exact scan then runs INSIDE the
    * pivot bucket only — per-task work bounded by one bucket's
    * occupancy, not the group's domain. Limitation, stated plainly:
    * the refine is SINGLE-LEVEL — adversarial concentration (all mass
    * inside one 4096-cent bucket) degrades the in-bucket window to one
    * task over that bucket's distinct values; a second refine level
    * (re-bucketing the pivot at width/64) would bound that too, but
    * price-like domains spread mass across buckets and don't need it,
    * so the extra two stages are not paid here. Results stay exact
    * either way — this is a performance envelope, not a correctness
    * one. The median is the min value whose
    * doubled (before + in-bucket cumulative) weight reaches the group
    * total — pure BIGINT comparisons, no division, no quantization,
    * bit-identical anywhere (lower weighted median, the declared
    * convention). */
  def quantileExactWeighted(spark: SparkSession, dir: String): DataFrame =
    weightedQuantileLevels(spark, dir, Seq(2L))
      .select(col("l_returnflag"), col("total_weight"),
        col("q_cents").as("wmedian_cents"))

  /** The shared bucket-then-refine machinery behind
    * [[quantileExactWeighted]] (level 2/4) and
    * [[quantilesExactWeighted]] (levels 1..3/4): ONE collapse, ONE
    * bucket histogram, ONE total frame — the level rides as a key
    * column from the pivot selection onward, so a fix to the bucket
    * width or the before-weight rule lands in every quantile key at
    * once. Returns the long frame (l_returnflag, k, total_weight,
    * q_cents) where q_cents = min v with `4*cum >= k*total`. */
  private def weightedQuantileLevels(spark: SparkSession, dir: String,
      ks: Seq[Long]): DataFrame = {
    val g = graft.GraftSession.trackCache(
      Tables(spark, dir).lineitem
        .select(col("l_returnflag"),
          expr("cast(round(l_extendedprice * 100) as bigint)").as("cents"),
          expr("cast(round(l_quantity) as bigint)").as("qty"))
        .groupBy("l_returnflag", "cents")
        .agg(sum("qty").as("w")))
    val tot = g.groupBy("l_returnflag").agg(sum("w").as("total_weight"))
    val wb = Window.partitionBy("l_returnflag").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumB = graft.GraftSession.trackCache(
      g.withColumn("b", expr("cents div 4096"))
        .groupBy("l_returnflag", "b").agg(sum("w").as("bw"))
        .withColumn("cumb", sum("bw").over(wb)).join(tot, Seq("l_returnflag")))
    val levels = spark.range(1)
      .select(explode(array(ks.map(lit(_)): _*)).as("k"))
    val pivot = cumB.crossJoin(levels)
      .filter(col("cumb") * 4 >= col("k") * col("total_weight"))
      .groupBy("l_returnflag", "k", "total_weight").agg(min("b").as("pb"))
    val before = cumB.select("l_returnflag", "b", "cumb")
      .join(pivot.select("l_returnflag", "k", "pb"), Seq("l_returnflag"))
      .filter(col("b") < col("pb"))
      .groupBy("l_returnflag", "k").agg(max("cumb").as("w_before"))
    val wv = Window.partitionBy("l_returnflag", "k").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g.join(pivot, Seq("l_returnflag"))
      .filter(expr("cents div 4096") === col("pb"))
      .withColumn("cum_in", sum("w").over(wv))
      .join(before, Seq("l_returnflag", "k"), "left")
      .filter((coalesce(col("w_before"), lit(0L)) + col("cum_in")) * 4 >=
        col("k") * col("total_weight"))
      .groupBy("l_returnflag", "k", "total_weight")
      .agg(min("cents").as("q_cents"))
  }

  /** Multi-level exact weighted quantiles (ClickHouse
    * `quantilesExactWeighted(0.25, 0.5, 0.75)`): the three quartiles of
    * the weighted price multiset in ONE pass over the corpus — the
    * collapse, bucket histogram, and total-weight frames from
    * [[quantileExactWeighted]]'s bucket-then-refine shape are computed
    * once and SHARED across levels; only the pivot selection and the
    * in-bucket refine carry the level as one more key column (a tiny
    * broadcast of groups x levels rows, a 3x row amplification on the
    * in-bucket slice only, and one window partitioned by (group, level)
    * over bucket-bounded frames). Level k/4's value is the min v with
    * `4*cum >= k*total` — the lower-quantile rule, pure BIGINT, the
    * k=2 row bit-identical to the median key. */
  def quantilesExactWeighted(spark: SparkSession, dir: String): DataFrame =
    weightedQuantileLevels(spark, dir, Seq(1L, 2L, 3L))
      .select(col("l_returnflag"), col("k").as("level_q"),
        col("total_weight"), col("q_cents"))

  /** Spearman rank correlation (ClickHouse `rankCorr(x, y)`) between
    * quantity and price, with AVERAGE ranks for ties — the nonparametric
    * sibling of [[corrStats]]'s Pearson.
    *
    * Scale shape: per-row ranks never need a global sort — a value's
    * average rank depends only on the VALUE: `avg_rank(v) = cnt_less(v)
    * + (cnt(v)+1)/2`, carried as the integer `2*avg_rank = 2*cnt_less +
    * cnt + 1`. For x the vocabulary is genuinely small (integral
    * quantities), one tiny cumulative frame. For y (cents, near-unique)
    * `cnt_less` runs as a TWO-LEVEL prefix: an exclusive cumulative over
    * the 4096-cent bucket totals (a domain/4096-sized frame), plus an
    * exclusive in-bucket cumulative PARTITIONED BY bucket — parallel
    * across buckets, per-task work bounded by bucket occupancy, no
    * single task ever sorting the whole domain. Rows then pick up their
    * rank codes via two value equi-joins (the x side is
    * vocabulary-sized; AQE broadcasts it from runtime stats) and the
    * correlation is Pearson over the codes: exact DECIMAL(38,0) moments
    * (per-row products of the doubled <=2n+1 codes fit a BIGINT, but
    * their sums bound at 4n^3 and would wrap past n ~ 1.3e6 — the
    * decimal sums stay exact at any feasible n, matching the oracle's
    * HUGEINT), combined in DOUBLE and rounded once to 1e-4,
    * [[corrStats]]'s exact cross-engine float contract. Both ordered
    * prefixes ride [[GlobalRank.prefixSummed]] (range-partitioned,
    * inclusive; exclusive = inclusive - own), keeping the repo's
    * no-partition-less-WindowExec invariant intact even on the small
    * frames. */
  def rankCorr(spark: SparkSession, dir: String): DataFrame = {
    val rows = graft.GraftSession.trackCache(
      Tables(spark, dir).lineitem.select(
        expr("cast(round(l_quantity) as bigint)").as("x"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("y")))
    val unb = Window.unboundedPreceding
    val vx = GlobalRank.prefixSummed(
      rows.groupBy("x").agg(count(lit(1)).as("cnt")), col("cnt"), "cum", col("x"))
      .select(col("x"), (col("cum") * 2 - col("cnt") + 1).as("ax"))
    val vy = rows.groupBy("y").agg(count(lit(1)).as("cnt"))
      .withColumn("b", expr("y div 4096"))
    val bless = GlobalRank.prefixSummed(
      vy.groupBy("b").agg(sum("cnt").as("bcnt")), col("bcnt"), "bcum", col("b"))
      .select(col("b"), (col("bcum") - col("bcnt")).as("bless"))
    val ay = vy.join(bless, Seq("b"))
      .withColumn("inless",
        coalesce(sum("cnt").over(
          Window.partitionBy("b").orderBy("y").rowsBetween(unb, -1)), lit(0L)))
      .select(col("y"), ((col("bless") + col("inless")) * 2 + col("cnt") + 1).as("ay"))
    // moments widened to DECIMAL(38,0): the doubled codes are <= 2n+1,
    // so per-row products fit a BIGINT to n ~ 1.5e9, but their SUMS
    // bound at 4n^3 and would wrap silently past n ~ 1.3e6 — decimal
    // sums stay exact at any feasible n and cast to the same double the
    // oracle's HUGEINT sums do
    val m = rows.join(vx, Seq("x")).join(ay, Seq("y"))
      .agg(count(lit(1)).as("n"),
        sum(col("ax").cast("decimal(38,0)")).as("sx"),
        sum(col("ay").cast("decimal(38,0)")).as("sy"),
        sum((col("ax") * col("ax")).cast("decimal(38,0)")).as("sxx"),
        sum((col("ay") * col("ay")).cast("decimal(38,0)")).as("syy"),
        sum((col("ax") * col("ay")).cast("decimal(38,0)")).as("sxy"))
    val d = (c: String) => col(c).cast("double")
    m.select(col("n"),
      round((d("n") * d("sxy") - d("sx") * d("sy")) /
        (sqrt(d("n") * d("sxx") - d("sx") * d("sx")) *
          sqrt(d("n") * d("syy") - d("sy") * d("sy"))), 4).as("rank_corr"))
  }

  /** Peak concurrent intervals (ClickHouse `maxIntersections` /
    * `maxIntersectionsPosition`): the maximum number of order lines
    * simultaneously awaiting shipment ([o_orderdate, l_shipdate],
    * closed — a line is "open" from order day through ship day) and the
    * first day that peak holds — the classic sweep-line counting
    * problem.
    *
    * Scale shape: the orderkey equi-join attaches each line's order
    * date (fact-fact key join, co-partitioned shuffles), each interval
    * becomes two DELTA events (+1 at order, -1 the day after ship), the
    * deltas COLLAPSE per day (the only row-scaled aggregation; the
    * result is day-domain-bounded), the open count is a running sum
    * over days via [[GlobalRank.prefixSummed]] (range-partitioned, P
    * collected longs, no single-task window), and the peak is one
    * min_by over the tiny days frame. Ties break to the EARLIEST day —
    * deterministic cross-engine. */
  def maxIntersections(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val iv = t.lineitem.select(col("l_orderkey"), col("l_shipdate"))
      .join(t.orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
    // the stored columns are timestamp[ms]; the sweep runs on DATE days.
    // Both delta events come out of ONE pass over the joined rows
    // (explode of a 2-element array) — a union of two branches would
    // run the join twice, and the differing pruned schemas defeat
    // exchange reuse
    val deltas = iv.select(explode(array(
        struct(to_date(col("o_orderdate")).as("day"), lit(1L).as("d")),
        struct(date_add(to_date(col("l_shipdate")), 1).as("day"),
          lit(-1L).as("d")))).as("e"))
      .select(col("e.day").as("day"), col("e.d").as("d"))
      .groupBy("day").agg(sum("d").as("dl"))
    GlobalRank.prefixSummed(deltas, col("dl"), "open", col("day"))
      .agg(max("open").as("peak_open"),
        min_by(col("day"), struct((-col("open")).as("o"), col("day"))).as("peak_day"))
      .select(col("peak_open"), col("peak_day"))
  }

  /** Global ROC AUC (ClickHouse `arrayAUC`): does an event's value
    * predict that it is a purchase — the model-evaluation aggregate a
    * training pipeline runs over scored corpora, computed as the
    * Mann-Whitney U statistic WITHOUT materializing per-row ranks:
    * `U = sum over scores of pos(s) * (neg_below(s) + neg(s)/2)`, and
    * `AUC = U / (P*N)` (ties get half credit — the trapezoid rule).
    *
    * Scale shape: one (score -> pos, neg) count aggregation is the only
    * row-scaled shuffle (the score domain — distinct cent values — is
    * price-domain-bounded); the cumulative negative count below each
    * score runs through [[GlobalRank.prefixSummed]] (range-partitioned,
    * P collected longs, no single-task window); the finish is one
    * scalar aggregate. Cross-engine float contract: ties contribute
    * halves, so 2U is an exact integer sum — held as DECIMAL(38,0)
    * because 2U is bounded by 2·P·N ≈ n²/2, which outgrows BIGINT past
    * n ≈ 6e9 rows (inside the 100 TB envelope; DuckDB promotes its
    * BIGINT sum to HUGEINT, so a Long accumulator here would diverge
    * exactly at scale). AUC is then ONE IEEE division (identical in
    * any engine) rounded to 1e-4 — no distributed double addition
    * anywhere. A single-class corpus (no positives, or no negatives)
    * has no defined AUC: both engines return NULL by contract rather
    * than a 0/0 NaN. */
  def auc(spark: SparkSession, dir: String): DataFrame = {
    val perScore = Tables(spark, dir).events
      .select(expr("cast(round(value * 100) as bigint)").as("score"),
        (col("event_type") === "purchase").cast("long").as("is_pos"))
      .groupBy("score")
      .agg(sum("is_pos").as("p"), sum(lit(1L) - col("is_pos")).as("n"))
    // ncum includes the current score's negatives; below = ncum - n.
    // p is widened BEFORE the multiply so the per-row product is decimal
    // (2*below + n alone is ≤ 2n — long-safe; the product is not)
    GlobalRank.prefixSummed(perScore, col("n"), "ncum", col("score"))
      .agg(sum(col("p").cast("decimal(38,0)") *
          (lit(2L) * (col("ncum") - col("n")) + col("n"))).as("u2"),
        sum("p").as("pos_n"), sum("n").as("neg_n"))
      .select(
        when(col("pos_n") > 0 && col("neg_n") > 0,
          round(col("u2").cast("double") /
            (lit(2d) * col("pos_n").cast("double") * col("neg_n").cast("double")), 4))
          .as("auc"),
        col("pos_n"), col("neg_n"))
  }

  /** Exact two-sample Kolmogorov-Smirnov statistic (ClickHouse
    * `kolmogorovSmirnovTest`): the largest gap between the purchase and
    * view empirical value-CDFs — "do purchases and views draw from the
    * same spend distribution" as one number, the distribution-level
    * sibling of [[auc]]'s rank-level Mann-Whitney U.
    *
    * `D = max over scores of |F_p(s) - F_v(s)|`, evaluated only at the
    * observed scores (the sup of a difference of step functions is
    * attained at a step). Scale shape mirrors [[auc]]: one
    * (score -> purchase count, view count) aggregation is the only
    * row-scaled shuffle (map-side combined, score domain =
    * price-domain-bounded cent values); BOTH cumulative counts then ride
    * ONE range exchange through [[GlobalRank.prefixSummedAll]] (per-slice
    * offsets = P pairs of longs, never rows); the finish is one scalar
    * max-aggregate. Cross-engine float contract: the per-score gap is
    * compared as the EXACT integer `|cp*V - cv*P|` (cp, cv are long-safe
    * counts; the cross product is held as DECIMAL(38,0) since P*V ~ n²
    * outgrows BIGINT past n ~ 3e9 — DuckDB promotes to HUGEINT, same
    * drill as [[auc]]'s u2), so the argmax is decided on integers; D is
    * then ONE IEEE division rounded to 1e-4. A single-class corpus has no
    * defined D: both engines return NULL by contract. */
  def ksTest(spark: SparkSession, dir: String): DataFrame = {
    val perScore = Tables(spark, dir).events
      .filter(col("event_type").isin("purchase", "view"))
      .select(expr("cast(round(value * 100) as bigint)").as("score"),
        (col("event_type") === "purchase").cast("long").as("is_p"))
      .groupBy("score")
      .agg(sum("is_p").as("np"), sum(lit(1L) - col("is_p")).as("nv"))
    val cum = GlobalRank.prefixSummedAll(perScore,
      Seq(col("np") -> "cp", col("nv") -> "cv"), col("score"))
    // totals = the last cumulative value of each CDF (cum is cached by
    // prefixSummedAll, so this is a cheap re-read, not a recompute)
    val tot = cum.agg(max("cp").as("pos_n"), max("cv").as("view_n"))
    cum.crossJoin(broadcast(tot))
      .groupBy("pos_n", "view_n")
      .agg(max(abs(col("cp").cast("decimal(38,0)") * col("view_n") -
        col("cv").cast("decimal(38,0)") * col("pos_n"))).as("m"))
      .select(
        when(col("pos_n") > 0 && col("view_n") > 0,
          round(col("m").cast("double") /
            (col("pos_n").cast("double") * col("view_n").cast("double")), 4))
          .as("ks_d"),
        col("pos_n"), col("view_n"))
  }

  /** Shannon entropy of a value distribution (ClickHouse `entropy`):
    * how concentrated each event type's traffic is across users — the
    * diversity gauge next to [[distinctUsers]]'s plain count.
    *
    * `H = log2(N) - (1/N) * sum(c_v * log2(c_v))` over the per-value
    * counts. Scale shape: one (type, user) count aggregation (the only
    * row-scaled shuffle, map-side combined), then a per-type rollup of
    * the counts frame. Cross-engine float contract: `log2` is not
    * correctly rounded across engines, so each value's log2 quantizes
    * ONCE to 1e-6 units (the ln/exp/pow drill), the weighted sum runs
    * as exact BIGINTs, and the final combine is one identical division
    * + subtraction rounded to 1e-4 bits. */
  def entropy(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables(spark, dir).events
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("c"))
    counts.groupBy("event_type")
      .agg(sum("c").as("n"),
        count(lit(1)).as("n_values"),
        sum(expr("c * cast(floor(log2(cast(c as double)) * 1e6 + 0.5) as bigint)"))
          .as("s_q6"))
      .select(col("event_type"), col("n"), col("n_values"),
        round((expr("cast(floor(log2(cast(n as double)) * 1e6 + 0.5) as bigint)")
          .cast("double") - col("s_q6").cast("double") / col("n").cast("double")) / 1e6,
          4).as("entropy_bits"))
  }

  /** Cramer's V association (ClickHouse `cramersV`) between event type
    * and day-of-week — "is traffic shape independent of weekday" as one
    * number in [0, 1].
    *
    * The contingency table is types x 7 cells — everything after the
    * count aggregation is frame arithmetic on tiny broadcastable
    * frames (row sums, column sums, grand total), never a collect.
    * Cross-engine float contract: each cell's chi-square contribution
    * `(n_ij - e_ij)^2 / e_ij` is a fixed IEEE sequence on exact
    * integers (identical in any engine) quantized ONCE to 1e-6 units;
    * the sum over cells is then exact BIGINT — immune to double
    * addition order, which a distributed sum cannot pin — and V is one
    * final sqrt rounded to 1e-4. */
  def cramersV(spark: SparkSession, dir: String): DataFrame = {
    val cells = graft.GraftSession.trackCache(
      Tables(spark, dir).events
        .select(col("event_type"), dayofweek(col("ts")).cast("long").as("dow"))
        .groupBy("event_type", "dow").agg(count(lit(1)).as("nij")))
    val rows = cells.groupBy("event_type").agg(sum("nij").as("ri"))
    val cols = cells.groupBy("dow").agg(sum("nij").as("cj"))
    val tot = cells.agg(sum("nij").as("n"),
      countDistinct("event_type").as("r"), countDistinct("dow").as("c"))
    cells.join(rows, Seq("event_type")).join(cols, Seq("dow")).crossJoin(broadcast(tot))
      .withColumn("e", col("ri").cast("double") * col("cj").cast("double") / col("n").cast("double"))
      .withColumn("chi_q6", expr(
        "cast(floor((cast(nij as double) - e) * (cast(nij as double) - e) / e * 1e6 + 0.5) as bigint)"))
      .groupBy("n", "r", "c").agg(sum("chi_q6").as("chi2_q6"))
      .select(col("n"),
        round(col("chi2_q6").cast("double") / 1e6, 4).as("chi2"),
        round(sqrt(col("chi2_q6").cast("double") / 1e6 /
          (col("n").cast("double") * (least(col("r"), col("c")) - 1).cast("double"))), 4)
          .as("cramers_v"))
  }

  /** Welch's unequal-variance t statistic (ClickHouse `welchTTest`)
    * between purchase and view order values: do the two event types
    * spend differently, as a significance-scaled number.
    *
    * Exact integer moments per group (n, sum, sum of squares over
    * cents — one filtered aggregation, map-side combined; the squared
    * sum is held as DECIMAL(38,0) since Σv² over ~1e9-cent values
    * outgrows BIGINT well inside the 100 TB envelope, where DuckDB
    * silently promotes to HUGEINT), then the whole statistic is a
    * fixed IEEE sequence on those six exact integers: identical in
    * any engine, rounded once to 1e-4. The p-value needs
    * the incomplete beta function (not expressible as a deterministic
    * cross-engine SQL contract) — consumers threshold on |t|, the
    * standard practice. */
  def welchTTest(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables(spark, dir).events
      .filter(col("event_type").isin("purchase", "view"))
      .select(col("event_type"), expr("cast(round(value * 100) as bigint)").as("v"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("v").as("s"),
        sum(col("v").cast("decimal(38,0)") * col("v")).as("ss"))
    val p = m.filter(col("event_type") === "purchase")
      .select(col("n").as("n1"), col("s").as("s1"), col("ss").as("ss1"))
    val v = m.filter(col("event_type") === "view")
      .select(col("n").as("n2"), col("s").as("s2"), col("ss").as("ss2"))
    p.crossJoin(v).select(col("n1"), col("n2"),
      round(expr(
        """(cast(s1 as double) / cast(n1 as double) - cast(s2 as double) / cast(n2 as double)) /
          |sqrt((cast(ss1 as double) - cast(s1 as double) * cast(s1 as double) / cast(n1 as double))
          |       / (cast(n1 as double) - 1.0d) / cast(n1 as double)
          |   + (cast(ss2 as double) - cast(s2 as double) * cast(s2 as double) / cast(n2 as double))
          |       / (cast(n2 as double) - 1.0d) / cast(n2 as double))""".stripMargin), 4)
        .as("t_stat"))
  }

  /** Ordered-subsequence pattern match (ClickHouse
    * `sequenceMatch('(?1).*(?2).*(?3)')`): does each user's timeline
    * contain signup, THEN a view strictly after it, THEN a purchase
    * strictly after that — unbounded by any window (the complement of
    * [[windowFunnel]]'s within-7-days level count)?
    *
    * The scalable shape is a CHAIN OF CONDITIONAL MINS, not a per-user
    * sort: t1 = min signup time; t2 = min view time AFTER t1; t3 = min
    * purchase time AFTER t2 — each step one filtered aggregation over the
    * events co-keyed on user_id plus one user-keyed join (the frames
    * arrive co-partitioned from their shuffles; nothing ever collects or
    * sorts a timeline). Earliest-first greedy matching is exact for
    * existence: if ANY ordered triple exists, the minimal one exists.
    * Strict `>` at each step is the declared tie rule (equal timestamps
    * do not chain — cross-engine deterministic without an event-id
    * tiebreak). Times stay exact BIGINT micros. */
  def sequenceMatch(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.GraftSession.trackCache(
      Tables(spark, dir).events
        .filter(col("event_type").isin("signup", "view", "purchase"))
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tus")))
    val t1 = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("tus").as("t1"))
    val t2 = e.filter(col("event_type") === "view")
      .join(t1, Seq("user_id")).filter(col("tus") > col("t1"))
      .groupBy("user_id").agg(min("tus").as("t2"))
    val t3 = e.filter(col("event_type") === "purchase")
      .join(t2, Seq("user_id")).filter(col("tus") > col("t2"))
      .groupBy("user_id").agg(min("tus").as("t3"))
    // t3 already encodes the whole chain (a user reaches t3 only through
    // t2), so the output joins t1 -> t3 directly
    t1.join(t3, Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("t3").isNotNull, 1L).otherwise(0L).as("seq_matched"),
        col("t1").as("signup_us"))
  }

  /** Positive-delta accumulation (ClickHouse `deltaSum(value)`): per
    * event type, the sum of INCREASES between consecutive readings in
    * time order — the counter-reset-tolerant rate primitive (a
    * monotonically increasing gauge that occasionally resets contributes
    * only its upward movement).
    *
    * Scale shape — SEGMENT THEN STITCH: a per-type window over the whole
    * timeline is one task sorting a type's entire history. Instead the
    * timeline splits at day boundaries: (1) the consecutive-delta window
    * runs PARTITIONED BY (type, day) — task size is one day of one type,
    * bounded by time granularity, embarrassingly parallel across days;
    * (2) each (type, day) also yields its first/last reading (`min_by`/
    * `max_by` under the same total order — part of the SAME aggregate,
    * no extra pass); (3) the day-boundary deltas (last of the previous
    * PRESENT day -> first of this day) stitch under a window over the
    * per-day frame — days x types rows, never row-scaled. The declared
    * total order is (epoch micros, event_id) — ties in the truncated
    * timestamp are broken identically in both engines. Values are exact
    * integer cents; a null predecessor (segment head) contributes 0. */
  def deltaSum(spark: SparkSession, dir: String): DataFrame = {
    // one linear chain, consumed once — no cache boundary needed
    val e = Tables(spark, dir).events.select(
      col("event_type"), col("event_id"),
      unix_micros(col("ts")).as("tus"),
      to_date(col("ts")).as("day"),
      expr("cast(round(value * 100) as bigint)").as("cents"))
    val wd = Window.partitionBy("event_type", "day").orderBy("tus", "event_id")
    val inDay = e.withColumn("prev", lag("cents", 1).over(wd))
      .groupBy("event_type", "day")
      .agg(
        sum(when(col("cents") > col("prev"), col("cents") - col("prev"))
          .otherwise(0L)).as("in_day"),
        count(lit(1)).as("n"),
        min_by(col("cents"), struct(col("tus"), col("event_id"))).as("first_v"),
        max_by(col("cents"), struct(col("tus"), col("event_id"))).as("last_v"))
    val wb = Window.partitionBy("event_type").orderBy("day")
    inDay.withColumn("prev_last", lag("last_v", 1).over(wb))
      .groupBy("event_type")
      .agg((sum("in_day") +
        sum(when(col("first_v") > col("prev_last"),
          col("first_v") - col("prev_last")).otherwise(0L))).as("delta_sum_cents"),
        sum("n").as("n_events"))
      .select("event_type", "delta_sum_cents", "n_events")
  }

  /** Conditional aggregates (ClickHouse `countIf`/`sumIf`/`avgIf` — the
    * `-If` combinator family): one daily scan answering several filtered
    * questions at once instead of one scan per filter. Every conditional
    * is a `when` INSIDE the aggregate, so the whole battery is a single
    * partial/final HashAggregate pair over one pass of the corpus — the
    * reason the combinator family exists. `avgIf` over an empty slice is
    * NULL (both engines' FILTER/if convention), not 0. Purchase revenue
    * follows the exact-cents contract (its magnitude grows with the
    * corpus; the per-day high-value average divides a bounded-magnitude
    * sum and stays on the plain double contract like [[sample]]). */
  def condAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n_events"),
        count(when(col("event_type") === "purchase", lit(1))).as("n_purchases"),
        (sum(when(col("event_type") === "purchase",
          expr("cast(round(value * 100) as bigint)")).otherwise(0L)) / 100.0)
          .as("purchase_value"),
        count(when(col("value") > 50d, lit(1))).as("n_high"),
        round(avg(when(col("value") > 50d, col("value"))), 4).as("avg_high_value"))

  /** Bitwise aggregates (ClickHouse `groupBitAnd`/`groupBitOr`/
    * `groupBitXor`): fold every user id of an event type through AND /
    * OR / XOR — the flag-mask rollup (which permission bits are shared
    * by ALL members, present in ANY, toggled an odd number of times).
    * All three folds are associative and commutative over exact BIGINTs,
    * so partial aggregation is free, the result is
    * shuffle-order-independent, and any engine agrees bit-for-bit —
    * the cheapest possible distributive aggregate: one scan, one
    * type-keyed exchange of 5 rows. XOR folds every EVENT row (odd
    * multiplicity parity); AND/OR are idempotent so duplicates are
    * harmless either way. */
  def bitOps(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy("event_type")
      .agg(
        expr("bit_and(user_id)").as("users_bit_and"),
        expr("bit_or(user_id)").as("users_bit_or"),
        expr("bit_xor(user_id)").as("users_bit_xor"),
        count(lit(1)).as("n_events"))

  /** Capped distinct count (ClickHouse `uniqUpTo(N)`): per (event type,
    * day), the exact distinct-user count while it is ≤ N, and the
    * sentinel N+1 once it exceeds N — "did this slice clear the
    * threshold" without carrying unbounded distinct state. The engine's
    * point is BOUNDED per-group state (it stops collecting at N+1
    * elements); here the same contract rides the two-exchange exact
    * shape [[distinctUsers]] uses — (key, user) collapse with partial
    * aggregation, then a capped count — because Spark's sort-based
    * distinct never holds a per-group set in memory at all, which is
    * the stronger bound. The cap then matters only to the ANSWER (the
    * engine-compatibility sentinel), not to feasibility. N = 50 sits
    * inside this corpus' 42–67 per-slice spread, so both branches of
    * the contract are exercised. */
  def uniqUpTo(spark: SparkSession, dir: String, n: Int = 50): DataFrame =
    Tables(spark, dir).events
      .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
      .groupBy("event_type", "day")
      .agg(least(count(lit(1)), lit(n.toLong + 1L)).as("uniq_upto"))

  /** Behavioral transition matrix (the Markov-chain rollup ClickHouse
    * sites build from `neighbor()`/window chains): for each ordered pair
    * of event types, how often does type A immediately precede type B in
    * one user's timeline, and what fraction of A-transitions go to B —
    * the session-model input for next-action prediction.
    *
    * Scale shape: the `lag` window is KEYED by user (task size = one
    * user's history — the same per-entity bound every sessionize-family
    * key rides), the pair aggregate collapses map-side to the |types|²
    * key space, and the row-probability normalization is a window over
    * the 25-row matrix frame, never raw rows. The declared total order
    * is (epoch micros, event_id) — truncated-timestamp ties break
    * identically in any engine. The probability is ONE division of two
    * exact BIGINTs, rounded once. */
  def transitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(unix_micros(col("ts")), col("event_id"))
    val pairs = Tables(spark, dir).events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("to_type"))
      .withColumn("from_type", lag("to_type", 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n_transitions"))
    val wRow = Window.partitionBy("from_type")
    pairs.select(col("from_type"), col("to_type"), col("n_transitions"),
      round(col("n_transitions").cast("double") /
        sum("n_transitions").over(wRow).cast("double"), 4).as("p"))
  }

  /** Per-group simple least squares (ClickHouse
    * `simpleLinearRegression`): regress spend cents on hour-of-day per
    * event type — slope (cents per hour), intercept, and r² from ONE
    * scan of closed-form sums, the classic distributive-statistics
    * shape ([[corr]]'s sibling with a fitted line instead of a
    * coefficient).
    *
    * Scale shape: n, Σx, Σy, Σx², Σxy, Σy² are all
    * associative-commutative folds — one partial/final HashAggregate
    * pair, a |types|-row exchange, nothing else. Cross-engine float
    * contract (the [[welchTTest]] drill): x ≤ 23 keeps Σx² long-safe
    * at any corpus size, but Σxy and Σy² outgrow BIGINT inside the
    * 100 TB envelope, so both accumulate as DECIMAL(38,0) (DuckDB
    * promotes to HUGEINT); the slope/intercept numerators and the
    * shared denominator n·Σx²−(Σx)² are then EXACT integers, and each
    * statistic is one fixed IEEE sequence on their exactly-converted
    * doubles, rounded once. r²'s denominator product n·den_x·den_y
    * would outgrow even DECIMAL(38), so it multiplies as doubles —
    * still a fixed sequence on exact inputs. Degenerate slices (one
    * distinct x, or zero y-variance) yield NULL by contract, not 0/0. */
  def linReg(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables(spark, dir).events
      .select(col("event_type"),
        hour(col("ts")).cast("long").as("x"),
        expr("cast(round(value * 100) as bigint)").as("y"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
        sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"))
      .withColumn("num",
        col("n").cast("decimal(38,0)") * col("sxy") -
          col("sx").cast("decimal(38,0)") * col("sy"))
      .withColumn("den_x",
        col("n").cast("decimal(38,0)") * col("sxx") -
          col("sx").cast("decimal(38,0)") * col("sx"))
      .withColumn("den_y",
        col("n").cast("decimal(38,0)") * col("syy") -
          col("sy").cast("decimal(38,0)") * col("sy"))
    m.select(col("event_type"), col("n"),
      when(col("den_x") > 0,
        round(col("num").cast("double") / col("den_x").cast("double"), 6))
        .as("slope"),
      when(col("den_x") > 0,
        round((col("sy").cast("decimal(38,0)") * col("sxx") -
          col("sx").cast("decimal(38,0)") * col("sxy")).cast("double") /
          col("den_x").cast("double"), 4))
        .as("intercept"),
      when(col("den_x") > 0 && col("den_y") > 0,
        round(col("num").cast("double") * col("num").cast("double") /
          (col("den_x").cast("double") * col("den_y").cast("double")), 4))
        .as("r2"))
  }

  /** Exact median absolute deviation per group (ClickHouse
    * `medianExact` composed into the robust-spread statistic): the
    * lower median m of spend cents per event type, then the lower
    * median of |v − m| — the outlier-immune alternative to stddev a
    * quality pipeline thresholds on.
    *
    * Scale shape: the corpus collapses ONCE to (group, value, count) —
    * the only row-scaled shuffle (map-side combined, value domain =
    * price-bounded cents); both median passes then run windows over
    * that COLLAPSED domain keyed by group ([[quantilesExactWeighted]]'s
    * argument: per-task work is bounded by the group's distinct-value
    * count, never its row count — and the deviation re-collapse can
    * only shrink the frame). Both medians use the declared lower-median
    * convention — min v whose doubled cumulative count reaches the
    * group total — pure BIGINT comparisons, no interpolation, no
    * floats anywhere, bit-identical in any engine. */
  def mad(spark: SparkSession, dir: String): DataFrame = {
    val coll = graft.GraftSession.trackCache(
      Tables(spark, dir).events
        .select(col("event_type"), expr("cast(round(value * 100) as bigint)").as("v"))
        .groupBy("event_type", "v").agg(count(lit(1)).as("c")))
    def lowerMedian(df: DataFrame, out: String): DataFrame = {
      val w = Window.partitionBy("event_type").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = df.groupBy("event_type").agg(sum("c").as("n"))
      df.withColumn("cum", sum("c").over(w))
        .join(tot, Seq("event_type"))
        .filter(col("cum") * 2 >= col("n"))
        .groupBy("event_type").agg(min("v").as(out))
    }
    val med = lowerMedian(coll, "median_cents")
    val devs = coll.join(med, Seq("event_type"))
      .select(col("event_type"),
        abs(col("v") - col("median_cents")).as("v"), col("c"))
      .groupBy("event_type", "v").agg(sum("c").as("c"))
    med.join(lowerMedian(devs, "mad_cents"), Seq("event_type"))
      .select("event_type", "median_cents", "mad_cents")
  }

  /** Theil's uncertainty coefficient U(type | weekday) (ClickHouse
    * `theilsU`): the fraction of event-type entropy explained by the
    * day of week — [[cramersV]]'s information-theoretic sibling on the
    * SAME contingency table, asymmetric by design (knowing the weekday
    * narrows the type; the reverse question is a different number).
    *
    * U = (H(X) − H(X|Y)) / H(X) algebraically rearranged so that both
    * numerator and denominator are EXACT integers:
    * N·1e6·H(X) = N·q(log₂N) − Σₓ nₓ·q(log₂nₓ) and
    * N·1e6·H(X|Y) = Σ_y n_y·q(log₂n_y) − Σ_xy c·q(log₂c), where q is
    * the [[entropy]] drill's quantize-once-to-1e-6 log. The N in both
    * scalings cancels, so U = (T − Sx − Sy + Sxy) / (T − Sx) — one
    * division of exact integers rounded once, no distributed double
    * addition anywhere. Each term is bounded by N·q(log₂N) ~ 4e19 at
    * 100 TB — past BIGINT, so the weighted sums accumulate as
    * DECIMAL(38,0) (DuckDB promotes to HUGEINT). Scale shape: one
    * (type, weekday) count aggregation is the only row-scaled shuffle;
    * everything after is arithmetic on the ≤ 7·|types| cell frame.
    * H(X) = 0 (a single-type corpus) → NULL by contract. */
  def theilsU(spark: SparkSession, dir: String): DataFrame = {
    def q(c: Column): Column =
      expr(s"cast(floor(log2(cast(${c.toString} as double)) * 1e6 + 0.5) as bigint)")
    val cells = graft.GraftSession.trackCache(
      Tables(spark, dir).events
        .select(col("event_type"), dayofweek(col("ts")).cast("long").as("dow"))
        .groupBy("event_type", "dow").agg(count(lit(1)).as("c")))
    val sxy = cells.agg(
      sum(col("c").cast("decimal(38,0)") * q(col("c"))).as("sxy"),
      sum("c").as("n"))
    val sx = cells.groupBy("event_type").agg(sum("c").as("cx"))
      .agg(sum(col("cx").cast("decimal(38,0)") * q(col("cx"))).as("sx"))
    val sy = cells.groupBy("dow").agg(sum("c").as("cy"))
      .agg(sum(col("cy").cast("decimal(38,0)") * q(col("cy"))).as("sy"))
    sxy.crossJoin(sx).crossJoin(sy)
      .withColumn("t", col("n").cast("decimal(38,0)") * q(col("n")))
      .select(col("n"),
        when(col("t") - col("sx") > 0,
          round((col("t") - col("sx") - col("sy") + col("sxy")).cast("double") /
            (col("t") - col("sx")).cast("double"), 4))
          .as("theils_u"))
  }

  /** Parallel largest-triangle-three-buckets downsampling (ClickHouse
    * `largestTriangleThreeBuckets`): one visually-representative point
    * per (event type, 12-hour bucket) — the point maximizing the
    * triangle area against the NEIGHBOR BUCKETS' average points. The
    * published LTTB chains on the previously-SELECTED point, which
    * serializes the whole series; anchoring on the previous bucket's
    * AVERAGE instead (the standard parallel variant) makes every
    * bucket's argmax independent — the selection is embarrassingly
    * parallel and, per series, a pure aggregation.
    *
    * Scale shape: one (type, bucket) partial/final aggregate builds the
    * anchor frame (Σt, Σcents, n — time-range-bounded row count); lag/
    * lead over that TINY frame attach neighbor anchors; candidates join
    * the broadcast anchor frame and the per-bucket argmax is a map-side
    * `max_by` — no window over raw rows, no sort, one exchange.
    * Cross-engine exactness: anchors quantize ONCE to the integer grid
    * (micros via `div`, centi-cents via `100·Σy div n` — exact integer
    * division in any engine), the doubled triangle area is then a
    * cross product of exact integers held as DECIMAL(38,0), and the
    * argmax tie-breaks by (earliest micros, event id) — a total order,
    * so the selected point is bit-identical anywhere. First/last
    * buckets have no interior triangle and are excluded by contract. */
  def lttb(spark: SparkSession, dir: String): DataFrame = {
    val width = 43200000000L // 12 h in micros
    val pts = graft.GraftSession.trackCache(
      Tables(spark, dir).events
        .select(col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("tus"),
          expr("cast(round(value * 100) as bigint)").as("cents"))
        .withColumn("bucket", expr(s"tus div ${width}L")))
    val wSeq = Window.partitionBy("event_type").orderBy("bucket")
    val anchors = pts.groupBy("event_type", "bucket")
      // Σmicros outgrows BIGINT past ~5e3 rows/bucket · 1e15 µs —
      // decimal accumulators, HUGEINT in the oracle (the welch drill)
      .agg(sum(col("tus").cast("decimal(38,0)")).as("st"),
        sum(col("cents").cast("decimal(38,0)")).as("sc"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("bucket"),
        expr("cast(st div n as bigint)").as("ax"),
        expr("cast((sc * 100) div n as bigint)").as("ay"))
      .withColumn("ax_prev", lag("ax", 1).over(wSeq))
      .withColumn("ay_prev", lag("ay", 1).over(wSeq))
      .withColumn("ax_next", lead("ax", 1).over(wSeq))
      .withColumn("ay_next", lead("ay", 1).over(wSeq))
      .filter(col("ax_prev").isNotNull && col("ax_next").isNotNull)
    pts.join(broadcast(anchors), Seq("event_type", "bucket"))
      .withColumn("area2", abs(
        (col("tus") - col("ax_prev")).cast("decimal(38,0)") *
          (col("ay_next") - col("ay_prev")) -
          (col("ax_next") - col("ax_prev")).cast("decimal(38,0)") *
            (col("cents") * 100L - col("ay_prev"))))
      .groupBy("event_type", "bucket")
      .agg(max_by(
        struct(col("event_id"), col("cents")),
        struct(col("area2"), (-col("tus")).as("nt"), (-col("event_id")).as("ne")))
        .as("sel"))
      .select(col("event_type"), col("bucket"),
        col("sel.event_id").as("event_id"), col("sel.cents").as("sel_cents"))
  }
}
