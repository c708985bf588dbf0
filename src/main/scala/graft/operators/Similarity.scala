package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`Array[Float]` vectors).
  *
  * Three tiers, same contract (top-k neighbors per query vector):
  *  - [[topK]]        exact brute force — the correctness baseline.
  *  - [[lshTopK]]     random-hyperplane LSH (OR-amplified band tables) —
  *                    the shuffle-light path when the corpus is billions.
  *  - [[ivfTopK]]     IVF (k-means coarse quantizer + nprobe) — the
  *                    FAISS-shaped scale path.
  *
  * All dot products go through the native codegen'd
  * [[graft.functions.DotProduct]] expression (same sequential summation
  * order as the builtin fold, so scores match the DuckDB oracle exactly).
  */
object Similarity {

  private val cosineCol =
    expr("dot_product(va, vb)") / (col("nrma") * col("nrmb"))

  /** vec_id, v (double vector), nrm (L2 norm), computed map-side once. */
  private def vecs(spark: SparkSession, dir: String): DataFrame = {
    GraftSession.registerFunctions(spark)
    Tables(spark, dir).embeddings
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("nrm", expr("sqrt(dot_product(v, v))"))
  }

  private def rankTop5(scored: DataFrame): DataFrame =
    scored
      // filter on the raw row_number, cast afterwards: the filter sitting
      // directly on the window output lets the TopKPerKey rewrite replace
      // WindowExec with the bounded-heap operator (see graft.plans)
      .withColumn("rnk_i", row_number().over(
        Window.partitionBy("q_id").orderBy(round(col("cosine"), 6).desc, col("n_id"))))
      .filter(col("rnk_i") <= 5)
      .select(col("q_id"), col("n_id"), round(col("cosine"), 4).as("score"),
        col("rnk_i").cast("long").as("rnk"))

  /** Contrastive training-pair construction — the CLIP/DPR-style data
    * step that turns an embedded corpus into (anchor, negative_j) rows
    * with similarity labels. Negatives are DETERMINISTIC pseudo-random
    * draws (Knuth multiplicative hash of (anchor, j) mod corpus size —
    * reproducible in any engine, the same philosophy as trainMix's
    * md5-bucket sampling), self-draws skipped, and each pair is scored so
    * downstream filtering can separate easy negatives from hard ones
    * (high-cosine negatives are the valuable ones for contrastive loss).
    *
    * Scale shape: the negative-id table is a pure projection (4 rows per
    * anchor, no data movement), and fetching the negative vectors is ONE
    * equi-join on vec_id — hash-partitioned, no broadcast of the corpus,
    * no cartesian. The anchor side carries its vector through the join;
    * scoring is the codegen'd dot product map-side. At 100 TB this is
    * the same shape as a fact-fact key join; nothing is quadratic.
    * The corpus-size scalar rides a broadcast single-row frame. */
  def contrastivePairs(spark: SparkSession, dir: String, negatives: Int = 4): DataFrame = {
    val e = vecs(spark, dir)
    val n = e.agg(count(lit(1)).as("n_vecs"))
    val anchors = e.select(col("vec_id").as("q_id"), col("v").as("va"), col("nrm").as("nrma"))
      .crossJoin(broadcast(n))
      .select(col("q_id"), col("va"), col("nrma"), col("n_vecs"),
        explode(expr(s"sequence(1, $negatives)")).as("j"))
      // Knuth multiplicative hash, kept in exact BIGINT range: ids and j
      // are small, 2654435761 * q_id + 40503 * j < 2^63 at any real scale
      .withColumn("neg_id", expr("pmod(2654435761 * q_id + 40503 * j, n_vecs)"))
      .filter(col("neg_id") =!= col("q_id")) // no self-negatives
    anchors
      .join(e.select(col("vec_id").as("neg_id"), col("v").as("vb"), col("nrm").as("nrmb")),
        Seq("neg_id"))
      .select(col("q_id"), col("j").cast("long").as("j"), col("neg_id"),
        round(cosineCol, 4).as("score"))
  }

  /** Exact cosine top-5 for each query vector (vec_id < 10) over the rest
    * of the corpus. The tiny query set is broadcast, so the corpus never
    * shuffles; ranking is `row_number` over (rounded score, id) for a
    * deterministic result under float reassociation. */
  def topK(spark: SparkSession, dir: String): DataFrame = {
    val e = vecs(spark, dir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("va"), col("nrm").as("nrma"))
    val c = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("n_id"), col("v").as("vb"), col("nrm").as("nrmb"))
    rankTop5(c.crossJoin(broadcast(q)).withColumn("cosine", cosineCol))
  }

  /** Exact cosine RANGE search (`ann_range`) — the radius-query member of
    * the retrieval family (FAISS `range_search` semantics): every corpus
    * vector with cosine ≥ τ of each query vector, NOT a fixed top-k. The
    * production op behind "pull everything similar enough" jobs —
    * near-duplicate candidate harvest, hard-negative mining above a
    * floor, semantic recall sweeps — where k is unknowable in advance.
    *
    * Scale shape: the tiny query set broadcasts (the corpus never
    * shuffles), scoring is the codegen'd dot product map-side, and the
    * τ filter runs INSIDE the same stage — no window, no rank, no
    * aggregate anywhere: scan → broadcast-nest → filter is one narrow
    * pipeline whose output is data-dependent by design. The boundary
    * decision reads round(cosine, 6) ≥ τ so float reassociation can
    * never flip membership (the [[rankTop5]] rounding contract); the
    * banded/indexed siblings (`dedup_minhash_lsh`, `ann_ivf`) remain the
    * sub-linear route when the query side is also corpus-sized. */
  def rangeSearch(spark: SparkSession, dir: String, tau: Double = 0.2): DataFrame = {
    val e = vecs(spark, dir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("va"), col("nrm").as("nrma"))
    val c = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("n_id"), col("v").as("vb"), col("nrm").as("nrmb"))
    c.crossJoin(broadcast(q)).withColumn("cosine", cosineCol)
      .filter(round(col("cosine"), 6) >= tau)
      .select(col("q_id"), col("n_id"), round(col("cosine"), 4).as("score"))
  }

  /** Sign-bit pack of a 32-dim word: bit `i` is set iff dimension
    * `offset + i` of `v` is > 0. Two words cover the 64-dim vectors.
    * The 32-bit word width is the ORACLE contract — DuckDB's checked
    * BIGINT arithmetic cannot form the bit-63 term — and costs nothing:
    * two hamming64 calls over half-empty words are the same two
    * XOR+POPCNT instructions as one call over a full word. The pack is
    * exact integer arithmetic (a sum of distinct powers of two), so
    * fold order is irrelevant and both engines agree bit-for-bit. */
  private def signPack(offset: Int): Column = expr(
    s"""aggregate(transform(slice(v, ${offset + 1}, 32),
       |  (x, i) -> IF(x > 0D, shiftleft(1L, i), 0L)), 0L, (a, b) -> a + b)""".stripMargin)

  /** Binary-quantized retrieval cascade (`ann_hamming`) — the 1-bit
    * sibling of [[int8Quantize]] and the fourth point on the engine's
    * quantization axis (float exact / PQ / int8 / binary): sign-bit
    * vectors give 64× scan compression (one bit per dimension) and a
    * Hamming distance that is two XOR+POPCNT instructions, which is how
    * production binary indexes (FAISS `IndexBinaryFlat`, the "binary
    * quantization" tier of vector stores) run their first pass.
    *
    * Cascade: (1) pack each vector into two 32-bit sign words MAP-SIDE —
    * the full-corpus Hamming scan then moves ~17 bytes/row instead of the
    * 512-byte double vector, the point of the method at 100 TB; (2)
    * shortlist the `shortlist` nearest corpus vectors per broadcast query
    * by (hamming, n_id) — the native codegen'd [[graft.functions
    * .HammingDistance64]] per word, ranked by the bounded-heap
    * [[graft.plans.TopKPerKey]] rewrite (never a partition sort); (3)
    * re-fetch ONLY the shortlisted vectors by id (the candidate set is
    * queries × shortlist rows — broadcast, so the corpus side of the
    * re-fetch join never shuffles) and rerank by exact cosine to the
    * final top-5 under the [[rankTop5]] rounding contract. With
    * `shortlist` ≥ corpus the cascade provably equals brute force
    * (every vector reaches the exact rerank) — Round12Spec pins that,
    * the checked config's oracle replays the pruned cascade exactly,
    * and the pruned config's recall floor is spec-asserted. */
  def hammingTopK(spark: SparkSession, dir: String, shortlist: Int = 50): DataFrame = {
    val e = vecs(spark, dir)
    val packed = e.select(col("vec_id"), signPack(0).as("h0"), signPack(32).as("h1"))
    val qp = packed.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("h0").as("a0"), col("h1").as("a1"))
    val cp = packed.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("n_id"), col("h0").as("b0"), col("h1").as("b1"))
    val cand = cp.crossJoin(broadcast(qp))
      .withColumn("hamming",
        (expr("hamming64(a0, b0)") + expr("hamming64(a1, b1)")).cast("long"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("q_id").orderBy(col("hamming"), col("n_id"))))
      .filter(col("rn") <= shortlist)
      .select("q_id", "n_id", "hamming")
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("va"), col("nrm").as("nrma"))
    val c = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("n_id"), col("v").as("vb"), col("nrm").as("nrmb"))
    c.join(broadcast(cand), Seq("n_id"))
      .join(broadcast(q), Seq("q_id"))
      .withColumn("cosine", cosineCol)
      .withColumn("rnk_i", row_number().over(
        Window.partitionBy("q_id").orderBy(round(col("cosine"), 6).desc, col("n_id"))))
      .filter(col("rnk_i") <= 5)
      .select(col("q_id"), col("n_id"), col("hamming"),
        round(col("cosine"), 4).as("score"), col("rnk_i").cast("long").as("rnk"))
  }

  /** Deterministic random hyperplanes (fixed seed, JVM-stable LCG),
    * flattened as `tables x planesPerTable` rows of dim doubles. */
  private[operators] def planes(nTables: Int, planesPerTable: Int, dim: Int): Seq[Seq[Seq[Double]]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(nTables, planesPerTable)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Random-hyperplane LSH with OR-amplification: 4 independent hash
    * tables of 6 planes each. A corpus vector meets a query iff they share
    * a bucket in ANY table (explode table-keyed buckets, equi-join,
    * de-dup), then exact cosine rerank inside the candidate set. At
    * billion-vector scale the equi-join on (table, bucket) replaces the
    * cross join; recall is tuned via tables x planes.
    *
    * `probeAll = true` is the exhaustive-multiprobe calibration config
    * (every query probes all 2^6 buckets of every table): the CORPUS side
    * keeps its real hashes — the indexed side, the one that matters at
    * scale — so every candidate still arrives through the bucket
    * equi-join + de-dup machinery, but none can be missed, making the
    * result provably equal to brute-force top-k. That is the config the
    * driver oracle checks against [[topK]]'s SQL (the engine-independent
    * answer); the production pruned config (probe own buckets only) is
    * what SimilaritySpec's recall floor tests. */
  def lshTopK(spark: SparkSession, dir: String, probeAll: Boolean = false): DataFrame = {
    val pl = typedLit(planes(4, 6, 64))
    val e = vecs(spark, dir)
      .withColumn("pl", pl)
      .withColumn("buckets", expr(
        """transform(sequence(0, 3), t ->
          |  aggregate(sequence(0, 5), cast(t * 64 as bigint), (acc, p) ->
          |    acc * 2 + CASE WHEN dot_product(v, element_at(element_at(pl, t + 1), p + 1)) > 0
          |                   THEN 1L ELSE 0L END))""".stripMargin))
    val keyed = e.select(col("vec_id"), col("v"), col("nrm"), explode(col("buckets")).as("bucket"))
    val qSide =
      if (probeAll) e.filter(col("vec_id") < 10)
        .select(col("vec_id"), col("v"), col("nrm"),
          explode(expr("sequence(0L, 255L)")).as("bucket"))
      else keyed.filter(col("vec_id") < 10)
    val q = qSide
      .select(col("vec_id").as("q_id"), col("v").as("va"), col("nrm").as("nrma"), col("bucket"))
    val c = keyed.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("n_id"), col("v").as("vb"), col("nrm").as("nrmb"), col("bucket"))
    val cand = c.join(q, Seq("bucket"))
      .select("q_id", "n_id", "va", "vb", "nrma", "nrmb")
      .dropDuplicates("q_id", "n_id")
    rankTop5(cand.withColumn("cosine", cosineCol))
  }

  /** IVF: k-means coarse quantizer trained with DataFrame aggregations;
    * only the k x dim centroid matrix is ever collected to the driver.
    * Queries probe the `nprobe` nearest centroids and rerank exactly
    * within those inverted lists. The knobs are real tuning parameters
    * (defaults match the driver-contract entry): more cells -> smaller
    * inverted lists but lower recall per probe; more probes -> recall
    * back up at linear cost; more Lloyd iterations -> tighter cells.
    *
    * Training is collect-once: [[kmeans]] pulls the bounded xxhash64
    * sample to the driver and iterates Lloyd locally (r12 — the
    * distributed per-iteration assign/mean/collect jobs were the stage
    * soup the event log blamed for the index keys' wall). Init is a
    * deterministic hash-sample (first k vectors in xxhash64 order), not
    * first-k-by-id, so seeds don't share insertion locality. */
  /** df + per-row rank-equivalent squared-L2 distances to every centroid:
    * |v|^2 - 2<v,c> + |c|^2 with the rank-invariant |v|^2 term dropped. */
  private def withCentroids(df: DataFrame, cs: Array[(Int, Array[Double])]): DataFrame =
    df.withColumn("cs", typedLit(cs.map { case (cid, v) => (cid, v.toSeq) }.toSeq))
      .withColumn("dists", expr(
        """transform(cs, c ->
          |  named_struct('d', dot_product(c._2, c._2) - 2.0d * dot_product(v, c._2),
          |               'cid', c._1))""".stripMargin))

  /** Nearest-centroid assignment (adds `cid`). Shared with
    * [[Dedup.semanticKMeans]]'s capped-cell bucketing. */
  private[operators] def assignedTo(df: DataFrame, cs: Array[(Int, Array[Double])]): DataFrame =
    withCentroids(df, cs)
      .withColumn("cid", expr("array_min(dists).cid"))
      .drop("cs", "dists")

  /** Lloyd-trained coarse centroids. Training runs on a bounded
    * deterministic hash-sample (first `max(64*k, 512)` vectors in xxhash64
    * order), NOT the corpus — the same regime [[pqCodebook]] uses, for the
    * same reason: `iters` Lloyd passes over the full frame would be
    * `iters` complete corpus scans at 100 TB, while coarse-quantizer
    * quality only needs a representative sample. The full corpus is
    * touched exactly once, by the caller's final [[assignedTo]] pass.
    * (At test SFs <= the sample size this trains on everything, so the
    * recall specs exercise identical arithmetic.) Hash-sampled init;
    * one bounded collect; only the k x dim centroids leave this call.
    * Shared with [[Dedup.semanticKMeans]]'s capped-cell bucketing. */
  private[operators] def kmeans(e: DataFrame, k: Int, iters: Int): Array[(Int, Array[Double])] = {
    // ONE bounded collect, local Lloyd (r12): the sample is
    // max(64k, 512) vectors BY DESIGN (the 100 TB argument above), so it
    // always fits on the driver — and the previous shape paid
    // iters x (assign + mean + collect) multi-stage DISTRIBUTED jobs
    // over that driver-sized frame. The event-logged cost of the ANN
    // index keys was exactly this stage soup (150+ sub-second stages,
    // no heavy stage), so training now collects the sample once and
    // iterates in plain Scala with the identical arithmetic: same
    // hash-sample order, same first-k init, same rank-equivalent
    // |c|^2 - 2<v,c> distance, same smaller-cid tie rule as the old
    // array_min(struct(d, cid)), same empty-cell-keeps-old rule.
    val train: Array[Array[Double]] = e
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy("h").limit(math.max(64 * k, 512))
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    val dim = if (train.isEmpty) 0 else train(0).length
    var centroids: Array[(Int, Array[Double])] =
      train.take(k).zipWithIndex.map { case (v, i) => (i, v) }
    for (_ <- 1 to iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Long](centroids.length)
      train.foreach { v =>
        var best = -1
        var bestD = Double.PositiveInfinity
        centroids.foreach { case (cid, c) =>
          var cc = 0.0
          var vc = 0.0
          var i = 0
          while (i < dim) { cc += c(i) * c(i); vc += v(i) * c(i); i += 1 }
          val d = cc - 2.0 * vc
          if (d < bestD) { bestD = d; best = cid } // strict <: ties keep the smaller cid
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      centroids = centroids.map { case (cid, old) =>
        if (counts(cid) > 0) (cid, sums(cid).map(_ / counts(cid))) else (cid, old)
      }
    }
    centroids
  }

  /** The nprobe nearest cells per query vector, as (q_id, cid) rows. */
  private def probeCells(queries: DataFrame, cs: Array[(Int, Array[Double])],
      nprobe: Int): DataFrame =
    withCentroids(queries, cs)
      .withColumn("cid", explode(
        expr(s"transform(slice(array_sort(dists), 1, $nprobe), s -> s.cid)")))
      .select(col("vec_id").as("q_id"), col("v").as("va"), col("nrm").as("nrma"), col("cid"))

  def ivfTopK(spark: SparkSession, dir: String, k: Int = 8, nprobe: Int = 2,
      iters: Int = 3): DataFrame = {
    val e = GraftSession.trackCache(vecs(spark, dir))
    val centroids = kmeans(e, k, iters)
    val asg = GraftSession.trackCache(assignedTo(e, centroids))
    val q = probeCells(asg.filter(col("vec_id") < 10), centroids, nprobe)
    val c = asg.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("n_id"), col("v").as("vb"), col("nrm").as("nrmb"), col("cid"))
    rankTop5(c.join(broadcast(q), Seq("cid")).withColumn("cosine", cosineCol))
  }

  /** IVF recall-vs-cost curve (`ann_recall_curve`, bench-only) — the
    * "which config do I ship" calibration artifact every retrieval
    * deployment reads before picking nprobe: ONE index build (the same
    * cells/iters as [[ivfTopK]]), then one row per nprobe = 1..cells,
    * each reporting the exact candidate count its probes score (the cost
    * axis — candidates IS the scan work at any corpus size) and
    * recall@5 against the brute-force exact top-5 (the accuracy axis).
    *
    * The whole sweep is ONE job, not 2·cells+1 (r17; previously a
    * per-nprobe count/score loop): probed cells are nested in nprobe
    * (the nprobe nearest centroids are a prefix of the nprobe+1
    * nearest), so a cell's per-query RANK along [[probeCells]]' exact
    * (d, cid) sort order is the nprobe at which it — and everything in
    * it — joins the candidate set. Two consequences the plan exploits:
    *  - candidates(np) = Σ over (query, cell) pairs with rank ≤ np of
    *    the cell's size — cell sizes × the queries×cells rank table,
    *    no corpus join at all;
    *  - hits(np) = exact-top5 pairs whose cell ranks ≤ np for that
    *    query: [[rankTop5]] orders by a TOTAL order (rounded cosine,
    *    n_id), so an exact-top5 member present in ANY candidate subset
    *    is in that subset's top-5 (fewer than 5 pairs beat it anywhere)
    *    — approx-top5 ∩ exact-top5 = exact-top5 ∩ candidates, and the
    *    per-point re-scoring drops out entirely.
    * Candidate sets are supersets along np, so both axes are
    * non-decreasing by construction, and at nprobe = cells the sweep
    * reproduces brute force exactly (recall 1.0 — the built-in
    * self-check); Round16Spec pins monotonicity and the endpoint.
    *
    * Scale shape: one brute-force exact-top5 pass over the cached
    * assignments (the recall DENOMINATOR — any recall curve pays it),
    * then cell-count-sized aggregates; queries and centroids are the
    * only driver-side state. No SQL oracle — like the other sketch-state
    * configs, the accuracy contract lives in the spec and the cost
    * numbers in the bench sidecar. */
  def ivfRecallCurve(spark: SparkSession, dir: String, cells: Int = 8,
      iters: Int = 3): DataFrame = {
    val e = GraftSession.trackCache(vecs(spark, dir))
    val centroids = kmeans(e, cells, iters)
    val asg = GraftSession.trackCache(assignedTo(e, centroids))
    val corpus = asg.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("n_id"), col("v").as("vb"),
        col("nrm").as("nrmb"), col("cid"))
    val queries = asg.filter(col("vec_id") < 10)
    val q = queries.select(col("vec_id").as("q_id"), col("v").as("va"),
      col("nrm").as("nrma"))
    // per-query cell rank r = the nprobe at which the cell joins the
    // probe set (queries × cells rows, broadcast-sized)
    val cellRank = withCentroids(queries, centroids)
      .select(col("vec_id").as("q_id"),
        posexplode(expr("array_sort(dists)")).as(Seq("p", "s")))
      .select(col("q_id"), (col("p") + 1).cast("long").as("cellrank"),
        col("s.cid").as("cid"))
    val exact = GraftSession.trackCache(
      rankTop5(corpus.drop("cid").crossJoin(broadcast(q))
        .withColumn("cosine", cosineCol)).select("q_id", "n_id"))
    val nExact = exact.count()
    // fails-loudly on a degenerate corpus (the bpeTrain convention): an
    // empty embeddings table or no vec_id < 10 queries would otherwise
    // make every recall point NaN
    require(nExact > 0,
      "ivfRecallCurve: empty exact baseline — the embeddings table has " +
        "no corpus rows or no query rows (vec_id < 10); the recall curve " +
        "is undefined on this input")
    // exact-top5 pairs annotated with their cell's per-query rank
    val hitRank = exact
      .join(corpus.select("n_id", "cid"), Seq("n_id"))
      .join(broadcast(cellRank), Seq("q_id", "cid"))
      .groupBy("cellrank").agg(count(lit(1)).as("h"))
    val sizes = corpus.groupBy("cid").agg(count(lit(1)).as("sz"))
    val candRank = cellRank.join(sizes, Seq("cid"), "left")
      .groupBy("cellrank")
      .agg(sum(coalesce(col("sz"), lit(0L))).as("c"))
    val perRank = candRank.join(hitRank, Seq("cellrank"), "left")
      .select(col("cellrank"), col("c"), coalesce(col("h"), lit(0L)).as("h"))
    spark.range(1, cells + 1).toDF("nprobe")
      .join(broadcast(perRank), col("cellrank") <= col("nprobe"))
      .groupBy("nprobe")
      .agg(sum("c").as("n_candidates"), sum("h").as("n_hits"))
      .withColumn("n_exact", lit(nExact))
      .withColumn("recall_at_5",
        round(col("n_hits") * 10000.0d / nExact) / 10000.0d)
      .orderBy("nprobe")
      .select("nprobe", "n_candidates", "n_hits", "n_exact", "recall_at_5")
  }

  /** Product quantization (PQ, the FAISS `IndexPQ` shape): vectors are cut
    * into `m` subvectors, each quantized to one of `k` learned codewords,
    * so a 64-dim float vector compresses to `m` small codes (16x here).
    * Queries score the WHOLE corpus, but against codes via an ADC
    * (asymmetric-distance) lookup table instead of raw floats — PQ is the
    * COMPRESSION leg of ANN (scan bandwidth / memory), where [[ivfTopK]]
    * is the PRUNING leg; production engines compose them (IVF-PQ).
    *
    * Everything is equi-joins and aggregations — the Spark-first shapes:
    *  - codebook training: one bounded xxhash64-sample collect per
    *    subspace, Lloyd iterated locally on the driver (r12); only the
    *    m x k x (dim/m) codebook leaves training.
    *  - encoding: same join, kept as the columnar (vec_id, m, code) table
    *    — at 100 TB this IS the compressed index layout (m bytes/vector).
    *  - ADC scan: the per-query lookup table (q_id, m, code, partial-dot)
    *    is q x m x k rows, broadcast onto the code table; one (m, code)
    *    equi-join + one (q_id, vec_id) sum reconstructs approximate dots
    *    with no per-pair float-vector math at all.
    *  - exact re-rank of the top `rerank` approximate candidates restores
    *    exactness at the top (the standard PQ refinement step).
    * Approximation quality is asserted in SimilaritySpec (recall vs the
    * brute-force baseline); no SQL oracle — codebooks are engine-specific
    * sketch state, same as LSH/IVF. */
  def pqTopK(spark: SparkSession, dir: String, m: Int = 8, k: Int = 16,
      iters: Int = 3, rerank: Int = 64): DataFrame = {
    val e = GraftSession.trackCache(vecs(spark, dir))
    val subs = GraftSession.trackCache(pqSubvectors(e, m))
    val codebook = pqCodebook(e, m, k, iters)
    val codes = GraftSession.trackCache(pqEncoded(subs, codebook))
    // ADC over the WHOLE code table (PQ alone = flat compressed scan)
    val approx = pqAdcScores(e, codes.filter(col("vec_id") >= 10),
      pqLut(subs, codebook))
    pqRerankExact(e, approx, rerank)
  }

  /** IVF-PQ (the FAISS `IndexIVFPQ` shape — how production vector search
    * actually ships): the coarse quantizer PRUNES (only the nprobe probed
    * cells' inverted lists are touched) and the PQ codes COMPRESS (the
    * pruned candidates are ADC-scored against m-byte codes, not raw
    * floats), composing [[ivfTopK]]'s and [[pqTopK]]'s complementary
    * scale levers in one operator. All the moving parts are the shared
    * helpers: k-means cells, sampled-trained codebooks, the columnar code
    * table, per-query LUTs — and the composition itself is two broadcast
    * equi-joins (candidates from the probe, partial dots from the LUT)
    * followed by the same exact re-rank. */
  def ivfPqTopK(spark: SparkSession, dir: String, cells: Int = 8, nprobe: Int = 2,
      m: Int = 8, k: Int = 16, iters: Int = 2, rerank: Int = 32): DataFrame = {
    val e = GraftSession.trackCache(vecs(spark, dir))
    val coarse = kmeans(e, cells, iters)
    val asg = GraftSession.trackCache(
      assignedTo(e, coarse).select(col("vec_id"), col("cid")))
    val subs = GraftSession.trackCache(pqSubvectors(e, m))
    val codebook = pqCodebook(e, m, k, iters)
    val codes = GraftSession.trackCache(pqEncoded(subs, codebook))
    // IVF pruning: (q_id, vec_id) candidates from the probed cells only
    val probe = probeCells(e.filter(col("vec_id") < 10), coarse, nprobe)
      .select("q_id", "cid")
    val cand = asg.filter(col("vec_id") >= 10)
      .join(broadcast(probe), Seq("cid"))
      .select("q_id", "vec_id")
    // ADC restricted to the candidates: join their codes, look up the
    // (q_id, m, code) partial dots, sum per pair
    val approx = pqAdcScores(e,
      cand.join(codes, Seq("vec_id")),
      pqLut(subs, codebook), perQuery = true)
    pqRerankExact(e, approx, rerank)
  }

  /** IVF-PQ recall-vs-rerank curve (`ann_ivfpq_rerank_curve`,
    * bench-only) — the second knob of the shipped [[ivfPqTopK]]
    * composition: [[ivfRecallCurve]] sweeps the PRUNING axis (nprobe);
    * this sweeps the REFINEMENT axis (exact-re-rank depth) at fixed
    * nprobe, off ONE index build. Each row reports how many candidates
    * the exact re-rank touches (the refinement cost — rerank float
    * scorings per query, capped by the probe's candidate count) and
    * recall@5 against the brute-force exact top-5. The last row is the
    * unlimited depth (`rerank` = Long.MaxValue, "re-rank every probed
    * candidate"): by construction it equals IVF with exact scoring at
    * the same nprobe — the matching point on the nprobe-only curve —
    * and Round17Spec pins that equality plus monotonicity.
    *
    * One job, not one per depth (the r17 [[ivfRecallCurve]] algebra):
    * [[pqRerankExact]] admits a candidate iff its ADC rank along the
    * TOTAL order (ascore desc, n_id) is ≤ rerank, and [[rankTop5]]'s
    * exact re-scoring is also a total order — so an exact-top5 member
    * is in the depth-R output iff its ADC rank is ≤ R, and
    * hits(R) = exact-top5 pairs with arank ≤ R: the whole curve reads
    * off one ranked candidate table. n_reranked(R) = Σ_q min(R, the
    * query's candidate count) — a queries-sized aggregate.
    *
    * Scale shape: the corpus is touched by the IVF-PQ build (assign +
    * encode, both one pass) and the exact-top5 denominator; everything
    * after is candidate-sized. No SQL oracle — codebooks are
    * engine-specific sketch state (the [[pqTopK]] convention); the
    * accuracy contract lives in the spec, the cost in the sidecar. */
  def ivfpqRerankCurve(spark: SparkSession, dir: String, cells: Int = 8,
      nprobe: Int = 2, m: Int = 8, k: Int = 16, iters: Int = 2,
      depths: Seq[Long] = Seq(8L, 16L, 32L, 64L, Long.MaxValue)): DataFrame = {
    import spark.implicits._
    val e = GraftSession.trackCache(vecs(spark, dir))
    val coarse = kmeans(e, cells, iters)
    val asg = GraftSession.trackCache(
      assignedTo(e, coarse).select(col("vec_id"), col("cid")))
    val subs = GraftSession.trackCache(pqSubvectors(e, m))
    val codebook = pqCodebook(e, m, k, iters)
    val codes = GraftSession.trackCache(pqEncoded(subs, codebook))
    val probe = probeCells(e.filter(col("vec_id") < 10), coarse, nprobe)
      .select("q_id", "cid")
    val cand = asg.filter(col("vec_id") >= 10)
      .join(broadcast(probe), Seq("cid"))
      .select("q_id", "vec_id")
    val approx = GraftSession.trackCache(
      pqAdcScores(e, cand.join(codes, Seq("vec_id")),
        pqLut(subs, codebook), perQuery = true)
        .select("q_id", "n_id", "ascore"))
    // each candidate's ADC rank = the smallest depth whose exact re-rank
    // sees it (the pqRerankExact admission order, verbatim)
    val aranked = approx.withColumn("arank", row_number().over(
      Window.partitionBy("q_id").orderBy(col("ascore").desc, col("n_id"))))
      .select("q_id", "n_id", "arank")
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("va"), col("nrm").as("nrma"))
    val corpus = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("n_id"), col("v").as("vb"), col("nrm").as("nrmb"))
    val exact = GraftSession.trackCache(
      rankTop5(corpus.crossJoin(broadcast(q)).withColumn("cosine", cosineCol))
        .select("q_id", "n_id"))
    val nExact = exact.count()
    require(nExact > 0,
      "ivfpqRerankCurve: empty exact baseline — the embeddings table has " +
        "no corpus rows or no query rows (vec_id < 10); the recall curve " +
        "is undefined on this input")
    // exact-top5 members that are candidates, with their ADC ranks
    // (inner join: a never-probed true neighbor can never be re-ranked)
    val hitRanks = exact.join(aranked, Seq("q_id", "n_id")).select("arank")
    val perQ = approx.groupBy("q_id").agg(count(lit(1)).as("ncand"))
    val depthDf = depths.toDF("rerank")
    val nRer = depthDf.crossJoin(broadcast(perQ))
      .groupBy("rerank")
      .agg(sum(least(col("rerank"), col("ncand"))).as("n_reranked"))
    val hits = depthDf
      .join(broadcast(hitRanks), col("arank") <= col("rerank"), "left")
      .groupBy("rerank").agg(count(col("arank")).as("n_hits"))
    nRer.join(hits, Seq("rerank"))
      .withColumn("n_exact", lit(nExact))
      .withColumn("recall_at_5",
        round(col("n_hits") * 10000.0d / nExact) / 10000.0d)
      .orderBy("rerank")
      .select("rerank", "n_reranked", "n_hits", "n_exact", "recall_at_5")
  }

  /** IVF-PQ recall-vs-code-size curve (`ann_ivfpq_m_curve`, bench-only) —
    * the THIRD knob of the shipped [[ivfPqTopK]] composition, closing the
    * retrieval family's cost model: [[ivfRecallCurve]] sweeps PRUNING
    * (nprobe), [[ivfpqRerankCurve]] sweeps REFINEMENT (exact-re-rank
    * depth), and this sweeps COMPRESSION (m — PQ code bytes per vector)
    * at fixed nprobe and rerank. Each row reports the index footprint
    * (m code bytes/vector — the 100 TB axis: at fixed corpus size the
    * scan bandwidth and index memory scale linearly with m) and recall@5
    * against the brute-force exact top-5.
    *
    * One job across all m, the [[ivfRecallCurve]]/[[ivfpqRerankCurve]]
    * algebra extended by a union axis: the coarse quantizer, the probed
    * candidate set, and the exact-top5 baseline are all m-INDEPENDENT
    * (IVF pruning never looks at codes), so they are built once and
    * shared; only the per-m codebook/encode/ADC legs differ, and those
    * union into ONE frame tagged by m before a single (m, q_id) ADC-rank
    * window. A candidate enters the depth-`rerank` exact re-rank iff its
    * ADC rank along the TOTAL order (ascore desc, n_id) is ≤ rerank, and
    * the re-rank restores the exact order among admissions — so an
    * exact-top5 member survives to the output iff its ADC rank is ≤
    * rerank (the [[ivfpqRerankCurve]] argument, verbatim, per m).
    * n_reranked = Σ_q min(rerank, ncand) is m-independent (same
    * candidates) and carried once for the cost column.
    *
    * By construction the m = 8 row equals [[ivfpqRerankCurve]]'s
    * rerank = 32 row at the shared defaults (same candidates, same
    * codebook arithmetic, same admission order) — Round18Spec pins that
    * equality plus recall monotone non-decreasing in m. No SQL oracle —
    * codebooks are engine-specific sketch state (the [[pqTopK]]
    * convention); accuracy lives in the spec, cost in the sidecar. */
  def ivfpqMCurve(spark: SparkSession, dir: String, cells: Int = 8,
      nprobe: Int = 2, rerank: Int = 32, k: Int = 16, iters: Int = 2,
      ms: Seq[Int] = Seq(4, 8, 16)): DataFrame = {
    val e = GraftSession.trackCache(vecs(spark, dir))
    val coarse = kmeans(e, cells, iters)
    val asg = GraftSession.trackCache(
      assignedTo(e, coarse).select(col("vec_id"), col("cid")))
    val probe = probeCells(e.filter(col("vec_id") < 10), coarse, nprobe)
      .select("q_id", "cid")
    val cand = GraftSession.trackCache(asg.filter(col("vec_id") >= 10)
      .join(broadcast(probe), Seq("cid"))
      .select("q_id", "vec_id"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("va"), col("nrm").as("nrma"))
    val corpus = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("n_id"), col("v").as("vb"), col("nrm").as("nrmb"))
    val exact = GraftSession.trackCache(
      rankTop5(corpus.crossJoin(broadcast(q)).withColumn("cosine", cosineCol))
        .select("q_id", "n_id"))
    val nExact = exact.count()
    require(nExact > 0,
      "ivfpqMCurve: empty exact baseline — the embeddings table has no " +
        "corpus rows or no query rows (vec_id < 10); the recall curve is " +
        "undefined on this input")
    // per-m ADC legs over the SHARED candidate set, unioned under an m tag
    val scored = ms.map { mi =>
      // cached like ivfPqTopK/ivfpqRerankCurve's subs: the per-m
      // subvector explode has two consumers (the corpus-wide encode and
      // the query-side LUT) — uncached each leg would pay the full
      // corpus explode twice
      val subs = GraftSession.trackCache(pqSubvectors(e, mi))
      val cb = pqCodebook(e, mi, k, iters)
      pqAdcScores(e, cand.join(pqEncoded(subs, cb), Seq("vec_id")),
        pqLut(subs, cb), perQuery = true)
        .select(lit(mi).as("m"), col("q_id"), col("n_id"), col("ascore"))
    }.reduce(_.unionAll(_))
    val aranked = scored.withColumn("arank", row_number().over(
      Window.partitionBy("m", "q_id").orderBy(col("ascore").desc, col("n_id"))))
    val hits = aranked.filter(col("arank") <= rerank)
      .join(exact, Seq("q_id", "n_id"))
      .groupBy("m").agg(count(lit(1)).as("n_hits"))
    // anchor every swept m (a zero-hit leg must still report its row)
    val msDf = {
      import spark.implicits._
      ms.toDF("m")
    }
    // rerank cost is m-independent (identical candidate sets): one scalar
    val nReranked = cand.groupBy("q_id").agg(count(lit(1)).as("ncand"))
      .agg(sum(least(lit(rerank.toLong), col("ncand"))).as("n_reranked"))
    msDf.join(broadcast(hits), Seq("m"), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .crossJoin(broadcast(nReranked))
      .withColumn("code_bytes_per_vec", col("m").cast("long"))
      .withColumn("n_exact", lit(nExact))
      .withColumn("recall_at_5",
        round(col("n_hits") * 10000.0d / nExact) / 10000.0d)
      .orderBy("m")
      .select("m", "code_bytes_per_vec", "n_reranked", "n_hits", "n_exact",
        "recall_at_5")
  }

  /** IVF-PQ recall-vs-granularity curve (`ann_ivfpq_cells_curve`,
    * bench-only) — the FOURTH and last knob of the shipped [[ivfPqTopK]]
    * composition: [[ivfRecallCurve]] sweeps PRUNING (nprobe),
    * [[ivfpqRerankCurve]] REFINEMENT (rerank depth), [[ivfpqMCurve]]
    * COMPRESSION (m), and this sweeps the coarse quantizer's
    * GRANULARITY (cells) at all three held fixed. At fixed nprobe the
    * probed corpus fraction is ~nprobe/cells, so cells is the scan-
    * bandwidth knob: more cells = fewer candidates scanned per query
    * (`n_cand`, the cost column) against recall lost to true neighbors
    * landing in unprobed cells. The r18 deferral note said "the builds
    * don't share" — true only of the coarse quantizer itself: the PQ
    * codebook, the corpus encode, the per-query LUTs and the exact-top5
    * baseline are all cells-INDEPENDENT and built once, and ADC scores
    * are cells-independent too (the legs only decide candidate
    * MEMBERSHIP), so scoring runs once over the DISTINCT union of all
    * legs' candidates and joins back to the cells-tagged membership.
    * What repeats per cells value is one sample-bounded k-means and one
    * map-side assignment pass over the cached corpus — the irreducible
    * per-leg cost, linear each.
    *
    * Admission algebra per leg is [[ivfpqRerankCurve]]'s verbatim: an
    * exact-top5 member survives the depth-`rerank` exact re-rank iff
    * its ADC rank along the (cells, q_id) total order is ≤ rerank. By
    * construction the cells = 8 row equals [[ivfpqMCurve]]'s m = 8 row
    * AND [[ivfpqRerankCurve]]'s rerank = 32 row — the three sweeps'
    * shared-defaults crossing point (Round19Spec pins the triple
    * equality plus a literal [[ivfPqTopK]] run). No SQL oracle —
    * codebooks are engine-specific sketch state (the [[pqTopK]]
    * convention); accuracy lives in the spec, cost in the sidecar. */
  def ivfpqCellsCurve(spark: SparkSession, dir: String,
      cellsSeq: Seq[Int] = Seq(4, 8, 16), nprobe: Int = 2, rerank: Int = 32,
      m: Int = 8, k: Int = 16, iters: Int = 2): DataFrame = {
    import spark.implicits._
    val e = GraftSession.trackCache(vecs(spark, dir))
    val subs = GraftSession.trackCache(pqSubvectors(e, m))
    val codebook = pqCodebook(e, m, k, iters)
    val codes = GraftSession.trackCache(pqEncoded(subs, codebook))
    val queries = e.filter(col("vec_id") < 10)
    // per-cells candidate legs, union'd under a cells tag; cached — the
    // frame feeds the shared scoring, the rank join AND the cost rollup
    val candAll = GraftSession.trackCache(cellsSeq.map { c =>
      val coarse = kmeans(e, c, iters)
      val probe = probeCells(queries, coarse, nprobe).select("q_id", "cid")
      assignedTo(e.filter(col("vec_id") >= 10), coarse)
        .select(col("vec_id"), col("cid"))
        .join(broadcast(probe), Seq("cid"))
        .select(lit(c).as("cells"), col("q_id"), col("vec_id"))
    }.reduce(_.unionAll(_)))
    // ONE shared ADC pass over the distinct candidate union
    val scored = GraftSession.trackCache(
      pqAdcScores(e, candAll.select("q_id", "vec_id").distinct()
          .join(codes, Seq("vec_id")),
        pqLut(subs, codebook), perQuery = true)
        .select("q_id", "n_id", "ascore"))
    val aranked = candAll
      .select(col("cells"), col("q_id"), col("vec_id").as("n_id"))
      .join(scored, Seq("q_id", "n_id"))
      .withColumn("arank", row_number().over(
        Window.partitionBy("cells", "q_id").orderBy(col("ascore").desc, col("n_id"))))
    val q = queries
      .select(col("vec_id").as("q_id"), col("v").as("va"), col("nrm").as("nrma"))
    val corpus = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("n_id"), col("v").as("vb"), col("nrm").as("nrmb"))
    val exact = GraftSession.trackCache(
      rankTop5(corpus.crossJoin(broadcast(q)).withColumn("cosine", cosineCol))
        .select("q_id", "n_id"))
    val nExact = exact.count()
    require(nExact > 0,
      "ivfpqCellsCurve: empty exact baseline — the embeddings table has " +
        "no corpus rows or no query rows (vec_id < 10); the recall curve " +
        "is undefined on this input")
    val hits = aranked.filter(col("arank") <= rerank)
      .join(exact, Seq("q_id", "n_id"))
      .groupBy("cells").agg(count(lit(1)).as("n_hits"))
    val costs = candAll.groupBy("cells", "q_id").agg(count(lit(1)).as("ncand"))
      .groupBy("cells").agg(sum("ncand").as("n_cand"),
        sum(least(lit(rerank.toLong), col("ncand"))).as("n_reranked"))
    // anchor every swept cells value (a zero-hit leg still reports)
    cellsSeq.toDF("cells")
      .join(broadcast(costs), Seq("cells"), "left")
      .join(broadcast(hits), Seq("cells"), "left")
      .withColumn("n_cand", coalesce(col("n_cand"), lit(0L)))
      .withColumn("n_reranked", coalesce(col("n_reranked"), lit(0L)))
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("n_exact", lit(nExact))
      .withColumn("recall_at_5",
        round(col("n_hits") * 10000.0d / nExact) / 10000.0d)
      .orderBy("cells")
      .select("cells", "n_cand", "n_reranked", "n_hits", "n_exact",
        "recall_at_5")
  }

  /** Columnar subvector layout (vec_id, m, sv); 1-based slice, dim 64. */
  private def pqSubvectors(e: DataFrame, m: Int): DataFrame = {
    val sub = 64 / m
    e.select(col("vec_id"), explode(expr(
      s"""transform(sequence(0, ${m - 1}),
         |          mi -> named_struct('m', mi, 'sv', slice(v, mi * $sub + 1, $sub)))""".stripMargin))
      .as("s"))
      .select(col("vec_id"), col("s.m").as("m"), col("s.sv").as("sv"))
  }

  private def pqCbDf(spark: SparkSession, cb: Seq[(Int, Int, Seq[Double])]): DataFrame =
    spark.createDataFrame(cb).toDF("m", "code", "c")

  /** (vec_id, m, code): nearest codeword per subvector — a MAP-SIDE
    * argmin over the codebook literal (r12; previously a broadcast join
    * that exploded every subvector into k rows and aggregated them back:
    * a corpus-row-count × k row stream plus a (vec_id, m) shuffle, for
    * an argmin each row can compute locally). `transform` scores every
    * codeword (|sv|^2 dropped: rank-invariant per row), `array_position
    * (ds, array_min(ds))` takes the FIRST minimum — the same smaller-
    * code tie rule as the old min(struct(d, code)). No shuffle at all:
    * at 100 TB the encode is one pass over the corpus, exactly what a
    * PQ index build should be. */
  private def pqEncoded(frame: DataFrame, cb: Seq[(Int, Int, Seq[Double])]): DataFrame = {
    val m = cb.map(_._1).max + 1
    val byM: Seq[Seq[Seq[Double]]] =
      (0 until m).map(mi => cb.filter(_._1 == mi).sortBy(_._2).map(_._3))
    frame
      .withColumn("__cb", typedLit(byM))
      .withColumn("__ds", expr(
        "transform(element_at(__cb, m + 1), c -> dot_product(c, c) - 2.0d * dot_product(sv, c))"))
      .select(col("vec_id"), col("m"),
        (expr("array_position(__ds, array_min(__ds))") - 1).cast("int").as("code"))
  }

  /** Per-subspace codebooks. Lloyd trains on a bounded deterministic
    * hash-sample, NOT the corpus: codebook quality needs a representative
    * sample (the standard PQ training regime), so the iterations cost
    * O(sample) regardless of corpus size — without this, k iterations
    * would be k full corpus scans at 100 TB. The full corpus is touched
    * exactly once, by the final encode. (At test SFs <= the sample size
    * this trains on everything, so the recall specs exercise the same
    * arithmetic.) */
  private def pqCodebook(e: DataFrame, m: Int, k: Int,
      iters: Int): Seq[(Int, Int, Seq[Double])] = {
    // ONE bounded collect, local Lloyd per subspace (r12) — the
    // [[kmeans]] rationale verbatim: the train sample is max(32k, 256)
    // vectors by design, and the old per-iteration encode-join-agg-
    // collect chain was pure stage-count overhead on a driver-sized
    // frame. Arithmetic is unchanged: same hash-sample order, init from
    // the first k sampled vectors' slices, argmin by |c|^2 - 2<sv,c>
    // with the smaller-code tie rule (the old min(struct(d, code))),
    // empty cells keep their codeword.
    val sub = 64 / m
    val train: Array[Array[Double]] = e
      .withColumn("h", xxhash64(col("vec_id"))).orderBy("h")
      .limit(math.max(32 * k, 256))
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    // codebook(mi)(ci) = codeword; init = slices of the first k samples
    val codebook: Array[Array[Array[Double]]] = Array.tabulate(m) { mi =>
      train.take(k).map(v => v.slice(mi * sub, (mi + 1) * sub))
    }
    for (_ <- 1 to iters; mi <- 0 until m) {
      val cb = codebook(mi)
      val sums = Array.fill(cb.length)(new Array[Double](sub))
      val counts = new Array[Long](cb.length)
      train.foreach { v =>
        val off = mi * sub
        var best = -1
        var bestD = Double.PositiveInfinity
        var ci = 0
        while (ci < cb.length) {
          val c = cb(ci)
          var cc = 0.0
          var vc = 0.0
          var i = 0
          while (i < sub) { cc += c(i) * c(i); vc += v(off + i) * c(i); i += 1 }
          val d = cc - 2.0 * vc
          if (d < bestD) { bestD = d; best = ci } // strict <: ties keep the smaller code
          ci += 1
        }
        counts(best) += 1
        var i = 0
        while (i < sub) { sums(best)(i) += v(off + i); i += 1 }
      }
      var ci = 0
      while (ci < cb.length) {
        if (counts(ci) > 0) codebook(mi)(ci) = sums(ci).map(_ / counts(ci))
        ci += 1
      }
    }
    (for (mi <- 0 until m; ci <- codebook(mi).indices)
      yield (mi, ci, codebook(mi)(ci).toSeq)).toSeq
  }

  /** ADC lookup table: partial dot of each query subvector with each
    * codeword — q x m x k small rows, always broadcast. */
  private def pqLut(subs: DataFrame, cb: Seq[(Int, Int, Seq[Double])]): DataFrame =
    subs.filter(col("vec_id") < 10)
      .join(broadcast(pqCbDf(subs.sparkSession, cb)), Seq("m"))
      .select(col("vec_id").as("q_id"), col("m"), col("code"),
        expr("dot_product(sv, c)").as("pdot"))

  /** Reconstructs approximate cosines from a code frame + broadcast LUT:
    * one equi-join, one (q_id, n_id) sum, a norm join — no per-pair
    * float-vector math. `perQuery` joins on (q_id, m, code) when the code
    * frame is already restricted to per-query candidates (IVF-PQ). */
  private def pqAdcScores(e: DataFrame, codeFrame: DataFrame, lut: DataFrame,
      perQuery: Boolean = false): DataFrame = {
    val joined =
      if (perQuery) codeFrame.join(broadcast(lut), Seq("q_id", "m", "code"))
      else codeFrame.join(broadcast(lut), Seq("m", "code"))
    joined
      .groupBy(col("q_id"), col("vec_id").as("n_id"))
      .agg(sum("pdot").as("adot"))
      .join(e.select(col("vec_id").as("n_id"), col("nrm").as("nrmb")), Seq("n_id"))
      .withColumn("ascore", col("adot") / col("nrmb"))
  }

  /** Top `rerank` approximate candidates per query (TopKPerKey-eligible
    * filter-on-window), then exact cosine restores the true order. */
  private def pqRerankExact(e: DataFrame, approx: DataFrame, rerank: Int): DataFrame = {
    val cand = approx
      .withColumn("r", row_number().over(
        Window.partitionBy("q_id").orderBy(col("ascore").desc, col("n_id"))))
      .filter(col("r") <= rerank)
      .select("q_id", "n_id")
    val exact = cand
      .join(e.select(col("vec_id").as("n_id"), col("v").as("vb"), col("nrm").as("nrmb")), Seq("n_id"))
      .join(broadcast(e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("va"), col("nrm").as("nrma"))), Seq("q_id"))
    rankTop5(exact.withColumn("cosine", cosineCol))
  }

  /** Driver-side symmetric eigensolver: cyclic Jacobi rotations (the
    * textbook algorithm, e.g. Golub & Van Loan §8.5) — adequate because
    * the input is the d×d covariance of [[embCovariance]]'s moments
    * (d = embedding dim, tiny), never data-sized. Deterministic: fixed
    * sweep order, fixed convergence threshold, and a sign convention
    * (largest-|component| positive) so downstream projections are stable.
    * Returns (eigenvalues descending, eigenvectors as rows, matching
    * order). */
  private[operators] def jacobiEigen(
      a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    // RELATIVE convergence: covariances of 1e-4-quantized inputs carry
    // O(1e6+) entries, so an absolute epsilon would never trip and every
    // call would burn all 64 O(d^3) sweeps after converging in ~10
    val frob2 = a0.map(_.map(x => x * x).sum).sum
    val eps = 1e-24 * math.max(frob2, Double.MinPositiveValue)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 64 && off > eps) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          off += apq * apq
          if (math.abs(apq) > 1e-18) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    // columns of v are eigenvectors; emit as rows, eigenvalues descending,
    // sign fixed by the largest-magnitude component
    val order = (0 until d).sortBy(i => -a(i)(i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { i =>
      val col = Array.tabulate(d)(k => v(k)(i))
      val m = col.indices.maxBy(k => math.abs(col(k)))
      if (col(m) < 0) col.map(-_) else col
    }.toArray
    (vals, vecs)
  }

  /** PCA projection of the embedding corpus — mean-centered top-`k`
    * principal components per vector, the dimensionality-reduction /
    * whitening step that precedes OPQ rotation, visualization, or a
    * cheaper ANN index.
    *
    * Scale shape (textbook distributed PCA): the corpus is touched by
    * exactly TWO map-side passes — the [[graft.functions.VectorMomentsAgg]]
    * moments pass (d(d+3)/2 longs to the driver) and the projection pass
    * with the d×k rotation broadcast; the eigensolve happens driver-side
    * on the d×d matrix, which is dimension-sized, not data-sized. Nothing
    * shuffles by key at any scale.
    *
    * Determinism (rows-only key, but reproducibility still matters): the
    * covariance comes from EXACT quantized BIGINT moments, the Jacobi
    * solver is deterministic with a fixed sign convention, and each
    * projected component is a sequential fold in dimension order, so two
    * runs (or two engines following this spec) agree bit-for-bit. */
  def pcaProject(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    GraftSession.registerFunctions(spark)
    val vmoments = udaf(graft.functions.VectorMomentsAgg)
    val m = Tables(spark, dir).embeddings
      .select(expr(
        "transform(embedding, x -> cast(floor(cast(x as double) * 10000 + 0.5) as bigint))")
        .as("qv"))
      .agg(vmoments(col("qv")).as("m"))
      .select(col("m.n"), col("m.s"), col("m.ss"))
      .head()
    val n = m.getLong(0).toDouble
    val s = m.getSeq[Long](1).toArray
    val ss = m.getSeq[Long](2).toArray
    val d = s.length
    // covariance in (1e-4 quantized)^2 units — exact ints in, one double
    // chain per cell; uniform scaling does not change the eigenvectors
    val cov = Array.tabulate(d, d)((i, j) =>
      (ss(i * d + j).toDouble - s(i).toDouble * s(j).toDouble / n) / n)
    val (_, vecs) = jacobiEigen(cov)
    val mean = s.map(_ / n) // quantized units
    // the d×k rotation and the mean ride the plan as SMALL literals
    // (k·d + d doubles); the projection itself is builtin HOFs — the
    // sequential `aggregate` fold keeps the component sums deterministic,
    // and no UDF enters the hot path
    val vkLit = typedLit(vecs.take(k).map(_.toSeq).toSeq)
    val muLit = typedLit(mean.toSeq)
    Tables(spark, dir).embeddings
      .select(col("vec_id"), expr(
        "transform(embedding, x -> cast(floor(cast(x as double) * 10000 + 0.5) as bigint))")
        .as("qv"))
      .select(col("vec_id"),
        zip_with(col("qv"), muLit, (q, mu) => q.cast("double") - mu).as("ctr"))
      .select(col("vec_id"),
        transform(vkLit, r =>
          // component in quantized units; HALF-UP to 4 decimals of the
          // ORIGINAL embedding units (the 1e4 scale divides back out)
          floor(aggregate(zip_with(r, col("ctr"), (a, b) => a * b),
            lit(0.0), (acc, x) => acc + x) + lit(0.5)) / lit(10000.0))
          .as("pc"))
      // scalar output contract: one row per (vector, component) — every
      // column sortable/hashable, so generic row-comparison harnesses
      // (and plain SQL consumers) can check the result without
      // array-typed columns.
      // posexplode_OUTER, deliberately (r20, measured): with the inner
      // posexplode the optimizer infers `size(pc) > 0` from the Generate
      // and predicate-pushes it below the scatter Exchange — re-inlining
      // the ENTIRE k×(zip_with+aggregate) projection tree into a Filter
      // evaluated in the single-row-group scan stage (the round-3
      // pushdown trap: the projection ran twice, once single-threaded —
      // measured 18.8 s of emb_pca's 22 s sf10 wall in that one scan
      // task). `pc` is a transform over the k-element ROTATION LITERAL,
      // so it is never null and never empty: outer and inner explode
      // emit identical rows, and outer infers no filter.
      .select(col("vec_id"), posexplode_outer(col("pc")))
      .select(col("vec_id"), col("pos").cast("int").as("component"),
        col("col").as("value"))
  }

  /** EXACT covariance moments of the embedding corpus — the PCA /
    * whitening / OPQ-rotation preprocessing statistic of an embedding
    * pipeline, as a checked key: one row per (i ≤ j) dimension pair with
    * the integer moment sums and the covariance they determine.
    *
    * Cross-engine float contract (SURVEY §5): components are quantized
    * ONCE to 1e-4 units (`floor(x*1e4 + 0.5)` on the exactly-widened
    * float), so `n`, `Σq_i`, `Σq_iq_j` are EXACT BIGINTs; the covariance
    * is one identical double chain over those integers (the q_corr
    * pattern), HALF-UP-floored to 4 decimals in q² units.
    *
    * Scale shape: ONE pass, no shuffle of vectors —
    * [[graft.functions.VectorMomentsAgg]] holds a single packed-triangle
    * `long[d(d+1)/2]` accumulator per partition and merges those (the
    * posexplode alternative inflates every row d²/2× before the partial
    * aggregate can shrink anything). The single aggregated row — d(d+3)/2
    * longs — is what reaches the driver; the (i, j) fan-out afterwards
    * explodes ONE row to d² entries. */
  def embCovariance(spark: SparkSession, dir: String): DataFrame = {
    GraftSession.registerFunctions(spark)
    val vmoments = udaf(graft.functions.VectorMomentsAgg)
    val q = Tables(spark, dir).embeddings
      .select(expr(
        "transform(embedding, x -> cast(floor(cast(x as double) * 10000 + 0.5) as bigint))")
        .as("qv"))
    q.agg(vmoments(col("qv")).as("m"))
      .select(col("m.n").as("n"), col("m.s").as("s"),
        posexplode(col("m.ss")).as(Seq("p", "s_ij")))
      .select(col("n"), col("s"), col("s_ij"),
        (expr("p div size(s)") + 1).cast("long").as("i"),
        (expr("p % size(s)") + 1).cast("long").as("j"))
      .filter(col("i") <= col("j"))
      .select(col("i"), col("j"), col("n"),
        expr("element_at(s, cast(i as int))").as("s_i"),
        expr("element_at(s, cast(j as int))").as("s_j"),
        col("s_ij"),
        expr("""floor(((cast(s_ij as double)
                - cast(element_at(s, cast(i as int)) as double)
                  * cast(element_at(s, cast(j as int)) as double)
                  / cast(n as double))
                / cast(n as double)) * 1e4 + 0.5) / 1e4""").as("cov"))
  }

  /** Matryoshka (MRL) truncation QA (`emb_matryoshka`) — the decision
    * statistic for serving embeddings at reduced width: for prefix widths
    * 16/32/48 of the 64-dim vector, the retained norm fraction
    * `sqrt(Σ_{i<w} v_i²) / sqrt(Σ v_i²)`, which IS the cosine between the
    * full vector and its truncated-renormalized prefix — what an MRL
    * pipeline thresholds on before switching an index to the narrow
    * width. One map-side pass of builtin HOFs, no shuffle at any scale.
    *
    * Exactness (SURVEY §5): float→double widening is exact, each sum is
    * one sequential fold in dimension order (`aggregate`, matching the
    * oracle's `list_sum`), sqrt/division are single IEEE ops, and the
    * ratio is HALF-UP-floor-quantized once to 1e-4 — bit-identical
    * cross-engine. */
  def matryoshkaRetention(spark: SparkSession, dir: String): DataFrame = {
    def retained(w: Int) = expr(
      s"""floor(sqrt(aggregate(slice(v, 1, $w), 0.0d, (a, x) -> a + x * x))
         |  / sqrt(aggregate(v, 0.0d, (a, x) -> a + x * x)) * 1e4 + 0.5) / 1e4""".stripMargin)
    Tables(spark, dir).embeddings
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      .select(col("vec_id"),
        retained(16).as("retain_16"),
        retained(32).as("retain_32"),
        retained(48).as("retain_48"))
  }

  /** Symmetric int8 vector quantization (`emb_int8_quantize`) — the
    * embedding STORAGE compression every large vector store runs before
    * (or instead of) PQ: per vector, scale = max|x|/127, code_i =
    * round(x_i/scale) ∈ [−127, 127], 4× smaller than float32 with a
    * per-vector error bound of scale/2 per dimension. The per-vector
    * stats here are the quantization QA gate (scale, total code mass,
    * summed squared reconstruction error) a pipeline thresholds on
    * before swapping the compressed table in for [[topK]]'s exact tier.
    *
    * Everything is one map-side pass of builtin HOFs (no codes array is
    * even materialized — each stat folds x and scale directly). Exactness
    * (SURVEY §5): float→double widening is exact, the code is the HALF-UP
    * floor of one identical division, the squared error `e·e` is plain
    * IEEE multiplication (no pow), and each per-dimension error is
    * quantized ONCE to 1e-12 units then summed as exact BIGINTs. A
    * zero vector (scale 0) takes the declared all-zero-codes path. */
  def int8Quantize(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).embeddings
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("emb"))
      .withColumn("scale", expr("array_max(transform(emb, x -> abs(x))) / 127.0"))
      .select(col("vec_id"),
        size(col("emb")).cast("long").as("n_dims"),
        expr("cast(floor(scale * 1e9 + 0.5) as bigint)").as("scale_q9"),
        expr("""CASE WHEN scale > 0 THEN
                  aggregate(emb, 0L, (a, x) -> a + abs(cast(floor(x / scale + 0.5) as bigint)))
                ELSE 0L END""").as("sum_abs_code"),
        expr("""CASE WHEN scale > 0 THEN
                  aggregate(emb, 0L, (a, x) ->
                    a + cast(floor((x - floor(x / scale + 0.5) * scale)
                                 * (x - floor(x / scale + 0.5) * scale) * 1e12 + 0.5) as bigint))
                ELSE 0L END""").as("sse_q12"))
}
