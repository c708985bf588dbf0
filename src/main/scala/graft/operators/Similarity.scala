package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Deterministic random hyperplanes (fixed seed, JVM-stable LCG),
    * flattened as `tables x planesPerTable` rows of dim doubles. */
  private def planes(nTables: Int, planesPerTable: Int, dim: Int): Seq[Seq[Seq[Double]]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(nTables, planesPerTable)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Random-hyperplane LSH with OR-amplification: 4 independent hash
    * tables of 6 planes each. A corpus vector meets a query iff they share
    * a bucket in ANY table (explode table-keyed buckets, equi-join,
    * de-dup), then exact cosine rerank inside the candidate set. At
    * billion-vector scale the equi-join on (table, bucket) replaces the
    * cross join; recall is tuned via tables x planes. */
  def lshTopK(spark: SparkSession, dir: String): DataFrame = {
    val pl = typedLit(planes(4, 6, 64))
    val e = vecs(spark, dir)
      .withColumn("pl", pl)
      .withColumn("buckets", expr(
        """transform(sequence(0, 3), t ->
          |  aggregate(sequence(0, 5), cast(t * 64 as bigint), (acc, p) ->
          |    acc * 2 + CASE WHEN dot_product(v, element_at(element_at(pl, t + 1), p + 1)) > 0
          |                   THEN 1L ELSE 0L END))""".stripMargin))
    val keyed = e.select(col("vec_id"), col("v"), col("nrm"), explode(col("buckets")).as("bucket"))
    val q = keyed.filter(col("vec_id") < 10)
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
    * Training is shuffle-lean: cell means come from the partial-aggregating
    * [[graft.functions.VectorMeanAgg]] (one double[] accumulator per
    * (partition, cell), merged map-side) — no per-dimension row explosion.
    * Init is a deterministic hash-sample (first k vectors in xxhash64
    * order), not first-k-by-id, so seeds don't share insertion locality. */
  def ivfTopK(spark: SparkSession, dir: String, k: Int = 8, nprobe: Int = 2,
      iters: Int = 3): DataFrame = {
    val e = GraftSession.trackCache(vecs(spark, dir))

    var centroids: Array[(Int, Array[Double])] = e
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy("h").limit(k)
      .select("vec_id", "v").collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1).toArray) }

    def withCentroids(df: DataFrame, cs: Array[(Int, Array[Double])]): DataFrame =
      df.withColumn("cs", typedLit(cs.map { case (cid, v) => (cid, v.toSeq) }.toSeq))
        // squared L2 distance to each centroid: |v|^2 - 2<v,c> + |c|^2; the
        // |v|^2 term is rank-invariant, so argmin over -2<v,c> + |c|^2
        .withColumn("dists", expr(
          """transform(cs, c ->
            |  named_struct('d', dot_product(c._2, c._2) - 2.0d * dot_product(v, c._2),
            |               'cid', c._1))""".stripMargin))

    def assigned(cs: Array[(Int, Array[Double])]): DataFrame =
      withCentroids(e, cs)
        .withColumn("cid", expr("array_min(dists).cid"))
        .drop("cs", "dists")

    val vmean = udaf(graft.functions.VectorMeanAgg)
    for (_ <- 1 to iters) {
      val means = assigned(centroids)
        .groupBy("cid").agg(vmean(col("v")).as("m"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
        .toMap
      centroids = centroids.map { case (cid, old) =>
        (cid, means.getOrElse(cid, old))
      }
    }

    val asg = GraftSession.trackCache(assigned(centroids))
    // nprobe nearest centroids per query
    val q = withCentroids(asg.filter(col("vec_id") < 10), centroids)
      .withColumn("probe", expr(s"transform(slice(array_sort(dists), 1, $nprobe), s -> s.cid)"))
      .select(col("vec_id").as("q_id"), col("v").as("va"), col("nrm").as("nrma"),
        explode(col("probe")).as("cid"))
    val c = asg.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("n_id"), col("v").as("vb"), col("nrm").as("nrmb"), col("cid"))
    rankTop5(c.join(broadcast(q), Seq("cid")).withColumn("cosine", cosineCol))
  }
}
