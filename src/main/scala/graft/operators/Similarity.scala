package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`Array[Float]` vectors).
  *
  * Three tiers, same contract (top-k neighbors per query vector):
  *  - [[topK]]        exact brute force — the correctness baseline.
  *  - [[lshTopK]]     random-hyperplane LSH — bucket equi-join, the
  *                    shuffle-light path when the corpus is billions.
  *  - [[ivfTopK]]     IVF (k-means coarse quantizer + nprobe) — the
  *                    FAISS-shaped scale path.
  */
object Similarity {

  private val dotExpr =
    "aggregate(zip_with(va, vb, (x, y) -> x * y), cast(0.0 as double), (a, x) -> a + x)"

  /** vec_id, v (double vector), nrm (L2 norm), computed map-side once. */
  private def vecs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).embeddings
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("nrm", expr("sqrt(aggregate(v, cast(0.0 as double), (a, x) -> a + x * x))"))

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
    c.crossJoin(broadcast(q))
      .withColumn("cosine", expr(dotExpr) / (col("nrma") * col("nrmb")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(round(col("cosine"), 6).desc, col("n_id"))).cast("long"))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("n_id"), round(col("cosine"), 4).as("score"), col("rnk"))
  }

  /** Deterministic random hyperplanes (fixed seed, JVM-stable LCG). */
  private def planes(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** Random-hyperplane LSH: 12-bit sign signature → bucket equi-join →
    * exact rerank inside the bucket. At planetary scale the bucket key
    * join replaces the cross join; recall is traded via the plane count. */
  def lshTopK(spark: SparkSession, dir: String): DataFrame = {
    val pl = planes(12, 64)
    val plCol = typedLit(pl.map(_.toSeq).toSeq)
    val e = vecs(spark, dir)
      .withColumn("pl", plCol)
      .withColumn("bucket", expr(
        """aggregate(transform(pl, (p, i) ->
          |    CASE WHEN aggregate(zip_with(v, p, (x, y) -> x * y),
          |                        cast(0.0 as double), (a, x) -> a + x) > 0
          |         THEN shiftleft(1L, i) ELSE 0L END),
          |  0L, (a, b) -> a | b)""".stripMargin))
      .drop("pl")
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("va"), col("nrm").as("nrma"), col("bucket"))
    val c = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("n_id"), col("v").as("vb"), col("nrm").as("nrmb"), col("bucket"))
    c.join(q, Seq("bucket"))
      .withColumn("cosine", expr(dotExpr) / (col("nrma") * col("nrmb")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(round(col("cosine"), 6).desc, col("n_id"))).cast("long"))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("n_id"), round(col("cosine"), 4).as("score"), col("rnk"))
  }

  /** IVF: k-means coarse quantizer (k=8, 3 Lloyd iterations, first-k init)
    * trained with DataFrame aggregations; only the k x dim centroid matrix
    * is ever collected to the driver. Queries probe the 2 nearest
    * centroids and rerank exactly within those inverted lists. */
  def ivfTopK(spark: SparkSession, dir: String): DataFrame = {
    val spark0 = spark
    val e = vecs(spark0, dir).cache()
    val dim = 64
    val k = 8

    var centroids: Array[(Int, Array[Double])] = e.filter(col("vec_id") < k)
      .select("vec_id", "v").collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toArray))

    def assigned(cs: Array[(Int, Array[Double])]): DataFrame = {
      val cCol = typedLit(cs.map { case (cid, v) => (cid, v.toSeq) }.toSeq)
      e.withColumn("cs", cCol)
        .withColumn("cid", expr(
          """aggregate(cs, named_struct('cid', -1, 'd', cast(1e18 as double)),
            |  (best, c) -> CASE WHEN aggregate(zip_with(v, c._2, (x, y) -> (x - y) * (x - y)),
            |                                   cast(0.0 as double), (a, x) -> a + x) < best.d
            |    THEN named_struct('cid', c._1, 'd',
            |           aggregate(zip_with(v, c._2, (x, y) -> (x - y) * (x - y)),
            |                     cast(0.0 as double), (a, x) -> a + x))
            |    ELSE best END).cid""".stripMargin))
        .drop("cs")
    }

    for (_ <- 1 to 3) {
      val means = assigned(centroids)
        .select(col("cid"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy("cid", "d").agg(avg("x").as("m"))
        .collect()
      val byCid = means.groupBy(_.getInt(0))
      centroids = centroids.map { case (cid, old) =>
        byCid.get(cid) match {
          case Some(rows) =>
            val m = new Array[Double](dim)
            rows.foreach(r => m(r.getInt(1)) = r.getDouble(2))
            (cid, m)
          case None => (cid, old)
        }
      }
    }

    val asg = assigned(centroids)
    val cCol = typedLit(centroids.map { case (cid, v) => (cid, v.toSeq) }.toSeq)
    // nprobe = 2 nearest centroids per query
    val q = asg.filter(col("vec_id") < 10)
      .withColumn("cs", cCol)
      .withColumn("probe", expr(
        """slice(transform(array_sort(transform(cs, c ->
          |   named_struct('d', aggregate(zip_with(v, c._2, (x, y) -> (x - y) * (x - y)),
          |                               cast(0.0 as double), (a, x) -> a + x),
          |                'cid', c._1))), s -> s.cid), 1, 2)""".stripMargin))
      .select(col("vec_id").as("q_id"), col("v").as("va"), col("nrm").as("nrma"),
        explode(col("probe")).as("cid"))
    val c = asg.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("n_id"), col("v").as("vb"), col("nrm").as("nrmb"), col("cid"))
    c.join(q, Seq("cid"))
      .withColumn("cosine", expr(dotExpr) / (col("nrma") * col("nrmb")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(round(col("cosine"), 6).desc, col("n_id"))).cast("long"))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("n_id"), round(col("cosine"), 4).as("score"), col("rnk"))
  }
}
