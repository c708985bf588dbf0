package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-11 gates: the dedup_embedding cogroup-kernel rebuild and its
  * banded (LSH-candidate) tier.
  *
  * The kernel test pins bit-identical semantics against the declarative
  * all-pairs formulation (same summation order, same decimal rounding);
  * the recall tests pin the MEASURED reason banding is NOT the checked
  * default at τ = 0.42 (borderline background pairs don't share buckets)
  * while demonstrating it is sound in its intended high-τ regime.
  */
class Round11Spec extends SparkSpec {

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("dedup_embedding tile kernel is bit-identical to the declarative all-pairs formulation") {
    graft.GraftSession.registerFunctions(spark)
    val e = graft.Tables(spark, sf).embeddings
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("nrm", expr("sqrt(dot_product(v, v))"))
    val a = e.select(col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("nrma"))
    val b = e.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nrmb"))
    val reference = pairSet(a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", round(expr("dot_product(va, vb)") / (col("nrma") * col("nrmb")), 4))
      .filter(col("cosine") >= 0.42)
      .select("id_a", "id_b", "cosine"))
    val kernel = pairSet(Dedup.embeddingCosine(spark, sf))
    assert(kernel == reference,
      s"kernel-only: ${kernel.diff(reference)}; reference-only: ${reference.diff(kernel)}")
  }

  test("banded embedding tier is a strict subset at τ=0.42 — measured proof banding can't be the checked default") {
    val exact = pairSet(Dedup.embeddingCosine(spark, sf))
    val banded = pairSet(Dedup.embeddingCosine(spark, sf, banded = true))
    assert(banded.subsetOf(exact),
      s"banded must verify exactly, so it can never exceed exact: ${banded.diff(exact)}")
    // The corpus's τ=0.42 answer is all borderline pairs (cosine ≈ 0.42-0.6,
    // θ ≈ 55-65°) — hyperplane retention there is far below 1, which is WHY
    // the checked default stays exact. If this ever fails with recall ≈ 1,
    // the corpus gained true high-cosine dups and the claim needs re-auditing.
    assert(exact.nonEmpty)
    val recall = banded.size.toDouble / exact.size
    assert(recall < 0.8, f"expected sub-0.8 banding recall on borderline pairs, got $recall%.2f")
  }

  test("pipeline_keep_best picks the true quality-max member of every cluster") {
    val clusters = Dedup.clusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val quality = TextAnalysis.quality(spark, sf)
      .select("doc_id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = clusters.groupBy(_._2).map { case (cid, members) =>
      val docs = members.map(_._1)
      // the declared total order: (score, doc_id) lexicographic max
      val kept = docs.maxBy(d => (quality(d), d))
      (cid, kept, docs.length.toLong, quality(kept))
    }.toSet
    val got = Pipeline.keepBest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expected, s"diff: ${got.diff(expected).take(3)} / ${expected.diff(got).take(3)}")
    assert(got.nonEmpty)
  }

  test("r11 plan shapes: cogroup dedup has no per-pair join, keep_best has no window, matryoshka has no shuffle") {
    // embeddingCosine: the whole point of the rebuild is that NO join —
    // cartesian, BNLJ, or sort-merge — materializes the pair space; the
    // kernel consumes cogrouped tiles
    val emb = Dedup.embeddingCosine(spark, sf).queryExecution.executedPlan.toString
    assert(emb.contains("CoGroup"), "expected the tile CoGroup operator")
    assert(!emb.contains("CartesianProduct") && !emb.contains("BroadcastNestedLoopJoin"),
      "pair space must never materialize through a join")
    // keepBest: the per-cluster winner is an algebraic struct-max — a
    // partial/final HashAggregate, never a sort-based WindowExec
    val kb = Pipeline.keepBest(spark, sf).queryExecution.executedPlan.toString
    assert(!kb.contains("Window"), "keep_best must not use a window function")
    // matryoshka: one map-side pass — no KEYED shuffle anywhere (the only
    // permissible Exchange is Tables' deliberate round-robin scatter gate)
    val mt = Similarity.matryoshkaRetention(spark, sf).queryExecution.executedPlan.toString
    assert(!mt.contains("hashpartitioning"),
      "matryoshka retention must be free of keyed shuffles (map-side HOFs only)")
  }

  test("matryoshka retention is monotone in width and reaches 1.0 at full width") {
    val rows = Similarity.matryoshkaRetention(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (r16, r32, r48) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(r16 <= r32 + 1e-9 && r32 <= r48 + 1e-9, s"non-monotone: $r")
      assert(r16 >= 0.0 && r48 <= 1.0 + 1e-9)
    }
    // unit-norm corpus: retained fraction at width 64 would be exactly 1;
    // widths below keep strictly less for at least some vectors
    assert(rows.exists(_.getDouble(1) < 0.999))
  }

  test("banded embedding tier finds every planted high-cosine near-dup (its intended regime)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-emb-planted").toString
    val rnd = new scala.util.Random(7)
    val dim = 64
    val base = Array.fill(200)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    // 20 planted near-dups: copy + small noise → cosine ≈ 0.99
    val planted = (0 until 20).map { i =>
      base(i).zipWithIndex.map { case (x, k) => x + 0.07f * rnd.nextGaussian().toFloat }
    }
    val rows = (base ++ planted).zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq, 0) }
    spark.createDataFrame(rows).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val exact = pairSet(Dedup.embeddingCosine(spark, tmp))
    val banded = pairSet(Dedup.embeddingCosine(spark, tmp, banded = true))
    val high = exact.filter(_._3 >= 0.9)
    assert(high.size >= 20, s"expected the 20 planted pairs at cosine >= 0.9, got ${high.size}")
    assert(high.subsetOf(banded),
      s"banded tier missed high-cosine pairs: ${high.diff(banded)}")
  }
}
