package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-19 gates: the IVF-PQ granularity curve's contracts (the triple
  * crossing-point equality — at the shared defaults the cells, m, and
  * rerank sweeps are the SAME point, and that point equals a literal
  * ivfPqTopK run), and the restructured Jaccard candidate generation (the
  * K = 3 share gate's zero-miss boundary on both legs — a true pair whose
  * miss budgets are spent on its very rarest shingles shares EXACTLY K
  * extended-prefix shingles; short docs and their cross pairs ride the
  * broadcast side leg).
  */
class Round19Spec extends SparkSpec {

  // ---------- ann_ivfpq_cells_curve ----------

  test("ivfpqCellsCurve: cost column honest, cells=8 row = m-curve m=8 row = rerank-curve rerank=32 row = a literal ivfPqTopK run") {
    val rows = Similarity.ivfpqCellsCurve(spark, sf).orderBy("cells").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.map(_._1).toSeq === Seq(4, 8, 16))
    assert(rows.forall(_._5 == 50L), "10 queries x top-5 exact baseline")
    // cost honesty: n_reranked = sum_q min(rerank, ncand) can never
    // exceed the probed candidate volume, and a probed leg reports it
    rows.foreach { r =>
      assert(r._3 <= r._2, s"cells=${r._1}: n_reranked ${r._3} > n_cand ${r._2}")
      assert(r._2 > 0L, s"cells=${r._1}: empty candidate leg")
    }
    // the TRIPLE crossing point: at the shared defaults (cells=8,
    // nprobe=2, m=8, rerank=32, k=16, iters=2) all three sweeps describe
    // the identical configuration — the same coarse build, candidates,
    // codes and admission order — so their rows must agree exactly
    val c8 = rows.find(_._1 == 8).get
    val m8 = Similarity.ivfpqMCurve(spark, sf)
      .filter(col("m") === 8).collect().head
    assert(c8._4 === m8.getLong(3),
      s"cells=8 n_hits ${c8._4} != m-curve m=8 n_hits ${m8.getLong(3)}")
    assert(c8._3 === m8.getLong(2),
      s"cells=8 n_reranked ${c8._3} != m-curve m=8 n_reranked ${m8.getLong(2)}")
    val rer32 = Similarity.ivfpqRerankCurve(spark, sf)
      .filter(col("rerank") === 32L).collect().head
    assert(c8._4 === rer32.getLong(2),
      s"cells=8 n_hits ${c8._4} != rerank-curve rerank=32 n_hits ${rer32.getLong(2)}")
    assert(c8._3 === rer32.getLong(1),
      s"cells=8 n_reranked ${c8._3} != rerank-curve rerank=32 n_reranked ${rer32.getLong(1)}")
    // and the crossing point equals the production composition literally
    val pairs = (df: org.apache.spark.sql.DataFrame) => df
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact5 = pairs(Similarity.topK(spark, sf))
    val pq = pairs(Similarity.ivfPqTopK(spark, sf))
    assert(c8._4 === pq.intersect(exact5).size.toLong,
      "cells=8 hits diverge from a literal ivfPqTopK() run at the defaults")
    info(s"curve: ${rows.map(r =>
      s"cells=${r._1} n_cand=${r._2} r@5=${r._6}").mkString("; ")}")
  }

  // ---------- dedup_ngram_jaccard: K-share gate + short-doc side leg ----------

  test("jaccard K-share gate zero-miss boundary: both miss budgets spent on each doc's rarest shingles, shares = exactly K") {
    val spark2 = spark; import spark2.implicits._
    // The gate's worst case: docs 1 and 2 share a 64-shingle core and
    // each adds 4 UNIQUE shingles (df = 1) that the global (df, sh)
    // rarity order puts FIRST in that doc's extended prefix — so the
    // miss budget is spent entirely on prefix-leading shingles. At
    // t = 0.88: na = 68, ceil(t*na) = 60, m = 8, l = min(68, m+K) = 11;
    // the filler doc raises the core's df to 3, so each extended prefix
    // is its 4 uniques ++ the 7 smallest core shingles — shared prefix
    // shingles = {1..7}, comfortably >= K, while J(1,2) = 64/72 =
    // 0.8889 >= t sits just above the threshold. The EXACT-K boundary
    // is the filler pair: J(1,100) = 64/68 = 0.9412, ceil(t*64) = 57,
    // filler m = 7, filler l = min(64, 10) = 10 → its prefix is core
    // {1..10} and doc 1's is uniques ++ {1..7}: shared = 7 >= K, with
    // every count arithmetic (slice length, guarded ceil, share gate)
    // exercised at small integers where an off-by-one flips the answer.
    val core = 1L to 64L
    val a = core ++ Seq(1001L, 1002L, 1003L, 1004L)
    val b = core ++ Seq(2001L, 2002L, 2003L, 2004L)
    val docs = Seq((1L, a), (2L, b), (100L, core.map(identity)))
      .toDF("doc_id", "sg")
      .withColumn("n", size(col("sg")).cast("long"))
    val got = Dedup.jaccardPairs(docs, hard = 100, threshold = 0.88).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // brute truth: J(1,2) = 64/72 = 0.8889; J(1,100) = J(2,100) =
    // 64/68 = 0.9412 — all three qualify at t = 0.88
    assert(got.map(p => (p._1, p._2)) === Set((1L, 2L), (1L, 100L), (2L, 100L)),
      s"boundary pair set wrong: $got")
    val j12 = got.find(p => p._1 == 1L && p._2 == 2L).get._3
    assert(j12 === math.floor(64.0 / 72.0 * 1e4 + 0.5) / 1e4)
  }

  test("jaccard short-doc side leg: <=2-shingle docs pair through the broadcast leg, long x short never qualifies at t=0.9") {
    val spark2 = spark; import spark2.implicits._
    // At t = 0.9, K = 3: docs with ceil(0.9 * n) < 3 (n <= 2) ride the
    // side leg. Identical 2-shingle docs J = 1.0 must be found; a
    // 2-shingle doc against a 3-shingle superset has J = 2/3 < 0.9 and
    // must NOT appear; identical 1-shingle docs must be found.
    val docs = Seq(
      (1L, Seq(10L, 20L)), (2L, Seq(10L, 20L)),       // J = 1.0 pair
      (3L, Seq(10L, 20L, 30L)),                        // J(1,3) = 2/3
      (4L, Seq(99L)), (5L, Seq(99L)),                  // J = 1.0 pair
      (6L, Seq(50L, 60L, 70L, 80L)))                   // long filler
      .toDF("doc_id", "sg")
      .withColumn("n", size(col("sg")).cast("long"))
    val got = Dedup.jaccardPairs(docs, hard = 100, threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set((1L, 2L, 1.0), (4L, 5L, 1.0)),
      s"side-leg pair set wrong: $got")
  }
}
