package graft.operators

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  private def topMap(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.select("q_id", "n_id", "rnk").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(_.getLong(2)).map(_.getLong(1)).toSeq }

  test("brute-force topK returns 5 ranked neighbors for each of the 10 queries") {
    val t = topMap(Similarity.topK(spark, sf))
    assert(t.keySet == (0L until 10L).toSet)
    t.values.foreach(ns => assert(ns.size == 5))
  }

  test("IVF with nprobe=2 finds the true nearest neighbor for most queries") {
    val exact = topMap(Similarity.topK(spark, sf))
    val ivf = topMap(Similarity.ivfTopK(spark, sf))
    // recall@1 across 10 queries: IVF probes 2/8 partitions, expect >= 5 hits
    val hits = exact.count { case (q, ns) => ivf.get(q).exists(_.headOption == ns.headOption) }
    assert(hits >= 5, s"IVF recall@1 too low: $hits/10")
  }

  test("IVF knobs work: k=16 cells, nprobe=3, 2 Lloyd iterations") {
    val exact = topMap(Similarity.topK(spark, sf))
    val ivf = topMap(Similarity.ivfTopK(spark, sf, k = 16, nprobe = 3, iters = 2))
    assert(ivf.keySet == (0L until 10L).toSet)
    ivf.values.foreach(ns => assert(ns.size == 5))
    // finer quantizer (16 cells), 3/16 of the corpus probed: still expect a
    // solid fraction of true nearest neighbors (near-dups share cells)
    val hits = exact.count { case (q, ns) => ivf.get(q).exists(_.headOption == ns.headOption) }
    assert(hits >= 3, s"IVF(k=16, nprobe=3) recall@1 too low: $hits/10")
  }

  test("PQ with exact re-rank recovers most true top-5 sets") {
    val exact = topMap(Similarity.topK(spark, sf))
    val pq = topMap(Similarity.pqTopK(spark, sf))
    assert(pq.keySet == (0L until 10L).toSet)
    pq.values.foreach(ns => assert(ns.size == 5))
    // ADC over 8x16 codebooks keeps near neighbors in the top-32 shortlist
    // and the exact re-rank restores their order: expect recall@1 >= 6/10
    // and substantial top-5 overlap on every query
    val hits = exact.count { case (q, ns) => pq.get(q).exists(_.headOption == ns.headOption) }
    assert(hits >= 6, s"PQ recall@1 too low: $hits/10")
    val overlap = exact.map { case (q, ns) => pq(q).toSet.intersect(ns.toSet).size }.sum
    assert(overlap >= 30, s"PQ top-5 overlap too low: $overlap/50")
  }

  test("PQ knobs work: 16 subspaces, 8 codewords, tighter shortlist") {
    val pq = topMap(Similarity.pqTopK(spark, sf, m = 16, k = 8, iters = 1, rerank = 16))
    assert(pq.keySet == (0L until 10L).toSet)
    pq.values.foreach(ns => assert(ns.size == 5))
  }

  test("IVF-PQ composes pruning and compression, still finding true neighbors") {
    val exact = topMap(Similarity.topK(spark, sf))
    val ivfpq = topMap(Similarity.ivfPqTopK(spark, sf))
    assert(ivfpq.keySet == (0L until 10L).toSet)
    ivfpq.values.foreach(ns => assert(ns.size == 5))
    ivfpq.values.flatten.foreach(n => assert(n >= 10))
    // recall is bounded above by the IVF probe (2/8 cells) and below-noised
    // by the ADC approximation; the exact re-rank restores order within the
    // shortlist — expect at least the IVF floor minus one
    val hits = exact.count { case (q, ns) => ivfpq.get(q).exists(_.headOption == ns.headOption) }
    assert(hits >= 4, s"IVF-PQ recall@1 too low: $hits/10")
  }

  test("LSH results, when present, agree with exact cosine ordering") {
    val lsh = topMap(Similarity.lshTopK(spark, sf))
    lsh.foreach { case (q, ns) =>
      assert(q < 10)
      ns.foreach(n => assert(n >= 10)) // neighbors only from the corpus side
      assert(ns.size <= 5)
    }
  }
}
