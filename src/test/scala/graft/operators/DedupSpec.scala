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

  test("substring dedup: planted corpus marks exactly the cross-doc window and its run length") {
    import spark.implicits._
    // A and B share the verbatim 9-token run "w1..w9" (embedded at
    // different offsets) -> two 8-token windows each, one consecutive run
    // of 2 windows = 9 tokens; C is 8+ tokens of unique vocabulary; D is
    // long but shares nothing. Within-doc repetition in D must NOT mark.
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 ca cb"),
      (2L, "da db w1 w2 w3 w4 w5 w6 w7 w8 w9"),
      (3L, "ea eb ec ed ee ef eg eh"),
      (4L, "fa fb fc fd fe ff fg fh fa fb fc fd fe ff fg fh")
    ).toDF("doc_id", "text")
    val out = Dedup.substringCore(docs, w = 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((2L, 9L, 0L)), s"doc 1: ${out(1L)}")
    assert(out(2L) == ((2L, 9L, 0L)), s"doc 2: ${out(2L)}")
    assert(out(3L) == ((0L, 0L, 1L)))
    assert(out(4L) == ((0L, 0L, 1L)), "within-doc repetition must not mark")
    // sub-window docs (< 8 tokens) pass through clean rather than vanish
    val short = Dedup.substringCore(Seq((9L, "a b")).toDF("doc_id", "text"), 8)
      .collect().head
    assert(short.getLong(1) == 0L && short.getLong(3) == 1L)
  }

  test("substring dedup on the corpus: exact duplicates are fully marked and stats are consistent") {
    val stats = Dedup.substringDedup(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(stats.values.exists(_._1 > 0), "expected cross-doc duplicated windows on the test corpus")
    // every member of an exact-duplicate group with >= 8 tokens must have
    // ALL its windows marked (its text exists verbatim in another doc)
    // (the spec-SF corpus may hold no EXACT duplicates — the clause below
    // then checks vacuously; the near-dup structure already guarantees
    // shared windows via the nonEmpty assertion above)
    val toks = graft.Tables(spark, sf).documents
      .selectExpr("doc_id", s"size(${TextAnalysis.tokensExpr}) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val exactDupIds = Dedup.exact(spark, sf).filter("n_copies > 1")
      .select("keep_id").collect().map(_.getLong(0))
    exactDupIds.filter(toks(_) >= 8).foreach { id =>
      val (n, run, clean) = stats(id)
      val windows = toks(id) - 7L
      assert(n == windows && run == toks(id) && clean == 0L,
        s"exact-dup doc $id: expected all $windows windows marked, got $n (run $run)")
    }
    // invariants: max run never exceeds token count, never under W when marked
    stats.foreach { case (id, (n, run, clean)) =>
      assert((n == 0) == (clean == 1))
      if (n > 0) assert(run >= 8 && run <= toks(id))
    }
  }

  test("substring dedup plan shape: cached gram stream, no pair-space join") {
    val plan = Dedup.substringDedup(spark, sf).queryExecution.executedPlan.toString
    // the gram stream must come through the cache boundary (it feeds both
    // the >=2-docs rollup and the marking probe — uncached, the tokenize+
    // explode pass runs twice)
    assert(plan.contains("InMemoryTableScan"),
      "gram stream must be read through the cache boundary")
    // linear-by-construction: marking is an equi-(semi-)join on the gram
    // hash — a nested-loop join would mean the pair space leaked in
    assert(!plan.contains("BroadcastNestedLoopJoin"), "pair-space join leaked into the plan")
    assert(!plan.contains("CartesianProduct"))
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

  test("shingle pipeline never leaks into a scan predicate (pushdown regression guard)") {
    // Round 3 found that a filter on a computed column (size(sg) > 0) gets
    // predicate-pushed through the projections and the scatter Exchange
    // into the documents scan, re-inlining the tokenizer per reference —
    // the whole shingle pipeline then ran twice, once single-threaded.
    // Guard: the shingle frame must come from the cache boundary, and no
    // FileScan may carry a higher-order-function predicate.
    val plan = Dedup.minhashLsh(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      "shingle frame must be read through the cache boundary")
    val scanFilters = plan.linesIterator.filter(_.contains("DataFilters"))
    scanFilters.foreach { l =>
      assert(!l.contains("lambdafunction") && !l.contains("array_distinct"),
        s"HOF expression pushed into a scan predicate: ${l.take(200)}")
    }
  }

  test("jaccardPairs (prefix filter + hard cap) matches brute force on a synthetic corpus") {
    // Hard cap shrunk to 4 so the ultra-exclusion fires: the testdata
    // corpus never exceeds the production cap (max df 25 at sf0.1), so
    // only a synthetic corpus can exercise it. Low thresholds make the
    // prefix long (more candidates) and 0.5 makes it short — both sides
    // of the prefix-length arithmetic get covered.
    import org.apache.spark.sql.functions.{col, size}
    val spark2 = spark; import spark2.implicits._
    val hard = 4
    val sets: Map[Long, Seq[Long]] = Map(
      1L -> Seq(100L, 200L, 201L, 300L, 11L), // ultra(df6), df3, df4, df2, unique
      2L -> Seq(100L, 200L, 201L, 300L, 12L),
      3L -> Seq(100L, 200L, 301L),
      4L -> Seq(100L, 201L, 301L, 13L),
      5L -> Seq(100L, 201L),
      6L -> Seq(100L))
    val sgd = sets.toSeq.map { case (d, s) => (d, s) }.toDF("doc_id", "sg")
      .withColumn("n", size(col("sg")).cast("long"))
    val df = sets.values.flatten.groupBy(identity).map { case (k, v) => k -> v.size }
    def brute(thr: Double): Set[(Long, Long, Double)] = (for {
      a <- sets.keys; b <- sets.keys if a < b
      effA = sets(a).filter(sh => df(sh) <= hard).toSet
      effB = sets(b).filter(sh => df(sh) <= hard).toSet
      c = effA.intersect(effB).size if c > 0
      j = math.floor(c.toDouble / (effA.size + effB.size - c) * 1e4 + 0.5) / 1e4
      if j >= thr
    } yield (a, b, j)).toSet
    for (thr <- Seq(0.2, 0.5, 0.9)) {
      val got = Dedup.jaccardPairs(sgd, hard, thr).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == brute(thr), s"thr=$thr: got $got want ${brute(thr)}")
    }
    // fixture sanity: the ultra tier really exists and brute finds pairs
    assert(df(100L) > hard && brute(0.2).nonEmpty)
  }

  test("containmentPairs matches brute force and catches subset docs Jaccard misses") {
    import org.apache.spark.sql.functions.{col, size}
    val spark2 = spark; import spark2.implicits._
    val hard = 100 // nothing excluded: this test is about the asymmetry
    val sets: Map[Long, Seq[Long]] = Map(
      1L -> (1L to 10L),             // fully inside doc 2: C(1→2)=1, J≈0.1
      2L -> (1L to 100L),
      3L -> (200L to 220L),          // disjoint filler
      4L -> ((1L to 9L) :+ 300L))    // C(4→1)=0.9, C(4→2)=0.9, C(1→4)=0.9
    val sgd = sets.toSeq.map { case (d, s) => (d, s) }.toDF("doc_id", "sg")
      .withColumn("n", size(col("sg")).cast("long"))
    def brute(thr: Double): Set[(Long, Long, Double)] = (for {
      a <- sets.keys; b <- sets.keys if a != b
      c = sets(a).toSet.intersect(sets(b).toSet).size if c > 0
      cm = math.floor(c.toDouble / sets(a).size * 1e4 + 0.5) / 1e4
      if cm >= thr
    } yield (a, b, cm)).toSet
    for (thr <- Seq(0.5, 0.9)) {
      val got = Dedup.containmentPairs(sgd, hard, thr).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
      assert(got == brute(thr), s"thr=$thr: got $got want ${brute(thr)}")
    }
    // the case the key exists for: subset doc found by containment,
    // invisible to Jaccard at the same threshold
    val cm = Dedup.containmentPairs(sgd, hard, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val j = Dedup.jaccardPairs(sgd, hard, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cm.contains((1L, 2L)), "subset doc must be contained in its superset")
    assert(!j.contains((1L, 2L)) && !j.contains((2L, 1L)),
      "fixture broken: the subset pair must NOT be a Jaccard near-dup")

    // the df hard cap shapes the MEASURE for containment exactly as for
    // Jaccard — and in the direction only containment can show: a
    // non-shared ultra shingle leaves the CONTAINED doc's denominator,
    // RAISING its containment (raw C(1→2) = 3/4 < 0.9; capped = 3/3)
    val capped: Map[Long, Seq[Long]] = Map(
      1L -> Seq(999L, 1L, 2L, 3L),        // 999 is ultra (df 5 > 4)
      2L -> Seq(1L, 2L, 3L, 4L, 5L),      // no 999: the cap changes the verdict
      3L -> Seq(999L, 50L), 4L -> Seq(999L, 51L),
      5L -> Seq(999L, 52L), 6L -> Seq(999L, 53L))
    val sgdCap = capped.toSeq.map { case (d, s) => (d, s) }.toDF("doc_id", "sg")
      .withColumn("n", size(col("sg")).cast("long"))
    val capHard = 4
    val dfc = capped.values.flatten.groupBy(identity).map { case (k, v) => k -> v.size }
    def bruteCap(thr: Double): Set[(Long, Long, Double)] = (for {
      a <- capped.keys; b <- capped.keys if a != b
      effA = capped(a).filter(sh => dfc(sh) <= capHard).toSet
      effB = capped(b).filter(sh => dfc(sh) <= capHard).toSet
      c = effA.intersect(effB).size if c > 0
      cmv = math.floor(c.toDouble / effA.size * 1e4 + 0.5) / 1e4
      if cmv >= thr
    } yield (a, b, cmv)).toSet
    val gotCap = Dedup.containmentPairs(sgdCap, capHard, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    assert(gotCap == bruteCap(0.9), s"capped: got $gotCap want ${bruteCap(0.9)}")
    // fixture sanity: raw containment of (1→2) is 3/4 — BELOW threshold —
    // so the pair's presence proves the ultra-exclusion applied
    assert(dfc(999L) > capHard && gotCap.map(p => (p._1, p._2)).contains((1L, 2L)))
  }

  test("degenerate uniform-df corpus: PPJoin length+positional filters stay zero-miss") {
    // Pin of the r9 sf5 failure mode: a FIXED tiny vocabulary where every
    // shingle's df is (near-)uniform, so the rarity prefix stops pruning
    // and the global (df, sh) order degenerates to ordering by shingle id
    // (all df ties). The length and positional filters then carry all the
    // pruning — and every df tie-break, prefix boundary, and positional
    // bound edge is exercised. Docs are deterministic pseudo-random
    // subsets of a 12-shingle vocab, with planted near-dup and subset
    // pairs so the truth set is non-trivial at every threshold.
    import org.apache.spark.sql.functions.{col, size}
    val spark2 = spark; import spark2.implicits._
    val vocab = (0L until 12L).toSeq
    // deterministic "random" subsets: doc d keeps shingle v iff a fixed
    // linear-congruential mix of (d, v) clears a modulus — no RNG
    def keeps(d: Long, v: Long): Boolean = ((d * 2654435761L + v * 40503L) % 97) < 55
    val organic = (1L to 30L).map(d => d -> vocab.filter(v => keeps(d, v)))
      .filter(_._2.size >= 2)
    val planted: Seq[(Long, Seq[Long])] = Seq(
      101L -> Seq(0L, 1L, 2L, 3L, 4L, 5L),
      102L -> Seq(0L, 1L, 2L, 3L, 4L, 6L),   // J(101,102)=5/7
      103L -> Seq(0L, 1L, 2L, 3L),           // contained in 101 and 102
      104L -> vocab,                         // container of everything
      105L -> vocab)                         // exact dup of 104
    val sets: Map[Long, Seq[Long]] = (organic ++ planted).toMap
    val sgd = sets.toSeq.map { case (d, s) => (d, s) }.toDF("doc_id", "sg")
      .withColumn("n", size(col("sg")).cast("long"))
    val hard = 1000 // nothing excluded: uniform df means no ultra tier
    def bruteJ(thr: Double): Set[(Long, Long, Double)] = (for {
      a <- sets.keys; b <- sets.keys if a < b
      c = sets(a).toSet.intersect(sets(b).toSet).size if c > 0
      j = math.floor(c.toDouble / (sets(a).size + sets(b).size - c) * 1e4 + 0.5) / 1e4
      if j >= thr
    } yield (a, b, j)).toSet
    def bruteC(thr: Double): Set[(Long, Long, Double)] = (for {
      a <- sets.keys; b <- sets.keys if a != b
      c = sets(a).toSet.intersect(sets(b).toSet).size if c > 0
      cm = math.floor(c.toDouble / sets(a).size * 1e4 + 0.5) / 1e4
      if cm >= thr
    } yield (a, b, cm)).toSet
    for (thr <- Seq(0.3, 0.5, 0.7, 0.9, 1.0)) {
      val gotJ = Dedup.jaccardPairs(sgd, hard, thr).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(gotJ == bruteJ(thr), s"jaccard thr=$thr: got $gotJ want ${bruteJ(thr)}")
      val gotC = Dedup.containmentPairs(sgd, hard, thr).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
      assert(gotC == bruteC(thr), s"containment thr=$thr: got $gotC want ${bruteC(thr)}")
    }
    // fixture sanity: df really is saturated-uniform (every shingle in
    // >40% of docs) and the planted structure survives into the truth set
    val df = sets.values.flatten.groupBy(identity).map(_._2.size)
    assert(df.min > sets.size * 2 / 5, s"df not uniform-saturated: min ${df.min}")
    assert(bruteJ(0.7).contains((101L, 102L, 0.7143)))
    assert(bruteC(1.0).exists(p => p._1 == 103L) && bruteJ(1.0).contains((104L, 105L, 1.0)))
  }

  test("containment dominates Jaccard: every corpus Jaccard pair appears in both directions") {
    // J(a,b) = c/(na+nb-c) <= c/na = C(a→b) pointwise (nb >= c always),
    // and round is monotone — so every round-4 Jaccard >= 0.9 pair must
    // show round-4 containment >= 0.9 BOTH ways.
    val j = Dedup.ngramJaccard(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val c = Dedup.containment(spark, sf)
      .select("contained", "container").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(j.nonEmpty, "fixture: the corpus has Jaccard near-dups")
    j.foreach { case (a, b) =>
      assert(c.contains((a, b)) && c.contains((b, a)),
        s"Jaccard pair ($a,$b) missing from directed containment")
    }
  }

  test("CDC chunking is deterministic, length-bounded, and shift-resistant") {
    import graft.functions.CdcChunks
    val rnd = new scala.util.Random(7)
    val base = Array.fill[Byte](4096)(rnd.nextInt(256).toByte)
    val c1 = CdcChunks.chunkBounds(base)
    assert(c1 == CdcChunks.chunkBounds(base)) // deterministic
    // chunks tile the input exactly; every non-tail chunk respects the clamps
    assert(c1.map(_._2).sum == base.length)
    assert(c1.head._1 == 0)
    c1.init.foreach { case (_, len, _) =>
      assert(len >= CdcChunks.MinChunk && len <= CdcChunks.MaxChunk, s"len $len")
    }
    // THE content-defined property: a 100-byte prefix insertion shifts
    // every offset, but boundaries re-synchronize and most original chunk
    // fingerprints reappear (fixed-size chunking would lose all of them)
    val prefix = Array.fill[Byte](100)(rnd.nextInt(256).toByte)
    val h1 = c1.map(_._3).toSet
    val h2 = CdcChunks.chunkBounds(prefix ++ base).map(_._3).toSet
    val surviving = h1.intersect(h2).size.toDouble / h1.size
    assert(surviving >= 0.7, s"only ${(surviving * 100).round}% of chunks survived the shift")
    // and the operator surfaces shared chunks on the real corpus (the
    // testdata contains exact duplicate documents)
    assert(Dedup.cdcChunkDedup(spark, sf).count() > 0)
  }

  test("exact dedup keeps the minimum doc_id per content group and covers all docs") {
    val total = graft.Tables(spark, sf).documents.count()
    val dedup = Dedup.exact(spark, sf)
    val copies = dedup.agg(org.apache.spark.sql.functions.sum("n_copies")).head.getLong(0)
    assert(copies == total)
  }
}
