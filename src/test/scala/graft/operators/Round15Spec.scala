package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-15 gates: the DOULION sampled-triangle tier's accuracy band vs
  * the exact key (the error contract the r14 verdict asked to ship beside
  * the cost contract), the BPE trainer's first-N merges against an
  * INDEPENDENT driver-side reference trainer (not a replay of the Spark
  * expressions), the replace-chain merge semantics on planted overlap /
  * anchoring corpora, and the hits quantum floor guard.
  */
class Round15Spec extends SparkSpec {

  test("trianglesApprox: deterministic 1/4 coin lands ~p edges and the 64x estimate sits inside ±10% of exact") {
    val exact = Graph.transitivity(spark, sf).head
    val est = Graph.trianglesApprox(spark, sf).head
    val (t, w) = (exact.getAs[Long]("n_triangles"), exact.getAs[Long]("n_wedges"))
    assert(t > 1000L, s"fixture too sparse for a variance-bounded band (T=$t)")
    // the coin is a fixed hash, not an RNG — the realized rate is a
    // deterministic property of the fixture edge set
    val rate = est.getAs[Long]("n_edges_sampled").toDouble / est.getAs[Long]("n_edges")
    assert(rate > 0.2 && rate < 0.3, s"sample rate $rate drifted from p=1/4")
    assert(est.getAs[Long]("n_edges") === exact.getAs[Long]("n_edges"))
    assert(est.getAs[Long]("n_wedges") === w, "W must be EXACT (no sampling on the linear term)")
    val tEst = est.getAs[Long]("t_est")
    assert(tEst === est.getAs[Long]("n_triangles_sampled") * 64L)
    val relErr = math.abs(tEst - t).toDouble / t
    info(f"exact T=$t, estimate $tEst (rel err $relErr%.4f), realized p=$rate%.4f")
    assert(relErr <= 0.10, s"estimate $tEst vs exact $t: rel err $relErr > 10%")
    // transitivity estimate inherits the same band (W exact)
    val trueTr = exact.getAs[Double]("transitivity")
    val estTr = est.getAs[Double]("transitivity_est")
    assert(math.abs(estTr - trueTr) <= 0.10 * trueTr + 1e-9)
  }

  /** Independent reference BPE trainer: plain Scala over a collected word
    * histogram — pair census (all adjacent positions, overlaps included),
    * (n DESC, a, b) argmax, greedy-LEFTMOST merge-all. Shares no code or
    * expression with the Spark side's replace-chain. */
  private def refTrain(words: Seq[(String, Long)], rounds: Int): Seq[(Long, String, String, String, Long)] = {
    var state: Seq[(Vector[String], Long)] =
      words.map { case (w, c) => (w.toVector.map(_.toString), c) }
    (1 to rounds).map { k =>
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((sy, c) <- state; i <- 0 until sy.length - 1)
        counts((sy(i), sy(i + 1))) = counts.getOrElse((sy(i), sy(i + 1)), 0L) + c
      assert(counts.nonEmpty, s"reference trainer out of pairs at round $k")
      val ((a, b), n) = counts.minBy { case ((x, y), m) => (-m, x, y) }
      state = state.map { case (sy, c) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < sy.length) {
          if (i + 1 < sy.length && sy(i) == a && sy(i + 1) == b) { out += a + b; i += 2 }
          else { out += sy(i); i += 1 }
        }
        (out.result(), c)
      }
      (k.toLong, a, b, a + b, n)
    }
  }

  test("bpeTrain's learned table equals the independent reference trainer on the corpus") {
    val words = graft.Tables(spark, sf).documents
      .select(explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "").groupBy("w").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(words.forall(_._1.matches("^[a-z0-9]+$")),
      "fixture corpus must be alnum for the declared vocabulary contract")
    val expected = refTrain(words, TextAnalysis.BpeTrainRounds)
    val got = TextAnalysis.bpeTrain(spark, sf).orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq
    assert(got === expected)
  }

  test("bpeTrain merge semantics: greedy-leftmost overlap (aaa under (a,a) -> [aa, a])") {
    import spark.implicits._
    val docs = Seq(("d1", "aaa aaa aaa")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrainCore(spark, docs, rounds = 2)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq
    // round 1: "aaa" contributes TWO overlapping (a,a) positions x3 words;
    // the merge keeps the overlap un-merged: [aa, a], never [aaa] or [a, aa]
    // — pinned by round 2's census seeing exactly (aa, a) x3
    assert(got === Seq((1L, "a", "a", "aa", 6L), (2L, "aa", "a", "aaa", 3L)))
    // fixed-round contract: a corpus that runs dry fails loudly
    val e = intercept[IllegalArgumentException](
      TextAnalysis.bpeTrainCore(spark, docs, rounds = 3).collect())
    assert(e.getMessage.contains("ran out of adjacent pairs"))
  }

  test("bpeTrain merge semantics: merged symbols anchor as whole symbols in later rounds") {
    import spark.implicits._
    // vocab {aab: 2, ab: 3}: round 1 merges (a,b) n=5; inside "aab" the
    // FIRST a must survive unmerged ([a, ab]) — an under-anchored state
    // encoding would let the pattern match across symbol boundaries
    val docs = Seq(("d1", "aab aab ab ab ab")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrainCore(spark, docs, rounds = 2)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq
    assert(got === Seq((1L, "a", "b", "ab", 5L), (2L, "a", "ab", "aab", 2L)))
  }

  test("trianglesApprox plan shape: the coin samples BELOW the wedge join, never above it") {
    // The cost contract only a plan pin can guard: filtering the coin
    // AFTER the wedge join would return identical results (every sampled
    // triangle's edges pass the coin either way) and identical oracle
    // hashes — while silently paying the FULL exact-tier wedge stream the
    // approx key exists to avoid. The discriminator is the CACHE
    // boundary: the good plan evaluates the coin (the 0x9E3779B1
    // multiplier is unique to it) directly over the cotrade-projection
    // cache — its only subtree is an InMemoryTableScan leaf — while a
    // post-hoc filter would carry the wedge join in its own subtree. The
    // projection's internal joins live BEHIND the cache boundary, so
    // treating InMemoryTableScan as a leaf below a coin node separates
    // the legitimate joins from the forbidden one. (Cache boundaries ARE
    // expanded while searching for coin nodes — non-vacuity needs the
    // coin found wherever it hides.)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val df = Graph.trianglesApprox(spark, sf)
    df.collect() // materialize so AQE final plans + caches exist
    def kids(p: SparkPlan, intoCaches: Boolean): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case s: InMemoryTableScanExec =>
        if (intoCaches) Seq(s.relation.cachedPlan) else Seq.empty
      case other => other.children
    }
    def coinHere(p: SparkPlan): Boolean =
      p.expressions.exists(_.toString.contains("2654435761"))
    var coinSeen = 0
    var coinAboveJoin = 0
    def hasJoin(p: SparkPlan): Boolean =
      p.nodeName.contains("Join") ||
        kids(p, intoCaches = false).exists(hasJoin)
    def walk(p: SparkPlan): Unit = {
      if (coinHere(p)) {
        coinSeen += 1
        if (kids(p, intoCaches = false).exists(hasJoin)) coinAboveJoin += 1
      }
      kids(p, intoCaches = true).foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    assert(coinSeen > 0, "the sampling coin is absent from the expanded plan — " +
      "either the pin went vacuous (multiplier changed?) or sampling disappeared")
    assert(coinAboveJoin == 0,
      s"$coinAboveJoin coin-evaluating node(s) sit ABOVE a join — the edge " +
        "sample must be taken before the wedge self-join or the approx " +
        "tier silently pays the exact tier's wedge stream")
  }

  test("hits refuses a quantum below the customer count instead of emitting NULL scores") {
    try {
      spark.conf.set("spark.graft.hits.quantum", "10")
      val e = intercept[IllegalArgumentException](Graph.hits(spark, sf).collect())
      assert(e.getMessage.contains("must be positive and >="))
    } finally spark.conf.unset("spark.graft.hits.quantum")
  }
}
