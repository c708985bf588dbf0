package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-9 invariants: the shared-exchange multi prefix sum, the exact KS
  * statistic against a single-partition brute force, and the LIMIT-BY key
  * actually running on the bounded-heap TopKPerKeyExec. */
class Round9Spec extends SparkSpec {

  test("prefixSummedAll: k columns over one exchange == k independent window prefix sums") {
    import spark.implicits._
    val df = spark.range(5000)
      .select(
        (col("id") * 2654435761L % 997L).as("key"),
        (col("id") % 13).as("a"),
        (col("id") % 7).as("b"))
      .groupBy("key")
      .agg(sum("a").as("a"), sum("b").as("b"))
    val got = GlobalRank
      .prefixSummedAll(df, Seq(col("a") -> "ca", col("b") -> "cb"), col("key"))
      .select("key", "ca", "cb").as[(Long, Long, Long)].collect().toSet
    // baseline: the trap formulation (fine at spec scale, 4 partitions)
    val w = Window.orderBy("key").rowsBetween(Window.unboundedPreceding, 0)
    val want = df
      .withColumn("ca", sum("a").over(w)).withColumn("cb", sum("b").over(w))
      .select("key", "ca", "cb").as[(Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("q_ks_test equals the single-partition brute force, and its bounds hold") {
    val got = Analytics.ksTest(spark, sf).collect().head
    val (d, p, v) = (got.getDouble(0), got.getLong(1), got.getLong(2))
    // brute force: per-score window CDFs on one partition, driver math
    val rows = graft.Tables(spark, sf).events
      .filter(col("event_type").isin("purchase", "view"))
      .select(expr("cast(round(value * 100) as bigint)").as("score"),
        (col("event_type") === "purchase").cast("long").as("isp"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byScore = rows.groupBy(_._1).view
      .mapValues(xs => (xs.map(_._2).sum, xs.size - xs.map(_._2).sum)).toSeq.sortBy(_._1)
    val (totP, totV) = (byScore.map(_._2._1).sum, byScore.map(_._2._2).sum)
    assert(p == totP && v == totV)
    var (cp, cv, m) = (0L, 0L, BigInt(0))
    byScore.foreach { case (_, (np, nv)) =>
      cp += np; cv += nv
      m = m.max((BigInt(cp) * totV - BigInt(cv) * totP).abs)
    }
    val want = math.rint(m.toDouble / (totP.toDouble * totV.toDouble) * 1e4) / 1e4
    assert(d == want, s"ks_d $d != brute $want")
    assert(d > 0.0 && d <= 1.0)
  }

  test("text_dup_spans: planted repeats produce exact span geometry; brute force agrees on sf") {
    import spark.implicits._
    // doc 1: a 12-token run repeated verbatim in doc 2 (5 dup windows,
    // one span of 12 tokens in each) with unique filler around it;
    // doc 3: fully unique; doc 4: an 8-token window repeated INSIDE the
    // same doc, separated by >8 unique tokens (2 dup windows, 2 spans);
    // doc 5: shorter than 8 tokens (zero windows).
    val run = (1 to 12).map(i => s"r$i").mkString(" ")
    val rep = (1 to 8).map(i => s"s$i").mkString(" ")
    val planted = Seq(
      (1L, s"u1 u2 u3 $run u4 u5"),
      (2L, s"v1 $run v2 v3 v4"),
      (3L, (1 to 20).map(i => s"w$i").mkString(" ")),
      (4L, s"$rep x1 x2 x3 x4 x5 x6 x7 x8 x9 $rep"),
      (5L, "y1 y2 y3")).toDF("doc_id", "text")
    val got = TextAnalysis.dupSpansCore(planted).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(got(1L) == ((5L, 1L, 12L, 12L)), s"doc1: ${got(1L)}")
    assert(got(2L) == ((5L, 1L, 12L, 12L)), s"doc2: ${got(2L)}")
    assert(got(3L) == ((0L, 0L, 0L, 0L)))
    assert(got(4L) == ((2L, 2L, 8L, 16L)), s"doc4: ${got(4L)}")
    assert(got(5L) == ((0L, 0L, 0L, 0L)))

    // brute force on the real sf corpus: string-gram df>1 positions,
    // interval union per doc, driver-side
    val docs = graft.Tables(spark, sf).documents
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ").filter(_.nonEmpty) }
    val df = scala.collection.mutable.HashMap.empty[String, Int]
    docs.foreach { case (_, tk) =>
      tk.sliding(8).filter(_.size == 8).foreach(g => df.updateWith(g.mkString(" "))(c => Some(c.getOrElse(0) + 1)))
    }
    val want = docs.map { case (id, tk) =>
      val pos = tk.sliding(8).zipWithIndex.filter(_._1.size == 8)
        .collect { case (g, i) if df(g.mkString(" ")) > 1 => i }.toSeq
      var spans = List.empty[(Int, Int)] // (start, end) token intervals
      pos.foreach { p =>
        spans match {
          case (s0, e0) :: rest if p <= e0 + 1 => spans = (s0, math.max(e0, p + 7)) :: rest
          case _ => spans = (p, p + 7) :: spans
        }
      }
      id -> (pos.size.toLong, spans.size.toLong,
        if (spans.isEmpty) 0L else spans.map(s => s._2 - s._1 + 1).max.toLong,
        spans.map(s => s._2 - s._1 + 1).sum.toLong)
    }.toMap
    val gotSf = TextAnalysis.dupSpans(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(gotSf == want, {
      val bad = gotSf.collect { case (k, v) if want.get(k) != Some(v) => (k, v, want.get(k)) }.take(3)
      s"mismatch e.g. $bad"
    })
    // the sf corpus must make the key non-vacuous (it carries exact dups)
    assert(gotSf.values.exists(_._1 > 0L), "no duplicated window anywhere — vacuous corpus")
  }

  test("q_limit_by runs on TopKPerKeyExec (no WindowExec sort) and equals the window baseline") {
    val df = Olap.limitByCustomer(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("Window "), s"WindowExec still present:\n$plan")
    val fast = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = saved.filterNot(_ == graft.plans.TopKPerKeyRewrite)
    try {
      val slow = Olap.limitByCustomer(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      assert(fast == slow)
      // every customer contributes, nobody exceeds 3 rows
      assert(fast.groupBy(_._1).values.forall(g => g.nonEmpty && g.size <= 3))
    } finally spark.experimental.extraOptimizations = saved
  }

  test("q_cond_agg: the one-scan battery equals per-filter separate scans") {
    val got = Analytics.condAgg(spark, sf).collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap
    val raw = graft.Tables(spark, sf).events
      .selectExpr("cast(ts as date) as day", "event_type", "value",
        "cast(round(value * 100) as bigint) as cents")
      .collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getDouble(2), r.getLong(3)))
    val brute = raw.groupBy(_._1).map { case (day, rs) =>
      val hi = rs.filter(_._3 > 50d)
      day -> ((rs.length.toLong,
        rs.count(_._2 == "purchase").toLong,
        rs.filter(_._2 == "purchase").map(_._4).sum / 100.0,
        hi.length.toLong,
        if (hi.isEmpty) None
        else Some(math.rint(hi.map(_._3).sum / hi.length * 1e4) / 1e4)))
    }
    assert(got.keySet == brute.keySet)
    brute.foreach { case (day, want) =>
      val g = got(day)
      assert(g._1 == want._1 && g._2 == want._2 && g._4 == want._4, s"$day counts")
      assert(math.abs(g._3 - want._3) < 1e-9, s"$day purchase_value")
      // brute avg re-sums doubles in collect order — allow one 1e-4 step
      (g._5, want._5) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) <= 1e-4 + 1e-9, s"$day avg")
        case (a, b) => assert(a == b, s"$day avg nullness")
      }
    }
  }

  test("q_bit_ops equals driver-side AND/OR/XOR folds") {
    val got = Analytics.bitOps(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val raw = graft.Tables(spark, sf).events.select("event_type", "user_id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val brute = raw.groupBy(_._1).map { case (t, rs) =>
      val ids = rs.map(_._2)
      t -> ((ids.reduce(_ & _), ids.reduce(_ | _), ids.reduce(_ ^ _), ids.length.toLong))
    }
    assert(got == brute)
  }

  test("q_uniq_upto: exact below the cap, the N+1 sentinel above, never beyond") {
    val got = Analytics.uniqUpTo(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2)).toMap
    val exact = graft.Tables(spark, sf).events
      .selectExpr("event_type", "cast(ts as date) as day", "user_id").distinct()
      .collect().map(r => (r.getString(0), r.getDate(1).toString))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      assert(got(k) == math.min(n, 51L), s"$k: got ${got(k)}, exact $n")
    }
    assert(got.values.forall(_ <= 51L))
  }

  test("q_transition_matrix: row-stochastic, and transitions total n_events - n_users") {
    val rows = Analytics.transitionMatrix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val e = graft.Tables(spark, sf).events
    val nEvents = e.count()
    val nUsers = e.select("user_id").distinct().count()
    assert(rows.map(_._3).sum == nEvents - nUsers,
      "every user contributes exactly (history - 1) transitions")
    rows.groupBy(_._1).foreach { case (from, rs) =>
      val p = rs.map(_._4).sum
      // each p rounds to 1e-4, so the row sum drifts by at most 25 steps
      assert(math.abs(p - 1.0) <= 25e-4, s"$from row sums to $p")
    }
    assert(rows.forall(r => r._4 > 0.0 && r._4 <= 1.0))
  }

  test("wh_mutation_update doubles exactly the victim's cents, surgically, by hard link") {
    val got = Warehouse.mutationUpdate(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val raw = graft.Tables(spark, sf).events
      .selectExpr("user_id", "event_type", "cast(round(value * 100) as bigint) as cents")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val victim = raw.map(_._1).filter(_ % 97 == 0).minOption.getOrElse(Long.MinValue)
    val brute = raw.groupBy(_._2).map { case (t, rs) =>
      t -> ((rs.length.toLong,
        rs.map(r => if (r._1 == victim) r._3 * 2 else r._3).sum))
    }
    assert(got == brute)
    val (total, rewritten) = Warehouse.updateCounts
    assert(rewritten >= 1 && rewritten < total, s"not surgical: $rewritten of $total")
    val (gen0, gen1) = Warehouse.updateGens
    def ino(p: java.nio.file.Path): Any =
      java.nio.file.Files.getAttribute(p, "unix:ino")
    val carried = gen1.toFile.listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(carried.length == total - rewritten)
    carried.foreach { f =>
      assert(ino(f.toPath) == ino(gen0.resolve(f.getName)),
        s"${f.getName} was copied, not hard-linked")
    }
  }

  test("pipeline_length_buckets: caps are tight powers of two and masses reconcile") {
    val got = Pipeline.lengthBuckets(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val perDoc = TextAnalysis.tokens(spark, sf).select("doc_id", "n_tokens")
      .collect().map(_.getLong(1))
    def cap(n: Long): Long = {
      var c = 1L; while (c < math.max(n, 1L)) c *= 2; c
    }
    val brute = perDoc.groupBy(cap).map { case (c, ns) =>
      c -> ((ns.length.toLong, ns.sum, ns.map(c - _).sum))
    }
    assert(got == brute)
    // tightness: a doc never lands in a bucket it underfills by 2x
    got.keys.foreach(c => assert((c & (c - 1)) == 0, s"$c is not a power of two"))
    assert(got.values.map(_._2).sum == perDoc.sum)
  }

  test("text_edit_distance equals a reference Levenshtein over all 300 pairs") {
    val got = TextAnalysis.editDistancePairs(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    def lev(a: String, b: String): Long = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length).toLong
    }
    val names = graft.Tables(spark, sf).nation.select("n_name")
      .collect().map(_.getString(0)).sorted
    val want = (for (a <- names; b <- names if a < b) yield (a, b) -> lev(a, b)).toMap
    assert(got == want)
    assert(got.size == names.length * (names.length - 1) / 2)
  }

  test("text_hashed_bow: per-doc masses equal token counts, dims stay in [0, 64)") {
    val got = TextAnalysis.hashedBow(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.forall(r => r._2 >= 0 && r._2 < 64))
    assert(got.forall(_._3 > 0))
    val mass = got.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val want = TextAnalysis.tokens(spark, sf).select("doc_id", "n_tokens")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mass == want.filter(_._2 > 0))
    // the hash actually spreads: exactly the vocabulary's md5-dim image
    // is populated (this corpus' ~31-word vocabulary can't fill 64 dims)
    val vocabDims = graft.Tables(spark, sf).documents
      .selectExpr(s"explode(${TextAnalysis.tokensExpr}) as tok").distinct()
      .selectExpr("cast(conv(substring(md5(tok), 1, 2), 16, 10) as bigint) % 64 as dim")
      .collect().map(_.getLong(0)).toSet
    assert(got.map(_._2).toSet == vocabDims)
    assert(vocabDims.size > 16, "hash collapsed onto few dims")
  }
}
