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
}
