package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {

  test("user streaks match a brute-force recomputation from the distinct day calendar") {
    val got = Analytics.userStreaks(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val days = graft.Tables(spark, sf).events
      .selectExpr("user_id", "CAST(to_date(ts) AS STRING) AS day").distinct()
      .collect().map(r => (r.getLong(0), java.time.LocalDate.parse(r.getString(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2.toEpochDay).sorted).toMap
    assert(got.keySet == days.keySet)
    days.foreach { case (u, ds) =>
      var streaks = List.empty[Long]
      var cur = 1L
      ds.sliding(2).foreach {
        case Array(a, b) => if (b == a + 1) cur += 1 else { streaks ::= cur; cur = 1 }
        case _ => // single-day user: the trailing prepend below covers it
      }
      streaks ::= cur
      assert(got(u) == ((ds.length.toLong, streaks.length.toLong, streaks.max)),
        s"user $u: got ${got(u)} expected (${ds.length}, ${streaks.length}, ${streaks.max})")
    }
  }

  test("approx_count_distinct stays within 5% of the exact distinct count") {
    Analytics.approxDistinct(spark, sf).collect().foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"${r.getAs[String]("event_type")}: approx=$approx exact=$exact")
    }
  }

  test("approx_percentile stays within 5% of the exact interpolated quantiles") {
    Analytics.approxQuantiles(spark, sf).collect().foreach { r =>
      Seq(("p50_approx", "p50_exact"), ("p90_approx", "p90_exact")).foreach { case (a, e) =>
        val approx = r.getAs[Double](a)
        val exact = r.getAs[Double](e)
        assert(math.abs(approx - exact) / math.max(exact, 1e-9) <= 0.05,
          s"${r.getAs[String]("event_type")} $a=$approx vs $e=$exact")
      }
    }
  }

  test("as-of join only ever pairs a purchase with an EARLIER error of the same user") {
    val events = graft.Tables(spark, sf).events
      .select(col("event_id"), col("user_id"), col("event_type"), unix_micros(col("ts")).as("tus"))
    val byId = events.collect().map(r => r.getLong(0) -> r).toMap
    Analytics.asofJoin(spark, sf).collect().foreach { r =>
      if (!r.isNullAt(2)) {
        val purchase = byId(r.getLong(0))
        val error = byId(r.getLong(2))
        assert(error.getString(2) == "error")
        assert(error.getLong(1) == purchase.getLong(1))
        assert(error.getLong(3) <= purchase.getLong(3))
      }
    }
  }

  test("heavy-hitters sketch equals the exact ranked top-10 at this vocabulary size") {
    val sketch = Analytics.heavyHitters(spark, sf)
      .orderBy("rnk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Long]("rnk")))
    assert(sketch.length == 10)
    assert(sketch.map(_._3).toSeq == (1L to 10L), "ranks must be 1..10")
    val exact = Analytics.topTerms(spark, sf)
      .orderBy(col("cf").desc, col("term")).limit(10).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("cf"))
    // tracker capacity covers the vocabulary, so counts are exact and the
    // deterministic re-rank makes the whole ranked list equal — the same
    // equality the SQL oracle checks
    assert(sketch.map(t => (t._1, t._2)).toSeq == exact.toSeq,
      s"sketch=${sketch.toSeq} exact=${exact.toSeq}")
  }

  test("window funnel levels partition the signup cohort") {
    val lvls = Analytics.windowFunnel(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val signups = graft.Tables(spark, sf).events
      .filter(col("event_type") === "signup").select("user_id").distinct().count()
    assert(lvls.keySet.subsetOf(Set(1L, 2L, 3L)))
    assert(lvls.values.sum == signups, s"levels $lvls must cover all $signups signup users")
  }

  test("streaming dedup drops replayed event_ids within the watermark") {
    import graft.streaming.EventPipeline.RawEvent
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[RawEvent]
    val deduped = input.toDF()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      val t0 = 1700000000000L
      def ev(id: Long, off: Long) =
        RawEvent(id, new java.sql.Timestamp(t0 + off), 1, "click", 1.0, "{}")
      input.addData(ev(1, 0), ev(2, 1000), ev(1, 2000)) // replayed id=1
      q.processAllAvailable()
      input.addData(ev(2, 3000), ev(3, 4000)) // replayed id=2 in a later batch
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select("event_id").collect().map(_.getLong(0))
      assert(ids.sorted.toSeq == Seq(1L, 2L, 3L), s"got ${ids.toSeq}")
    } finally q.stop()
  }

  test("gap filling yields the dense type x day grid with zeros exactly where no events fall") {
    val e = graft.Tables(spark, sf).events
    val filled = Analytics.fillGaps(spark, sf)
    val rows = filled.collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> ((r.getLong(2), r.getLong(3)))).toMap

    val nTypes = e.select("event_type").distinct().count()
    val bounds = e.agg(org.apache.spark.sql.functions.min(col("ts").cast("date")),
      org.apache.spark.sql.functions.max(col("ts").cast("date"))).collect()(0)
    val nDays = java.time.temporal.ChronoUnit.DAYS.between(
      bounds.getDate(0).toLocalDate, bounds.getDate(1).toLocalDate) + 1
    assert(rows.size == nTypes * nDays,
      s"grid must be dense: ${rows.size} rows vs $nTypes types x $nDays days")

    // the non-zero cells equal the plain daily aggregate; every other cell is (0, 0)
    val daily = e.groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(round(value * 100) as bigint)")).as("c"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString) -> ((r.getLong(2), r.getLong(3)))).toMap
    daily.foreach { case (k, v) => assert(rows(k) == v, s"filled cell $k diverged") }
    (rows.keySet -- daily.keySet).foreach { k =>
      assert(rows(k) == ((0L, 0L)), s"gap cell $k must be an explicit zero row")
    }
  }

  test("event gaps telescope: n_gaps = n-1 and sum of gaps = last - first per user") {
    val gaps = Analytics.eventGaps(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val spans = graft.Tables(spark, sf).events
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        org.apache.spark.sql.functions.min(unix_micros(col("ts"))).as("t0"),
        org.apache.spark.sql.functions.max(unix_micros(col("ts"))).as("t1"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // users with a single event have no gap row at all
    assert(gaps.keySet == spans.filter(_._2._1 > 1).keySet)
    gaps.foreach { case (u, (nGaps, maxGap, sumGap)) =>
      val (n, t0, t1) = spans(u)
      assert(nGaps == n - 1, s"user $u: $nGaps gaps for $n events")
      assert(sumGap == t1 - t0, s"user $u: gaps must telescope to the span")
      assert(maxGap <= sumGap && maxGap >= (sumGap + nGaps - 1) / nGaps,
        s"user $u: max gap $maxGap outside [avg, sum] of $sumGap over $nGaps")
    }
  }

  test("salted skew join plans as a salted shuffle join and equals the plain join exactly") {
    val df = Analytics.skewJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"the hint must hold a shuffle join (the salt is dead code under broadcast):\n${plan.take(600)}")
    assert(!plan.contains("BroadcastHashJoin"), "dim side must not broadcast in this demonstration")
    assert(plan.contains("salt"), "join keys must carry the salt")
    val got = df.collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    // the unsalted reference join (broadcast allowed — semantics only)
    val e = graft.Tables(spark, sf).events
      .select(col("event_type"), to_date(col("ts")).as("day"),
        expr("cast(round(value * 100) as bigint)").as("v_cents"))
    val dim = graft.Tables(spark, sf).events
      .groupBy("event_type")
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("s"), count(lit(1)).as("n"))
    val plain = e.join(dim, Seq("event_type"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n_events"),
        sum(abs(col("v_cents") * col("n") - col("s"))).as("dev_scaled"),
        max("n").as("type_n"))
      .select(col("event_type"), col("day"), col("n_events"), col("dev_scaled"),
        (col("dev_scaled").cast("double") /
          (col("n_events") * col("type_n")).cast("double") / lit(100.0)).as("mad_value"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(got == plain, "salting changed the join result")
  }

  test("bucketed range join avoids nested-loop and equals the plain BETWEEN join") {
    val df = Analytics.rangeJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"the bucketed rewrite must never plan a nested loop:\n${plan.take(600)}")
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    // the direct BETWEEN formulation over the same intervals (Spark plans
    // this as the nested loop the operator exists to avoid — fine at spec
    // scale, and the ground truth by definition)
    val e = graft.Tables(spark, sf).events
      .select(col("event_type"), col("ts"),
        expr("cast(round(value * 100) as bigint)").as("v_cents"))
    val bounds = e.agg(to_date(org.apache.spark.sql.functions.min("ts")).as("d0"),
      to_date(org.apache.spark.sql.functions.max("ts")).as("d1"))
    val intervals = e.select("event_type").distinct()
      .crossJoin(bounds)
      .select(col("event_type").as("i_type"),
        explode(expr("sequence(0L, cast(floor(datediff(d1, d0) / 7) as long))")).as("promo_id"),
        col("d0"))
      .select(col("i_type"), col("promo_id"),
        (expr("cast(date_add(d0, cast(promo_id * 7 as int)) as timestamp)")
          + expr("interval 6 hours")).as("t_start"))
      .withColumn("t_end", col("t_start") + expr("interval 36 hours"))
    val plain = e.join(intervals,
        col("event_type") === col("i_type") &&
          col("ts") >= col("t_start") && col("ts") < col("t_end"))
      .groupBy("event_type", "promo_id")
      .agg(count(lit(1)).as("n_events"), sum("v_cents").as("sum_cents"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == plain, "bucketed rewrite diverged from the BETWEEN join")
    assert(got.nonEmpty)
  }

  test("sliding 7-day distinct equals the brute-force per-day window recount") {
    val got = Analytics.slidingDistinct(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2))).toSet
    // brute force: for every (type, day) in span, re-count distinct users
    // across the trailing 7 days from the collected membership
    val m = graft.Tables(spark, sf).events
      .select(col("event_type"), col("ts").cast("date").as("day"), col("user_id"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val days = m.map(_._2)
    val (d0, d1) = (days.min, days.max)
    val brute = (for {
      t <- m.map(_._1).distinct
      d <- Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1))
      users = m.collect { case (`t`, md, u)
        if !md.isAfter(d) && md.isAfter(d.minusDays(7)) => u }.toSet
      if users.nonEmpty
    } yield (t, d.toString, users.size.toLong)).toSet
    assert(got == brute,
      s"extra=${got.diff(brute).take(5)} missing=${brute.diff(got).take(5)}")
  }

  test("percent rank is exactly (i-1)/(N-1) over the unique spend order, descending in spend") {
    val rows = Analytics.percentRank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val n = rows.length
    assert(n > 1)
    // under the unique (spend desc, custkey) order the ranks are a
    // permutation of 0/(N-1) .. (N-1)/(N-1), bit-exact
    val expected = (0 until n).map(i => i.toDouble / (n - 1).toDouble).toSet
    assert(rows.map(_._3).toSet == expected)
    // and the order is the declared one
    val sorted = rows.sortBy(_._3)
    sorted.sliding(2).foreach { case Array((ka, sa, _), (kb, sb, _)) =>
      assert(sa > sb || (sa == sb && ka < kb),
        s"rank order violated between customers $ka and $kb")
    }
  }

  test("deltaSum equals the brute-force sequential positive-delta recount") {
    val got = Analytics.deltaSum(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val rows = graft.Tables(spark, sf).events
      .selectExpr("event_type", "unix_micros(ts) as tus", "event_id",
        "cast(round(value * 100) as bigint) as cents").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val brute = rows.groupBy(_._1).map { case (t, rs) =>
      val ordered = rs.toSeq.sortBy(r => (r._2, r._3)).map(_._4)
      val ds = ordered.zip(ordered.drop(1))
        .map { case (a, b) => math.max(0L, b - a) }.sum
      (t, ds, ordered.length.toLong)
    }.toSet
    assert(got == brute, s"extra=${got.diff(brute)} missing=${brute.diff(got)}")
  }

  test("weighted quartiles equal the brute force and embed the median key") {
    val got = Analytics.quantilesExactWeighted(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val rows = graft.Tables(spark, sf).lineitem
      .selectExpr("l_returnflag",
        "cast(round(l_extendedprice * 100) as bigint) as cents",
        "cast(round(l_quantity) as bigint) as qty").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val brute = rows.groupBy(_._1).flatMap { case (f, rs) =>
      val expanded = rs.toSeq.flatMap { case (_, c, q) => Seq.fill(q.toInt)(c) }.sorted
      val total = expanded.length.toLong
      // lower quantile at k/4 == element at ceil(k*total/4) of the sort
      (1L to 3L).map(k => (f, k, total, expanded(((k * total + 3) / 4 - 1).toInt)))
    }.toSet
    assert(got == brute, s"extra=${got.diff(brute)} missing=${brute.diff(got)}")
    // the level-2 slice IS the median key's contract
    val median = Analytics.quantileExactWeighted(spark, sf).collect()
      .map(r => (r.getString(0), 2L, r.getLong(1), r.getLong(2))).toSet
    assert(got.filter(_._2 == 2L) == median)
  }

  test("rank correlation equals the brute-force average-rank Spearman") {
    val got = Analytics.rankCorr(spark, sf).collect().head
    val rows = graft.Tables(spark, sf).lineitem
      .selectExpr("cast(round(l_quantity) as bigint) as x",
        "cast(round(l_extendedprice * 100) as bigint) as y").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def avgRanks(vs: Seq[Long]): Map[Long, Double] = {
      val sorted = vs.sorted
      sorted.zipWithIndex.groupBy(_._1)
        .map { case (v, ps) => v -> (ps.map(_._2 + 1.0).sum / ps.size) }
    }
    val rx = avgRanks(rows.map(_._1).toSeq)
    val ry = avgRanks(rows.map(_._2).toSeq)
    val pairs = rows.map { case (x, y) => (rx(x), ry(y)) }
    val n = pairs.length.toDouble
    val (mx, my) = (pairs.map(_._1).sum / n, pairs.map(_._2).sum / n)
    val num = pairs.map { case (a, b) => (a - mx) * (b - my) }.sum
    val den = math.sqrt(pairs.map(p => (p._1 - mx) * (p._1 - mx)).sum) *
      math.sqrt(pairs.map(p => (p._2 - my) * (p._2 - my)).sum)
    assert(got.getLong(0) == rows.length.toLong)
    assert(math.abs(got.getDouble(1) - num / den) < 5e-4,
      s"got ${got.getDouble(1)} brute ${num / den}")
  }

  test("max intersections equals the brute-force daily open-interval sweep") {
    val r = Analytics.maxIntersections(spark, sf).collect().head
    val t = graft.Tables(spark, sf)
    val ivs = t.lineitem.select(col("l_orderkey"), col("l_shipdate"))
      .join(t.orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .selectExpr("to_date(o_orderdate)", "to_date(l_shipdate)").collect()
      .map(x => (x.getDate(0).toLocalDate, x.getDate(1).toLocalDate))
    val deltas = scala.collection.mutable.TreeMap.empty[java.time.LocalDate, Long]
    ivs.foreach { case (s, e) =>
      deltas(s) = deltas.getOrElse(s, 0L) + 1
      val e1 = e.plusDays(1)
      deltas(e1) = deltas.getOrElse(e1, 0L) - 1
    }
    var open = 0L; var peak = -1L; var peakDay: java.time.LocalDate = null
    deltas.foreach { case (day, d) =>
      open += d
      if (open > peak) { peak = open; peakDay = day }
    }
    assert(r.getLong(0) == peak, s"peak ${r.getLong(0)} vs $peak")
    assert(r.getDate(1).toLocalDate == peakDay,
      s"day ${r.getDate(1)} vs $peakDay")
    // both ±1 deltas come out of ONE pass over the joined rows — the
    // lineage must hold exactly one Join (a union of per-delta branches
    // would expand the lineitem-orders join twice in the plan tree).
    // The ANALYZED plan is the right probe: prefixSummed caches the
    // deltas frame, so by optimization time the join hides inside an
    // InMemoryRelation
    val joins = Analytics.maxIntersections(spark, sf)
      .queryExecution.analyzed.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
    assert(joins.length == 1, s"expected 1 join, plan has ${joins.length}")
  }

  test("auc equals the brute-force pairwise win/half-tie count") {
    val r = Analytics.auc(spark, sf).collect().head
    val rows = graft.Tables(spark, sf).events
      .selectExpr("cast(round(value * 100) as bigint) as s",
        "event_type = 'purchase' as l")
      .collect().map(x => (x.getLong(0), x.getBoolean(1)))
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    // the definitional O(P*N) comparison: a pair scores 1 when the
    // positive outranks the negative, 0.5 on a tie
    var wins2 = 0L
    pos.foreach { p =>
      neg.foreach { n => if (p > n) wins2 += 2 else if (p == n) wins2 += 1 }
    }
    val brute = wins2.toDouble / (2.0 * pos.length * neg.length)
    assert(r.getLong(1) == pos.length.toLong && r.getLong(2) == neg.length.toLong)
    assert(math.abs(r.getDouble(0) - brute) < 1e-4,
      s"auc ${r.getDouble(0)} vs brute $brute")
    assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
  }

  test("entropy matches the plain-double Shannon recount and its bounds") {
    val got = Analytics.entropy(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val rows = graft.Tables(spark, sf).events
      .select(col("event_type"), col("user_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val counts = rs.groupBy(_._2).values.map(_.size.toDouble)
      val n = rs.size.toDouble
      val h = (math.log(n) - counts.map(c => c * math.log(c)).sum / n) / math.log(2)
      val (gn, gv, gh) = (got(t)._1, got(t)._2, got(t)._3)
      assert(gn == rs.size.toLong && gv == counts.size.toLong)
      assert(math.abs(gh - h) < 1e-3, s"$t: $gh vs $h")
      // the operator rounds to 4 decimals (after 1e-6 log2 quantization),
      // so the reported value may exceed the true bound by up to ~5.05e-5
      assert(gh >= -6e-5 && gh <= math.log(counts.size.toDouble) / math.log(2) + 6e-5)
    }
  }

  test("cramers V matches the plain-double chi-square recount, inside [0,1]") {
    val r = Analytics.cramersV(spark, sf).collect().head
    val rows = graft.Tables(spark, sf).events
      .select(col("event_type"), dayofweek(col("ts")).cast("long")).collect()
      .map(x => (x.getString(0), x.getLong(1)))
    val n = rows.length.toDouble
    val cell = rows.groupBy(identity).view.mapValues(_.size.toDouble)
    val ri = rows.groupBy(_._1).view.mapValues(_.size.toDouble)
    val cj = rows.groupBy(_._2).view.mapValues(_.size.toDouble)
    val chi2 = cell.map { case ((t, d), o) =>
      val e = ri(t) * cj(d) / n; (o - e) * (o - e) / e
    }.sum
    val v = math.sqrt(chi2 / (n * (math.min(ri.size, cj.size) - 1)))
    assert(r.getLong(0) == rows.length.toLong)
    assert(math.abs(r.getDouble(1) - chi2) < 1e-2, s"chi2 ${r.getDouble(1)} vs $chi2")
    assert(math.abs(r.getDouble(2) - v) < 1e-3)
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
  }

  test("welch t equals the plain-double recount from raw cents") {
    val r = Analytics.welchTTest(spark, sf).collect().head
    val rows = graft.Tables(spark, sf).events
      .filter(col("event_type").isin("purchase", "view"))
      .selectExpr("event_type", "cast(round(value * 100) as bigint)").collect()
      .map(x => (x.getString(0), x.getLong(1)))
    def stats(t: String) = {
      val vs = rows.filter(_._1 == t).map(_._2.toDouble)
      val m = vs.sum / vs.length
      (vs.length.toDouble, m, vs.map(x => (x - m) * (x - m)).sum / (vs.length - 1))
    }
    val (n1, m1, v1) = stats("purchase"); val (n2, m2, v2) = stats("view")
    val t = (m1 - m2) / math.sqrt(v1 / n1 + v2 / n2)
    assert(r.getLong(0) == n1.toLong && r.getLong(1) == n2.toLong)
    assert(math.abs(r.getDouble(2) - t) < 1e-3, s"t ${r.getDouble(2)} vs $t")
  }

  test("weighted median equals the brute-force expand-and-pick recount") {
    val got = Analytics.quantileExactWeighted(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    // ground truth: literally expand each price by its weight and take
    // the lower median element of the sorted multiset
    val rows = graft.Tables(spark, sf).lineitem
      .selectExpr("l_returnflag",
        "cast(round(l_extendedprice * 100) as bigint) as cents",
        "cast(round(l_quantity) as bigint) as qty").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val brute = rows.groupBy(_._1).map { case (f, rs) =>
      val expanded = rs.toSeq.flatMap { case (_, c, q) => Seq.fill(q.toInt)(c) }.sorted
      val total = expanded.length.toLong
      // lower weighted median: min value whose cumulative count doubles
      // past the total == element at ceil(total/2) of the expanded sort
      (f, total, expanded(((total + 1) / 2 - 1).toInt))
    }.toSet
    assert(got == brute, s"extra=${got.diff(brute)} missing=${brute.diff(got)}")
  }

  test("sequence match equals the brute-force ordered-subsequence scan") {
    val got = Analytics.sequenceMatch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // brute force: sort each user's full timeline and greedily walk the
    // signup -> view -> purchase pattern with strict >
    val events = graft.Tables(spark, sf).events
      .filter(col("event_type").isin("signup", "view", "purchase"))
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tus"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val brute = events.groupBy(_._1).collect {
      case (u, rows) if rows.exists(_._2 == "signup") =>
        val sorted = rows.sortBy(_._3)
        val t1 = rows.filter(_._2 == "signup").map(_._3).min
        val matched = {
          val t2 = sorted.collectFirst { case (_, "view", t) if t > t1 => t }
          t2.exists(v => sorted.exists { case (_, ty, t) => ty == "purchase" && t > v })
        }
        (u, if (matched) 1L else 0L, t1)
    }.toSet
    assert(got == brute, s"extra=${got.diff(brute).take(5)} missing=${brute.diff(got).take(5)}")
    // non-degenerate: the pattern fires somewhere (this corpus's
    // timelines are dense enough that every signup user may match —
    // the brute-force equality above is the real check)
    assert(got.exists(_._2 == 1L), "expected at least one matched user")
  }

  test("url normalization strips exactly the tracking params and keeps hosts stable") {
    val rows = TextAnalysis.urlNormalize(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 5, "five hosts by construction")
    assert(rows.map(_._2).sum == 50000L, "every generated url lands in exactly one host")
    // i%3, i%5, i%11 tracking coverage: of 10000 urls per host, those
    // hitting none of the three moduli carry no tracking params
    rows.foreach { case (host, n, uniq, tracked) =>
      assert(tracked > 0 && tracked < n, s"$host: tracking must be partial, got $tracked/$n")
      assert(uniq <= n, s"$host: unique clean urls cannot exceed total")
    }
  }

  test("LOCF interpolation carries the last observed total, zero before first observation") {
    val got = Analytics.interpolateFill(spark, sf).collect()
      .map(r => ((r.getString(0), r.getDate(1).toString), (r.getLong(2), r.getLong(3)))).toMap
    // brute force over the (oracle-proven) dense grid
    val base = Analytics.fillGaps(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getLong(3)))
    val brute = base.groupBy(_._1).toSeq.flatMap { case (t, rows) =>
      var lastV = 0L
      rows.toSeq.sortBy(_._2).map { case (_, d, n, s) =>
        if (n > 0) lastV = s
        ((t, d), (if (n > 0) 1L else 0L, lastV))
      }
    }.toMap
    assert(got == brute, s"diff=${got.toSet.diff(brute.toSet).take(5)}")
    // (no gap-exists assertion: the sf0.001 grid is DENSE — every
    // type x day cell observed — so the carry path is exercised by the
    // brute-force equality above and by the oracle at larger SFs, not
    // by demanding sparsity the corpus doesn't have)
    assert(got.keySet.map(_._1).size >= 2 && got.nonEmpty)
  }

  test("cohort matrix equals the brute-force first-week/offset recount") {
    val got = Analytics.cohortMatrix(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet

    // brute force off the raw rows: ISO-Monday week per event, first week
    // per user, distinct (cohort, offset) user counts
    val m = graft.Tables(spark, sf).events
      .select(col("user_id"), to_date(col("ts")).as("d")).collect()
      .map { r =>
        val day = r.getDate(1).toLocalDate
        (r.getLong(0), day.minusDays((day.getDayOfWeek.getValue - 1).toLong))
      }.distinct
    val cohort = m.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val brute = m.map { case (u, wk) =>
      val c = cohort(u)
      (c.toString, java.time.temporal.ChronoUnit.DAYS.between(c, wk) / 7, u)
    }.distinct.groupBy(t => (t._1, t._2)).map { case ((c, o), us) => (c, o, us.length.toLong) }.toSet
    assert(got == brute, s"extra=${got.diff(brute).take(5)} missing=${brute.diff(got).take(5)}")

    // offset 0 always holds the full cohort: every user is active in
    // their own first week by definition
    val zero = got.filter(_._2 == 0L).map(t => t._1 -> t._3).toMap
    val cohortSizes = cohort.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      .map { case (k, v) => k.toString -> v }
    assert(zero == cohortSizes, "week-0 row must count the whole cohort")
  }

  test("zipf fit matches a driver-side recompute of the same quantized regression") {
    val row = TextAnalysis.zipfFit(spark, sf).collect()(0)
    val (n, slope, intercept) = (row.getLong(0), row.getDouble(1), row.getDouble(2))

    // recompute from the cf distribution with the IDENTICAL arithmetic
    // (same JVM Math.log, same quantization, same double chain)
    val cf = graft.Tables(spark, sf).documents
      .select(explode(expr(TextAnalysis.tokensExpr)).as("t"))
      .groupBy("t").agg(count(lit(1)).as("cf"))
      .collect().map(_.getLong(1)).sortBy(-_)
    assert(n == cf.length.toLong)
    val q = cf.zipWithIndex.map { case (c, i) =>
      (math.floor(math.log((i + 1).toDouble) * 10000 + 0.5).toLong,
        math.floor(math.log(c.toDouble) * 10000 + 0.5).toLong)
    }
    val (sx, sy) = (q.map(_._1).sum, q.map(_._2).sum)
    val sxx = q.map { case (x, _) => BigInt(x) * BigInt(x) }.sum
    val sxy = q.map { case (x, y) => BigInt(x) * BigInt(y) }.sum
    val nn = q.length.toDouble
    val s = (nn * sxy.toDouble - sx.toDouble * sy.toDouble) /
      (nn * sxx.toDouble - sx.toDouble * sx.toDouble)
    assert(slope == math.floor(s * 1e4 + 0.5) / 1e4,
      s"slope $slope != recomputed ${math.floor(s * 1e4 + 0.5) / 1e4}")
    assert(intercept == math.floor((sy.toDouble - s * sx.toDouble) / nn + 0.5) / 1e4)
    // cf is non-increasing in rank, so unless frequencies are constant the
    // fit MUST slope down. (No "natural-text band" assertion: the
    // synthetic corpus has near-uniform frequencies — slope ≈ -0.18 here,
    // where real text sits near -1; the operator measures, not assumes.)
    assert(slope < 0.0, s"zipf fit must slope down, got $slope")
  }
}
