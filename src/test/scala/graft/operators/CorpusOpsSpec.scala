package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Cross-checks for the round-5 corpus-hygiene operators: invariants the
  * DuckDB oracle equality cannot express (plan shapes, driver-side
  * recomputation from raw rows, structural no-gap properties). */
class CorpusOpsSpec extends SparkSpec {

  private def md5Bucket(id: Long): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    Integer.parseInt(hex.substring(0, 1), 16)
  }

  test("shard assignment matches the local md5 recomputation with dense per-shard positions") {
    val rows = Pipeline.shard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // brute-force expectation: md5-bucket mod 8 shard, per-shard
    // row_number along the (md5 hex, doc_id) order
    def hex(id: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = rows.map(_._1).map { id =>
      val h = hex(id)
      (id, (Integer.parseInt(h.substring(0, 2), 16) % 8).toLong, h)
    }.groupBy(_._2).flatMap { case (_, docs) =>
      docs.sortBy(d => (d._3, d._1)).zipWithIndex.map { case ((id, s, _), i) =>
        (id, s, i + 1L)
      }.toSeq
    }.toSet
    assert(rows.toSet == expected,
      s"diff: ${rows.toSet.diff(expected).take(3)} / ${expected.diff(rows.toSet).take(3)}")
    // positions are dense 1..cnt inside every shard, all 8 shards populated
    val byShard = rows.groupBy(_._2)
    assert(byShard.keySet == (0L to 7L).toSet)
    byShard.values.foreach { docs =>
      assert(docs.map(_._3).sorted.toSeq == (1L to docs.length).toSeq)
    }
  }

  test("decontaminate probes the benchmark set via broadcast and flags consistently") {
    val df = Pipeline.decontaminate(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"benchmark shingle set should broadcast, got:\n${plan.take(600)}")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(md5Bucket(r.getLong(0)) != 15,
        s"doc ${r.getLong(0)} is in the benchmark bucket but appeared as a training doc")
      assert((r.getLong(1) == 0) == (r.getLong(2) == 1L),
        "is_clean must be exactly n_shared == 0")
    }
    // the word-soup corpus shares trigrams heavily: both outcomes occur
    assert(rows.exists(_.getLong(2) == 1L) && rows.exists(_.getLong(2) == 0L),
      "expected a mix of clean and contaminated docs on this corpus")
  }

  test("pack lays documents end to end: no gaps, no overlaps, spans consistent") {
    val rows = Pipeline.pack(spark, sf).orderBy("doc_id").collect()
    var nextOffset = 0L
    rows.foreach { r =>
      val (nTok, off, s0, s1, n) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(off == nextOffset, s"doc ${r.getLong(0)}: offset $off, expected $nextOffset")
      nextOffset += nTok
      assert(s0 == off / 512 && s1 == (off + nTok - 1) / 512 && n == s1 - s0 + 1)
    }
  }

  test("corrStats equals an independent driver-side computation from raw rows") {
    val got = Analytics.corrStats(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(4))).toMap
    val raw = graft.Tables(spark, sf).lineitem
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1)), math.round(r.getDouble(2) * 100)))
      .groupBy(_._1)
    raw.foreach { case (flag, xs) =>
      val n = xs.size.toDouble
      val sx = xs.map(_._2).sum.toDouble
      val sy = xs.map(_._3).sum.toDouble
      val sxx = xs.map(t => t._2 * t._2).sum.toDouble
      val syy = xs.map(t => BigInt(t._3) * BigInt(t._3)).sum.toDouble
      val sxy = xs.map(t => t._2 * t._3).sum.toDouble
      val corr = (n * sxy - sx * sy) / (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val (gn, gcorr, gslope) = got(flag)
      assert(gn == xs.size.toLong)
      assert(math.abs(gcorr - corr) < 5e-4, s"$flag corr: got $gcorr, raw $corr")
      assert(math.abs(gslope - slope) < 5e-4, s"$flag slope: got $gslope, raw $slope")
    }
  }

  test("gram_stats matches brute force; repetition plans with zero shuffles") {
    import spark.implicits._
    graft.GraftSession.registerFunctions(spark)
    val got = Seq("a b a b a", "x", "", "a a a a").toDF("text")
      .withColumn("tk", expr(TextAnalysis.tokensExpr))
      .select(expr("gram_stats(tk, 1)").as("u"), expr("gram_stats(tk, 2)").as("b"))
      .collect()
      .map(r => (Seq(0, 1, 2).map(r.getStruct(0).getLong), Seq(0, 1, 2).map(r.getStruct(1).getLong)))
    assert(got(0) == ((Seq(5L, 2L, 3L), Seq(4L, 2L, 2L)))) // a b a b a
    assert(got(1) == ((Seq(1L, 1L, 1L), Seq(0L, 0L, 0L)))) // x: no bigram
    assert(got(2) == ((Seq(0L, 0L, 0L), Seq(0L, 0L, 0L)))) // empty
    assert(got(3) == ((Seq(4L, 1L, 4L), Seq(3L, 1L, 3L)))) // a a a a
    // per-doc stats are map-side: no aggregation exchange anywhere (the
    // only exchange allowed is the gated round-robin scatter of the scan)
    val plan = TextAnalysis.repetition(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"),
      s"repetition should not shuffle, got:\n${plan.take(800)}")
  }

  test("repetition ratios are exactly their integer numerators divided out") {
    val rows = TextAnalysis.repetition(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, uTok, topTok) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (nBig, uBig, topBig) = (r.getLong(5), r.getLong(6), r.getLong(7))
      assert(uTok <= nTok && topTok <= nTok && topTok >= 1 && uTok >= 1)
      assert(nBig == nTok - 1, "a doc with n tokens has exactly n-1 bigrams")
      assert(uBig <= nBig && topBig <= nBig)
      assert(r.getDouble(4) == math.floor((nTok - uTok).toDouble / nTok * 1e4 + 0.5) / 1e4 ||
        math.abs(r.getDouble(4) - (nTok - uTok).toDouble / nTok) < 1e-4)
    }
    // vocab-31 word soup: duplicate tokens are everywhere
    assert(rows.count(_.getDouble(4) > 0) > rows.length / 2)
  }

  test("split is a stratified partition: exhaustive, disjoint, hash-stable") {
    val rows = Pipeline.split(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val total = graft.Tables(spark, sf).documents.count()
    // every doc assigned exactly once
    assert(rows.length.toLong == total)
    assert(rows.map(_._1).distinct.length == rows.length)
    // the assignment is the declared pure function of the doc id
    rows.foreach { case (id, _, b, s) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).take(1).map("%02x".format(_)).mkString
      val eb = "0123456789abcdef".indexOf(hex(0)) * 16L + "0123456789abcdef".indexOf(hex(1))
      assert(b == eb, s"doc $id bucket $b != md5-derived $eb")
      val es = if (b < 5) "test" else if (b < 13) "val" else "train"
      assert(s == es)
    }
    // each nonempty stratum keeps a train majority (rates hold per language)
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      if (rs.length >= 50)
        assert(rs.count(_._4 == "train") > rs.length / 2, s"$lang train minority")
    }
  }

  test("repeat upsample copies are dense per doc and hit the declared factors") {
    val rows = Pipeline.repeatUpsample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // per doc: copy_ord is exactly 1..n_copies
    rows.groupBy(_._1).foreach { case (id, rs) =>
      val n = rs.head._3
      assert(rs.map(_._4).sorted.toSeq == (1L to n), s"doc $id copies not dense")
    }
    // the upweighted stratum repeats 3 or 4 times, the rest exactly once
    rows.foreach { case (id, lang, n, _) =>
      if (lang == "unknown") assert(n == 3L || n == 4L, s"$id x$n")
      else assert(n == 1L, s"$id x$n")
    }
    // the key must not be vacuous: the corpus HAS an upweighted stratum
    assert(rows.exists(_._3 > 1L), "no doc was upsampled — stratum empty")
  }

  test("curriculum phases are best-first, monotone, and balanced in token mass") {
    val rows = Pipeline.curriculum(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
      .sortBy { case (docId, _, score, _, _) => (-score, docId) }
    val total = rows.map(_._2).sum
    // the prefix sum telescopes along the declared order...
    var cum = 0L
    rows.foreach { case (docId, nTok, _, cumTok, phase) =>
      cum += nTok
      assert(cumTok == cum, s"doc $docId: cum_tokens $cumTok != running $cum")
      // ...and the phase is exactly the declared arithmetic
      val expected = math.min(3L, math.max(cumTok - 1, 0L) * 4L / total)
      assert(phase == expected, s"doc $docId: phase $phase != $expected")
    }
    // phases are monotone non-decreasing along the order and all present
    assert(rows.map(_._5).sliding(2).forall(p => p.head <= p.last))
    assert(rows.map(_._5).distinct.sorted.toSeq == Seq(0L, 1L, 2L, 3L))
    // equal token mass per phase, within one document of total/4
    val mass = rows.groupBy(_._5).view.mapValues(_.map(_._2).sum)
    val maxDoc = rows.map(_._2).max
    mass.foreach { case (ph, m) =>
      assert(math.abs(m - total / 4) <= maxDoc,
        s"phase $ph mass $m deviates from ${total / 4} by more than one doc ($maxDoc)")
    }
  }
}
