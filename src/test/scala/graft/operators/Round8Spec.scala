package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec

/** Round-8 invariants. Headliner: the `q_session_window` "runs unchanged
  * on a watermarked stream" claim, executed — the SAME
  * [[RefPipeline.sessionWindowCore]] function the batch key calls is run
  * over a MemoryStream with a watermark, and the closed sessions must
  * equal the batch result on the same rows. */
// top-level: Spark encoders cannot reach a case class nested in a suite
case class R8Ev(user_id: Long, value: Double, t: Timestamp)

class Round8Spec extends SparkSpec {

  private def ev(user: Long, sec: Long, value: Double): R8Ev =
    R8Ev(user, value, new Timestamp(sec * 1000))

  test("session_window aggregation runs unchanged on a watermarked stream") {
    import spark.implicits._
    val t0 = 1700000000L
    // user 1: an EXACTLY-30-min gap (touching windows MERGE — the split
    // rule is `> gap`, same as sessionize's lag formulation; this case is
    // what caught the `>=` the oracle used to claim) then a gap+1s split;
    // user 2: one session of three events
    val events = Seq(
      ev(1, t0, 1.0), ev(1, t0 + 60, 2.0),
      ev(1, t0 + 60 + 1800, 4.0), // exactly the gap: merges
      ev(1, t0 + 60 + 1800 + 1801, 8.0), // one past the gap: splits
      ev(2, t0 + 10, 1.5), ev(2, t0 + 20, 2.5), ev(2, t0 + 1700, 3.0))

    val batch = RefPipeline.sessionWindowCore(events.toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[R8Ev]
    // THE claim: the identical aggregation function, now over a stream
    val q = RefPipeline.sessionWindowCore(
        input.toDF().withWatermark("t", "10 seconds"))
      .writeStream.format("memory").queryName("r8_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(events)
      q.processAllAvailable()
      // advance the watermark past every session's end so they all close
      // (append mode only emits closed sessions); the flush event's own
      // session stays open and must NOT appear in the sink
      input.addData(ev(99, t0 + 1000000, 0.0))
      q.processAllAvailable()
      val streamed = spark.table("r8_sessions")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSet
      assert(streamed == batch,
        s"closed stream sessions must equal the batch result;\nstream=$streamed\nbatch=$batch")
      assert(batch.count(_._1 == 1L) == 2,
        "user 1: exact-gap event must MERGE, gap+1 event must SPLIT")
      assert(batch.exists(s => s._1 == 1L && s._4 == 3L),
        "the exact-gap event belongs to the first session (n_events = 3)")
      assert(batch.count(_._1 == 2L) == 1)
    } finally q.stop()
  }

  test("char_stats reproduces an independent driver-side recomputation") {
    val docs = graft.Tables(spark, sf).documents
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextAnalysis.charStats(spark, sf).collect()
    assert(got.length == docs.size)
    got.foreach { r =>
      val text = docs(r.getLong(0))
      val cps = text.codePoints().toArray
      assert(r.getLong(1) == cps.length.toLong, "n_chars")
      assert(r.getLong(2) == cps.count(cp =>
        (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')).toLong, "n_alpha")
      assert(r.getLong(3) == cps.count(_ == ' ').toLong, "n_space")
      val counts = cps.groupBy(identity).map { case (_, v) => v.length.toLong }
      assert(r.getLong(4) == counts.size.toLong, "n_uniq_chars")
      val entQ = counts.map(c => c * math.floor(
        StrictMath.log(cps.length.toDouble / c.toDouble) * 10000d + 0.5).toLong).sum
      val want = math.floor(entQ.toDouble / cps.length.toDouble + 0.5) / 1e4
      assert(r.getDouble(7) == want, s"char_entropy for doc ${r.getLong(0)}")
      // entropy of a per-doc char distribution is bounded by ln(n_uniq)
      assert(r.getDouble(7) >= 0.0 &&
        r.getDouble(7) <= StrictMath.log(counts.size.toDouble) + 1e-4)
    }
    // per-doc stats are map-side: no aggregation exchange anywhere (the
    // only exchange allowed is the gated round-robin scatter of the scan)
    val plan = TextAnalysis.charStats(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"),
      s"char_stats must not shuffle:\n${plan.take(600)}")
  }

  test("ref_points_by_house: generated wire lines parse to the hand-computed totals") {
    import graft.sources.EventsSource
    val n = 100000
    val houses = EventsSource.referenceHouses
    val want = (0 until n).groupBy(i => houses(i % houses.length))
      .map { case (h, is) => h -> is.map(i => ((i % 21) - 10).toLong).sum }
    val got = EventsSource.refPointsByHouse(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
    // the generated line IS the reference wire format: nested student
    // tuple present, timestamp at reference epoch + i hours
    val first = EventsSource.parseReference(
        EventsSource.syntheticReferenceLines(spark, 3))
      .orderBy("timestamp").collect()
    assert(first.head.getAs[java.sql.Timestamp]("timestamp").getTime == 1378022400000L)
    assert(first.head.getAs[org.apache.spark.sql.Row]("student")
      .getAs[String]("house") == "Gryffindor")
    assert(first.map(_.getAs[Byte]("points")).toSeq == Seq[Byte](-10, -9, -8))
  }

  test("emb_covariance reproduces a driver-side integer-moment recomputation") {
    val vecs = graft.Tables(spark, sf).embeddings
      .selectExpr("transform(embedding, x -> cast(floor(cast(x as double) * 10000 + 0.5) as bigint))")
      .collect().map(_.getSeq[Long](0).toArray)
    val n = vecs.length.toLong
    val d = vecs.head.length
    val got = Similarity.embCovariance(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(got.size == d * (d + 1) / 2)
    // spot-check a spread of pairs (full d^2/2 loop is slow in a test)
    for ((i, j) <- Seq((1, 1), (1, 2), (5, 40), (64, 64), (17, 17), (30, 64))) {
      val sI = vecs.map(_(i - 1)).sum
      val sJ = vecs.map(_(j - 1)).sum
      val sIJ = vecs.map(v => v(i - 1) * v(j - 1)).sum
      val r = got((i.toLong, j.toLong))
      assert(r.getLong(2) == n && r.getLong(3) == sI && r.getLong(4) == sJ &&
        r.getLong(5) == sIJ, s"moments mismatch at ($i,$j)")
      val cov = math.floor(((sIJ.toDouble - sI.toDouble * sJ.toDouble / n.toDouble)
        / n.toDouble) * 1e4 + 0.5) / 1e4
      assert(r.getDouble(6) == cov, s"cov mismatch at ($i,$j)")
    }
    // variance diagonal must be non-negative
    (1 to d).foreach(i => assert(got((i.toLong, i.toLong)).getDouble(6) >= 0.0))
  }

  test("q_audience_overlap reproduces a driver-side set-intersection recomputation") {
    val membership = graft.Tables(spark, sf).events
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val byType = membership.groupBy(_._1).map { case (t, s) => t -> s.map(_._2) }
    val got = Analytics.audienceOverlap(spark, sf).collect()
    val types = byType.keys.toSeq.sorted
    // every unordered pair with a non-empty intersection appears exactly once
    val expectPairs = (for {
      a <- types; b <- types if a < b
      inter = (byType(a) intersect byType(b)).size if inter > 0
    } yield (a, b) -> inter).toMap
    assert(got.length == expectPairs.size)
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val inter = expectPairs((a, b))
      assert(r.getLong(2) == inter.toLong)
      assert(r.getLong(3) == byType(a).size.toLong && r.getLong(4) == byType(b).size.toLong)
      val uni = (byType(a) union byType(b)).size
      assert(r.getDouble(5) ==
        math.floor(inter.toDouble / uni.toDouble * 10000 + 0.5) / 1e4)
    }
  }

  test("wh_orc_roundtrip: the ORC scan carries the pushed filter and pruned schema") {
    val qe = Warehouse.orcRoundtrip(spark, sf).queryExecution
    val plan = qe.executedPlan.toString
    assert(plan.contains("Format: ORC") || plan.contains("orc"),
      s"expected an ORC scan:\n${plan.take(600)}")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
      s"shipdate filter must reach the ORC scan:\n${plan.take(900)}")
    // pruning: the written file has 5 columns; the scan must not read l_orderkey
    assert(plan.contains("ReadSchema") && !plan.contains("l_orderkey"),
      s"unused column must be pruned from the ORC read:\n${plan.take(900)}")
  }

  test("char_stats agrees with a driver recomputation on arbitrary unicode strings") {
    import org.scalacheck.Gen
    import org.apache.spark.sql.functions.{col, expr}
    graft.GraftSession.registerFunctions(spark)
    val gen = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaChar.map(_.toString), 3 -> Gen.const(" "),
      2 -> Gen.choose('0', '9').map(_.toString),
      // incl. a supplementary code point (surrogate pair) and a tab
      1 -> Gen.oneOf("é", "ß", "中", "🙂", "\t"))).map(_.mkString)
    val samples = (1 to 40).flatMap(i => gen.sample) :+ "" :+ " " :+
      "🙂🙂🙂"
    import spark.implicits._
    val got = samples.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "text")
      .select(col("id"), expr("char_stats(text)").as("cs"))
      .select(col("id"), col("cs.n_chars"), col("cs.n_alpha"), col("cs.n_space"),
        col("cs.n_uniq"), col("cs.ent_q"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    samples.zipWithIndex.foreach { case (s, i) =>
      val cps = s.codePoints().toArray
      val counts = cps.groupBy(identity).map { case (_, v) => v.length.toLong }
      val entQ = if (cps.isEmpty) 0L else counts.map(c => c * math.floor(
        StrictMath.log(cps.length.toDouble / c.toDouble) * 10000d + 0.5).toLong).sum
      val want = (cps.length.toLong,
        cps.count(cp => (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')).toLong,
        cps.count(_ == ' ').toLong, counts.size.toLong, entQ)
      assert(got(i.toLong) == want, s"mismatch for ${s.take(30).mkString}")
    }
  }

  test("morton2 equals the bit-by-bit reference on arbitrary 32-bit keys") {
    import org.scalacheck.Gen
    import org.apache.spark.sql.functions.col
    def mortonRef(x: Long, y: Long): Long =
      (0 until 32).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val g = Gen.choose(0L, 0xFFFFFFFFL)
    val pairs = (1 to 100).flatMap(_ => (for { x <- g; y <- g } yield (x, y)).sample)
    import spark.implicits._
    val got = pairs.toDF("x", "y")
      .select(Warehouse.morton2(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == pairs.map { case (x, y) => mortonRef(x, y) })
  }

  test("q_decayed_sum reproduces a driver-side quantized-decay recomputation") {
    val rows = graft.Tables(spark, sf).events
      .selectExpr("user_id", "value", "unix_timestamp(ts) as t").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val tMax = rows.map(_._3).max
    val want = rows.groupBy(_._1).map { case (u, es) =>
      u -> (es.length.toLong, es.map { case (_, v, t) =>
        math.floor(v * StrictMath.exp(-(tMax - t).toDouble / 86400.0) * 10000 + 0.5).toLong
      }.sum)
    }
    val got = Analytics.decayedSum(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.size == want.size)
    want.foreach { case (u, (n, sq)) =>
      val (gn, gsq, gval) = got(u)
      assert(gn == n && gsq == sq, s"user $u: ($gn,$gsq) != ($n,$sq)")
      assert(gval == sq.toDouble / 10000.0)
    }
    // decay sanity: the decayed value can exceed the raw sum only by the
    // half-up quantization slack (≤ 5e-5 per event), never materially
    rows.groupBy(_._1).foreach { case (u, es) =>
      assert(got(u)._3 <= es.map(_._2).sum + 5e-5 * es.length + 1e-6)
    }
  }

  test("emb_pca: orthonormal rotation, descending variance, components match eigenvalues") {
    // driver-side ground truth from the same exact quantized moments
    val vecs = graft.Tables(spark, sf).embeddings
      .selectExpr("transform(embedding, x -> cast(floor(cast(x as double) * 10000 + 0.5) as bigint))")
      .collect().map(_.getSeq[Long](0).toArray)
    val n = vecs.length.toDouble
    val d = vecs.head.length
    val s = Array.tabulate(d)(i => vecs.map(_(i)).sum)
    val cov = Array.tabulate(d, d)((i, j) =>
      (vecs.map(v => v(i) * v(j)).sum.toDouble - s(i).toDouble * s(j).toDouble / n) / n)
    val (vals, rot) = Similarity.jacobiEigen(cov)
    // eigenvalues descending and non-negative (covariance is PSD)
    vals.sliding(2).foreach { case Array(a, b) => assert(a >= b - 1e-6); case _ => () }
    assert(vals.forall(_ >= -1e-6))
    // eigenvectors orthonormal: V V^T = I
    for (a <- 0 until d; b <- a until d) {
      val dot = (0 until d).map(i => rot(a)(i) * rot(b)(i)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-8, s"V not orthonormal at ($a,$b)")
    }
    // eigen-decomposition really diagonalizes cov: V cov V^T diag == eigenvalues
    for (a <- 0 until 8) {
      val q = (0 until d).map(i => (0 until d).map(j => rot(a)(j) * cov(j)(i)).sum)
      val lam = (0 until d).map(i => q(i) * rot(a)(i)).sum
      assert(math.abs(lam - vals(a)) <= 1e-6 * math.max(1.0, math.abs(vals(a))))
    }
    // the distributed projection: per-component empirical variance equals
    // the eigenvalue (in original units: eigenvalue / 1e8), descending
    val pcs = Similarity.pcaProject(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1).values.map(_.sortBy(_._2).map(_._3)).toArray
    assert(pcs.length == vecs.length && pcs.head.length == 8)
    val vars = (0 until 8).map { c =>
      val xs = pcs.map(_(c))
      val mu = xs.sum / xs.length
      xs.map(x => (x - mu) * (x - mu)).sum / xs.length
    }
    vars.sliding(2).foreach { case Seq(a, b) => assert(a >= b - 1e-6); case _ => () }
    (0 until 8).foreach { c =>
      val want = vals(c) / 1e8
      assert(math.abs(vars(c) - want) <= 0.02 * math.max(want, 1e-9),
        s"component $c variance ${vars(c)} != eigenvalue-implied $want")
    }
  }

  test("BloomAgg: no false negatives, sane fpp, distributed merge bit-equals sequential build") {
    import org.scalacheck.Gen
    import org.apache.spark.sql.functions.{col, udaf}
    val g = Gen.choose(Long.MinValue, Long.MaxValue)
    val keys = (1 to 600).flatMap(_ => g.sample).distinct
    import spark.implicits._
    val df = keys.zipWithIndex.map { case (k, i) => (i % 7, k) }
      .toDF("grp", "key").repartition(4) // force multi-partition partial merges
    val agg = udaf(new graft.functions.BloomAgg(256, 0.01))
    val blooms = df.groupBy("grp").agg(agg(col("key")).as("b")).collect()
      .map(r => r.getInt(0) -> r.getAs[Array[Byte]]("b")).toMap
    def parse(b: Array[Byte]) = org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(b))

    // no false negatives: every inserted key answers true in its group
    keys.zipWithIndex.foreach { case (k, i) =>
      assert(parse(blooms(i % 7)).mightContainLong(k), s"false negative for $k")
    }
    // false-positive rate in the declared ballpark on fresh keys
    val inserted = keys.toSet
    val fresh = (1 to 3000).flatMap(_ => g.sample).distinct.filterNot(inserted)
    val b0 = parse(blooms(0))
    val fp = fresh.count(b0.mightContainLong)
    assert(fp <= math.max(fresh.size * 0.05, 5.0),
      s"fpp blew past the declared 1%: $fp of ${fresh.size}")

    // OR-merge is commutative, so the DISTRIBUTED aggregate must be
    // bit-identical to one sequential driver-side build
    val seq0 = org.apache.spark.util.sketch.BloomFilter.create(256, 0.01)
    keys.zipWithIndex.filter(_._2 % 7 == 0).foreach { case (k, _) => seq0.putLong(k) }
    val out = new java.io.ByteArrayOutputStream()
    seq0.writeTo(out)
    assert(java.util.Arrays.equals(out.toByteArray, blooms(0)),
      "distributed merge must reproduce the sequential filter bit-for-bit")
  }

  test("streaming late data drops exactly the behind-watermark slice") {
    import org.apache.spark.sql.functions.{col, expr, to_date}
    val got = RefPipeline.streamingLateData(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2), r.getLong(3))).toSet
    // the batch replay of the drop rule: on-time rows only
    val expected = graft.Tables(spark, sf).events
      .filter(col("event_id") % 50 =!= 0)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(
          expr("cast(round(value * 100) as bigint)")).as("s"))
      .collect().map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected,
      s"extra=${got.diff(expected).take(3)} missing=${expected.diff(got).take(3)}")
    // and the drop was REAL: the late slice is non-empty, so equality
    // with the filtered batch means rows were actually discarded
    val lateRows = graft.Tables(spark, sf).events
      .filter(col("event_id") % 50 === 0).count()
    assert(lateRows > 0, "the staged late slice must be non-empty for the test to mean anything")
  }

  test("bpe pairs equal the brute-force within-word pair recount") {
    import org.apache.spark.sql.functions.col
    val got = TextAnalysis.bpePairs(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val words = graft.Tables(spark, sf).documents.select(col("text")).collect()
      .flatMap(r => Option(r.getString(0)).toSeq)
      .flatMap(_.split(" ").filter(_.nonEmpty))
    val counts = words.filter(_.length >= 2)
      .flatMap(w => w.sliding(2))
      .groupBy(identity).map { case (p, v) => (p, v.length.toLong) }
    val brute = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    assert(got.toSeq == brute, s"got=${got.take(5).toSeq} want=${brute.take(5)}")
  }

  test("temperature mixture shares are normalized and recomputed exactly") {
    val rows = Pipeline.mixTemperature(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // shares sum to 1e6 within per-language rounding slack
    val shareSum = rows.map(_._5).sum
    assert(math.abs(shareSum - 1000000L) <= rows.length,
      s"shares must normalize: sum $shareSum over ${rows.length} languages")
    // the weight is exactly the quantized pow of the token mass
    rows.foreach { case (lang, _, nTok, wq, _) =>
      val want = math.floor(StrictMath.pow(nTok.toDouble, 0.3) * 1e6 + 0.5).toLong
      // Math.pow (Spark) and StrictMath.pow may differ in the last ulp;
      // the quantization makes a flip a <=1 unit event
      assert(math.abs(wq - want) <= 1L, s"$lang: w_q $wq != recomputed $want")
    }
    // temperature flattens: shares are less spread than raw token shares
    val tokTotal = rows.map(_._3).sum.toDouble
    val rawMax = rows.map(_._3.toDouble / tokTotal).max
    val tmpMax = rows.map(_._5.toDouble / 1e6).max
    assert(tmpMax < rawMax + 1e-9,
      s"alpha<1 must not sharpen the mixture: $tmpMax vs raw $rawMax")
  }

  test("int8 quantization stats respect the code and error bounds, recomputed exactly") {
    val rows = Similarity.int8Quantize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val byId = graft.Tables(spark, sf).embeddings
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) as e").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    rows.foreach { case (id, nDims, scaleQ9, sumAbs, sseQ12) =>
      val e = byId(id)
      assert(nDims == e.length.toLong)
      val scale = e.map(math.abs).max / 127.0
      assert(scaleQ9 == math.floor(scale * 1e9 + 0.5).toLong, s"vec $id scale")
      if (scale > 0) {
        val codes = e.map(x => math.floor(x / scale + 0.5).toLong)
        assert(codes.forall(c => c >= -127L && c <= 127L), s"vec $id code out of int8 range")
        assert(sumAbs == codes.map(math.abs).sum, s"vec $id sum_abs_code")
        val sse = e.map { x =>
          val err = x - math.floor(x / scale + 0.5) * scale
          math.floor(err * err * 1e12 + 0.5).toLong
        }.sum
        assert(sseQ12 == sse, s"vec $id sse")
        // per-dim error bound: |err| <= scale/2 (+1 quantization unit slack)
        assert(sseQ12 <= math.ceil(nDims * (scale / 2) * (scale / 2) * 1e12).toLong + nDims,
          s"vec $id error above the scale/2 bound")
      } else assert(sumAbs == 0L && sseQ12 == 0L)
    }
  }
}
