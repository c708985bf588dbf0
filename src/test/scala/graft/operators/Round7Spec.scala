package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Invariants for the round-7 keys: bloom-prefiltered decontamination,
  * built-in session windows, unigram-LM perplexity. */
class Round7Spec extends SparkSpec {

  test("bloom-prefiltered decontamination equals the exact broadcast probe") {
    val exact = Pipeline.decontaminate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bloom = Pipeline.decontaminateBloom(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // no false negatives by construction, false positives removed by the
    // exact verify — the outputs must be identical, not merely similar
    assert(bloom == exact)
    assert(exact.nonEmpty)
  }

  test("bloom prefilter is a native codegen'd expression, not a Scala UDF") {
    val qe = Pipeline.decontaminateBloom(spark, sf).queryExecution
    val physical = qe.executedPlan.toString
    assert(!physical.contains("ScalaUDF") && !qe.optimizedPlan.toString.contains("ScalaUDF"),
      s"bloom prefilter must stay inside whole-stage codegen:\n${physical.take(800)}")
    assert(physical.contains("bloom_might_contain"),
      s"expected the native bloom_might_contain predicate in the plan:\n${physical.take(800)}")
  }

  test("session_window sessions partition the events and respect the gap rule") {
    val sessions = RefPipeline.sessionWindowAgg(spark, sf).collect()
    val nEvents = Tables(spark, sf).events.count()
    assert(sessions.map(_.getAs[Long]("n_events")).sum == nEvents)
    sessions.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("start_s"))
      sorted.foreach { r =>
        // end = last event + gap, so every session spans at least the gap
        assert(r.getAs[Long]("end_s") - r.getAs[Long]("start_s") >= 1800)
      }
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // a session split means the next first event sat >= gap past the
          // previous last event — i.e. at or past the previous window end
          assert(b.getAs[Long]("start_s") >= a.getAs[Long]("end_s"))
        case _ => ()
      }
    }
  }

  test("morton interleave matches a driver-side reference; z-ordered files are disjoint in z") {
    import spark.implicits._
    // reference implementation, bit by bit
    def mortonRef(x: Long, y: Long): Long =
      (0 until 32).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 16L), (12345L, 6789L),
      (0xFFFFFFFFL, 0L), (0L, 0xFFFFFFFFL), (98765L, 43210L))
    val got = samples.toDF("x", "y")
      .select(Warehouse.morton2(col("x"), col("y")).as("z")).collect().map(_.getLong(0))
    assert(got.toSeq == samples.map { case (x, y) => mortonRef(x, y) })

    // the layout write: per-file z intervals must be pairwise disjoint
    // (range partition on z + sort within) — the precondition for 2-D
    // row-group skipping
    val layout = Warehouse.writeZorderLayout(spark, sf)
    val files = spark.read.parquet(layout).inputFiles
    assert(files.length > 1)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("z"), max("z")).collect().head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array(a, b) => assert(a._2 <= b._1)
      case _ => ()
    }
  }

  test("contrastive pairs: deterministic negatives, no self-pairs, score range") {
    val rows = Similarity.contrastivePairs(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("neg_id") != r.getAs[Long]("q_id"))
      val s = r.getAs[Double]("score")
      assert(s >= -1.0001 && s <= 1.0001)
    }
    // every anchor draws at most `negatives` pairs and the draw is a pure
    // function of (q_id, j) — two runs agree row for row
    val again = Similarity.contrastivePairs(spark, sf).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq)
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, g) => assert(g.length <= 4) }
  }

  test("perplexity aggregates reproduce an independent driver-side unigram model") {
    val out = TextAnalysis.perplexity(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("n_tok"), r.getAs[Long]("sum_s_q"), r.getAs[Double]("avg_nll"))))
      .toMap
    // independent model: tokenize driver-side, build cf/T, quantize ln
    val docs = Tables(spark, sf).documents.select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split(" ").filter(_.nonEmpty))
    val cf = docs.flatMap(_._2).groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val total = cf.values.sum
    val sQ = cf.map { case (t, c) =>
      t -> math.floor(math.log(total.toDouble / c.toDouble) * 10000 + 0.5).toLong }
    docs.filter(_._2.nonEmpty).foreach { case (id, tk) =>
      val (nTok, sumSQ, avgNll) = out(id)
      assert(nTok == tk.length.toLong)
      assert(sumSQ == tk.map(sQ).sum)
      assert(avgNll == math.floor(sumSQ.toDouble / nTok.toDouble + 0.5) / 1e4)
    }
    assert(out.size == docs.count(_._2.nonEmpty))
  }
}
