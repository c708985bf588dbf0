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
