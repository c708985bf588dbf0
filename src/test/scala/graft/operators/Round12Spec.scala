package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-12 gates for the widening keys: DSIR importance resampling,
  * SemDeDup-shaped bucketed embedding dedup, the Mann–Whitney
  * rank-sum test, and BM25 probe-query retrieval.
  *
  * The SQL oracles already pin VALUES; these tests pin the properties the
  * value-compare can't see — DSIR actually enriches the target slice,
  * dedup_semantic's keep/drop decisions agree with a brute-force
  * within-bucket reference, and the distributed no-window rank statistics
  * equal a plain single-partition window formulation.
  */
class Round12Spec extends SparkSpec {

  test("pipeline_dsir keeps exactly n/5 docs and enriches the target (en) slice") {
    val selected = Pipeline.dsir(spark, sf)
    val docs = graft.Tables(spark, sf).documents
    val n = docs.count()
    assert(selected.count() == n / 5, "top-k must keep exactly floor(n/5) docs")
    val enCorpus = docs.filter(col("lang") === "en").count().toDouble / n
    val enSelected =
      selected.filter(col("lang") === "en").count().toDouble / (n / 5)
    // the method's point: importance weights trained on the en slice must
    // over-select en-like documents relative to the corpus base rate
    assert(enSelected > enCorpus,
      f"DSIR selection should enrich the target slice: $enSelected%.3f <= $enCorpus%.3f")
  }

  test("dedup_semantic agrees with the brute-force within-bucket reference") {
    graft.GraftSession.registerFunctions(spark)
    val out = Dedup.semantic(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // brute-force reference: all within-bucket pairs on the collected frame
    val vecs = graft.Tables(spark, sf).embeddings
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def bucket(v: Array[Double]): Long =
      (0 until 4).map(i => if (v(i) >= 0) 1L << i else 0L).sum
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byBucket = vecs.groupBy { case (_, v) => bucket(v) }
    val expectedDupOf = byBucket.values.flatMap { members =>
      val sorted = members.sortBy(_._1)
      sorted.flatMap { case (id, v) =>
        sorted.collectFirst {
          case (ida, va) if ida < id && cos(va, v) >= 0.42 => id -> ida
        }
      }
    }.toMap
    assert(out.keySet == vecs.map(_._1).toSet, "every vector must appear in the output")
    vecs.foreach { case (id, v) =>
      val (bkt, dupOf, kept) = out(id)
      assert(bkt == bucket(v), s"bucket mismatch for $id")
      expectedDupOf.get(id) match {
        case Some(w) => assert(kept == 0L && dupOf == w,
          s"$id should be dropped with witness $w, got kept=$kept dup_of=$dupOf")
        case None => assert(kept == 1L && dupOf == -1L,
          s"$id should be kept, got kept=$kept dup_of=$dupOf")
      }
    }
    // the fixture must exercise both branches or the gate proves nothing
    assert(out.values.exists(_._3 == 0L), "fixture has no within-bucket dups")
    assert(out.values.exists(_._3 == 1L), "fixture keeps nothing")
  }

  test("q_mann_whitney equals the single-partition midrank-window formulation") {
    val row = Analytics.mannWhitney(spark, sf).collect().head
    val (n1, n2, u1x2, z) =
      (row.getLong(2), row.getLong(3), row.getLong(4), row.getDouble(5))
    // reference: explicit midranks on the collected (tiny) fixture
    val vals = graft.Tables(spark, sf).events
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_type"), expr("cast(round(value * 100) as bigint)").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val sorted = vals.map(_._2).sorted
    val rank2 = sorted.zipWithIndex.groupBy(_._1).map { case (v, xs) =>
      // doubled midrank of the tie block = first 1-based rank + last, summed
      v -> (xs.map(_._2 + 1).sum * 2L / xs.length)
    }
    val r1x2 = vals.filter(_._1 == "purchase").map(x => rank2(x._2)).sum
    val en1 = vals.count(_._1 == "purchase").toLong
    val en2 = vals.count(_._1 == "click").toLong
    assert((n1, n2) == ((en1, en2)))
    assert(u1x2 == r1x2 - en1 * (en1 + 1),
      s"doubled U mismatch: $u1x2 vs ${r1x2 - en1 * (en1 + 1)}")
    val ties = vals.map(_._2).groupBy(identity).values.map(_.length.toLong)
    val tie3 = ties.map(t => t * t * t - t).sum
    val nn = en1 + en2
    val expectedZ = (u1x2.toDouble / 2.0 - en1.toDouble * en2 / 2.0) /
      math.sqrt(en1.toDouble * en2 / 12.0 *
        ((nn + 1).toDouble - tie3.toDouble / (nn.toDouble * (nn - 1))))
    assert(math.abs(z - expectedZ) < 1e-3, s"z mismatch: $z vs $expectedZ")
    // ties exist in cent-rounded values, so the correction must be active
    assert(tie3 > 0, "fixture has no ties - the tie-correction path is untested")
  }

  test("text_bm25 equals a driver-side recomputation and broadcasts the probe join") {
    val out = TextAnalysis.bm25(spark, sf)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the 3-row probe-term scoring join must broadcast")
    assert(plan.contains("TakeOrderedAndProject"),
      "the global top-20 must be a constant-k TakeOrderedAndProject, not a sort")
    assert(!plan.contains("SortMergeJoin"),
      "no full-shuffle join belongs in the bm25 plan")
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // reference: same tokenizer output, scored in plain Scala in the same
    // IEEE operand order, quantized to 1e-4 BIGINTs before the per-doc sum
    val docs = graft.Tables(spark, sf).documents
    val toks = docs.select(col("doc_id"), expr(TextAnalysis.tokensExpr).as("tk"))
      .filter(expr("size(tk) >= 1"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    val nDocs = docs.count()
    val dl = toks.map { case (id, tk) => id -> tk.length.toLong }.toMap
    val tf = toks.flatMap { case (id, tk) => tk.map(t => (id, t)) }
      .groupBy(identity).map { case ((id, t), xs) => (id, t, xs.length.toLong) }
    val dfreq = tf.groupBy(_._2).map { case (t, xs) => t -> xs.size.toLong }
    val probe = dfreq.toSeq.sortBy { case (t, d) => (-d, t) }.zipWithIndex
      .collect { case ((t, d), i) if Set(0, 6, 22)(i) => t -> d }.toMap
    assert(probe.size == 3, "fixture must yield all three probe terms")
    val avgdl = math.floor(dl.values.sum.toDouble / dl.size * 1e4 + 0.5) / 1e4
    val expected = tf.filter(x => probe.contains(x._2)).groupBy(_._1)
      .map { case (id, xs) =>
        id -> xs.map { case (_, t, f) =>
          val d = probe(t)
          math.floor(math.log((nDocs.toDouble - d + 0.5) / (d + 0.5) + 1.0)
            * ((f.toDouble * 2.2)
              / (f.toDouble + 1.2 * (0.25 + 0.75 * (dl(id).toDouble / avgdl))))
            * 1e4 + 0.5).toLong
        }.sum
      }.toSeq.sortBy { case (id, s) => (-s, id) }.take(20)
    assert(got == expected, s"top-20 mismatch:\n got      $got\n expected $expected")
  }

  test("ann_range equals the brute-force radius reference and never shuffles") {
    graft.GraftSession.registerFunctions(spark)
    val out = Similarity.rangeSearch(spark, sf)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning") && !plan.contains("rangepartitioning"),
      "radius search must be one narrow broadcast stage - no shuffle anywhere")
    val got = out.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // brute-force reference: sequential-fold dot products on the
    // collected frame, membership on the 1e-6-rounded score
    val vecs = graft.Tables(spark, sf).embeddings
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; for (i <- a.indices) s += a(i) * b(i); s
    }
    def rnd(x: Double, p: Int): Double =
      BigDecimal(x).setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = (for {
      (qid, va) <- vecs if qid < 10
      (nid, vb) <- vecs if nid >= 10
      cos = dot(va, vb) / (math.sqrt(dot(va, va)) * math.sqrt(dot(vb, vb)))
      if rnd(cos, 6) >= 0.2
    } yield (qid, nid) -> rnd(cos, 4)).toMap
    assert(got.nonEmpty, "fixture must yield a nonempty radius result")
    assert(got == expected,
      s"radius mismatch: extra=${(got.keySet -- expected.keySet).take(5)} " +
        s"missing=${(expected.keySet -- got.keySet).take(5)}")
  }

  test("pipeline_dsir degrades gracefully on a zero-token corpus") {
    // every text NULL or empty -> the feature stream has only null dims,
    // dist is EMPTY and the total sums come back NULL; the operator must
    // select floor(n/5) docs at score 0 (doc_id tiebreak), matching the
    // oracle's LEFT JOIN degradation - not NPE on Row.getLong
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dsir-empty").toString
    Seq((1L, "en", null: String), (2L, "de", ""), (3L, "en", "   "),
      (4L, "fr", null: String), (5L, "en", ""))
      .toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Pipeline.dsir(spark, dir).collect()
    assert(out.length == 1, s"floor(5/5)=1 doc expected, got ${out.length}")
    assert(out.head.getLong(0) == 1L, "score-0 tiebreak must keep min doc_id")
    assert(out.head.getLong(2) == 0L, "zero-token corpus must score 0")
  }
}
