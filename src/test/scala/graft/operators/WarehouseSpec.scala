package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WarehouseSpec extends SparkSpec {

  test("bucketed orders x lineitem joins without shuffling either side") {
    Warehouse.bucketizeOrders(spark, sf, buckets = 4, prefix = "whtest")
    // the tiny test tables would be broadcast (also shuffle-free); disable
    // that to prove the bucket-to-bucket SMJ path a fact-fact join takes
    val savedThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val q = Warehouse.revenueByPriorityCoLocated(spark, prefix = "whtest")
    val plan = q.queryExecution.executedPlan.toString

    assert(plan.contains("SortMergeJoin"), s"expected a bucket-to-bucket SMJ:\n$plan")
    // the join inputs must NOT be re-shuffled: the only Exchange allowed is
    // the final aggregation's, which sits ABOVE the join in the plan text
    val joinAt = plan.indexOf("SortMergeJoin")
    val belowJoin = plan.substring(joinAt)
    assert(!belowJoin.contains("Exchange"),
      s"join inputs were shuffled despite bucketing:\n$plan")
    assert(plan.contains("Bucketed: true"), s"scan did not use buckets:\n$plan")

    // and the co-located result equals the plain (shuffling) join
    val t = graft.Tables(spark, sf)
    val expected = t.orders
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(Olap.centsSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val got = q.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThreshold)
  }

  test("bucketize write emits one file per bucket, and a same-dir rebuild is skipped") {
    Warehouse.bucketizeOrders(spark, sf, buckets = 4, prefix = "whfiles")
    // without the pre-repartition the write fans out tasks x buckets
    // files (32k files for a 32-bucket table at 1000 executors); the
    // repartition on the bucket key caps it at one data file per bucket
    for (tbl <- Seq("whfiles_orders", "whfiles_lineitem")) {
      val loc = new java.io.File(new java.net.URI(
        spark.sql(s"DESCRIBE TABLE EXTENDED $tbl")
          .filter(col("col_name") === "Location").head().getString(1)))
      val files = loc.listFiles().count(_.getName.endsWith(".parquet"))
      assert(files == 4, s"$tbl wrote $files parquet files, want 4 (one per bucket)")
    }
    // colocatedRevenue must REUSE a registered same-dir layout (the bench
    // phase-split and production amortization depend on it): drop one
    // table behind the registry's back — a rebuild would recreate it,
    // reuse would fail — then confirm the registry path rebuilds when the
    // table is truly gone
    Warehouse.bucketizeOrders(spark, sf, buckets = 8, prefix = "whq")
    spark.sql("DROP TABLE whq_lineitem")
    val df = Warehouse.colocatedRevenue(spark, sf) // tableExists false -> rebuilds
    assert(df.count() == 5)
    assert(spark.catalog.tableExists("whq_lineitem"), "rebuild did not recreate the layout")
  }

  test("Dedup.shingled consumes the wh layout tokenizer-free with identical results") {
    // raw-path results first (no layout registered for the default prefix)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val rawMinhash = pairs(Dedup.minhashLsh(spark, sf))
    val rawNgram = pairs(Dedup.ngramJaccard(spark, sf))
    Warehouse.materializeShingles(spark, sf, buckets = 4) // default "wh": the prefix Dedup consults
    try {
      // through the driver contract, as the driver's session would run it
      val q = graft.SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("split("), s"layout-fed plan re-tokenized:\n${plan.take(500)}")
      assert(plan.contains("wh_shingles"), s"plan does not scan the layout:\n${plan.take(500)}")
      assert(pairs(q) == rawMinhash, "minhash pairs diverge between raw and layout paths")
      val q2 = graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, sf)
      assert(pairs(q2) == rawNgram, "ngram pairs diverge between raw and layout paths")
    } finally Warehouse.dropShingleLayout(spark)
  }

  test("materialized shingle table feeds dedup without re-tokenizing and reproduces the pairs") {
    Warehouse.materializeShingles(spark, sf, buckets = 4, prefix = "whtest")
    val sgd = spark.table("whtest_shingles").filter(col("n") > 0)
    // exact-Jaccard pairs straight off the layout (the verify arithmetic of
    // Dedup.minhashLsh, minus candidate generation - exhaustive is fine at
    // this SF because the explode-join bounds the pair space)
    val ex = sgd.select(col("doc_id"), explode(col("sg")).as("sh"))
    val pairs = ex.as("a").join(ex.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
      .join(sgd.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(sgd.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .filter(round(col("c").cast("double") / (col("na") + col("nb") - col("c")), 4) >= 0.8)
    // no tokenizer anywhere in the plan: the layout paid that pass already
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("split("), s"shingle consumer re-tokenized the text:\n${plan.take(500)}")
    val got = pairs.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = Dedup.minhashLsh(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"layout pairs diverge: extra=${got.diff(expected)} missing=${expected.diff(got)}")
  }

  test("partition-pruned daily query carries a PartitionFilter, never a data filter on the date") {
    try {
      val df = Warehouse.partitionPrunedDaily(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("event_date"),
        s"expected the date predicate as a PartitionFilter:\n${plan.take(800)}")
      // equality vs the raw one-day aggregation (what the oracle checks)
      val raw = graft.Tables(spark, sf).events
        .filter(col("ts").cast("date") === lit("2024-01-15").cast("date"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total"))
      assert(df.except(raw).isEmpty && raw.except(df).isEmpty,
        "pruned-layout aggregation diverged from the raw scan")
    } finally spark.sql("DROP TABLE IF EXISTS whp_events")
  }

  test("replacing merge resolves version-wins per key with NO window operator") {
    val merged = Warehouse.replacingMerge(spark, sf)
    // the merge must plan as a partial/final aggregate, never a sorted
    // WindowExec moving every version through a per-key sort
    val plan = merged.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"version-wins collapsed via a window:\n${plan.take(800)}")

    val t = graft.Tables(spark, sf).orders
    val base = t.select(col("o_orderkey"), col("o_orderstatus"),
      expr("cast(round(o_totalprice * 100) as bigint)").as("cents")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val got = merged.collect()
      .map(r => r.getAs[Long]("o_orderkey") ->
        ((r.getAs[Long]("version"), r.getAs[String]("o_orderstatus"), r.getAs[Long]("total_cents"))))
      .toMap
    assert(got.size == base.size, "merge must yield exactly one row per key")
    got.foreach { case (k, (version, status, cents)) =>
      val (baseStatus, baseCents) = base(k)
      if (k % 10 == 0) {
        assert(version == 2L && status == "F" && cents == baseCents + 500L,
          s"key $k: update row must win ($version, $status, $cents vs base $baseCents)")
      } else {
        assert(version == 1L && status == baseStatus && cents == baseCents,
          s"key $k: base row must survive untouched")
      }
    }
  }

  test("compaction collapses the fragmented layout and preserves the aggregate exactly") {
    val df = Warehouse.compaction(spark, sf)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val (fragFiles, compFiles) = Warehouse.compactionFileCounts()
    assert(fragFiles == 64, s"the simulated ingest layout must hold 64 files, got $fragFiles")
    // tiny test input: everything fits one 128 MB target file
    assert(compFiles == 1, s"compaction must produce ceil(bytes/128MB)=1 file, got $compFiles")
    val raw = graft.Tables(spark, sf).events
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(expr("cast(round(value * 100) as bigint)")).as("sum_cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == raw, "compacted layout diverged from the raw table")
  }

  test("schema-evolved read spans both generations with the declared default for pre-column files") {
    val df = Warehouse.schemaEvolution(spark, sf)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val raw = graft.Tables(spark, sf).events
      .select(when(col("event_id") % 2 === 0, lit("unknown"))
        .otherwise(col("event_type")).as("event_type"), col("value"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(expr("cast(round(value * 100) as bigint)")).as("sum_cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == raw, "evolved read diverged from the CASE replay on the raw table")
    // both generations really contribute: the default bucket exists AND
    // the new column's real values survive for gen-2 rows
    assert(got.exists(_._1 == "unknown") && got.size > 1)
  }

  test("streaming CDC fold converges to the batch version-wins table exactly") {
    val streamed = RefPipeline.streamingReplacingMerge(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    val batch = Warehouse.replacingMerge(spark, sf).collect()
      .map(r => (r.getAs[Long]("o_orderkey"), r.getAs[Long]("version"),
        r.getAs[String]("o_orderstatus"), r.getAs[Long]("total_cents"))).toSet
    assert(streamed == batch,
      s"stream diverged from batch: extra=${streamed.diff(batch).take(3)} missing=${batch.diff(streamed).take(3)}")
    // the fold really ran incrementally: updates won over their base rows
    assert(streamed.exists(_._2 == 2L), "no version-2 row survived — updates batch never folded")
    // carry-forward evidence: the base never streams (it seeds the state
    // as a plain bucket-partitioned backfill), so the ONLY micro-batch is
    // the %10-keyed update batch touching the 4 even buckets (10k mod 8
    // cycles over {0,2,4,6}) — half the state moved ZERO bytes
    assert(RefPipeline.lastReplacingMergeRewrites == Seq(4),
      s"expected bucket rewrites Seq(4), got ${RefPipeline.lastReplacingMergeRewrites}")
    // recovery: the persisted manifest.tsv snapshots alone reconstruct the
    // final table — the carry-forward state survives a driver restart
    val reloaded = RefPipeline.reloadReplacingMergeManifest(
      RefPipeline.lastReplacingMergeStateRoot)
    assert(reloaded.keySet == (0 until 8).toSet, s"manifest buckets: ${reloaded.keySet}")
    val fromDisk = reloaded.values.toSeq.sorted.map(spark.read.parquet(_))
      .reduce(_ unionByName _).collect()
      .map(r => (r.getAs[Long]("o_orderkey"), r.getAs[Long]("version"),
        r.getAs[String]("o_orderstatus"), r.getAs[Long]("total_cents"))).toSet
    assert(fromDisk == batch, "manifest-reconstructed state diverged from the batch table")
    // and the pre-batch snapshot really is the seed: version-1 rows only
    val preBatch = RefPipeline.reloadReplacingMergeManifest(
      RefPipeline.lastReplacingMergeStateRoot, beforeBatch = 0L)
    assert(preBatch.values.forall(_.contains("seed")),
      s"beforeBatch=0 must resolve to the seed generation: $preBatch")
  }

  test("version-wins collapse is replay-idempotent: a duplicated batch changes nothing") {
    // failure recovery replays a micro-batch; the fold must absorb the
    // duplicate because max_by is insensitive to repeated rows — the
    // exactly-once story of the CDC key, as a property
    val (base, updates) = Warehouse.replacingFrames(spark, sf)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("o_orderkey"), r.getAs[Long]("version"),
        r.getAs[String]("o_orderstatus"), r.getAs[Long]("total_cents"))).toSet
    val once = rows(Warehouse.versionWinsCollapse(base.unionByName(updates)))
    val replayed = rows(Warehouse.versionWinsCollapse(
      base.unionByName(updates).unionByName(updates)))
    assert(once == replayed, "a replayed updates batch must be absorbed")
    // and folding the already-collapsed state with the replay is also stable
    val folded = rows(Warehouse.versionWinsCollapse(
      Warehouse.versionWinsCollapse(base.unionByName(updates)).unionByName(updates)))
    assert(folded == once, "re-folding collapsed state with a replay must be a no-op")
  }

  test("merged HLL sketch state equals sketching the raw union directly, within 5% of exact") {
    val merged = Warehouse.sketchStateMerge(spark, sf).collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    val direct = graft.Tables(spark, sf).events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).as("approx"),
        countDistinct("user_id").as("exact"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(merged.keySet == direct.keySet)
    direct.foreach { case (day, (approx, exact, n)) =>
      val (mergedApprox, mergedN) = merged(day)
      // register-max merge is associative: merging per-(day,type) states
      // must reproduce the direct per-day sketch BIT-FOR-BIT
      assert(mergedApprox == approx,
        s"$day: merged-state estimate $mergedApprox != direct-sketch estimate $approx")
      assert(mergedN == n, s"$day: event counts must ride along exactly")
      assert(math.abs(mergedApprox - exact) <= math.max(0.05 * exact, 1.0),
        s"$day: estimate $mergedApprox outside 5% of exact $exact")
    }
  }

  test("collapsing sign aggregate equals the brute-force per-key final state") {
    val got = Warehouse.collapsingMerge(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    // brute force: materialize each key's FINAL state (deleted keys
    // vanish; restated keys carry the corrected row) and aggregate that
    val t = graft.Tables(spark, sf).orders
      .select(col("o_orderkey"), col("o_orderstatus"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
    val live = t.filter(col("o_orderkey") % 7 =!= 0)
    val restated = t.filter(col("o_orderkey") % 7 === 0 && col("o_orderkey") % 21 =!= 0)
      .select(col("o_orderkey"), lit("F").as("o_orderstatus"),
        (col("cents") + lit(250L)).as("cents"))
    val expected = live.unionByName(restated)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_live"), sum("cents").as("sum_cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected,
      s"sign annihilation diverged from the reconstructed final state: got=$got expected=$expected")

    // pure-deleted keys (%21) contribute exactly zero to the sign stream
    val deletedNet = Warehouse.collapsingStream(spark, sf)
      .filter(col("o_orderkey") % 21 === 0)
      .agg(sum("sign").as("s"), sum(col("sign") * col("cents")).as("sc"))
      .collect()(0)
    assert(deletedNet.getLong(0) == 0L && deletedNet.getLong(1) == 0L,
      "a cancelled-without-restatement key must annihilate to zero")

    // the algebra stays aggregate-only: no window, no join in the plan
    val plan = Warehouse.collapsingMerge(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Join"),
      s"collapsing merge must be pure aggregation:\n${plan.take(600)}")
  }

  test("dictionary-encoded layout carries no string column and decodes via broadcast") {
    val q = Warehouse.dictionaryEncode(spark, sf)
    val got = q.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val expected = graft.Tables(spark, sf).events
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(expr("cast(round(value * 100) as bigint)")).as("sc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected, "encoding must be invisible to the aggregate")

    // the fact layout stores only int codes — no string column anywhere
    val facts = spark.read.parquet(Warehouse.dictDir.resolve("facts").toString)
    assert(!facts.schema.exists(_.dataType == org.apache.spark.sql.types.StringType),
      s"encoded facts must carry no strings: ${facts.schema.treeString}")

    // the decode join broadcasts the vocabulary-sized dictionary
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"decode join should broadcast:\n${plan.take(600)}")
  }

  test("bloom skip index opens fewer files than the layout holds, same answer as the raw filter") {
    val q = Warehouse.bloomSkipIndex(spark, sf)
    val got = q.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    val (total, opened) = Warehouse.bloomSkipCounts
    // <= 16: the writer skips empty hash buckets (15 hot users into 16
    // buckets at this SF), so the layout holds the non-empty files only
    assert(total > 4 && total <= 16, s"unexpected layout file count $total")
    // a unique key lives in ONE file; fpp 0.01 over 16 sidecars makes
    // even one false positive unlikely, but allow a few — the contract
    // is "most files skipped", not an exact count
    assert(opened < total / 2,
      s"the index should skip most files for a point lookup: opened $opened of $total")
    assert(opened > 0, "no false negatives: the probed event's file must survive")

    val probe = graft.Tables(spark, sf).events.agg(min("event_id")).collect()(0).getLong(0)
    val expected = graft.Tables(spark, sf).events
      .filter(col("event_id") === probe)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("v_cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    assert(got == expected, "skipping must never change the answer")
  }

  test("mutation delete rewrites only the files that can hold the victim") {
    val got = Warehouse.mutationDelete(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val (total, rewritten) = Warehouse.mutationCounts
    assert(rewritten >= 1 && rewritten < total,
      s"delete was not surgical: rewrote $rewritten of $total files")
    val victim = graft.Tables(spark, sf).events
      .filter(col("user_id") % 97 === 0)
      .agg(org.apache.spark.sql.functions.min("user_id")).collect()(0).getLong(0)
    val expected = graft.Tables(spark, sf).events
      .filter(col("user_id") =!= victim)
      .selectExpr("event_type", "cast(round(value * 100) as bigint) as c")
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("c").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    // and the victim had rows to delete, so equality is not vacuous
    assert(graft.Tables(spark, sf).events
      .filter(col("user_id") === victim).count() > 0)
    // the untouched carry-over is a true metadata-only re-link: every
    // non-rewritten gen1 part shares an inode with its gen0 original
    // (Files.copy would satisfy the result equality above but move the
    // bytes — the exact cost the surgical delete exists to avoid)
    val (gen0, gen1) = Warehouse.mutationGens
    def ino(p: java.nio.file.Path): Any =
      java.nio.file.Files.getAttribute(p, "unix:ino")
    val carried = gen1.toFile.listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(carried.length == total - rewritten,
      s"expected ${total - rewritten} carried parts, found ${carried.length}")
    carried.foreach { f =>
      assert(ino(f.toPath) == ino(gen0.resolve(f.getName)),
        s"${f.getName} was copied, not hard-linked")
    }
  }

  test("summing merge adds partials across parts and drops all-zero keys") {
    val got = Warehouse.summingMerge(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    val raw = graft.Tables(spark, sf).events
      .selectExpr("user_id", "event_type", "cast(round(value * 100) as bigint) as cents")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val brute = raw.groupBy(r => (r._1, r._2)).map { case (k, rs) =>
      k -> ((rs.map(_._3).sum, rs.length.toLong))
    }
    // annihilated keys are gone, not zero-valued
    brute.keys.filter(_._1 % 13 == 0).foreach(k => assert(!got.contains(k), s"$k survived"))
    // every other key carries the exact full-year partial-sum total
    brute.filter(_._1._1 % 13 != 0).foreach { case (k, v) =>
      assert(got.get(k).contains(v), s"$k: ${got.get(k)} vs $v")
    }
    assert(got.keySet == brute.keySet.filter(_._1 % 13 != 0))
  }

  test("bitmap state merge is exact and its stored states stay bucket-bounded") {
    val got = Warehouse.bitmapStateMerge(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val exact = graft.Tables(spark, sf).events
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct("user_id").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == exact, s"bitmap=$got exact=$exact")
    // every stored state is one bucket's bitmap: at most 4 KiB by design
    spark.read.parquet(Warehouse.bitmapStateDirForTest)
      .select("user_bitmap").collect().foreach { r =>
        assert(r.getAs[Array[Byte]](0).length <= 4096)
      }
  }

  test("projection router picks the smallest covering store and refuses uncovered dims") {
    val projs = Warehouse.buildProjections(spark, sf)
    // (year) is covered by both stores; the 2-dim one is more aggregated
    val byYear = Warehouse.projectionAnswer(spark, projs, Seq("l_year"))
    assert(byYear.count() > 0)
    assert(Warehouse.lastProjection == "p_ym")
    // (year, flag) forces the wider store — p_ym has no flag column
    val byFlag = Warehouse.projectionAnswer(spark, projs, Seq("l_year", "l_returnflag"))
    assert(Warehouse.lastProjection == "p_ymf")
    // routed answers equal aggregating the raw facts
    val raw = graft.Tables(spark, sf).lineitem.select(
      org.apache.spark.sql.functions.year(col("l_shipdate")).cast("long").as("l_year"),
      col("l_returnflag"),
      expr("cast(round(l_quantity) as bigint)").as("qty"),
      expr("cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)").as("cents"))
    val rawByFlag = raw.groupBy("l_year", "l_returnflag")
      .agg(sum("qty").as("sum_qty"), sum("cents").as("revenue_cents"),
        count(org.apache.spark.sql.functions.lit(1)).as("n_rows"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val gotByFlag = byFlag.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(gotByFlag == rawByFlag)
    // a grouping set no projection covers fails loudly, never a full scan
    intercept[IllegalArgumentException] {
      Warehouse.projectionAnswer(spark, projs, Seq("l_suppkey"))
    }
  }

  test("TTL expiry physically drops expired partitions and keeps the horizon rows") {
    val q = Warehouse.ttlExpire(spark, sf)
    val got = q.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDate(3).toString)).toSet
    val (before, after) = Warehouse.ttlPartitionCounts
    assert(after < before, s"expected expired partition dirs to be dropped: $before -> $after")

    // the retained layout answers exactly the horizon filter over raw data
    val expected = graft.Tables(spark, sf).events
      .filter(to_date(col("ts")) >= lit("2024-01-20").cast("date"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(expr("cast(round(value * 100) as bigint)")).as("sum_cents"),
        min(to_date(col("ts"))).as("first_day"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDate(3).toString)).toSet
    assert(got == expected, "file-level TTL diverged from the row-level horizon filter")

    // every surviving partition directory is on or after the cutoff
    assert(got.forall(_._4 >= "2024-01-20"), s"a pre-cutoff day survived: $got")
  }
}
