package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-operator invariants for the round-3 widening surface (the DuckDB
  * oracle checks value equality; these assert the relationships BETWEEN
  * operators that the oracle cannot see). */
class WideningSpec extends SparkSpec {

  test("cube contains rollup, plus the (ALL, priority) slices, and agrees on shared cells") {
    val cube = Olap.ordersCube(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val rollup = Olap.ordersRollup(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    rollup.foreach { case (k, (n, tot)) =>
      // totals are exact-cents sums now (order-independent BIGINT + one
      // division), so shared cells must agree bit-for-bit — no tolerance
      val cell = cube.get(k)
      assert(cell.contains((n, tot)),
        s"cube disagrees with rollup at $k: $cell vs ($n, $tot)")
    }
    val extraSlices = cube.keySet.diff(rollup.keySet)
    assert(extraSlices.nonEmpty && extraSlices.forall { case (s, p) => s == "ALL" && p != "ALL" },
      s"cube must add exactly the (ALL, priority) slices, got $extraSlices")
    // the grand total tallies the detail cells
    val details = cube.collect { case ((s, p), (n, _)) if s != "ALL" && p != "ALL" => n }
    assert(cube(("ALL", "ALL"))._1 == details.sum)
  }

  test("pivot cells equal the corresponding cube detail cells") {
    val cube = Olap.ordersCube(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    Olap.pivotPriorities(spark, sf).collect().foreach { r =>
      val status = r.getString(0)
      Seq("1-URGENT" -> 1, "2-HIGH" -> 2, "3-MEDIUM" -> 3, "4-NOT SPECIFIED" -> 4, "5-LOW" -> 5)
        .foreach { case (prio, idx) =>
          val cell = if (r.isNullAt(idx)) None else Some(r.getDouble(idx))
          val expected = cube.get((status, prio))
          // same-null-ness exact, values with the partial-merge-order tolerance
          assert(expected.isDefined == cell.isDefined &&
            expected.zip(cell).forall { case (e, c) => math.abs(e - c) <= 1e-3 },
            s"pivot($status, $prio)=$cell != cube $expected")
        }
    }
  }

  test("anti join count complements the customers that DO have an urgent order") {
    val t = graft.Tables(spark, sf)
    val total = t.customer.count()
    val withUrgent = t.orders.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").distinct().count()
    val anti = Olap.customersWithoutOrders(spark, sf)
      .agg(sum("n_customers")).collect()(0).getLong(0)
    assert(anti == total - withUrgent, s"$anti != $total - $withUrgent")
  }

  test("histogram bins cover every event exactly once and respect bin bounds") {
    val rows = Analytics.histogram(spark, sf).collect()
    val events = graft.Tables(spark, sf).events.count()
    assert(rows.map(_.getAs[Long]("n")).sum == events)
    rows.foreach { r =>
      val lo = r.getAs[Double]("lo")
      // min_v/max_v are round(x,4)-ed: a raw value within 5e-5 of a bin
      // edge rounds ONTO the edge, so the bounds get that tolerance
      assert(r.getAs[Double]("min_v") >= lo - 5e-5 &&
        r.getAs[Double]("max_v") < lo + 50.0 + 5e-5,
        s"bin ${r.getAs[Long]("bin")} bounds violated: $r")
    }
  }

  test("bigram collection frequency tallies with per-doc token counts") {
    val cf = TextAnalysis.bigrams(spark, sf).agg(sum("cf")).collect()(0).getLong(0)
    val expected = TextAnalysis.tokens(spark, sf)
      .select(greatest(col("n_tokens") - 1, lit(0L)).as("b"))
      .agg(sum("b")).collect()(0).getLong(0)
    assert(cf == expected, s"sum(cf)=$cf != sum(max(n_tokens-1,0))=$expected")
  }

  test("tf-idf picks one keyword per tokenized doc, with a nonnegative score") {
    val rows = TextAnalysis.tfidfTop(spark, sf).collect()
    val tokenized = TextAnalysis.tokens(spark, sf).filter(col("n_tokens") > 0).count()
    assert(rows.length == tokenized)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
    rows.foreach(r => assert(r.getAs[Double]("tfidf") >= 0.0))
  }

  test("train mix keeps exactly the documents below each stratum's bucket threshold") {
    val lang = TextAnalysis.langId(spark, sf).select("doc_id", "pred_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val picked = Pipeline.trainMix(spark, sf).collect()
    def rate(l: String): Long = l match {
      case "en" => 5; case "unknown" => 2; case _ => 16
    }
    picked.foreach { r =>
      assert(lang(r.getLong(0)) == r.getString(1))
      assert(r.getLong(2) < rate(r.getString(1)), s"bucket over threshold: $r")
    }
    // en really is downsampled: fewer picked than present
    val enTotal = lang.values.count(_ == "en")
    val enPicked = picked.count(_.getString(1) == "en")
    assert(enPicked < enTotal && enPicked > 0, s"en picked $enPicked of $enTotal")
  }
}
