package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("binary plumbing: every document decodes to consistent metadata") {
    val meta = Multimodal.mediaMeta(spark, sf)
    val docs = graft.Tables(spark, sf).documents.count()
    assert(meta.count() == docs)
    meta.collect().foreach { r =>
      val n = r.getAs[Long]("n_bytes")
      assert(r.getAs[Long]("width") == 64L + n % 577L)
      assert(r.getAs[Long]("height") == 64L + (n * 31L) % 417L)
      assert(r.getAs[String]("modality") == "image")
    }
  }

  test("resize plan puts the long side on 224 and preserves aspect within floor rounding") {
    Multimodal.resizePlan(spark, sf).collect().foreach { r =>
      val (w, h) = (r.getAs[Long]("width"), r.getAs[Long]("height"))
      val (ow, oh) = (r.getAs[Long]("out_w"), r.getAs[Long]("out_h"))
      assert(math.max(ow, oh) == 224L, s"long side must be 224: $r")
      if (w >= h) assert(oh == h * 224L / w) else assert(ow == w * 224L / h)
      assert(ow >= 1 && oh >= 1 && ow <= 224 && oh <= 224)
      assert(r.getAs[Long]("n_patches") ==
        ((ow + 15) / 16) * ((oh + 15) / 16), s"patch grid mismatch: $r")
    }
  }

  test("n_bytes equals utf-8 byte length of the source text") {
    val joined = Multimodal.mediaMeta(spark, sf)
      .join(graft.Tables(spark, sf).documents, "doc_id")
      .select(col("n_bytes"), length(encode(col("text"), "utf-8")).cast("long").as("expected"))
    assert(joined.filter(col("n_bytes") =!= col("expected")).count() == 0)
  }

  test("phash band join finds exactly the brute-force Hamming<=3 pairs, incl. exact dups at 0") {
    val got = Multimodal.imageNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // ground truth: dHash every doc driver-side (500 docs at spec scale)
    // and brute-force all pairs — the band generator must miss NOTHING
    val hashes = graft.Tables(spark, sf).documents
      .select(col("doc_id"), encode(col("text"), "utf-8").as("blob"))
      .collect().map(r => r.getLong(0) -> Multimodal.dHash(r.getAs[Array[Byte]]("blob")))
    val brute = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(got == brute, s"extra=${got.diff(brute).take(5)} missing=${brute.diff(got).take(5)}")
    // the corpus contains exact duplicate texts: identical blobs must
    // surface as distance-0 pairs (the image-dedup base case)
    val zero = got.filter(_._3 == 0L)
    assert(zero.nonEmpty, "expected distance-0 pairs from the corpus's exact duplicates")
    // degenerate payloads must hash, not throw: empty and 1-byte blobs
    assert(Multimodal.dHash(Array.emptyByteArray) == 0L)
    assert(Multimodal.dHash(Array[Byte](42)) == 0L,
      "a constant 1-byte image has no pixel differences — all dHash bits clear")
  }

  test("phash plan reads the binary column exactly once: one shared cache, no raw re-scan") {
    // the scale contract of imageNearDup (r12, closing the r11 verdict's
    // scan-amplification question): all six consumers of the hashed frame
    // (distinct, band join both sides, pair re-expansion joins, the
    // within-cluster self-join) must resolve to ONE cached (doc_id,
    // phash) projection — the wide blob bytes are decoded on a single
    // pass and never read again
    val plan = Multimodal.imageNearDup(spark, sf).queryExecution.optimizedPlan
    val caches = plan.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
    }
    assert(caches.nonEmpty, "expected the hashed projection to be cached")
    assert(caches.map(_.cacheBuilder.cachedPlan).map(_.canonicalized).distinct.size == 1,
      "more than one distinct cache — the binary column would materialize twice")
    // every source scan sits INSIDE that one cache's build plan; nothing
    // reads the table directly
    val rawScans = plan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
      case ds: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation => ds
    }
    assert(rawScans.isEmpty,
      s"raw source scans outside the cache: ${rawScans.size}")
  }

  test("scene cuts equal the brute-force per-video lag recount") {
    val got = Multimodal.sceneCuts(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // ground truth driver-side: hash every frame, difference consecutive
    // hashes, count cuts at Hamming > 10
    val docs = graft.Tables(spark, sf).documents
      .select(col("doc_id"), encode(col("text"), "utf-8").as("blob"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("blob"))
    val brute = docs.map { case (id, blob) =>
      val nf = 1L + id % 16L
      val hs = (0L until nf).map(f => Multimodal.frameDHash(blob, f))
      val cuts = hs.sliding(2).count {
        case Seq(a, b) => java.lang.Long.bitCount(a ^ b) > 10
        case _ => false
      }
      (id, nf, cuts.toLong + 1L)
    }.toSet
    assert(got == brute, s"extra=${got.diff(brute).take(5)} missing=${brute.diff(got).take(5)}")

    // frames inside one 4-frame group hash identically by the stub
    // contract, so scenes never exceed ceil(n_frames/4) — and the corpus
    // must actually produce multi-scene videos (the detector detects)
    assert(got.forall { case (_, nf, ns) => ns <= (nf + 3) / 4 },
      "a within-group frame pair produced a cut")
    assert(got.exists(_._3 > 1L), "expected at least one multi-scene video")

    // empty payloads flow through: every video reports all its frames
    assert(got.forall { case (id, nf, _) => nf == 1L + id % 16L })
  }
}
