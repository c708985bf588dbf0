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
}
