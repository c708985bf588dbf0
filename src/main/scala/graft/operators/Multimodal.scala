package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column handling: opaque `binary` payloads + typed metadata.
  *
  * The pattern for image/audio/video at 100 TB: keep the raw bytes as an
  * opaque binary column in parquet (never parse them in SQL), and run the
  * decode / feature-extract stage as a partition-batched typed map so the
  * decoder (libjpeg/ffmpeg/... in production) amortizes init per partition,
  * not per row.
  *
  * The decode itself is STUBBED here (no media libs in this environment) by
  * [[FakeDecoder]], a deterministic function of the byte length — the
  * Spark-side plumbing (schema, encoders, partition batching, column
  * pruning before the wide binary is ever read) is real and tested.
  */
object Multimodal {

  /** A decoded media record: what a real image decoder would return. */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Long, width: Long, height: Long,
      n_frames: Long, modality: String)

  private[graft] case class RawMedia(doc_id: Long, blob: Array[Byte])

  /** Deterministic stand-in for a media decoder (`???` in production this
    * is the libjpeg/ffmpeg call; the arithmetic below is the test fake). */
  object FakeDecoder {
    def decode(r: RawMedia): MediaMeta = {
      val n = r.blob.length.toLong
      MediaMeta(
        doc_id = r.doc_id,
        n_bytes = n,
        width = 64L + n % 577L,
        height = 64L + (n * 31L) % 417L,
        n_frames = 1L + r.doc_id % 16L,
        modality = "image")
    }
  }

  /** Binary ingestion + batched decode. The binary column is synthesized
    * from `text` (utf-8) since the test corpus is text-only; in production
    * it would be `spark.read.format("binaryFile")` or a parquet binary
    * column. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw: Dataset[RawMedia] = Tables(spark, dir).documents
      .select(col("doc_id"), encode(col("text"), "utf-8").as("blob"))
      .as[RawMedia]
    raw.mapPartitions { it =>
      // per-partition decoder init would go here (amortized once per task)
      it.map(FakeDecoder.decode)
    }.toDF()
  }

  /** Aspect-preserving resize planning for the vision-encoder input: fit
    * each decoded image inside a 224x224 square (the long side lands on
    * 224, the short side scales by the same factor) and lay out the
    * 16-pixel patch grid the encoder consumes. All arithmetic is exact
    * integer floor-division of the decoded dimensions, so any engine
    * reproduces it bit-for-bit; in production the actual pixel resample
    * happens in the same partition-batched decode pass as [[mediaMeta]],
    * so the wide bytes never shuffle — this is the planning row the
    * resize kernel executes. */
  def resizePlan(spark: SparkSession, dir: String): DataFrame =
    mediaMeta(spark, dir)
      .withColumn("out_w", expr(
        "CASE WHEN width >= height THEN 224L ELSE (width * 224L) div height END"))
      .withColumn("out_h", expr(
        "CASE WHEN width >= height THEN (height * 224L) div width ELSE 224L END"))
      .withColumn("n_patches", expr(
        "cast(ceil(out_w / 16.0) * ceil(out_h / 16.0) as bigint)"))
      .select("doc_id", "width", "height", "out_w", "out_h", "n_patches")

  /** Deterministic frame sampling for the video modality: at most 4 evenly
    * strided frames per document (`stride = ceil(n_frames / 4)`), one row
    * per sampled frame — the frame-selection batch shape a video encoder
    * consumes. Computed from the decoded metadata; the frame BYTES would
    * be sliced in the same partition-batched decode pass, so nothing wide
    * ever shuffles. */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    mediaMeta(spark, dir)
      .withColumn("stride", ceil(col("n_frames") / 4.0).cast("long"))
      .select(col("doc_id"), col("n_frames"),
        explode(expr("sequence(0L, n_frames - 1, stride)")).as("frame_idx"))

  /** Audio-modality framing: treat the payload as 16-bit mono PCM
    * (`n_samples = n_bytes div 2`) and lay out overlapping analysis
    * windows — one row per window with its start sample, the batch shape
    * a speech encoder consumes. Window 80 / hop 40 samples here so the
    * short test payloads (~150 samples) produce frames; production uses
    * the same arithmetic at 400/160 (25 ms / 10 ms at 16 kHz). Documents
    * shorter than one window emit no rows. The filter sits above the
    * typed decode map (object boundary — nothing to push down), and the
    * sample BYTES would be sliced in the same partition-batched decode
    * pass, so nothing wide ever shuffles. */
  def audioWindows(spark: SparkSession, dir: String): DataFrame =
    mediaMeta(spark, dir)
      .withColumn("n_samples", expr("n_bytes div 2L"))
      .filter(col("n_samples") >= 80L)
      .withColumn("n_windows", expr("1L + (n_samples - 80L) div 40L"))
      .select(col("doc_id"), col("n_samples"),
        explode(expr("transform(sequence(0L, n_windows - 1), w -> w * 40L)"))
          .as("start_sample"))

  private[graft] final case class MediaHash(doc_id: Long, phash: Long)

  /** dHash over the decoded 9x8 luma grid: bit i = "pixel brighter than
    * its left neighbor" — the difference hash of the perceptual-hash
    * family (aHash/dHash/pHash), robust to uniform brightness shifts
    * because only the SIGN of adjacent differences survives. The luma
    * grid here samples the blob deterministically (the stand-in for a
    * real downscale-to-9x8 of decoded pixels — same stub contract as
    * [[FakeDecoder]]); the hash arithmetic is the real dHash. */
  private[graft] def dHash(blob: Array[Byte]): Long = {
    // empty payload (empty document text): no pixels, no differences —
    // hash 0. Without this, the modulus-1 fast path below would still
    // index blob(0) into an empty array.
    if (blob.isEmpty) return 0L
    val n = blob.length
    @inline def luma(x: Int, y: Int): Int = blob(((y * 9 + x) * 31) % n) & 0xFF
    var h = 0L
    var bit = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (luma(x + 1, y) > luma(x, y)) h |= 1L << bit
        bit += 1
        x += 1
      }
      y += 1
    }
    h
  }

  /** Perceptual-hash image near-dup pairs (`multimodal_phash`) — the
    * CLIP-era image dedup staple: every image to a 64-bit [[dHash]] in the
    * same partition-batched decode pass as [[mediaMeta]] (bytes never
    * shuffle; only (doc_id, hash) rows leave the scan stage), then pairs
    * at Hamming distance <= 3 via the pigeonhole band join: 4 bands x 16
    * bits — a pair within distance 3 differs in at most 3 bands, so at
    * least one band matches EXACTLY and the equi-join on (band, key) is
    * zero-miss. Verification is the native codegen'd `hamming64` over the
    * candidate pairs only.
    *
    * Why bands work HERE and were rejected for [[Dedup.simhash]]: SimHash
    * bits over a homogeneous text corpus are strongly correlated across
    * documents (shared vocabulary drags every sketch the same way), so
    * its 16-bit bands collide en masse. dHash bits are signs of local
    * pixel differences — near-independent across unrelated images — so
    * band buckets stay near-uniform per DISTINCT hash at any corpus
    * size.
    *
    * DUPLICATE-DENSITY DEFENSE (the r9 sf5 finding — 37 s, 58.7x for
    * 50x data): a corpus with d copies of one image put d rows in the
    * same bucket in ALL FOUR bands, so the candidate join emitted
    * 4·d²/2 rows per dup cluster before the distinct — candidate volume
    * grew with the SQUARE of duplicate density while the true answer
    * (the pair list) grows only with the cluster sizes. The fix
    * collapses the corpus to DISTINCT hash values first: the band join
    * runs over one row per distinct hash (bucket sizes now scale with
    * hash diversity, which banding keeps near-uniform), and doc pairs
    * are re-expanded afterwards by two output-sized equi-joins — the
    * within-cluster (identical hash, Hamming 0) pairs from one
    * phash-keyed self-join, the cross-cluster pairs from the verified
    * distinct-hash pairs. Every stage is now bounded by
    * O(distinct-hash band collisions + true output), never by
    * duplicate-density². MultimodalSpec proves the band generator
    * misses nothing: brute-force Hamming <= 3 over all pairs equals the
    * banded result exactly. */
  def imageNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.GraftSession.registerFunctions(spark) // hamming64
    val raw: Dataset[RawMedia] = Tables(spark, dir).documents
      .select(col("doc_id"), encode(col("text"), "utf-8").as("blob"))
      .as[RawMedia]
    val hashed = graft.GraftSession.trackCache(
      raw.mapPartitions(it => it.map(r => MediaHash(r.doc_id, dHash(r.blob)))).toDF())
    val distinctHash = hashed.select("phash").distinct()
    val banded = distinctHash.select(col("phash"),
        explode(expr("sequence(0, 3)")).as("band"))
      .withColumn("bkey",
        expr("shiftrightunsigned(phash, cast(band * 16 as int)) & 65535"))
    // distinct-hash pairs at Hamming 1..3 (0 = identical, handled below):
    // pigeonhole still zero-miss, buckets one-row-per-distinct-hash
    val candH = banded.select(col("phash").as("pa"), col("band"), col("bkey"))
      .join(banded.select(col("phash").as("pb"), col("band"), col("bkey")),
        Seq("band", "bkey"))
      .filter(col("pa") < col("pb"))
      .select("pa", "pb").distinct()
      .withColumn("hamming", expr("hamming64(pa, pb)").cast("long"))
      .filter(col("hamming") <= 3)
    // cross-cluster doc pairs: expand each qualifying hash pair to its
    // doc-id cross product (output-sized by definition), normalizing to
    // doc_a < doc_b (pa != pb, so each doc pair appears exactly once)
    val cross = candH
      .join(hashed.select(col("phash").as("pa"), col("doc_id").as("da")), Seq("pa"))
      .join(hashed.select(col("phash").as("pb"), col("doc_id").as("db")), Seq("pb"))
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"), col("hamming"))
    // within-cluster pairs: identical hash, Hamming 0 — one phash-keyed
    // self-join, emits exactly the true pair list
    val same = hashed.select(col("phash"), col("doc_id").as("doc_a"))
      .join(hashed.select(col("phash"), col("doc_id").as("doc_b")), Seq("phash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), lit(0L).as("hamming"))
    cross.unionByName(same)
  }

  private[graft] final case class FrameHash(doc_id: Long, frame_idx: Long, fhash: Long)

  /** dHash of ONE FRAME of the fake video: same 9x8 luma-difference
    * arithmetic as [[dHash]], with the sampling base shifted per 4-frame
    * group — the stub contract for "consecutive frames look alike, a new
    * shot re-frames everything" (frames inside a group hash identically;
    * each group jump resamples the blob). The hash arithmetic is the real
    * dHash; only the luma source is the deterministic stand-in. */
  private[graft] def frameDHash(blob: Array[Byte], frame: Long): Long = {
    if (blob.isEmpty) return 0L
    val n = blob.length
    val base = ((frame / 4) * 97L).toInt
    @inline def luma(x: Int, y: Int): Int =
      blob((((y * 9 + x) * 31 + base) % n + n) % n) & 0xFF
    var h = 0L
    var bit = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (luma(x + 1, y) > luma(x, y)) h |= 1L << bit
        bit += 1
        x += 1
      }
      y += 1
    }
    h
  }

  /** Video scene-cut detection (`multimodal_scene_cuts`) — the shot
    * segmentation every video training pipeline runs before sampling
    * frames: hash every frame perceptually in the decode pass, then mark
    * a CUT wherever consecutive frame hashes differ by more than the
    * threshold (Hamming > 10 — within a shot dHash moves a few bits;
    * a shot change re-frames most of the 64).
    *
    * Scale shape: the decode map emits (doc_id, frame_idx, fhash) — a
    * bounded per-video fan-out (≤16 frames here; a real pipeline samples
    * a capped frame grid exactly so this stays bounded), bytes never
    * leave the scan stage. The differencing is `lag` under a KEYED window
    * (one doc_id shuffle, per-video sort of its own ≤16 rows — SURVEY
    * §4's WindowExec rule), the verify arithmetic is the native codegen'd
    * `hamming64`, and the per-video rollup is the same keyed aggregation.
    * SQL-oracled since r10: the per-frame dHash is a pure function of
    * the utf-8 bytes, so DuckDB replays it byte-for-byte (the
    * (f div 4)·97 frame base included); MultimodalSpec additionally
    * proves the operator equals a driver-side brute-force recompute and
    * that the stub's 4-frame groups yield exactly ceil(n_frames/4)
    * scenes. */
  def sceneCuts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.GraftSession.registerFunctions(spark) // hamming64
    val raw: Dataset[RawMedia] = Tables(spark, dir).documents
      .select(col("doc_id"), encode(col("text"), "utf-8").as("blob"))
      .as[RawMedia]
    val frames = raw.mapPartitions { it =>
      it.flatMap { r =>
        val meta = FakeDecoder.decode(r)
        (0L until meta.n_frames).iterator.map(f => FrameHash(r.doc_id, f, frameDHash(r.blob, f)))
      }
    }.toDF()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("frame_idx")
    frames
      .withColumn("prev_hash", lag("fhash", 1).over(w))
      .withColumn("is_cut",
        when(col("prev_hash").isNotNull &&
          expr("hamming64(fhash, prev_hash)") > 10, 1L).otherwise(0L))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
        (sum("is_cut") + 1L).as("n_scenes"))
  }
}
