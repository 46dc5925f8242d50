package graft.operators

import graft.Tables
import graft.util.Caches._
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video as opaque `binary`
  * payloads with typed metadata, decoded/feature-extracted per
  * partition.
  *
  * The decode itself is a clearly-marked STUB (no image/audio codecs
  * in this environment): `FakeDecoder` derives deterministic
  * dimensions/features from the payload bytes. Everything around it —
  * schema, batch shape, partition-level iteration, metadata struct —
  * is the real plumbing a production decoder (JNI codec, ONNX encoder)
  * would slot into: `mapPartitions` gives one decoder instance per
  * partition (the Scala analogue of `mapInPandas` batching), so
  * expensive decoder init amortizes across the partition's rows.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, payload: Array[Byte])

  case class DecodedMedia(
      doc_id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      channels: Int,
      feature: Array[Float]
  )

  /** STUB decoder — stands in for a real image decode + feature
    * extraction. Deterministic in the payload bytes so tests are
    * stable; one instance per partition, mirroring real decoder
    * lifecycle.
    */
  final class FakeDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      var h = 1125899906842597L // FNV-ish rolling hash over the bytes
      payload.foreach(b => h = h * 31 + (b & 0xff))
      val width = 320 + math.floorMod(h, 1600).toInt
      val height = 240 + math.floorMod(h >> 16, 840).toInt
      val feature = Array.tabulate(8) { i =>
        math.floorMod(h >> (i * 7), 1000).toFloat / 1000f
      }
      (width, height, 3, feature)
    }
  }

  /** Partition-level decode: binary column → typed metadata + feature
    * vector. The per-partition decoder instance is the load-bearing
    * shape — swap FakeDecoder for a real codec and nothing else
    * changes.
    */
  def decodeAll(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = new FakeDecoder // one per partition, amortized init
      rows.map { r =>
        val (w, h, c, f) = decoder.decode(r.payload)
        DecodedMedia(r.doc_id, r.payload.length.toLong, w, h, c, f)
      }
    }
  }

  /** The BATCHED decode shape — rows grouped into fixed-size batches
    * inside each partition (the `mapInPandas`/Arrow batch contract a
    * vectorized codec wants: GPU decoders and inference runtimes take
    * a batch, not a row). `grouped` is lazy over the partition
    * iterator, so peak memory is one batch, not one partition;
    * differential spec pins output identical to the row-wise form.
    */
  def decodeAllBatched(
      media: Dataset[MediaRecord],
      batchSize: Int = 64
  ): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = new FakeDecoder
      rows.grouped(batchSize).flatMap { batch =>
        // a real vectorized codec consumes the whole batch at once;
        // the stub decodes per element inside the batch boundary
        batch.map { r =>
          val (w, h, c, f) = decoder.decode(r.payload)
          DecodedMedia(r.doc_id, r.payload.length.toLong, w, h, c, f)
        }
      }
    }
  }

  /** documents.text as a stand-in binary payload column (the driver
    * tables carry no real media; the binary cast exercises the same
    * byte-level path).
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** End-to-end: documents → binary payload → partition-decoded
    * metadata + 8-dim feature.
    */
  def decodedDocuments(spark: SparkSession, dir: String): DataFrame =
    decodeAll(mediaFromDocuments(spark, dir)).toDF()

  /** Aspect-fit thumbnail dimensions for the decoded (stub) images:
    * longest edge scaled to 256, integer math (floor), aspect ratio
    * preserved. The arithmetic that would parameterize a real resize
    * kernel; narrow map over the decode, no shuffle.
    */
  def resizeDims(spark: SparkSession, dir: String): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    decodedDocuments(spark, dir)
      .select(
        col("doc_id"),
        col("width"),
        col("height"),
        (col("width") * 256 / longest).cast("int").as("out_w"),
        (col("height") * 256 / longest).cast("int").as("out_h")
      )
  }

  /** Frame sampling over a (stub) video payload: derive a
    * deterministic frame count from the payload size, then emit every
    * strideth frame index with its 24fps millisecond timestamp. The
    * sampling itself is pure Catalyst (`sequence` + `explode`) — the
    * per-frame decode these indices would feed stays behind the same
    * partition-level stub as [[decodeAll]]. One narrow map + generate,
    * no shuffle: at 100 TB this parallelizes per input split.
    */
  /** The stub frame model shared by q48 and q116 — ONE policy site
    * (frame count = payload bytes mod 240 + 1; stride = max(1, n/8))
    * so both queries always derive the same frame set for the same
    * payload.
    */
  private def frameCount(payloadLen: Column): Column =
    (payloadLen % 240 + lit(1)).cast("int")

  private def frameStride(nFrames: Column): Column =
    greatest(lit(1), (nFrames / 8).cast("int"))

  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    val media = mediaFromDocuments(spark, dir).toDF()
    val withFrames = media
      .select(
        col("doc_id"),
        frameCount(length(col("payload"))).as("n_frames")
      )
      .withColumn("stride", frameStride(col("n_frames")))
    withFrames
      .select(
        col("doc_id"),
        col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, col("stride")))
          .as("frame_idx")
      )
      .withColumn("ts_ms", (col("frame_idx").cast("bigint") * 1000L / 24L).cast("bigint"))
  }

  /** q116: pooled frame embeddings — the video-representation shape:
    * stride-sample frames (q48's derivation), extract a per-frame
    * feature vector (deterministic stub keyed on the content rolling
    * hash + frame index — the seam where a real frame encoder slots
    * in), mean-pool per document. Output is (doc, dim, pooled) cells,
    * the q69 centroid layout, directly joinable into the similarity
    * stack. One narrow scan → explode(frames × dims) → one
    * partial-agg shuffle; nothing per-document ever collects.
    */
  def frameEmbeddings(
      spark: SparkSession,
      dir: String,
      dims: Int = 4
  ): DataFrame = {
    val base = graft.Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        graft.functions.RollingHash.rollingHash(col("text")).as("h"),
        frameCount(length(col("text").cast("binary"))).as("n_frames")
      )
      .withColumn("stride", frameStride(col("n_frames")))
    base
      .select(
        col("doc_id"),
        col("h"),
        col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, col("stride"))).as("f")
      )
      .select(
        col("doc_id"),
        col("n_frames"),
        explode(array((0 until dims).map { k =>
          struct(
            lit(k).as("dim"),
            (((col("h") + col("f").cast("long") * 2654435761L +
              lit(k.toLong * 40503L)) % 1000L).cast("double") / 1000.0)
              .as("v")
          )
        }: _*)).as("kv")
      )
      .groupBy(col("doc_id"), col("kv.dim").as("dim"))
      .agg(
        any_value(col("n_frames")).as("n_frames"),
        round(avg(col("kv.v")), 6).as("pooled")
      )
      .select(col("doc_id"), col("n_frames"), col("dim"), col("pooled"))
  }

  /** q222: cross-video duplicate-frame audit — stride-sample frames
    * (the q48 derivation), fingerprint each with the deterministic
    * per-frame stub hash (the q116 seam — a real pipeline slots a
    * perceptual hash here), and report every document whose sampled
    * frames also appear in ANOTHER document: sampled count, duplicated
    * count, duplicated fraction in ppm. The video twin of q196's
    * duplicate text windows: re-uploads, intros/outros, and shared
    * stock footage duplicate at the FRAME level long before two videos
    * are whole-file duplicates, and frame-level mass is what a
    * multimodal dedup pass actually budgets against.
    *
    * Scale: one narrow scan → frame explode (≤ 31 sampled frames per
    * doc) → one fingerprint groupBy (partial agg) + one join back on
    * the duplicated fingerprints (collision-bounded, tiny) → per-doc
    * rollup. No pairwise work anywhere.
    */
  def frameDedup(spark: SparkSession, dir: String): DataFrame = {
    val frames = graft.Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        graft.functions.RollingHash.rollingHash(col("text")).as("h"),
        frameCount(length(col("text").cast("binary"))).as("n_frames")
      )
      .withColumn("stride", frameStride(col("n_frames")))
      .select(
        col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1, col("stride"))).as("f"),
        col("h")
      )
      .withColumn(
        "fp",
        (col("h") + col("f").cast("long") * 2654435761L) % 1000000007L
      )
      // read three times: per-doc totals, dup-fingerprint set, rollup
      .cacheTracked()
    val dupFps = frames
      .groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .select(col("fp"))
    val perDoc = frames
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sampled"))
    val dupPerDoc = frames
      .join(dupFps, Seq("fp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup"))
    perDoc
      .join(dupPerDoc, Seq("doc_id"))
      .select(
        col("doc_id"),
        col("n_sampled"),
        col("n_dup"),
        graft.functions.IntMath
          .microRatio(col("n_dup"), col("n_sampled"))
          .as("dup_frac_ppm")
      )
  }

  /** q335: scene-cut detection — adjacent stride-sampled frames
    * (the q48 derivation) compared by their stub feature vectors
    * (the q116 seam — a real pipeline slots a frame encoder here):
    * a cut is an adjacent pair whose cosine drops below 0.5. The
    * video-curation primitive behind clip segmentation and
    * per-scene sampling budgets; per doc: sampled frames, cut
    * count, and the mean adjacent cosine (a smoothness score that
    * separates static slideware from cut-heavy content). Per-pair
    * cosines are micro-quantized before the exact-integer mean.
    *
    * Scale: narrow scan → bounded frame explode (≤ 31 sampled per
    * doc) → per-doc lead window (bounded) → one agg.
    */
  def sceneCuts(spark: SparkSession, dir: String): DataFrame = {
    val dims = 4
    val base = graft.Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        graft.functions.RollingHash.rollingHash(col("text")).as("h"),
        frameCount(length(col("text").cast("binary"))).as("n_frames")
      )
      .withColumn("stride", frameStride(col("n_frames")))
    val feat = array((0 until dims).map { k =>
      (((col("h") + col("f").cast("long") * 2654435761L +
        lit(k.toLong * 40503L)) % 1000L).cast("double") / 1000.0)
    }: _*)
    val frames = base
      .select(
        col("doc_id"),
        col("h"),
        explode(sequence(lit(0), col("n_frames") - 1, col("stride")))
          .as("f")
      )
      .withColumn("v", feat)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("f").asc)
    val pairs = frames
      .withColumn("vn", lead(col("v"), 1).over(w))
      .filter(col("vn").isNotNull)
    val dot = aggregate(
      zip_with(col("v"), col("vn"), (x, y) => x * y),
      lit(0.0),
      (acc, x) => acc + x
    )
    val na = sqrt(
      aggregate(transform(col("v"), x => x * x), lit(0.0),
        (acc, x) => acc + x)
    )
    val nb = sqrt(
      aggregate(transform(col("vn"), x => x * x), lit(0.0),
        (acc, x) => acc + x)
    )
    val cos = when(na * nb === 0.0, lit(0.0)).otherwise(dot / (na * nb))
    pairs
      .select(
        col("doc_id"),
        round(cos * 1e6).cast("long").as("c_micro")
      )
      .groupBy(col("doc_id"))
      .agg(
        (count(lit(1)) + 1).as("n_sampled"),
        sum(when(col("c_micro") < 500000L, 1L).otherwise(0L))
          .as("n_cuts"),
        graft.functions.IntMath
          .idivHalfUpSigned(sum(col("c_micro")), count(lit(1)) * lit(1000L))
          .as("mean_adj_cos_milli")
      )
  }

  /** q307: audio segment gating — the voice-activity-detection
    * pipeline shape: window the payload (500 ms windows, count keyed
    * on the byte length), score each window with the deterministic
    * per-window energy stub (the q116 seam — a real pipeline slots
    * an RMS/VAD model here), gate at energy ≥ 100‰, and merge
    * consecutive kept windows into segments via the gaps-and-islands
    * rank difference. Emits one row per kept segment with its window
    * span and exact mean energy — the artifact an ASR/data pipeline
    * feeds to transcription, with silence already dropped.
    *
    * Determinism: window energies are pure integer arithmetic on the
    * rolling content hash (no float, no overflow — both addends are
    * reduced mod 1000 before combining); segment stats are exact
    * integer sums.
    *
    * Scale: narrow scan → bounded window explode (≤ 123/doc) → a
    * per-doc islands window (bounded) → per-segment agg. No
    * cross-doc shuffle beyond the final agg.
    */
  def audioSegments(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        graft.functions.RollingHash.rollingHash(col("text")).as("h"),
        (length(col("text").cast("binary")) % 120 + lit(4))
          .cast("long")
          .as("n_windows")
      )
    val windows = base
      .select(
        col("doc_id"),
        col("n_windows"),
        explode(sequence(lit(0L), col("n_windows") - 1)).as("w"),
        col("h")
      )
      .withColumn(
        "energy_milli",
        pmod(
          pmod(col("h"), lit(1000L)) +
            pmod(col("w") * lit(2654435761L), lit(1000L)),
          lit(1000L)
        )
      )
    val kept = windows.filter(col("energy_milli") >= 100)
    val wr = Window.partitionBy(col("doc_id")).orderBy(col("w").asc)
    kept
      .withColumn("grp", col("w") - row_number().over(wr))
      .groupBy(col("doc_id"), col("grp"))
      .agg(
        min(col("w")).as("seg_start"),
        max(col("w")).as("seg_end"),
        count(lit(1)).as("n_windows"),
        graft.functions.IntMath
          .idivHalfUpSigned(sum(col("energy_milli")), count(lit(1)))
          .as("mean_energy_milli")
      )
      .select(
        col("doc_id"),
        col("seg_start"),
        col("seg_end"),
        col("n_windows"),
        col("mean_energy_milli")
      )
  }

  /** The per-image "pixel" stub: a deterministic pseudo-luminance in
    * [0, 256) derived from the payload's rolling hash and a pixel
    * index — the seam where a real decoder's downscaled 9×8
    * grayscale grid plugs in (the q116/q222 stub convention). Three
    * modular-arithmetic mixing rounds (square, affine, square — all
    * below 2⁶³, overflow-free on every engine): any scheme AFFINE in
    * the pixel index makes the pixel sequence an arithmetic
    * progression mod M whose comparison pattern collapses to a few
    * hundred classes — the squaring rounds give every bit of h
    * influence over every output byte (~498/500 distinct 16-bit
    * bands on 500 random hashes, the random-hash expectation).
    */
  private def pix(h: Column, k: Int): Column = {
    val m = 1000000007L
    val t0 = (h + lit(k.toLong * 2654435761L)) % lit(m)
    val t1 = (t0 * t0) % lit(m)
    val t2 = (t1 * lit(1103515245L) + t0) % lit(m)
    ((t2 * t2) % lit(m)) % lit(256L)
  }

  /** q451: perceptual-hash (dHash) image near-dup candidates — each
    * document's "image" payload is reduced to a 64-bit difference
    * hash (bit k = pixel k brighter than pixel k+1 on the stubbed
    * 65-pixel luminance scan; Krawetz's dHash), the hash splits into
    * four 16-bit bands, band-equality buckets generate candidate
    * pairs (the q23 SimHash banding topology applied to the
    * multimodal column), and candidates verify by full Hamming
    * distance ≤ 6. Output is the one-row audit: images hashed,
    * candidate pairs, verified near-dups, exact (distance-0) dups.
    * Frame-level dedup (q222) finds shared FOOTAGE; dHash finds
    * re-encodes/resizes of the SAME image, which hash-identity
    * misses the moment one byte of container metadata changes.
    *
    * Scale: one narrow scan → 4 band keys/doc → band-bucket
    * self-join (cost ∝ colliding pairs, never images²) → popcount
    * verification on the collided pairs only. With the stub
    * luminance, distinct payloads collide on a band with p ≈ 2⁻¹⁶ —
    * the real-decoder distribution is skewed (flat images), which
    * the q37 band-size audit pattern would monitor.
    */
  def imageDHashPairs(spark: SparkSession, dir: String): DataFrame = {
    val h = graft.functions.RollingHash.rollingHash(col("text"))
    def band(b: Int): Column =
      (0 until 16)
        .map { i =>
          val k = 16 * b + i
          when(pix(col("h"), k) > pix(col("h"), k + 1),
            lit(1L << i)).otherwise(lit(0L))
        }
        .reduce(_ + _)
    val imgs = Tables
      .documents(spark, dir)
      .select(col("doc_id"), h.as("h"))
      .select(
        col("doc_id"),
        band(0).as("b0"),
        band(1).as("b1"),
        band(2).as("b2"),
        band(3).as("b3")
      )
      // read by four band buckets + two pair-side joins
      .cacheTracked()
    val bands = imgs.select(
      col("doc_id"),
      explode(
        array(
          struct(lit(0).as("bi"), col("b0").as("bv")),
          struct(lit(1).as("bi"), col("b1").as("bv")),
          struct(lit(2).as("bi"), col("b2").as("bv")),
          struct(lit(3).as("bi"), col("b3").as("bv"))
        )
      ).as("e")
    )
    val keyed = bands.select(
      col("e.bi").as("bi"),
      col("e.bv").as("bv"),
      col("doc_id")
    )
    val cands = keyed
      .join(
        keyed.select(
          col("bi"),
          col("bv"),
          col("doc_id").as("doc_b")
        ),
        Seq("bi", "bv")
      )
      .filter(col("doc_id") < col("doc_b"))
      .select(col("doc_id").as("doc_a"), col("doc_b"))
      .distinct()
      .cacheTracked()
    val la = imgs.select(
      col("doc_id").as("doc_a"),
      col("b0").as("a0"), col("b1").as("a1"),
      col("b2").as("a2"), col("b3").as("a3"))
    val lb = imgs.select(
      col("doc_id").as("doc_b"),
      col("b0").as("c0"), col("b1").as("c1"),
      col("b2").as("c2"), col("b3").as("c3"))
    val dist = cands
      .join(la, Seq("doc_a"))
      .join(lb, Seq("doc_b"))
      .select(
        (bit_count(col("a0").bitwiseXOR(col("c0"))) +
          bit_count(col("a1").bitwiseXOR(col("c1"))) +
          bit_count(col("a2").bitwiseXOR(col("c2"))) +
          bit_count(col("a3").bitwiseXOR(col("c3"))))
          .cast("long")
          .as("hamming")
      )
    val nImages = imgs.agg(count(lit(1)).as("n_images"))
    dist
      .agg(
        count(lit(1)).as("n_candidate_pairs"),
        coalesce(sum(when(col("hamming") <= 6L, 1L).otherwise(0L)),
          lit(0L)).as("n_near_dup_pairs"),
        coalesce(sum(when(col("hamming") === 0L, 1L).otherwise(0L)),
          lit(0L)).as("n_exact_pairs")
      )
      .crossJoin(broadcast(nImages))
      .select(
        col("n_images"),
        col("n_candidate_pairs"),
        col("n_near_dup_pairs"),
        col("n_exact_pairs")
      )
  }
}
