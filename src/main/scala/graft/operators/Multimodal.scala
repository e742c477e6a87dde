package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing (SURVEY.md §2.2): treat image/audio/video as
  * opaque `binary` payloads with typed metadata, and run batch decode /
  * feature-extraction as a partition-wise pipeline.
  *
  * The Spark-side shape is the real thing — binary columns, metadata
  * struct, `mapPartitions` batch processing with a case-class Encoder (the
  * Scala analogue of `mapInPandas` batches). All THREE modalities have a
  * real pure-JVM codec path, dispatched by content sniff: PNG and JPEG
  * payloads go through `javax.imageio` into a luminance histogram, RIFF/WAVE payloads
  * through `javax.sound.sampled` PCM into an amplitude histogram, and
  * animated-GIF payloads through the multi-frame `javax.imageio` reader
  * into PNG-encoded sampled keyframes. Payloads no JVM codec covers (the
  * synthesized text-byte corpus assets; production H.264) take
  * `decodeStub`, a deterministic fake the DuckDB oracle reproduces —
  * swapping in a JNI codec call changes only that one function; schema,
  * partitioning and batch flow are unchanged and tested.
  */
object Multimodal {

  val FeatureDim = 16

  case class Asset(asset_id: Long, kind: String, payload: Array[Byte],
                   width: Int, height: Int)
  case class AssetFeatures(asset_id: Long, kind: String, n_bytes: Int,
                           features: Array[Float], decode_ok: Boolean,
                           decode_error: String)

  /** Synthesize an asset table from the documents corpus: payload = utf-8
    * bytes of the text standing in for an encoded image; metadata derived
    * deterministically. (In production this is `spark.read.format
    * ("binaryFile")` or a parquet of blobs.)
    */
  def assets(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id").as("asset_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("n_chars") % 640 + 32).cast("int").as("width"),
      (col("n_chars") % 480 + 32).cast("int").as("height"))

  /** STUB decoder for payloads no pure-JVM codec covers (video; synthetic
    * text-byte assets): PNG and WAV payloads take the REAL codecs below,
    * everything else this deterministic fake — a production build swaps in
    * a JNI codec call here (??? in this container — no video codec libs).
    * Deterministic fake: fold the bytes into a fixed-size float vector so
    * tests can assert exact values and the pipeline is end-to-end runnable.
    * Accumulation is INTEGER (exact) with a single final division, so the
    * same fold is reproducible in the DuckDB oracle's double arithmetic —
    * a float-accumulating loop would drift from any SQL re-expression.
    */
  private[graft] def decodeStub(payload: Array[Byte]): Array[Float] = {
    val acc = new Array[Long](FeatureDim)
    var i = 0
    while (i < payload.length) {
      acc(i % FeatureDim) += (payload(i) & 0xFF)
      i += 1
    }
    acc.map(s => (s / 255.0).toFloat)
  }

  // ——— REAL image decode (pure-JVM javax.imageio PNG) ———

  private val PngMagic: Array[Byte] =
    Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte)

  /** PNG payload sniff (8-byte signature). Dispatch is by content, not
    * kind metadata: the synthesized corpus assets carry text bytes under
    * kind=image and must keep flowing through the deterministic stub the
    * oracle reproduces, while genuine PNG blobs get the real codec.
    */
  private[graft] def isPng(payload: Array[Byte]): Boolean =
    payload.length >= PngMagic.length &&
      java.util.Arrays.equals(
        java.util.Arrays.copyOf(payload, PngMagic.length), PngMagic)

  // JPEG SOI marker (FF D8 FF — the third byte starts the first segment
  // marker, present in every JFIF/EXIF/raw-JPEG variant)
  private[graft] def isJpeg(payload: Array[Byte]): Boolean =
    payload.length >= 3 &&
      (payload(0) & 0xFF) == 0xFF && (payload(1) & 0xFF) == 0xD8 &&
      (payload(2) & 0xFF) == 0xFF

  /** REAL image feature extraction — javax.imageio ships pure-JVM PNG
    * AND JPEG codecs (one format-sniffing `read` call serves both), so
    * this half of the modality needs no native libs: decode the payload
    * and fold a FeatureDim-bin LUMINANCE HISTOGRAM (integer-weighted
    * BT.601 luma, exact integer counts, one final division — same
    * determinism discipline as [[decodeStub]]). JPEG determinism note:
    * the JDK's inverse-DCT is fixed, so decoding the SAME bytes is
    * reproducible; producing those bytes (lossy encode) is not part of
    * any oracle-checked path. Audio/video payloads keep their own
    * codecs/stub.
    */
  private[graft] def decodeImageFeatures(payload: Array[Byte]): Array[Float] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "image-signature payload failed to decode")
    val hist = new Array[Long](FeatureDim)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
          (rgb & 0xFF) * 114) / 1000
        hist(lum * FeatureDim / 256) += 1
        x += 1
      }
      y += 1
    }
    val n = img.getWidth.toLong * img.getHeight
    hist.map(c => (c.toDouble / n).toFloat)
  }

  // ——— REAL audio decode (pure-JVM javax.sound.sampled WAV/PCM) ———

  private val RiffMagic = "RIFF".getBytes("US-ASCII")
  private val WaveMagic = "WAVE".getBytes("US-ASCII")

  /** RIFF/WAVE container sniff (bytes 0–3 "RIFF", 8–11 "WAVE"). Content
    * dispatch for the same reason as [[isPng]]: synthesized corpus assets
    * carry text bytes under kind=audio and must keep the oracle-reproduced
    * stub; genuine WAV blobs get the real codec.
    */
  private[graft] def isWav(payload: Array[Byte]): Boolean =
    payload.length >= 12 &&
      java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(payload, 0, 4), RiffMagic) &&
      java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(payload, 8, 12), WaveMagic)

  /** REAL audio feature extraction — javax.sound.sampled parses WAV/PCM
    * in pure JVM, so this modality needs no native libs either: decode
    * the payload and fold a FeatureDim-bin AMPLITUDE HISTOGRAM over the
    * 16-bit samples (exact integer bin math, one final division — the
    * same determinism discipline as [[decodeImageFeatures]]).
    */
  private[graft] def decodeWavFeatures(payload: Array[Byte]): Array[Float] = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val fmt = in.getFormat
      require(fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16,
        s"unsupported WAV format (want 16-bit signed PCM): $fmt")
      val bytes = in.readAllBytes()
      val bb = java.nio.ByteBuffer.wrap(bytes).order(
        if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
        else java.nio.ByteOrder.LITTLE_ENDIAN)
      val hist = new Array[Long](FeatureDim)
      var n = 0L
      while (bb.remaining() >= 2) {
        // |−32768| clamps into the top bin; all other |s| ≤ 32767
        val amp = math.min(math.abs(bb.getShort.toInt), 32767)
        hist(amp * FeatureDim / 32768) += 1
        n += 1
      }
      require(n > 0, "WAV payload contains no samples")
      hist.map(c => (c.toDouble / n).toFloat)
    } finally in.close()
  }

  /** Partition-wise batch feature extraction: one decoder instance per
    * partition (the expensive-init amortization pattern of mapInPandas),
    * streaming through rows without materializing the partition. PNG
    * payloads take the real [[decodeImageFeatures]] codec (PNG or JPEG), WAV payloads the
    * real [[decodeWavFeatures]] codec; everything else the deterministic
    * stub.
    */
  def extractFeatures(spark: SparkSession, sfDir: String): Dataset[AssetFeatures] =
    extractFeaturesFrom(spark, {
      import spark.implicits._
      assets(spark, sfDir).as[Asset]
    })

  /** The same pipeline over any asset relation (streaming sources, test
    * frames with genuine PNG payloads, a binaryFile read in production).
    */
  def extractFeaturesFrom(spark: SparkSession,
                          in: Dataset[Asset]): Dataset[AssetFeatures] = {
    import spark.implicits._
    in.mapPartitions { it =>
      // per-partition init of the non-PNG (stub) decoders would happen here
      it.map { a =>
        // PERMISSIVE decode (the JsonCorpus quarantine discipline applied
        // to blobs): a payload that SNIFFS as a real format but fails its
        // codec quarantines the ROW (decode_ok=false, empty features,
        // error preserved) instead of failing the job — at 100 TB a
        // handful of truncated blobs per billion is the norm, and one
        // corrupt asset must not kill the pipeline. The quarantined rows
        // stay queryable for triage.
        val decoded: Either[Throwable, Array[Float]] =
          try Right {
            if (a.kind == "image" && (isPng(a.payload) || isJpeg(a.payload)))
              decodeImageFeatures(a.payload)
            else if (a.kind == "audio" && isWav(a.payload)) decodeWavFeatures(a.payload)
            else decodeStub(a.payload)
          } catch { case scala.util.control.NonFatal(e) => Left(e) }
        decoded match {
          case Right(feats) =>
            AssetFeatures(a.asset_id, a.kind, a.payload.length, feats,
              decode_ok = true, decode_error = "")
          case Left(e) =>
            AssetFeatures(a.asset_id, a.kind, a.payload.length,
              Array.empty[Float], decode_ok = false,
              decode_error = s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    }
  }

  /** Downstream analytics over extracted features: per-kind count, mean
    * payload size, mean first feature component — shows the decoded output
    * flowing back into relational ops.
    */
  def featureStats(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(spark, sfDir).toDF()
      .filter(col("decode_ok")) // stats are over decodable assets only
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("n_bytes")), 4).as("avg_bytes"),
        round(avg(element_at(col("features"), 1)), 4).as("avg_f0"))
      .orderBy("kind")

  // ——— resize (images) ———

  case class Thumb(asset_id: Long, width: Int, height: Int,
                   target_w: Int, target_h: Int, thumb: Array[Byte])

  /** STUB resize: a real implementation would decode + bilinear-resample
    * here. Deterministic fake: nearest-neighbor byte sampling of the
    * payload down to target_w×target_h "pixels", so output size and values
    * are exactly assertable while the Spark plumbing (typed batch map,
    * per-partition codec init point) is the real pattern.
    */
  private[graft] def resizeStub(payload: Array[Byte], tw: Int, th: Int): Array[Byte] = {
    val out = new Array[Byte](tw * th)
    if (payload.nonEmpty) {
      var j = 0
      while (j < out.length) {
        out(j) = payload(((j.toLong * payload.length) / out.length).toInt)
        j += 1
      }
    }
    out
  }

  /** REAL image resize — decode via javax.imageio (PNG or JPEG, one
    * sniffing `read`), NEAREST-NEIGHBOR resample with explicit integer
    * source-index math (no Graphics2D filtering, whose kernels are
    * JVM-implementation detail — this sampling is bit-deterministic
    * everywhere), PNG re-encode. Thumbnails re-encode as PNG even from
    * JPEG sources: PNG is lossless and byte-deterministic, where a JPEG
    * encode bakes in encoder-implementation noise. Source pixel for
    * target (x, y) is (x·W/tw, y·H/th) in floor arithmetic — the same
    * index rule as [[resizeStub]]'s byte sampling.
    */
  private[graft] def resizeImage(payload: Array[Byte], tw: Int, th: Int): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "image-signature payload failed to decode")
    val out = new java.awt.image.BufferedImage(tw, th,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < th) {
      val sy = (y.toLong * img.getHeight / th).toInt
      var x = 0
      while (x < tw) {
        out.setRGB(x, y, img.getRGB((x.toLong * img.getWidth / tw).toInt, sy))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  /** Partition-wise thumbnail generation over the image assets. Genuine
    * PNG payloads (content sniff, as everywhere in this module) take the
    * REAL decode → resample → re-encode path; the synthesized text-byte
    * assets keep the deterministic byte-sampling stand-in the oracle
    * reproduces. A PNG that fails its codec quarantines the row (empty
    * thumb) rather than failing the job — same discipline as
    * [[extractFeaturesFrom]].
    */
  def resizeImages(spark: SparkSession, sfDir: String,
                   targetW: Int, targetH: Int): Dataset[Thumb] =
    resizeImagesFrom(spark, {
      import spark.implicits._
      assets(spark, sfDir).filter(col("kind") === "image").as[Asset]
    }, targetW, targetH)

  /** The same thumbnail pipeline over any asset relation (test frames
    * with genuine PNG payloads, a binaryFile read in production).
    */
  def resizeImagesFrom(spark: SparkSession, in: Dataset[Asset],
                       targetW: Int, targetH: Int): Dataset[Thumb] = {
    import spark.implicits._
    in.mapPartitions { it =>
      it.map { a =>
        val thumb =
          if (isPng(a.payload) || isJpeg(a.payload))
            try resizeImage(a.payload, targetW, targetH)
            catch { case scala.util.control.NonFatal(_) => Array.empty[Byte] }
          else resizeStub(a.payload, targetW, targetH)
        Thumb(a.asset_id, a.width, a.height, targetW, targetH, thumb)
      }
    }
  }

  // ——— frame sampling (video) ———

  val FrameBytes = 256

  case class Frame(asset_id: Long, n_frames: Int, frame_idx: Int,
                   n_bytes: Int, data: Array[Byte], decode_ok: Boolean,
                   decode_error: String)

  // ——— REAL video decode (pure-JVM javax.imageio animated GIF) ———

  /** GIF container sniff ("GIF87a"/"GIF89a"). Same content-dispatch
    * discipline as [[isPng]]/[[isWav]]: the synthesized corpus assets carry
    * text bytes under kind=video and keep the byte-chunk stand-in the
    * oracle reproduces; genuine animated-GIF blobs get the real codec.
    */
  private[graft] def isGif(payload: Array[Byte]): Boolean =
    payload.length >= 6 &&
      payload(0) == 'G' && payload(1) == 'I' && payload(2) == 'F' &&
      payload(3) == '8' && (payload(4) == '7' || payload(4) == '9') &&
      payload(5) == 'a'

  /** REAL video keyframe extraction — animated GIF is the one multi-frame
    * format the JDK decodes natively, so this modality needs no native
    * libs either: open one ImageIO reader per payload, count frames, and
    * decode every `every`-th stored frame, re-encoding each as PNG so the
    * sampled frames compose directly with [[decodeImageFeatures]] (video →
    * keyframes → image features, the standard multimodal fan-out).
    *
    * Decodes STORED frames; a production build layering frame-composition
    * (GIF disposal methods, inter-frame patches) or a true codec (H.264
    * via JNI) swaps only this function — the batch flow is unchanged.
    */
  private[graft] def decodeGifFrames(payload: Array[Byte],
                                     every: Int): Seq[(Int, Int, Array[Byte])] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext, "GIF-signature payload has no ImageIO reader")
      val reader = readers.next()
      try {
        reader.setInput(iis, false, true) // random access: getNumImages needs it
        val n = reader.getNumImages(true)
        require(n > 0, "GIF payload contains no frames")
        (0 until n by every).map { i =>
          val img = reader.read(i)
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          (n, i, out.toByteArray)
        }
      } finally reader.dispose()
    } finally iis.close()
  }

  /** Sample every `every`-th frame of each video payload — the
    * keyframe-extraction batch shape: one row per sampled frame, emitted
    * lazily from `mapPartitions`. GIF payloads (sniffed by signature) take
    * the REAL [[decodeGifFrames]] codec and yield PNG-encoded frames;
    * everything else takes the deterministic fixed-size byte-chunk
    * stand-in. The per-asset fan-out happens inside the partition — no
    * shuffle, no driver involvement. A payload that sniffs as GIF but
    * fails its codec quarantines the ASSET (one decode_ok=false row, error
    * preserved) instead of failing the job — the blob-side analogue of the
    * JsonCorpus corrupt-record discipline.
    */
  def sampleFrames(spark: SparkSession, sfDir: String,
                   every: Int): Dataset[Frame] = {
    import spark.implicits._
    sampleFramesFrom(spark,
      assets(spark, sfDir).filter(col("kind") === "video").as[Asset], every)
  }

  /** The same frame-sampling pipeline over any asset relation (streaming
    * sources, test frames with genuine animated-GIF payloads, a binaryFile
    * read in production).
    */
  def sampleFramesFrom(spark: SparkSession, in: Dataset[Asset],
                       every: Int): Dataset[Frame] = {
    import spark.implicits._
    in.mapPartitions { it =>
      it.flatMap { a =>
        if (isGif(a.payload)) {
          try decodeGifFrames(a.payload, every).iterator.map { case (n, i, png) =>
            Frame(a.asset_id, n, i, png.length, png,
              decode_ok = true, decode_error = "")
          } catch {
            case scala.util.control.NonFatal(e) =>
              Iterator.single(Frame(a.asset_id, 0, -1, 0, Array.empty[Byte],
                decode_ok = false,
                decode_error = s"${e.getClass.getSimpleName}: ${e.getMessage}"))
          }
        } else {
          val n = (a.payload.length + FrameBytes - 1) / FrameBytes
          (0 until n by every).iterator.map { i =>
            val start = i * FrameBytes
            val len = math.min(FrameBytes, a.payload.length - start)
            Frame(a.asset_id, n, i, len,
              java.util.Arrays.copyOfRange(a.payload, start, start + len),
              decode_ok = true, decode_error = "")
          }
        }
      }
    }
  }

  /** Per-video frame-sampling stats over the REAL frame rows (not derived
    * arithmetically): total frames, sampled count, sampled bytes. The
    * DuckDB oracle recomputes the same numbers independently from payload
    * lengths, verifying the chunk/sample geometry end-to-end.
    */
  def frameSampleStats(spark: SparkSession, sfDir: String,
                       every: Int): DataFrame =
    sampleFrames(spark, sfDir, every).toDF()
      .filter(col("decode_ok")) // stats are over decodable assets only
      .groupBy(col("asset_id"))
      .agg(
        first(col("n_frames")).as("n_frames"),
        count(lit(1)).cast("int").as("n_sampled"),
        sum(col("n_bytes")).cast("int").as("bytes_sampled"))
      .orderBy("asset_id")

  // ——— Perceptual-hash image dedup ———
  //
  // Byte-identical dedup (sha256, q_exact_dedup) misses re-encoded /
  // slightly-edited images — the dominant duplicate class in a scraped
  // image corpus. The standard fix is a PERCEPTUAL hash over DECODED
  // PIXELS: a small signature of the image's coarse luminance structure,
  // deduped by Hamming distance, so a PNG and a JPEG encode of the same
  // pixels collide while the byte streams share nothing.
  //
  // Pipeline: render/ingest encoded images → REAL codec decode
  // ([[decodeLumaGrid]], javax.imageio) → fixed 63×8 luma grid,
  // materialized once per corpus ([[ensureLumaGrid]]) →
  // [[graft.functions.BlockHashExpr.blockHash63]] over the packed grid
  // bytes (row-major width 63, so hash block j ≡ grid COLUMN j) →
  // banded candidate join → exact Hamming verify → CC labels.

  /** Luma-grid geometry: width 63 matches the 63 blockhash blocks (byte
    * i joins block i mod 63; row-major width-63 packing makes block j
    * exactly column j), height 8 gives each block an 8-pixel sample.
    */
  val GridW = 63
  val GridH = 8

  /** Rendered fixture images are PxScale× the grid in each dimension, so
    * the decode path exercises a genuine downsample, never an identity
    * byte copy.
    */
  private val PxScale = 2

  case class PixelAsset(asset_id: Long, payload: Array[Byte])
  case class LumaGridRow(asset_id: Long, luma: Array[Byte])

  /** Deterministic luminance of grid column `x` for fixture asset
    * `assetId` — the integer formula BOTH engines replay (the Spark side
    * through a real PNG encode→decode round trip, the oracle directly in
    * SQL): assets group in fours (gid = id/12 over the id ≡ 0 mod 3
    * image ids), column x of the group's base pattern is bright (190) or
    * dark (60) by the top bit of a Knuth mix, and group member
    * m = (id%12)/3 INVERTS columns 0..m−1 (250−base swaps 60↔190) — so
    * members sit at pairwise Hamming distance |m₁−m₂| ≤ 3 and distinct
    * groups at ~31: exactly the geometry a maxDist=3 near-dup pass must
    * recover.
    */
  private[graft] def lumaAt(assetId: Long, x: Int): Int = {
    val gid = assetId / 12
    val m = ((assetId % 12) / 3).toInt
    // The per-(group, column) bit needs a REAL avalanche hash, not an
    // affine mix: any affine formula makes all group patterns one
    // rotation family, so groups at Fibonacci-like separations collapse
    // to Hamming ≤ 3 and merge entire clusters (caught by
    // MultimodalPixelSpec when a plain Knuth mix was tried). Two
    // xorshift-multiply rounds; constants < 2^31 so every product stays
    // inside int64 for the SQL replay. Validated empirically: min
    // cross-group member distance 9 over 8,000 groups (19× the sf0.1
    // corpus), balanced popcounts.
    val base = {
      // reduced mod 2^32 BEFORE the first multiply: identity for every
      // fixture id in use, and keeps (h^(h>>16))*c inside int64 for BOTH
      // engines at ANY id scale (DuckDB raises on BIGINT overflow where
      // Scala would wrap silently — a trap at replicated-corpus ids)
      var h = (gid * 63L + x + 1) % 4294967296L
      h = ((h ^ (h >> 16)) * 2146121005L) % 4294967296L
      h = ((h ^ (h >> 15)) * 1655765949L) % 4294967296L
      h ^= h >> 16
      if (h >= 2147483648L) 190 else 60
    }
    if (x < m) 250 - base else base
  }

  /** Render the fixture pixels for one asset: grayscale (r=g=b=luma, so
    * BT.601 integer luma recovers the exact value), flat 2×2 cells per
    * grid column.
    */
  private[graft] def renderImage(assetId: Long): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(GridW * PxScale, GridH * PxScale,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val l = lumaAt(assetId, x / PxScale)
        img.setRGB(x, y, (l << 16) | (l << 8) | l)
        x += 1
      }
      y += 1
    }
    img
  }

  // ImageIO's default stream cache is DISK-backed: every encode/decode
  // creates (and deletes) a temp spool file behind a shared lock, which
  // convoys the moment the codec pass runs on many cores (measured: the
  // 32-way luma build spent ~24 task-seconds on ~1 s of actual codec
  // work). Payloads here are in-memory byte arrays — spool to memory.
  // One JVM-wide switch, runs wherever this object first loads (driver
  // and executors alike).
  javax.imageio.ImageIO.setUseCache(false)

  private[graft] def encodeImage(img: java.awt.image.BufferedImage,
                                 format: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, bos),
      s"no ImageIO writer for format $format")
    bos.toByteArray
  }

  /** The encoded-image fixture corpus: one REAL PNG per image-kind id
    * (doc_id ≡ 0 mod 3), rendered and encoded inside the partition — in
    * production this relation is a `binaryFile` read or a blob parquet;
    * everything downstream is payload-agnostic.
    */
  def pixelImageAssets(spark: SparkSession,
                       sfDir: String): Dataset[PixelAsset] = {
    import spark.implicits._
    // Codec parallelism rides the documents-scan spread (Tables.documents
    // round-robins a one-task scan over the slots before this map runs —
    // guide §2.6): the render/encode/decode pass is the expensive per-row
    // step and must never run serially on one core.
    Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id =>
        PixelAsset(id, encodeImage(renderImage(id), "png"))))
  }

  /** REAL decode → fixed-size luma grid: javax.imageio decodes the
    * payload (PNG or JPEG, format-sniffing read), nearest-neighbor
    * sampling picks GridW×GridH source pixels (source for grid (x,y) is
    * (x·W/GridW, y·H/GridH), the [[resizeImage]] index rule), BT.601
    * integer luma folds each to one byte, packed row-major. This is the
    * function a production build keeps verbatim — only the fixture
    * RENDERER above is synthetic.
    */
  private[graft] def decodeLumaGrid(payload: Array[Byte]): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "image payload failed to decode")
    val out = new Array[Byte](GridW * GridH)
    var y = 0
    while (y < GridH) {
      val sy = (y.toLong * img.getHeight / GridH).toInt
      var x = 0
      while (x < GridW) {
        val rgb = img.getRGB((x.toLong * img.getWidth / GridW).toInt, sy)
        val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
          (rgb & 0xFF) * 114) / 1000
        out(y * GridW + x) = lum.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Materialize (asset_id, decoded luma grid) once per corpus state —
    * the decode is the expensive per-asset step (a real codec pass), and
    * all three dedup queries plus any feature consumer serve from the
    * artifact instead of re-decoding. Keyed on the documents listing
    * signature like every other corpus-derived artifact.
    */
  private[graft] def ensureLumaGrid(spark: SparkSession, sfDir: String): String =
    graft.util.Scratch.memoizedDir(spark,
      "graft_lumagrid_" + graft.util.Scratch.valueToken(sfDir),
      Tables.listingSig(Tables.documents(spark, sfDir))) { path =>
      import spark.implicits._
      pixelImageAssets(spark, sfDir)
        .mapPartitions(_.map(a => LumaGridRow(a.asset_id, decodeLumaGrid(a.payload))))
        .toDF()
        .write.mode("overwrite").parquet(path)
    }

  /** The unordered signature relation — what every internal consumer
    * joins against: blockhash63 over the MATERIALIZED luma grids (a
    * parquet scan + one codegen'd hash per row; the codec already ran at
    * artifact build). The output sort lives ONLY in the declared
    * [[imagePhash]] query: feeding a sorted relation into the pair join
    * planted a corpus-sized range exchange + sort on BOTH join legs for
    * an ordering the join immediately destroyed (caught in plan review).
    */
  private def imagePhashRelation(spark: SparkSession,
                                 sfDir: String): DataFrame =
    spark.read.parquet(ensureLumaGrid(spark, sfDir))
      .select(col("asset_id"),
        graft.functions.BlockHashExpr.blockHash63(col("luma")).as("phash"))

  /** (asset_id, phash) for every image asset — a PIXEL-derived
    * perceptual signature: the phash is computed from the decoded luma
    * grid, so re-encodes of the same pixels (PNG vs JPEG — spec-pinned
    * in MultimodalPixelSpec) collide, which the r15 byte-level signature
    * could not do.
    */
  def imagePhash(spark: SparkSession, sfDir: String): DataFrame =
    imagePhashRelation(spark, sfDir).orderBy("asset_id")

  /** Image near-dup pairs with GUARANTEED recall at `maxDist` ≤ 3: split
    * the 63 signature bits into 4 chunks (widths 15/16/16/16) — any pair
    * within Hamming distance 3 agrees on ≥1 chunk by pigeonhole (Manku
    * et al., WWW'07, the q_simhash_pairs construction) — bucket-join on
    * (chunk_idx, chunk), then verify candidates by exact
    * bit_count(xor). The join is linear in bucket occupancy (2^15+
    * buckets per chunk), never the all-pairs product; at 100 TB the
    * chunk relation shuffles once on its natural key.
    */
  def imageNearDupPairs(spark: SparkSession, sfDir: String,
                        maxDist: Int = 3): DataFrame =
    imageNearDupPairsRelation(spark, sfDir, maxDist)
      .orderBy("asset_a", "asset_b")

  /** Banded Hamming candidate pairing over any 63-bit signature relation
    * `(id, h)` — the shared engine under the image AND audio near-dup
    * tiers: split the 63 bits into maxDist+1 chunks (any pair within
    * Hamming maxDist agrees on ≥1 chunk by pigeonhole — Manku et al.,
    * WWW'07), bucket-join on (chunk_idx, chunk), exact-verify candidates
    * by bit_count(xor). Linear in bucket occupancy, never the all-pairs
    * product; at 100 TB the chunk relation shuffles once on its natural
    * key.
    *
    * Unordered by design: [[graft.operators.Dedup.dupClustersFromPairs]]
    * checkpoints its edge build and EliminateSorts cannot reach across a
    * checkpoint boundary, so a sorted input would execute a useless
    * pair-graph range exchange + global sort on both unionAll legs.
    * Presentation sorts live only in the declared queries.
    */
  private[graft] def bandedHammingPairs(sig: DataFrame, idPrefix: String,
                                        maxDist: Int): DataFrame = {
    val nChunks = maxDist + 1
    val bounds = (0 to nChunks).map(i => i * 63 / nChunks)
    val chunks = sig.select(col("id"), col("h"),
        posexplode(array((0 until nChunks).map { c =>
          val width = bounds(c + 1) - bounds(c)
          shiftright(col("h"), bounds(c)).bitwiseAND((1L << width) - 1)
        }: _*)))
      .toDF("id", "h", "chunk_idx", "chunk")
    chunks.as("x").join(chunks.as("y"), Seq("chunk_idx", "chunk"))
      .where(col("x.id") < col("y.id"))
      .select(col("x.id").as(s"${idPrefix}_a"), col("y.id").as(s"${idPrefix}_b"),
        bit_count(col("x.h").bitwiseXOR(col("y.h")))
          .cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** The unordered image pair relation — the CC loop's input. */
  private def imageNearDupPairsRelation(spark: SparkSession, sfDir: String,
                                        maxDist: Int): DataFrame =
    bandedHammingPairs(
      imagePhashRelation(spark, sfDir)
        .select(col("asset_id").as("id"), col("phash").as("h")),
      "asset", maxDist)

  /** q_image_dup_clusters: the dedup DECISION over the pair evidence —
    * connected components of the near-dup graph (duplicates chain
    * A~B~C, so pairs alone can't pick keepers), labeling each clustered
    * image with its component's min asset_id; the label holder is the
    * keeper, everything else drops. Rides [[Dedup.dupClustersFromPairs]]
    * — the same O(log d)-round min-label propagation the text pipeline
    * uses, on a graph that is the DEDUP OUTPUT (pairs ≪ corpus).
    */
  def imageDupClusters(spark: SparkSession, sfDir: String,
                       maxDist: Int = 3): DataFrame =
    Dedup.dupClustersFromPairs(spark,
        imageNearDupPairsRelation(spark, sfDir, maxDist)
          .select(col("asset_a").as("doc_a"), col("asset_b").as("doc_b")),
        // measured-count shortcut: a Hamming≤3 phash graph is sparse —
        // when it lands under 100k symmetric edges the driver union-find
        // replaces O(log d) full Spark jobs of pure setup cost; a larger
        // measured graph still takes the distributed loop
        localEdgeThreshold = 100000L)
      .select(col("doc_id").as("asset_id"), col("cluster_id"),
        col("cluster_size"),
        (col("doc_id") === col("cluster_id")).as("is_keeper"))
      .orderBy("asset_id")

  // ——— Audio near-dup (frame-banded energy signature) ———
  //
  // The audio twin of the pixel image dedup: re-encoded / re-sampled
  // audio shares no bytes with its original, so dedup needs a signature
  // of the decoded SIGNAL. Pipeline: render/ingest WAV → REAL codec
  // decode (javax.sound.sampled) → 63-frame mean-|amplitude| energy
  // profile folded to one byte per frame ([[decodeAudioSig]]),
  // materialized per corpus ([[ensureAudioSig]]) → blockhash63 over the
  // 63 profile bytes (63 bytes ⇒ hash block j IS frame j) → the shared
  // [[bandedHammingPairs]] candidate join → exact verify → CC labels.

  /** 63 frames matches the 63 blockhash blocks; 128 samples per frame
    * keeps fixture payloads small (~16 KB) while the per-frame mean is a
    * genuine multi-sample aggregate.
    */
  val AudioFrames = 63
  val FrameSamples = 128

  case class AudioSigRow(asset_id: Long, sig: Array[Byte])

  /** Deterministic mean |amplitude| of frame `j` for fixture asset
    * `assetId` — the audio analogue of [[lumaAt]]: the same 4-member
    * group geometry (gid = id/12 over the id ≡ 1 mod 3 audio ids,
    * member m = (id%12)/3 inverts frames 0..m−1, 21000−base swaps
    * 3000↔18000) with the same validated avalanche mix under a
    * domain-separation salt (min cross-group member distance 10 over
    * 8,000 groups). 18000>>7 = 140 and 3000>>7 = 23, so the profile
    * bytes are exactly replayable.
    */
  private[graft] def ampAt(assetId: Long, j: Int): Int = {
    val gid = assetId / 12
    val m = ((assetId % 12) / 3).toInt
    val base = {
      var h = (gid * 63L + j + 1 + 15485863L) % 4294967296L
      h = ((h ^ (h >> 16)) * 2146121005L) % 4294967296L
      h = ((h ^ (h >> 15)) * 1655765949L) % 4294967296L
      h ^= h >> 16
      if (h >= 2147483648L) 18000 else 3000
    }
    if (j < m) 21000 - base else base
  }

  /** Render one fixture asset as a REAL RIFF/WAVE payload: 16-bit signed
    * little-endian mono PCM, alternating ±amp per sample (so the frame's
    * mean |amplitude| is exactly amp), 44-byte canonical header — the
    * format javax.sound's codec parses back.
    */
  private[graft] def renderWav(assetId: Long): Array[Byte] = {
    val n = AudioFrames * FrameSamples
    val dataLen = n * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(8000).putInt(16000) // sample rate, byte rate
      .putShort(2).putShort(16) // block align, bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      val a = ampAt(assetId, i / FrameSamples)
      out.putShort((if ((i & 1) == 0) a else -a).toShort)
      i += 1
    }
    out.array()
  }

  /** REAL decode → 63-byte energy profile: javax.sound parses the WAV
    * container and hands back 16-bit PCM; frame j = samples
    * [j·n/63, (j+1)·n/63) (any length divides evenly into 63 ranges);
    * each frame folds to mean |amplitude| >> 7 — one byte, exact integer
    * arithmetic. Production keeps this function verbatim (a lossy-codec
    * build swaps the AudioSystem call for a JNI decoder).
    */
  // The platform WAV codec, resolved ONCE per JVM: AudioSystem's
  // per-call provider lookup goes through a global synchronized service
  // registry, which convoys a multi-core decode pass exactly like the
  // ImageIO disk cache above (guide §4.5 — hoist heavyweight lookup out
  // of the per-row path). Decoding still runs through the real
  // javax.sound SPI codec; only the lookup is hoisted.
  private lazy val wavReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val b = Seq.newBuilder[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) b += it.next()
    b.result()
  }

  private def openAudio(payload: Array[Byte]): javax.sound.sampled.AudioInputStream = {
    val bin = new java.io.ByteArrayInputStream(payload)
    wavReaders.iterator.flatMap { r =>
      bin.reset()
      try Some(r.getAudioInputStream(bin))
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => None }
    }.nextOption().getOrElse(
      // no registered SPI claims the payload — same failure the
      // AudioSystem path would raise
      javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload)))
  }

  private[graft] def decodeAudioSig(payload: Array[Byte]): Array[Byte] = {
    val in = openAudio(payload)
    try {
      val fmt = in.getFormat
      require(fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16,
        s"unsupported WAV format (want 16-bit signed PCM): $fmt")
      val bytes = in.readAllBytes()
      val bb = java.nio.ByteBuffer.wrap(bytes).order(
        if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
        else java.nio.ByteOrder.LITTLE_ENDIAN)
      val n = bytes.length / 2
      require(n >= AudioFrames, s"payload too short: $n samples")
      val samples = new Array[Int](n)
      var i = 0
      while (bb.remaining() >= 2) {
        samples(i) = math.min(math.abs(bb.getShort.toInt), 32767)
        i += 1
      }
      val sig = new Array[Byte](AudioFrames)
      var j = 0
      while (j < AudioFrames) {
        val from = (j.toLong * n / AudioFrames).toInt
        val to = ((j + 1).toLong * n / AudioFrames).toInt
        var s = 0L
        var k = from
        while (k < to) { s += samples(k); k += 1 }
        sig(j) = ((s / (to - from)) >> 7).toByte
        j += 1
      }
      sig
    } finally in.close()
  }

  /** Materialize (asset_id, energy profile) once per corpus state — the
    * codec pass runs once; all three audio dedup queries serve from the
    * artifact. Audio ids are doc_id ≡ 1 mod 3, matching [[assets]]' kind
    * mapping.
    */
  private[graft] def ensureAudioSig(spark: SparkSession, sfDir: String): String =
    graft.util.Scratch.memoizedDir(spark,
      "graft_audiosig_" + graft.util.Scratch.valueToken(sfDir),
      Tables.listingSig(Tables.documents(spark, sfDir))) { path =>
      import spark.implicits._
      // codec parallelism rides the documents-scan spread — same
      // rationale as [[pixelImageAssets]]
      Tables.documents(spark, sfDir)
        .filter(col("doc_id") % 3 === 1)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id =>
          AudioSigRow(id, decodeAudioSig(renderWav(id)))))
        .toDF()
        .write.mode("overwrite").parquet(path)
    }

  private def audioHashRelation(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(ensureAudioSig(spark, sfDir))
      .select(col("asset_id"),
        graft.functions.BlockHashExpr.blockHash63(col("sig")).as("ahash"))

  /** q_audio_sig: (asset_id, ahash) — the 63-bit frame-energy signature
    * per audio asset, derived from DECODED samples through the real
    * javax.sound codec.
    */
  def audioSig(spark: SparkSession, sfDir: String): DataFrame =
    audioHashRelation(spark, sfDir).orderBy("asset_id")

  /** q_audio_neardup: audio near-dup pairs with guaranteed recall at
    * Hamming ≤ maxDist — the shared pigeonhole banding over the audio
    * signatures.
    */
  def audioNearDupPairs(spark: SparkSession, sfDir: String,
                        maxDist: Int = 3): DataFrame =
    audioNearDupPairsRelation(spark, sfDir, maxDist)
      .orderBy("asset_a", "asset_b")

  private def audioNearDupPairsRelation(spark: SparkSession, sfDir: String,
                                        maxDist: Int): DataFrame =
    bandedHammingPairs(
      audioHashRelation(spark, sfDir)
        .select(col("asset_id").as("id"), col("ahash").as("h")),
      "asset", maxDist)

  /** q_audio_dup_clusters: CC labels over the audio near-dup graph —
    * the dedup decision, riding the same measured small-graph shortcut
    * as the image twin.
    */
  def audioDupClusters(spark: SparkSession, sfDir: String,
                       maxDist: Int = 3): DataFrame =
    Dedup.dupClustersFromPairs(spark,
        audioNearDupPairsRelation(spark, sfDir, maxDist)
          .select(col("asset_a").as("doc_a"), col("asset_b").as("doc_b")),
        localEdgeThreshold = 100000L)
      .select(col("doc_id").as("asset_id"), col("cluster_id"),
        col("cluster_size"),
        (col("doc_id") === col("cluster_id")).as("is_keeper"))
      .orderBy("asset_id")
}
