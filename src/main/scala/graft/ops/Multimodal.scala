package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads are opaque `binary`
  * columns with typed metadata structs. Decode/feature-extract runs as a
  * partition-local batch transform (`mapPartitions` over rows — the Scala
  * analogue of `mapInPandas`): schema, partitioning, and batch shape are real.
  * Images use a REAL in-JVM codec ([[encodePng]]/[[decodeImage]]/
  * [[resizeImages]], `javax.imageio` — PNG/JPEG/BMP ship with the JDK, zero
  * external deps); audio/video decode has no in-JDK codec, so those paths keep
  * the byte-level stand-ins ([[byteStats]], [[sampleFrames]]) whose plumbing
  * is identical to what a JNI codec would slot into.
  *
  * Scale design: payloads never pass through a shuffle — feature extraction is
  * narrow (per-partition), and downstream joins/groupBys carry only the small
  * extracted-feature columns, not the blobs. Partition sizing is governed by
  * `spark.sql.files.maxPartitionBytes`, so executor memory bounds hold no
  * matter how large the corpus is.
  */
object Multimodal {

  // ImageIO defaults to DISK-backed stream caches: every ImageIO.read/write/
  // createImage{In,Out}putStream call creates (and deletes) a temp FILE even
  // when the source/sink is an in-memory byte array — one fsync-able file per
  // image/frame-sequence, and a global registry lock on the hot path. All
  // payloads here are small in-memory buffers, so memory-cached streams are
  // strictly better (measured r15: q205 image near-dup 8.6 s → ~1 s at sf0.1
  // together with the single-scan banded join). Runs once per JVM when the
  // first codec closure touches this object.
  //
  // DOCUMENTED PROCESS-GLOBAL EFFECT (ADVICE r15): first use of any
  // Multimodal member disables ImageIO's disk-backed stream cache JVM-wide,
  // including for an embedding application's own ImageIO use. Decoded bytes
  // are unaffected — only the staging buffer moves from a temp file to
  // memory; an embedder that streams multi-GB images through ImageIO and
  // relies on disk staging can restore it with ImageIO.setUseCache(true)
  // after touching this object.
  javax.imageio.ImageIO.setUseCache(false)

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true))), nullable = true)))

  /** Wrap a text corpus as a fake media table: payload = UTF-8 bytes. Stands
    * in for `spark.read.format("binaryFile")` in production. */
  def asMediaTable(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(
      col("doc_id"),
      lit("image/fake").as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        (length(col(textCol)) % 640).cast("int").as("width"),
        (length(col(textCol)) % 480).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate")).as("meta"))

  /** Byte-level payload stats (length / rolling checksum / mean byte value) —
    * the modality-agnostic feature path for payloads with no in-JDK codec
    * (audio/video). Deterministic, derived from the raw bytes only. */
  private[ops] def byteStats(payload: Array[Byte]): (Int, Long, Double) = {
    if (payload == null) (0, 0L, 0.0)
    else {
      var checksum = 0L
      var lum = 0.0
      var i = 0
      while (i < payload.length) {
        checksum = checksum * 31 + (payload(i) & 0xff)
        lum += (payload(i) & 0xff)
        i += 1
      }
      (payload.length, checksum, if (payload.length == 0) 0.0 else lum / payload.length)
    }
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("mean_luma", DoubleType, nullable = false)))

  /** Generic partition-local batch transform — the mapInPandas-shaped
    * extension point: one iterator of rows in, one iterator out, no shuffle.
    * Use for any decode/feature-extract stage whose logic lives outside
    * Column expressions (codecs, model inference, external libs). */
  def transformBatches(df: DataFrame, outSchema: StructType)(
      f: Iterator[Row] => Iterator[Row]): DataFrame =
    // deliberately NO Par.spread here (r15): measured three ways at sf0.1
    // (blanket spread before/after the ImageIO disk-cache fix and after the
    // audio provider cache), fanning the small-input codec passes out to 32
    // partitions lost 1.5-3× on the WAV and near-dup gates (payload
    // round-robin exchange + 32-task stages against sub-second serial codec
    // work) and bought q157/q39 ~0.3-0.6 s — net loss every time. At 100-TB
    // scale the input scan already arrives in many splits and partition-local
    // decode parallelizes naturally; the serial small-input case is exactly
    // the regime where the exchange is pure overhead.
    df.sparkSession.createDataFrame(df.rdd.mapPartitions(f), outSchema)

  /** Partition-local batch feature extraction over the binary column (built
    * on [[transformBatches]]; blobs are dropped from the output so nothing
    * downstream shuffles payload bytes). */
  def extractFeatures(media: DataFrame): DataFrame =
    transformBatches(media.select("doc_id", "payload"), featureSchema) { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val (n, checksum, luma) = byteStats(payload)
        Row(id, n, checksum, luma)
      }
    }

  // ------------------------------------------------------------------ real
  // image codec: javax.imageio (in-JDK, zero external deps). PNG is lossless,
  // so encode→decode round-trips pixel-exactly — features extracted from the
  // decoded raster are deterministic and oracle-computable.

  /** Encode a solid-gray `width`×`height` PNG. Real bytes: the output starts
    * with the PNG magic and only a correct decoder recovers the dimensions
    * and pixel values from it. */
  private[ops] def encodePng(width: Int, height: Int, gray: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val g2 = img.createGraphics()
    try {
      g2.setColor(new java.awt.Color(gray & 0xff, gray & 0xff, gray & 0xff))
      g2.fillRect(0, 0, width, height)
    } finally g2.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image decode: parse the payload with ImageIO and return
    * (width, height, meanLuma). Luma is Rec.601 for color rasters, the single
    * band for grayscale. Throws on undecodable payloads — corrupt media
    * should fail loudly, not silently zero. */
  private[ops] def decodeImage(payload: Array[Byte]): (Int, Int, Double) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    val bands = raster.getNumBands
    var sum = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        sum += (if (bands >= 3)
          0.299 * raster.getSample(x, y, 0) + 0.587 * raster.getSample(x, y, 1) +
            0.114 * raster.getSample(x, y, 2)
        else raster.getSample(x, y, 0).toDouble)
        x += 1
      }
      y += 1
    }
    (w, h, sum / (w.toLong * h))
  }

  /** Documents → a media table with REAL PNG payloads: dimensions derive from
    * the text length and the fill level from the doc id, so every decoded
    * feature is computable by an independent engine straight from the
    * `documents` table (the oracle for q39). Encode is partition-local —
    * payloads are born and stay inside their partition. */
  def asPngMediaTable(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val in = docs.select(col("doc_id"), length(col(textCol)).cast("int").as("n"))
    transformBatches(in, mediaSchema) { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val n = r.getInt(1)
        val w = 4 + n % 29
        val h = 3 + n % 17
        Row(id, "image/png", encodePng(w, h, (id % 256).toInt),
          Row(w, h, null))
      }
    }
  }

  /** Patterned PNG encoder for the image-dedup gates: per-pixel gray from
    * an integer hash mix of (x, y, patternId) — every pattern id is an
    * independent noise field, so the dHash gradient signs of DISTINCT ids
    * are effectively independent coin flips (expected hamming ≈ 32 of 64;
    * a ≤ 4 collision is astronomically unlikely), while a re-encode of
    * the same id is byte-identical. A smooth/linear pattern would NOT
    * work here: dHash of a ramp is mostly-ones, and distinct ramps
    * collide — the earlier slope-triple design failed exactly that way.
    * `perturb` brightens ONE pixel by 3 — an invisible edit that leaves
    * the perceptual hash within a couple of bits. */
  private[ops] def encodePatternedPng(width: Int, height: Int, patternId: Long,
      perturb: Boolean): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    def mix(x: Int, y: Int): Int = {
      var v = x.toLong * 0x9E3779B1L + y.toLong * 0x85EBCA77L +
        patternId * 0xC2B2AE3DL
      v ^= (v >>> 15); v *= 0x27D4EB2FL; v ^= (v >>> 13)
      (v & 0xff).toInt
    }
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        raster.setSample(x, y, 0, mix(x, y))
        x += 1
      }
      y += 1
    }
    if (perturb) raster.setSample(width / 2, height / 2, 0,
      math.min(255, raster.getSample(width / 2, height / 2, 0) + 3))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Media table of REAL patterned PNGs from a spec relation
    * `(doc_id, pattern_id, n, perturb)` — doc_id keys the output row,
    * pattern_id selects the pixel pattern (copies of an image share it),
    * `n` sizes the raster, `perturb` applies the invisible one-pixel
    * edit. Encode is partition-local; payloads never cross a shuffle. */
  def asPatternedPngMediaTable(spec: DataFrame): DataFrame =
    transformBatches(
      spec.select(col("doc_id"), col("pattern_id"), col("n").cast("int"),
        col("perturb")), mediaSchema) { rows =>
      rows.map { r =>
        val n = r.getInt(2)
        val w = 16 + n % 17
        val h = 16 + n % 9
        Row(r.getLong(0), "image/png",
          encodePatternedPng(w, h, r.getLong(1), r.getBoolean(3)),
          Row(w, h, null))
      }
    }

  /** Perceptual difference-hash (dHash) of a decoded image: average-pool
    * the luma to a 9×8 grid, then bit i = "right cell brighter than left"
    * over each row's 8 adjacent pairs — 64 bits total. Identical images
    * hash identically; small edits flip few bits; structurally different
    * images land far apart in hamming space. */
  private[ops] def dhash64(payload: Array[Byte]): Long = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    val raster = img.getRaster
    val bands = raster.getNumBands
    val (w, h) = (img.getWidth, img.getHeight)
    def luma(x: Int, y: Int): Double =
      if (bands >= 3)
        0.299 * raster.getSample(x, y, 0) + 0.587 * raster.getSample(x, y, 1) +
          0.114 * raster.getSample(x, y, 2)
      else raster.getSample(x, y, 0).toDouble
    val grid = Array.ofDim[Double](8, 9)
    var gy = 0
    while (gy < 8) {
      val y0 = gy * h / 8
      val y1 = math.max(y0 + 1, (gy + 1) * h / 8)
      var gx = 0
      while (gx < 9) {
        val x0 = gx * w / 9
        val x1 = math.max(x0 + 1, (gx + 1) * w / 9)
        var sum = 0.0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += luma(x, y); x += 1 }
          y += 1
        }
        grid(gy)(gx) = sum / ((x1 - x0).toLong * (y1 - y0))
        gx += 1
      }
      gy += 1
    }
    var bits = 0L
    var i = 0
    while (i < 64) {
      val (row, pos) = (i / 8, i % 8)
      if (grid(row)(pos + 1) > grid(row)(pos)) bits |= (1L << i)
      i += 1
    }
    bits
  }

  val dhashSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("simhash", LongType, nullable = false)))

  /** Per-image perceptual hash relation `(doc_id, simhash)` — decode +
    * dHash in one partition-local pass (payloads never shuffle); the
    * output feeds the SAME banded-hamming machinery as text simhash. */
  def imageDHash(media: DataFrame): DataFrame =
    transformBatches(media.select("doc_id", "payload"), dhashSchema) { rows =>
      rows.map(r => Row(r.getLong(0), dhash64(r.getAs[Array[Byte]](1))))
    }

  /** Image near-duplicate pairs: perceptual dHash + multi-probe banded
    * hamming join ([[Dedup.simhashBandedPairs]] — guaranteed recall at
    * `maxHamming` by pigeonhole, candidates bounded by band-bucket
    * occupancy, no pairwise scan). Blobs are decoded exactly once and
    * only 8-byte hashes ever cross a shuffle. */
  def imageNearDups(media: DataFrame, maxHamming: Int = 4,
      blocksPerKey: Int = 1): DataFrame =
    Dedup.simhashBandedPairs(imageDHash(media), 64, maxHamming, blocksPerKey)

  /** Patterned WAV encoder for the audio-dedup gates: hash-noise PCM16
    * samples per (patternId, i) — distinct ids are independent noise
    * waveforms (energy-envelope hashes land ~32/64 bits apart) while a
    * re-encode of the same id is byte-identical. `perturb` nudges ONE
    * sample's amplitude by +3 — inaudible, envelope hash within a couple
    * of bits. */
  private[ops] def encodePatternedWav(patternId: Long, nSamples: Int,
      perturb: Boolean): Array[Byte] = {
    require(nSamples > 0, s"bad sample count $nSamples")
    val samples = new Array[Short](nSamples)
    var i = 0
    while (i < nSamples) {
      var v = i.toLong * 0x9E3779B1L + patternId * 0xC2B2AE3DL
      v ^= (v >>> 15); v *= 0x27D4EB2FL; v ^= (v >>> 13)
      samples(i) = ((v & 0x7ff) - 1024).toShort
      i += 1
    }
    if (perturb)
      samples(nSamples / 2) =
        math.min(1023, samples(nSamples / 2) + 3).toShort
    encodeWav(8000, samples)
  }

  /** Media table of REAL patterned WAVs from a spec relation
    * `(doc_id, pattern_id, n, perturb)` — the audio twin of
    * [[asPatternedPngMediaTable]]. */
  def asPatternedWavMediaTable(spec: DataFrame): DataFrame =
    transformBatches(
      spec.select(col("doc_id"), col("pattern_id"), col("n").cast("int"),
        col("perturb")), mediaSchema) { rows =>
      rows.map { r =>
        val n = 256 + r.getInt(2) % 257
        Row(r.getLong(0), "audio/wav",
          encodePatternedWav(r.getLong(1), n, r.getBoolean(3)),
          Row(null, null, 8000))
      }
    }

  /** Energy-envelope fingerprint of a mono PCM16 payload: split the
    * samples into 65 equal windows, compute each window's mean energy
    * (sum of squares over count), hash bit i = "window i+1 louder than
    * window i" — the audio analogue of the image dHash: identical audio
    * hashes identically, tiny edits flip few bits, different material
    * lands far apart. */
  private[ops] def audioEnvelopeHash64(payload: Array[Byte]): Long = {
    val ais = audioInputStream(payload)
    val f = ais.getFormat
    require(f.getSampleSizeInBits == 16 && !f.isBigEndian && f.getChannels == 1,
      s"expected mono PCM16LE, got $f")
    val bytes = ais.readAllBytes()
    val n = bytes.length / 2
    require(n >= 65, s"need >= 65 samples for the 65-window envelope, got $n")
    val energy = new Array[Double](65)
    var w = 0
    while (w < 65) {
      val s0 = w * n / 65
      val s1 = math.max(s0 + 1, (w + 1) * n / 65)
      var sum = 0.0
      var i = s0
      while (i < s1) {
        val s = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort
        sum += s.toDouble * s
        i += 1
      }
      energy(w) = sum / (s1 - s0)
      w += 1
    }
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (energy(i + 1) > energy(i)) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** Patterned animated-GIF encoder for the video-dedup gates: 72 frames
    * of hash-noise solid grays per (patternId, frame) — the temporal twin
    * of [[encodePatternedPng]]/[[encodePatternedWav]]. `perturb` nudges
    * ONE frame's gray by +2. */
  private[ops] def encodePatternedGif(patternId: Long, nFrames: Int,
      perturb: Boolean): Array[Byte] = {
    require(nFrames >= 66, s"need >= 66 frames for the envelope, got $nFrames")
    val grays = (0 until nFrames).map { i =>
      var v = i.toLong * 0x9E3779B1L + patternId * 0xC2B2AE3DL
      v ^= (v >>> 15); v *= 0x27D4EB2FL; v ^= (v >>> 13)
      (v & 0xff).toInt
    }
    val g2 = if (perturb)
      grays.updated(nFrames / 2, math.min(255, grays(nFrames / 2) + 2))
    else grays
    encodeGif(8, 8, g2)
  }

  /** Media table of REAL patterned animated GIFs from a spec relation
    * `(doc_id, pattern_id, n, perturb)`. */
  def asPatternedGifMediaTable(spec: DataFrame): DataFrame =
    transformBatches(
      spec.select(col("doc_id"), col("pattern_id"), col("n").cast("int"),
        col("perturb")), mediaSchema) { rows =>
      rows.map { r =>
        Row(r.getLong(0), "video/gif",
          encodePatternedGif(r.getLong(1), 66 + r.getInt(2) % 32,
            r.getBoolean(3)),
          Row(8, 8, null))
      }
    }

  /** Temporal-envelope fingerprint of an animated GIF: per-frame mean
    * luma, resampled to 65 equal bins over the frame sequence, hash bit
    * i = "bin i+1 brighter than bin i" — the VIDEO analogue of the image
    * dHash (spatial) and audio envelope hash (amplitude): scene-stable
    * edits flip few bits, different material lands ~32/64 apart. */
  private[ops] def videoEnvelopeHash64(payload: Array[Byte]): Long = {
    val (_, _, lumas) = decodeGifFrames(payload)
    val n = lumas.length
    require(n >= 65, s"need >= 65 frames for the 65-bin envelope, got $n")
    val bins = new Array[Double](65)
    var b = 0
    while (b < 65) {
      val f0 = b * n / 65
      val f1 = math.max(f0 + 1, (b + 1) * n / 65)
      var sum = 0.0
      var i = f0
      while (i < f1) { sum += lumas(i); i += 1 }
      bins(b) = sum / (f1 - f0)
      b += 1
    }
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (bins(i + 1) > bins(i)) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** Per-video fingerprint relation `(doc_id, simhash)`. */
  def videoFingerprint(media: DataFrame): DataFrame =
    transformBatches(media.select("doc_id", "payload"), dhashSchema) { rows =>
      rows.map(r => Row(r.getLong(0), videoEnvelopeHash64(r.getAs[Array[Byte]](1))))
    }

  /** Video near-duplicate pairs — the third modality over the SAME banded
    * hamming machinery; payloads decode once, only 8-byte hashes shuffle. */
  def videoNearDups(media: DataFrame, maxHamming: Int = 4,
      blocksPerKey: Int = 1): DataFrame =
    Dedup.simhashBandedPairs(videoFingerprint(media), 64, maxHamming, blocksPerKey)

  /** Per-clip fingerprint relation `(doc_id, simhash)` — decode +
    * envelope hash in one partition-local pass. */
  def audioFingerprint(media: DataFrame): DataFrame =
    transformBatches(media.select("doc_id", "payload"), dhashSchema) { rows =>
      rows.map(r => Row(r.getLong(0), audioEnvelopeHash64(r.getAs[Array[Byte]](1))))
    }

  /** Audio near-duplicate pairs: envelope fingerprint + the same
    * multi-probe banded hamming join as text simhash and image dHash —
    * payloads decode once, only 8-byte hashes shuffle. */
  def audioNearDups(media: DataFrame, maxHamming: Int = 4,
      blocksPerKey: Int = 1): DataFrame =
    Dedup.simhashBandedPairs(audioFingerprint(media), 64, maxHamming, blocksPerKey)

  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("luma_micros", LongType, nullable = false)))

  /** Partition-local REAL image feature extraction: ImageIO-decode each
    * payload, emit dimensions + mean luma in exact micro-units (float-hash-
    * proof). Blobs are dropped from the output — downstream stages never
    * shuffle payload bytes. */
  def extractImageFeatures(media: DataFrame): DataFrame =
    transformBatches(media.select("doc_id", "payload"), imageFeatureSchema) { rows =>
      rows.map { r =>
        val (w, h, luma) = decodeImage(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), w, h, math.floor(luma * 1e6 + 0.5).toLong)
      }
    }

  /** REAL image resize: decode, area-average each `factor`×`factor` block
    * into one output pixel (computed directly on raster samples — Graphics2D
    * drawImage would route gray pixels through an sRGB↔linear colorspace
    * conversion and distort values), re-encode as PNG. Partition-local like
    * every payload transform. */
  def resizeImages(media: DataFrame, factor: Int = 2): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false)))
    transformBatches(media.select("doc_id", "payload"), outSchema) { rows =>
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        require(img != null, "payload is not a decodable image")
        val (w, h) = (math.max(1, img.getWidth / factor), math.max(1, img.getHeight / factor))
        val in = img.getRaster
        val out = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val outRaster = out.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var sum = 0L
            var dy = 0
            while (dy < factor) {
              var dx = 0
              while (dx < factor) {
                sum += in.getSample(x * factor + dx, y * factor + dy, 0)
                dx += 1
              }
              dy += 1
            }
            outRaster.setSample(x, y, 0, (sum / (factor.toLong * factor)).toInt)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Row(r.getLong(0), bos.toByteArray, w, h)
      }
    }
  }

  /** STUB resize: a real implementation would decode + rescale the image
    * here; the stand-in keeps every `factor`-th payload byte (deterministic,
    * shape-preserving: binary in, smaller binary out) and scales the metadata
    * dims, exercising the exact plumbing a real resizer needs. */
  def resizeStub(media: DataFrame, factor: Int = 2): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true)))
    transformBatches(media.select(
        col("doc_id"), col("payload"), col("meta.width"), col("meta.height")), outSchema) {
      rows => rows.map { r =>
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val resized = if (payload == null) null
          else payload.zipWithIndex.collect { case (b, i) if i % factor == 0 => b }
        def scaled(i: Int) = if (r.isNullAt(i)) null else Int.box(r.getInt(i) / factor)
        Row(r.getLong(0), resized, scaled(2), scaled(3))
      }
    }
  }

  /** Frame-sampling shape for video-like payloads: split the payload into
    * fixed-size "frames" and keep every `stride`-th one (columnar, no UDF). */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame =
    media.where(length(col("payload")) > 0) // empty payload -> no frames, not one phantom frame
      .select(col("doc_id"),
      posexplode(transform(
        sequence(lit(0), ((length(col("payload")) - 1) / frameBytes).cast("int"), lit(stride)),
        i => substring(col("payload"), (i * frameBytes + 1).cast("int"), lit(frameBytes)))))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame")

  // ------------------------------------------------------------------ real
  // audio codec: javax.sound.sampled (in-JDK, zero external deps). WAV PCM
  // is lossless, so encode→decode round-trips sample-exactly — features
  // computed from the decoded stream are integers and oracle-computable.
  //
  // AudioSystem.getAudioInputStream/write re-scan the provider registry on
  // EVERY call through a globally SYNCHRONIZED, uncached lookup
  // (JDK13Services.getProviders) — per-payload codec calls convoy on that
  // lock under parallel decode and pay a ServiceLoader scan even serially
  // (measured r15: q207 audio near-dup regressed 2.5× when its decode pass
  // was spread across 32 cores). Resolve the providers ONCE per JVM and
  // dispatch directly — same provider order, same bytes.

  /** ServiceLoader scan with AudioSystem's provider ORDER
    * (JDK13Services/JSSecurityManager.getProvidersImpl): providers outside
    * the `java.desktop` module — i.e. third-party SPIs — are promoted to
    * the HEAD of the list (each inserted at index 0, so among themselves
    * they end up in reverse ServiceLoader order, exactly like the JDK),
    * platform providers keep ServiceLoader order at the tail. Direct
    * dispatch therefore stays decode-compatible with AudioSystem even when
    * a third-party audio SPI is on the classpath (r16, ADVICE r15). */
  private def audioProviders[T](cls: Class[T]): List[T] = {
    val it = java.util.ServiceLoader.load(cls).iterator()
    val platform = List.newBuilder[T]
    var third = List.empty[T]
    while (it.hasNext) {
      val p = it.next()
      val mod = p.getClass.getModule
      if (mod != null && "java.desktop" == mod.getName) platform += p
      else third = p :: third
    }
    third ::: platform.result()
  }

  private lazy val audioReaders: List[javax.sound.sampled.spi.AudioFileReader] =
    audioProviders(classOf[javax.sound.sampled.spi.AudioFileReader])

  private lazy val audioWriters: List[javax.sound.sampled.spi.AudioFileWriter] =
    audioProviders(classOf[javax.sound.sampled.spi.AudioFileWriter])

  /** AudioSystem.getAudioInputStream semantics (first provider that accepts
    * the stream wins) over the cached provider list; a fresh
    * ByteArrayInputStream per attempt replaces the mark/reset dance. */
  private def audioInputStream(
      payload: Array[Byte]): javax.sound.sampled.AudioInputStream =
    audioReaders.iterator.flatMap { r =>
      try Iterator.single(
        r.getAudioInputStream(new java.io.ByteArrayInputStream(payload)))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException =>
          Iterator.empty
      }
    }.nextOption().getOrElse(throw new
      javax.sound.sampled.UnsupportedAudioFileException(
        "payload is not a decodable audio stream"))

  /** AudioSystem.write semantics (first writer supporting the type wins)
    * over the cached provider list. */
  private def writeWave(ais: javax.sound.sampled.AudioInputStream,
      out: java.io.OutputStream): Unit = {
    val t = javax.sound.sampled.AudioFileFormat.Type.WAVE
    val w = audioWriters.find(_.isFileTypeSupported(t, ais))
      .getOrElse(throw new IllegalArgumentException("no WAVE writer"))
    w.write(ais, t, out)
  }

  /** Encode signed 16-bit little-endian mono PCM as a real RIFF/WAVE file
    * through the JDK's AudioSystem writer. */
  private[ops] def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    writeWave(ais, bos)
    bos.toByteArray
  }

  /** REAL audio decode: AudioSystem parses the RIFF header (rate, channels)
    * and streams the PCM frames; returns (sampleRate, channels, nSamples,
    * sumOfSquares) — all integers, so downstream aggregation is exact.
    * Throws on undecodable payloads — corrupt media fails loudly. */
  private[ops] def decodeWav(payload: Array[Byte]): (Int, Int, Long, Long) = {
    val ais = audioInputStream(payload)
    val f = ais.getFormat
    require(f.getSampleSizeInBits == 16 && !f.isBigEndian,
      s"expected PCM16LE, got $f")
    // mono only: for multi-channel input sum_sq would sum over ALL
    // channels' samples while n_samples divides by channel count — mixed
    // units. Only mono is produced in-repo; reject instead of mis-reporting.
    require(f.getChannels == 1, s"expected mono PCM, got ${f.getChannels} channels")
    val bytes = ais.readAllBytes()
    var sumSq = 0L
    var n = 0L
    var i = 0
    while (i + 2 <= bytes.length) {
      val s = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort
      sumSq += s.toLong * s.toLong
      n += 1
      i += 2
    }
    (f.getSampleRate.toInt, f.getChannels, n / f.getChannels, sumSq)
  }

  /** Media table with REAL WAV payloads: a deterministic integer waveform
    * per document (sample i = (doc_id·31 + i·17) mod 2048 − 1024, length and
    * rate derived from doc_id) — so every decoded feature is recomputable
    * by any engine from doc_id alone, yet only a correct RIFF/PCM decoder
    * recovers it from the bytes. */
  def asWavMediaTable(docs: DataFrame): DataFrame = {
    val in = docs.select(col("doc_id"))
    transformBatches(in, mediaSchema) { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val rate = 8000 + (id % 3).toInt * 4000
        val n = 800 + (id % 400).toInt
        val samples = Array.tabulate(n)(i =>
          ((id * 31 + i.toLong * 17) % 2048 - 1024).toShort)
        Row(id, "audio/wav", encodeWav(rate, samples), Row(null, null, rate))
      }
    }
  }

  // ------------------------------------------------------------------ real
  // video-like codec: animated GIF via javax.imageio (in-JDK). A multi-frame
  // container with real per-frame rasters — frame count, dimensions, and
  // per-frame pixel values all come from actually parsing the stream.

  /** Encode solid-gray frames as one animated GIF through ImageIO's
    * sequence writer. */
  private[ops] def encodeGif(width: Int, height: Int, grays: Seq[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && grays.nonEmpty, "bad GIF shape")
    val it = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
    require(it.hasNext, "no GIF writer in this JDK")
    val writer = it.next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      grays.foreach { g =>
        val img = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val g2 = img.createGraphics()
        try {
          g2.setColor(new java.awt.Color(g & 0xff, g & 0xff, g & 0xff))
          g2.fillRect(0, 0, width, height)
        } finally g2.dispose()
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** REAL multi-frame decode: parse the GIF, return (width, height,
    * [per-frame mean luma in micro-units]). Palette-indexed frames are read
    * through getRGB so values are colors, not palette indices. */
  private[ops] def decodeGifFrames(payload: Array[Byte]): (Int, Int, Seq[Long]) = {
    val it = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    require(it.hasNext, "no GIF reader in this JDK")
    val reader = it.next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      reader.setInput(iis, false)
      val n = reader.getNumImages(true)
      require(n > 0, "payload is not a decodable GIF")
      var dims: (Int, Int) = null
      val lumas = (0 until n).map { i =>
        val img = reader.read(i)
        if (dims == null) dims = (img.getWidth, img.getHeight)
        var sum = 0.0
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        math.floor(sum / (img.getWidth * img.getHeight) * 1e6 + 0.5).toLong
      }
      (dims._1, dims._2, lumas)
    } finally { iis.close(); reader.dispose() }
  }

  /** Media table with REAL animated-GIF payloads: 2 + doc_id%4 solid
    * frames, dims and per-frame gray pure functions of doc_id — decoded
    * features are recomputable by any engine from doc_id alone. */
  def asGifMediaTable(docs: DataFrame): DataFrame = {
    val in = docs.select(col("doc_id"))
    transformBatches(in, mediaSchema) { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val (w, h) = (8 + (id % 8).toInt, 6 + (id % 6).toInt)
        val grays = (0 until 2 + (id % 4).toInt).map(i => ((id * 16 + i * 8) % 256).toInt)
        Row(id, "image/gif", encodeGif(w, h, grays), Row(w, h, null))
      }
    }
  }

  val videoFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("luma_sum_micros", LongType, nullable = false)))

  /** Partition-local REAL multi-frame feature extraction over GIF payloads. */
  def extractVideoFeatures(media: DataFrame): DataFrame =
    transformBatches(media.select("doc_id", "payload"), videoFeatureSchema) { rows =>
      rows.map { r =>
        val (w, h, lumas) = decodeGifFrames(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), lumas.length, w, h, lumas.sum)
      }
    }

  val unifiedFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("units", LongType, nullable = false),
    StructField("metric_micros", LongType, nullable = false)))

  /** Mixed-modality feature extraction: ONE pass over a heterogeneous media
    * table, dispatching the right REAL decoder per `media_type` row — the
    * shape of a production multimodal pipeline where images, audio, and
    * video arrive interleaved in the same table. Output is normalized to
    * (doc_id, media_type, units, metric_micros): pixels/luma for images,
    * samples/duration for audio, frames/summed-luma for video. Unknown
    * types fail loudly. */
  def extractAllFeatures(media: DataFrame): DataFrame =
    transformBatches(media.select("doc_id", "media_type", "payload"),
      unifiedFeatureSchema) { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](2)
        val (units, metric) = r.getString(1) match {
          case "image/png" =>
            val (w, h, luma) = decodeImage(payload)
            (w.toLong * h, math.floor(luma * 1e6 + 0.5).toLong)
          case "audio/wav" =>
            val (rate, _, n, _) = decodeWav(payload)
            (n, n * 1000000L / rate)
          case "image/gif" =>
            val (_, _, lumas) = decodeGifFrames(payload)
            (lumas.length.toLong, lumas.sum)
          case t => throw new IllegalArgumentException(s"no decoder for $t")
        }
        Row(r.getLong(0), r.getString(1), units, metric)
      }
    }

  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("duration_micros", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false)))

  /** Partition-local REAL audio feature extraction: decode each WAV payload,
    * emit header facts + exact integer energy. Blobs dropped from the
    * output — downstream never shuffles payload bytes. */
  def extractAudioFeatures(media: DataFrame): DataFrame =
    transformBatches(media.select("doc_id", "payload"), audioFeatureSchema) { rows =>
      rows.map { r =>
        val (rate, ch, n, sumSq) = decodeWav(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), rate, ch, n, n * 1000000L / rate, sumSq)
      }
    }
}
