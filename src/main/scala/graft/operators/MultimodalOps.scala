package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Lake

/** Opaque payload for the batched decode path. */
final case class MediaPayload(doc_id: Long, payload: Array[Byte])

/** Decoded (stubbed) per-item features; `batch_size` records the actual
  * decoder batch the item rode in, proving the batching plumbing. */
final case class MediaFeatures(doc_id: Long, n_bytes: Int, batch_size: Int,
                               features: Array[Float])

/** Resize result row: original and resized geometry + integer-valued
  * digests of the resized pixel plane. */
final case class MediaResized(doc_id: Long, w: Long, h: Long,
                              ow: Long, oh: Long,
                              r_sum: Long, r_zeros: Long, r_first: Long)

/** 64-bit perceptual average-hash of a decoded pixel plane, packed as
  * four 16-bit bands (the banded-candidate unit) + the set-bit count. */
final case class MediaHash(doc_id: Long, b0: Long, b1: Long, b2: Long,
                           b3: Long, nbits: Long)

/** Per-clip audio stats from the REAL WAV decode path. */
final case class MediaAudio(doc_id: Long, n_bytes: Long, sample_rate: Long,
                            n_samples: Long, duration_ms: Long,
                            rms: Double, peak: Long)

/** Multimodal column support (SURVEY.md §2 item 25): media payloads as
  * opaque `binary` columns with typed metadata, plus a batched decode path
  * with a REAL public-format kernel.
  *
  * The container has no image/audio libraries, so the decode kernel parses
  * PPM (P6) — a public Netpbm format simple enough to implement from spec
  * in pure JVM: magic, whitespace/comment-tolerant header integers, raw
  * RGB pixel plane. The Spark side is the real production shape either
  * way: binary schema, metadata struct, `mapPartitions` with bounded
  * decoder batches (the call shape a JNI/FFI decoder needs), and
  * partition-parallel execution with no driver materialization. Swapping
  * PPM for JPEG decode changes only the kernel body.
  */
object MultimodalOps {

  /** Documents as binary payloads + typed metadata struct. In a real lake
    * the payload column is the image/audio bytes; here it is the UTF-8 text
    * bytes, which keeps every byte-level operator real. */
  def payloads(spark: SparkSession, dir: String): DataFrame =
    Lake.documents(spark, dir).select(
      col("doc_id"), col("source"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        octet_length(col("text")).cast("long").as("n_bytes")).as("meta"))

  /** Per-source payload statistics over the binary column. */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    payloads(spark, dir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("payload"))).as("total_bytes"),
        max(length(col("payload"))).cast("long").as("max_bytes"))
      // bytes/count → exact integer half-up ([[ExactRound]])
      .select(col("source"), col("n_docs"), col("total_bytes"),
        (ExactRound.halfUpPos("10000 * total_bytes", "n_docs")
          .cast("double") / 1e4).as("avg_bytes"),
        col("max_bytes"))
      .orderBy(col("source"))

  /** Image width of the synthesized PPM payloads (16 RGB pixels per row =
    * 48 data bytes per row). */
  val PpmWidth = 16

  /** Spec-compliant PPM (P6) encoder: wraps `data` as the pixel plane of a
    * [[PpmWidth]]-wide RGB image, zero-padding the final row block. The
    * output is a real Netpbm file — feh/GIMP/ImageMagick open it. */
  private[graft] def ppmEncode(data: Array[Byte]): Array[Byte] = {
    val w = PpmWidth
    val h = math.max(1, (data.length + 3 * w - 1) / (3 * w))
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(data, 0, out, header.length, data.length)
    out
  }

  /** REAL P6 parser (Netpbm spec): magic check, whitespace- and
    * comment-tolerant header integers (width, height, maxval), single
    * whitespace, then the raw `3·w·h`-byte pixel plane. */
  private[graft] def decodePpm(ppm: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    require(ppm.length >= 2 && ppm(0) == 'P' && ppm(1) == '6',
      "not a P6 PPM stream")
    var i = 2
    def skipWs(): Unit = {
      while (i < ppm.length &&
        (ppm(i) == ' ' || ppm(i) == '\n' || ppm(i) == '\r' || ppm(i) == '\t'))
        i += 1
      if (i < ppm.length && ppm(i) == '#') { // spec: '#'-to-EOL comments
        while (i < ppm.length && ppm(i) != '\n') i += 1
        skipWs()
      }
    }
    def headerInt(): Int = {
      skipWs()
      var v = 0
      require(i < ppm.length && ppm(i) >= '0' && ppm(i) <= '9',
        s"malformed PPM header at byte $i")
      while (i < ppm.length && ppm(i) >= '0' && ppm(i) <= '9') {
        v = v * 10 + (ppm(i) - '0'); i += 1
      }
      v
    }
    val w = headerInt(); val h = headerInt(); val maxval = headerInt()
    require(maxval > 0 && maxval < 65536, s"PPM maxval out of range: $maxval")
    i += 1 // exactly one whitespace byte separates maxval from the plane
    require(ppm.length - i >= w * h * 3,
      s"truncated pixel plane: ${ppm.length - i} < ${w * h * 3}")
    (w, h, maxval, java.util.Arrays.copyOfRange(ppm, i, i + w * h * 3))
  }

  /** Spec-compliant 24-bpp BMP encoder (BITMAPFILEHEADER + 40-byte
    * BITMAPINFOHEADER, bottom-up rows): wraps `data` as the pixel plane
    * of a [[PpmWidth]]-wide image — the SECOND real codec behind the same
    * batched kernels. At width 16 the 48-byte row stride is already
    * 4-aligned, so the stored plane is exactly the logical plane with
    * rows in reverse order; a real viewer opens the output. The plane
    * bytes are carried VERBATIM (no BGR reorder — same opaque-plane
    * convention as [[ppmEncode]]), so decode(encode(x)) is identical
    * across both codecs and every downstream feature agrees. */
  private[graft] def bmpEncode(data: Array[Byte]): Array[Byte] = {
    val w = PpmWidth
    val h = math.max(1, (data.length + 3 * w - 1) / (3 * w))
    val stride = ((w * 3 + 3) / 4) * 4
    val off = 14 + 40
    val out = new Array[Byte](off + stride * h)
    def le16(p: Int, v: Int): Unit = {
      out(p) = (v & 0xFF).toByte; out(p + 1) = ((v >> 8) & 0xFF).toByte
    }
    def le32(p: Int, v: Int): Unit = { le16(p, v & 0xFFFF); le16(p + 2, v >>> 16) }
    out(0) = 'B'; out(1) = 'M'
    le32(2, out.length); le32(10, off)
    le32(14, 40); le32(18, w); le32(22, h)
    le16(26, 1); le16(28, 24); le32(30, 0); le32(34, stride * h)
    var r = 0
    while (r < h) {
      val srcOff = r * 3 * w
      val n = math.min(3 * w, math.max(0, data.length - srcOff))
      if (n > 0) System.arraycopy(data, srcOff, out, off + (h - 1 - r) * stride, n)
      r += 1
    }
    out
  }

  /** REAL BMP parser (Windows BITMAPINFOHEADER spec): validates the `BM`
    * magic, reads the little-endian pixel-array offset, dimensions,
    * planes = 1, 24 bpp, BI_RGB (uncompressed); handles both bottom-up
    * (positive height) and top-down (negative height) storage and strips
    * the 4-byte row padding, returning the logical top-down plane — the
    * same (w, h, maxval, plane) shape [[decodePpm]] yields, so every
    * kernel downstream is codec-blind. */
  private[graft] def decodeBmp(bmp: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    require(bmp.length >= 54 && bmp(0) == 'B' && bmp(1) == 'M',
      "not a BM bitmap stream")
    def le16(p: Int): Int = (bmp(p) & 0xFF) | ((bmp(p + 1) & 0xFF) << 8)
    def le32(p: Int): Int = le16(p) | (le16(p + 2) << 16)
    val off = le32(10)
    require(le32(14) >= 40, s"unsupported DIB header size ${le32(14)}")
    val w = le32(18)
    val hRaw = le32(22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    require(w > 0 && h > 0, s"bad dimensions ${w}x$hRaw")
    require(le16(26) == 1, "planes must be 1")
    require(le16(28) == 24, s"only 24 bpp supported, got ${le16(28)}")
    require(le32(30) == 0, "only BI_RGB (uncompressed) supported")
    val stride = ((w * 3 + 3) / 4) * 4
    require(bmp.length - off >= stride * h,
      s"truncated pixel array: ${bmp.length - off} < ${stride * h}")
    val px = new Array[Byte](w * h * 3)
    var r = 0
    while (r < h) {
      val srcRow = if (topDown) r else h - 1 - r
      System.arraycopy(bmp, off + srcRow * stride, px, r * w * 3, w * 3)
      r += 1
    }
    (w, h, 255, px)
  }

  /** PNG encoder via `javax.imageio` (public Java SE, no external libs):
    * wraps `data` as the RGB plane of a [[PpmWidth]]-wide image — the
    * first COMPRESSED image codec behind the same batched kernels. PNG
    * is lossless, so decode(encode(x)) carries the plane verbatim like
    * PPM/BMP and every downstream feature (decode digest, aHash, resize,
    * scene cuts) agrees bit for bit across all three image codecs. */
  private[graft] def pngEncode(data: Array[Byte]): Array[Byte] =
    imageioEncode(data, "png")

  /** JPEG encoder via `javax.imageio` — the LOSSY branch (writer
    * default quality): geometry and batching are exact; the decoded
    * plane approximates the input (MultimodalSpec bounds the error). */
  private[graft] def jpegEncode(data: Array[Byte]): Array[Byte] =
    imageioEncode(data, "jpg")

  private def imageioEncode(data: Array[Byte], format: String): Array[Byte] = {
    val w = PpmWidth
    val h = math.max(1, (data.length + 3 * w - 1) / (3 * w))
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      val r = if (3 * i < data.length) data(3 * i) & 0xFF else 0
      val g = if (3 * i + 1 < data.length) data(3 * i + 1) & 0xFF else 0
      val b = if (3 * i + 2 < data.length) data(3 * i + 2) & 0xFF else 0
      rgb(i) = (r << 16) | (g << 8) | b
      i += 1
    }
    img.setRGB(0, 0, w, h, rgb, 0, w)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  /** REAL PNG decode via `javax.imageio`: validates the 8-byte PNG
    * signature, inflates, and extracts the row-major RGB plane — the
    * same (w, h, maxval, plane) contract as [[decodePpm]]/[[decodeBmp]],
    * so every kernel downstream stays codec-blind. */
  private[graft] def decodePng(png: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    require(png.length >= 8 && (png(0) & 0xFF) == 0x89 && png(1) == 'P' &&
      png(2) == 'N' && png(3) == 'G' && png(4) == '\r' && png(5) == '\n' &&
      (png(6) & 0xFF) == 0x1A && png(7) == '\n', "not a PNG stream")
    imageioPlane(png, "PNG")
  }

  /** REAL JPEG decode via `javax.imageio`: validates the SOI marker
    * (FF D8 FF — JFIF and EXIF alike); same plane contract. */
  private[graft] def decodeJpeg(jpg: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    require(jpg.length >= 3 && (jpg(0) & 0xFF) == 0xFF &&
      (jpg(1) & 0xFF) == 0xD8 && (jpg(2) & 0xFF) == 0xFF,
      "not a JPEG stream")
    imageioPlane(jpg, "JPEG")
  }

  private def imageioPlane(bytes: Array[Byte],
                           kind: String): (Int, Int, Int, Array[Byte]) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"undecodable $kind stream")
    val w = img.getWidth; val h = img.getHeight
    val rgb = img.getRGB(0, 0, w, h, null, 0, w) // one bulk read
    val px = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      px(3 * i) = ((rgb(i) >> 16) & 0xFF).toByte
      px(3 * i + 1) = ((rgb(i) >> 8) & 0xFF).toByte
      px(3 * i + 2) = (rgb(i) & 0xFF).toByte
      i += 1
    }
    (w, h, 255, px)
  }

  /** Audio sample rate used by [[wavEncode]] (8 kHz telephone band). */
  val WavSampleRate = 8000

  /** Spec-compliant RIFF/WAVE PCM encoder — the THIRD real codec, the
    * audio modality's twin of [[ppmEncode]]/[[bmpEncode]]: each input
    * byte becomes one signed 16-bit mono sample, `s = (b − 128) << 8`
    * (unsigned-midline centering, full-scale little-endian PCM). The
    * output is a real .wav file — aplay/ffmpeg/audacity open it:
    * `RIFF <size> WAVE`, a 16-byte `fmt ` chunk (PCM, 1 channel,
    * [[WavSampleRate]], 16 bits), then the `data` chunk. */
  private[graft] def wavEncode(data: Array[Byte]): Array[Byte] = {
    val n = data.length
    val out = new Array[Byte](44 + 2 * n)
    def tag(p: Int, s: String): Unit = {
      var i = 0; while (i < 4) { out(p + i) = s.charAt(i).toByte; i += 1 }
    }
    def le16(p: Int, v: Int): Unit = {
      out(p) = (v & 0xFF).toByte; out(p + 1) = ((v >> 8) & 0xFF).toByte
    }
    def le32(p: Int, v: Int): Unit = { le16(p, v & 0xFFFF); le16(p + 2, v >>> 16) }
    tag(0, "RIFF"); le32(4, 36 + 2 * n); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16)
    le16(20, 1) // PCM
    le16(22, 1) // mono
    le32(24, WavSampleRate)
    le32(28, WavSampleRate * 2) // byte rate
    le16(32, 2) // block align
    le16(34, 16) // bits per sample
    tag(36, "data"); le32(40, 2 * n)
    var i = 0
    while (i < n) {
      val s = ((data(i) & 0xFF) - 128) << 8
      le16(44 + 2 * i, s & 0xFFFF)
      i += 1
    }
    out
  }

  /** REAL RIFF/WAVE parser: validates the RIFF/WAVE magic, then WALKS THE
    * CHUNK LIST — `fmt ` and `data` may arrive in any order with unknown
    * chunks (LIST, fact, cue…) between them, and odd-sized chunks carry a
    * pad byte (the parts naive parsers skip and real .wav files exercise).
    * Requires uncompressed PCM, mono, 16-bit; rejects truncated chunk
    * bodies and a missing fmt/data. Returns (sampleRate, channels,
    * bitsPerSample, samples). */
  private[graft] def decodeWav(wav: Array[Byte]): (Int, Int, Int, Array[Short]) = {
    require(wav.length >= 12 && wav(0) == 'R' && wav(1) == 'I' &&
      wav(2) == 'F' && wav(3) == 'F' && wav(8) == 'W' && wav(9) == 'A' &&
      wav(10) == 'V' && wav(11) == 'E', "not a RIFF/WAVE stream")
    def le16(p: Int): Int = (wav(p) & 0xFF) | ((wav(p + 1) & 0xFF) << 8)
    def le32(p: Int): Int = le16(p) | (le16(p + 2) << 16)
    var pos = 12
    var rate = -1; var channels = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (pos + 8 <= wav.length && (rate < 0 || dataOff < 0)) {
      val id = new String(wav, pos, 4, "US-ASCII")
      val len = le32(pos + 4)
      require(len >= 0 && pos + 8 + len <= wav.length,
        s"truncated '$id' chunk: $len bytes claimed at offset $pos")
      id match {
        case "fmt " =>
          require(len >= 16, s"fmt chunk too short: $len")
          require(le16(pos + 8) == 1, "only uncompressed PCM supported")
          channels = le16(pos + 10)
          rate = le32(pos + 12)
          bits = le16(pos + 22)
          require(channels == 1, s"only mono supported, got $channels")
          require(bits == 16, s"only 16-bit supported, got $bits")
        case "data" =>
          dataOff = pos + 8; dataLen = len
        case _ => // skip unknown chunk
      }
      pos += 8 + len + (len & 1) // odd chunks carry a pad byte
    }
    require(rate > 0, "missing fmt chunk")
    require(dataOff >= 0, "missing data chunk")
    require(dataLen % 2 == 0, s"odd PCM16 data length $dataLen")
    val samples = new Array[Short](dataLen / 2)
    var i = 0
    while (i < samples.length) {
      samples(i) = le16(dataOff + 2 * i).toShort
      i += 1
    }
    (rate, channels, bits, samples)
  }

  /** Documents as REAL .wav payloads (batched encode, the image twins'
    * shape). */
  def wavPayloads(spark: SparkSession, dir: String,
                  batchSize: Int = 64): DataFrame =
    encodedPayloads(spark, dir, wavEncode, batchSize)

  /** Per-clip audio stats through the REAL encode→parse WAV path:
    * duration, RMS amplitude, peak — the probe any audio ingest runs
    * before feature extraction. Same bounded-batch `mapPartitions`
    * kernel shape as [[decodeFeaturesOf]].
    *
    * Determinism: sample values are exact integers, the squared sum is a
    * BIGINT, duration is integer floor division, and the single sqrt is
    * rounded to 4 — the layout-arithmetic oracle reconstructs every
    * value from the text bytes ((b−128)·256 per sample, container size
    * 44 + 2n). */
  def wavStats(spark: SparkSession, dir: String,
               batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    wavPayloads(spark, dir, batchSize).select(col("doc_id"), col("payload"))
      .as[MediaPayload]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { p =>
          val (rate, _, _, samples) = decodeWav(p.payload)
          var sq = 0L; var peak = 0L
          var i = 0
          while (i < samples.length) {
            val s = samples(i).toLong
            sq += s * s
            val a = math.abs(s)
            if (a > peak) peak = a
            i += 1
          }
          val n = samples.length.toLong
          MediaAudio(p.doc_id, p.payload.length.toLong, rate.toLong, n,
            n * 1000L / rate,
            // the Spark-SQL round(_, 4) rule (shortest-repr HALF_UP) so
            // the kernel matches the column-function convention
            if (n > 0) BigDecimal(java.lang.Double.toString(
              math.sqrt(sq.toDouble / n)))
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
            else 0.0,
            peak)
        })
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Codec-sniffing decode: `BM` → bitmap, `\x89PNG` → PNG, `FF D8 FF`
    * → JPEG, else Netpbm P6. Every pixel kernel (features, resize,
    * aHash, scene cuts) accepts any of the four. */
  private[graft] def decodeImage(payload: Array[Byte]): (Int, Int, Int, Array[Byte]) =
    if (payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M')
      decodeBmp(payload)
    else if (payload.length >= 4 && (payload(0) & 0xFF) == 0x89 &&
      payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G')
      decodePng(payload)
    else if (payload.length >= 3 && (payload(0) & 0xFF) == 0xFF &&
      (payload(1) & 0xFF) == 0xD8 && (payload(2) & 0xFF) == 0xFF)
      decodeJpeg(payload)
    else decodePpm(payload)

  /** Decode kernel: real image parse (PPM or BMP) + integer-valued image
    * features (all exactly representable as floats at any plausible
    * payload size): width, height, maxval, pixel-plane bytes, unsigned
    * byte sum, zero (padding) count, first pixel byte, last nonzero
    * pixel byte. */
  private def ppmFeatures(payload: Array[Byte]): Array[Float] = {
    val (w, h, maxval, px) = decodeImage(payload)
    var sum = 0L; var zeros = 0; var lastNz = 0
    var i = 0
    while (i < px.length) {
      val b = px(i) & 0xFF
      sum += b
      if (b == 0) zeros += 1 else lastNz = b
      i += 1
    }
    val first = if (px.length > 0) px(0) & 0xFF else 0
    Array(w.toFloat, h.toFloat, maxval.toFloat, px.length.toFloat,
      sum.toFloat, zeros.toFloat, first.toFloat, lastNz.toFloat)
  }

  /** Documents as REAL image payloads: each doc's bytes as the pixel plane
    * of a spec-compliant P6 PPM (encode itself runs batched, same shape as
    * decode). */
  def ppmPayloads(spark: SparkSession, dir: String,
                  batchSize: Int = 64): DataFrame =
    encodedPayloads(spark, dir, ppmEncode, batchSize)

  /** Documents as REAL 24-bpp BMP payloads — the second codec, same
    * batched encode shape. */
  def bmpPayloads(spark: SparkSession, dir: String,
                  batchSize: Int = 64): DataFrame =
    encodedPayloads(spark, dir, bmpEncode, batchSize)

  /** Documents as REAL PNG payloads — the compressed codec, same
    * batched encode shape. */
  def pngPayloads(spark: SparkSession, dir: String,
                  batchSize: Int = 64): DataFrame =
    encodedPayloads(spark, dir, pngEncode, batchSize)

  private def encodedPayloads(spark: SparkSession, dir: String,
                              enc: Array[Byte] => Array[Byte],
                              batchSize: Int): DataFrame = {
    import spark.implicits._
    payloads(spark, dir).select(col("doc_id"), col("payload"))
      .as[MediaPayload]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map(p =>
          MediaPayload(p.doc_id, enc(p.payload))))
      }
      .toDF()
  }

  /** Batched feature extraction over any (doc_id, payload=image bytes)
    * frame: partitions stream through the REAL decoders in bounded
    * batches (`batchSize`), exactly the call shape a native decoder
    * needs — no per-row call overhead, no whole-partition
    * materialization. */
  def decodeFeaturesOf(imgPayloads: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = imgPayloads.sparkSession
    import spark.implicits._
    imgPayloads.select(col("doc_id"), col("payload"))
      .as[MediaPayload]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // one decoder invocation per batch
          batch.map(p =>
            MediaFeatures(p.doc_id, p.payload.length, batch.size,
              ppmFeatures(p.payload)))
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  def decodeFeatures(spark: SparkSession, dir: String,
                     batchSize: Int = 64): DataFrame =
    decodeFeaturesOf(ppmPayloads(spark, dir, batchSize), batchSize)

  /** Box-average integer downsample of a decoded P6 pixel plane — the
    * "resize" leg of the multimodal surface: each output pixel is the
    * floor-mean of its `factor`×`factor` source block (blocks clipped at
    * the image edge average only their in-bounds samples). Real pixel
    * arithmetic on the real parser's output; a JPEG thumbnailer would
    * replace only this kernel body. */
  private[graft] def resizePpm(ppm: Array[Byte],
                               factor: Int): (Int, Int, Int, Int, Array[Byte]) = {
    require(factor >= 1, "resize factor must be >= 1")
    val (w, h, _, px) = decodeImage(ppm)
    val ow = math.max(1, w / factor); val oh = math.max(1, h / factor)
    val out = new Array[Byte](ow * oh * 3)
    var oy = 0
    while (oy < oh) {
      var ox = 0
      while (ox < ow) {
        var c = 0
        while (c < 3) {
          var sum = 0; var n = 0; var dy = 0
          while (dy < factor) {
            val y = oy * factor + dy
            var dx = 0
            while (dx < factor) {
              val x = ox * factor + dx
              if (x < w && y < h) { sum += px((y * w + x) * 3 + c) & 0xFF; n += 1 }
              dx += 1
            }
            dy += 1
          }
          out((oy * ow + ox) * 3 + c) = (sum / n).toByte
          c += 1
        }
        ox += 1
      }
      oy += 1
    }
    (w, h, ow, oh, out)
  }

  /** Batched resize over the real PPM payloads (factor-2 thumbnail),
    * emitting geometry plus integer digests of the resized plane — the
    * driver-comparable projection whose oracle reconstructs every block
    * mean from the payload layout arithmetic. Same bounded-batch
    * `mapPartitions` shape as [[decodeFeatures]]. */
  def resizeDigest(spark: SparkSession, dir: String,
                   factor: Int = 2, batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    ppmPayloads(spark, dir, batchSize).select(col("doc_id"), col("payload"))
      .as[MediaPayload]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { p =>
          val (w, h, ow, oh, out) = resizePpm(p.payload, factor)
          var sum = 0L; var zeros = 0L
          var i = 0
          while (i < out.length) {
            val v = out(i) & 0xFF
            sum += v; if (v == 0) zeros += 1
            i += 1
          }
          MediaResized(p.doc_id, w, h, ow, oh, sum, zeros,
            if (out.nonEmpty) (out(0) & 0xFF).toLong else 0L)
        })
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Fixed-stride frame sampling over the binary payload — the "every Nth
    * video frame" / "audio window" access pattern as pure byte-range ops:
    * one row per (doc, frame) with its byte offset and the frame bytes'
    * hex digest. Codegen'd sequence/substring over the binary column, a
    * map-only stage; a real decoder would replace the hex digest with the
    * decoded frame tensor, everything else stays as-is. Payloads shorter
    * than one frame yield no rows (never a negative-length sequence). */
  def frameSample(spark: SparkSession, dir: String,
                  stride: Int = 16, frameLen: Int = 8): DataFrame = {
    require(stride > 0 && frameLen > 0, "stride and frameLen must be positive")
    payloads(spark, dir)
      .select(col("doc_id"), col("payload"),
        length(col("payload")).as("n_bytes"))
      .filter(col("n_bytes") >= frameLen)
      .select(col("doc_id"), col("payload"),
        posexplode(sequence(lit(0L),
          floor((col("n_bytes") - frameLen) / stride).cast("long"))))
      .select(
        col("doc_id"),
        col("pos").cast("long").as("frame_idx"),
        (col("pos") * stride).cast("long").as("byte_offset"),
        hex(col("payload").substr(
          (col("pos") * stride + 1).cast("int"), lit(frameLen))).as("frame_hex"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Audio-style windowed feature extraction: the payload interpreted as
    * unsigned 8-bit PCM samples, cut into hop-strided windows, each
    * emitting the two classic cheap audio features — RMS energy and the
    * zero-crossing count (sign changes around the unsigned midline 128).
    * zero crossings are counted around the WINDOW MEAN (the standard ZCR
    * definition for DC-biased signals — unsigned bytes never cross a
    * fixed midline). Pure codegen'd byte arithmetic (sequence/transform/
    * aggregate — a map-only stage, no UDF); a real codec would replace
    * the sample-read expression only. Determinism: sums stay integral
    * (squares of ints), mean comparisons and the single sqrt are the
    * same doubles in both engines, rms rounded to 4 decimals. Payloads
    * shorter than one window emit no rows. */
  def audioFeatures(spark: SparkSession, dir: String,
                    window: Int = 32, hop: Int = 16): DataFrame = {
    require(window > 1 && hop > 0, "need window > 1 and hop > 0")
    // sample reads probe the SCAN ATTRIBUTE (text), not a recomputed
    // cast: an expression inside the transform lambda re-evaluates once
    // per element (the O(n²) shingle trap, SURVEY §9); the payload column
    // is encode(text), so text IS the byte stream on this ASCII corpus
    Lake.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"),
        octet_length(col("text")).as("n_bytes"))
      .filter(col("n_bytes") >= window)
      .select(col("doc_id"), col("text"),
        posexplode(sequence(lit(0L),
          floor((col("n_bytes") - window) / hop).cast("long"))))
      .withColumn("off", (col("pos") * hop).cast("long"))
      .withColumn("win", expr(
        s"transform(sequence(1, $window), i -> ascii(substr(text, CAST(off + i AS INT), 1)))"))
      .withColumn("mean_v", expr("aggregate(win, 0L, (acc, v) -> acc + v)")
        .cast("double") / window)
      .select(
        col("doc_id"),
        col("pos").cast("long").as("window_idx"),
        col("off").as("byte_offset"),
        round(sqrt(expr(
          s"aggregate(win, 0L, (acc, v) -> acc + CAST(v AS BIGINT) * v)")
          .cast("double") / window), 4).as("rms"),
        expr(s"""size(filter(sequence(1, ${window - 1}),
                 i -> (win[i - 1] >= mean_v) != (win[i] >= mean_v)))""")
          .cast("long").as("zero_crossings"))
      .orderBy(col("doc_id"), col("window_idx"))
  }

  /** Driver-comparable projection of [[decodeFeatures]]: the (integer-
    * valued) float features joined into one sortable string —
    * pandas/DuckDB can hash a string where they cannot hash a raw
    * array<float>. The DuckDB oracle reconstructs every feature from the
    * PPM layout arithmetic (header size, padded plane, ASCII byte sums) —
    * so the encode→parse→feature path is value-verified end to end.
    * `batch_size` is partitioning-dependent so it stays out of the
    * comparable projection (MultimodalSpec covers it). */
  def decodeDigest(spark: SparkSession, dir: String): DataFrame =
    digestOf(decodeFeatures(spark, dir))

  /** The BMP twin of [[decodeDigest]]: encode→parse→feature through the
    * bitmap codec. Identical feature values (the plane is carried
    * verbatim by both codecs); only `n_bytes` differs — BMP's fixed
    * 54-byte header + stride·h vs PPM's variable ASCII header — which is
    * exactly what the layout-arithmetic oracle verifies. */
  def decodeDigestBmp(spark: SparkSession, dir: String): DataFrame =
    digestOf(decodeFeaturesOf(bmpPayloads(spark, dir)))

  /** The PNG twin of [[decodeDigest]]: encode→inflate→feature through
    * the compressed codec. The container size is DEFLATE-dependent (not
    * layout arithmetic), so the comparable projection reports the
    * decoded plane length (48·h, closed-form) instead of `n_bytes`;
    * every feature value is identical to the PPM/BMP twins because PNG
    * is lossless. */
  def decodeDigestPng(spark: SparkSession, dir: String): DataFrame =
    decodeFeaturesOf(pngPayloads(spark, dir))
      .select(
        col("doc_id"),
        element_at(col("features"), 4).cast("long").as("plane_bytes"),
        concat_ws(",", transform(col("features"),
          f => f.cast("int").cast("string"))).as("feat_digest"))
      .orderBy(col("doc_id"))

  private def digestOf(features: DataFrame): DataFrame =
    features
      .select(
        col("doc_id"),
        col("n_bytes").cast("long").as("n_bytes"),
        concat_ws(",", transform(col("features"),
          f => f.cast("int").cast("string"))).as("feat_digest"))
      .orderBy(col("doc_id"))

  /** Scene-cut detection over the frame stream: per non-overlapping
    * frame, the mean sample value; a CUT is a frame whose mean jumps more
    * than `threshold` from its predecessor — the shot-boundary heuristic
    * video pipelines run before picking keyframes. Per-payload report of
    * frame count, cut count, and the largest jump.
    *
    * Determinism: frame sums are integral; `frameLen` is a power of two,
    * so mean = sum/16 is EXACT in double, deltas are exact differences,
    * and the threshold compare cannot straddle engines. The lag window
    * partitions per payload (frames-per-payload bounded), then one
    * map-side-combinable aggregate. Same sample-read discipline as
    * [[audioFeatures]]: probe the scan attribute, never re-cast inside
    * the lambda. */
  def sceneCuts(spark: SparkSession, dir: String): DataFrame =
    sceneCuts(Lake.documents(spark, dir))

  def sceneCuts(docs: DataFrame, frameLen: Int = 16,
                threshold: Double = 4.0): DataFrame = {
    require(frameLen > 0 && (frameLen & (frameLen - 1)) == 0,
      "frameLen must be a power of two so the mean stays exact")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"),
        octet_length(col("text")).as("n_bytes"))
      .filter(col("n_bytes") >= 2 * frameLen)
      .select(col("doc_id"), col("text"),
        posexplode(sequence(lit(0L),
          floor(col("n_bytes") / frameLen).cast("long") - 1)))
      .withColumn("off", (col("pos") * frameLen).cast("long"))
      .withColumn("mean_v", expr(
        s"aggregate(transform(sequence(1, $frameLen), " +
          s"i -> ascii(substr(text, CAST(off + i AS INT), 1))), " +
          s"0L, (acc, v) -> acc + v)").cast("double") / frameLen)
      .withColumn("delta", abs(col("mean_v") - lag(col("mean_v"), 1).over(w)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        coalesce(sum(when(col("delta") > threshold, lit(1L))), lit(0L))
          .as("n_cuts"),
        round(coalesce(max(col("delta")), lit(0.0)), 4).as("max_delta"))
      .orderBy(col("doc_id"))
  }

  /** Perceptual average-hash (aHash) of a decoded pixel plane: the plane
    * is cut into 64 contiguous equal chunks (integer boundaries
    * `(i·L)/64`), and chunk i's bit is 1 iff its mean is ≥ the plane
    * mean — compared in EXACT integer space (`sum_i · L ≥ S · len_i`),
    * never via division. A chunk that is empty because the plane is
    * shorter than 64 bytes contributes 0. Bits pack big-endian into four
    * 16-bit bands so near-dup candidates can form per band, pigeonhole-
    * lossless at hamming ≤ 3 (the SimHash convention). */
  private[graft] def aHash(px: Array[Byte]): (Array[Long], Long) = {
    val L = px.length
    var s = 0L; var i = 0
    while (i < L) { s += px(i) & 0xFF; i += 1 }
    val bits = new Array[Int](64)
    var nbits = 0L
    var c = 0
    while (c < 64) {
      val lo = (c.toLong * L / 64).toInt
      val hi = ((c + 1).toLong * L / 64).toInt
      if (hi > lo) {
        var sum = 0L; var k = lo
        while (k < hi) { sum += px(k) & 0xFF; k += 1 }
        if (sum * L >= s * (hi - lo)) { bits(c) = 1; nbits += 1 }
      }
      c += 1
    }
    val bands = new Array[Long](4)
    var b = 0
    while (b < 4) {
      var v = 0L; var j = 0
      while (j < 16) { v = (v << 1) | bits(b * 16 + j); j += 1 }
      bands(b) = v; b += 1
    }
    (bands, nbits)
  }

  /** Per-image perceptual hash over the REAL decoded plane — the image
    * near-dup signature (the visual twin of text SimHash). Same bounded-
    * batch `mapPartitions` shape as [[decodeFeatures]]. Frame form takes
    * any (doc_id, payload=PPM bytes) frame — batch tables and streaming
    * micro-batches alike. */
  def imageHashOf(payloads: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[MediaPayload]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { p =>
          val (_, _, _, px) = decodeImage(p.payload)
          val (bands, nbits) = aHash(px)
          MediaHash(p.doc_id, bands(0), bands(1), bands(2), bands(3), nbits)
        })
      }
      .toDF()
  }

  def imageHash(spark: SparkSession, dir: String,
                batchSize: Int = 64): DataFrame =
    imageHashOf(ppmPayloads(spark, dir, batchSize), batchSize)
      .orderBy(col("doc_id"))

  private def bandsLongForm(hashes: DataFrame): DataFrame =
    hashes.select(col("doc_id"),
        posexplode(array(col("b0"), col("b1"), col("b2"), col("b3"))))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("band_key"))

  /** The standing corpus's aHash bands as a compact reference table —
    * build once (or per index refresh), broadcast into every screening
    * batch. Distinct (band, key) rows: bounded by 4 × corpus NDV. */
  def referenceImageBands(hashes: DataFrame): DataFrame =
    bandsLongForm(hashes).select(col("band"), col("band_key")).distinct()

  /** Screen a batch of image hashes against the reference: any band
    * collision marks the image as a near-dup CANDIDATE of the standing
    * corpus and drops it; only visually-novel images survive. The exact
    * mirror of the text LSH ingest screen ([[graft.streaming
    * .IngestStream.screenNearDups]]): one equi semi-join per batch, zero
    * streaming state. */
  def screenImages(batchHashes: DataFrame, refBands: DataFrame): DataFrame = {
    val hits = bandsLongForm(batchHashes)
      .join(refBands, Seq("band", "band_key"), "left_semi")
      .select(col("doc_id")).distinct()
    batchHashes.join(hits, Seq("doc_id"), "left_anti")
  }

  /** Image near-duplicates: pairs whose perceptual hashes agree on at
    * least one 16-bit band (candidate generation — never all-pairs) and
    * whose full 64-bit hamming distance is ≤ `maxHamming`. Bands larger
    * than `maxBand` images are dropped from candidate generation (their
    * members still pair through their other bands) — the hot-bucket cap
    * convention of the embedding near-dup path, because a saturated band
    * (e.g. the all-ones band of bright images) would otherwise go
    * quadratic. One shuffle keyed by (band, key); the pair count is
    * bounded by band-group sizes, never the corpus. */
  def imageNearDups(spark: SparkSession, dir: String,
                    maxHamming: Int = 2, maxBand: Int = 4096,
                    batchSize: Int = 64): DataFrame = {
    val h = imageHash(spark, dir, batchSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = h.select(col("doc_id"), col("b0"), col("b1"), col("b2"),
        col("b3"),
        posexplode(array(col("b0"), col("b1"), col("b2"), col("b3"))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
      .withColumn("band_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("band_key"))))
      .filter(col("band_n") <= maxBand)
    val out = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") &&
        col("x.band_key") === col("y.band_key") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        (bit_count(col("x.b0").bitwiseXOR(col("y.b0"))) +
         bit_count(col("x.b1").bitwiseXOR(col("y.b1"))) +
         bit_count(col("x.b2").bitwiseXOR(col("y.b2"))) +
         bit_count(col("x.b3").bitwiseXOR(col("y.b3")))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("doc_a"), col("doc_b"))
      .localCheckpoint(true)
    h.unpersist(false)
    out
  }
}
