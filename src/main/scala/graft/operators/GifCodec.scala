package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One decoded GIF frame's comparable projection. */
final case class GifFrame(doc_id: Long, frame_idx: Long, mean_v: Double)

/** REAL GIF89a multi-frame container codec — the fourth image codec
  * beside PPM/BMP/PNG and the first MULTI-FRAME one: a spec-compliant
  * encoder (logical screen descriptor, global grayscale palette,
  * graphic-control extensions, per-frame LZW-compressed image data in
  * 255-byte sub-blocks, trailer) and a full decoder (header/LSD/GCT
  * parsing, extension-block walking, variable-width LSB-first LZW with
  * clear/EOI handling and the deferred code-width bump). Every GIF this
  * encoder writes opens in a stock viewer; every frame the decoder
  * returns is value-verified against closed-form byte arithmetic by the
  * `q_gif_scene_cuts` oracle — LZW is lossless, so the decoded plane
  * must equal the source bytes EXACTLY or the round-trip hash-fails.
  *
  * The payload convention matches the other codecs: a document's UTF-8
  * bytes become the pixel planes — frame k carries bytes
  * [k·w·h, (k+1)·w·h), the last frame zero-padded — so "video" here is
  * a real container around real bytes, and the scene-cut operator runs
  * the exact per-frame-mean arithmetic the synthetic frame stream
  * (row 169) runs, now THROUGH a real demuxer.
  *
  * Scale: encode and decode are batched mapPartitions kernels (the
  * decodeFeaturesOf shape) — map-only, no shuffle; the per-doc frame
  * count is payload-bounded and the scene-cut window partitions by doc. */
object GifCodec {

  val FrameW = 16
  val FrameH = 16
  private val FrameBytes = FrameW * FrameH

  // ---------------------------------------------------------------- LZW

  /** GIF-variant LZW encoder: 8-bit roots, clear=256, eoi=257, code
    * width grows 9→12, table cleared before it would overflow. Output
    * is the raw code stream (no sub-block framing).
    *
    * Width discipline: the emit width must track the DECODER's table,
    * which learns each entry one code later than the encoder creates it
    * (and learns nothing from the first code after a clear) — so the
    * encoder keeps an explicit model (`decNext`/`firstSinceClear`) and
    * bumps the width exactly when the decoder will, INCLUDING after the
    * final data code (the classic EOI-at-the-boundary off-by-one). */
  private[graft] def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    var cs = 9
    def put(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += cs
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xFF).toInt)
        bitBuf >>>= 8
        bitCnt -= 8
      }
    }
    val Clear = 256
    val Eoi = 257
    // decoder model: table size + first-code-after-clear special case
    var decNext = 258
    var firstSinceClear = true
    def emitData(code: Int): Unit = {
      put(code)
      if (firstSinceClear) firstSinceClear = false
      else if (decNext < 4096) {
        decNext += 1
        if (decNext == (1 << cs) && cs < 12) cs += 1
      }
    }
    def emitClear(): Unit = {
      put(Clear)
      cs = 9; decNext = 258; firstSinceClear = true
    }
    var dict = new java.util.HashMap[Long, Integer]()
    var nextE = 258
    emitClear()
    if (data.nonEmpty) {
      var prev = data(0) & 0xFF
      var i = 1
      while (i < data.length) {
        val b = data(i) & 0xFF
        val k = prev.toLong << 8 | b
        val hit = dict.get(k)
        if (hit != null) prev = hit.intValue()
        else {
          emitData(prev)
          if (decNext >= 4094) {
            // reset BEFORE either side's table can overflow
            emitClear()
            dict = new java.util.HashMap[Long, Integer]()
            nextE = 258
          } else {
            dict.put(k, nextE)
            nextE += 1
          }
          prev = b
        }
        i += 1
      }
      emitData(prev)
    }
    put(Eoi)
    if (bitCnt > 0) out.write((bitBuf & 0xFF).toInt)
    out.toByteArray
  }

  /** GIF-variant LZW decoder (the spec's algorithm): variable width,
    * clear/EOI, the code==next "KwKwK" case, width bump when the table
    * fills the current width. */
  private[graft] def lzwDecode(codes: Array[Byte],
                                   expected: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(expected)
    val Clear = 256
    val Eoi = 257
    var codeSize = 9
    var next = 258
    val dict = new Array[Array[Byte]](4096)
    var i = 0
    while (i < 256) { dict(i) = Array(i.toByte); i += 1 }
    var prev: Array[Byte] = null
    var bitBuf = 0L
    var bitCnt = 0
    var pos = 0
    var done = false
    while (!done && (pos < codes.length || bitCnt >= codeSize)) {
      while (bitCnt < codeSize && pos < codes.length) {
        bitBuf |= (codes(pos) & 0xFFL) << bitCnt
        bitCnt += 8
        pos += 1
      }
      if (bitCnt < codeSize) done = true
      else {
        val code = (bitBuf & ((1L << codeSize) - 1)).toInt
        bitBuf >>>= codeSize
        bitCnt -= codeSize
        if (code == Clear) {
          codeSize = 9; next = 258; prev = null
        } else if (code == Eoi) done = true
        else {
          val entry =
            if (code < next && dict(code) != null) dict(code)
            else if (code == next && prev != null) prev :+ prev(0)
            else throw new IllegalArgumentException(
              s"corrupt LZW stream: code $code with table size $next")
          out.write(entry, 0, entry.length)
          if (prev != null && next < 4096) {
            dict(next) = prev :+ entry(0)
            next += 1
            if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
          }
          prev = entry
        }
      }
    }
    out.toByteArray
  }

  // ---------------------------------------------------------- container

  /** Encode `data` as a REAL multi-frame GIF89a: one [[FrameW]]×
    * [[FrameH]] grayscale frame per 256-byte slice, last frame
    * zero-padded, 256-entry global palette with palette[i] = (i,i,i) so
    * a pixel's index IS its byte value. */
  private[graft] def gifEncode(data: Array[Byte]): Array[Byte] = {
    val nFrames = math.max(1, (data.length + FrameBytes - 1) / FrameBytes)
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >>> 8) & 0xFF) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(FrameW); le16(FrameH)
    out.write(0xF7) // GCT present, 8-bit color resolution, 256 entries
    out.write(0)    // background index
    out.write(0)    // square pixels
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    var f = 0
    while (f < nFrames) {
      // graphic control extension: 10 cs frame delay, no transparency
      out.write(0x21); out.write(0xF9); out.write(4)
      out.write(0); le16(10); out.write(0); out.write(0)
      // image descriptor: full-screen frame, no LCT, not interlaced
      out.write(0x2C); le16(0); le16(0); le16(FrameW); le16(FrameH)
      out.write(0)
      val plane = new Array[Byte](FrameBytes)
      val off = f * FrameBytes
      val n = math.max(0, math.min(FrameBytes, data.length - off))
      if (n > 0) System.arraycopy(data, off, plane, 0, n)
      out.write(8) // LZW minimum code size
      val codes = lzwEncode(plane)
      var p = 0
      while (p < codes.length) {
        val len = math.min(255, codes.length - p)
        out.write(len)
        out.write(codes, p, len)
        p += len
      }
      out.write(0) // block terminator
      f += 1
    }
    out.write(0x3B)
    out.toByteArray
  }

  /** Full GIF parser → per-frame pixel planes (grayscale bytes through
    * the palette's red channel). Handles 87a/89a, global and per-image
    * palettes, and skips any extension block; interlace is rejected
    * (this lake never writes it) rather than silently mis-decoded. */
  private[graft] def gifDecode(gif: Array[Byte]): Seq[Array[Byte]] = {
    require(gif.length > 13 && gif(0) == 'G' && gif(1) == 'I' &&
      gif(2) == 'F', "not a GIF stream")
    var p = 6
    def u8(): Int = { val v = gif(p) & 0xFF; p += 1; v }
    def u16(): Int = { val v = (gif(p) & 0xFF) | ((gif(p + 1) & 0xFF) << 8); p += 2; v }
    u16(); u16() // logical screen size
    val packed = u8()
    u8(); u8()   // background index, aspect
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 1 << ((packed & 7) + 1)
      gct = java.util.Arrays.copyOfRange(gif, p, p + 3 * n)
      p += 3 * n
    }
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var done = false
    while (!done) {
      u8() match {
        case 0x3B => done = true
        case 0x21 => // extension: label + sub-blocks, skipped
          u8()
          var len = u8()
          while (len != 0) { p += len; len = u8() }
        case 0x2C =>
          u16(); u16() // left, top
          val w = u16(); val h = u16()
          val ip = u8()
          require((ip & 0x40) == 0, "interlaced GIF unsupported")
          var pal = gct
          if ((ip & 0x80) != 0) {
            val n = 1 << ((ip & 7) + 1)
            pal = java.util.Arrays.copyOfRange(gif, p, p + 3 * n)
            p += 3 * n
          }
          require(pal != null, "image without any palette")
          val min = u8()
          require(min == 8, s"unexpected LZW min code size $min")
          val codes = new java.io.ByteArrayOutputStream()
          var len = u8()
          while (len != 0) { codes.write(gif, p, len); p += len; len = u8() }
          val idx = lzwDecode(codes.toByteArray, w * h)
          require(idx.length >= w * h,
            s"short LZW plane: ${idx.length} < ${w * h}")
          val plane = new Array[Byte](w * h)
          var i = 0
          while (i < w * h) { plane(i) = pal((idx(i) & 0xFF) * 3); i += 1 }
          frames += plane
        case b =>
          throw new IllegalArgumentException(f"unknown GIF block 0x$b%02x")
      }
    }
    frames.toSeq
  }

  // ------------------------------------------------------------ queries

  /** Documents as real multi-frame GIF payloads (the ppmPayloads shape). */
  def gifPayloads(spark: SparkSession, dir: String,
                  batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    MultimodalOps.payloads(spark, dir).select(col("doc_id"), col("payload"))
      .as[MediaPayload]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map(p =>
        MediaPayload(p.doc_id, gifEncode(p.payload)))))
      .toDF()
  }

  /** Demux + decode every frame of every payload; emits the per-frame
    * mean sample value (sum of 256 unsigned bytes / 256 — exact in
    * double). Batched kernel, map-only. */
  def frameMeans(gifPayloads: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = gifPayloads.sparkSession
    import spark.implicits._
    gifPayloads.select(col("doc_id"), col("payload"))
      .as[MediaPayload]
      .mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { pl =>
        gifDecode(pl.payload).zipWithIndex.map { case (plane, i) =>
          var s = 0L
          var j = 0
          while (j < plane.length) { s += plane(j) & 0xFF; j += 1 }
          GifFrame(pl.doc_id, i.toLong, s.toDouble / plane.length)
        }
      }))
      .toDF()
  }

  /** Scene-cut report over the REAL container: per document, frames
    * demuxed from its GIF, a cut wherever consecutive frame means jump
    * more than `threshold` — the [[MultimodalOps.sceneCuts]] arithmetic
    * run through an actual encode→LZW→parse→decode round trip. The
    * oracle recomputes every mean from the source bytes in closed form,
    * so ANY codec bit error (a wrong LZW width bump, a palette
    * off-by-one) hash-fails the round.
    *
    * Rounding-tie audit (the §9e law): means and jumps are DYADIC
    * (integer/256), exact in double with no division error, so a
    * `.xxxx5` tie at the 4-dp round is the true value in BOTH engines
    * and both round it half-away-from-zero (Spark BigDecimal half-up on
    * positives ≡ DuckDB's C-style round) — verified on the exact tie
    * 8/256 → 0.0313 in each. The exact-integer half-up staging is
    * therefore not needed here. */
  def gifSceneCuts(spark: SparkSession, dir: String,
                   threshold: Double = 4.0): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frameMeans(gifPayloads(spark, dir))
      .withColumn("prev", lag(col("mean_v"), 1).over(w))
      .withColumn("jump",
        when(col("prev").isNotNull, abs(col("mean_v") - col("prev"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("jump") > threshold, 1L).otherwise(0L)).as("n_cuts"),
        round(coalesce(max(col("jump")), lit(0.0)), 4).as("max_jump"))
      .orderBy(col("doc_id"))
  }
}
