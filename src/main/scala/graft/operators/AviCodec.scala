package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One demuxed document's motion aggregates (computed inside the kernel). */
final case class AviMotion(doc_id: Long, n_frames: Long,
                           total_motion: Long, peak_sum: Long)

/** REAL RIFF/AVI multi-frame container codec — the second video-shaped
  * container beside [[GifCodec]], exercising the OTHER half of the
  * container-format space: GIF89a is big-endian-free but compressed
  * (LZW); AVI is the canonical little-endian RIFF chunk tree with
  * uncompressed 24-bpp DIB frames, a typed header hierarchy
  * (`avih`/`strh`/`strf`) and a seek index (`idx1`). The encoder writes
  * a file any stock AVI demuxer opens (RIFF sizes exact, word-aligned
  * chunks, keyframe-flagged idx1); the decoder is a strict chunk-tree
  * walker that validates the headers against the BMP-family DIB rules
  * ([[MultimodalOps.decodeBmp]] discipline), tolerates foreign writers
  * (JUNK chunks, `rec ` grouping lists, odd-size padding), and VERIFIES
  * the index against the frames it actually demuxed — a corrupt offset
  * fails loudly rather than seeking garbage.
  *
  * Payload convention (the BMP one, 3 bytes per pixel): a document's
  * UTF-8 bytes ARE the frame planes — frame k carries bytes
  * [k·768, (k+1)·768) as its 16×16×24bpp bottom-up DIB, last frame
  * zero-padded. DIB storage is lossless, so the decoded logical planes
  * must equal the source bytes EXACTLY or the round-trip hash-fails.
  *
  * The registered analytic (`q_avi_motion`) is per-pixel MOTION — mean
  * and peak absolute byte delta between consecutive frames — i.e. the
  * true frame-difference pass a video pipeline runs, where the GIF row
  * (169/410) only compares per-frame MEANS. The temporal pass runs
  * INSIDE the demux kernel (each doc's frames are local to its row), so
  * the whole operator is one batched mapPartitions — map-only, no
  * window shuffle, the 100 TB shape. */
object AviCodec {

  val FrameW = 16
  val FrameH = 16
  /** 24-bpp: one frame carries 768 payload bytes (16 rows × 48). */
  val FrameBytes: Int = FrameW * FrameH * 3
  private val Stride = FrameW * 3 // 48 — already word-aligned, no pad

  // ------------------------------------------------------------- writer

  private final class Riff {
    val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = { require(s.length == 4); out.write(s.getBytes("US-ASCII")) }
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >>> 8) & 0xFF) }
    def le32(v: Int): Unit = { le16(v & 0xFFFF); le16(v >>> 16) }
    /** Write a chunk header, run `body`, back-patch the size field. */
    def chunk(fourcc: String)(body: => Unit): Unit = {
      ascii(fourcc)
      val sizeAt = out.size(); le32(0)
      body
      patchSize(sizeAt)
      if ((out.size() & 1) == 1) out.write(0) // word alignment pad
    }
    def list(listType: String)(body: => Unit): Unit =
      chunk("LIST") { ascii(listType); body }
    private def patchSize(sizeAt: Int): Unit = {
      val bytes = out.toByteArray
      val size = bytes.length - sizeAt - 4
      bytes(sizeAt) = (size & 0xFF).toByte
      bytes(sizeAt + 1) = ((size >>> 8) & 0xFF).toByte
      bytes(sizeAt + 2) = ((size >>> 16) & 0xFF).toByte
      bytes(sizeAt + 3) = ((size >>> 24) & 0xFF).toByte
      out.reset(); out.write(bytes, 0, bytes.length)
    }
  }

  /** Encode `data` as a spec-compliant single-stream AVI: RIFF('AVI ')
    * → LIST(hdrl){avih, LIST(strl){strh('vids'/'DIB '), strf(BITMAP-
    * INFOHEADER 16×16×24 BI_RGB)}} → LIST(movi){n × '00db' DIB frames,
    * bottom-up rows} → idx1 (keyframe-flagged, movi-relative offsets). */
  private[graft] def aviEncode(data: Array[Byte]): Array[Byte] = {
    val n = math.max(1, (data.length + FrameBytes - 1) / FrameBytes)
    val r = new Riff
    r.chunk("RIFF") {
      r.ascii("AVI ")
      r.list("hdrl") {
        r.chunk("avih") {
          r.le32(100000)            // dwMicroSecPerFrame (10 fps)
          r.le32(FrameBytes * 10)   // dwMaxBytesPerSec
          r.le32(0)                 // dwPaddingGranularity
          r.le32(0x10)              // dwFlags: AVIF_HASINDEX
          r.le32(n)                 // dwTotalFrames
          r.le32(0)                 // dwInitialFrames
          r.le32(1)                 // dwStreams
          r.le32(FrameBytes + 8)    // dwSuggestedBufferSize
          r.le32(FrameW); r.le32(FrameH)
          r.le32(0); r.le32(0); r.le32(0); r.le32(0) // dwReserved
        }
        r.list("strl") {
          r.chunk("strh") {
            r.ascii("vids"); r.ascii("DIB ")
            r.le32(0)               // dwFlags
            r.le16(0); r.le16(0)    // wPriority, wLanguage
            r.le32(0)               // dwInitialFrames
            r.le32(1); r.le32(10)   // dwScale/dwRate = 10 fps
            r.le32(0)               // dwStart
            r.le32(n)               // dwLength (frames)
            r.le32(FrameBytes + 8)  // dwSuggestedBufferSize
            r.le32(-1)              // dwQuality (default)
            r.le32(0)               // dwSampleSize (0: one sample = one frame)
            r.le16(0); r.le16(0); r.le16(FrameW); r.le16(FrameH) // rcFrame
          }
          r.chunk("strf") {
            r.le32(40)              // biSize
            r.le32(FrameW); r.le32(FrameH) // positive height: bottom-up
            r.le16(1); r.le16(24)   // biPlanes, biBitCount
            r.le32(0)               // biCompression = BI_RGB
            r.le32(FrameBytes)      // biSizeImage
            r.le32(0); r.le32(0); r.le32(0); r.le32(0)
          }
        }
      }
      r.list("movi") {
        var f = 0
        while (f < n) {
          r.chunk("00db") {
            val off = f * FrameBytes
            // emit bottom-up: DIB row 0 is the LAST logical row
            var dibRow = FrameH - 1
            while (dibRow >= 0) {
              val src = off + dibRow * Stride
              val line = new Array[Byte](Stride)
              val have = math.max(0, math.min(Stride, data.length - src))
              if (have > 0) System.arraycopy(data, src, line, 0, have)
              r.out.write(line, 0, Stride)
              dibRow -= 1
            }
          }
          f += 1
        }
      }
      r.chunk("idx1") {
        var f = 0
        while (f < n) {
          r.ascii("00db")
          r.le32(0x10)                       // AVIIF_KEYFRAME
          r.le32(4 + f * (8 + FrameBytes))   // offset from movi data start
          r.le32(FrameBytes)
          f += 1
        }
      }
    }
    r.out.toByteArray
  }

  // ------------------------------------------------------------- reader

  /** Strict AVI demuxer → per-frame LOGICAL top-down planes (768 bytes
    * each). Walks the real chunk tree: validates RIFF/AVI magic and the
    * header hierarchy (avih stream/frame counts; strh 'vids'; strf as a
    * 24-bpp BI_RGB DIB, [[FrameW]]×[[FrameH]]), demuxes '00db'/'00dc'
    * frames from the movi list (recursing into 'rec ' grouping lists,
    * skipping JUNK/unknown chunks, honoring odd-size pad bytes), strips
    * the bottom-up row order, and cross-checks idx1 (when present)
    * entry-by-entry against the demuxed frames. */
  private[graft] def aviDecode(avi: Array[Byte]): Seq[Array[Byte]] = {
    require(avi.length >= 12, "truncated RIFF stream")
    def fourcc(p: Int): String =
      new String(avi, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def le16(p: Int): Int = (avi(p) & 0xFF) | ((avi(p + 1) & 0xFF) << 8)
    def le32(p: Int): Int = le16(p) | (le16(p + 2) << 16)
    require(fourcc(0) == "RIFF", "not a RIFF stream")
    val riffEnd = 8 + le32(4)
    require(riffEnd <= avi.length, s"RIFF size $riffEnd beyond ${avi.length}")
    require(fourcc(8) == "AVI ", s"not an AVI RIFF: '${fourcc(8)}'")

    var totalFrames = -1
    var streams = -1
    var sawVids = false
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val frameOffsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    var moviDataStart = -1
    var idx: Option[(Int, Int)] = None // (payload offset, size)

    def parseHdrl(from: Int, end: Int): Unit = {
      var p = from
      while (p + 8 <= end) {
        val id = fourcc(p); val sz = le32(p + 4); val body = p + 8
        id match {
          case "avih" =>
            require(sz >= 56, s"short avih: $sz")
            totalFrames = le32(body + 16)
            streams = le32(body + 24)
            require(le32(body + 32) == FrameW && le32(body + 36) == FrameH,
              s"unexpected dimensions ${le32(body + 32)}x${le32(body + 36)}")
          case "LIST" if fourcc(body) == "strl" =>
            parseStrl(body + 4, body + sz)
          case _ => () // odml extensions etc: skip
        }
        p = body + sz + (sz & 1)
      }
      require(totalFrames >= 0, "no avih header")
      require(streams == 1, s"expected exactly 1 stream, got $streams")
      require(sawVids, "no vids stream header")
    }
    def parseStrl(from: Int, end: Int): Unit = {
      var p = from
      while (p + 8 <= end) {
        val id = fourcc(p); val sz = le32(p + 4); val body = p + 8
        id match {
          case "strh" =>
            require(fourcc(body) == "vids",
              s"unsupported stream type '${fourcc(body)}'")
            sawVids = true
          case "strf" =>
            // the BITMAPINFOHEADER rules decodeBmp enforces
            require(le32(body) >= 40, s"bad biSize ${le32(body)}")
            require(le32(body + 4) == FrameW && le32(body + 8) == FrameH,
              "strf dimensions disagree with avih")
            require(le16(body + 12) == 1, "biPlanes must be 1")
            require(le16(body + 14) == 24,
              s"only 24 bpp supported, got ${le16(body + 14)}")
            require(le32(body + 16) == 0, "only BI_RGB supported")
          case _ => ()
        }
        p = body + sz + (sz & 1)
      }
    }
    def parseMovi(from: Int, end: Int): Unit = {
      var p = from
      while (p + 8 <= end) {
        val id = fourcc(p); val sz = le32(p + 4); val body = p + 8
        id match {
          case "00db" | "00dc" =>
            require(sz == FrameBytes,
              s"frame chunk size $sz != $FrameBytes")
            val plane = new Array[Byte](FrameBytes)
            var row = 0
            while (row < FrameH) { // undo bottom-up storage
              System.arraycopy(avi, body + (FrameH - 1 - row) * Stride,
                plane, row * Stride, Stride)
              row += 1
            }
            frames += plane
            frameOffsets += p - (moviDataStart - 4) // movi-fourcc-relative
          case "LIST" if fourcc(body) == "rec " =>
            parseMovi(body + 4, body + sz) // grouped records: recurse
          case _ => () // JUNK / foreign subchunks: skip
        }
        p = body + sz + (sz & 1)
      }
    }

    var p = 12
    while (p + 8 <= riffEnd) {
      val id = fourcc(p); val sz = le32(p + 4); val body = p + 8
      id match {
        case "LIST" if fourcc(body) == "hdrl" => parseHdrl(body + 4, body + sz)
        case "LIST" if fourcc(body) == "movi" =>
          moviDataStart = body + 4
          parseMovi(body + 4, body + sz)
        case "idx1" => idx = Some((body, sz))
        case _ => () // JUNK etc
      }
      p = body + sz + (sz & 1)
    }
    require(moviDataStart >= 0, "no movi list")
    require(frames.length == totalFrames,
      s"demuxed ${frames.length} frames, avih says $totalFrames")
    // verify the seek index against what was actually demuxed
    idx.foreach { case (at, sz) =>
      require(sz == 16 * frames.length,
        s"idx1 has ${sz / 16} entries for ${frames.length} frames")
      var i = 0
      while (i < frames.length) {
        val e = at + 16 * i
        val ck = fourcc(e)
        require(ck == "00db" || ck == "00dc", s"idx1[$i] ckid '$ck'")
        val off = le32(e + 8)
        // the spec allows movi-relative or absolute offsets; accept both
        require(off == frameOffsets(i) ||
          off == frameOffsets(i) + (moviDataStart - 4),
          s"idx1[$i] offset $off points at no demuxed frame " +
            s"(expected ${frameOffsets(i)})")
        require(le32(e + 12) == FrameBytes, s"idx1[$i] length ${le32(e + 12)}")
        i += 1
      }
    }
    frames.toSeq
  }

  // ------------------------------------------------------------ queries

  /** Documents as real AVI payloads (batched encode, the codec twins'
    * shape). */
  def aviPayloads(spark: SparkSession, dir: String,
                  batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    MultimodalOps.payloads(spark, dir).select(col("doc_id"), col("payload"))
      .as[MediaPayload]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map(p =>
        MediaPayload(p.doc_id, aviEncode(p.payload)))))
      .toDF()
  }

  /** Per-document motion report THROUGH the real demuxer: every payload
    * encoded → demuxed → consecutive-frame absolute byte deltas, all
    * inside one batched mapPartitions (frames of a doc are row-local, so
    * the temporal pass needs no window shuffle). Emits exact integer
    * totals plus 4-dp fixed-point means staged through [[ExactRound]]
    * (denominators 768·(n−1) and 768 are not powers of two, so the
    * half-up round must happen in integer space on BOTH engines). */
  def aviMotion(spark: SparkSession, dir: String,
                batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    val agg = aviPayloads(spark, dir)
      .select(col("doc_id"), col("payload")).as[MediaPayload]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { pl =>
        val fs = aviDecode(pl.payload)
        var total = 0L
        var peak = 0L
        var k = 1
        while (k < fs.length) {
          val a = fs(k - 1); val b = fs(k)
          var s = 0L
          var j = 0
          while (j < FrameBytes) {
            s += math.abs((b(j) & 0xFF) - (a(j) & 0xFF)); j += 1
          }
          total += s
          if (s > peak) peak = s
          k += 1
        }
        AviMotion(pl.doc_id, fs.length.toLong, total, peak)
      }))
      .toDF()
    agg.select(col("doc_id"), col("n_frames"), col("total_motion"),
      when(col("n_frames") > 1,
        ExactRound.halfUpPos("10000 * total_motion",
          s"$FrameBytes * (n_frames - 1)").cast("double") / 1e4)
        .otherwise(0.0).as("avg_motion"),
      (ExactRound.halfUpPos("10000 * peak_sum", FrameBytes.toString)
        .cast("double") / 1e4).as("peak_motion"))
      .orderBy(col("doc_id"))
  }
}
