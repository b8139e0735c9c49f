package graft

import graft.operators.AviCodec

/** The RIFF/AVI container codec: round-trip fidelity, spec-level
  * structure of the written file, foreign-writer tolerance, index
  * verification, and the motion query's closed-form arithmetic. */
class AviCodecSpec extends SparkSpecBase {

  private def pattern(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 7 + 3) % 251).toByte)

  private def le32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) |
      ((b(p + 2) & 0xFF) << 16) | ((b(p + 3) & 0xFF) << 24)

  test("aviDecode(aviEncode(x)) returns the zero-padded source slices") {
    for (n <- Seq(0, 1, 767, 768, 769, 2000, 3 * 768)) {
      val d = pattern(n)
      val frames = AviCodec.aviDecode(AviCodec.aviEncode(d))
      val expectFrames = math.max(1, (n + 767) / 768)
      assert(frames.length == expectFrames, s"n=$n")
      val reassembled = frames.flatten.toArray
      assert(reassembled.take(n).sameElements(d), s"n=$n: bytes differ")
      assert(reassembled.drop(n).forall(_ == 0), s"n=$n: pad not zero")
    }
  }

  test("the written file is structurally spec-compliant RIFF") {
    val avi = AviCodec.aviEncode(pattern(2 * 768))
    def fourcc(p: Int) = new String(avi, p, 4, "US-ASCII")
    assert(fourcc(0) == "RIFF")
    // RIFF size covers the rest of the file exactly
    assert(8 + le32(avi, 4) == avi.length)
    assert(fourcc(8) == "AVI ")
    assert(fourcc(12) == "LIST" && fourcc(20) == "hdrl")
    assert(fourcc(24) == "avih")
    // avih: 10 fps, AVIF_HASINDEX, 2 frames, 1 stream, 16x16
    val avih = 32
    assert(le32(avi, avih) == 100000)
    assert((le32(avi, avih + 12) & 0x10) != 0)
    assert(le32(avi, avih + 16) == 2)
    assert(le32(avi, avih + 24) == 1)
    assert(le32(avi, avih + 32) == 16 && le32(avi, avih + 36) == 16)
    // an idx1 chunk exists with one 16-byte entry per frame
    val idxAt = {
      var p = 12
      var found = -1
      while (found < 0 && p + 8 <= avi.length) {
        if (fourcc(p) == "idx1") found = p
        else p = p + 8 + le32(avi, p + 4) + (le32(avi, p + 4) & 1)
      }
      found
    }
    assert(idxAt > 0, "no idx1 chunk")
    assert(le32(avi, idxAt + 4) == 2 * 16)
    assert(fourcc(idxAt + 8) == "00db")
    assert(le32(avi, idxAt + 8 + 12) == 768)
  }

  test("foreign-writer shapes decode: JUNK chunks, rec lists, odd sizes") {
    val d = pattern(768 * 2)
    val avi = AviCodec.aviEncode(d)
    def fourcc(p: Int) = new String(avi, p, 4, "US-ASCII")
    // rebuild: inject a JUNK chunk (odd size → pad byte) after hdrl and
    // wrap each frame in a LIST('rec ') — both spec-legal writer styles
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
      out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
    }
    def wcc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    var p = 12
    val chunks = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    while (p + 8 <= avi.length) {
      val sz = le32(avi, p + 4)
      chunks += ((fourcc(p), p, sz))
      p = p + 8 + sz + (sz & 1)
    }
    wcc("RIFF"); w32(0); wcc("AVI ")
    chunks.foreach { case (id, at, sz) =>
      if (id == "LIST" && fourcc(at + 8) == "movi") {
        // movi with each frame wrapped in LIST('rec ')
        val frames = (0 until 2).map { f =>
          val fAt = at + 12 + f * (8 + 768)
          java.util.Arrays.copyOfRange(avi, fAt, fAt + 8 + 768)
        }
        val inner = frames.map(_.length + 12).sum // rec hdr(8)+'rec '(4)
        wcc("LIST"); w32(4 + inner); wcc("movi")
        frames.foreach { fr =>
          wcc("LIST"); w32(4 + fr.length); wcc("rec ")
          out.write(fr, 0, fr.length)
        }
      } else if (id == "idx1") {
        // offsets shift under rec-wrapping; a foreign writer may also
        // omit idx1 entirely — exercise that tolerated shape
        ()
      } else {
        out.write(avi, at, 8 + sz + (sz & 1))
        if (id == "LIST" && fourcc(at + 8) == "hdrl") {
          wcc("JUNK"); w32(5); out.write(Array[Byte](1, 2, 3, 4, 5)); out.write(0)
        }
      }
    }
    val bytes = out.toByteArray
    // patch RIFF size
    val size = bytes.length - 8
    bytes(4) = (size & 0xFF).toByte; bytes(5) = ((size >>> 8) & 0xFF).toByte
    bytes(6) = ((size >>> 16) & 0xFF).toByte; bytes(7) = ((size >>> 24) & 0xFF).toByte
    val frames = AviCodec.aviDecode(bytes)
    assert(frames.length == 2)
    assert(frames.flatten.toArray.sameElements(d))
  }

  test("corruption fails loudly: bad magic, index lies, truncation") {
    val avi = AviCodec.aviEncode(pattern(768))
    val notRiff = avi.clone(); notRiff(0) = 'X'
    intercept[IllegalArgumentException](AviCodec.aviDecode(notRiff))
    // corrupt the idx1 offset of frame 0
    def fourcc(b: Array[Byte], p: Int) = new String(b, p, 4, "US-ASCII")
    var p = 12
    var idxAt = -1
    while (idxAt < 0 && p + 8 <= avi.length) {
      if (fourcc(avi, p) == "idx1") idxAt = p
      else p = p + 8 + le32(avi, p + 4) + (le32(avi, p + 4) & 1)
    }
    val lying = avi.clone(); lying(idxAt + 8 + 8) = 99.toByte
    val e = intercept[IllegalArgumentException](AviCodec.aviDecode(lying))
    assert(e.getMessage.contains("idx1"))
    intercept[Exception](AviCodec.aviDecode(avi.take(40)))
  }

  test("aviMotion matches a driver-side byte-arithmetic replay") {
    import org.apache.spark.sql.functions.col
    val rows = AviCodec.aviMotion(spark, Sf).collect()
    assert(rows.nonEmpty)
    val docs = Lake.documents(spark, Sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(50).foreach { r =>
      val bytes = docs(r.getLong(0)).getBytes("UTF-8")
      val nf = math.max(1, (bytes.length + 767) / 768)
      def at(i: Int): Int = if (i < bytes.length) bytes(i) & 0xFF else 0
      var total = 0L; var peak = 0L
      for (k <- 1 until nf) {
        var s = 0L
        for (j <- 0 until 768) s += math.abs(at(k * 768 + j) - at((k - 1) * 768 + j))
        total += s; if (s > peak) peak = s
      }
      assert(r.getLong(1) == nf.toLong, s"doc ${r.getLong(0)} frames")
      assert(r.getLong(2) == total, s"doc ${r.getLong(0)} total")
      val wantAvg = if (nf > 1)
        ((BigInt(2) * 10000 * total + BigInt(768) * (nf - 1)) /
          (BigInt(2) * 768 * (nf - 1))).toDouble / 1e4
      else 0.0
      assert(r.getDouble(3) == wantAvg, s"doc ${r.getLong(0)} avg")
      val wantPeak =
        ((BigInt(2) * 10000 * peak + 768) / (2 * 768)).toDouble / 1e4
      assert(r.getDouble(4) == wantPeak, s"doc ${r.getLong(0)} peak")
    }
  }
}
