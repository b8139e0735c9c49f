package graft

import org.apache.spark.sql.functions._

import graft.operators.{GifCodec, MultimodalOps}

/** The GIF89a container: LZW round-trips (including the width-bump and
  * table-reset boundaries), frame demux equals the source slices, the
  * JDK's own GIF reader accepts our files, and the registered scene-cut
  * query matches a byte-arithmetic replay. */
class GifCodecSpec extends SparkSpecBase {

  private def pattern(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 31 + (i >> 3) * 7 + i / 251) & 0xFF).toByte)

  test("LZW round-trips across sizes, including width-bump boundaries") {
    val probes =
      Seq.tabulate(64)(i => pattern(i)) ++          // tiny streams
      (240 to 280).map(pattern) ++                  // 9→10 bump region
      Seq(pattern(4096), pattern(20000)) ++         // deep dictionaries
      Seq(Array.fill(70000)(7.toByte),              // max-compression run
        Array.tabulate(70000)(i => (i & 1).toByte), // 2-symbol churn
        Array.tabulate(70000)(i => (i % 256).toByte))
    for ((d, i) <- probes.zipWithIndex) {
      val rt = GifCodec.lzwDecode(GifCodec.lzwEncode(d), d.length)
      assert(java.util.Arrays.equals(rt, d),
        s"probe $i (len ${d.length}) corrupted: got ${rt.length} bytes")
    }
  }

  test("gifDecode(gifEncode(x)) returns the zero-padded source slices") {
    for (n <- Seq(1, 255, 256, 257, 1000, 5000)) {
      val d = pattern(n)
      val frames = GifCodec.gifDecode(GifCodec.gifEncode(d))
      val nf = math.max(1, (n + 255) / 256)
      assert(frames.length == nf, s"n=$n frames ${frames.length}")
      val joined = frames.flatten.toArray
      assert(joined.take(n).sameElements(d), s"n=$n plane differs")
      assert(joined.drop(n).forall(_ == 0), s"n=$n padding not zero")
    }
  }

  test("the JDK's ImageIO reads our GIF: frame count and pixel values") {
    val d = pattern(600) // 3 frames
    val gif = GifCodec.gifEncode(d)
    val it = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    assert(it.hasNext, "JDK has no GIF reader?")
    val reader = it.next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(gif))
    try {
      reader.setInput(iis)
      assert(reader.getNumImages(true) == 3)
      val img = reader.read(0)
      assert(img.getWidth == GifCodec.FrameW && img.getHeight == GifCodec.FrameH)
      // palette[i] = (i,i,i): the red channel IS the source byte
      for (y <- 0 until GifCodec.FrameH; x <- 0 until GifCodec.FrameW) {
        val want = d(y * GifCodec.FrameW + x) & 0xFF
        val got = (img.getRGB(x, y) >> 16) & 0xFF
        assert(got == want, s"pixel ($x,$y): $got vs $want")
      }
    } finally { reader.dispose(); iis.close() }
  }

  test("gifSceneCuts matches a driver-side byte-arithmetic replay") {
    val out = GifCodec.gifSceneCuts(spark, Sf).collect()
    assert(out.nonEmpty)
    val docs = Lake.documents(spark, Sf)
      .filter(col("text").isNotNull).select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8")))
    assert(out.length == docs.length)
    val byId = docs.toMap
    for (r <- out) {
      val bytes = byId(r.getLong(0))
      val nf = math.max(1, (bytes.length + 255) / 256)
      val means = (0 until nf).map { f =>
        (0 until 256).map(j => if (f * 256 + j < bytes.length)
          bytes(f * 256 + j) & 0xFF else 0).sum.toDouble / 256.0
      }
      val jumps = means.zip(means.tail).map(p => math.abs(p._2 - p._1))
      assert(r.getLong(1) == nf, s"doc ${r.getLong(0)} n_frames")
      assert(r.getLong(2) == jumps.count(_ > 4.0), s"doc ${r.getLong(0)} cuts")
      // jumps are dyadic (m/256): exact in double, so ties at .xxxx5 are
      // REAL — round half-up like Spark/DuckDB, not rint's half-to-even
      val maxJ = BigDecimal(jumps.foldLeft(0.0)(math.max))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - maxJ) < 1e-9,
        s"doc ${r.getLong(0)} max_jump")
    }
  }

  test("gif scene cuts agree with the synthetic frame-stream operator's arithmetic") {
    // same per-frame mean law at frameLen 256 as the GIF path (the
    // synthetic stream uses 16-byte frames by default; re-derive at 256
    // to cross-check the two pipelines on their shared definition)
    val gif = GifCodec.gifSceneCuts(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val meta = MultimodalOps.payloads(spark, Sf)
      .select(col("doc_id"), length(col("payload")).as("n")).collect()
    for (r <- meta) {
      val nf = math.max(1, (r.getInt(1) + 255) / 256)
      assert(gif(r.getLong(0)) == nf)
    }
  }
}
