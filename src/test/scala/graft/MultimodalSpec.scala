package graft

import graft.operators.MultimodalOps

/** Multimodal plumbing: binary payloads, typed metadata, and the batched
  * decode path with the real PPM (P6) kernel. */
class MultimodalSpec extends SparkSpecBase {

  test("PPM kernel really parses the Netpbm format (magic, comments, header, plane)") {
    // hand-built 2×2 P6 with a header comment — not an encoder round-trip,
    // so the parser is exercised against the SPEC, not our own writer
    val img = "P6\n# hand-made\n2 2\n255\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40, 50, 60, 0, 0, 0, 7, 8, 9)
    val (w, h, maxval, px) = MultimodalOps.decodePpm(img)
    assert(w == 2 && h == 2 && maxval == 255 && px.length == 12)
    assert(px(0) == 10 && px(11) == 9)
    // encoder emits spec-compliant bytes the parser round-trips losslessly
    val data = "hello ppm decode".getBytes("US-ASCII")
    val (w2, h2, mv2, px2) = MultimodalOps.decodePpm(MultimodalOps.ppmEncode(data))
    assert(w2 == MultimodalOps.PpmWidth && h2 == 1 && mv2 == 255)
    assert(px2.take(data.length).sameElements(data), "pixel plane must carry the payload")
    assert(px2.drop(data.length).forall(_ == 0), "padding must be zero")
    // non-PPM bytes are rejected, not mis-parsed
    intercept[IllegalArgumentException](
      MultimodalOps.decodePpm("JFIF not a ppm".getBytes("US-ASCII")))
    // truncated plane is rejected
    intercept[IllegalArgumentException](
      MultimodalOps.decodePpm("P6\n4 4\n255\nxy".getBytes("US-ASCII")))
  }

  test("BMP kernel really parses the bitmap format (planted image, both row orders, rejects)") {
    // hand-built 2×2 24-bpp bottom-up BMP (stride 8: 6 data + 2 pad per
    // row) — built against the SPEC byte-by-byte, not our own encoder.
    // Logical top row (10,20,30 | 40,50,60) is stored LAST.
    def le16(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32(v: Int) = le16(v & 0xFFFF) ++ le16(v >>> 16)
    val planted: Array[Byte] =
      "BM".getBytes("US-ASCII") ++ le32(54 + 16) ++ le32(0) ++ le32(54) ++
        le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++ le32(0) ++
        le32(16) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++
        Array[Byte](70, 80, 90, 100, 110, 120, 0, 0) ++ // bottom row + pad
        Array[Byte](10, 20, 30, 40, 50, 60, 0, 0)       // top row + pad
    val (w, h, mv, px) = MultimodalOps.decodeBmp(planted)
    assert(w == 2 && h == 2 && mv == 255 && px.length == 12)
    assert(px(0) == 10 && px(5) == 60 && px(6) == 70 && px(11) == 120,
      "bottom-up rows must come back in logical top-down order, pad stripped")
    // top-down variant (negative height) parses to the SAME logical plane
    val topDown: Array[Byte] =
      "BM".getBytes("US-ASCII") ++ le32(54 + 16) ++ le32(0) ++ le32(54) ++
        le32(40) ++ le32(2) ++ le32(-2) ++ le16(1) ++ le16(24) ++ le32(0) ++
        le32(16) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++
        Array[Byte](10, 20, 30, 40, 50, 60, 0, 0) ++
        Array[Byte](70, 80, 90, 100, 110, 120, 0, 0)
    assert(MultimodalOps.decodeBmp(topDown)._4.sameElements(px))
    // encoder emits spec bytes the parser round-trips losslessly
    val data = "hello bmp decode".getBytes("US-ASCII")
    val (w2, h2, _, px2) = MultimodalOps.decodeBmp(MultimodalOps.bmpEncode(data))
    assert(w2 == MultimodalOps.PpmWidth && h2 == 1)
    assert(px2.take(data.length).sameElements(data) &&
      px2.drop(data.length).forall(_ == 0))
    // and decodeImage sniffs the codec: BOTH wrappers of the same bytes
    // yield the identical logical plane
    val viaPpm = MultimodalOps.decodeImage(MultimodalOps.ppmEncode(data))
    val viaBmp = MultimodalOps.decodeImage(MultimodalOps.bmpEncode(data))
    assert(viaPpm._4.sameElements(viaBmp._4), "codec-blind kernels need equal planes")
    // rejects: wrong magic, unsupported bpp, truncated pixel array
    intercept[IllegalArgumentException](
      MultimodalOps.decodeBmp("GIF89a nope nope nope nope nope nope nope nope nope nope".getBytes("US-ASCII")))
    val bad8bpp = planted.clone(); bad8bpp(28) = 8
    intercept[IllegalArgumentException](MultimodalOps.decodeBmp(bad8bpp))
    intercept[IllegalArgumentException](
      MultimodalOps.decodeBmp(planted.dropRight(4)))
  }

  test("PNG kernel round-trips losslessly, sniffs, and rejects corrupt streams") {
    val data = "hello png decode ÿ mixed bytes".getBytes("ISO-8859-1")
    val png = MultimodalOps.pngEncode(data)
    // real PNG container: 8-byte signature + IHDR
    assert((png(0) & 0xFF) == 0x89 && png(1) == 'P' && png(2) == 'N' &&
      png(3) == 'G', "encoder must emit a real PNG signature")
    val (w, h, mv, px) = MultimodalOps.decodePng(png)
    assert(w == MultimodalOps.PpmWidth && mv == 255)
    assert(px.take(data.length).sameElements(data) &&
      px.drop(data.length).forall(_ == 0),
      "PNG is lossless: the plane must ride verbatim")
    // codec-blind sniffing: all three lossless wrappers of the same
    // bytes yield the identical logical plane
    val viaPpm = MultimodalOps.decodeImage(MultimodalOps.ppmEncode(data))
    val viaPng = MultimodalOps.decodeImage(png)
    assert(viaPpm._4.sameElements(viaPng._4), s"$h rows; planes must agree")
    // rejects: corrupt signature, and a valid signature over garbage
    intercept[IllegalArgumentException](
      MultimodalOps.decodePng("nope not a png at all".getBytes("US-ASCII")))
    val torn = png.clone()
    java.util.Arrays.fill(torn, 16, torn.length, 0x5A.toByte)
    intercept[Exception](MultimodalOps.decodePng(torn))
  }

  test("JPEG branch decodes real JFIF bytes: exact geometry, bounded pixel error") {
    val data = Array.tabulate[Byte](3 * 16 * 4)(i => ((i * 7) % 251).toByte)
    val jpg = MultimodalOps.jpegEncode(data)
    assert((jpg(0) & 0xFF) == 0xFF && (jpg(1) & 0xFF) == 0xD8,
      "encoder must emit a real SOI marker")
    val (w, h, _, px) = MultimodalOps.decodeImage(jpg) // sniffed, not named
    assert(w == MultimodalOps.PpmWidth && h == 4 && px.length == data.length,
      "lossy or not, geometry and plane shape are exact")
    // lossy bound: mean absolute per-byte error under the writer's
    // default quality stays small on a smooth-ish ramp
    val mae = px.zip(data).map { case (a, b) =>
      math.abs((a & 0xFF) - (b & 0xFF)) }.sum.toDouble / px.length
    assert(mae < 48.0, s"JPEG mean abs error $mae implausibly large")
    intercept[IllegalArgumentException](
      MultimodalOps.decodeJpeg("not a jpeg either".getBytes("US-ASCII")))
  }

  test("aHash and decode digests agree across PPM and PNG payload codecs") {
    // the sniffing kernel makes every downstream operator codec-blind:
    // prove it at the DataFrame level on the real corpus
    val viaPpm = MultimodalOps.imageHashOf(
      MultimodalOps.ppmPayloads(spark, Sf)).orderBy("doc_id").collect()
    val viaPng = MultimodalOps.imageHashOf(
      MultimodalOps.pngPayloads(spark, Sf)).orderBy("doc_id").collect()
    assert(viaPpm.sameElements(viaPng),
      "perceptual hashes must not depend on the container codec")
  }

  test("resize kernel box-averages hand-computed blocks, clips edge blocks, caps at 1x1") {
    // hand-built 4×4 P6: pixel (x, y) has R = 16y + 4x, G = R + 1, B = R + 2
    val plane = (for (y <- 0 until 4; x <- 0 until 4; c <- 0 until 3)
      yield (16 * y + 4 * x + c).toByte).toArray
    val img = "P6\n4 4\n255\n".getBytes("US-ASCII") ++ plane
    val (w, h, ow, oh, out) = MultimodalOps.resizePpm(img, 2)
    assert(w == 4 && h == 4 && ow == 2 && oh == 2 && out.length == 12)
    // top-left block R channel: mean(0, 4, 16, 20) = 10; G/B shift by 1/2
    assert((out(0) & 0xFF) == 10 && (out(1) & 0xFF) == 11 && (out(2) & 0xFF) == 12)
    // bottom-right block R: mean(40, 44, 56, 60) = 50
    assert((out(9) & 0xFF) == 50)
    // odd height: 4×3 image at factor 2 → 2×1 output, blocks complete
    val img43 = "P6\n4 3\n255\n".getBytes("US-ASCII") ++ plane.take(36)
    val (_, _, ow2, oh2, out2) = MultimodalOps.resizePpm(img43, 2)
    assert(ow2 == 2 && oh2 == 1 && out2.length == 6)
    // height-1 image: output clamps to 1 row, edge block averages the
    // TWO in-bounds samples only (the kernel's bounds clip)
    val img41 = "P6\n4 1\n255\n".getBytes("US-ASCII") ++ plane.take(12)
    val (_, _, _, oh3, out3) = MultimodalOps.resizePpm(img41, 2)
    assert(oh3 == 1)
    assert((out3(0) & 0xFF) == (0 + 4) / 2, "edge block must mean in-bounds pixels only")
  }

  test("payloads carry the exact UTF-8 bytes and typed metadata") {
    val rows = MultimodalOps.payloads(spark, Sf)
      .limit(20).collect()
    for (r <- rows) {
      val payload = r.getAs[Array[Byte]]("payload")
      val meta = r.getStruct(r.fieldIndex("meta"))
      assert(meta.getString(0) == "text/plain")
      assert(meta.getLong(1) == payload.length, "metadata byte count must match payload")
    }
  }

  test("decode runs in bounded batches and is deterministic") {
    val a = MultimodalOps.decodeFeatures(spark, Sf, batchSize = 64).collect()
    val b = MultimodalOps.decodeFeatures(spark, Sf, batchSize = 64).collect()
    assert(a.length == Lake.documents(spark, Sf).count())
    for (r <- a) {
      assert(r.getInt(2) <= 64 && r.getInt(2) >= 1, "decoder batch out of bounds")
      assert(r.getSeq[Float](3).length == 8, "feature vector arity")
    }
    val fa = a.map(r => (r.getLong(0), r.getSeq[Float](3))).toMap
    val fb = b.map(r => (r.getLong(0), r.getSeq[Float](3))).toMap
    assert(fa == fb, "stub decode must be deterministic")
  }

  test("batched decode throughput is reported and clears a sanity floor") {
    // informational bench for the round report: bytes through the chained
    // encode→parse mapPartitions path per second. Measured at sf0.1 —
    // enough bytes that per-job latency (two Dataset stages) stops
    // dominating the MB/s figure. The floor only guards against a
    // pathological regression (e.g. per-row decoder invocation
    // re-entering the JVM boundary per element).
    val sf = "/root/testdata/sf0.1"
    import org.apache.spark.sql.functions._
    val totalBytes = MultimodalOps.payloads(spark, sf)
      .agg(sum(length(col("payload")))).head().getLong(0)
    MultimodalOps.decodeFeatures(spark, sf).count() // warm
    val t0 = System.nanoTime()
    val n = MultimodalOps.decodeFeatures(spark, sf).count()
    val secs = (System.nanoTime() - t0) / 1e9
    val mbps = totalBytes / 1e6 / secs
    info(f"decode plumbing: $n rows, ${totalBytes / 1e6}%.2f MB in $secs%.3f s = $mbps%.1f MB/s")
    assert(mbps > 0.5, f"decode throughput collapsed: $mbps%.2f MB/s")
  }

  test("scene cuts fire exactly at the planted intensity jump") {
    import spark.implicits._
    // frame means: 'a'*16 → 97, 'b'*16 → 98 (delta 1, below 4.0), then
    // 'z'*16 → 122 (delta 24, a cut); constant doc → zero cuts
    val docs = Seq(
      (1L, "a" * 16 + "b" * 16 + "z" * 16),
      (2L, "m" * 48)).toDF("doc_id", "text")
    val out = MultimodalOps.sceneCuts(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(1L) == ((3L, 1L, 24.0)), s"planted cut missed: ${out.get(1L)}")
    assert(out(2L) == ((3L, 0L, 0.0)), s"constant doc cut: ${out.get(2L)}")
  }

  test("aHash: hand-computed plane, determinism, and near-dup sensitivity") {
    // 128-byte plane: dark first half, bright second half → bits 0..31
    // clear, 32..63 set → bands (0, 0, 0xFFFF, 0xFFFF), 32 bits set
    val px = Array.fill(64)(0.toByte) ++ Array.fill(64)(255.toByte)
    val (bands, nbits) = MultimodalOps.aHash(px)
    assert(bands.toSeq == Seq(0L, 0L, 65535L, 65535L), bands.toSeq.toString)
    assert(nbits == 32L)
    // deterministic
    assert(MultimodalOps.aHash(px)._1.toSeq == bands.toSeq)
    // flipping a few bytes moves few bits; an unrelated plane moves many
    val tweaked = px.clone(); tweaked(0) = 255.toByte; tweaked(1) = 255.toByte
    val other = Array.tabulate(128)(i => (if (i % 2 == 0) 255 else 0).toByte)
    def hamming(a: Array[Long], b: Array[Long]): Int =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    val hTweak = hamming(MultimodalOps.aHash(tweaked)._1, bands)
    val hOther = hamming(MultimodalOps.aHash(other)._1, bands)
    assert(hTweak <= 2, s"two flipped bytes moved $hTweak bits")
    assert(hOther > 10, s"an unrelated plane must be far ($hOther)")
    // empty-chunk regime: planes shorter than 64 bytes still hash
    val (tinyBands, tinyBits) = MultimodalOps.aHash(Array.fill(10)(7.toByte))
    assert(tinyBits > 0 && tinyBands.length == 4)
  }

  test("streaming image screen: copies and near-dups drop per batch, novel images pass") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ppm(bytes: Array[Byte]): Array[Byte] = MultimodalOps.ppmEncode(bytes)
    val imgA = Array.tabulate(256)(i => (i % 97).toByte)
    val imgB = Array.fill(256)(200.toByte)
    val ref = MultimodalOps.imageHashOf(
      Seq((1L, ppm(imgA)), (2L, ppm(imgB))).toDF("doc_id", "payload"))
    val refBands = MultimodalOps.referenceImageBands(ref)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nearA = imgA.clone(); nearA(0) = (nearA(0) + 1).toByte
    val novel = Array.tabulate(512)(i => ((i * 31) % 251).toByte)
    val tmp = java.nio.file.Files.createTempDirectory("graft_img_screen").toString
    val input = MemoryStream[(Long, Array[Byte])]
    val query = input.toDF().toDF("doc_id", "payload")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        MultimodalOps.screenImages(MultimodalOps.imageHashOf(batch), refBands)
          .write.mode("append").parquet(s"$tmp/novel")
        ()
      }.start()
    try {
      input.addData(Seq(
        (10L, ppm(imgA)),   // exact copy of reference — drops
        (11L, ppm(nearA)),  // one-byte tweak — band collision, drops
        (12L, ppm(novel)))) // genuinely new — passes
      query.processAllAvailable()
      val survivors = spark.read.parquet(s"$tmp/novel")
        .collect().map(_.getLong(0)).toSet
      assert(survivors == Set(12L), s"only the novel image survives: $survivors")
    } finally { query.stop(); refBands.unpersist() }
  }

  test("WAV kernel really speaks RIFF (header fields, chunk walk, pads, rejects)") {
    import graft.operators.MultimodalOps.{wavEncode, decodeWav}
    // round-trip: every byte becomes the centered full-scale sample
    val data = Array[Byte](0, 1, 127, -128, -1, 64) // unsigned 0,1,127,128,255,64
    val wav = wavEncode(data)
    assert(wav.length == 44 + 2 * data.length)
    assert(new String(wav, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(wav, 8, 4, "US-ASCII") == "WAVE")
    val (rate, ch, bits, samples) = decodeWav(wav)
    assert(rate == 8000 && ch == 1 && bits == 16)
    assert(samples.toSeq == data.toSeq.map(b => (((b & 0xFF) - 128) << 8).toShort))

    // chunk-walk: data BEFORE fmt, an unknown ODD-length chunk with its
    // pad byte between them — the real-file shapes naive parsers break on
    def le32(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    val fmt = wav.slice(12, 36) // "fmt " + len + 16 body bytes
    val dataChunk = wav.slice(36, wav.length)
    val junk = "JUNK".getBytes("US-ASCII") ++ le32(3) ++
      Array[Byte](9, 9, 9, 0) // 3 bytes + 1 pad
    val reordered = wav.slice(0, 4) ++
      le32(4 + dataChunk.length + junk.length + fmt.length) ++
      "WAVE".getBytes("US-ASCII") ++ dataChunk ++ junk ++ fmt
    val (r2, _, _, s2) = decodeWav(reordered)
    assert(r2 == 8000 && s2.toSeq == samples.toSeq,
      "chunk order and pad bytes must not matter")

    // rejects: truncated data chunk, missing fmt, stereo, non-PCM
    val truncated = wav.slice(0, wav.length - 1)
    intercept[IllegalArgumentException](decodeWav(truncated))
    val noFmt = wav.slice(0, 12) ++ dataChunk
    intercept[IllegalArgumentException](decodeWav(noFmt))
    val stereo = wav.clone(); stereo(22) = 2
    intercept[IllegalArgumentException](decodeWav(stereo))
    val alaw = wav.clone(); alaw(20) = 6
    intercept[IllegalArgumentException](decodeWav(alaw))
  }

  test("wavStats: layout arithmetic, zero-length clip, and batch independence") {
    val rows = MultimodalOps.wavStats(spark, Sf, batchSize = 7).collect()
    val docs = Lake.documents(spark, Sf)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == docs.size)
    for (r <- rows.take(20)) {
      val bytes = docs(r.getLong(0)).getBytes("UTF-8")
      val n = bytes.length.toLong
      assert(r.getLong(1) == 44 + 2 * n)
      assert(r.getLong(2) == 8000L && r.getLong(3) == n)
      assert(r.getLong(4) == n * 1000 / 8000)
      val sq = bytes.map(b => { val s = ((b & 0xFF) - 128).toLong * 256; s * s }).sum
      if (n > 0)
        assert(math.abs(r.getDouble(5) - math.sqrt(sq.toDouble / n)) < 1e-3)
      val peak = if (n == 0) 0L
        else bytes.map(b => math.abs(((b & 0xFF) - 128).toLong * 256)).max
      assert(r.getLong(6) == peak)
    }
    // batch size must not change values
    val rows64 = MultimodalOps.wavStats(spark, Sf, batchSize = 64).collect()
    assert(rows.map(_.toSeq).toSeq == rows64.map(_.toSeq).toSeq)
  }
}
