package graft.multimodal

import graft.GraftSparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends GraftSparkSpec {

  test("payload table exposes binary payload + typed metadata") {
    val pt = Multimodal.payloadTable(spark, sfDir)
    val f = pt.schema("payload")
    assert(f.dataType.typeName == "binary")
    assert(pt.schema("meta").dataType.typeName == "struct")
    assert(pt.count() > 0)
  }

  test("payload embeddings feed ANN search end-to-end") {
    import graft.functions.VectorFunctions
    val emb = Multimodal.payloadEmbeddings(spark, sfDir).cache()
    // deterministic: same payload -> identical unit vector
    val again = Multimodal.payloadEmbeddings(spark, sfDir)
    assert(emb.exceptAll(again).isEmpty)
    // norms ~1 (unit vectors) so cosine == dot product downstream
    val norms = emb.limit(20).select(
      VectorFunctions.cosine(col("embedding"), col("embedding")).as("c")).collect()
    norms.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-3))
    // brute-force top-1 neighbor of each of 5 query docs is itself
    // when joined against the full corpus (cos = 1 at rank 1)
    val q = emb.filter(col("doc_id") < 5)
      .select(col("doc_id").as("qid"), col("embedding").as("qe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    val top = emb.select(col("doc_id").as("cid"), col("embedding").as("ce"))
      .join(broadcast(q))
      .withColumn("cos", VectorFunctions.cosine(col("qe"), col("ce")))
      .withColumn("rn", row_number().over(w))
    val best = top.filter(col("rn") === 1).collect()
    best.foreach(r => assert(math.abs(r.getAs[Double]("cos") - 1.0) < 1e-6))
    emb.unpersist()
  }

  test("media codec parses crafted BMP/WAV headers byte-for-byte") {
    import graft.functions.MediaCodec
    // hand-written BMP header (NOT produced by makeBmp): 640×480
    // little-endian at offsets 18/22, magic 'BM'
    val bmp = new Array[Byte](60)
    bmp(0) = 'B'; bmp(1) = 'M'
    bmp(18) = 0x80.toByte; bmp(19) = 0x02 // 640 = 0x0280
    bmp(22) = 0xE0.toByte; bmp(23) = 0x01 // 480 = 0x01E0
    val bm = MediaCodec.decode(bmp)
    assert(bm.format == "bmp" && bm.width == 640 && bm.height == 480)
    // top-down BMP: negative height, geometry is |h|
    val neg = bmp.clone()
    neg(22) = (0x100 - 0xE0).toByte; neg(23) = 0xFE.toByte
    neg(24) = 0xFF.toByte; neg(25) = 0xFF.toByte // -480 LE
    assert(MediaCodec.decode(neg).height == 480)

    // hand-written WAV with a LIST chunk BEFORE fmt (chunk-walk test):
    // 16000 Hz mono 8-bit, 10-byte data chunk
    val wav = java.nio.ByteBuffer.allocate(74)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    wav.put("RIFF".getBytes("US-ASCII")).putInt(66)
      .put("WAVE".getBytes("US-ASCII"))
      .put("LIST".getBytes("US-ASCII")).putInt(4).putInt(0)
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(16000).putInt(16000)
      .putShort(1).putShort(8)
      .put("data".getBytes("US-ASCII")).putInt(10).put(new Array[Byte](10))
    val wm = MediaCodec.decode(wav.array())
    assert(wm.format == "wav" && wm.sampleRate == 16000 && wm.nSamples == 10)

    // build→parse round-trips exactly; garbage falls back to raw
    val rt = MediaCodec.decode(MediaCodec.makeBmp(123, 77, Array[Byte](1, 2)))
    assert(rt.width == 123 && rt.height == 77)
    val wrt = MediaCodec.decode(MediaCodec.makeWav(32000, new Array[Byte](25)))
    assert(wrt.sampleRate == 32000 && wrt.nSamples == 25)
    assert(MediaCodec.decode("not a media file".getBytes).format == "raw")
  }

  test("png codec: CRC-verified IHDR parse, IDAT span, corrupt-header fallback") {
    import graft.functions.MediaCodec
    // build→parse round-trips geometry through real chunk framing
    val content = "idat payload bytes".getBytes("US-ASCII")
    val png = MediaCodec.makePng(321, 95, content)
    val m = MediaCodec.decode(png)
    assert(m.format == "png" && m.width == 321 && m.height == 95)
    // a flipped bit in the IHDR width invalidates the CRC: the parser
    // must refuse the geometry, not emit garbage
    val bad = png.clone()
    bad(17) = (bad(17) ^ 0x01).toByte
    assert(MediaCodec.decode(bad).format == "raw")
    // content stats fold exactly the IDAT span the chunk walk locates
    val row = graft.functions.MediaContentStats.kernel(png)
    assert(row.getUTF8String(0).toString == "png")
    assert(row.getLong(1) == content.length)
    assert(row.getLong(2) == content.map(_ & 0xff).map(_.toLong).sum)
    // truncated mid-IDAT: the declared size runs past the buffer and
    // the walk stops without overrun
    val trunc = java.util.Arrays.copyOf(png, 40)
    assert(MediaCodec.decode(trunc).format == "png")
    assert(graft.functions.MediaContentStats.kernel(trunc).getLong(1) <= 7)
  }

  test("content stats address the span the header declares, not byte 54+") {
    import graft.functions.{MediaCodec, MediaContentStats}
    def stats(p: Array[Byte]) = MediaContentStats.kernel(p)
    // crafted BMP whose pixel-array OFFSET field says 60 (6 bytes of
    // palette/gap after the 54-byte headers): a parser that blindly
    // slices [54:] would fold the gap bytes in and get sum 99+3 wrong
    val px = Array[Byte](10, 20, 30)
    val bmp = MediaCodec.makeBmp(3, 1, Array[Byte](99, 99, 99, 99, 99, 99) ++ px)
    bmp(10) = 60 // pixel data offset -> 60
    bmp(34) = 3; bmp(35) = 0; bmp(36) = 0; bmp(37) = 0 // biSizeImage -> 3
    val r = stats(bmp)
    assert(r.getString(0) == "bmp")
    assert(r.getLong(1) == 3 && r.getLong(2) == 60 && r.getLong(3) == 1400)
    assert(r.getLong(4) == 10 && r.getLong(5) == 30)
    // WAV: data chunk located by the RIFF walk even behind a LIST chunk
    val wav = java.nio.ByteBuffer.allocate(74)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    wav.put("RIFF".getBytes("US-ASCII")).putInt(66)
      .put("WAVE".getBytes("US-ASCII"))
      .put("LIST".getBytes("US-ASCII")).putInt(4).putInt(0)
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(16000).putInt(16000)
      .putShort(1).putShort(8)
      .put("data".getBytes("US-ASCII")).putInt(10)
      .put(Array.tabulate[Byte](10)(i => (i + 1).toByte))
    val w = stats(wav.array())
    assert(w.getString(0) == "wav")
    assert(w.getLong(1) == 10 && w.getLong(2) == 55 && w.getLong(3) == 385)
    assert(w.getLong(4) == 1 && w.getLong(5) == 10)
    // truncated data chunk: declared 10 bytes, only 4 present (data
    // bytes start at offset 56; cut at 60) — the fold must clamp
    val trunc = java.util.Arrays.copyOf(wav.array(), 60)
    assert(stats(trunc).getLong(1) == 4)
    // raw fallback covers the whole payload
    val raw = stats("ab".getBytes("US-ASCII"))
    assert(raw.getString(0) == "raw" && raw.getLong(1) == 2 &&
      raw.getLong(2) == 'a' + 'b')
  }

  test("energy segmentation kernel: exact cells, short content, " +
      "empty/hostile payloads clamp") {
    import graft.functions.{MediaCodec, MediaEnergySegments}
    def seg(p: Array[Byte]) = MediaEnergySegments.kernel(p)
    // hand-computable WAV: 4 samples (0, 0, 0, 10) in a real container
    // — len 4 < 16 cells ⇒ 4 cells of one byte; energy sits entirely
    // in cell 3: score_3 = 100·4 − 100·1 = 300, others = 0 − 100·1
    val wav = MediaCodec.makeWav(16000, Array[Byte](0, 0, 0, 10))
    val r = seg(wav)
    assert(r.getLong(0) == 4 && r.getLong(1) == 4,
      s"4 content bytes -> 4 cells: $r")
    assert(r.getLong(2) == 1, "exactly one above-average cell")
    assert(r.getLong(3) == 3 && r.getLong(4) == 300,
      s"peak cell 3 with score 100*4 - 100*1 = 300: $r")
    // uniform content: every score is exactly 0 — nothing 'loud'
    val flat = seg(MediaCodec.makeWav(8000, Array.fill[Byte](32)(7)))
    assert(flat.getLong(1) == 16 && flat.getLong(2) == 0,
      s"uniform content has no above-average cell: $flat")
    assert(flat.getLong(4) == 0)
    // empty content (WAV with a 0-byte data chunk): the all-zero row
    val empty = seg(MediaCodec.makeWav(8000, Array.empty[Byte]))
    assert(empty.getLong(0) == 0 && empty.getLong(1) == 0 &&
      empty.getLong(2) == 0 && empty.getLong(3) == -1L)
    // raw fallback (no container): segments the whole payload
    val raw = seg("aaab".getBytes("US-ASCII"))
    assert(raw.getLong(0) == 4 && raw.getLong(3) == 3,
      s"'b' (98) > 'a' (97): peak in the last cell: $raw")
    // truncated WAV (declared 10 data bytes, 4 present): the span
    // clamps — the kernel must not overrun the buffer
    val full = MediaCodec.makeWav(8000, Array.tabulate[Byte](10)(i => i.toByte))
    val trunc = java.util.Arrays.copyOf(full, full.length - 6)
    assert(seg(trunc).getLong(0) == 4, "clamped content, no overrun")
  }

  test("batched stub decode agrees with the expression-side metadata") {
    val decoded = Multimodal.decodeFrames(spark, sfDir).toDF()
      .select(col("doc_id"), col("n_bytes"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"))
    val meta = Multimodal.mmDecodeMeta(spark, sfDir)
      .select("doc_id", "n_bytes", "width", "height")
    assert(decoded.exceptAll(meta).isEmpty && meta.exceptAll(decoded).isEmpty)
  }
}
