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

  test("batched stub decode agrees with the expression-side metadata") {
    val decoded = Multimodal.decodeFrames(spark, sfDir).toDF()
      .select(col("doc_id"), col("n_bytes"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"))
    val meta = Multimodal.mmDecodeMeta(spark, sfDir)
      .select("doc_id", "n_bytes", "width", "height")
    assert(decoded.exceptAll(meta).isEmpty && meta.exceptAll(decoded).isEmpty)
  }
}
