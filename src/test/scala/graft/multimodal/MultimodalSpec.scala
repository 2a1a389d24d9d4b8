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

  test("batched stub decode agrees with the expression-side metadata") {
    val decoded = Multimodal.decodeFrames(spark, sfDir).toDF()
      .select(col("doc_id"), col("n_bytes"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"))
    val meta = Multimodal.mmDecodeMeta(spark, sfDir)
      .select("doc_id", "n_bytes", "width", "height")
    assert(decoded.exceptAll(meta).isEmpty && meta.exceptAll(decoded).isEmpty)
  }
}
