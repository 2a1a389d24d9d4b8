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

  test("batched stub decode agrees with the expression-side metadata") {
    val decoded = Multimodal.decodeFrames(spark, sfDir).toDF()
      .select(col("doc_id"), col("n_bytes"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"))
    val meta = Multimodal.mmDecodeMeta(spark, sfDir)
      .select("doc_id", "n_bytes", "width", "height")
    assert(decoded.exceptAll(meta).isEmpty && meta.exceptAll(decoded).isEmpty)
  }
}
