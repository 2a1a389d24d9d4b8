package graft.operators

import graft.{GraftSparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus assembly: the §2.6b operators compose into the
  * clean → dedup → decontaminate → sample shape of a real
  * training-data build, deterministically.
  */
class PipelineSpec extends GraftSparkSpec {

  private def contentHash(df: DataFrame): Long =
    df.select(xxhash64(df.columns.map(col): _*).as("h"))
      .agg(expr("bit_xor(h)")).head.getLong(0)

  test("clean -> dedup -> decontaminate -> sample composes and is deterministic") {
    val docs = Tables(spark, sfDir, "documents")

    // 1. exact-dedup keep set (one doc per content hash)
    val keep = Dedup.dedupExact(spark, sfDir).select(col("keep_id").as("doc_id"))
    val deduped = docs.join(keep, "doc_id")
    assert(deduped.count() <= docs.count() && deduped.count() > 0)

    // 2. drop eval-contaminated docs
    val dirty = Pipeline.pipeDecontaminate(spark, sfDir).select("doc_id")
    val clean = deduped.join(dirty, Seq("doc_id"), "left_anti")
    assert(clean.count() == deduped.count() - dirty
      .join(keep, "doc_id").count())

    // 3. near-dup clusters only keep representatives
    val clusters = Dedup.dedupClusters(spark, sfDir)
    val dropNearDups = clusters.filter(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")
    val finalSet = clean.join(dropNearDups, Seq("doc_id"), "left_anti")
    assert(finalSet.count() > 0 && finalSet.count() <= clean.count())

    // 4. deterministic: the same chain yields the identical content hash
    val h1 = contentHash(finalSet.select("doc_id", "lang"))
    val again = docs.join(keep, "doc_id")
      .join(dirty, Seq("doc_id"), "left_anti")
      .join(dropNearDups, Seq("doc_id"), "left_anti")
    val h2 = contentHash(again.select("doc_id", "lang"))
    assert(h1 == h2, "pipeline must be deterministic end to end")

    // 5. quota sample of the survivors still respects per-lang caps
    val sampled = Pipeline.pipeStratifiedSample(spark, sfDir)
    val perLang = sampled.groupBy("lang").count().collect()
    perLang.foreach(r => assert(r.getLong(1) <= 50))
  }
}
