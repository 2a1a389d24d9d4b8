package graft.operators

import graft.{GraftSparkSpec, Tables}
import graft.lake.GraftTable
import org.apache.spark.sql.functions._

/** Materialized PQ index: OPTIMIZE trains the codebook once, persists
  * it as table metadata, writes m-byte codes as a sidecar; queries
  * scan codes instead of re-encoding the corpus per session.
  */
class PqIndexSpec extends GraftSparkSpec {

  test("materialized codes reproduce the fused-scan result; query plan reads codes only") {
    val mat = Similarity.simPqMaterialized(spark, sfDir)
    val plan = mat.queryExecution.executedPlan.toString
    assert(plan.contains("_graft_pq"), "query must scan the codes sidecar")
    assert(!plan.contains("embeddings.parquet"),
      "materialized path must not re-read or re-encode the embeddings")
    val fused = Similarity.simPq(spark, sfDir).collect().map(_.toSeq)
    assert(mat.collect().map(_.toSeq).toSeq == fused.toSeq)
  }

  test("rebuild is fingerprint-gated: no-op while data unchanged, refresh after DML") {
    Similarity.simPqMaterialized(spark, sfDir).collect()
    val t = GraftTable.forPath(spark, LakeOps.workDirPath(sfDir, "pqmat"))
    def builds: Long = t.history.filter(col("operation") === "BUILD PQ INDEX").count()
    def refreshes: Long = t.history.filter(col("operation") === "REFRESH PQ INDEX").count()
    assert(builds == 1)
    t.optimize() // nothing compacted, fingerprint unchanged -> skip
    assert(builds == 1 && refreshes == 0,
      "second OPTIMIZE must not re-encode unchanged data")
    // DML invalidates the stamp: the reader can detect staleness and
    // the next OPTIMIZE catches the codes up — incrementally (a
    // one-version delete window consolidates dirty ids instead of
    // re-encoding the corpus)
    t.delete(col("vec_id") % 7 === 0)
    val props = t.snapshot.metadata.get.properties
    assert(props.contains("graft.pq.embedding.fingerprint"))
    t.optimize()
    assert(builds + refreshes == 2, "OPTIMIZE after DML must refresh the codes")
    // the refreshed sidecar excludes deleted rows
    assert(t.pqCodes("embedding").filter(col("id") % 7 === 0).count() == 0)
  }

  test("vacuum spares the live PQ sidecar") {
    Similarity.simPqMaterialized(spark, sfDir).collect()
    val t = GraftTable.forPath(spark, LakeOps.workDirPath(sfDir, "pqmat"))
    val rel = t.snapshot.metadata.get.properties("graft.pq.embedding.sidecar")
    t.vacuum(0.0, dryRun = false)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(t.path, rel)))
    // codes still readable end-to-end
    assert(spark.read.parquet(s"${t.path}/$rel").count() > 0)
  }

  test("materialized IVF assignments reproduce the per-session result; rebuild gated") {
    val mat = Similarity.simIvfMaterialized(spark, sfDir)
    val live = Similarity.simIvf(spark, sfDir).collect().map(_.toSeq)
    assert(mat.collect().map(_.toSeq).toSeq == live.toSeq)
    val t = GraftTable.forPath(spark, LakeOps.workDirPath(sfDir, "ivfmat"))
    def builds: Long = t.history.filter(col("operation") === "BUILD IVF INDEX").count()
    // the fixture table may carry builds from older binaries (the
    // algorithm-versioned fingerprint forces exactly one rebuild per
    // quantizer change) — the gate's contract is "no rebuild while
    // data and algorithm are unchanged", not an absolute count
    val settled = builds
    assert(settled >= 1)
    t.optimize() // fingerprint unchanged -> no re-assignment pass
    assert(builds == settled)
    // live sidecars (centroids + assignments) survive vacuum
    val rel = t.snapshot.metadata.get.properties("graft.ivf.embedding.sidecar")
    t.vacuum(0.0, dryRun = false)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(t.path, rel, "assign")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(t.path, rel, "centroids")))
  }

  test("materialized MinHash sidecars reproduce the session dedup; rebuild gated") {
    val live = Dedup.dedupMinhashLsh(spark, sfDir).collect().map(_.toSeq)
    val idx = Dedup.dedupMinhashMaterialized(spark, sfDir)
    val plan = idx.queryExecution.executedPlan.toString
    assert(plan.contains("_graft_minhash"), "query must scan the minhash sidecars")
    assert(!plan.contains("documents.parquet"),
      "materialized path must not re-shingle the document text")
    assert(idx.collect().map(_.toSeq).toSeq == live.toSeq)
    val t = GraftTable.forPath(spark, LakeOps.workDirPath(sfDir, "mhmat"))
    def builds: Long = t.history.filter(col("operation") === "BUILD MINHASH INDEX").count()
    val settled = builds
    assert(settled >= 1)
    t.optimize() // fingerprint unchanged -> no re-signing pass
    assert(builds == settled)
    // live sidecars (sigs + bands) survive vacuum
    val rel = t.snapshot.metadata.get.properties("graft.minhash.text.sidecar")
    t.vacuum(0.0, dryRun = false)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(t.path, rel, "sigs")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(t.path, rel, "bands")))
  }

  test("inverted text index: plan reads postings only; incremental append + dirty-id refresh exact") {
    import spark.implicits._
    val search = TextOps.textSearch(spark, sfDir)
    val plan = search.queryExecution.executedPlan.toString
    assert(plan.contains("_graft_text"), "query must scan the postings sidecar")
    assert(!plan.contains("documents.parquet"),
      "index-backed search must not tokenize the document text")
    assert(search.count() > 0, "query terms exist in the corpus")
    // lifecycle on a private table (the shared fixture stays pristine)
    val t = GraftTable.create(spark, tmpDir("textidx-life"),
      Seq((1L, "alpha beta gamma"), (2L, "beta beta delta"),
        (3L, "gamma alpha")).toDF("doc_id", "text"),
      properties = Map("graft.text.index" -> "doc_id,text"))
    t.optimize()
    def freshPostings = t.toDF
      .select(col("doc_id").as("id"),
        posexplode(split(lower(trim(col("text"))), "\\s+")).as(Seq("pos", "term")))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos") + 1)).as("positions"))
      .collect().map(_.toSeq).toSet
    assert(t.textPostings("text").collect().map(_.toSeq).toSet == freshPostings)
    // append-only window writes a delta part, no full rebuild
    t.append(Seq((4L, "delta delta alpha")).toDF("doc_id", "text"))
    t.optimize()
    assert(t.snapshot.metadata.get.properties("graft.text.text.deltas").nonEmpty,
      "an append window must land as a delta part")
    assert(t.textPostings("text").collect().map(_.toSeq).toSet == freshPostings)
    // a dirty-id window (update) consolidates exactly
    t.update(col("doc_id") === 2L, Map("text" -> lit("epsilon only")))
    t.optimize()
    assert(t.textPostings("text").collect().map(_.toSeq).toSet == freshPostings,
      "post-update postings must equal a fresh derivation")
    // live postings survive vacuum
    val rel = t.snapshot.metadata.get.properties("graft.text.text.sidecar")
    t.vacuum(0.0, dryRun = false)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(t.path, rel)))
    // DESCRIBE DETAIL surfaces the live index artifact
    val g = new graft.lake.GraftSql(spark)
    g.register("tidx", t.path)
    val det = g.sql("DESCRIBE DETAIL tidx").collect()(0)
    assert(det.getString(det.fieldIndex("indexes")) == "text(text)",
      "DESCRIBE DETAIL must list the materialized index")
  }

  test("broadcast-variable assignment is bit-identical to the kernel at k > 1024") {
    import graft.functions.VectorFunctions
    // deterministic synthetic vectors (id-derived, no RNG); k past the
    // old hard cap exercises the path real corpora hit at ~10^5 rows
    val dim = 8
    val vecs = spark.range(1400).select(col("id"),
      array((0 until dim).map(j =>
        (sin(col("id") * (j + 3)) * 100).cast("double")): _*).as("v"))
    val k = 1300
    val centsLocal = vecs.filter(col("id") < k).orderBy("id")
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    val kernel = vecs.select(col("id"),
        posexplode(VectorFunctions.topCentroidIds(col("v"), centsLocal, 6)))
      .select(col("id"), (col("pos") + 1).cast("int").as("rr"),
        col("col").as("cluster"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val centsDf = vecs.filter(col("id") < k).orderBy("id")
      .select(col("id").cast("int").as("cid_c"), col("v").as("c"))
    val joined = VectorFunctions.assignTopCentroids(vecs, "id", "v", centsDf, 6)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(joined == kernel,
      "broadcast-path assignments must be bit-identical to the kernel's")
    assert(IvfIndex.kFor(100000000L) > 1024,
      "k must keep scaling as 8·√n past the old 1024 cap")
  }

  test("codebook property round-trips") {
    val books = Array.tabulate(4, 3, 2)((a, b, c) => (a * 100 + b * 10 + c).toLong)
    val back = PqCodebook.decodeBooks(PqCodebook.encodeBooks(books))
    assert(back.map(_.map(_.toSeq).toSeq).toSeq == books.map(_.map(_.toSeq).toSeq).toSeq)
  }
}
