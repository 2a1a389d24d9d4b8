package graft.streaming

import graft.{GraftSparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** ST23/ST24 — streaming state at 100 TB scale (SURVEY §2.7).
  *
  * The default HDFS-backed state store keeps every key ON-HEAP per
  * executor: a corpus-scale dedup (billions of content keys) or a
  * high-cardinality session map OOMs exactly when the pipeline grows.
  * Spark's bundled RocksDB provider spills state to local disk with a
  * bounded block cache — the deployment answer for state that scales
  * with data rather than with time. These specs prove the graft
  * streaming operators run unchanged on RocksDB state
  * (`spark.sql.streaming.stateStore.providerClass` is the only knob),
  * that the state actually lives in RocksDB (provider-specific
  * progress metrics), and that it survives a query RESTART from the
  * checkpoint — the recovery path a long-lived ingest loop exercises
  * every deploy.
  */
class RocksDbStateSpec extends GraftSparkSpec {

  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private def withRocksDb[A](body: => A): A = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksProvider)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  test("ST23: streaming dedup state lives in RocksDB and survives a " +
      "checkpointed query restart") {
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text").limit(80)
    val srcDir = tmpDir("rocks-src")
    val outDir = tmpDir("rocks-out")
    val ckDir = tmpDir("rocks-ck")
    docs.coalesce(1).write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema

    def runOnce(): org.apache.spark.sql.streaming.StreamingQuery = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      StreamOps.dedupExact(stream, "text").writeStream
        .outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .trigger(Trigger.AvailableNow()).start()
    }

    withRocksDb {
      val q1 = runOnce()
      q1.awaitTermination(120000)
      // the state operator must report RocksDB-specific metrics —
      // proof the provider conf took effect, not just that dedup ran
      val metricKeys = q1.recentProgress.flatMap(_.stateOperators)
        .flatMap(_.customMetrics.keySet().toArray.map(_.toString)).toSet
      assert(metricKeys.exists(_.toLowerCase.contains("rocksdb")),
        s"expected rocksdb state metrics, got $metricKeys")
      val n1 = spark.read.parquet(outDir).count()
      val distinct1 = spark.read.parquet(srcDir)
        .select(StreamOps.contentKey(col("text")).as("k")).distinct().count()
      assert(n1 == distinct1, s"first run admits each content once: $n1 vs $distinct1")

      // second source file: 50 exact re-sends read back from batch 1
      // (state must refuse them ACROSS the restart) + 25 genuinely new
      spark.read.parquet(srcDir).limit(50)
        .select((col("doc_id") + 900000).as("doc_id"), col("text"))
        .unionAll(spark.range(25)
          .select((col("id") + 950000).as("doc_id"),
            concat(lit("rocksdb fresh doc "), col("id").cast("string")).as("text")))
        .coalesce(1).write.mode("append").parquet(srcDir)

      val q2 = runOnce()
      q2.awaitTermination(120000)
      val n2 = spark.read.parquet(outDir).count()
      assert(n2 == distinct1 + 25,
        s"restart must remember admitted keys: got $n2, want ${distinct1 + 25}")
    }
  }

  test("ST25: RocksDB changelog checkpointing — per-commit changelogs " +
      "land in the checkpoint (O(delta) commits instead of full " +
      "snapshot uploads), restart recovery stays exact") {
    val ChangelogKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text").limit(60)
    val srcDir = tmpDir("rocks-cl-src")
    val outDir = tmpDir("rocks-cl-out")
    val ckDir = tmpDir("rocks-cl-ck")
    docs.coalesce(1).write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema

    def runOnce(): org.apache.spark.sql.streaming.StreamingQuery = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      StreamOps.dedupExact(stream, "text").writeStream
        .outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .trigger(Trigger.AvailableNow()).start()
    }

    withRocksDb {
      val prev = spark.conf.getOption(ChangelogKey)
      spark.conf.set(ChangelogKey, "true")
      try {
        val q1 = runOnce()
        q1.awaitTermination(120000)
        // metrics must surface the changelog writer — proof the commit
        // path writes deltas, not the snapshot-upload path alone
        val metricKeys = q1.recentProgress.flatMap(_.stateOperators)
          .flatMap(_.customMetrics.keySet().toArray.map(_.toString)).toSet
        assert(metricKeys.exists(_.toLowerCase.contains("changelog")),
          s"expected changelog commit metrics, got $metricKeys")
        // filesystem proof: the state checkpoint carries .changelog
        // files (per-commit deltas), the recovery food
        val w = java.nio.file.Files.walk(java.nio.file.Paths.get(ckDir))
        val changelogs =
          try {
            import scala.jdk.CollectionConverters._
            w.iterator().asScala
              .count(_.getFileName.toString.endsWith(".changelog"))
          } finally w.close()
        assert(changelogs > 0,
          "changelog checkpointing must write .changelog files")
        val n1 = spark.read.parquet(outDir).count()
        val distinct1 = spark.read.parquet(srcDir)
          .select(StreamOps.contentKey(col("text")).as("k")).distinct().count()
        assert(n1 == distinct1)
        // restart: recovery replays snapshot + changelogs; admitted
        // keys must still refuse, fresh keys must still admit
        spark.read.parquet(srcDir).limit(30)
          .select((col("doc_id") + 900000).as("doc_id"), col("text"))
          .unionAll(spark.range(10)
            .select((col("id") + 970000).as("doc_id"),
              concat(lit("changelog fresh doc "),
                col("id").cast("string")).as("text")))
          .coalesce(1).write.mode("append").parquet(srcDir)
        val q2 = runOnce()
        q2.awaitTermination(120000)
        assert(spark.read.parquet(outDir).count() == distinct1 + 10,
          "changelog-checkpointed state must survive the restart exactly")
      } finally prev match {
        case Some(v) => spark.conf.set(ChangelogKey, v)
        case None => spark.conf.unset(ChangelogKey)
      }
    }
  }

  test("ST24: native session_window aggregation (gap-merged sessions) " +
      "matches the batch result on RocksDB state") {
    import spark.implicits._
    val ev = Tables(spark, sfDir, "events")
      .select(col("user_id"), col("ts")).limit(400)
    val srcDir = tmpDir("rocks-sess-src")
    ev.coalesce(1).write.mode("append").parquet(srcDir)
    // sentinel far past the data: pushes the watermark so every real
    // session closes and append mode emits it before AvailableNow ends
    Seq((-1L, java.sql.Timestamp.valueOf("2031-01-01 00:00:00")))
      .toDF("user_id", "ts").coalesce(1).write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema

    val expected = spark.read.parquet(srcDir).filter(col("user_id") >= 0)
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("start"), col("n"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet

    withRocksDb {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = stream.withWatermark("ts", "1 minute")
        .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), col("session_window.start").as("start"), col("n"))
        .writeStream.outputMode("append").format("memory")
        .queryName("rocks_sessions").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      val got = spark.table("rocks_sessions").filter(col("user_id") >= 0)
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
      assert(got == expected,
        s"stream sessions must equal batch sessions: ${got.size} vs ${expected.size}")
      assert(got.nonEmpty, "the spec must exercise at least one session")
    }
  }
}
