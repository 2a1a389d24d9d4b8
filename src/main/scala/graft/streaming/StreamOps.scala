package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming operators for the training-data ingest path (SURVEY §2.7
  * ST13): cross-micro-batch deduplication composed from Spark's
  * stateful `dropDuplicates` — the state store holds one entry per
  * seen content key, so each distinct content is admitted exactly
  * once across batches, surviving restarts via the checkpoint.
  */
object StreamOps {

  /** Canonical content key: lowercase, trim, collapse whitespace,
    * md5 — the SAME canonical form the batch `dedup_normalized` pass
    * groups on, so stream-admitted and batch-deduped corpora agree on
    * what counts as a duplicate.
    */
  def contentKey(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Exact streaming dedup: one output row per distinct (normalized)
    * content ever seen. State is one md5 per distinct doc — unbounded
    * over an unbounded stream; prefer [[dedupExactWithinWatermark]]
    * when duplicate arrivals are time-local.
    */
  def dedupExact(stream: DataFrame, textCol: String): DataFrame =
    stream.withColumn("__content_key", contentKey(col(textCol)))
      .dropDuplicates("__content_key")
      .drop("__content_key")

  /** Bounded-state streaming dedup: duplicates arriving within the
    * watermark window collapse, and state older than the watermark is
    * EVICTED — the ingest shape at 100 TB/day, where duplicate bursts
    * (retries, crawler revisits) are time-local and exact cross-epoch
    * dedup belongs to the batch `pipe_incremental_dedup` pass.
    */
  def dedupExactWithinWatermark(stream: DataFrame, textCol: String,
      tsCol: String, delay: String): DataFrame =
    stream.withWatermark(tsCol, delay)
      .withColumn("__content_key", contentKey(col(textCol)))
      .dropDuplicatesWithinWatermark("__content_key")
      .drop("__content_key")
}
