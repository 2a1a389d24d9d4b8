package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (nearest earlier event) — an operator Spark lacks
  * natively (SURVEY §2.2 Q13). Implemented with the scalable
  * union+window technique: one shuffle on the join key, a single
  * ordered window pass, no row explosion — at 100 TB this stays
  * O(n log n) per key instead of the O(n·m) filter-join.
  */
object AsOf {

  /** Generic as-of: for each left row, attach the latest right row
    * (by `tsCol`) with right.ts <= left.ts, per `keyCol`.
    * `valueCols` are carried from the right side.
    */
  def joinAsOf(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, carryCol: String): DataFrame = {
    val l = left.withColumn("__side", lit(1))
      .withColumn("__carry", lit(null).cast(right.schema(carryCol).dataType))
    val r = right.withColumn("__side", lit(0))
      .withColumn("__carry", col(carryCol))
      .select(l.columns.map(col): _*)
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__carry"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__carry")
  }

  /** Range (interval) join, bucketized — the second join shape Spark
    * lacks natively. Attribution: count each user's clicks inside the
    * hour before every purchase. Intervals explode into fixed 15-min
    * buckets (≤5 per interval), probes map to exactly one bucket, so
    * the join is a hash-partitioned equi-join on (user, bucket) + a
    * residual range filter — candidate volume is bounded by bucket
    * width instead of the O(purchases × clicks) per-user cross join,
    * and a probe can't duplicate (it lives in one bucket).
    */
  def q28RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val HourUs = 3600000000L
    val BucketUs = 900000000L // 15 min
    val e = Tables(spark, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("pts"))
      .withColumn("bucket", explode(sequence(
        floor((col("pts") - HourUs) / BucketUs), floor(col("pts") / BucketUs))))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("cts"))
      .withColumn("bucket", floor(col("cts") / BucketUs))
    purchases.join(clicks, Seq("user_id", "bucket"))
      .filter(col("cts") > col("pts") - HourUs && col("cts") <= col("pts"))
      .groupBy("event_id").agg(count(lit(1)).as("n_clicks"))
      .orderBy("event_id")
  }

  /** For each purchase event, epoch-µs of the user's latest click at
    * or before the purchase (purchases with no prior click dropped,
    * matching the inner-join oracle).
    */
  def lastClickBeforePurchase(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(lit(-1L).as("event_id"), col("user_id"), col("ts"),
        col("ts").as("click_ts"))
    joinAsOf(purchases, clicks, keyCol = "user_id", tsCol = "ts",
        carryCol = "click_ts")
      .select(col("event_id"), unix_micros(col("__asof")).as("last_click_us"))
      .filter(col("last_click_us").isNotNull)
      .orderBy("event_id")
  }
}
