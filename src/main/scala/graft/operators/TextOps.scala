package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis queries over the `documents` table (SURVEY §2.6).
  * All computations are pure built-in-expression pipelines (codegen'd)
  * with exactly-matching DuckDB oracle SQL.
  */
object TextOps {

  /** Per-doc whitespace + BPE-ish token counts. */
  def textTokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        tokenCount(col("text")).as("n_ws_tokens"),
        bpeTokenCount(col("text")).as("n_bpe_tokens"))
      .orderBy("doc_id")

  /** Per-doc quality features + composite score. */
  def textQuality(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        tokenCount(col("text")).as("n_words"),
        punctCount(col("text")).as("n_punct"),
        qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  /** Per-doc heuristic language ID next to the labelled lang. */
  def textLangid(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), langId(col("text")).as("lang_pred"))
      .orderBy("doc_id")

  /** Deterministic content fingerprint of normalized text. */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), fingerprintMd5(col("text")).as("fingerprint"))
      .orderBy("doc_id")

  /** Corpus-wide top-20 bigrams (n-gram mining: explode → count).
    * Bigram extraction is the native single-pass [[graft.functions.BigramsExpr]].
    */
  def textBigrams(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables(spark, dir, "documents")
      .select(explode(expr("graft_bigrams(text)")).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(20)
  }
}
