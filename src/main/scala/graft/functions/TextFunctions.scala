package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Text-analysis kernels for training-data pipelines, built from Spark
  * SQL built-ins so every one stays inside whole-stage codegen.
  * Capability set mandated by the build brief (language-ID, quality
  * scoring, token counting, fingerprinting) on top of the reference's
  * data-prep surface (reference docs/02-lab-optimizations.md:22-76).
  *
  * Each function has an exactly-equivalent ANSI-SQL form used as its
  * DuckDB oracle (see SparkEntry.oracleSql).
  */
object TextFunctions {

  /** Whitespace-delimited token count; 0 for blank/empty strings. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** BPE-ish sub-token count: alpha runs, digit runs, single symbols. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
      .cast("long")

  /** ASCII punctuation character count. */
  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[!-/:-@\\[-`{-~]", ""))).cast("long")

  /** Normalized text: lowercase, trimmed, inner whitespace collapsed. */
  def normText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Deterministic document fingerprint (hex MD5 of normalized text).
    * The 64-bit rolling-hash variant is [[HashExpressions.fingerprint64]].
    */
  def fingerprintMd5(text: Column): Column = md5(normText(text))

  /** Heuristic quality score in [0,1]: rewards word count (saturating
    * at 100 words) and penalizes punctuation density.
    */
  def qualityScore(text: Column): Column = {
    val nc = length(text).cast("double")
    val nw = tokenCount(text).cast("double")
    val np = punctCount(text).cast("double")
    round(
      least(nw / lit(100.0), lit(1.0)) * lit(0.5) +
        (lit(1.0) - np / greatest(nc, lit(1.0))) * lit(0.5),
      4)
  }

  private def markerScore(lowered: Column, words: Seq[String]): Column =
    size(regexp_extract_all(lowered, lit("\\b(" + words.mkString("|") + ")\\b"), lit(0)))

  /** N-gram/stopword-marker language ID over {en,de,es,fr,zh}.
    * Deterministic argmax with fixed tie-break order (zh,en,de,es,fr).
    */
  def langId(text: Column): Column = {
    val lt = lower(text)
    val en = markerScore(lt, Seq("the", "and", "of", "is", "to"))
    val de = markerScore(lt, Seq("der", "die", "das", "und", "ist"))
    val es = markerScore(lt, Seq("el", "los", "las", "es", "y"))
    val fr = markerScore(lt, Seq("le", "les", "et", "est", "une"))
    val zh = size(regexp_extract_all(text, lit("[\\u4e00-\\u9fff]"), lit(0)))
    when(zh > 0 && zh >= en && zh >= de && zh >= es && zh >= fr, lit("zh"))
      .when(en >= de && en >= es && en >= fr, lit("en"))
      .when(de >= es && de >= fr, lit("de"))
      .when(es >= fr, lit("es"))
      .otherwise(lit("fr"))
  }

  /** Distinct lowercase word set (order-insensitive set semantics —
    * only ever consumed by intersect/union cardinalities).
    */
  def wordSet(text: Column): Column =
    array_distinct(split(lower(trim(text)), "\\s+"))

  /** Word-set Jaccard similarity of two texts. */
  def wordJaccard(a: Column, b: Column): Column =
    size(array_intersect(wordSet(a), wordSet(b))).cast("double") /
      size(array_union(wordSet(a), wordSet(b))).cast("double")
}

/** Greedy longest-match ("MaxMatch") segmentation of one word against
  * a trained vocabulary — tokenizer-parity BPE APPLY: real tokenizers
  * segment by longest vocab match at inference, not by replaying the
  * merge history (the two diverge on overlaps: vocab {ab, abc, cd}
  * segments "abcd" as [abc, d] under MaxMatch regardless of merge
  * order). Single characters are implicit vocab — an unseen code
  * point becomes its own token, never an error.
  *
  * The vocab rides the expression as a plan constant (16–50k merged
  * strings — tokenizer-sized, KBs), shipped once per task via a
  * codegen reference object, and the kernel runs over the DISTINCT
  * WORD table (bounded, ≪ corpus), keeping the corpus scan a join on
  * the word key — the same discipline as the merge-replay segmenter.
  */
case class BpeMaxMatch(child: Expression, vocab: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  @transient private lazy val table = new BpeMaxMatch.Table(vocab)
  override def nullSafeEval(v: Any): Any =
    BpeMaxMatch.kernel(v.asInstanceOf[UTF8String], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeVocab", table,
      classOf[BpeMaxMatch.Table].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeMaxMatch.kernel($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): BpeMaxMatch =
    copy(child = c)
}

object BpeMaxMatch {
  /** Shared lookup state: the vocab set plus its longest entry, so the
    * scan window never exceeds what could match. */
  final class Table(vocab: Seq[String]) extends Serializable {
    val set = new java.util.HashSet[String]()
    vocab.foreach(set.add)
    val maxLen: Int = if (vocab.isEmpty) 1 else vocab.map(_.length).max
  }

  def kernel(w: UTF8String, t: Table): ArrayData = {
    val s = w.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    while (i < s.length) {
      var len = math.min(t.maxLen, s.length - i)
      var matched = 0
      while (len >= 2 && matched == 0) {
        if (t.set.contains(s.substring(i, i + len))) matched = len
        len -= 1
      }
      // single-character fallback covers the whole code point: a
      // surrogate pair must never split into two lone tokens
      if (matched == 0) matched = Character.charCount(s.codePointAt(i))
      out += UTF8String.fromString(s.substring(i, i + matched))
      i += matched
    }
    new GenericArrayData(out.toArray[Any])
  }
}
