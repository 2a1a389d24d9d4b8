package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Confusion matrix over the language-ID heuristic: per (labelled,
    * predicted) pair counts — the eval loop a langid quality gate
    * needs before trusting its routing. One re-aggregate of the
    * prediction chain; ≤ |langs|² output rows.
    */
  def textLangidEval(spark: SparkSession, dir: String): DataFrame =
    textLangid(spark, dir)
      .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
      .orderBy("lang", "lang_pred")

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

  /** PII-pattern scrubbing: count and redact email addresses and URLs
    * per document — the cleanup step a training-data pipeline runs
    * before tokenization. Patterns kept to the Java∩RE2 regex subset
    * so the DuckDB oracle evaluates them identically; the redacted
    * text is fingerprinted (md5) so the oracle can verify the full
    * scrub output without hauling long strings through the compare.
    */
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val UrlRe = "https?://[^ \\t\\n]+"

  def textPiiScrub(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), t => t.rlike(EmailRe)))
          .cast("long").as("n_email_tokens"),
        size(filter(split(col("text"), " "), t => t.rlike(UrlRe)))
          .cast("long").as("n_url_tokens"),
        md5(regexp_replace(regexp_replace(col("text"), EmailRe, "<EMAIL>"),
          UrlRe, "<URL>").cast("binary")).as("scrubbed_md5"))
      .orderBy("doc_id")

  /** Intra-document repetition (Gopher/C4-style quality rule): the
    * fraction of a document's word trigrams that duplicate an earlier
    * trigram in the same document. Boilerplate-heavy and
    * machine-generated pages score high and get filtered before
    * training. Trigram extraction is the native single-pass
    * [[graft.functions.NgramsExpr]] kernel.
    */
  def textRepetition(spark: SparkSession, dir: String): DataFrame = {
    val g3 = graft.lake.GraftExpr.column(
      graft.functions.NgramsExpr(graft.lake.GraftExpr.expression(col("text")), 3))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), g3.as("g3"))
      .select(col("doc_id"),
        size(col("g3")).cast("long").as("n_trigrams"),
        size(array_distinct(col("g3"))).cast("long").as("n_distinct"))
      .withColumn("dup_frac",
        when(col("n_trigrams") === 0, lit(0.0))
          .otherwise(round(
            (col("n_trigrams") - col("n_distinct")).cast("double") /
              col("n_trigrams").cast("double"), 4)))
      .orderBy("doc_id")
  }

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

  /** Gopher-style document quality gate (Rae et al. 2021 §A1.1, the
    * rule set most large-corpus pipelines start from): word-count
    * window, mean word length window, symbol-to-word ratio ('#' and
    * '…'/'...'), alphabetic-word fraction, minimum stopword hits.
    * Emits the per-rule features plus the composite keep flag so a
    * pipeline can tune thresholds without recomputing; all arithmetic
    * is integer-derived, replicated exactly by the DuckDB oracle.
    */
  /** The five Gopher sub-conditions, each over the metric columns of
    * [[gopherMetrics]] — ONE definition serves the keep conjunction,
    * the filter query, and P22's ablation matrix, so the gates can
    * never drift apart.
    */
  private[operators] val GopherConditions: Seq[(String, Column)] = Seq(
    "words" -> (col("n_words") >= 50 && col("n_words") <= 100000),
    "wordlen" -> (col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0),
    "symbols" -> (col("n_symbols") * 10 < col("n_words")),
    "alpha" -> (col("n_alpha_words") * 10 > col("n_words") * 8),
    "stopwords" -> (col("n_stopwords") >= 2))

  /** Per-doc Gopher quality metrics + the keep conjunction (shared by
    * T-family filtering and P22's ablation matrix).
    */
  private[operators] def gopherMetrics(spark: SparkSession,
      dir: String): DataFrame = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val words = when(length(trim(col("text"))) === 0,
        array().cast("array<string>"))
      .otherwise(split(trim(col("text")), "\\s+"))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), words.as("w"))
      .select(
        col("doc_id"),
        size(col("w")).cast("long").as("n_words"),
        length(regexp_replace(trim(col("text")), "\\s+", ""))
          .cast("long").as("n_word_chars"),
        ((length(col("text")) - length(regexp_replace(col("text"), "#", ""))) +
          (length(col("text")) - length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3)
          .cast("long").as("n_symbols"),
        size(filter(col("w"), w => w.rlike("[A-Za-z]")))
          .cast("long").as("n_alpha_words"),
        size(filter(col("w"), w => lower(w).isInCollection(stops)))
          .cast("long").as("n_stopwords"))
      .withColumn("mean_word_len",
        when(col("n_words") === 0, lit(0.0))
          .otherwise(round(col("n_word_chars").cast("double") /
            col("n_words").cast("double"), 4)))
      .withColumn("keep", GopherConditions.map(_._2).reduce(_ && _))
  }

  def textGopherFilter(spark: SparkSession, dir: String): DataFrame =
    gopherMetrics(spark, dir)
      .select("doc_id", "n_words", "mean_word_len", "n_symbols",
        "n_alpha_words", "n_stopwords", "keep")
      .orderBy("doc_id")

  /** Token fertility by language (T27 — the tokenizer-efficiency
    * report multilingual curation reads: how many subword-ish tokens
    * the tokenizer spends per whitespace word, per language; high
    * fertility flags languages the vocabulary underserves). One
    * map-side-combined aggregate over the two codegen'd counting
    * kernels, ≤|langs| rows out, ppm ratio in exact integer division.
    */
  def textFertility(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("lang"), tokenCount(col("text")).as("ws"),
        bpeTokenCount(col("text")).as("bpe"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("ws").as("n_words"), sum("bpe").as("n_tokens"))
      .withColumn("fertility_ppm",
        expr("n_tokens * 1000000L DIV n_words"))
      .orderBy("lang")

  /** Character-level Shannon entropy per document — a compressibility
    * quality signal (low-entropy docs are boilerplate/repetition,
    * Gopher-style filters cut on it). The histogram and the Σ −p·ln p
    * fold run inside the native single-pass
    * [[graft.functions.CharEntropy]] kernel (ascending code-point
    * fold order, so the double is bit-identical to the DuckDB
    * oracle's `list(cnt ORDER BY ch)` fold) — no explode, no
    * per-character shuffle rows. Empty documents are filtered, not
    * scored 0: the oracle's `WHERE ch <> ''` drops them the same way.
    */
  def textEntropy(spark: SparkSession, dir: String): DataFrame = {
    val ent = graft.lake.GraftExpr.column(
      graft.functions.CharEntropy(graft.lake.GraftExpr.expression(col("text"))))
    Tables(spark, dir, "documents")
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), round(ent, 4).as("entropy_nats"))
      .orderBy("doc_id")
  }

  /** Corpus vocabulary: every distinct word with its collection
    * frequency, document frequency, and frequency rank — the input to
    * tokenizer/vocab training and OOV-coverage audits. The word
    * explode is the legitimate shape here (unlike per-character): the
    * hash aggregate collapses each partition to its DISTINCT words
    * before the shuffle, so the exchanged rows are O(vocab ×
    * partitions), not O(corpus tokens); doc frequency rides the same
    * aggregate as a count of per-doc firsts rather than a second
    * count(distinct) pass over the pairs.
    */
  def textVocab(spark: SparkSession, dir: String): DataFrame = {
    val agg = Tables(spark, dir, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("freq"), countDistinct("doc_id").as("doc_freq"))
    // Two-phase global rank, NOT a Window.orderBy over the whole vocab:
    // a global window funnels every row through ONE reducer, and on a
    // web corpus "distinct whitespace tokens" (URLs, hashes, garbage)
    // run 10⁸–10⁹ rows — far past a single task. (freq desc, word) is
    // a total order, so ranks are deterministic ([[Ranks]]).
    Ranks.withGlobalOrdinal(
      agg.select(col("word"), col("freq"), col("doc_freq")),
      "rank", col("freq").desc, col("word"))
      .orderBy("rank")
  }

  /** Word-rarity quality score (the CCNet/perplexity-filter shape with
    * an exact-arithmetic proxy): each document's words join the corpus
    * vocabulary and the doc is scored by the SUM and MEAN of its
    * words' frequency ranks — common-word documents score low,
    * rare/garbage-word documents high, and a pipeline thresholds the
    * tails. Rank sums are exact integers so the score can never
    * diverge between engines; the vocab is broadcast (a few MB even
    * web-scale — top-k it if larger) so the corpus side streams with
    * no shuffle before the per-doc aggregate.
    */
  /** Corpus-bigram-LM surprisal scoring (the CCNet/KenLM perplexity-
    * filter shape): a bigram language model trains on the corpus
    * itself — history counts c1(w₁) and bigram counts c12(w₁,w₂) — and
    * each document is scored by its mean per-bigram surprisal. The
    * surprisal is the INTEGER floor-log2 approximation
    * `⌊log₂(c1+V)⌋ − ⌊log₂ c12⌋` of the add-smoothed bits
    * `log₂((c1+V)/c12)` (within 1 bit per term, monotone in the
    * probability): computed as a binary-string length difference, it
    * is exact integer arithmetic end-to-end, so per-doc sums are
    * associative in any aggregation order and the DuckDB oracle
    * replays the whole model bit-for-bit — the property a float
    * `ln()` chain can never have.
    *
    * Scale shape: bigram extraction is an array `zip_with` (no
    * positional self-join), counts aggregate map-side before the
    * (w₁,w₂)-key shuffle, the scoring join reuses the SAME (w₁,w₂)
    * partitioning as the count aggregate (one exchange), the
    * vocab-sized history table broadcasts, and the 1-row V constant
    * cross-joins. Nothing driver-side scales with the corpus.
    */
  /** TF-IDF distinctive-term extraction: each document's top-3 terms
    * by `tf · idf` where idf is the INTEGER floor-log2 approximation
    * `⌊log₂ N⌋ − ⌊log₂ df⌋` (binary-string length difference — the
    * same exact-arithmetic trick as [[textPerplexity]], so scores can
    * never diverge between engines). The keyword/topic-extraction
    * primitive of a corpus QA pipeline.
    *
    * Scale shape: ONE tokenize pass feeds both aggregates — document
    * frequency is a re-aggregate of the (doc, word) TF table, reusing
    * its shuffle output — the vocab-sized DF table broadcasts, the
    * 1-row N constant cross-joins, and the top-3 window partitions by
    * doc (per-doc distinct terms, never corpus-scale per reducer).
    */
  def textTfidf(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables(spark, dir, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("word"))
    val tf = tok.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val nDocs = tok.agg(countDistinct("doc_id").as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("word"))
    // NO broadcast hint on dfreq: it is corpus-DERIVED (one row per
    // distinct token — 10⁸⁺ on a web corpus), and a forced hint
    // overrides Spark's size check, OOMing every executor at scale.
    // Unhinted, AQE broadcasts it while it is actually small and
    // sort-merges on the word key once it isn't. The 1-row N aggregate
    // stays pinned — constant-bounded sides are the safe hint class.
    tf.join(dfreq, "word")
      .crossJoin(broadcast(nDocs))
      .withColumn("idf_bits",
        (length(bin(col("n_docs"))) - length(bin(col("df")))).cast("long"))
      .withColumn("score", col("tf") * col("idf_bits"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("doc_id", "rn", "word", "tf", "df", "score")
      .orderBy("doc_id", "rn")
  }

  def textPerplexity(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
      .filter(size(col("t")) >= 2)
    val bi = toks.select(col("doc_id"),
        explode(zip_with(
          slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1"), col("bg.w2"))
    val c12 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
    val v = c1.agg(count(lit(1)).as("v"))
    // Fold the history counts into the bigram table FIRST: c12 ⋈ c1 is
    // a model-scale join (bigram-types × vocab rows), so the corpus
    // side then needs only ONE scoring join on its existing (w1,w2)
    // key. No broadcast hint on either corpus-derived table — a forced
    // hint on a 10⁸⁺-row web vocab overrides Spark's size check and
    // OOMs executors; unhinted, AQE broadcasts while genuinely small.
    // Only the 1-row V constant stays pinned.
    val model = c12.join(c1, Seq("w1"))
    bi.join(model, Seq("w1", "w2"))
      .crossJoin(broadcast(v))
      .withColumn("bits", (length(bin(col("c1") + col("v"))) -
        length(bin(col("c12")))).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("bits").as("bits_sum"))
      .withColumn("bits_per_bigram",
        round(col("bits_sum").cast("double") / col("n_bigrams").cast("double"), 4))
      .select("doc_id", "n_bigrams", "bits_sum", "bits_per_bigram")
      .orderBy("doc_id")
  }

  /** T28: collocation lift report — the corpus-level phrase-discovery
    * pass (tokenizer vocab seeding, stopword-phrase curation, index
    * phrase candidates) as a RANKED report rather than a fixed cut:
    * the top-100 supported bigrams (c12 ≥ 5) by observed-over-expected
    * lift, where lift_ppm = ⌊c12·N·10⁶ / (c1·c2)⌋ with c1/c2/N the
    * marginals of the bigram-event space (T12's self-consistent
    * derivation). The products run in DECIMAL(38,0) and the floor
    * division is integer DIV — no log, no float — so the ppm
    * hash-matches any engine and never overflows before 10³⁸ (a
    * 100 TB corpus's c12·N·10⁶ tops out near 10³⁰). Ranking (not a
    * threshold) is the D15-style shape: the report is what DECIDES the
    * cut a rollout then applies.
    *
    * Scale shape: bigram/marginal tables are model-sized
    * (bigram-types / vocab rows), built by map-side-combinable
    * aggregates; the marginal joins re-use the (w1, w2) keys. No
    * broadcast hint on corpus-derived sides (10⁸⁺ vocab on web data —
    * AQE broadcasts only while genuinely small); only the 1-row N
    * total stays pinned. The report is a top-100 TakeOrdered (never a
    * global sort), and the rank column is a window over that
    * limit()-bounded frame — the sanctioned bounded-window class.
    */
  def textCollocations(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(split(trim(col("text")), "\\s+").as("t"))
      .filter(size(col("t")) >= 2)
    val bi = toks.select(
        explode(zip_with(
          slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1"), col("bg.w2"))
    val c12 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
    val c2 = c12.groupBy("w2").agg(sum("c12").as("c2"))
    val n = c12.agg(sum("c12").as("n"))
    val top = c12.filter(col("c12") >= 5)
      .join(c1, "w1").join(c2, "w2")
      .crossJoin(broadcast(n)) // 1-row N total: constant pin
      .withColumn("lift_ppm", expr(
        "CAST((CAST(c12 AS DECIMAL(38,0)) * n * 1000000) DIV " +
          "(CAST(c1 AS DECIMAL(38,0)) * c2) AS BIGINT)"))
      .select("w1", "w2", "c12", "c1", "c2", "lift_ppm")
      .orderBy(col("lift_ppm").desc, col("w1"), col("w2"))
      .limit(100)
    // rank over the ≤100-row limited frame (bounded window)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("lift_ppm").desc, col("w1"), col("w2"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select("rank", "w1", "w2", "c12", "c1", "c2", "lift_ppm")
      .orderBy("rank")
  }

  def textRarity(spark: SparkSession, dir: String): DataFrame = {
    val vocab = textVocab(spark, dir).select("word", "rank")
    // Pre-aggregate tokens to per-doc term frequencies so the scoring
    // join ships per-doc DISTINCT words, not raw corpus tokens; then
    // rank_sum = Σ rank·tf reconstructs the per-token sum exactly.
    // NO broadcast hint on the vocab — corpus-derived (10⁸⁺ distinct
    // tokens on web data); unhinted, AQE broadcasts it only while
    // Spark's size check says it fits, else sort-merge on `word`.
    Tables(spark, dir, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      .join(vocab, Seq("word"))
      .groupBy("doc_id")
      .agg(sum("tf").as("n_words"), sum(col("rank") * col("tf")).as("rank_sum"))
      .withColumn("mean_rank",
        round(col("rank_sum").cast("double") / col("n_words").cast("double"), 4))
      .select("doc_id", "n_words", "rank_sum", "mean_rank")
      .orderBy("doc_id")
  }

  /** MOSS winnowing fingerprints per document
    * ([[graft.functions.WinnowFingerprints]]): the position-robust
    * local fingerprint set that guarantees detection of any shared
    * substring of ≥ K+W−1 chars at ~2/(W+1) the density of full
    * k-gram hashing. Emitted as (count, md5-of-set) so the compare
    * never ships long arrays; one codegen'd pass per row, no explode,
    * no shuffle beyond the final sort.
    */
  /** Distributed BPE merge training (the tokenizer-induction step of
    * an LLM data pipeline): learn the first `rounds` byte-pair merges
    * from the corpus, greedy highest-count-first with a deterministic
    * (count desc, pair asc) tie-break.
    *
    * Scale shape — the classic one: the corpus is scanned ONCE into a
    * distinct-word frequency table (the shuffle is vocab-sized, and
    * every later round runs over THAT table, never the corpus).
    * Symbol sequences live as space-joined strings, so each round is
    * (a) adjacent-pair counting via the existing codegen'd
    * `graft_bigrams` kernel + a map-side-combined sum, (b) a 1-row
    * `limit(1)` top-pair collect (the only driver traffic: one pair
    * per round), and (c) one compiled boundary-anchored
    * `regexp_replace` applying the merge greedy-left-to-right —
    * `(?<=^| )a b(?=$| )` keeps matching after a zero-gap so
    * `b b b b` merges to `bb bb`, exactly reference BPE. Eager
    * localCheckpoint per round caps lineage like the CC loop.
    */
  private[operators] def bpeMerges(words: DataFrame, rounds: Int)
      : Seq[(Long, String, String, Long)] = {
    graft.functions.GraftFunctions.register(words.sparkSession)
    var syms = words
      .select(regexp_replace(col("word"), "(?<=.)(?=.)", " ").as("syms"),
        col("cnt"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      val top = syms
        .select(explode(expr("graft_bigrams(syms)")).as("pair"), col("cnt"))
        .groupBy("pair").agg(sum("cnt").as("pc"))
        .orderBy(col("pc").desc, col("pair"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val Array(a, b) = top(0).getString(0).split(" ", 2)
        merges += ((r + 1L, a, b, top(0).getLong(1)))
        val pat = "(?<=^| )" + java.util.regex.Pattern.quote(a) + " " +
          java.util.regex.Pattern.quote(b) + "(?=$| )"
        syms = syms
          .select(regexp_replace(col("syms"), lit(pat), lit(a + b)).as("syms"),
            col("cnt"))
          .localCheckpoint(true)
        r += 1
      }
    }
    merges.result()
  }

  /** BPE trainer over the `documents` corpus: the first 16 merges as
    * (rank, left, right, merged, pair_count). Iterative (each round
    * depends on the last merge), so correctness is spec-anchored to
    * an in-test reference implementation rather than a SQL oracle.
    */
  /** Context-window chunking with overlap — the "fit documents into a
    * model's sequence length" primitive every pretraining/RAG pipeline
    * runs before packing: each document splits into 64-token windows
    * starting every 48 tokens (16-token overlap), the tail window
    * truncated, empty docs dropped.
    *
    * Scale shape: a pure per-row explode — chunk starts come from
    * `sequence(0, n-1, step)` over the doc's own token count, no
    * shuffle, no state; output rows ≈ corpus tokens ÷ step, each
    * carrying its slice. Codegen'd end to end.
    */
  def textChunk(spark: SparkSession, dir: String): DataFrame = {
    val win = 64L
    val step = 48L
    Tables(spark, dir, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(0L), col("n") - 1, lit(step))).as("start"))
      .select(col("doc_id"),
        (col("start") / step).cast("long").as("chunk_seq"),
        least(lit(win), col("n") - col("start")).as("n_tokens"),
        concat_ws(" ", slice(col("toks"),
          (col("start") + 1).cast("int"), lit(win.toInt))).as("chunk_text"))
      .orderBy("doc_id", "chunk_seq")
  }

  def textBpeTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val words = Tables(spark, dir, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    bpeMerges(words, 16)
      .toDF("rank", "left", "right", "pair_count")
      .select(col("rank"), col("left"), col("right"),
        concat(col("left"), col("right")).as("merged"), col("pair_count"))
      .orderBy("rank")
  }

  /** Apply trained BPE merges: segment the corpus under a merge list
    * and report per-doc token counts (the "how long is my corpus in
    * MY tokenizer" question every data budget starts with).
    *
    * Scale shape: merges apply to the DISTINCT-WORD table, not the
    * corpus — with no pair counting between rounds the whole merge
    * list composes into ONE projection (16 compiled regexp_replaces,
    * single pass over the vocab), and documents join the word→token
    * count map on the word key. The corpus is scanned once to
    * tokenize and once to join; merge depth never re-scans it.
    */
  private[operators] def bpeSegmentCounts(words: DataFrame,
      merges: Seq[(Long, String, String, Long)]): DataFrame = {
    val syms = merges.foldLeft(
        regexp_replace(col("word"), "(?<=.)(?=.)", " ")) {
      case (acc, (_, a, b, _)) =>
        regexp_replace(acc, lit("(?<=^| )" +
          java.util.regex.Pattern.quote(a) + " " +
          java.util.regex.Pattern.quote(b) + "(?=$| )"), lit(a + b))
    }
    words.select(col("word"), size(split(syms, " ")).cast("long").as("n_tok"))
  }

  /** Tokenizer-parity BPE apply (T16b): segment by greedy LONGEST
    * MATCH over the trained vocab ([[graft.functions.BpeMaxMatch]]),
    * the way real tokenizers segment at inference, instead of
    * replaying the merge history. Same distinct-word-table
    * discipline: the kernel runs over the bounded vocab-sized word
    * table, the corpus joins on the word key — corpus scanned twice
    * total regardless of vocab size.
    */
  def textBpeVocabSegment(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
    val words = docs.groupBy("word").agg(count(lit(1)).as("cnt"))
    val vocab = bpeMerges(words, 16).map { case (_, a, b, _) => a + b }
    val counts = words.select(col("word"),
      size(graft.lake.GraftExpr.column(graft.functions.BpeMaxMatch(
        graft.lake.GraftExpr.expression(col("word")), vocab)))
        .cast("long").as("n_tok"))
    docs.join(counts, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_tok").as("n_tokens"))
      .orderBy("doc_id")
  }

  def textBpeSegment(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
    val words = docs.groupBy("word").agg(count(lit(1)).as("cnt"))
    val merges = bpeMerges(words, 16)
    docs.join(bpeSegmentCounts(words.select("word"), merges), "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_tok").as("n_tokens"))
      .orderBy("doc_id")
  }

  /** Keyword search over the L84 OPTIMIZE-materialized inverted
    * index: AND-match documents containing every query term, ranked
    * input by total term frequency. The query touches ONLY the
    * postings sidecar — term-clustered parquet whose footer min/max
    * prune non-matching files — never the document text; repeat
    * searches on a 100 TB corpus read a few term ranges.
    */
  private def textIndexFixture(spark: SparkSession,
      dir: String): graft.lake.GraftTable = {
    val docs = Tables(spark, dir, "documents")
    Similarity.indexFixture(spark, dir, "tpidx",
      "graft.text.index" -> "doc_id,text", docs.count())(docs)
  }

  def textSearch(spark: SparkSession, dir: String): DataFrame = {
    val terms = Seq("merge", "vector")
    textIndexFixture(spark, dir).textPostings("text")
      .filter(col("term").isin(terms: _*))
      .groupBy("id")
      .agg(countDistinct("term").as("n_terms"), sum("tf").as("hits"))
      .filter(col("n_terms") === terms.length)
      .select(col("id").as("doc_id"), col("hits"))
      .orderBy("doc_id")
  }

  /** Ranked (OR-semantics) keyword retrieval over the index: docs
    * matching ANY query term scored by Σ tf·idf, idf the exact-integer
    * floor-log2 `⌊log₂N⌋−⌊log₂df⌋` (T12/T13's engine-portable trick).
    * Everything derives from the postings sidecar — df is a re-count
    * of the already-filtered term rows, N folds from log stats — so
    * ranking adds no corpus access to the T17 read.
    */
  def textSearchRanked(spark: SparkSession, dir: String): DataFrame =
    rankedScores(spark, dir, Seq("merge", "vector", "customer"), minId = 0L)
      .select(col("id").as("doc_id"), col("n_terms"), col("score"))
      .orderBy("doc_id")

  /** BM25 ranked retrieval over the L84 postings (T25 — the T19
    * upgrade every production keyword/hybrid stack expects, and the
    * drop-in sparse leg for S18's RRF fusion): tf SATURATION
    * (k1 = 1.2) and DOC-LENGTH NORMALIZATION (b = 0.75) on a
    * ppm-precision idf, every step an exact integer op (the T13/P14
    * engine-portable discipline — no float log, no double sum, no
    * rounding anywhere, Spark and DuckDB produce bit-identical longs):
    *
    *   r        = N·2²⁰ DIV df                  (scaled ratio, ≥ 2²⁰)
    *   idf_ppm  = (bitlen(r)−21)·10⁶ + (r − 2^(bitlen(r)−1))·10⁶
    *                DIV 2^(bitlen(r)−1)
    *   bm25     = idf_ppm · 22·tf·T  DIV  (10·tf·T + 3·T + 9·dl·N)
    *
    * idf_ppm is log₂(N/df)·10⁶ via bit length + linear mantissa
    * interpolation (max error 0.086 bits — monotone and deterministic,
    * unlike a transcendental ln whose last ulp differs across
    * engines); T19's coarse ⌊log₂N⌋−⌊log₂df⌋ zeroes out whenever N
    * and df share a bit length, which kills ranking on natural
    * vocabularies where query terms hit most documents. The k1/b
    * constants are scaled ×10 into integers (22 = 10·(k1+1),
    * 10·k1·(1−b) = 3, 10·k1·b = 9) and BM25's avgdl = T/N division is
    * cleared by multiplying through by T = Σdl. The saturation step
    * runs in DECIMAL(38,0) — a 100 TB corpus's T ≈ 10¹³ would
    * overflow idf_ppm·22·tf·T in a long — while each per-term
    * quotient is ≤ idf_ppm·2.2, so the summed score stays a long.
    *
    * Doc lengths come from the SAME postings sidecar (dl = Σtf per
    * doc — exactly the whitespace token count): the query never
    * touches corpus text. The lengths rollup is one map-side
    * combinable aggregate and its join back to the term-pruned hits
    * is id-keyed — at 100 TB the expensive input stays the few
    * term-clustered postings ranges, same as T17/T19.
    */
  def textSearchBm25(spark: SparkSession, dir: String): DataFrame =
    bm25Scores(spark, dir, Bm25Terms, minId = 0L)
      .select(col("id").as("doc_id"), col("n_terms"), col("bm25_micro"))
      .orderBy("doc_id")

  /** Query terms for [[textSearchBm25]] and [[Similarity.simHybridBm25]]
    * — ONE definition so the two queries (and their oracle SQL, which
    * must splice the same literals) cannot drift. "dup" is the one
    * genuinely rare term in the synthetic vocabulary, so the idf term
    * carries real weight next to the near-ubiquitous other two.
    */
  private[operators] val Bm25Terms = Seq("dup", "merge", "vector")

  /** The BM25 scoring chain with a candidate-id floor (the hybrid
    * fusion's sparse-leg contract, like [[rankedScores]] for T19):
    * corpus statistics — doc lengths, N, T — always come from the FULL
    * postings (length norms are corpus-level facts), only the
    * candidate hits are floored.
    */
  private[operators] def bm25Scores(spark: SparkSession, dir: String,
      terms: Seq[String], minId: Long): DataFrame = {
    val posts = textIndexFixture(spark, dir).textPostings("text")
    val lens = posts.groupBy("id").agg(sum("tf").as("dl"))
    // corpus constants (N docs with ≥1 token, T total tokens): one
    // 1-row aggregate collected on the driver — bounded metadata, the
    // same class as the fixture's own count
    val c = lens.agg(count(lit(1)).as("n"), sum("dl").as("t")).head()
    val (nDocs, totDl) = (c.getLong(0), c.getLong(1))
    val hits = posts.filter(col("term").isin(terms: _*) && col("id") >= minId)
    val dfq = hits.groupBy("term").agg(countDistinct("id").as("df"))
    hits.join(dfq, "term").join(lens, "id")
      .withColumn("r", expr(s"${nDocs}L * 1048576 DIV df"))
      .withColumn("idf_ppm", expr(
        // mantissa interpolation in DECIMAL(38,0): r ≈ N·2^20 on a
        // rare term (df≈1), so (r − 2^(L−1))·10^6 in BIGINT overflows
        // past N ≈ 2×10^7 docs — the same reason the saturation step
        // below runs in DECIMAL. Spark's DIV takes DECIMAL operands
        // and returns LONG, so idf_ppm stays BIGINT out.
        "CAST(length(bin(r)) - 21 AS BIGINT) * 1000000 + " +
          "CAST(r - shiftleft(1L, length(bin(r)) - 1) AS DECIMAL(38,0)) " +
          "* 1000000 DIV shiftleft(1L, length(bin(r)) - 1)"))
      .withColumn("bm25_micro", expr(
        s"CAST(idf_ppm AS DECIMAL(38,0)) * 22 * tf * ${totDl}L DIV " +
          s"(CAST(10 AS DECIMAL(38,0)) * tf * ${totDl}L + 3 * ${totDl}L + " +
          s"9 * dl * ${nDocs}L)"))
      .groupBy("id")
      .agg(countDistinct("term").as("n_terms"),
        sum("bm25_micro").as("bm25_micro"))
  }

  /** Proximity search over the positional postings (T26 — the signal
    * between T18's exact-adjacency phrase and T25's bag-of-words BM25:
    * documents where the query terms appear NEAR each other rank above
    * bag-of-words co-occurrence, the classic proximity heuristic):
    * per matching doc, the minimal token distance between the two
    * terms' occurrences and the count of occurrence pairs within a
    * 5-token window. The pairwise distance expansion runs INSIDE the
    * row over the per-doc position arrays (higher-order transform /
    * filter — |pa|·|pb| per doc, tf-product-bounded, no join blowup),
    * and the doc-level join is the same id-keyed term-pruned postings
    * read as T18 — no corpus text, exact integers everywhere.
    */
  def textSearchProximity(spark: SparkSession, dir: String): DataFrame = {
    val (ta, tb) = ("merge", "vector")
    val posts = textIndexFixture(spark, dir).textPostings("text")
    val pa = posts.filter(col("term") === ta)
      .select(col("id"), col("positions").as("pa"))
    val pb = posts.filter(col("term") === tb)
      .select(col("id"), col("positions").as("pb"))
    pa.join(pb, "id")
      .withColumn("dists",
        expr("flatten(transform(pa, x -> transform(pb, y -> abs(x - y))))"))
      .select(col("id").as("doc_id"),
        expr("array_min(dists)").cast("long").as("min_dist"),
        expr("size(filter(dists, d -> d <= 5))").cast("long").as("n_close"))
      .orderBy("doc_id")
  }

  /** Type-token ratio per document (T23 — the classic lexical-
    * diversity signal quality stacks report beside the Gopher rules;
    * low TTR flags template/spam text that repeats a small
    * vocabulary): distinct words / total words over the whitespace
    * tokenization, exact integers with the ratio rounded only at the
    * edge. Distinctness comes from a per-(doc, word) pre-aggregate
    * (map-side combined), never a countDistinct buffer; the rollup is
    * doc-keyed — nothing global anywhere.
    */
  /** Zipf's-law fit over the corpus vocabulary (T24, `text_zipf`):
    * least-squares slope/intercept of bit-length(freq) against
    * bit-length(rank) — Zipf predicts lb(freq) ≈ c − s·lb(rank), and
    * a healthy natural-language corpus sits near s ≈ 1; template or
    * machine-generated text bends the curve, making the slope a
    * corpus-level quality signal next to the per-doc Gopher rules.
    *
    * Exact arithmetic: lb is the integer bit length (`length(bin(n))`
    * — the T13/P14 floor-log2 idiom, no float log anywhere), all five
    * regression sums are exact integers, and the normal-equation
    * products run in DECIMAL(38,0) (vocab-count × Σxy overflows a
    * long at the 100 TB design point). The vocabulary rank is the
    * two-phase global ordinal, never a partition-less window; doubles
    * appear only in the two final divisions.
    */
  def textZipf(spark: SparkSession, dir: String): DataFrame = {
    val vocab = Tables(spark, dir, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(explode(split(trim(col("text")), "\\s+")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val fit = Ranks.withGlobalOrdinal(vocab, "rank",
        col("freq").desc, col("word"))
      .select(length(bin(col("rank"))).cast("long").as("x"),
        length(bin(col("freq"))).cast("long").as("y"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("v"),
        sum("x").cast("decimal(38,0)").as("sx"),
        sum("y").cast("decimal(38,0)").as("sy"),
        sum(col("x") * col("x")).cast("decimal(38,0)").as("sxx"),
        sum(col("x") * col("y")).cast("decimal(38,0)").as("sxy"))
    fit
      .withColumn("slope_raw",
        (col("v") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("v") * col("sxx") - col("sx") * col("sx")).cast("double"))
      .select(col("v").cast("long").as("vocab_size"),
        round(col("slope_raw"), 6).as("slope"),
        round((col("sy").cast("double") -
            col("slope_raw") * col("sx").cast("double")) /
          col("v").cast("double"), 6).as("intercept"))
  }

  def textTtr(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_types"), sum("tf").as("n_tokens"))
      .withColumn("ttr",
        round(col("n_types").cast("double") / col("n_tokens"), 6))
      .orderBy("doc_id")

  /** The T19 scoring chain with a candidate-id floor, shared with the
    * hybrid-retrieval fusion ([[Similarity.simHybridRrf]]'s text leg):
    * postings-only, df re-counted over the already-filtered term rows.
    */
  private[operators] def rankedScores(spark: SparkSession, dir: String,
      terms: Seq[String], minId: Long): DataFrame = {
    val posts = textIndexFixture(spark, dir).textPostings("text")
      .filter(col("term").isin(terms: _*) && col("id") >= minId)
    val dfq = posts.groupBy("term").agg(countDistinct("id").as("df"))
    val nDocs = lit(Tables(spark, dir, "documents").count())
    posts.join(dfq, "term")
      .withColumn("idf_bits",
        (length(bin(nDocs)) - length(bin(col("df")))).cast("long"))
      .groupBy("id")
      .agg(countDistinct("term").as("n_terms"),
        sum(col("tf") * col("idf_bits")).as("score"))
  }

  /** Phrase search over the positional postings: documents where the
    * query terms appear ADJACENT in order, with the occurrence count
    * — `positions` makes a two-term phrase an array-intersection of
    * (first term's positions + 1) with the second term's, no document
    * text and no token re-derivation anywhere. Same file-pruned
    * term-clustered read as [[textSearch]].
    */
  /** N-term phrase matcher over positional postings: surviving START
    * positions fold left — term i's positions shift back by i and
    * intersect with the accumulated starts — so an n-term phrase is
    * n−1 id-keyed joins over tiny per-doc position arrays, never a
    * token re-derivation or text scan.
    */
  private def phraseMatches(posts: DataFrame, terms: Seq[String]): DataFrame = {
    val start = posts.filter(col("term") === terms.head)
      .select(col("id"), col("positions").as("pa"))
    terms.zipWithIndex.drop(1).foldLeft(start) { case (acc, (t, i)) =>
      acc.join(posts.filter(col("term") === t)
          .select(col("id"), col("positions").as("pn")), "id")
        .select(col("id"),
          array_intersect(col("pa"),
            transform(col("pn"), p => p - i)).as("pa"))
    }.select(col("id").as("doc_id"),
        size(col("pa")).cast("long").as("n_adj"))
      .filter(col("n_adj") > 0)
      .orderBy("doc_id")
  }

  def textPhraseSearch(spark: SparkSession, dir: String): DataFrame =
    phraseMatches(textIndexFixture(spark, dir).textPostings("text"),
      Seq("merge", "vector"))

  /** Three-term phrase over the same machinery — the n>2 case is the
    * same fold, one more join.
    */
  def textPhrase3Search(spark: SparkSession, dir: String): DataFrame =
    phraseMatches(textIndexFixture(spark, dir).textPostings("text"),
      Seq("slow", "hash", "batch"))

  def textWinnow(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.WinnowFingerprints
    import org.apache.spark.sql.GraftSqlShims
    val tx = lower(trim(col("text")))
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        greatest(length(tx) - lit(WinnowFingerprints.K - 1), lit(0))
          .cast("long").as("n_grams"),
        GraftSqlShims.column(WinnowFingerprints(
          GraftSqlShims.expression(tx))).as("fps"))
      .select(col("doc_id"), col("n_grams"),
        size(col("fps")).cast("long").as("n_fp"),
        md5(concat_ws(",", col("fps"))).as("fp_md5"))
      .orderBy("doc_id")
  }
}
