package graft.operators

import graft.Tables
import graft.functions.TextFunctions.wordSet
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators a training-data pipeline runs after
  * cleaning/dedup (SURVEY §2.6+): quota sampling per stratum, weighted
  * source mixing, and eval-set decontamination. All deterministic and
  * DuckDB-oracle-checked.
  *
  * Scale: every operator is one hash-partitioned window or equi-join —
  * quotas rank within strata (shuffle on the stratum key only), and
  * decontamination broadcasts the (small) benchmark n-gram set against
  * the streaming corpus scan.
  */
object Pipeline {

  /** Stratified quota sample: up to `quota` docs per language, chosen
    * deterministically (lowest doc_id first — substitute a salted hash
    * rank for a uniform draw).
    */
  def pipeStratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val quota = 50
    val w = Window.partitionBy("lang").orderBy("doc_id")
    Tables(spark, dir, "documents")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= quota)
      .select("doc_id", "lang", "rn")
      .orderBy("doc_id")
  }

  /** Corpus audit: per (source, lang) document counts, unique-content
    * counts, token and char totals — the QA report a data pipeline
    * runs before mixing, surfacing per-source duplication rates and
    * volume shares. One hash aggregate over (source, lang); the
    * distinct-content count rides the same shuffle as a count of
    * distinct md5s.
    */
  def pipeCorpusStats(spark: SparkSession, dir: String): DataFrame = {
    val toks = when(length(trim(col("text"))) === 0, lit(0L))
      .otherwise(size(split(trim(col("text")), "\\s+")).cast("long"))
    Tables(spark, dir, "documents")
      .groupBy("source", "lang")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("n_unique"),
        sum(toks).as("total_tokens"),
        sum(length(col("text")).cast("long")).as("total_chars"))
      .orderBy("source", "lang")
  }

  /** Weighted mixture: language quotas proportional to target weights
    * (en-heavy), filled deterministically per stratum — the "data
    * recipe" step that assembles a training mix from cleaned sources.
    */
  def pipeMixture(spark: SparkSession, dir: String): DataFrame = {
    val total = 200
    val weights: Seq[(String, Double)] =
      Seq("en" -> 0.4, "de" -> 0.2, "es" -> 0.2, "fr" -> 0.1, "zh" -> 0.1)
    val quotaCol = weights.foldLeft(lit(0.0)) { case (acc, (l, wt)) =>
      when(col("lang") === l, lit(math.round(total * wt).toDouble)).otherwise(acc)
    }
    val w = Window.partitionBy("lang").orderBy("doc_id")
    Tables(spark, dir, "documents")
      .withColumn("quota", quotaCol)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= col("quota"))
      .select(col("doc_id"), col("lang"), col("rn"))
      .orderBy("doc_id")
  }

  /** Greedy sequence packing: per-language running token count assigns
    * each doc to the 4096-token pack it starts in — the batch-assembly
    * step before tokenized pretraining shards. One window pass per
    * stratum; pack summaries aggregate map-side.
    */
  def pipePack(spark: SparkSession, dir: String): DataFrame = {
    val budget = 4096L
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "documents")
      .withColumn("toks", graft.functions.TextFunctions.tokenCount(col("text")))
      .withColumn("cum", sum("toks").over(w))
      .withColumn("pack_id", floor((col("cum") - col("toks")) / budget).cast("long"))
      .groupBy("lang", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("pack_tokens"))
      .orderBy("lang", "pack_id")
  }

  /** Incremental (cross-run) exact dedup: a new batch is deduplicated
    * against the already-ingested corpus by content hash, then within
    * itself — the steady-state shape of a crawling pipeline, where
    * each day's scrape dedups against billions of prior documents
    * without re-reading their text (only the hash column ships into
    * the anti-join; at 100 TB that's the difference between joining
    * a hash index and joining the corpus). Planted: re-ids of corpus
    * docs (<40, +200000) must all be dropped as already-ingested.
    */
  def pipeIncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val corpusHashes = docs.filter(col("doc_id") < 300)
      .select(md5(col("text")).as("content_hash")).distinct()
    val planted = docs.filter(col("doc_id") < 40)
      .select((col("doc_id") + 200000L).as("doc_id"), col("text"))
    val batch = docs.filter(col("doc_id") >= 300).select("doc_id", "text")
      .unionByName(planted)
      .select(col("doc_id"), md5(col("text")).as("content_hash"))
    batch
      .join(corpusHashes, Seq("content_hash"), "left_anti")
      .groupBy("content_hash").agg(min("doc_id").as("doc_id"))
      .select("doc_id", "content_hash")
      .orderBy("doc_id")
  }

  /** Token 5-gram windows of the normalized text — the native
    * single-pass [[graft.functions.NgramsExpr]] kernel (the HOF
    * transform+slice equivalent runs interpreted per window).
    */
  private def ngrams5(text: Column): Column =
    graft.lake.GraftExpr.column(
      graft.functions.NgramsExpr(graft.lake.GraftExpr.expression(text), 5))

  /** Eval-set decontamination: flag corpus docs (doc_id ≥ 20) sharing
    * any token 5-gram with the benchmark set (doc_id < 20) — the
    * overlap check run before training on scraped data. The benchmark
    * n-gram set is small and broadcast; the corpus explode streams.
    */
  def pipeDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val bench = docs.filter(col("doc_id") < 20)
      .select(explode(ngrams5(col("text"))).as("g")).distinct()
    docs.filter(col("doc_id") >= 20)
      .select(col("doc_id"), explode(ngrams5(col("text"))).as("g"))
      .join(broadcast(bench), "g")
      .select("doc_id").distinct()
      .withColumn("contaminated", lit(true))
      .orderBy("doc_id")
  }

  /** FUZZY eval-set decontamination: exact n-gram overlap
    * ([[pipeDecontaminate]]) misses paraphrased or lightly-edited
    * benchmark leaks, so this pass runs MinHash-LSH between the
    * corpus and the eval set — the same banded signature machinery as
    * [[Dedup.dedupMinhashLsh]] — and verifies bucket collisions with
    * exact word-set Jaccard ≥ 0.5. Per flagged corpus doc it reports
    * how many eval docs it near-duplicates and the strongest overlap.
    *
    * Scale shape: the eval side (benchmarks — thousands of docs, not
    * corpus-scale) broadcasts in BOTH the banded-signature collision
    * join and the verification join, so the 100 TB corpus streams
    * with no shuffle; candidates are bounded by bucket collisions.
    * The planted near-dups (eval text + an appended tail) give the
    * path known positives that exact 5-gram matching also sees —
    * while a real paraphrase leak only this pass would catch.
    */
  def pipeFuzzyDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val docs = Dedup.withPlantedNearDups(Tables(spark, dir, "documents"))
    val sigs = Dedup.bandedSigs(docs, "doc_id", "text", k = 32, bands = 8)
    val ev = sigs.filter(col("doc_id") < 20)
      .select(col("doc_id").as("eval_id"), col("band"), col("band_hash"))
    val corp = sigs.filter(col("doc_id") >= 20)
      .select(col("doc_id"), col("band"), col("band_hash"))
    val cand = broadcast(ev).join(corp, Seq("band", "band_hash"))
      .select("eval_id", "doc_id").distinct()
    val ws = docs.select(col("doc_id"), wordSet(col("text")).as("ws"))
    val evw = ws.filter(col("doc_id") < 20)
      .select(col("doc_id").as("eval_id"), col("ws").as("ws_e"))
    cand
      .join(ws, "doc_id")
      .join(broadcast(evw), "eval_id")
      .withColumn("jac_raw",
        size(array_intersect(col("ws"), col("ws_e"))).cast("double") /
          size(array_union(col("ws"), col("ws_e"))).cast("double"))
      .filter(col("jac_raw") >= 0.5)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_eval_matches"),
        max(round(col("jac_raw"), 4)).as("max_jaccard"))
      .orderBy("doc_id")
  }

  /** Fibonacci-multiplier hash shared by [[pipeShuffle]] and
    * [[pipeSplit]]: the id is reduced mod 2^31 BEFORE the multiply so
    * the product stays under 2^63 for every possible long id — exact
    * 64-bit integer arithmetic on both engines (no silent wraparound
    * on one side and an overflow error on the other), which is what
    * makes the "random" order and bucket bit-reproducible in the
    * oracle. Ids ≥ 2^31 alias into the same hash space; the hash
    * stays a fine shuffle/bucket key (collisions only tie-break by
    * doc_id), just not a bijection there.
    */
  private def docHash(id: Column): Column =
    pmod(pmod(id, lit(2147483648L)) * lit(2654435761L), lit(4294967296L))

  /** Deterministic global shuffle: the training-order randomization
    * pass before sharding. Ordering by a hash of the key (not by
    * `rand()`) makes the permutation reproducible across retries and
    * engines while still decorrelating neighbors. The global position
    * comes from the two-phase ordinal ([[Ranks.withGlobalOrdinal]]):
    * range sort on (shuffle_key, doc_id) then zipWithIndex — NOT a
    * partition-less `row_number()` window, which would funnel the
    * whole corpus through one reducer. Same tie-free total order,
    * same positions, same hashes.
    */
  def pipeShuffle(spark: SparkSession, dir: String): DataFrame =
    Ranks.withGlobalOrdinal(
      Tables(spark, dir, "documents")
        .select(col("doc_id"), docHash(col("doc_id")).as("shuffle_key")),
      "pos", col("shuffle_key"), col("doc_id"))
      .select("doc_id", "shuffle_key", "pos")
      .orderBy("pos")

  /** The whole corpus-assembly pipeline, one oracle-checked query:
    * Gopher quality gate → exact dedup (keep lowest id per content
    * hash) → eval-set decontamination (5-gram overlap with the
    * benchmark docs) → per-language stratified sample. Each stage is
    * the same operator the standalone queries use, so a green hash
    * certifies the COMPOSITION — stage interfaces, id flow, filter
    * order — not just each stage alone. Every stage is a hash
    * aggregate, broadcast join, or per-stratum window: nothing here
    * changes shape at 100 TB.
    */
  def pipeEndToEnd(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val kept = TextOps.textGopherFilter(spark, dir)
      .filter(col("keep")).select("doc_id")
    val deduped = docs.join(kept, "doc_id")
      .groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val contaminated = pipeDecontaminate(spark, dir).select("doc_id")
    val clean = deduped.filter(col("doc_id") >= 20)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .join(docs.select("doc_id", "lang"), "doc_id")
    val w = Window.partitionBy("lang").orderBy("doc_id")
    clean.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 30)
      .select("doc_id", "lang", "rn")
      .orderBy("doc_id")
  }

  /** Hash-bucket train/validation/test split (97/2/1): membership
    * depends only on doc_id, so it is stable as the corpus grows —
    * new documents never move an old document across splits, the
    * invariant that keeps a long-lived eval set uncontaminated. One
    * codegen'd projection, no shuffle at all.
    */
  def pipeSplit(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), (docHash(col("doc_id")) % 100).as("bucket"))
      .withColumn("split",
        when(col("bucket") < 97, "train")
          .when(col("bucket") < 99, "validation")
          .otherwise("test"))
      .select("doc_id", "bucket", "split")
      .orderBy("doc_id")

  /** Curriculum quality bucketing: assign every document to a decile
    * of the corpus-bigram-LM surprisal score ([[TextOps
    * .textPerplexity]]'s exact-integer `bits_sum`), the ordering a
    * curriculum/annealing data schedule feeds from (cleanest decile
    * last, noisiest first — or dropped outright).
    *
    * Scale shape: the naive `ntile(10) OVER (ORDER BY score)` is a
    * single-reducer global sort at 100 TB — and so is a full
    * sort+zipWithIndex rank selection. Instead the nine cut VALUES are
    * read off a per-distinct-rate histogram: `rate` is an integer
    * per-mille bit rate (≲ tens of thousands of distinct values at any
    * corpus size, bounded by the bits-per-bigram range — value-bounded,
    * not row-bounded), so one hash aggregate shrinks the corpus to a
    * value histogram and the cumulative-count window runs over THAT.
    * The value at 0-based rank r is the unique rate whose cumulative
    * span contains r (cum−cnt ≤ r < cum); ≤9 histogram rows reach the
    * driver, no corpus sort anywhere. Bucket assignment stays a
    * zero-shuffle codegen'd comparison against the broadcast-literal
    * cuts. Ties share a value, so every tied doc lands in the same
    * bucket on both engines: bucket = 1 + #(cuts < rate), exact
    * integer arithmetic end-to-end.
    */
  def pipeCurriculum(spark: SparkSession, dir: String): DataFrame = {
    // persisted: feeds the histogram pass and the final bucket
    // projection — the bigram-LM DAG behind textPerplexity runs once
    val scores = TextOps.textPerplexity(spark, dir)
      .select(col("doc_id"),
        expr("bits_sum * 1000 div n_bigrams").as("rate"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hist = scores.groupBy("rate").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(Window.orderBy("rate")))
    val n = hist.agg(max("cum")).head().getLong(0)
    val ranks = (1 to 9).map(i => (i * n) / 10 - 1).filter(_ >= 0).distinct
    val crossing = ranks.map(r =>
      col("cum") - col("cnt") <= r && col("cum") > r).reduce(_ || _)
    val picked = hist.filter(crossing)
      .select(col("rate"), col("cnt"), col("cum")).collect()
    val cuts = ranks.map(r => picked.find(p =>
      p.getLong(2) - p.getLong(1) <= r && r < p.getLong(2)).get.getLong(0))
    val bucket = cuts.map(c => when(col("rate") > lit(c), 1).otherwise(0))
      .reduceOption(_ + _).getOrElse(lit(0)) + lit(1)
    scores.withColumn("bucket", bucket.cast("long"))
      .select("doc_id", "rate", "bucket")
      .orderBy("doc_id")
  }

  /** Cluster-balanced diversity sampling (the embedding-space quota
    * counterpart of [[pipeStratifiedSample]], as used for cluster-
    * balanced data curation in SemDeDup-style pipelines): assign every
    * vector to its nearest coarse-quantizer centroid — the SAME
    * Lloyd-refined [[IvfIndex]] the ANN and SemDeDup paths share, so
    * the notion of "semantic bucket" is consistent across the engine —
    * and keep at most [[ClusterSampleQuota]] rows per cluster
    * (lowest vec_id first; substitute a salted hash rank for a uniform
    * draw). Dense clusters are capped, sparse clusters survive intact,
    * so the sample preserves embedding-space coverage instead of
    * mirroring the density skew of the crawl.
    *
    * Scale: assignment is one codegen'd map over the scan (no
    * per-query index build — centroids are table metadata); the quota
    * is a window partitioned on the cluster key — a hash shuffle into
    * ~k groups of ~n/k rows, never a global sort. The DuckDB oracle
    * replays quantizer training + assignment + ranking exactly.
    */
  def pipeClusterSample(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions
    val cents = IvfIndex.centroids(spark, dir)
    val assigned = Tables(spark, dir, "embeddings")
      .select(col("vec_id"),
        element_at(VectorFunctions.topCentroidIds(col("embedding"), cents, 1), 1)
          .cast("long").as("cluster"))
    val w = Window.partitionBy("cluster").orderBy("vec_id")
    assigned
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= ClusterSampleQuota)
      .select("cluster", "vec_id", "rank")
      .orderBy("cluster", "vec_id")
  }

  /** Per-cluster cap for [[pipeClusterSample]] — with k = 8√n centroids
    * the expected cluster size is √n/8, so a fixed cap keeps roughly
    * 8·quota·√n rows: a sample that GROWS sublinearly with the corpus.
    */
  val ClusterSampleQuota = 4

  /** Shard manifest: deterministic doc→shard assignment (the Knuth
    * multiplicative hash [[pipeShuffle]] already uses, mod 16) plus
    * per-shard row/char totals — the balance audit a corpus writer
    * checks before shipping K training shards. One map-side-combined
    * aggregate to 16 rows; the production writer repartitions on the
    * same expression so audit and layout can never disagree.
    */
  /** Per-source corpus governance report (P15 — the data-card /
    * source-audit table every corpus release publishes): document and
    * token volumes, empty-document share, and the exact-duplicate rate
    * (share of docs whose md5 content hash occurs more than once
    * CORPUS-WIDE — the D1 hash, so the report agrees with the dedup
    * pass it summarises) broken down by ingestion source.
    *
    * Scale shape: the duplicate flag ships the 16-byte hash, never the
    * text (one hash aggregate + one hash-keyed join); everything else
    * is a single map-side-combined rollup to |sources| rows.
    */
  def pipeSourceReport(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("source"), col("doc_id"),
        md5(col("text")).as("h"),
        length(col("text")).cast("long").as("n_chars"),
        when(length(trim(col("text"))) === 0, 0L)
          .otherwise(size(split(trim(col("text")), "\\s+")).cast("long"))
          .as("n_tokens"))
    val copies = docs.groupBy("h").agg(count(lit(1)).as("n_copies"))
    docs.join(copies, "h")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_tokens") === 0, 1L).otherwise(0L)).as("n_empty"),
        sum("n_chars").as("total_chars"),
        sum("n_tokens").as("total_tokens"),
        sum(when(col("n_copies") > 1, 1L).otherwise(0L)).as("n_dup_docs"))
      .withColumn("dup_rate",
        round(col("n_dup_docs").cast("double") / col("n_docs"), 6))
      .orderBy("source")
  }

  /** Near-duplicate SOURCE-attribution matrix (`pipe_cross_dup`, P20
    * — the question P15's per-source dup RATE cannot answer: WHICH
    * sources duplicate each other, the matrix that decides whether a
    * candidate source is redundant with an existing one before
    * licensing or ingesting it). Every MinHash-verified near-dup pair
    * (the D2 operator run as-is, est-Jaccard ≥ 0.5) attributes to its
    * unordered source pair; planted variant ids (≥ 100000 — the D2
    * fixture's base+100000 convention, kept in lockstep with
    * [[Dedup.withPlantedNearDups]]) resolve to their base document's
    * source.
    *
    * Scale shape: the expensive stage IS the proven banded-LSH
    * operator (never all-pairs); the attribution joins move only the
    * verified pair ids (near-dup-mass-bounded) hashed on doc_id, and
    * the output is ≤ |sources|² rows.
    */
  def pipeCrossDup(spark: SparkSession, dir: String): DataFrame = {
    val pairs = graft.operators.Dedup.dedupMinhashLsh(spark, dir)
      .select("id_a", "id_b")
    val src = Tables(spark, dir, "documents").select("doc_id", "source")
    val based = pairs
      .withColumn("ba", when(col("id_a") >= Dedup.PlantedIdOffset,
          col("id_a") - Dedup.PlantedIdOffset).otherwise(col("id_a")))
      .withColumn("bb", when(col("id_b") >= Dedup.PlantedIdOffset,
          col("id_b") - Dedup.PlantedIdOffset).otherwise(col("id_b")))
    based
      .join(src.select(col("doc_id").as("ba"), col("source").as("sa2")), "ba")
      .join(src.select(col("doc_id").as("bb"), col("source").as("sb2")), "bb")
      .select(least(col("sa2"), col("sb2")).as("source_x"),
        greatest(col("sa2"), col("sb2")).as("source_y"))
      .groupBy("source_x", "source_y")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("source_x", "source_y")
  }

  /** Dedup savings by source (P21 — the cost-side number a dedup
    * rollout reports next to P20's attribution matrix: how many docs
    * and bytes does keep-one-per-cluster actually reclaim, and from
    * which sources?): reads the SAME settled CC labels every policy
    * operator consumes (no propagation re-run), picks each cluster's
    * keep-longest representative with the D7 window (per-cluster
    * frames, near-dup-bounded), and rolls the NON-representatives up
    * per source — planted variants attribute to their base doc's
    * source via [[Dedup.PlantedIdOffset]]. Exact integer chars; the
    * output is ≤ |sources| rows.
    */
  /** Quality-filter ablation matrix (P22 — the audit a curation team
    * runs BEFORE tuning a gate: per Gopher sub-filter, how many docs
    * fail it at all, how many it kills UNIQUELY (no other filter
    * would have caught them), and the token mass those unique kills
    * cost — a filter whose kills are all redundant can be dropped for
    * free; one whose unique kills carry real token mass is the gate
    * actually shaping the corpus). ONE documents scan computes the
    * five sub-conditions from the SHARED [[TextOps.GopherConditions]]
    * definitions (the keep conjunction and this matrix can never
    * drift), one map-side-combined aggregate folds everything into a
    * single row, and `stack` unpivots it to 5 rows — no second scan,
    * no shuffle beyond the 1-row aggregate.
    */
  def pipeFilterAblation(spark: SparkSession, dir: String): DataFrame = {
    val conds = TextOps.GopherConditions
    val flags = TextOps.gopherMetrics(spark, dir)
      .select(col("n_words") +:
        conds.map { case (n, c) => (!c).as(s"f_$n") }: _*)
      .withColumn("n_fail",
        conds.map { case (n, _) => col(s"f_$n").cast("long") }.reduce(_ + _))
    val aggs = conds.flatMap { case (n, _) => Seq(
      sum(col(s"f_$n").cast("long")).as(s"fail_$n"),
      sum((col(s"f_$n") && col("n_fail") === 1).cast("long")).as(s"uniq_$n"),
      sum(when(col(s"f_$n") && col("n_fail") === 1, col("n_words"))
        .otherwise(lit(0L))).as(s"tok_$n"))
    }
    val one = flags.agg(aggs.head, aggs.tail: _*)
    val stackArgs = conds.map { case (n, _) =>
      s"'$n', fail_$n, uniq_$n, tok_$n"
    }.mkString(", ")
    one.selectExpr(s"stack(${conds.size}, $stackArgs) AS " +
        "(filter, n_failed, n_unique_kills, tokens_unique_lost)")
      .orderBy("filter")
  }

  def pipeDedupSavings(spark: SparkSession, dir: String): DataFrame = {
    val cl = Dedup.settledLabels(spark, dir, forceBuild = false)
      .select("doc_id", "cluster_id")
    val docs = Tables(spark, dir, "documents")
    val lens = Dedup.withPlantedNearDups(docs)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id").orderBy(col("n_chars").desc, col("doc_id"))
    val dropped = cl.join(lens, "doc_id")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > 1)
      .withColumn("base_id",
        when(col("doc_id") >= Dedup.PlantedIdOffset,
          col("doc_id") - Dedup.PlantedIdOffset).otherwise(col("doc_id")))
    dropped
      .join(docs.select(col("doc_id").as("base_id"), col("source")), "base_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_dropped"), sum("n_chars").as("chars_dropped"))
      .orderBy("source")
  }

  /** Train→test split-leakage report (P17 — the governance check run
    * AFTER splitting: how much of each held-out document's n-gram
    * mass already appears in the training split? High leakage means
    * the eval set cannot measure generalization): every P8-test doc
    * reports its distinct-bigram count, how many of those bigrams
    * occur in ANY train doc, and the leaked share — the same
    * [[graft.functions.GraftFunctions]] bigram kernel and the same
    * P8 hash-bucket split, so the report agrees with the operators it
    * audits.
    *
    * Scale shape: the train side collapses to its DISTINCT bigram
    * set (vocabulary-bounded, like the T13 df table) before the join;
    * the test side is 1% of the corpus by the split's construction.
    * Left join on the bigram key — corpus-derived sides UNHINTED.
    */
  def pipeSplitLeakage(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables(spark, dir, "documents")
      .filter(length(trim(col("text"))) > 0)
      .withColumn("bucket", docHash(col("doc_id")) % 100)
      .select(col("doc_id"), col("bucket"),
        explode(expr("graft_bigrams(text)")).as("bigram"))
    val trainBigrams = docs.filter(col("bucket") < 97)
      .select("bigram").distinct().withColumn("in_train", lit(1L))
    docs.filter(col("bucket") >= 99)
      .select("doc_id", "bigram").distinct()
      .join(trainBigrams, Seq("bigram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("in_train"), lit(0L))).as("n_leaked"))
      .withColumn("leak_rate",
        round(col("n_leaked").cast("double") / col("n_bigrams"), 6))
      .orderBy("doc_id")
  }

  // epoch-planner tuning — the oracle SQL embeds the same constants
  private val EpochBudget = 200000L // total training-token budget
  private val MaxEpochs = 4L        // repetition ceiling per source

  /** Epoch/repetition plan per source (P16 — the data-constrained
    * scaling question: given a token budget and a repetition ceiling,
    * how many epochs of each source fit, and how much budget goes
    * unfilled?): the budget splits equally across sources, each
    * source repeats ⌈alloc / tokens⌉ epochs capped at [[MaxEpochs]],
    * achieved tokens = min(alloc, cap · tokens) — all exact integer
    * arithmetic (ceiling division via (a + b − 1) / b, no floats), so
    * the plan is bit-identical across engines.
    *
    * Scale shape: one map-side-combined rollup to |sources| rows; the
    * planner arithmetic runs over that constant-bounded table (the
    * 1-row source-count aggregate is a pinned broadcast, the safe
    * hint class).
    */
  def pipeEpochPlan(spark: SparkSession, dir: String): DataFrame = {
    val perSource = Tables(spark, dir, "documents")
      .select(col("source"),
        when(length(trim(col("text"))) === 0, 0L)
          .otherwise(size(split(trim(col("text")), "\\s+")).cast("long"))
          .as("n_tokens"))
      .groupBy("source").agg(sum("n_tokens").as("tokens"))
      // an all-empty source has nothing to repeat (and 0 tokens would
      // divide-by-zero differently across engines)
      .filter(col("tokens") > 0)
    val nSources = perSource.agg(count(lit(1)).as("n_sources"))
    perSource.crossJoin(broadcast(nSources))
      // `div` is Spark's INTEGRAL division (`/` on longs is double
      // division — a float quotient would break engine parity)
      .withColumn("alloc", expr(s"${EpochBudget}L div n_sources"))
      .withColumn("epochs",
        least(lit(MaxEpochs), expr("(alloc + tokens - 1) div tokens")))
      .withColumn("achieved",
        least(col("alloc"), col("epochs") * col("tokens")))
      .withColumn("deficit", col("alloc") - col("achieved"))
      .select(col("source"), col("tokens"), col("alloc"), col("epochs"),
        col("achieved"), col("deficit"))
      .orderBy("source")
  }

  private val DsirK = 100

  /** DSIR-flavored importance selection (P14 — the "pick raw-pool
    * documents that look like the target domain" step; Xie et al.
    * 2023's importance resampling, made engine-portable): every doc
    * scores Σ_w tf_w · (⌊log₂ n_target(w)⌋ − ⌊log₂ n_corpus(w)⌋) —
    * how much more its unigrams resemble the TARGET frequency profile
    * (here the `en` slice) than the whole corpus — using the same
    * exact-integer floor-log2 trick as the T13 idf and T12 surprisal
    * chains, so the ranking is bit-deterministic across engines (no
    * float log anywhere). Terms unseen in the target contribute zero
    * (the inner join IS the smoothing choice: an out-of-target term
    * carries no evidence). The top [[DsirK]] docs by (score, doc_id)
    * are the selected set.
    *
    * Scale shape: two VOCABULARY-bounded frequency aggregates
    * (map-side combined), word-keyed joins with corpus-derived sides
    * UNHINTED (AQE broadcasts while genuinely small, sort-merges once
    * they are not), one doc-keyed re-aggregate, then a distributed
    * TakeOrdered down to the constant selection — the ordinal runs
    * over ≤[[DsirK]] survivors (constant-bounded pin class).
    */
  def pipeDsirSelect(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .filter(length(trim(col("text"))) > 0)
    val toks = docs.select(col("doc_id"), col("lang"),
      explode(split(trim(col("text")), "\\s+")).as("word"))
    val corpusFreq = toks.groupBy("word").agg(count(lit(1)).as("n_c"))
    val targetFreq = toks.filter(col("lang") === "en")
      .groupBy("word").agg(count(lit(1)).as("n_t"))
    val tf = toks.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val scored = tf
      .join(targetFreq, "word")
      .join(corpusFreq, "word")
      .withColumn("bits",
        (length(bin(col("n_t"))) - length(bin(col("n_c")))).cast("long"))
      .groupBy("doc_id")
      .agg(sum(col("tf") * col("bits")).as("score"))
    scored.orderBy(col("score").desc, col("doc_id")).limit(DsirK)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("score"), col("rn"))
      .orderBy("rn")
  }

  /** Temperature-scaled source mixture (P18, `pipe_temperature_mix`):
    * per-source sampling weights w_s ∝ tokens_s^α with α = 0.5 — the
    * UniMax/multilingual-recipe move that upsamples small sources and
    * downsamples dominant ones without dropping data. α = 0.5 is
    * deliberately realized as the INTEGER floor-sqrt of the token
    * count: the weight denominator is then an exact integer sum
    * (order-independent — a float Σ√tokens would drift with Spark's
    * nondeterministic aggregation order and break oracle parity;
    * IEEE sqrt itself is correctly rounded in both engines, so the
    * floor is bit-identical). Doubles appear only at the final
    * normalizations.
    *
    * Scale shape: one map-side-combined rollup to |sources| rows;
    * the 1-row totals aggregate is the sanctioned broadcast pin.
    * `samples` is the per-source draw count for a 1M-example budget;
    * `boost` is the up/down-sampling factor vs proportional sampling.
    */
  def pipeTemperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val Budget = 1000000L // sampling budget the draw counts are scaled to
    val toks = when(length(trim(col("text"))) === 0, lit(0L))
      .otherwise(size(split(trim(col("text")), "\\s+")).cast("long"))
    val src = Tables(spark, dir, "documents")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(toks).as("tokens"))
      .withColumn("isqrt", floor(sqrt(col("tokens").cast("double"))).cast("long"))
    val tot = src.agg(sum("tokens").as("tot_tokens"), sum("isqrt").as("tot_isqrt"))
    src.crossJoin(broadcast(tot)) // 1-row aggregate: sanctioned pin
      .withColumn("share_raw",
        col("tokens").cast("double") / col("tot_tokens").cast("double"))
      .withColumn("weight_raw",
        col("isqrt").cast("double") / col("tot_isqrt").cast("double"))
      .select(col("source"), col("n_docs"), col("tokens"),
        round(col("share_raw"), 6).as("share"),
        round(col("weight_raw"), 6).as("weight"),
        round(col("weight_raw") / col("share_raw"), 6).as("boost"),
        floor(col("weight_raw") * Budget).cast("long").as("samples"))
      .orderBy("source")
  }

  def pipeShardManifest(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(pmod(docHash(col("doc_id")), lit(16L)).as("shard"),
        length(col("text")).cast("long").as("n_chars"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
      .orderBy("shard")

  /** Token-budget corpus selection: fill 40% of the corpus's token
    * mass with the best documents, quality-first — the "what fits in
    * my training budget" cut every data mix starts from. Selection is
    * the prefix of the (quality desc, doc_id) order whose INCLUSIVE
    * running token total stays within budget.
    *
    * Scale shape: the running total is a distributed EXACT cumulative
    * sum — cluster-wide range sort on the rank key, per-partition
    * token totals (one number per partition to the driver), scanned
    * offsets back out, each partition adds its offset to a local
    * running sum. The same two-phase discipline as textVocab's rank:
    * no `Window.orderBy` over the whole corpus funneling every row
    * through one reducer.
    */
  def pipeTokenBudget(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions._
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), tokenCount(col("text")).as("n_tokens"),
        qualityScore(col("text")).as("q"))
    // session-default range partitioning: the corpus scales with SF, so
    // the cumsum stage must widen with the cluster, not cap at a literal
    val sorted = docs.repartitionByRange(col("q").desc, col("doc_id"))
      .sortWithinPartitions(col("q").desc, col("doc_id"))
    val rdd = sorted.rdd
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partSums = rdd.mapPartitionsWithIndex { case (i, it) =>
      Iterator((i, it.map(_.getLong(1)).sum))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val budget = offsets.last * 2 / 5
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_tokens",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cum_tokens",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val rows = rdd.mapPartitionsWithIndex { case (i, it) =>
      var acc = offsets(i)
      it.map { r =>
        val t = r.getLong(1); acc += t
        org.apache.spark.sql.Row(r.getLong(0), t, acc)
      }
    }
    spark.createDataFrame(rows, schema)
      .filter(col("cum_tokens") <= budget)
      .orderBy("doc_id")
  }

  /** Quality-decile calibration table (`pipe_quality_decile` — the
    * audit a curation pipeline publishes before picking a quality
    * cutoff: per score decile, volume, token mass, and how much exact
    * duplication it carries; a cut that drops mostly duplicates is
    * cheap, one that drops unique token mass is not). Min/max of the
    * score bound each decile (order-independent — an AVG would drift
    * with float summation order across engines).
    *
    * Scale shape: one documents scan computes (tokens, quality, md5),
    * `localCheckpoint`ed so the count, the rank pass and the dup join
    * share it; the decile is the two-phase global ordinal + NTILE
    * arithmetic; the duplicate flag joins the 16-byte-hash COUNT
    * table on the hash key (text never ships twice). Output: 10 rows.
    */
  def pipeQualityDecile(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions._
    val base = Tables(spark, dir, "documents")
      .select(col("doc_id"), tokenCount(col("text")).as("toks"),
        qualityScore(col("text")).as("q"), md5(col("text")).as("h"))
      .localCheckpoint()
    val n = base.count()
    val dupHashes = base.groupBy("h").agg(count(lit(1)).as("cnt"))
    val ranked = Ranks.withGlobalOrdinal(base, "__ord",
        col("q").desc, col("doc_id"))
      .withColumn("decile", Ranks.ntileBucket(col("__ord"), n, 10L))
      .join(dupHashes, "h")
    ranked.groupBy("decile")
      .agg(count(lit(1)).as("n_docs"),
        sum("toks").as("sum_tokens"),
        sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
        round(min("q"), 4).as("min_q"),
        round(max("q"), 4).as("max_q"))
      .orderBy("decile")
  }
}
