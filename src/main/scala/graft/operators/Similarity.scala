package graft.operators

import graft.Tables
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY §2.4).
  *
  * Scale design: the brute-force path broadcasts only the (small)
  * query side — the 100 TB corpus streams through codegen'd cosine
  * with no shuffle. The LSH and IVF paths turn ANN into equi-joins on
  * bucket keys so candidate generation is hash-partitioned and the
  * expensive exact cosine runs only on candidates.
  */
object Similarity {

  private val QuerySetSize = 10
  private val TopK = 5

  /** Brute-force cosine top-k: exact baseline, DuckDB-oracle-checked.
    *
    * Scale shape: the query matrix is a plan constant
    * ([[graft.functions.CosineScores]] scores one corpus row against
    * all queries in a fused kernel — no join, no n·nq intermediate
    * rows) and the bounded [[graft.functions.ScoreTopK]] aggregate
    * keeps k best per query with map-side combine, so no shuffle
    * carries more than partitions·nq·k pairs. The former
    * `row_number() over (partition by qid)` re-rank shuffled every
    * scored pair into nq reducers — the whole corpus per reducer at
    * scale.
    */
  def simBruteforceTopk(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{CosineScores, ScoreTopK}
    import org.apache.spark.sql.GraftSqlShims
    val emb = Tables(spark, dir, "embeddings")
    val qvs = emb.filter(col("vec_id") < QuerySetSize).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    emb.filter(col("vec_id") >= QuerySetSize)
      .select(col("vec_id").as("cid"),
        GraftSqlShims.column(CosineScores(
          GraftSqlShims.expression(col("embedding")), qvs)).as("coss"))
      .select(GraftSqlShims.column(ScoreTopK(
          GraftSqlShims.expression(col("cid")),
          GraftSqlShims.expression(col("coss")),
          qvs.length, TopK).toAggregateExpression()).as("tk"))
      .select(explode(col("tk")).as("r"))
      .select(col("r.qid"), col("r.cid"), round(col("r.cos"), 4).as("cos"), col("r.rn"))
      .orderBy("qid", "rn")
  }

  /** ANN self-evaluation (`sim_recall_report`, S21): per-query
    * recall@k of the IVF probe path against exact brute-force ground
    * truth — the eval loop every ANN deployment runs before trusting
    * an index (the spec-side recall bars become a first-class,
    * oracle-checked report). Both legs are the proven operators run
    * as-is; the comparison stages are joins of ≤ nq·k id pairs —
    * constant-bounded, so the report costs two corpus passes (one per
    * leg) and nothing that scales beyond them.
    */
  def simRecallReport(spark: SparkSession, dir: String): DataFrame = {
    val bf = simBruteforceTopk(spark, dir).select("qid", "cid")
    val ivf = simIvf(spark, dir).select("qid", "cid")
    val hits = ivf.join(bf, Seq("qid", "cid"))
      .groupBy("qid").agg(count(lit(1)).as("n_hits"))
    bf.select("qid").distinct()
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("recall",
        round(col("n_hits").cast("double") / TopK, 4))
      .orderBy("qid")
  }

  /** IVF quantizer balance report (`sim_cluster_balance`, S22 — the
    * skew diagnosis every ANN deployment runs before trusting probe
    * budgets: a lopsided cluster means probe-scoped scan fractions
    * degrade toward brute force on hot clusters). Each corpus vector
    * takes its PRIMARY (top-1) assignment under the shared Lloyd-
    * refined quantizer; output is one row per cluster with its
    * population and integer-ppm share — cluster-count-bounded, and
    * the share is pure integer arithmetic (n·10⁶ div total), so the
    * oracle hash-matches with no float accumulation.
    *
    * Scale shape: one corpus pass assigns (the same fused
    * [[graft.functions.VectorFunctions.topCentroidIds]] kernel the
    * ANN queries run), one hash aggregate to ≤k rows, and the total
    * joins back as a 1-row broadcast.
    */
  def simClusterBalance(spark: SparkSession, dir: String): DataFrame = {
    val cents = IvfIndex.centroids(spark, dir)
    val emb = Tables(spark, dir, "embeddings")
    val assigned = emb.filter(col("vec_id") >= QuerySetSize)
      .select(element_at(
        topCentroidIds(col("embedding"), cents, 1), 1)
        .cast("long").as("cluster"))
    val byCluster = assigned.groupBy("cluster")
      .agg(count(lit(1)).as("n_vectors"))
    // crossJoin against a 1-ROW aggregate — the sanctioned
    // constant-bounded pin (same class as the other commented pins)
    val total = byCluster.agg(sum("n_vectors").as("tot"))
    byCluster.crossJoin(broadcast(total))
      .select(col("cluster"), col("n_vectors"),
        expr("(n_vectors * 1000000) DIV tot").as("share_ppm"))
      .orderBy("cluster")
  }

  // hybrid-retrieval tuning — the oracle SQL in SparkEntry embeds the
  // same constants, so change them ONLY in lockstep with it
  private[operators] val HybridVecK = 30
  private[operators] val HybridTextK = 100
  private[operators] val HybridTerms = Seq("merge", "vector", "customer")
  private val RrfK = 60

  /** Hybrid retrieval with reciprocal-rank fusion (S18) — the shape
    * every production RAG stack runs: a dense leg (exact cosine
    * top-[[HybridVecK]] per query over the embedding column, the
    * S1 fused-kernel chassis) and a sparse leg (T19 ranked keyword
    * search over the materialized inverted index, postings-only),
    * fused per query as RRF(d) = Σ_legs 1/(60 + rank_leg(d)) — rank
    * fusion needs no score calibration between legs, which is why it
    * beats weighted-sum fusion across heterogeneous scorers.
    *
    * Scale shape: each leg is already bounded — the dense leg's
    * shuffle carries ≤ partitions·nq·k pairs, the sparse leg is a
    * distributed TakeOrdered (never a full sort) down to the
    * CONSTANT [[HybridTextK]] survivors — so the fusion itself joins
    * two constant-bounded lists (≤ nq·(vecK+textK) rows): the
    * single-partition ordinal over the text survivors and the
    * broadcast of both legs are pins on CONSTANT-bounded sides, the
    * sanctioned hint class. Nothing in the fused stage scales with
    * the corpus.
    */
  def simHybridRrf(spark: SparkSession, dir: String): DataFrame =
    hybridFused(spark, dir,
      TextOps.rankedScores(spark, dir, HybridTerms,
        minId = QuerySetSize.toLong))

  /** S18 with the BM25 sparse leg (the production default — tf
    * saturation + length norm, [[TextOps.bm25Scores]]): same fusion
    * chassis, same bounds; only the text leg's scorer changes. RRF is
    * exactly why this swap is safe — rank fusion never compares raw
    * scores across legs, so upgrading one leg's scorer needs no
    * recalibration of the other.
    */
  def simHybridBm25(spark: SparkSession, dir: String): DataFrame =
    hybridFused(spark, dir,
      TextOps.bm25Scores(spark, dir, TextOps.Bm25Terms,
        minId = QuerySetSize.toLong)
        .withColumn("score", col("bm25_micro")))

  private def hybridFused(spark: SparkSession, dir: String,
      sparseScores: DataFrame): DataFrame = {
    import graft.functions.{CosineScores, ScoreTopK}
    import org.apache.spark.sql.GraftSqlShims
    val emb = Tables(spark, dir, "embeddings")
    val qvs = emb.filter(col("vec_id") < QuerySetSize).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    // dense leg: per-query rank list, k = HybridVecK
    val vk = emb.filter(col("vec_id") >= QuerySetSize)
      .select(col("vec_id").as("cid"),
        GraftSqlShims.column(CosineScores(
          GraftSqlShims.expression(col("embedding")), qvs)).as("coss"))
      .select(GraftSqlShims.column(ScoreTopK(
          GraftSqlShims.expression(col("cid")),
          GraftSqlShims.expression(col("coss")),
          qvs.length, HybridVecK).toAggregateExpression()).as("tk"))
      .select(explode(col("tk")).as("r"))
      .select(col("r.qid"), col("r.cid"), col("r.rn").as("vrn"))
    // sparse leg: global top-HybridTextK by the caller's exact-integer
    // score — TakeOrdered to the constant survivor set, then the
    // ordinal runs over ≤HybridTextK rows (constant-bounded, so the
    // single-partition window is in the sanctioned pin class)
    val tk = sparseScores
      .orderBy(col("score").desc, col("id")).limit(HybridTextK)
      .withColumn("trn", row_number().over(
        Window.orderBy(col("score").desc, col("id"))).cast("long"))
      .select(col("id").as("cid"), col("trn"))
    // fusion over the union of both candidate lists: ONE full-outer
    // join keyed (qid, cid) — vk appears once in the plan, so the
    // corpus-scanning dense leg runs exactly once; a text-ranked doc
    // is a candidate for EVERY query (the keyword leg is the query
    // set's shared sparse side), so the sparse side expands by the
    // qid list first (both sides stay constant-bounded: ≤ nq·130 rows
    // total through the join)
    val qids = emb.filter(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("qid"))
    val textPairs = qids.crossJoin(broadcast(tk))
    vk.join(textPairs, Seq("qid", "cid"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(RrfK) + col("vrn")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("trn")), lit(0.0)))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("rrf").desc, col("cid")))
        .cast("long"))
      .filter(col("rn") <= TopK)
      .select(col("qid"), col("cid"), round(col("rrf"), 6).as("rrf"),
        col("rn"))
      .orderBy("qid", "rn")
  }

  // MMR tuning — the oracle SQL in SparkEntry embeds the same
  // constants, so change them ONLY in lockstep with it
  private[graft] val MmrPool = 30
  private[graft] val MmrK = 5
  private[graft] val MmrLambda = 0.5

  /** MMR-diversified re-rank (S19, `sim_mmr`): exact cosine
    * top-[[MmrPool]] per query (the S1 fused-kernel chassis), then
    * greedy Maximal Marginal Relevance selects [[MmrK]] results
    * balancing relevance against redundancy — the diversified
    * retrieval every RAG stack runs so five near-duplicate passages
    * don't fill the context window.
    *
    * Scale shape: the corpus is touched ONCE by the bounded top-k
    * chassis (≤ partitions·nq·pool pairs in the shuffle); everything
    * downstream — the embedding re-join (broadcast pin on the
    * ≤ nq·pool candidate list, the sanctioned constant-bounded hint
    * class), the per-query collect_list (≤ pool structs per row), and
    * the [[graft.functions.MmrSelect]] greedy kernel — runs over
    * constant-bounded data. λ = 0.5 keeps the scoring arithmetic
    * exact under IEEE doubles (power-of-two scales), so the unrolled
    * DuckDB replay hash-matches.
    */
  def simMmr(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{CosineScores, MmrSelect, ScoreTopK}
    import org.apache.spark.sql.GraftSqlShims
    val emb = Tables(spark, dir, "embeddings")
    val qvs = emb.filter(col("vec_id") < QuerySetSize).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val vk = emb.filter(col("vec_id") >= QuerySetSize)
      .select(col("vec_id").as("cid"),
        GraftSqlShims.column(CosineScores(
          GraftSqlShims.expression(col("embedding")), qvs)).as("coss"))
      .select(GraftSqlShims.column(ScoreTopK(
          GraftSqlShims.expression(col("cid")),
          GraftSqlShims.expression(col("coss")),
          qvs.length, MmrPool).toAggregateExpression()).as("tk"))
      .select(explode(col("tk")).as("r"))
      .select(col("r.qid"), col("r.cid"), col("r.cos"))
    val cands = Tables(spark, dir, "embeddings")
      .select(col("vec_id").as("cid"), col("embedding"))
      .join(broadcast(vk), "cid") // ≤ nq·pool rows: sanctioned pin
    cands
      .groupBy("qid")
      .agg(collect_list(struct(col("cid"), col("cos"), col("embedding")))
        .as("cands"))
      .select(col("qid"),
        explode(GraftSqlShims.column(MmrSelect(
          GraftSqlShims.expression(col("cands")), MmrLambda, MmrK))).as("p"))
      .select(col("qid"), col("p.cid"), round(col("p.mmr"), 6).as("mmr"),
        col("p.rn"))
      .orderBy("qid", "rn")
  }

  /** Filtered (predicate-constrained) top-k vector search: exact
    * cosine top-k among only the corpus vectors satisfying a metadata
    * predicate — the "vector search with a WHERE clause" shape every
    * retrieval stack needs (tenant scoping, language/label filters,
    * date ranges). Pre-filtering, not post-filtering: the predicate
    * cuts the corpus BEFORE any vector arithmetic, so k survivors are
    * guaranteed (post-filtering top-k then discarding non-matching
    * rows can return fewer than k).
    *
    * Scale shape: the predicate is an ordinary pushed parquet filter
    * — files whose `label` stats exclude the wanted set are skipped
    * and non-matching rows die at the scan, so the fused
    * [[graft.functions.CosineScores]] kernel and bounded
    * [[graft.functions.ScoreTopK]] aggregate (map-side combined,
    * ≤ partitions·nq·k pairs in the shuffle) only ever see matching
    * vectors. Selectivity multiplies INTO the scan cost instead of
    * being paid after it.
    */
  /** Euclidean (L2) nearest-neighbor top-k — the metric-general twin
    * of [[simBruteforceTopk]]: identical fused-kernel + bounded-top-k
    * shape, with [[graft.functions.L2Scores]] emitting negated
    * distances so the same max-keeping [[graft.functions.ScoreTopK]]
    * aggregate keeps the NEAREST rows. One scan, no shuffle wider
    * than partitions·nq·k — the metric changes one expression, not
    * the plan.
    */
  def simL2Topk(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{L2Scores, ScoreTopK}
    import org.apache.spark.sql.GraftSqlShims
    val emb = Tables(spark, dir, "embeddings")
    val qvs = emb.filter(col("vec_id") < QuerySetSize).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    emb.filter(col("vec_id") >= QuerySetSize)
      .select(col("vec_id").as("cid"),
        GraftSqlShims.column(L2Scores(
          GraftSqlShims.expression(col("embedding")), qvs)).as("negd"))
      .select(GraftSqlShims.column(ScoreTopK(
          GraftSqlShims.expression(col("cid")),
          GraftSqlShims.expression(col("negd")),
          qvs.length, TopK).toAggregateExpression()).as("tk"))
      .select(explode(col("tk")).as("r"))
      .select(col("r.qid"), col("r.cid"),
        round(-col("r.cos"), 4).as("dist"), col("r.rn"))
      .orderBy("qid", "rn")
  }

  /** Maximum-inner-product (MIPS) top-k — the third metric on the
    * shared fused-kernel + bounded-top-k chassis (what two-tower
    * retrieval and recommendation models score with). Raw dot is
    * already max-is-best, so [[graft.functions.ScoreTopK]] consumes
    * [[graft.functions.InnerScores]] unmodified.
    */
  def simMipsTopk(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{InnerScores, ScoreTopK}
    import org.apache.spark.sql.GraftSqlShims
    val emb = Tables(spark, dir, "embeddings")
    val qvs = emb.filter(col("vec_id") < QuerySetSize).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    emb.filter(col("vec_id") >= QuerySetSize)
      .select(col("vec_id").as("cid"),
        GraftSqlShims.column(InnerScores(
          GraftSqlShims.expression(col("embedding")), qvs)).as("dots"))
      .select(GraftSqlShims.column(ScoreTopK(
          GraftSqlShims.expression(col("cid")),
          GraftSqlShims.expression(col("dots")),
          qvs.length, TopK).toAggregateExpression()).as("tk"))
      .select(explode(col("tk")).as("r"))
      .select(col("r.qid"), col("r.cid"),
        round(col("r.cos"), 4).as("dot"), col("r.rn"))
      .orderBy("qid", "rn")
  }

  def simFilteredTopk(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{CosineScores, ScoreTopK}
    import org.apache.spark.sql.GraftSqlShims
    val emb = Tables(spark, dir, "embeddings")
    val qvs = emb.filter(col("vec_id") < QuerySetSize).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    emb.filter(col("vec_id") >= QuerySetSize &&
        col("label").isin(FilteredLabels: _*))
      .select(col("vec_id").as("cid"),
        GraftSqlShims.column(CosineScores(
          GraftSqlShims.expression(col("embedding")), qvs)).as("coss"))
      .select(GraftSqlShims.column(ScoreTopK(
          GraftSqlShims.expression(col("cid")),
          GraftSqlShims.expression(col("coss")),
          qvs.length, TopK).toAggregateExpression()).as("tk"))
      .select(explode(col("tk")).as("r"))
      .select(col("r.qid"), col("r.cid"), round(col("r.cos"), 4).as("cos"), col("r.rn"))
      .orderBy("qid", "rn")
  }

  /** Label set for [[simFilteredTopk]]'s metadata predicate (~30% of
    * the synthetic corpus — selective enough to change every top-k
    * list, wide enough that all queries keep k matches).
    */
  private val FilteredLabels: Seq[Int] = Seq(2, 5, 7)

  /** Radius (range) similarity search: every (query, corpus) pair
    * with cosine ≥ [[RangeTau]] — the "all near neighbors within a
    * similarity radius" companion of top-k retrieval (the shape
    * retrieval-augmented dedup and paraphrase mining ask for, where
    * the neighbor COUNT is unknown a priori).
    *
    * Scale shape: the query matrix is a plan constant scored by the
    * fused [[graft.functions.CosineScores]] kernel, the per-row
    * explode + threshold filter is a narrow codegen'd pipeline (no
    * shuffle, no join — the n·nq pairs exist only transiently inside
    * one whole-stage-codegen span and die at the filter), and the
    * output is bounded by the radius selectivity, not the corpus
    * size. Thresholding happens on the ROUNDED cosine on both engines
    * so boundary values agree bit-for-bit.
    */
  def simRange(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.CosineScores
    import org.apache.spark.sql.GraftSqlShims
    val emb = Tables(spark, dir, "embeddings")
    // the kernel scores by POSITION in the query matrix; carry the
    // actual query vec_ids alongside and translate position → id via
    // a literal array lookup, so a query set with id gaps (nothing
    // guarantees 0..QuerySetSize-1 stays contiguous in future
    // testdata) can never silently shift every reported qid
    val qRows = emb.filter(col("vec_id") < QuerySetSize).orderBy("vec_id")
      .select("vec_id", "embedding").collect()
    val qids = qRows.map(_.getLong(0))
    val qvs = qRows.map(_.getSeq[Float](1).map(_.toDouble).toArray)
    emb.filter(col("vec_id") >= QuerySetSize)
      .select(col("vec_id").as("cid"),
        GraftSqlShims.column(CosineScores(
          GraftSqlShims.expression(col("embedding")), qvs)).as("coss"))
      .select(col("cid"), posexplode(col("coss")).as(Seq("pos", "cos")))
      .select(element_at(typedLit(qids.toSeq), col("pos").cast("int") + 1).as("qid"),
        col("cid"), round(col("cos"), 4).as("cos"))
      .filter(col("cos") >= RangeTau)
      .orderBy("qid", "cid")
  }

  /** Similarity radius for [[simRange]]: wide enough to return a
    * non-trivial neighbor set on the synthetic embeddings, tight
    * enough that the result stays selectivity-bounded.
    */
  private val RangeTau = 0.3

  /** Random-hyperplane LSH ANN: 64-bit signatures, 4 bands × 16 bits.
    * 65,536 buckets per band — bucket-key cardinality scales with the
    * corpus (≥√n up to n≈4×10⁹; beyond that, widen the signature),
    * unlike a constant 16-bucket space that degenerates to all-pairs.
    * Candidates = bucket collisions; exact cosine re-ranks. Oracle:
    * DuckDB replays the deterministic plane matrix (see SparkEntry).
    */
  def simLshAnn(spark: SparkSession, dir: String): DataFrame = {
    val ps = planes(64, 64)
    // bits-per-band adapts to the corpus: 2^b buckets per band with
    // b = ⌈log₂√n⌉ keeps expected bucket size ≤ √n (so each band's
    // self-join stays ~O(n·√n) worst case, not O(n²/constant)), while
    // staying coarse enough at small n that near neighbors still
    // collide. 4 bands × up to 16 bits fit the 64-bit signature to
    // n ≈ 4×10⁹; beyond that, widen the signature to 128 bits.
    val n = EmbCount(spark, dir)
    val b = math.min(16, math.max(4,
      math.ceil(math.log(math.sqrt(n.toDouble)) / math.log(2.0)).toInt))
    val mask = (1L << b) - 1
    val emb = Tables(spark, dir, "embeddings")
    // bucket keys only — the banded frames never carry the embedding,
    // so the collision join and candidate-dedup shuffle move 16-byte
    // id pairs, not 256-byte vectors
    val banded = emb.withColumn("sig", hyperplaneSig(col("embedding"), ps))
      .select(col("vec_id"),
        explode(array((0 until 4).map(i => struct(lit(i).as("band"),
          shiftright(col("sig"), b * i).bitwiseAND(lit(mask)).as("bits"))): _*)).as("bb"))
      .select(col("vec_id"), col("bb.band"), col("bb.bits"))
    val q = banded.filter(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("qid"), col("band"), col("bits"))
    val c = banded.filter(col("vec_id") >= QuerySetSize)
      .select(col("vec_id").as("cid"), col("band"), col("bits"))
    val cand = broadcast(q).join(c, Seq("band", "bits"))
      .select("qid", "cid").distinct()
    rerank(emb, cand)
  }

  /** [[simPq]] over codes MATERIALIZED at OPTIMIZE time — the 100 TB
    * session shape the fused-scan variant only simulates. The corpus
    * lives in a GraftTable whose `graft.pq.index` property makes
    * OPTIMIZE train the codebook once (committed as table metadata)
    * and write every row's m-byte codes as a parquet sidecar; the
    * query then scans ONLY the codes — an 8× smaller read than the
    * float32 embeddings, with zero encode work — and looks distances
    * up via [[graft.functions.PqAdcFromCodes]]. Deterministic
    * end-to-end (same training rows, same exact-int64 arithmetic), so
    * the result is bit-identical to [[simPq]] and shares its full
    * DuckDB oracle. Staleness contract: the sidecar carries the active
    * file-set fingerprint; after DML the reader falls back to
    * encode-on-scan until the next OPTIMIZE (see
    * [[graft.lake.GraftTable.buildPqIndex]]).
    */
  /** Reuse-or-build the materialized-index work table for `name`:
    * table create + OPTIMIZE + index build is SETUP (the fixture a
    * real deployment pays once per data change), not per-query work —
    * a fingerprint-current index is reused so repeated runs time the
    * READ path; the fingerprint contract makes staleness impossible
    * (any data change forces the rebuild on the next OPTIMIZE).
    */
  private[operators] def indexFixture(spark: SparkSession, dir: String, name: String,
      indexProp: (String, String), expectedRows: Long)
      (df: => DataFrame): graft.lake.GraftTable = {
    val path = LakeOps.workDirPath(dir, name)
    // reuse gate: the index property must match AND the stats-derived
    // row count must equal what a fresh build would load — a fixture a
    // spec ran DML against (or a half-written one) resets instead of
    // serving divergent data. Count comes from AddFile footer stats:
    // driver-side metadata, no scan.
    val reusable = graft.lake.GraftTable.isGraftTable(path) && {
      val t = graft.lake.GraftTable.forPath(spark, path)
      val s = t.snapshot
      s.metadata.exists(_.properties.get(indexProp._1).contains(indexProp._2)) &&
        s.activeFiles.forall(_.stats.isDefined) && s.dvFiles.isEmpty &&
        s.activeFiles.flatMap(_.stats.map(_.numRecords)).sum == expectedRows
    }
    val t =
      if (reusable) graft.lake.GraftTable.forPath(spark, path)
      else graft.lake.GraftTable.create(spark, LakeOps.workDir(dir, name), df,
        properties = Map(indexProp))
    t.optimize() // fingerprint-current index -> metadata no-op
    t
  }

  def simPqMaterialized(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{PqAdcFromCodes, PqTopK}
    import org.apache.spark.sql.GraftSqlShims
    val emb = Tables(spark, dir, "embeddings")
    val t = indexFixture(spark, dir, "pqmat",
      "graft.pq.index" -> "vec_id,embedding",
      EmbCount(spark, dir) - QuerySetSize)(
      emb.filter(col("vec_id") >= QuerySetSize))
    val props = t.snapshot.metadata.map(_.properties).getOrElse(Map.empty)
    val books = PqCodebook.decodeBooks(props("graft.pq.embedding.books"))
    val qtables = PqCodebook.queryTables(books, PqCodebook.queryVectors(spark, dir))
    val codes = t.pqCodes("embedding")
    codes
      .select(col("id").as("cid"),
        GraftSqlShims.column(PqAdcFromCodes(
          GraftSqlShims.expression(col("codes")), qtables)).as("adcs"))
      .select(GraftSqlShims.column(PqTopK(
          GraftSqlShims.expression(col("cid")),
          GraftSqlShims.expression(col("adcs")),
          qtables.length, TopK).toAggregateExpression()).as("tk"))
      .select(explode(col("tk")).as("r"))
      .select(col("r.qid"), col("r.cid"), col("r.adc"), col("r.rn"))
      .orderBy("qid", "rn")
  }

  /** IVF-style ANN over the persisted [[IvfIndex]]: the corpus is
    * multi-assigned to its top-[[IvfIndex.Spill]] centroids (public
    * "multiple assignment" IVF — doubles the chance a true neighbor
    * sits in a probed list at the same query budget), queries probe
    * their top-[[IvfIndex.Probes]] centroids, and exact cosine
    * re-ranks the candidate join. Scan fraction ≈ spill·probes/k with
    * k = 8√n, so the probed share *shrinks* as the corpus grows
    * (12.5% at sf0.1, →0 at 100 TB); centroid build cost is paid once
    * per table, not per query. The coarse quantizer is a strided
    * medoid seed refined by [[IvfIndex.Rounds]] distributed Lloyd
    * rounds in EXACT int64 (measured: recall@5 0.76 at sf0.1, 0.86
    * at sf0.001 at this budget — graft.tools.IvfRecall replays the
    * measurement), which keeps the whole operator DuckDB-replicable
    * bit-for-bit — so this path is FULLY oracle-checked (see
    * SparkEntry.simIvfSql), plus the recall spec in OperatorsSpec.
    */
  def simIvf(spark: SparkSession, dir: String): DataFrame = {
    val cents = IvfIndex.centroids(spark, dir)
    val emb = Tables(spark, dir, "embeddings")
    // cluster assignments only — candidate generation and dedup move
    // id pairs; vectors re-attach after the dedup (see rerank)
    val corpus = emb.filter(col("vec_id") >= QuerySetSize)
      .select(col("vec_id").as("cid"),
        explode(topCentroidIds(col("embedding"), cents, IvfIndex.Spill)).as("cluster"))
    val queries = emb.filter(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("qid"),
        explode(topCentroidIds(col("embedding"), cents,
          math.min(IvfIndex.Probes, cents.length))).as("cluster"))
    // spill assignment can land the same (query, candidate) pair in
    // two probed clusters — dedup (on ids) before the exact re-rank
    val cand = broadcast(queries).join(corpus, "cluster")
      .select("qid", "cid").distinct()
    rerank(emb, cand)
  }

  /** SQ8 scalar-quantized top-k (the FAISS `SQ8` family — the third
    * standard compression point beside exact float32 and PQ codes):
    * per-dimension int64 scales train from the SAME deterministic
    * strided ≤1024-row sample discipline PQ's codebooks use, every
    * corpus row quantizes to one signed byte per dimension (4× less
    * than float32 when materialized; unsampled outliers saturate at
    * ±127, the FAISS clamp), and the fused [[graft.functions.SqScores]]
    * kernel scores each row against all pre-quantized queries in
    * EXACT int64 with one double division at the edge. Bounded
    * [[graft.functions.ScoreTopK]] keeps k per query with map-side
    * combine — the same ≤ partitions·nq·k shuffle as the brute-force
    * path, at a quarter of the per-row arithmetic width. Every code
    * and score replays bit-for-bit in the DuckDB oracle.
    */
  def simSqTopk(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{ScoreTopK, SqScores}
    import org.apache.spark.sql.GraftSqlShims
    val emb = Tables(spark, dir, "embeddings")
    val qqs = emb.filter(col("vec_id") < QuerySetSize).orderBy("vec_id")
      .select("embedding").collect().map(PqCodebook.quantizeRow)
    val corpus = emb.filter(col("vec_id") >= QuerySetSize)
    val smax = SqScales.train(corpus, "vec_id", "embedding",
      QuerySetSize, corpus.count())
    corpus
      .select(col("vec_id").as("cid"),
        GraftSqlShims.column(SqScores(
          GraftSqlShims.expression(col("embedding")), smax, qqs)).as("scores"))
      .select(GraftSqlShims.column(ScoreTopK(
          GraftSqlShims.expression(col("cid")),
          GraftSqlShims.expression(col("scores")),
          qqs.length, TopK).toAggregateExpression()).as("tk"))
      .select(explode(col("tk")).as("r"))
      .select(col("r.qid"), col("r.cid"),
        round(col("r.cos"), 4).as("cos_sq"), col("r.rn"))
      .orderBy("qid", "rn")
  }


  /** [[simSqTopk]] over codes MATERIALIZED at OPTIMIZE (L79): the
    * corpus lives in a GraftTable whose `graft.sq.index` property
    * makes OPTIMIZE train the per-dimension scales (table metadata)
    * and persist every row's byte codes as a sidecar; the query scans
    * 1 byte/dim via [[graft.functions.SqScoresFromCodes]] — a 4×
    * smaller read than the embeddings with zero re-quantize work —
    * and the scales + codes arithmetic is shared with the session
    * path, so the result is bit-identical to [[simSqTopk]] and shares
    * its full DuckDB oracle. Incremental refreshes (L76) extend the
    * sidecar in O(delta) with frozen scales.
    */
  def simSqMaterialized(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{ScoreTopK, SqScoresFromCodes}
    import org.apache.spark.sql.GraftSqlShims
    val emb = Tables(spark, dir, "embeddings")
    val t = indexFixture(spark, dir, "sqmat",
      "graft.sq.index" -> "vec_id,embedding",
      EmbCount(spark, dir) - QuerySetSize)(
      emb.filter(col("vec_id") >= QuerySetSize))
    val props = t.snapshot.metadata.map(_.properties).getOrElse(Map.empty)
    val smax = props("graft.sq.embedding.scales").split(",").map(_.toLong)
    val qqs = emb.filter(col("vec_id") < QuerySetSize).orderBy("vec_id")
      .select("embedding").collect().map(PqCodebook.quantizeRow)
    t.sqCodes("embedding")
      .select(col("id").as("cid"),
        GraftSqlShims.column(SqScoresFromCodes(
          GraftSqlShims.expression(col("codes")), smax, qqs)).as("scores"))
      .select(GraftSqlShims.column(ScoreTopK(
          GraftSqlShims.expression(col("cid")),
          GraftSqlShims.expression(col("scores")),
          qqs.length, TopK).toAggregateExpression()).as("tk"))
      .select(explode(col("tk")).as("r"))
      .select(col("r.qid"), col("r.cid"),
        round(col("r.cos"), 4).as("cos_sq"), col("r.rn"))
      .orderBy("qid", "rn")
  }

  /** KNN self-join: every vector's top-[[KnnK]] nearest neighbors
    * among ALL other vectors — the all-pairs adjacency a SemDeDup
    * sweep, a diversity/coverage audit, or a graph-based curation
    * pass consumes (vs. [[simBruteforceTopk]]'s few-queries-vs-corpus
    * shape, this is corpus-vs-corpus). Brute force is O(n²) and dead
    * at 100 TB; candidates instead come from the SHARED Lloyd-refined
    * IVF quantizer (the same centroids S3/D9/P11 use): both sides
    * multi-assign to their top-[[IvfIndex.Spill]] clusters and only
    * same-cluster pairs are scored — the equi-join shape, candidate
    * count ~ n·spill²·(n/k) with k = 8√n, i.e. ~O(n^1.5) total work
    * spread across hash partitions instead of n² anywhere. Exact
    * cosine + deterministic tie-break rank per left id; the window
    * runs over each id's bounded candidate list only. The DuckDB
    * oracle replays quantizer training, assignment, candidate scope,
    * and rank op-for-op, so recall loss from cluster scoping can
    * never hide an engine divergence.
    */
  def simKnnJoin(spark: SparkSession, dir: String): DataFrame =
    // benchmark entry computes the graph for real (and refreshes the
    // shared edge fixture); graph consumers (PageRank) reuse it — the
    // settled-CC-labels discipline: one adjacency build per corpus,
    // every downstream policy reads it
    settledKnn(spark, dir, forceBuild = true).orderBy("id_a", "rn")

  /** Settled KNN edges (id_a, id_b, cos, rn) shared through a
    * fingerprint-validated fixture table keyed on the embeddings
    * input — in a real pipeline the adjacency is computed once and
    * every downstream consumer (centrality, diversity audits, graph
    * curation) reads it rather than re-running candidate generation.
    */
  private def settledKnn(spark: SparkSession, dir: String,
      forceBuild: Boolean): DataFrame = {
    import graft.lake.GraftTable
    val emb = Tables(spark, dir, "embeddings")
    val fpRow = emb.agg(count(lit(1)).as("n"),
      sum(xxhash64(col("vec_id"), col("embedding"))
        .bitwiseAND(lit(0xffffffffL))).as("h")).head()
    val fp = s"${fpRow.getLong(0)}:${fpRow.getLong(1)}"
    val path = LakeOps.workDirPath(dir, "knnedges")
    val valid = !forceBuild && GraftTable.isGraftTable(path) &&
      GraftTable.forPath(spark, path).snapshot.metadata
        .exists(_.properties.get("graft.knn.fingerprint").contains(fp))
    if (!valid)
      GraftTable.create(spark, LakeOps.workDir(dir, "knnedges"),
        knnJoinCompute(spark, dir),
        properties = Map("graft.knn.fingerprint" -> fp))
    GraftTable.forPath(spark, path).toDF
  }

  private def knnJoinCompute(spark: SparkSession, dir: String): DataFrame = {
    val cents = IvfIndex.centroids(spark, dir)
    val emb = Tables(spark, dir, "embeddings")
    val assigned = emb.select(col("vec_id"),
      explode(topCentroidIds(col("embedding"), cents,
        math.min(IvfIndex.Spill, cents.length))).as("cluster"))
    val cand = assigned.select(col("vec_id").as("id_a"), col("cluster"))
      .join(assigned.select(col("vec_id").as("id_b"), col("cluster")), "cluster")
      .filter(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b").distinct()
    val va = emb.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val vb = emb.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    val w = Window.partitionBy("id_a").orderBy(col("cos_raw").desc, col("id_b"))
    cand.join(vb, "id_b").join(va, "id_a")
      .withColumn("cos_raw", cosine(col("ea"), col("eb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= KnnK)
      .select(col("id_a"), col("id_b"),
        round(col("cos_raw"), 4).as("cos"), col("rn").cast("long").as("rn"))
      .orderBy("id_a", "rn")
  }

  /** Neighbors kept per vector in [[simKnnJoin]]. */
  private val KnnK = 3

  /** PageRank centrality over the [[simKnnJoin]] similarity graph —
    * the "which documents are authoritative / representative"
    * primitive a corpus-curation pass ranks with (and the inverse:
    * low-centrality outliers for filtering).
    *
    * EXACT-INTEGER arithmetic throughout (the repo's floor-log2 /
    * int64-Lloyd discipline): ranks live as integer mass at scale
    * 10¹², per-edge contributions are `r div outdeg`, damping is
    * `(17·Σ) div 20` — every sum is order-independent integer
    * addition, so the DuckDB oracle matches bit-for-bit where a
    * float PR would drift with aggregation order. Dangling-node mass
    * is dropped (simplified PR), identically on both engines.
    *
    * Scale shape: 3 power-iteration rounds, each ONE shuffle on the
    * destination key (edges ⋈ ranks map-side on src, partial-summed
    * contributions); the graph is the KNN output (≤ k·n edges), never
    * densified; no driver traffic beyond the node count.
    */
  def simPagerank(spark: SparkSession, dir: String): DataFrame = {
    val Scale = 1000000000000L
    val edges = settledKnn(spark, dir, forceBuild = false)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val nn = nodes.agg(count(lit(1)).as("n"))
    var r = nodes.crossJoin(broadcast(nn))
      .select(col("id"), expr(s"$Scale div n").as("r"))
    (1 to 3).foreach { _ =>
      val contrib = edges.join(outdeg, "src")
        .join(r.select(col("id").as("src"), col("r")), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(expr("r div deg")).as("s"))
      r = nodes.crossJoin(broadcast(nn))
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (expr(s"(($Scale * 3) div 20) div n") +
            expr("(17 * coalesce(s, 0L)) div 20")).as("r"))
        .localCheckpoint(true)
    }
    r.select(col("id").as("vec_id"), col("r").as("pr")).orderBy("vec_id")
  }

  /** k-core peel over the KNN similarity graph (S20 — the coreness
    * curation cut: documents surviving the k-core sit in densely
    * interconnected semantic neighborhoods, while low-coreness docs
    * are weakly attached outliers even when their raw degree is
    * high): three fixed peel rounds (S15's unrolled-iteration
    * discipline, so the DuckDB oracle replays round-for-round) each
    * drop nodes with degree < 3 on the CANONICAL undirected pair set
    * and their incident edges; survivors report their final degree.
    *
    * Scale shape: each round is one map-side-combined degree
    * aggregate plus two id-keyed semi-join-shaped filters;
    * `localCheckpoint` caps plan growth across rounds exactly like
    * the CC and PageRank loops. Reads the same settled KNN fixture
    * as S15/S17 — no per-session vector scoring.
    */
  def simKcore(spark: SparkSession, dir: String): DataFrame = {
    val K = 3L
    var und = settledKnn(spark, dir, forceBuild = false)
      .select(least(col("id_a"), col("id_b")).as("u"),
        greatest(col("id_a"), col("id_b")).as("v")).distinct()
      .localCheckpoint(true)
    (1 to 3).foreach { _ =>
      val deg = und.select(col("u").as("id"))
        .unionAll(und.select(col("v").as("id")))
        .groupBy("id").agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= K).select("id")
      und = und
        .join(keep.select(col("id").as("u")), "u")
        .join(keep.select(col("id").as("v")), "v")
        .select("u", "v")
        .localCheckpoint(true)
    }
    und.select(col("u").as("id")).unionAll(und.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
      .select(col("id").as("vec_id"), col("deg"))
      .orderBy("vec_id")
  }

  /** Triangle participation over the [[simKnnJoin]] similarity graph
    * — the local-clustering primitive of graph-based corpus curation
    * (a document in many triangles sits in a tight semantic cluster;
    * a triangle-free one is an outlier or a bridge).
    *
    * Scale shape: the classic degree-ordered orientation — symmetrize
    * to canonical u<v pairs, orient every edge from the (degree, id)-
    * smaller endpoint to the larger, so the graph becomes a DAG whose
    * max out-degree is O(√m); wedges join oriented edges on their
    * shared source (fan-out bounded by that √m, never a hub's raw
    * degree) and close against the canonical pair set with one hash
    * equi-join. Each triangle surfaces exactly once, at its
    * order-minimum apex. All joins key-partitioned; nothing touches
    * the driver.
    */
  def simTriangles(spark: SparkSession, dir: String): DataFrame = {
    val edges = settledKnn(spark, dir, forceBuild = false)
      .select(col("id_a"), col("id_b"))
    val und = edges.select(least(col("id_a"), col("id_b")).as("u"),
        greatest(col("id_a"), col("id_b")).as("v")).distinct()
    val deg = und.select(col("u").as("id"))
      .unionAll(und.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    val lower = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val orient = und
      .join(deg.select(col("id").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("d").as("dv")), "v")
      .select(when(lower, col("u")).otherwise(col("v")).as("s"),
        when(lower, col("v")).otherwise(col("u")).as("t"))
    val wedges = orient.select(col("s"), col("t").as("y1"))
      .join(orient.select(col("s"), col("t").as("y2")), "s")
      .filter(col("y1") < col("y2"))
    val tri = wedges.join(und,
        least(col("y1"), col("y2")) === col("u") &&
          greatest(col("y1"), col("y2")) === col("v"))
      .select(col("s").as("x"), col("y1"), col("y2"))
    tri.select(col("x").as("id"))
      .unionAll(tri.select(col("y1").as("id")))
      .unionAll(tri.select(col("y2").as("id")))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
      .select(col("id").as("vec_id"), col("n_tri"))
      .orderBy(col("n_tri").desc, col("vec_id")).limit(20)
  }

  /** [[simIvf]] over assignments MATERIALIZED at OPTIMIZE time: the
    * embeddings live in a GraftTable whose `graft.ivf.index` property
    * makes OPTIMIZE persist the strided-medoid centroids AND every
    * row's top-probe cluster assignments as parquet sidecars next to
    * the table (see [[graft.lake.GraftTable.buildIvfIndex]]). The
    * query then reads 12-byte assignment rows — no per-session
    * centroid scoring over the corpus — joins query probes (rr ≤
    * Probes) against corpus lists (rr ≤ Spill) on the cluster id, and
    * exact cosine re-ranks. Centroid selection and assignment replay
    * the [[IvfIndex]] arithmetic over the same rows, so the result is
    * bit-identical to [[simIvf]] and shares its full DuckDB oracle.
    */
  def simIvfMaterialized(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val t = indexFixture(spark, dir, "ivfmat",
      "graft.ivf.index" -> "vec_id,embedding", EmbCount(spark, dir))(emb)
    val assign = t.ivfAssignments("embedding")
    val qa = assign.filter(col("id") < QuerySetSize && col("rr") <= IvfIndex.Probes)
      .select(col("id").as("qid"), col("cluster"))
    val ca = assign.filter(col("id") >= QuerySetSize && col("rr") <= IvfIndex.Spill)
      .select(col("id").as("cid"), col("cluster"))
    val cand = broadcast(qa).join(ca, "cluster").select("qid", "cid").distinct()
    rerank(t.toDF, cand)
  }

  /** Filtered ANN over the L59 materialized index: the metadata
    * predicate cuts the CORPUS-side assignment rows before the
    * cluster join (pre-filtering — k survivors guaranteed within the
    * probed clusters), so tenant-scoped / label-scoped vector search
    * reads 12-byte assignment rows plus only the matching vectors.
    * Shares `sim_ivf_materialized`'s fixture — one durable index
    * serves both the plain and the filtered search.
    */
  def simFilteredIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val t = indexFixture(spark, dir, "ivfmat",
      "graft.ivf.index" -> "vec_id,embedding", EmbCount(spark, dir))(emb)
    val assign = t.ivfAssignments("embedding")
    val qa = assign.filter(col("id") < QuerySetSize && col("rr") <= IvfIndex.Probes)
      .select(col("id").as("qid"), col("cluster"))
    val keep = emb.filter(col("vec_id") >= QuerySetSize &&
        col("label").isin(2, 5, 7))
      .select(col("vec_id").as("cid"))
    val ca = assign.filter(col("id") >= QuerySetSize && col("rr") <= IvfIndex.Spill)
      .select(col("id").as("cid"), col("cluster"))
      .join(keep, "cid")
    val cand = broadcast(qa).join(ca, "cluster").select("qid", "cid").distinct()
    rerank(t.toDF, cand)
  }

  /** Exact-cosine re-rank of a bounded candidate id-pair set: the
    * candidate list broadcasts against the corpus scan (no corpus
    * shuffle), query vectors broadcast, and the top-k window runs over
    * candidates only (≤ buckets·√n pairs by construction — never the
    * n·nq full-scores shape, which is [[simBruteforceTopk]]'s bounded
    * aggregate's job).
    */
  private def rerank(emb: DataFrame, cand: DataFrame): DataFrame = {
    val qv = emb.filter(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val cv = emb.filter(col("vec_id") >= QuerySetSize)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val w = Window.partitionBy("qid").orderBy(col("cos_raw").desc, col("cid"))
    broadcast(cand).join(cv, "cid").join(broadcast(qv), "qid")
      .withColumn("cos_raw", cosine(col("qe"), col("ce")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= TopK)
      .select(col("qid"), col("cid"), round(col("cos_raw"), 4).as("cos"), col("rn").cast("long").as("rn"))
      .orderBy("qid", "rn")
  }

  /** Two-stage PQ serving shape (ADC shortlist → exact re-rank — the
    * standard FAISS `search`-then-refine deployment): compressed-domain
    * table lookups narrow the corpus to [[RerankC]] candidates per
    * query, then exact cosine on the shortlist's true vectors fixes
    * the quantization error in the final ranking. At 100 TB the first
    * stage reads m-byte codes (32× less I/O than float32) over the
    * whole corpus and the second stage fetches only nq·C full vectors
    * — the refine cost is independent of corpus size. Both stages are
    * deterministic (int64 ADC, fixed tiebreaks), so the DuckDB oracle
    * replays the exact composition.
    */
  def simPqRerank(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{PqAdcDistances, PqTopK}
    import org.apache.spark.sql.GraftSqlShims
    val emb = Tables(spark, dir, "embeddings")
    val (books, qtables) = PqCodebook(spark, dir)
    val cand = emb.filter(col("vec_id") >= QuerySetSize)
      .select(col("vec_id").as("cid"),
        GraftSqlShims.column(PqAdcDistances(
          GraftSqlShims.expression(col("embedding")), books, qtables)).as("adcs"))
      .select(GraftSqlShims.column(PqTopK(
          GraftSqlShims.expression(col("cid")),
          GraftSqlShims.expression(col("adcs")),
          qtables.length, RerankC).toAggregateExpression()).as("tk"))
      .select(explode(col("tk")).as("r"))
      .select(col("r.qid"), col("r.cid"))
    rerank(emb, cand)
  }

  /** ADC-shortlist width for [[simPqRerank]]: wide enough that PQ
    * quantization error rarely pushes a true top-[[TopK]] neighbor
    * out, small enough that the refine stage stays O(nq·C).
    */
  private val RerankC = 20

  /** IVF-PQ composition (the FAISS IVFPQ shape, Jégou et al. 2011):
    * the IVF coarse quantizer narrows the corpus to the probed
    * clusters' candidates, and PQ-ADC table lookups — not exact
    * cosine — score them. At 100 TB this is THE standard ANN
    * deployment shape: the scan touches spill·probes/k of the corpus,
    * and what it reads per row is the m-byte code, not the float32
    * vector, so the candidate scoring I/O shrinks by both factors
    * multiplicatively. Candidate generation is the [[simIvf]]
    * id-pair equi-join; each distinct candidate row is ADC-scored
    * ONCE (the per-pair join re-attaches only the scored integer),
    * and the final top-k ranks a bounded candidate set. Every stage
    * is deterministic integer/medoid arithmetic, so the full chain —
    * centroid assignment, codebook training, encode, ADC, rank —
    * replays bit-for-bit in the DuckDB oracle.
    */
  def simIvfPq(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.PqAdcDistances
    import org.apache.spark.sql.GraftSqlShims
    val cents = IvfIndex.centroids(spark, dir)
    val emb = Tables(spark, dir, "embeddings")
    val corpus = emb.filter(col("vec_id") >= QuerySetSize)
      .select(col("vec_id").as("cid"),
        explode(topCentroidIds(col("embedding"), cents, IvfIndex.Spill)).as("cluster"))
    val queries = emb.filter(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("qid"),
        explode(topCentroidIds(col("embedding"), cents,
          math.min(IvfIndex.Probes, cents.length))).as("cluster"))
    val cand = broadcast(queries).join(corpus, "cluster")
      .select("qid", "cid").distinct()
    val (books, qtables) = PqCodebook(spark, dir)
    val cv = emb.filter(col("vec_id") >= QuerySetSize)
      .select(col("vec_id").as("cid"), col("embedding"))
    // one ADC evaluation per candidate ROW (all queries' tables in one
    // fused kernel pass); the per-(qid,cid) join then moves only the
    // picked integer, and the top-k window ranks candidates only
    val scoredCids = broadcast(cand.select("cid").distinct())
      .join(cv, "cid")
      .select(col("cid"),
        GraftSqlShims.column(PqAdcDistances(
          GraftSqlShims.expression(col("embedding")), books, qtables)).as("adcs"))
    val w = Window.partitionBy("qid").orderBy(col("adc"), col("cid"))
    broadcast(cand).join(scoredCids, "cid")
      .select(col("qid"), col("cid"),
        element_at(col("adcs"), (col("qid") + 1).cast("int")).as("adc"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= TopK)
      .select(col("qid"), col("cid"), col("adc"), col("rn").cast("long").as("rn"))
      .orderBy("qid", "rn")
  }

  /** Product-quantization ADC scan (Jégou et al. 2011): the corpus
    * streams once through a codegen'd kernel that encodes each vector
    * against per-subspace codebooks and emits table-lookup distances
    * for all queries; a bounded [[graft.functions.PqTopK]] aggregate
    * keeps the k best per query with map-side combine. At 100 TB the
    * codes (m bytes/vector — a 32× compression of float32) would be
    * materialized at OPTIMIZE time and the scan becomes memory-bound
    * table lookups; here encode fuses into the scan since the corpus
    * streams through anyway. No shuffle carries more than
    * partitions·nq·k pairs. All arithmetic is exact int64 (coords
    * quantized to 1e-4 units), so the DuckDB oracle replays the whole
    * operator — codebook selection, encode argmin, ADC sum —
    * bit-for-bit (see SparkEntry.simPqSql).
    */
  def simPq(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{PqAdcDistances, PqTopK}
    import org.apache.spark.sql.GraftSqlShims
    val emb = Tables(spark, dir, "embeddings")
    val (books, qtables) = PqCodebook(spark, dir)
    val scored = emb.filter(col("vec_id") >= QuerySetSize)
      .select(col("vec_id").as("cid"),
        GraftSqlShims.column(PqAdcDistances(
          GraftSqlShims.expression(col("embedding")), books, qtables)).as("adcs"))
    scored
      .select(GraftSqlShims.column(PqTopK(
          GraftSqlShims.expression(col("cid")),
          GraftSqlShims.expression(col("adcs")),
          qtables.length, TopK).toAggregateExpression()).as("tk"))
      .select(explode(col("tk")).as("r"))
      .select(col("r.qid"), col("r.cid"), col("r.adc"), col("r.rn"))
      .orderBy("qid", "rn")
  }
}

/** Deterministic PQ codebooks + query distance tables: per-subspace
  * codewords are strided medoid rows of the corpus (the [[IvfIndex]]
  * trick — exact data points, so the quantizer is replicable outside
  * Spark, where Lloyd-trained codebooks would carry float-summation
  * order in every coordinate). Coordinates quantize to int64 units of
  * 1e-4 on the driver; everything downstream is exact integer
  * arithmetic. Driver cost: two pruned KB-scale collects (Ks + nq
  * rows); at 100 TB codebooks stay KBs of broadcast metadata.
  */
/** SQ8 per-dimension scale training — ONE implementation shared by
  * the session operator ([[Similarity.simSqTopk]]) and the
  * materialized index (`GraftTable.buildSqIndex`), so their codes can
  * never drift; the DuckDB oracle replays this exact arithmetic
  * (strided ≤[[SqScales.TrainN]]-row sample, 10⁴ quantization,
  * per-dimension `max(|q|)` with a floor of 1).
  */
object SqScales {
  val TrainN = 1024

  def train(corpus: org.apache.spark.sql.DataFrame, idCol: String,
      vecCol: String, minId: Long, n: Long): Array[Long] = {
    val tstride = math.max(1L, n / TrainN)
    val sample = corpus.filter((col(idCol) - minId) % tstride === 0)
      .orderBy(idCol).limit(TrainN).select(vecCol).collect()
      .map(PqCodebook.quantizeRow)
    val dim = sample.head.length
    Array.tabulate(dim)(d =>
      math.max(1L, sample.iterator.map(v => math.abs(v(d))).max))
  }
}

object PqCodebook {
  import graft.functions.PqAdcDistances

  // m=32 × ks=64 with sub=2 dims/subspace: on isotropic synthetic
  // embeddings (no manifold structure for coarse subspaces to exploit)
  // narrow subspaces carry the recall — measured 0.68 vs exact-L2
  // truth at ks=64/sub=2 against 0.12 at ks=16/sub=8, rising to ~0.76
  // after Lloyd refinement. Codes are m bytes/vector — still an 8×
  // compression of float32.
  val M = 32   // subspaces (dim must divide evenly; testdata dim = 64)
  val Ks = 64  // codewords per subspace
  val TrainN = 1024 // codebook training sample cap (strided, deterministic)
  val Iters = 3     // Lloyd refinement rounds

  private val QuerySet = 10

  /** Returns (codebooks m×ks×sub, qtables nq×m×ks) in quantized int64.
    *
    * Codebooks are seeded with strided medoid rows, then refined with
    * [[Iters]] Lloyd rounds over a strided ≤[[TrainN]]-row training
    * sample — ENTIRELY in int64: coordinates are pre-quantized, the
    * centroid update is truncating integer division (sum/count), and
    * assignment ties break to the lowest codeword. Integer sums are
    * associative in any order, so the same training loop replays
    * bit-for-bit in the DuckDB oracle — the property Lloyd over floats
    * can never have (centroid means would carry summation order).
    * Training a PQ codebook on a bounded sample is also exactly the
    * 100 TB shape: the sample collect is KBs-to-MBs regardless of
    * corpus size, and training cost is m·ks·TrainN·sub per round on
    * the driver.
    */
  def apply(spark: SparkSession, dir: String)
      : (Array[Array[Array[Long]]], Array[Array[Array[Long]]]) = {
    val emb = Tables(spark, dir, "embeddings")
    val n = EmbCount(spark, dir)
    val books = train(emb.filter(col("vec_id") >= QuerySet),
      "vec_id", "embedding", QuerySet.toLong, n - QuerySet)
    (books, queryTables(books, queryVectors(spark, dir)))
  }

  /** The pre-quantized query vectors (vec_id < QuerySet), in id order. */
  def queryVectors(spark: SparkSession, dir: String): Array[Array[Long]] =
    Tables(spark, dir, "embeddings").filter(col("vec_id") < QuerySet)
      .orderBy("vec_id").select("embedding").collect().map(quantizeRow)

  def quantizeRow(r: org.apache.spark.sql.Row): Array[Long] =
    r.getSeq[Float](0).map(f => PqAdcDistances.quantize(f.toDouble)).toArray

  /** Train codebooks over any (id, vector) corpus frame: strided
    * medoid seed + [[Iters]] Lloyd rounds on a strided ≤[[TrainN]]-row
    * sample, all in exact int64. `minId`/`n` parameterize the stride
    * arithmetic so a GraftTable holding the same rows trains the
    * bit-identical codebook the raw-parquet path does.
    */
  def train(corpus: org.apache.spark.sql.DataFrame, idCol: String, vecCol: String,
      minId: Long, n: Long): Array[Array[Array[Long]]] = {
    val stride = math.max(1L, n / Ks)
    val cw = corpus.filter((col(idCol) - minId) % stride === 0)
      .orderBy(idCol).limit(Ks).select(vecCol).collect().map(quantizeRow)
    val dim = cw.head.length
    require(dim % M == 0, s"embedding dim $dim not divisible by $M subspaces")
    val sub = dim / M
    val seed = Array.tabulate(M)(j => cw.map(_.slice(j * sub, (j + 1) * sub)))
    val tstride = math.max(1L, n / TrainN)
    val sample = corpus.filter((col(idCol) - minId) % tstride === 0)
      .orderBy(idCol).limit(TrainN).select(vecCol).collect().map(quantizeRow)
    lloyd(seed, sample, sub)
  }

  /** Per-query integer L2² lookup tables against trained codebooks. */
  def queryTables(books: Array[Array[Array[Long]]],
      qvs: Array[Array[Long]]): Array[Array[Array[Long]]] = {
    val sub = books(0)(0).length
    qvs.map { qv =>
      Array.tabulate(books.length, books(0).length) { (j, c) =>
        var d = 0L
        var i = 0
        while (i < sub) {
          val diff = qv(j * sub + i) - books(j)(c)(i)
          d += diff * diff
          i += 1
        }
        d
      }
    }
  }

  /** Codebooks ↔ table-property string (m;ks;sub;csv of int64 coords —
    * ~35 KB at m=32/ks=64/sub=2: KB-scale metadata that belongs in the
    * table log, never in `java.io.tmpdir`).
    */
  def encodeBooks(books: Array[Array[Array[Long]]]): String =
    s"${books.length};${books(0).length};${books(0)(0).length};" +
      books.iterator.flatMap(_.iterator.flatMap(_.iterator)).mkString(",")

  def decodeBooks(s: String): Array[Array[Array[Long]]] = {
    val parts = s.split(";")
    val (m, ks, sub) = (parts(0).toInt, parts(1).toInt, parts(2).toInt)
    val flat = parts(3).split(",").map(_.toLong)
    require(flat.length == m * ks * sub, s"corrupt codebook property: ${flat.length} coords")
    Array.tabulate(m, ks, sub)((j, c, i) => flat((j * ks + c) * sub + i))
  }

  /** Lloyd iterations in exact int64: assign each training vector's
    * subspace slice to its nearest codeword (L2², tie → lowest id),
    * then recompute each codeword as the truncating-integer-division
    * mean of its members; empty cells keep their previous codeword.
    * Truncation (not floor) division matches both Scala `Long./` and
    * DuckDB `//`.
    */
  private def lloyd(seed: Array[Array[Array[Long]]], train: Array[Array[Long]],
      sub: Int): Array[Array[Array[Long]]] = {
    var books = seed
    for (_ <- 0 until Iters) {
      books = Array.tabulate(books.length) { j =>
        val cws = books(j)
        val sums = Array.ofDim[Long](cws.length, sub)
        val counts = new Array[Long](cws.length)
        train.foreach { v =>
          var best = 0
          var bestD = Long.MaxValue
          var c = 0
          while (c < cws.length) {
            var d = 0L
            var i = 0
            while (i < sub) {
              val diff = v(j * sub + i) - cws(c)(i)
              d += diff * diff
              i += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          var i = 0
          while (i < sub) { sums(best)(i) += v(j * sub + i); i += 1 }
          counts(best) += 1
        }
        Array.tabulate(cws.length) { c =>
          if (counts(c) == 0) cws(c)
          else Array.tabulate(sub)(i => sums(c)(i) / counts(c))
        }
      }
    }
    books
  }
}

/** Row count of the embeddings table, memoized per directory (a
  * parquet-footer-cheap fact that several operators need for
  * data-adaptive parameters — not worth one Spark job each).
  */
object EmbCount {
  private val memo = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]
  def apply(spark: SparkSession, dir: String): Long =
    memo.computeIfAbsent(dir, d => Tables(spark, d, "embeddings").count()).longValue()
}

/** Build-once IVF coarse quantizer for a table's embedding column.
  *
  * The centroid set is *index metadata*, not per-query state: built on
  * first use (analogous to building on OPTIMIZE), memoized in-process,
  * and persisted as a sidecar under the JVM temp dir so later sessions
  * reload instead of re-training. At 100 TB the same design holds —
  * centroids are k×dim ≤ MBs of metadata next to the table, and the
  * corpus→cluster assignment becomes a materialized column written
  * during OPTIMIZE; locally the assignment pass is one narrow
  * codegen'd map over the scan, cheaper than cache bookkeeping.
  *
  * k = 8√n (power of two) follows the FAISS-style nlist guidance —
  * finer partitioning at a fixed probe budget raises recall; probes
  * and spill are fixed so the scan fraction spill·probes/k falls as
  * the corpus grows. Centroids start as a deterministic strided
  * sample of table rows (medoids) and are then refined with
  * [[Rounds]] distributed Lloyd rounds in EXACT int64 arithmetic
  * (coordinates pre-quantized, integer sums, truncating-division
  * means — the same determinism recipe as [[PqCodebook]]), so the
  * trained quantizer still replays bit-for-bit in the DuckDB oracle
  * where float-mean centroids would carry engine-specific summation
  * order. Measured on the synthetic corpus, refinement + the wider
  * probe budget lifts recall@5 to 0.86 at sf0.001 and 0.76 at sf0.1
  * (probes 8→10 in round 9 bought the sf0.1 bar at an unmeasurable
  * query-time cost — scan fraction ≈ spill·probes/k still shrinks as
  * the corpus grows).
  */
object IvfIndex {
  val Probes = 10
  val Spill = 4

  /** Distributed Lloyd refinement rounds applied to the medoid seed
    * (see [[trainCentroids]]). Two rounds capture most of the recall
    * gain; each costs one assignment pass over the training sample.
    */
  val Rounds = 2

  /** Training-sample ceiling per Lloyd round: refinement reads a
    * strided sample of at most this many rows, so at 100 TB a round
    * touches a bounded slice of the corpus, never all of it. Below
    * the cap (every local SF) the stride is 1 — full-batch training.
    */
  val TrainCap: Long = 1L << 17

  /** Above this k the centroid matrix stops riding the plan as a
    * constant (it would ship k×dim doubles with every task binary) and
    * index builds switch to the broadcast-join assignment path
    * ([[graft.functions.VectorFunctions.assignTopCentroids]]), which
    * keeps centroids in a DataFrame. Both paths are bit-identical.
    */
  val PlanConstantMaxK = 4096

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Double]]]

  def centroids(spark: SparkSession, dir: String): Array[Array[Double]] = {
    val key = cacheKey(spark, dir)
    memo.computeIfAbsent(key, _ => {
      val expectedK = kFor(EmbCount(spark, dir))
      loadSidecar(key, expectedK).getOrElse {
        val cents = build(spark, dir)
        saveSidecar(key, cents)
        cents
      }
    })
  }

  /** Cache key covers the *data*, not just the path: row count plus the
    * parquet files' (mtime, length) fingerprint, so a regenerated table
    * at the same path rebuilds instead of silently reloading stale
    * centroids.
    */
  private def cacheKey(spark: SparkSession, dir: String): String = {
    val n = EmbCount(spark, dir)
    val f = new java.io.File(dir, "embeddings.parquet")
    val files = if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).filter(_.isFile)
                else Array(f)
    val fp = files.foldLeft(0L)((acc, x) =>
      acc ^ java.lang.Long.rotateLeft(x.lastModified(), 17) ^ x.length())
    // v6: int64-Lloyd-refined medoid quantizer — older sidecars hold
    // unrefined (or float-Lloyd) centroids and must not be reloaded
    // (the oracle replays this exact training arithmetic)
    s"$dir#v6#$Probes#$Spill#$Rounds#n=$n#fp=${java.lang.Long.toHexString(fp)}"
  }

  private[graft] def kFor(n: Long): Int = {
    // clamp to Int range BEFORE narrowing: (n/2).toInt wraps negative
    // past 2^32 and collapses k to the floor, breaking k=8*sqrt(n) scaling
    val half = Integer.highestOneBit(
      math.min(math.max(1L, n / 2), Int.MaxValue.toLong).toInt)
    val bySqrt = Integer.highestOneBit(
      math.max(1, math.min(8.0 * math.sqrt(n.toDouble), Int.MaxValue.toDouble).toInt))
    // 2^20 is a sanity ceiling (k=8√n reaches it at n≈1.7×10¹⁰ rows),
    // not a plan-shape limit: builds past [[PlanConstantMaxK]] assign
    // via broadcast join, so cluster sizes keep shrinking as n grows
    // instead of growing linearly against a frozen k
    math.min(1 << 20, math.max(16, math.min(half, bySqrt)))
  }

  private def build(spark: SparkSession, dir: String): Array[Array[Double]] = {
    val emb = Tables(spark, dir, "embeddings")
    trainCentroids(emb, "vec_id", "embedding", EmbCount(spark, dir))
  }

  /** Strided medoid seed + [[Rounds]] distributed Lloyd rounds, all in
    * exact int64 — the full coarse-quantizer training, shared by the
    * session path ([[centroids]]) and the materialized index build
    * ([[graft.lake.GraftTable.buildIvfIndex]]) so both produce the
    * bit-identical quantizer the DuckDB oracle replays.
    *
    * Determinism contract (every step replayable in SQL):
    *  - coordinates quantize as `Math.round(x·10⁴)` — DuckDB's
    *    `FLOOR(x*10000 + 0.5)` is the same IEEE op chain;
    *  - assignment score is `dotInt · (1/√ncInt)`: the integer dot and
    *    norm are exact (≤ 64·10⁸ ≪ 2⁵³, so any summation order gives
    *    the same value) and the one float multiply/sqrt is a fixed op
    *    chain; ties break to the lower centroid id;
    *  - the centroid update is per-coordinate integer sum with
    *    truncating division (Scala `Long./` == DuckDB `//`); empty
    *    clusters keep their previous codeword.
    *
    * Scale shape: assignment runs in tasks against a broadcast of the
    * centroid matrix (index metadata, ≤ k×dim longs — the same
    * driver/executor footprint [[graft.functions.VectorFunctions.assignTopCentroids]]
    * already carries); the update is one map-side-combined
    * (cluster, coord) aggregate whose result is ≤ min(k, [[TrainCap]])×dim
    * rows; the training scan is capped at [[TrainCap]] rows per round.
    */
  def trainCentroids(df: org.apache.spark.sql.DataFrame, idCol: String,
      vecCol: String, n: Long): Array[Array[Double]] = {
    import graft.functions.PqAdcDistances.quantize
    val spark = df.sparkSession
    import spark.implicits._
    val k = kFor(n)
    val stride = math.max(1L, n / k)
    var cents: Array[Array[Long]] = df.filter(col(idCol) % stride === 0)
      .orderBy(idCol).limit(k)
      .select(col(vecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).map(quantize).toArray)
    val tstride = math.max(1L, n / TrainCap)
    val train = df.filter(col(idCol) % tstride === 0)
      .select(col(vecCol).cast("array<double>"))
      .map(_.getSeq[Double](0).map(quantize).toArray)
    for (_ <- 0 until Rounds) {
      val inv = cents.map { cw =>
        var nc = 0L; var i = 0
        while (i < cw.length) { nc += cw(i) * cw(i); i += 1 }
        // all-zero codeword => dot is 0 too, so 0-inv scores it 0.0
        if (nc > 0) 1.0 / math.sqrt(nc.toDouble) else 0.0
      }
      val bc = spark.sparkContext.broadcast((cents, inv))
      val agg = train.flatMap { v =>
        val (cs, invN) = bc.value
        var best = 0
        var bestS = Double.NegativeInfinity
        var c = 0
        while (c < cs.length) {
          val cw = cs(c)
          var dot = 0L; var i = 0
          while (i < cw.length) { dot += v(i) * cw(i); i += 1 }
          val s = dot.toDouble * invN(c)
          if (s > bestS) { bestS = s; best = c }
          c += 1
        }
        v.indices.iterator.map(i => (best, i, v(i)))
      }.toDF("cl", "pos", "q")
        .groupBy("cl", "pos").agg(sum("q").as("s"), count(lit(1)).as("cnt"))
        .as[(Int, Int, Long, Long)].collect()
      val next = cents.map(_.clone())
      agg.foreach { case (cl, pos, s, cnt) => next(cl)(pos) = s / cnt }
      bc.destroy()
      cents = next
    }
    cents.map(_.map(_.toDouble))
  }

  // --- sidecar persistence (plain text: one centroid per line) ---
  // This is a SESSION cache keyed by data fingerprint — fine under
  // tmpdir because losing it only costs a retrain. The DURABLE
  // artifact is the L59 materialized index, which OPTIMIZE persists
  // NEXT TO THE TABLE (GraftTable.buildIvfIndex) with the full
  // fingerprint/idempotence contract; deployments should prefer it.

  private def sidecarPath(key: String): java.nio.file.Path = {
    val h = java.lang.Long.toHexString(graft.functions.Fnv.hashString(key))
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"), s"graft-ivf-$h.txt")
  }

  /** Reload only if the persisted index matches what we'd build now:
    * centroid count == kFor(current n) and a consistent dimension —
    * anything else means the data changed under the path; rebuild.
    */
  private def loadSidecar(key: String, expectedK: Int): Option[Array[Array[Double]]] = {
    val p = sidecarPath(key)
    if (!java.nio.file.Files.isRegularFile(p)) None
    else scala.util.Try {
      val lines = java.nio.file.Files.readAllLines(p)
      lines.toArray(Array.empty[String]).filter(_.nonEmpty)
        .map(_.split(',').map(_.toDouble))
    }.toOption.filter(c =>
      c.length == expectedK && c.nonEmpty && c.forall(_.length == c.head.length))
  }

  private def saveSidecar(key: String, cents: Array[Array[Double]]): Unit =
    scala.util.Try {
      val tmp = java.nio.file.Files.createTempFile("graft-ivf", ".tmp")
      val body = cents.map(_.mkString(",")).mkString("\n")
      java.nio.file.Files.write(tmp, body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp, sidecarPath(key),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
}
