package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.{GraftFunctions, VectorFunctions}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication family for training-data pipelines (SURVEY §2.3).
  *
  * Scale design: every near-dup path is LSH-banded so candidate-pair
  * generation is a hash-partitioned equi-join on (band, bucket) — the
  * only shuffle — instead of an O(n²) cross join. Exact dedup is a
  * single hash-aggregate. Verification (Jaccard / Hamming / cosine)
  * runs only on bucket-collision pairs.
  */
object Dedup {

  /** Exact dedup by content hash: one surviving id per text. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select("content_hash", "keep_id", "n_copies")
      .orderBy("keep_id")

  /** Exact dedup on NORMALIZED content: lowercase, trim, collapse
    * whitespace runs — catches formatting-only duplicates (extra
    * spaces, case drift) that byte-exact hashing misses, at the same
    * single-hash-aggregate cost. The standard first-pass between exact
    * and fuzzy dedup in web-corpus pipelines.
    */
  def dedupNormalized(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .groupBy(md5(regexp_replace(lower(trim(col("text"))), "\\s+", " "))
        .as("content_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select("content_hash", "keep_id", "n_copies")
      .orderBy("keep_id")

  /** Word-set Jaccard over MinHash-LSH candidate pairs: candidates
    * come from the banded [[bandedSigs]] signature join (the same
    * generator as [[dedupMinhashLsh]]), then the exact word-set
    * Jaccard verifies each candidate. Unlike length-blocking, this
    * finds unequal-length near-dups (the planted append-a-tail pairs)
    * and candidate generation stays a hash-partitioned equi-join —
    * no quadratic within-block blowup at corpus scale. The DuckDB
    * oracle replicates the FNV-1a/Kirsch–Mitzenmacher signature
    * arithmetic exactly, so the full pipeline is oracle-checked.
    */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val docs = withPlantedNearDups(Tables(spark, dir, "documents"))
    // word sets are materialized BELOW the join (once per doc), not
    // recomputed per candidate pair — at n docs with p pairs that's
    // O(n) tokenizations instead of O(p)
    val d = docs.select(col("doc_id"), wordSet(col("text")).as("ws"))
    minhashCandidates(bandedSigs(docs, "doc_id", "text", k = 32, bands = 8))
      .join(d.select(col("doc_id").as("id_a"), col("ws").as("ws_a")), "id_a")
      .join(d.select(col("doc_id").as("id_b"), col("ws").as("ws_b")), "id_b")
      .withColumn("jaccard", round(
        size(array_intersect(col("ws_a"), col("ws_b"))).cast("double") /
          size(array_union(col("ws_a"), col("ws_b"))).cast("double"), 4))
      .filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b", "jaccard")
      .orderBy("id_a", "id_b")
  }

  /** MinHash plan shared by the session path and the OPTIMIZE-
    * materialized index (graft.minhash.index): k signature components
    * in b bands — both sides must agree or the sidecar would index a
    * different LSH family than the query probes.
    */
  private[graft] val MinhashK = 32
  private[graft] val MinhashBands = 8

  /** Banded signature rows: (id, band, band_hash), b bands of r rows.
    * The k=32 signature comes from the single-pass native
    * [[graft.functions.MinHashSig32]] expression (one FNV hash per
    * shingle + Kirsch–Mitzenmacher mixing).
    */
  private[operators] def bandedSigs(df: DataFrame, idCol: String, textCol: String,
                         k: Int, bands: Int): DataFrame =
    bandKeysFromSig(df.withColumn("__sig", expr(s"graft_minhash32($textCol)")),
      idCol, "__sig", k, bands)

  /** Band keys derived from an ALREADY-computed signature column —
    * the piece [[graft.lake.GraftTable.buildMinhashIndex]] shares, so
    * persisted band keys are bit-identical to session-derived ones.
    */
  private[graft] def bandKeysFromSig(df: DataFrame, idCol: String, sigCol: String,
                         k: Int, bands: Int): DataFrame = {
    val r = k / bands
    val bandCols = array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(lit(b) +: (0 until r).map(i =>
          element_at(col(sigCol), b * r + i + 1)): _*).as("band_hash"))
    }: _*)
    df.select(col(idCol), col(sigCol), explode(bandCols).as("bb"))
      .select(col(idCol), col(sigCol), col("bb.band"), col("bb.band_hash"))
  }

  /** Id offset separating PLANTED near-duplicate variants from their
    * base documents in every planted fixture (text and embedding) —
    * variant id = base id + offset, and attribution joins recover the
    * base by subtracting it. ONE definition: [[withPlantedNearDups]],
    * the embedding fixtures, `Pipeline.pipeCrossDup`'s base-id
    * resolution, and the oracle SQL (spliced from this constant in
    * SparkEntry) must all agree or the planted-pair checks silently
    * miss.
    */
  val PlantedIdOffset = 100000L

  /** Documents plus deterministically-planted near-duplicates (tail
    * tokens appended; id offset +[[PlantedIdOffset]]) — gives the LSH
    * paths known positives to surface in the rows-only checks and
    * specs.
    */
  def withPlantedNearDups(docs: DataFrame, nPlanted: Int = 20,
                          tail: String = " appended near duplicate tail marker"): DataFrame = {
    val variants = docs.filter(col("doc_id") < nPlanted)
      .select((col("doc_id") + PlantedIdOffset).as("doc_id"),
        concat(col("text"), lit(tail)).as("text"))
    docs.select("doc_id", "text").unionByName(variants)
  }

  /** LSH-banded candidate pairs from the k=32/8-band MinHash
    * signature: pairs agreeing on all 4 components of some band.
    * Deduped on ids BEFORE any (wider) verification join so each
    * pair is verified exactly once.
    */
  private def minhashCandidates(sigs: DataFrame): DataFrame = {
    sigs.select(col("doc_id").as("id_a"), col("band"), col("band_hash"))
      .join(sigs.select(col("doc_id").as("id_b"), col("band"), col("band_hash")),
        Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** MinHash+LSH near-dup candidate pairs with estimated Jaccard
    * (fraction of agreeing signature components). Deterministic
    * (FNV-1a + Kirsch–Mitzenmacher, fixed band plan) and replicated
    * arithmetic-for-arithmetic by the DuckDB oracle.
    */
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val k = 32
    GraftFunctions.register(spark)
    val docs = withPlantedNearDups(Tables(spark, dir, "documents"))
    val sigs = bandedSigs(docs, "doc_id", "text", k, bands = 8)
    val pairs = minhashCandidates(sigs)
    val sigTable = sigs.select(col("doc_id"), col("__sig")).distinct()
    pairs
      .join(sigTable.select(col("doc_id").as("id_a"), col("__sig").as("sig_a")), "id_a")
      .join(sigTable.select(col("doc_id").as("id_b"), col("__sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) =>
          x === y), p => p)).cast("double") / k, 4).as("est_jaccard"))
      .filter(col("est_jaccard") >= 0.5)
      .orderBy("id_a", "id_b")
  }

  /** [[dedupMinhashLsh]] over signatures MATERIALIZED at OPTIMIZE
    * time — the 100 TB session shape: the corpus lives in a GraftTable
    * whose `graft.minhash.index` property makes OPTIMIZE persist every
    * row's k=32 MinHash signature (~260 B/doc) and its 8 band keys as
    * parquet sidecars (see [[graft.lake.GraftTable.buildMinhashIndex]]).
    * The dedup query then joins fixed-width BAND rows for candidates
    * and verifies est-Jaccard from the stored signatures — zero
    * re-shingling, no document text in any shuffle, and every dedup
    * run after the first scans ~0.3% of the corpus bytes. Signature
    * and band arithmetic replay the session path over the same rows,
    * so the result is bit-identical to [[dedupMinhashLsh]] and shares
    * its full DuckDB oracle. Staleness contract: the sidecar carries
    * the active file-set fingerprint; any DML invalidates it and the
    * next OPTIMIZE rebuilds.
    */
  def dedupMinhashMaterialized(spark: SparkSession, dir: String): DataFrame = {
    val expected = Tables(spark, dir, "documents").count() + 20
    val docs = withPlantedNearDups(Tables(spark, dir, "documents"))
    val t = Similarity.indexFixture(spark, dir, "mhmat",
      "graft.minhash.index" -> "doc_id,text", expected)(docs)
    // part-union readers: base sidecar plus any incremental delta
    // parts the index accumulated since its last full build
    val bands = t.minhashBands("text")
    val sigs = t.minhashSigs("text")
    val pairs = bands.select(col("id").as("id_a"), col("band"), col("band_hash"))
      .join(bands.select(col("id").as("id_b"), col("band"), col("band_hash")),
        Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    pairs
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) =>
          x === y), p => p)).cast("double") / MinhashK, 4).as("est_jaccard"))
      .filter(col("est_jaccard") >= 0.5)
      .orderBy("id_a", "id_b")
  }

  /** SimHash near-dup: 64-bit signature, 4 tables × 16-bit band keys
    * (65,536 buckets per band — bucket-key cardinality ≥ √n up to
    * n≈4×10⁹, so each band self-join stays ~O(n·√n) instead of the
    * O(n²/256) an 8-bit key collapses to at corpus scale), Hamming ≤ 8
    * verification on collisions. A single-token perturbation moves few
    * bits, so near-dups still agree on all 16 bits of some band.
    * Deterministic; rows-only check.
    */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val docs = withPlantedNearDups(Tables(spark, dir, "documents"), tail = " zq")
      .withColumn("sig", expr("graft_simhash64(text)"))
    val banded = docs.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("band"),
          shiftright(col("sig"), 16 * i).bitwiseAND(lit(0xffffL)).as("band_bits"))): _*))
        .as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band"), col("bb.band_bits"))
    val a = banded.select(col("doc_id").as("id_a"), col("sig").as("sig_a"),
      col("band"), col("band_bits"))
    val b = banded.select(col("doc_id").as("id_b"), col("sig").as("sig_b"),
      col("band"), col("band_bits"))
    a.join(b, Seq("band", "band_bits"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("bit_count(sig_a ^ sig_b)").cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 8)
      .orderBy("id_a", "id_b")
  }

  /** Connected components over the verified Jaccard pairs — the final
    * step of a dedup pipeline: pair lists become groups with one
    * representative (the minimum doc_id in the component) so the keep
    * set is `doc_id == cluster_id`. Distributed min-label propagation:
    * each round every vertex takes the min label among itself and its
    * neighbors (one equi-join + partial-aggregated groupBy per round),
    * converging in O(component diameter) rounds — the GraphX/
    * large-star pattern, no driver-side graph state beyond a scalar
    * convergence count. Oracle: DuckDB recursive CTE over the same
    * pairs.
    */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    // benchmark entry runs the loop for real (and refreshes the shared
    // label fixture); policy consumers reuse the settled labels
    val settled = settledLabels(spark, dir, forceBuild = true)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")
    settled
      .withColumn("cluster_size", count(lit(1)).over(w))
      .orderBy("doc_id")
  }

  /** Near-dup cluster-size DISTRIBUTION (`dedup_cluster_sizes`, D14 —
    * the shape-of-duplication histogram a dedup rollout publishes
    * before picking a keep policy: many 2-doc clusters mean mirror
    * pairs where keep-longest is safe; a few giant clusters mean
    * boilerplate/templates where keeping one doc per cluster deletes
    * real content). Reads the SAME fingerprint-validated settled
    * labels every policy operator consumes (D6's propagation loop is
    * not re-run), rolls up to per-cluster sizes, then to one row per
    * size — output bounded by the largest cluster, all counts exact.
    */
  def dedupClusterSizes(spark: SparkSession, dir: String): DataFrame =
    settledLabels(spark, dir, forceBuild = false)
      .groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
      .withColumn("n_docs", col("cluster_size") * col("n_clusters"))
      .orderBy("cluster_size")

  /** Threshold band profile (D15, `dedup_band_profile` — the report
    * that decides WHERE to set the near-dup threshold before a
    * rollout: how many candidate pairs land in each estimated-Jaccard
    * decile, and how many of those involve a planted known-positive?
    * A threshold band with many pairs but no planted mass is where
    * false positives start deleting real content): one pass over the
    * proven D2 banded pairs (never re-discovered), banded by
    * floor(est·10) — both engines floor the SAME rounded doubles, so
    * the decile is deterministic — and rolled up to ≤6 rows (deciles
    * 5..10; pairs below 0.5 were filtered by D2's own contract).
    */
  def dedupBandProfile(spark: SparkSession, dir: String): DataFrame =
    dedupMinhashLsh(spark, dir)
      .withColumn("band", floor(col("est_jaccard") * 10).cast("long"))
      .withColumn("planted",
        col("id_a") >= PlantedIdOffset || col("id_b") >= PlantedIdOffset)
      .groupBy("band")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("planted"), 1L).otherwise(0L)).as("n_planted"))
      .orderBy("band")

  /** Settled CC labels (doc_id, cluster_id), shared through a
    * fingerprint-validated fixture table: in a real pipeline the
    * clusters frame is computed once and every downstream policy
    * (representative selection, drop lists, audits) reads it — so
    * policy operators must not re-run the whole propagation loop.
    * The fixture stamps count + content hash of the `documents`
    * input; any input change invalidates it, and [[dedupClusters]]
    * always rebuilds (it IS the CC benchmark entry).
    */
  private[operators] def settledLabels(spark: SparkSession, dir: String,
      forceBuild: Boolean): DataFrame = {
    import graft.lake.GraftTable
    val docs = Tables(spark, dir, "documents")
    // 32-bit-masked hashes sum without ANSI overflow up to 2^31 rows
    val fpRow = docs.agg(count(lit(1)).as("n"),
      sum(xxhash64(col("doc_id"), col("text"))
        .bitwiseAND(lit(0xffffffffL))).as("h")).head()
    val fp = s"${fpRow.getLong(0)}:${fpRow.getLong(1)}"
    val path = LakeOps.workDirPath(dir, "cclabels")
    val valid = !forceBuild && GraftTable.isGraftTable(path) &&
      GraftTable.forPath(spark, path).snapshot.metadata
        .exists(_.properties.get("graft.cc.fingerprint").contains(fp))
    if (!valid) {
      val settled = propagateLabels(spark, dir)
      GraftTable.create(spark, LakeOps.workDir(dir, "cclabels"), settled,
        properties = Map("graft.cc.fingerprint" -> fp))
    }
    GraftTable.forPath(spark, path).toDF
  }

  private def propagateLabels(spark: SparkSession, dir: String): DataFrame = {
    val pairs = dedupNgramJaccard(spark, dir).select("id_a", "id_b")
    val edges = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
      .unionAll(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
      .cache()
    // every round references `labels` twice (self + neighbor side), so
    // without lineage truncation the logical plan doubles per round and
    // OOMs the driver once components need 10+ rounds — each iteration
    // therefore materializes to a plan leaf via eager localCheckpoint
    var labels = edges.select(col("u").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint(true)
    // per-round cost is shuffle overhead, not data: size the shuffle
    // to the vertex count (1 partition per 500k vertices, capped);
    // AQE coalesces the loop joins' post-shuffle partitions, so the
    // session shuffle width is left alone (mutating it is a
    // session-global race against any concurrent query)
    val nV = labels.count()
    val parts = math.max(1, math.min(200, (nV / 500000L).toInt + 1))
    val e = edges.repartition(parts, col("v")).cache()
    e.count()
    edges.unpersist()
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 50) {
      val nbrMin = e
        .join(labels.select(col("id").as("v"), col("label").as("lv")), "v")
        .groupBy("u").agg(min("lv").as("nbr_min"))
      val prop = labels
        .join(nbrMin.select(col("u").as("id"), col("nbr_min")), Seq("id"), "left")
        .select(col("id"), col("label").as("old_label"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
      // pointer jumping (path compression): follow my new label to ITS
      // label — converges in O(log diameter) rounds instead of O(diameter)
      val next = prop
        .join(prop.select(col("id").as("label"), col("label").as("ll")),
          Seq("label"), "left")
        .select(col("id"), col("old_label"),
          coalesce(col("ll"), col("label")).as("label"))
        .localCheckpoint(true)
      changed = next.filter(col("label") =!= col("old_label")).count()
      labels = next.select("id", "label")
      rounds += 1
    }
    val settled = labels
    e.unpersist()
    settled.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Cluster-representative selection: collapse each near-dup cluster
    * ([[dedupClusters]]) to its LONGEST member (ties → lowest doc_id)
    * — the standard "keep the most complete copy" policy a dedup
    * pipeline applies before dropping the rest (truncated/mirrored
    * variants lose to the original).
    *
    * Scale shape: the row_number window partitions on cluster_id and
    * the following per-cluster aggregate groups on the SAME key, so
    * the representative pick and the member count ride one shuffle;
    * cluster sizes are near-dup-bounded (≪ corpus), never skewed to a
    * single reducer.
    */
  def dedupKeepLongest(spark: SparkSession, dir: String): DataFrame = {
    // reads the shared settled-label fixture: the bench entry times the
    // policy window over the clusters, not a second propagation loop
    val cl = settledLabels(spark, dir, forceBuild = false)
      .select("doc_id", "cluster_id")
    val len = Tables(spark, dir, "documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")
      .orderBy(col("n_chars").desc, col("doc_id"))
    cl.join(len, "doc_id")
      .withColumn("rn", row_number().over(w))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"),
        max(when(col("rn") === 1, col("doc_id"))).as("rep_doc_id"),
        max(when(col("rn") === 1, col("n_chars"))).as("rep_chars"))
      .orderBy("cluster_id")
  }

  /** Embedding cosine near-dup via random-hyperplane LSH buckets +
    * cosine verification. Planted near-identical vectors (+0.05 on
    * dim 0, id offset +100000). Deterministic; rows-only check.
    */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings").select("vec_id", "embedding")
    val variants = emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + PlantedIdOffset).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i === 0, x + lit(0.05f)).otherwise(x)).as("embedding"))
    val all = emb.unionByName(variants)
      .withColumn("sig", VectorFunctions.hyperplaneSig(col("embedding"),
        VectorFunctions.planes(64, 64)))
    // banded buckets (4 bands × 16 bits = 65,536 buckets per band —
    // bucket-key cardinality ≥ √n up to n≈4×10⁹, so each band join
    // stays ~O(n·√n) instead of collapsing toward all-pairs): a
    // cos≥0.99 pair flips only marginal hyperplane bits (P(flip) ≈
    // θ/π ≈ 4.5% per plane), so it still matches all 16 bits of some
    // band — verified against the planted pairs at every sf
    val banded = all.select(col("vec_id"), col("embedding"),
      explode(array((0 until 4).map(i => struct(lit(i).as("band"),
        shiftright(col("sig"), 16 * i).bitwiseAND(lit(0xffffL)).as("bits"))): _*)).as("bb"))
      .select(col("vec_id"), col("embedding"), col("bb.band"), col("bb.bits"))
    val a = banded.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"),
      col("band"), col("bits"))
    val b = banded.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"),
      col("band"), col("bits"))
    a.join(b, Seq("band", "bits"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "emb_a", "emb_b").distinct()
      .withColumn("cos", round(VectorFunctions.cosine(col("emb_a"), col("emb_b")), 4))
      .filter(col("cos") >= 0.99)
      .select("id_a", "id_b", "cos")
      .orderBy("id_a", "id_b")
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023): cluster the
    * corpus with the table's coarse quantizer ([[IvfIndex]] medoids —
    * built once per table, the same index the IVF ANN path uses), then
    * compare embeddings pairwise ONLY within a cluster and report
    * pairs with cosine ≥ 0.99 (keep-lowest-id policy is then a trivial
    * `id_b` drop). Candidate generation is an equi-join on the cluster
    * id — with k ≈ 8√n centroids the expected cluster size is ~√n/8,
    * so the within-cluster self-join is ~O(n·√n), never all-pairs,
    * and the cluster assignment itself is one codegen'd map over the
    * scan. Planted near-identical vectors (+0.05 on dim 0, id offset
    * +100000) give known positives; pairs split across cluster
    * boundaries are out of scope BY DESIGN (the SemDeDup recall
    * trade), and the DuckDB oracle replays the identical medoid
    * assignment so both engines agree on scope exactly.
    */
  /** Planted near-identical vectors shared by the session and
    * index-backed SemDeDup variants (+0.05 on dim 0, id offset
    * +100000).
    */
  private def semanticVariants(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + PlantedIdOffset).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i === 0, x + lit(0.05f)).otherwise(x)).as("embedding"))

  def dedupSemantic(spark: SparkSession, dir: String): DataFrame = {
    val cents = IvfIndex.centroids(spark, dir)
    val emb = Tables(spark, dir, "embeddings").select("vec_id", "embedding")
    val all = emb.unionByName(semanticVariants(emb))
      .withColumn("cluster",
        element_at(VectorFunctions.topCentroidIds(col("embedding"), cents, 1), 1)
          .cast("long"))
    val a = all.select(col("cluster"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"))
    val b = all.select(col("cluster"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"))
    a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(VectorFunctions.cosine(col("emb_a"), col("emb_b")), 4))
      .filter(col("cos") >= 0.99)
      .select("cluster", "id_a", "id_b", "cos")
      .orderBy("id_a", "id_b")
  }

  /** SemDeDup over the L59 OPTIMIZE-materialized IVF index: the
    * corpus-plus-variants frame lives in a GraftTable whose
    * `graft.ivf.index` property persists Lloyd-refined centroids and
    * every row's cluster assignments at OPTIMIZE; the dedup pass then
    * reads 12-byte assignment rows (rr = 1 → top-1 cluster) instead
    * of re-scoring embeddings per session — repeat semantic-dedup
    * sweeps on a 100 TB corpus scan the index sidecar, not the
    * vectors, until the exact-cosine verify on same-cluster pairs.
    */
  def dedupSemanticMaterialized(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings").select("vec_id", "embedding")
    val expected = emb.count() + 20
    val t = Similarity.indexFixture(spark, dir, "semidx",
      "graft.ivf.index" -> "vec_id,embedding", expected)(
      emb.unionByName(semanticVariants(emb)))
    val top1 = t.ivfAssignments("embedding").filter(col("rr") === 1)
      .select(col("id").as("vec_id"), col("cluster").cast("long").as("cluster"))
    val vecs = t.toDF.select("vec_id", "embedding")
    val withCl = top1.join(vecs, "vec_id")
    val a = withCl.select(col("cluster"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"))
    val b = withCl.select(col("cluster"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"))
    a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(VectorFunctions.cosine(col("emb_a"), col("emb_b")), 4))
      .filter(col("cos") >= 0.99)
      .select("cluster", "id_a", "id_b", "cos")
      .orderBy("id_a", "id_b")
  }

  /** Substring-level exact dedup (the goal of Lee et al. 2021's
    * suffix-array dedup, re-expressed as a distributed fingerprint
    * join): md5 fingerprints of fixed 60-char windows at stride 20 —
    * two documents sharing ≥2 distinct window fingerprints contain
    * verbatim-copied spans even when the documents as wholes are not
    * near-duplicates. Windows appearing in >32 documents are dropped
    * before the self-join (the same frequency cut LSH banding relies
    * on), so no boilerplate fingerprint can blow a join bucket up
    * quadratically at corpus scale; everything else is hash-partitioned
    * equi-join work. substr/md5 arithmetic is engine-portable, so the
    * DuckDB oracle replays the exact window set.
    */
  def dedupSubstring(spark: SparkSession, dir: String): DataFrame = {
    val w = 60
    val stride = 20
    val wins = Tables(spark, dir, "documents")
      .filter(length(col("text")) >= w)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, length(text)-${w - 1}, $stride), " +
          s"p -> md5(cast(substring(text, p, $w) as binary)))")).as("h"))
      .distinct()
    val rare = wins.groupBy("h").agg(count(lit(1)).as("nf"))
      .filter(col("nf") <= 32).select("h")
    val w2 = wins.join(rare, Seq("h"))
    val left = w2.select(col("h"), col("doc_id").as("doc_a"))
    val right = w2.select(col("h"), col("doc_id").as("doc_b"))
    left.join(right, Seq("h"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
      .orderBy("doc_a", "doc_b")
  }
}
