package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.5): media payloads are
  * opaque `binary` columns with typed metadata structs. Image (BMP)
  * and audio (WAV) payloads carry REAL container headers built and
  * parsed byte-for-byte by [[graft.functions.MediaCodec]] — the
  * metadata-decode step reads the header's little-endian fields, not
  * side information. Only pixel/PCM *content* interpretation (frame
  * decode, resampling) remains out of scope for this container
  * (no codec libraries), stubbed behind [[Multimodal.decodeStub]] /
  * [[Multimodal.embedStub]].
  */
object Multimodal {

  /** Typed metadata produced by the decoder. */
  case class DecodedMeta(doc_id: Long, n_bytes: Long, width: Int,
                         height: Int, n_frames: Int)

  /** STUB content decoder for formats without a parseable header —
    * replace with a real codec (e.g. javax.imageio / ffmpeg bindings)
    * in a deployment that ships codecs. Deterministic pure function of
    * the payload so tests and oracles are stable.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    ((n % 640) + 1, ((n * 7) % 480) + 1, (n % 16) + 1)
  }

  private def ge = graft.lake.GraftExpr

  /** Even docs become BMP images, odd docs 8-bit mono WAV audio —
    * both with genuine headers wrapping the doc bytes as content.
    */
  private def mediaKind = when(col("doc_id") % 2 === 0, lit("bmp"))
    .otherwise(lit("wav"))

  private def mediaPayload = ge.column(graft.functions.MakeMediaPayload(
    ge.expression(col("text").cast("binary")), ge.expression(mediaKind)))

  /** Documents as a multimodal table: binary payload + typed meta. */
  def payloadTable(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents").select(
      col("doc_id"),
      mediaPayload.as("payload"),
      struct(
        when(col("doc_id") % 2 === 0, lit("image/bmp"))
          .otherwise(lit("audio/x-wav")).as("mime"),
        (octet_length(col("text")).cast("long") +
          when(col("doc_id") % 2 === 0, lit(54L)).otherwise(lit(44L)))
          .as("n_bytes")).as("meta"))

  /** Metadata extraction (oracle-checked): build a real container
    * payload, then PARSE its header — width/height/sample_rate come
    * from the payload's own bytes via the native
    * [[graft.functions.DecodeMedia]] expression, codegen end-to-end.
    * The oracle reproduces the builder's derivation arithmetic, so a
    * green row proves parse(build(x)) round-trips through real bytes.
    */
  def mmDecodeMeta(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .withColumn("payload", mediaPayload)
      .withColumn("m", ge.column(graft.functions.DecodeMedia(
        ge.expression(col("payload")))))
      .select(
        col("doc_id"),
        col("m.format").as("format"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        col("m.width").as("width"),
        col("m.height").as("height"),
        col("m.sample_rate").as("sample_rate"),
        col("m.n_samples").as("n_samples"),
        md5(col("text").cast("binary")).as("checksum"))
      .orderBy("doc_id")

  /** PNG parse round-trip (oracle-checked): every doc wraps as a real
    * PNG container — big-endian chunk framing, CRC32-verified IHDR,
    * content in an IDAT chunk — and the geometry AND content stats
    * are read back from the payload's own bytes: width/height from
    * IHDR, the byte fold over the span the IDAT chunk walk locates.
    * A corrupt IHDR CRC degrades to "raw" (spec'd in MultimodalSpec),
    * so geometry is never trusted from an unverified header.
    */
  def mmPngMeta(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .withColumn("payload", ge.column(graft.functions.MakeMediaPayload(
        ge.expression(col("text").cast("binary")), ge.expression(lit("png")))))
      .withColumn("m", ge.column(graft.functions.DecodeMedia(
        ge.expression(col("payload")))))
      .withColumn("s", ge.column(graft.functions.MediaContentStats(
        ge.expression(col("payload")))))
      .select(
        col("doc_id"),
        col("m.format").as("format"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        col("m.width").as("width"),
        col("m.height").as("height"),
        col("s.n_content").as("n_content"),
        col("s.byte_sum").as("byte_sum"))
      .orderBy("doc_id")

  /** Audio feature extraction (oracle-checked): WAV payloads parse
    * their data chunk and emit exact-integer DSP features — sample
    * count, integer mean, mean-crossing count, absolute-delta sum —
    * in one codegen'd [[graft.functions.MediaAudioFeatures]] pass.
    * The real spectral featurizer would slot in at this seam with
    * the same (payload → feature struct) shape.
    */
  def mmAudioFeatures(spark: SparkSession, dir: String): DataFrame =
    payloadTable(spark, dir)
      .filter(col("doc_id") % 2 === 1)
      .withColumn("f", ge.column(graft.functions.MediaAudioFeatures(
        ge.expression(col("payload")))))
      .select(col("doc_id"), col("f.n_samples").as("n_samples"),
        col("f.mean_b").as("mean_b"),
        col("f.n_mean_cross").as("n_mean_cross"),
        col("f.sum_abs_delta").as("sum_abs_delta"))
      .orderBy("doc_id")

  /** Frame sampling plan (oracle-checked): every payload reports a
    * stubbed frame count; up to [[MaxSampledFrames]] frames are picked
    * evenly across the clip (`floor(i * n_frames / k)` — the standard
    * uniform temporal sampling a video pipeline uses) and exploded to
    * one row per sampled frame. The explode + per-frame checksum runs
    * entirely in codegen; the real decoder would slot in at the
    * `frame_checksum` step, keyed by (payload, frame_idx).
    */
  val MaxSampledFrames = 4

  def mmFrameSample(spark: SparkSession, dir: String): DataFrame = {
    val nb = octet_length(col("text")).cast("long")
    val nFrames = (nb % 16 + 1).as("n_frames")
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), nb.as("n_bytes"), nFrames)
      .withColumn("k", least(col("n_frames"), lit(MaxSampledFrames.toLong)))
      .withColumn("i", explode(sequence(lit(0L), col("k") - 1)))
      .select(
        col("doc_id"),
        col("n_frames"),
        floor(col("i") * col("n_frames") / col("k")).as("frame_idx"),
        md5(concat(col("text"), lit(":"), floor(col("i") * col("n_frames") / col("k")))
          .cast("binary")).as("frame_checksum"))
      .orderBy("doc_id", "frame_idx")
  }

  /** Resize planning (oracle-checked): aspect-preserving fit into a
    * 224×224 target of dimensions PARSED from the image payloads'
    * real BMP headers — the geometry step of an image pipeline (the
    * pixel resample itself is the codec stub's job). Audio payloads
    * have no geometry, so the plan covers the image half of the table.
    */
  def mmResizePlan(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "documents")
      .filter(col("doc_id") % 2 === 0)
      .withColumn("payload", mediaPayload)
      .withColumn("m", ge.column(graft.functions.DecodeMedia(
        ge.expression(col("payload")))))
      .select(col("doc_id"), col("m.width").as("width"),
        col("m.height").as("height"))
      .withColumn("scale",
        least(lit(224.0) / col("width"), least(lit(224.0) / col("height"), lit(1.0))))
      .select(
        col("doc_id"), col("width"), col("height"),
        greatest(floor(col("width") * col("scale")), lit(1L)).as("out_w"),
        greatest(floor(col("height") * col("scale")), lit(1L)).as("out_h"))
      .orderBy("doc_id")
  }

  /** ViT patch-grid plan (oracle-checked): the standard vision-
    * transformer preprocessing cut — a [[PatchSize]]×[[PatchSize]]
    * grid over the geometry decoded from the payload's OWN BMP
    * header, one row per planned patch with pixel offsets and
    * edge-clamped extents (the right-most/bottom-most patches
    * shrink). Row-major patch ids; total patch count exact per image;
    * the per-image explode is capped at [[MaxPlannedPatches]] rows for
    * the plan view (the real pixel-extract would consume `n_patches`
    * in full, keyed by (payload, x0, y0)). Integer arithmetic
    * end-to-end, so the DuckDB oracle replays it exactly.
    */
  val PatchSize = 16
  val MaxPlannedPatches = 8

  def mmPatchGrid(spark: SparkSession, dir: String): DataFrame = {
    val p = PatchSize
    Tables(spark, dir, "documents")
      .filter(col("doc_id") % 2 === 0)
      .withColumn("payload", mediaPayload)
      .withColumn("m", ge.column(graft.functions.DecodeMedia(
        ge.expression(col("payload")))))
      .select(col("doc_id"), col("m.width").cast("long").as("width"),
        col("m.height").cast("long").as("height"))
      .withColumn("grid_cols", expr(s"(width + ${p - 1}) div $p"))
      .withColumn("grid_rows", expr(s"(height + ${p - 1}) div $p"))
      .withColumn("n_patches", col("grid_cols") * col("grid_rows"))
      .withColumn("patch_id", explode(sequence(lit(0L),
        least(col("n_patches") - 1, lit(MaxPlannedPatches - 1L)))))
      .withColumn("px", col("patch_id") % col("grid_cols"))
      .withColumn("py", expr("patch_id div grid_cols"))
      .withColumn("x0", col("px") * p)
      .withColumn("y0", col("py") * p)
      .select(col("doc_id"), col("width"), col("height"),
        col("n_patches"), col("patch_id"), col("x0"), col("y0"),
        least(lit(p.toLong), col("width") - col("x0")).as("pw"),
        least(lit(p.toLong), col("height") - col("y0")).as("ph"))
      .orderBy("doc_id", "patch_id")
  }

  /** Audio windowing plan (oracle-checked): stub audio metadata
    * (sample rate from payload bytes, duration from byte count) cut
    * into fixed 400-sample windows at a 160-sample hop — the
    * frame/hop shape an ASR/audio-tokenizer front-end consumes —
    * exploded to one row per window (capped for the plan view). The
    * real PCM decode would slot in at `window_checksum`, keyed by
    * (payload, window start).
    */
  val MaxPlannedWindows = 6

  def mmAudioWindow(spark: SparkSession, dir: String): DataFrame = {
    val nb = octet_length(col("text")).cast("long")
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), nb.as("n_bytes"),
        // stub: 8k/16k/32k sample rate, 50 "samples" per payload byte
        (lit(8000L) * when(nb % 3 === 0, 1L)
          .when(nb % 3 === 1, 2L).otherwise(4L)).as("sample_rate"),
        (nb * 50).as("n_samples"))
      .withColumn("n_windows",
        greatest(floor((col("n_samples") - 400) / 160) + 1, lit(0L)))
      .withColumn("k", least(col("n_windows"), lit(MaxPlannedWindows.toLong)))
      .filter(col("k") > 0)
      .withColumn("i", explode(sequence(lit(0L), col("k") - 1)))
      .select(
        col("doc_id"), col("sample_rate"), col("n_samples"), col("n_windows"),
        (col("i") * 160).as("win_start"),
        md5(concat(col("text"), lit("@"), col("i") * 160).cast("binary"))
          .as("window_checksum"))
      .orderBy("doc_id", "win_start")
  }

  /** Energy segmentation (M12, oracle-checked): the VAD-gate /
    * busy-region step between decode and feature extraction — the
    * content span splits into 16 equal index-span cells, each cell's
    * exact Σb² energy compares to the uniform share by cross
    * multiplication (no float division anywhere), and the payload
    * reports its above-average cell count plus the peak cell with its
    * integer score. Runs over EVERY payload kind through the same
    * header-located content span (audio: where the signal is; image:
    * where the busy region is). One codegen'd pass per payload.
    */
  def mmEnergySegments(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .filter(length(col("text")) > 0)
      .withColumn("payload", mediaPayload)
      .withColumn("e", ge.column(graft.functions.MediaEnergySegments(
        ge.expression(col("payload")))))
      .select(col("doc_id"),
        col("e.n_content").as("n_content"),
        col("e.n_cells").as("n_cells"),
        col("e.n_loud").as("n_loud"),
        col("e.peak_cell").as("peak_cell"),
        col("e.peak_score").as("peak_score"))
      .orderBy("doc_id")

  /** Content decode (oracle-checked): byte statistics of the pixel
    * array / PCM samples located by the payload's OWN header fields —
    * the native [[graft.functions.MediaContentStats]] expression walks
    * the BMP pixel-offset field or the RIFF data chunk and folds
    * count/sum/sum-of-squares/min/max over the content bytes in exact
    * integer arithmetic (sumsq is the RMS/energy numerator an audio
    * gate thresholds on; min==max flags constant-color/silent
    * payloads). The oracle recomputes the same stats from the source
    * bytes the builder wrapped, so a green row proves the parser
    * addressed exactly the content span through real headers.
    */
  def mmContentStats(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .withColumn("payload", mediaPayload)
      .withColumn("s", ge.column(graft.functions.MediaContentStats(
        ge.expression(col("payload")))))
      .select(
        col("doc_id"),
        col("s.format").as("format"),
        col("s.n_content").as("n_content"),
        col("s.byte_sum").as("byte_sum"),
        col("s.byte_sumsq").as("byte_sumsq"),
        col("s.min_byte").as("min_byte"),
        col("s.max_byte").as("max_byte"))
      .orderBy("doc_id")

  /** Perceptual near-duplicate image dedup (M9): every doc becomes a
    * real BMP payload, the codegen'd [[graft.functions.MediaAHash64]]
    * kernel fingerprints the decoded content span (64-cell integer
    * average hash), and near-identical images surface through the
    * SimHash banding shape — 4 bands × 16 bits bucket candidates,
    * exact Hamming distance (`bit_count(xor)`) verifies ≤ 6. Planted
    * copies OVERWRITE their last 10 bytes (same length — cell
    * boundaries don't move, only trailing cells can flip), landing
    * within the radius while unrelated docs don't.
    *
    * Scale: hashing is one pass over each payload; the band join
    * ships (band, 16-bit key, doc_id) rows only — the SimHash-dedup
    * cost shape, applied to decoded media instead of text.
    */
  def mmPhashDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
    val base = docs
      .unionAll(docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text").substr(lit(1), length(col("text")) - 10),
            lit("XXXXXXXXXX")).as("text")))
      .filter(length(col("text")) >= 64)
    val hashed = base
      .withColumn("payload", ge.column(graft.functions.MakeMediaPayload(
        ge.expression(col("text").cast("binary")), ge.expression(lit("bmp")))))
      .withColumn("h", ge.column(graft.functions.MediaAHash64(
        ge.expression(col("payload")))))
      .select("doc_id", "h")
    val bands = hashed.select(col("doc_id"), col("h"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("h"), b * 16).bitwiseAND(lit(0xffffL)).as("key"))): _*))
          .as("bk"))
      .select(col("doc_id"), col("h"), col("bk.band"), col("bk.key"))
    val cand = bands.select(col("band"), col("key"),
        col("doc_id").as("id_a"), col("h").as("ha"))
      .join(bands.select(col("band"), col("key"),
        col("doc_id").as("id_b"), col("h").as("hb")), Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "ha", "hb").distinct()
    cand
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("hamming") <= 6)
      .select("id_a", "id_b", "hamming")
      .orderBy("id_a", "id_b")
  }

  /** STUB feature extractor: a deterministic 16-dim embedding from
    * payload bytes (byte histogram folded by FNV mixing). A real
    * deployment swaps in a vision/audio encoder here; everything
    * downstream (normalization, ANN search) is unchanged.
    */
  def embedStub(payload: Array[Byte], dim: Int = 16): Array[Float] = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      val h = (payload(i) & 0xff) * 0x9E3779B1
      acc(math.floorMod(h, dim)) += 1f
      i += 1
    }
    val norm = math.sqrt(acc.map(x => x.toDouble * x).sum).toFloat max 1e-6f
    acc.map(_ / norm)
  }

  /** Payload → embedding batches via `mapPartitions` (per-task encoder
    * init amortized over the batch) — the bridge from multimodal
    * payloads into the §2.4 similarity/ANN operators.
    */
  def payloadEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    payloadTable(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition encoder init would happen here
        it.map { case (id, payload) => (id, embedStub(payload)) }
      }
      .toDF("doc_id", "embedding")
  }

  /** Batched decode over partitions — the shape a real decoder needs
    * (amortized per-batch codec init, no per-row JNI churn). Headers
    * are parsed for real by [[graft.functions.MediaCodec]]; only
    * unknown formats fall back to the stub. Exercised by
    * MultimodalSpec against the expression-side parse.
    */
  def decodeFrames(spark: SparkSession, dir: String): Dataset[DecodedMeta] = {
    import spark.implicits._
    payloadTable(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition (per-task) decoder init would happen here
        it.map { case (id, payload) =>
          val m = graft.functions.MediaCodec.decode(payload)
          val (w, h, f) = m.format match {
            case "bmp" => (m.width.toInt, m.height.toInt, 1)
            case "wav" => // floorDiv: plain / truncates toward zero and
              // yields a phantom window for 241..399-sample clips
              (0, 0, math.max(0L, Math.floorDiv(m.nSamples - 400, 160L) + 1).toInt)
            case _ => decodeStub(payload)
          }
          DecodedMeta(id, payload.length.toLong, w, h, f)
        }
      }
  }
}
