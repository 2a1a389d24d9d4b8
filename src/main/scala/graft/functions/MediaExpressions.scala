package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Dependency-free media container codec: BMP (54-byte
  * BITMAPINFOHEADER) and WAV (RIFF/fmt/data) headers are built and
  * parsed byte-for-byte — no codec libraries exist in this
  * environment, but header geometry/sample metadata is plain binary
  * layout, so the "decode metadata" step of the multimodal pipeline
  * can be genuinely real: the parser reads little-endian fields from
  * the payload, never recomputing them from side information.
  * Payloads with neither magic fall back to the deterministic stub
  * arithmetic (format "raw") so opaque binaries still flow.
  */
object MediaCodec {

  final case class MediaMeta(format: String, width: Long, height: Long,
                             sampleRate: Long, nSamples: Long)

  private def le16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def le32(b: Array[Byte], off: Int, v: Int): Unit = {
    le16(b, off, v & 0xffff); le16(b, off + 2, (v >>> 16) & 0xffff)
  }
  private[functions] def readLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private[functions] def readLe32(b: Array[Byte], off: Int): Int =
    readLe16(b, off) | (readLe16(b, off + 2) << 16)

  // PNG fields are big-endian (ISO/IEC 15948 §5.2)
  private def be32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = ((v >>> 24) & 0xff).toByte; b(off + 1) = ((v >>> 16) & 0xff).toByte
    b(off + 2) = ((v >>> 8) & 0xff).toByte; b(off + 3) = (v & 0xff).toByte
  }
  private[functions] def readBe32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def crc32(b: Array[Byte], off: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32()
    c.update(b, off, len)
    c.getValue
  }

  /** A real PNG container: signature + IHDR (8-bit RGB, real CRC32
    * over type+data per chunk) + one IDAT carrying `content` + IEND.
    * The pixel stream isn't zlib-framed — the decode step reads only
    * the chunk structure and IHDR fields, never inflates — but every
    * offset, length, and CRC is the genuine wire layout, so the
    * parser is exercised against real binary framing.
    */
  def makePng(width: Int, height: Int, content: Array[Byte]): Array[Byte] = {
    val b = new Array[Byte](57 + content.length)
    System.arraycopy(PngSig, 0, b, 0, 8)
    be32(b, 8, 13)                         // IHDR length
    b(12) = 'I'; b(13) = 'H'; b(14) = 'D'; b(15) = 'R'
    be32(b, 16, width)
    be32(b, 20, height)
    b(24) = 8                              // bit depth
    b(25) = 2                              // color type: truecolor
    // compression(26)/filter(27)/interlace(28) stay 0
    be32(b, 29, crc32(b, 12, 17).toInt)    // CRC over type + data
    val idat = 33
    be32(b, idat, content.length)
    b(idat + 4) = 'I'; b(idat + 5) = 'D'; b(idat + 6) = 'A'; b(idat + 7) = 'T'
    System.arraycopy(content, 0, b, idat + 8, content.length)
    be32(b, idat + 8 + content.length, crc32(b, idat + 4, 4 + content.length).toInt)
    val iend = idat + 12 + content.length
    be32(b, iend, 0)
    b(iend + 4) = 'I'; b(iend + 5) = 'E'; b(iend + 6) = 'N'; b(iend + 7) = 'D'
    be32(b, iend + 8, crc32(b, iend + 4, 4).toInt)
    b
  }

  private[functions] def isPng(p: Array[Byte]): Boolean =
    p.length >= 33 && (0 until 8).forall(i => p(i) == PngSig(i))

  /** Offset+length of the first IDAT chunk's data, or (0, 0). The
    * same hostile-size discipline as the RIFF walk: lengths step in
    * Long and any chunk running past the buffer stops the walk.
    */
  private[functions] def pngIdatSpan(p: Array[Byte]): (Int, Int) = {
    val n = p.length
    var off = 8L
    while (off + 8 <= n) {
      val o = off.toInt
      val size = readBe32(p, o).toLong & 0xffffffffL
      val id = new String(p, o + 4, 4, "US-ASCII")
      if (id == "IDAT") {
        val dOff = math.min(off + 8, n.toLong).toInt
        return (dOff, math.min(size, (n - dOff).toLong).toInt)
      }
      val step = 12L + size // length + type + data + CRC
      if (off + step > n || id == "IEND") return (0, 0)
      off += step
    }
    (0, 0)
  }

  /** A real BMP: 14-byte file header + 40-byte BITMAPINFOHEADER,
    * `pixels` appended as the (possibly truncated) 24bpp pixel data.
    */
  def makeBmp(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    val b = new Array[Byte](54 + pixels.length)
    b(0) = 'B'; b(1) = 'M'
    le32(b, 2, 54 + pixels.length) // file size
    le32(b, 10, 54)                // pixel data offset
    le32(b, 14, 40)                // DIB header size
    le32(b, 18, width)
    le32(b, 22, height)
    le16(b, 26, 1)                 // planes
    le16(b, 28, 24)                // bits per pixel
    le32(b, 34, pixels.length)     // image size
    le32(b, 38, 2835); le32(b, 42, 2835) // 72 DPI
    System.arraycopy(pixels, 0, b, 54, pixels.length)
    b
  }

  /** A real PCM WAV: RIFF/WAVE + fmt (mono, 8-bit) + data chunks. */
  def makeWav(sampleRate: Int, data: Array[Byte]): Array[Byte] = {
    val b = new Array[Byte](44 + data.length)
    b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
    le32(b, 4, 36 + data.length)
    b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
    b(12) = 'f'; b(13) = 'm'; b(14) = 't'; b(15) = ' '
    le32(b, 16, 16)           // fmt chunk size
    le16(b, 20, 1)            // PCM
    le16(b, 22, 1)            // mono
    le32(b, 24, sampleRate)
    le32(b, 28, sampleRate)   // byte rate = rate * blockAlign(1)
    le16(b, 32, 1)            // block align
    le16(b, 34, 8)            // bits per sample
    b(36) = 'd'; b(37) = 'a'; b(38) = 't'; b(39) = 'a'
    le32(b, 40, data.length)
    System.arraycopy(data, 0, b, 44, data.length)
    b
  }

  /** Sniff + parse. Every emitted field comes from the payload bytes
    * themselves; unknown formats get the legacy deterministic stub
    * dimensions so opaque payloads keep flowing through the pipeline.
    */
  def decode(payload: Array[Byte]): MediaMeta = {
    val n = payload.length
    if (n >= 54 && payload(0) == 'B' && payload(1) == 'M') {
      val w = readLe32(payload, 18)
      val h = readLe32(payload, 22)
      // negative height = top-down row order; geometry is |h|
      MediaMeta("bmp", math.abs(w.toLong), math.abs(h.toLong), 0L, 0L)
    } else if (n >= 44 && payload(0) == 'R' && payload(1) == 'I' &&
        payload(2) == 'F' && payload(3) == 'F' &&
        payload(8) == 'W' && payload(9) == 'A' &&
        payload(10) == 'V' && payload(11) == 'E') {
      // chunk walk (fmt/data in any order, unknown chunks skipped).
      // Sizes are untrusted: step in Long and stop on any chunk whose
      // declared size runs past the buffer — a hostile 0xFFFFFFF8 size
      // narrowed to Int would otherwise stall the loop (off += 0) and
      // hang the scan task on one malformed row.
      var off = 12L
      var rate = 0L; var blockAlign = 1L; var dataSize = 0L
      var walking = true
      while (walking && off + 8 <= n) {
        val o = off.toInt
        val id = new String(payload, o, 4, "US-ASCII")
        val size = readLe32(payload, o + 4).toLong & 0xffffffffL
        if (id == "fmt " && off + 8 + 16 <= n) {
          rate = readLe32(payload, o + 12).toLong & 0xffffffffL
          blockAlign = math.max(1, readLe16(payload, o + 20)).toLong
        } else if (id == "data") {
          dataSize = size
        }
        val step = 8L + size + (size & 1L) // chunks are 2-aligned
        if (off + step > n) walking = false // truncated/corrupt tail
        else off += step
      }
      MediaMeta("wav", 0L, 0L, rate, dataSize / blockAlign)
    } else if (isPng(payload)) {
      // IHDR must be the first chunk (spec §11.2.2) and its CRC must
      // verify — a corrupt header falls through to "raw" rather than
      // emitting garbage geometry
      val len = readBe32(payload, 8)
      val typeOk = payload(12) == 'I' && payload(13) == 'H' &&
        payload(14) == 'D' && payload(15) == 'R'
      if (typeOk && len == 13 && {
        val c = new java.util.zip.CRC32()
        c.update(payload, 12, 17)
        c.getValue == (readBe32(payload, 29).toLong & 0xffffffffL)
      }) {
        val w = readBe32(payload, 16).toLong & 0xffffffffL
        val h = readBe32(payload, 20).toLong & 0xffffffffL
        MediaMeta("png", w, h, 0L, 0L)
      } else MediaMeta("raw", (n % 640) + 1L, ((n.toLong * 7) % 480) + 1L, 0L, 0L)
    } else {
      MediaMeta("raw", (n % 640) + 1L, ((n.toLong * 7) % 480) + 1L, 0L, 0L)
    }
  }
}

/** Build a real media payload around `content` bytes: kind "bmp"
  * wraps them as pixel data under a header whose geometry derives
  * deterministically from the byte count; kind "wav" wraps them as
  * 8-bit mono PCM at a byte-count-derived sample rate. The table
  * builder for multimodal tests/oracles — the DECODE side never sees
  * the derivation, only the bytes.
  */
case class MakeMediaPayload(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(content: Any, kind: Any): Any =
    MakeMediaPayload.kernel(content.asInstanceOf[Array[Byte]], kind.toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, k) =>
      s"graft.functions.MakeMediaPayload.kernel($c, $k.toString())")
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : MakeMediaPayload = copy(left = l, right = r)
}

object MakeMediaPayload {
  def kernel(content: Array[Byte], kind: String): Array[Byte] = {
    val nb = content.length
    kind match {
      case "bmp" =>
        MediaCodec.makeBmp((nb % 640) + 1, ((nb * 7) % 480) + 1, content)
      case "wav" =>
        MediaCodec.makeWav(8000 << (nb % 3), content)
      case "png" =>
        MediaCodec.makePng((nb % 640) + 1, ((nb * 7) % 480) + 1, content)
      case other =>
        throw new IllegalArgumentException(s"unknown media kind: $other")
    }
  }
}

/** Parse media metadata out of a binary payload (see [[MediaCodec]]):
  * struct(format, width, height, sample_rate, n_samples), all read
  * from the payload's own header bytes.
  */
case class DecodeMedia(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DecodeMedia.schema
  override def nullSafeEval(v: Any): Any =
    DecodeMedia.kernel(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"(org.apache.spark.sql.catalyst.InternalRow)" +
        s"graft.functions.DecodeMedia.kernel($c)")
  override protected def withNewChildInternal(c: Expression): DecodeMedia = copy(c)
}

object DecodeMedia {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("sample_rate", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false)))

  def kernel(payload: Array[Byte]): InternalRow = {
    val m = MediaCodec.decode(payload)
    new GenericInternalRow(Array[Any](UTF8String.fromString(m.format),
      m.width, m.height, m.sampleRate, m.nSamples))
  }
}

/** CONTENT decode: locate the pixel array (BMP, via the header's own
  * pixel-data offset field) or PCM samples (WAV, via the data chunk
  * the RIFF walk finds) inside the payload and fold byte-level
  * statistics over them — count, sum, sum-of-squares (the RMS/energy
  * numerator), min, max, all in exact integer arithmetic. This is the
  * step that was previously stubbed: every number here comes from
  * content BYTES addressed by parsed header fields, not from side
  * metadata. Unknown formats fold over the whole payload ("raw").
  */
/** Exact-integer DSP features over a payload's CONTENT span (the
  * decoded sample bytes, located via the same header walk as
  * [[MediaContentStats]]): sample count, integer mean (`sum div n`),
  * MEAN-CROSSING count (adjacent pairs straddling the mean — the
  * activity measure that stays meaningful where classic zero-crossing
  * degenerates on unsigned PCM that never leaves one half-range), and
  * sum of absolute first differences (roughness). All integer
  * arithmetic, one codegen'd pass — both engines replay it exactly.
  */
case class MediaAudioFeatures(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MediaAudioFeatures.schema
  override def nullSafeEval(v: Any): Any =
    MediaAudioFeatures.kernel(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"(org.apache.spark.sql.catalyst.InternalRow)" +
        s"graft.functions.MediaAudioFeatures.kernel($c)")
  override protected def withNewChildInternal(c: Expression): MediaAudioFeatures =
    copy(c)
}

object MediaAudioFeatures {
  val schema: StructType = StructType(Seq(
    StructField("n_samples", LongType, nullable = false),
    StructField("mean_b", LongType, nullable = false),
    StructField("n_mean_cross", LongType, nullable = false),
    StructField("sum_abs_delta", LongType, nullable = false)))

  def kernel(payload: Array[Byte]): InternalRow = {
    val (_, off, len) = MediaContentStats.contentSpan(payload)
    var sum = 0L
    var i = 0
    while (i < len) { sum += (payload(off + i) & 0xff).toLong; i += 1 }
    val mean = if (len == 0) 0L else sum / len
    var cross = 0L; var sad = 0L
    i = 1
    while (i < len) {
      val a = (payload(off + i - 1) & 0xff).toLong
      val b = (payload(off + i) & 0xff).toLong
      if ((a >= mean) != (b >= mean)) cross += 1
      sad += math.abs(b - a)
      i += 1
    }
    new GenericInternalRow(Array[Any](len.toLong, mean, cross, sad))
  }
}

case class MediaContentStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MediaContentStats.schema
  override def nullSafeEval(v: Any): Any =
    MediaContentStats.kernel(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"(org.apache.spark.sql.catalyst.InternalRow)" +
        s"graft.functions.MediaContentStats.kernel($c)")
  override protected def withNewChildInternal(c: Expression): MediaContentStats =
    copy(c)
}

object MediaContentStats {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("n_content", LongType, nullable = false),
    StructField("byte_sum", LongType, nullable = false),
    StructField("byte_sumsq", LongType, nullable = false),
    StructField("min_byte", LongType, nullable = false),
    StructField("max_byte", LongType, nullable = false)))

  /** (format, content offset, content length) — offsets come from the
    * payload's own header fields, clamped to the buffer so declared
    * sizes past the end (truncated/hostile files) never overrun.
    */
  private[functions] def contentSpan(p: Array[Byte]): (String, Int, Int) = {
    val n = p.length
    def le32(off: Int) = MediaCodec.readLe32(p, off)
    if (n >= 54 && p(0) == 'B' && p(1) == 'M') {
      val off = math.max(14 + 40, le32(10)) // pixel-array offset field
      val declared = le32(34).toLong & 0xffffffffL // biSizeImage
      val size = if (declared == 0) math.max(0, n - off).toLong else declared
      val o = math.min(off.toLong, n.toLong).toInt
      ("bmp", o, math.min(size, (n - o).toLong).toInt)
    } else if (n >= 44 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' &&
        p(3) == 'F' && p(8) == 'W' && p(9) == 'A' && p(10) == 'V' &&
        p(11) == 'E') {
      var off = 12L
      var dataOff = 0L; var dataSize = 0L
      var walking = true
      while (walking && off + 8 <= n) {
        val o = off.toInt
        val id = new String(p, o, 4, "US-ASCII")
        val size = le32(o + 4).toLong & 0xffffffffL
        if (id == "data") { dataOff = off + 8; dataSize = size; walking = false }
        else {
          val step = 8L + size + (size & 1L)
          if (off + step > n) walking = false else off += step
        }
      }
      val o = math.min(dataOff, n.toLong).toInt
      ("wav", o, math.min(dataSize, (n - o).toLong).toInt)
    } else if (MediaCodec.isPng(p)) {
      val (off, len) = MediaCodec.pngIdatSpan(p)
      ("png", off, len)
    } else ("raw", 0, n)
  }

  def kernel(payload: Array[Byte]): InternalRow = {
    val (fmt, off, len) = contentSpan(payload)
    var i = 0
    var sum = 0L; var sumsq = 0L
    var mn = if (len == 0) 0L else 255L
    var mx = 0L
    while (i < len) {
      val b = (payload(off + i) & 0xff).toLong
      sum += b; sumsq += b * b
      if (b < mn) mn = b
      if (b > mx) mx = b
      i += 1
    }
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt),
      len.toLong, sum, sumsq, mn, mx))
  }
}

/** Energy segmentation of a media payload's CONTENT bytes (M12 — the
  * voice-activity-gate / busy-region step an audio or image pipeline
  * runs between decode and feature extraction: which parts of the
  * clip carry signal?): the content span (located via the payload's
  * own header fields, like [[MediaContentStats]]) splits into
  * [[MediaEnergySegments.Cells]] equal index-span cells; each cell's
  * exact energy Σb² compares against the uniform share by CROSS
  * MULTIPLICATION (`cellSq·len > total·cellLen` — no float division,
  * both engines agree bit-for-bit), yielding the above-average-energy
  * cell count and the peak cell with its integer score
  * `cellSq·len − total·cellLen`. One pass, codegen'd.
  *
  * Exactness bound: `cellSq·len ≤ 255²·len²` stays in int64 for
  * content up to ~10⁷ bytes — above any per-row payload here (the
  * same class of bound as [[MediaAHash64]]).
  */
case class MediaEnergySegments(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MediaEnergySegments.schema
  override def nullSafeEval(v: Any): Any =
    MediaEnergySegments.kernel(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"(org.apache.spark.sql.catalyst.InternalRow)" +
        s"graft.functions.MediaEnergySegments.kernel($c)")
  override protected def withNewChildInternal(c: Expression): MediaEnergySegments =
    copy(c)
}

object MediaEnergySegments {
  val Cells = 16

  val schema: StructType = StructType(Seq(
    StructField("n_content", LongType, nullable = false),
    StructField("n_cells", LongType, nullable = false),
    StructField("n_loud", LongType, nullable = false),
    StructField("peak_cell", LongType, nullable = false),
    StructField("peak_score", LongType, nullable = false)))

  def kernel(payload: Array[Byte]): InternalRow = {
    val (_, off, len) = MediaContentStats.contentSpan(payload)
    if (len == 0)
      return new GenericInternalRow(Array[Any](0L, 0L, 0L, -1L, 0L))
    val k = math.min(Cells, len)
    val cellSq = new Array[Long](k)
    val cellLen = new Array[Long](k)
    var total = 0L
    var i = 0
    while (i < len) {
      // cell of index i = floor(i·k/len) — the same equal index-span
      // split the DuckDB replica derives from 1-based positions
      val cell = (i.toLong * k / len).toInt
      val b = (payload(off + i) & 0xff).toLong
      cellSq(cell) += b * b
      cellLen(cell) += 1
      total += b * b
      i += 1
    }
    var nLoud = 0L
    var peak = 0
    var peakScore = Long.MinValue
    var c = 0
    while (c < k) {
      val score = cellSq(c) * len - total * cellLen(c)
      if (score > 0) nLoud += 1
      if (score > peakScore) { peakScore = score; peak = c }
      c += 1
    }
    new GenericInternalRow(Array[Any](len.toLong, k.toLong, nLoud,
      peak.toLong, peakScore))
  }
}

/** 64-bit average-hash perceptual fingerprint of a media payload's
  * CONTENT bytes (the decoded pixel/sample span, located via the
  * payload's own header fields like [[MediaContentStats]]): the
  * content is split into 64 equal index-span cells and bit i is set
  * when cell i's mean exceeds the global mean — compared in EXACT
  * integer arithmetic (`cellSum·len > total·cellLen`), so both
  * engines agree bit-for-bit with no float mean anywhere. Payloads
  * whose content differs slightly (appended tail, small edits) flip
  * few cells, so near-duplicate media land within a small Hamming
  * distance — the banding + verify shape of SimHash dedup applied to
  * decoded media. One pass, codegen'd.
  *
  * Exactness bound: `cellSum·len` stays in int64 for content up to
  * ~3·10⁸ bytes — far above any per-row payload this engine stores.
  */
case class MediaAHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    MediaAHash64.kernel(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MediaAHash64.kernel($c)")
  override protected def withNewChildInternal(c: Expression): MediaAHash64 =
    copy(c)
}

object MediaAHash64 {
  def kernel(payload: Array[Byte]): Long = {
    val (_, off, len) = MediaContentStats.contentSpan(payload)
    if (len == 0) return 0L
    val cellSum = new Array[Long](64)
    val cellN = new Array[Long](64)
    var total = 0L
    var i = 0
    while (i < len) {
      val c = ((i.toLong * 64L) / len).toInt
      val b = (payload(off + i) & 0xff).toLong
      cellSum(c) += b
      cellN(c) += 1
      total += b
      i += 1
    }
    var h = 0L
    var c = 0
    while (c < 64) {
      if (cellN(c) > 0 && cellSum(c) * len > total * cellN(c)) h |= (1L << c)
      c += 1
    }
    h
  }
}
