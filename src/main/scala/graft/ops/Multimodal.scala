package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.util.MediaCodec

/** Multimodal-column plumbing (SURVEY.md §2.8): media as opaque `binary`
  * content columns with a typed metadata struct, plus the batch
  * decode / feature-extract / resize / frame-sample stages a training-data
  * pipeline needs.
  *
  * The Spark-side plumbing is real: schema, typed Dataset encoders,
  * `mapPartitions` batch processing (one decoder instance per partition,
  * streamed iterator — the Scala analogue of a batched pandas UDF), and the
  * aggregation plan. The codec is REAL byte-level parsing
  * ([[graft.util.MediaCodec]], built on the public format specs with
  * `java.util.zip` only): `png`-format rows carry an actual
  * standard-compliant PNG (zlib IDAT, IHDR, CRCs) that is chunk-walked,
  * inflated, and de-filtered back to pixels; other formats carry their raw
  * payload, decoded as an opaque 8-bit stream, with real header parsing
  * exercised by [[mediaHeaders]] across PNG/JPEG/GIF/BMP/WAV.
  *
  * Scale notes: content stays opaque bytes end-to-end (no driver collect);
  * per-partition decoder reuse amortizes setup; feature extraction is
  * embarrassingly parallel — the only shuffle is the final rollup.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque content column. */
  final case class MediaMeta(format: String, width: Int, height: Int, n_bytes: Long)

  final case class MediaItem(media_id: Long, kind: String, content: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(
      media_id: Long, kind: String, format: String,
      n_bytes: Long, n_px: Int, sum_vals: Long, n_frames: Int,
      mean_val: Double, entropy: Double, thumb: Array[Double])

  val FrameBytes  = 256 // one "frame" per 256-byte block
  val FrameStride = 2   // sample every 2nd frame
  val ThumbBins   = 8   // "resize": average-pool payload into 8 buckets
  val PngWidth    = 16  // raster width for PNG-encoded payloads

  /** Real PNG encode of a payload: zero-padded to fill the last
    * [[PngWidth]]-wide scanline (PNG rasters are rectangular), then written
    * as a standard 8-bit grayscale PNG. Runs as a scalar udf — binary
    * codec work is genuinely imperative, outside Catalyst's vocabulary.
    */
  private val encodePngUdf = udf { (payload: Array[Byte]) =>
    val padded = java.util.Arrays.copyOf(
      payload, math.max(PngWidth, (payload.length + PngWidth - 1) / PngWidth * PngWidth))
    MediaCodec.encodePng(padded, PngWidth)
  }

  /** Build the media table from the `documents` fixture: kind/format
    * assigned deterministically from doc_id; content = a REAL PNG encoding
    * of the text bytes for `png`-format rows (meta dims = the actual
    * raster dims), raw UTF-8 payload bytes otherwise.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    val payload = encode(col("text"), "UTF-8").cast("binary")
    val fmt = element_at(array(lit("png"), lit("jpeg"), lit("wav"), lit("mp4")),
                         (col("doc_id") % 4 + 1).cast("int"))
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
                 (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      when(fmt === "png", encodePngUdf(payload)).otherwise(payload).as("content"),
      struct(
        fmt.as("format"),
        lit(PngWidth).as("width"),
        greatest(lit(1), ceil(octet_length(col("text")) / PngWidth.toDouble)).cast("int")
          .as("height"),
        octet_length(col("text")).cast("long").as("n_bytes")).as("meta"))
  }

  /** Batched decode + feature extraction: one codec per partition, streamed.
    * PNG content is REALLY decoded (inflate + de-filter, with the parsed
    * IHDR dims cross-checked against the typed metadata); other content is
    * an opaque 8-bit stream. Features: exact byte-sum, frame count under
    * the sampling rule, mean pixel, byte-histogram entropy, and an
    * average-pooled thumbnail.
    */
  def extractFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // per-partition scratch (decoder state amortized across the batch)
      val hist = new Array[Long](256)
      it.map { m =>
        val px: Array[Int] =
          if (MediaCodec.isPng(m.content)) {
            val (w, h, p) = MediaCodec.decodePngGray8(m.content)
            require(w == m.meta.width && h == m.meta.height,
              s"media ${m.media_id}: parsed PNG dims ${w}x$h != meta ${m.meta.width}x${m.meta.height}")
            p
          } else {
            val p = new Array[Int](m.content.length)
            var i = 0
            while (i < m.content.length) { p(i) = m.content(i) & 0xff; i += 1 }
            p
          }
        java.util.Arrays.fill(hist, 0L)
        var sum = 0L
        var i = 0
        while (i < px.length) { sum += px(i); hist(px(i)) += 1; i += 1 }
        val n = px.length.toDouble
        var ent = 0.0
        var b = 0
        while (b < 256) {
          if (hist(b) > 0) { val p = hist(b) / n; ent -= p * math.log(p) / math.log(2) }
          b += 1
        }
        val thumb = new Array[Double](ThumbBins)
        if (px.length >= ThumbBins) {
          val bin = px.length / ThumbBins
          var t = 0
          while (t < ThumbBins) {
            var s = 0L; var j = t * bin
            while (j < (t + 1) * bin) { s += px(j); j += 1 }
            thumb(t) = s.toDouble / bin; t += 1
          }
        }
        val nFrames = (((px.length + FrameBytes - 1) / FrameBytes) + FrameStride - 1) / FrameStride
        MediaFeatures(m.media_id, m.kind, m.meta.format,
          m.meta.n_bytes, px.length, sum, nFrames,
          if (px.isEmpty) 0.0 else sum / n, ent, thumb)
      }
    }
  }

  /** q_media_features: decode → feature-extract → rollup per (kind, format).
    * Output is exact-integer statistics so the DuckDB oracle (which re-derives
    * byte values from the ASCII fixture text) matches bit-for-bit; the
    * double-valued features (mean/entropy/thumb) are covered by
    * MultimodalSpec instead.
    */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val items = mediaTable(spark, dir).as[MediaItem]
    extractFeatures(items).toDF()
      .groupBy("kind", "format")
      .agg(
        count(lit(1)).as("n_items"),
        sum("n_bytes").as("sum_bytes"),
        sum("sum_vals").as("sum_vals"),
        sum("n_frames").as("sum_frames"),
        max("n_bytes").as("max_bytes"))
      .orderBy("kind", "format")
  }

  /** Oracle: the fixture text is pure ASCII (verified ≤ 0x79), so UTF-8 byte
    * values equal `unicode(char)` and byte length equals char length. For
    * `png` rows the decoded pixel count is the zero-PADDED raster size
    * (rectangular scanlines); the pad contributes nothing to sum_vals.
    */
  val mediaFeaturesOracle: String =
    s"""WITH m AS (
       |  SELECT doc_id,
       |         ['image','audio','video'][(doc_id % 3 + 1)::INT] AS kind,
       |         ['png','jpeg','wav','mp4'][(doc_id % 4 + 1)::INT] AS format,
       |         length(text)::BIGINT AS n_bytes,
       |         CASE WHEN doc_id % 4 = 0
       |              THEN greatest($PngWidth, (length(text) + $PngWidth - 1) // $PngWidth * $PngWidth)
       |              ELSE length(text) END::BIGINT AS px_len,
       |         list_sum(list_transform(split(text, ''), c -> unicode(c)))::BIGINT AS sum_vals
       |  FROM documents)
       |SELECT kind, format, COUNT(*) AS n_items,
       |       CAST(SUM(n_bytes) AS BIGINT) AS sum_bytes,
       |       CAST(SUM(sum_vals) AS BIGINT) AS sum_vals,
       |       CAST(SUM(((px_len + $FrameBytes - 1) // $FrameBytes + $FrameStride - 1) // $FrameStride) AS BIGINT) AS sum_frames,
       |       CAST(MAX(n_bytes) AS BIGINT) AS max_bytes
       |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Bin width for the decoded-value histogram: 256 byte values → 16 bins. */
  val HistBins = 16

  /** q_media_histogram: per-format DECODED-value histogram audit — decode
    * every media item (true PNG inflate + de-filter for `png` rows, opaque
    * 8-bit stream otherwise), bucket pixel/sample values into
    * [[HistBins]] equal-width bins, and count per (format, bin). The
    * distribution-drift audit a media-ingest pipeline runs (all-zero
    * frames, clipped ranges, dead channels show up as bin-mass anomalies),
    * and a second oracle-checked consumer of the real decode path next to
    * [[mediaFeatures]]'s scalar rollup.
    *
    * Exactness: counts are integers, and for the ASCII fixture the oracle
    * re-derives every decoded value from the text (byte == code point),
    * plus the zero-pad pixels the PNG raster adds (bin 0) — so a decoder
    * that drops a filter pass or mis-inflates shifts bin mass and fails
    * the hash gate. Bins with zero mass are omitted on both sides.
    *
    * Scale: decode + bucketing is embarrassingly parallel per item
    * (mapPartitions, per-partition histogram scratch); only
    * #formats × [[HistBins]] partial rows reach the final aggregation.
    */
  def mediaHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val items = mediaTable(spark, dir).as[MediaItem]
    items.mapPartitions { it =>
      val width = 256 / HistBins
      it.flatMap { m =>
        val hist = new Array[Long](HistBins)
        if (MediaCodec.isPng(m.content)) {
          val (_, _, p) = MediaCodec.decodePngGray8(m.content)
          var i = 0
          while (i < p.length) { hist(p(i) / width) += 1; i += 1 }
        } else {
          var i = 0
          while (i < m.content.length) { hist((m.content(i) & 0xff) / width) += 1; i += 1 }
        }
        (0 until HistBins).iterator
          .filter(b => hist(b) > 0)
          .map(b => (m.meta.format, b, hist(b)))
      }
    }.toDF("format", "bin", "cnt")
      .groupBy("format", "bin")
      .agg(sum("cnt").as("n_vals"))
      .orderBy("format", "bin")
  }

  /** Oracle: decoded values re-derived from the ASCII text (byte ==
    * `unicode(char)`), plus the PNG raster's zero-pad pixels in bin 0;
    * empty bins filtered on both sides.
    */
  val mediaHistogramOracle: String = {
    val width = 256 / HistBins
    s"""WITH m AS (
       |  SELECT doc_id,
       |         ['png','jpeg','wav','mp4'][(doc_id % 4 + 1)::INT] AS format,
       |         length(text)::BIGINT AS nb,
       |         CASE WHEN doc_id % 4 = 0
       |              THEN greatest($PngWidth, (length(text) + $PngWidth - 1) // $PngWidth * $PngWidth)
       |              ELSE length(text) END::BIGINT AS px_len,
       |         text
       |  FROM documents),
       |c AS (SELECT format, CAST(unicode(c) // $width AS INT) AS bin, COUNT(*)::BIGINT AS cnt
       |      FROM (SELECT format, unnest(split(text, '')) AS c FROM m) GROUP BY 1, 2),
       |p AS (SELECT format, 0 AS bin, SUM(px_len - nb)::BIGINT AS cnt
       |      FROM m WHERE doc_id % 4 = 0 GROUP BY 1)
       |SELECT format, bin, CAST(SUM(cnt) AS BIGINT) AS n_vals
       |FROM (SELECT * FROM c UNION ALL SELECT * FROM p)
       |GROUP BY 1, 2 HAVING SUM(cnt) > 0 ORDER BY 1, 2""".stripMargin
  }

  // --- resize (block-average downscale) ---------------------------------------

  /** Resize target: every raster downscales to a [[ResizeGrid]]² cell
    * grid. */
  val ResizeGrid = 4

  /** q_media_resize: the RESIZE stage of an image pipeline — true PNG
    * decode (inflate + de-filter), then an EXACT block-average downscale
    * of every raster to a [[ResizeGrid]]×[[ResizeGrid]] grid: pixel
    * (r, c) of a w×h raster lands in cell (r·G div h, c·G div w) —
    * integer boundaries, every pixel in exactly one cell, no
    * interpolation float anywhere — audited as the per-cell corpus rollup
    * (pixel count, exact value sum, ppm-quantized mean). Completes the
    * decode / feature-extract / resize / frame-sample quartet as a
    * first-class oracle-gated query (the thumbnail field in
    * [[mediaFeatures]] is the 1-D cousin; this is the 2-D geometry).
    *
    * Exactness: for the ASCII fixture the oracle re-derives every decoded
    * pixel from the text (byte == code point, zero pads for the raster's
    * rectangle fill) and replays the same integer cell mapping, so a
    * decoder that drops a filter pass, or a resize that mis-buckets a
    * boundary row, moves exact integer cell mass and fails the hash gate.
    * The mean is quantized through DECIMAL/HUGEINT (sum·10⁶ passes 2⁶³
    * near ~10¹³ corpus pixels — the chi2 widening rule).
    *
    * Scale: decode + cell accumulation is embarrassingly parallel per
    * item (G² scratch cells per image); only G² partial rows per task
    * reach the final aggregation.
    */
  def mediaResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = ResizeGrid
    val items = mediaTable(spark, dir)
      .where(col("meta.format") === "png").as[MediaItem]
    items.flatMap { m =>
      val (w, h, p) = MediaCodec.decodePngGray8(m.content)
      val cnt = new Array[Long](g * g)
      val sums = new Array[Long](g * g)
      var i = 0
      while (i < p.length) {
        val cell = (i / w * g / h) * g + (i % w * g / w)
        cnt(cell) += 1
        sums(cell) += p(i)
        i += 1
      }
      (0 until g * g).iterator
        .filter(cell => cnt(cell) > 0)
        .map(cell => (cell / g, cell % g, cnt(cell), sums(cell)))
    }.toDF("cell_y", "cell_x", "n_px", "sum_vals")
      .groupBy("cell_y", "cell_x")
      .agg(sum("n_px").as("n_px"), sum("sum_vals").as("sum_vals"))
      .select(col("cell_y"), col("cell_x"),
              col("n_px").cast("long").as("n_px"),
              col("sum_vals").cast("long").as("sum_vals"),
              expr("(CAST(sum_vals AS DECIMAL(38,0)) * 1000000) div n_px")
                .as("mean_ppm"))
      .orderBy("cell_y", "cell_x")
  }

  /** Oracle: pixels re-derived from the ASCII text + zero pads, the same
    * integer cell mapping replayed in SQL (pads sit at the tail indexes,
    * exactly where the raster fill puts them).
    */
  val mediaResizeOracle: String = {
    val g = ResizeGrid
    s"""WITH m AS (
       |  SELECT doc_id, text, length(text)::BIGINT AS nt,
       |         greatest($PngWidth,
       |                  (length(text) + ${PngWidth - 1}) // $PngWidth * $PngWidth)::BIGINT AS px_len
       |  FROM documents WHERE doc_id % 4 = 0),
       |ix AS (
       |  SELECT unnest(range(1, m.px_len + 1)) AS i, m.text, m.nt,
       |         m.px_len // $PngWidth AS h
       |  FROM m),
       |px AS (
       |  SELECT i - 1 AS idx,
       |         CASE WHEN i <= nt THEN unicode(substr(text, i::INT, 1))
       |              ELSE 0 END AS v,
       |         h
       |  FROM ix),
       |cells AS (
       |  SELECT (idx // $PngWidth) * $g // h AS cell_y,
       |         (idx % $PngWidth) * $g // $PngWidth AS cell_x,
       |         COUNT(*)::BIGINT AS n_px, SUM(v)::BIGINT AS sum_vals
       |  FROM px GROUP BY 1, 2)
       |SELECT CAST(cell_y AS INT) AS cell_y, CAST(cell_x AS INT) AS cell_x,
       |       n_px, sum_vals,
       |       CAST((CAST(sum_vals AS HUGEINT) * 1000000) // n_px AS BIGINT) AS mean_ppm
       |FROM cells ORDER BY 1, 2""".stripMargin
  }

  // --- header parsing across formats -----------------------------------------

  /** q_media_headers: synthesize per-doc container bytes in five real
    * formats (a full PNG encode of the text payload; JPEG/GIF/BMP/WAV
    * header layouts carrying doc-derived dimensions), then sniff + parse
    * them back with [[MediaCodec.parseHeader]]. The oracle predicts every
    * parsed value from the same doc_id arithmetic WITHOUT touching bytes —
    * so a parse that misreads endianness, offsets, or marker walks fails
    * the hash compare. WAV reports (sample_rate, channels) as its dims.
    */
  def mediaHeaders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val w = (id % 300 + 1).toInt
          val h = (id % 200 + 1).toInt
          val bytes = (id % 5).toInt match {
            case 0 =>
              val payload = text.getBytes("UTF-8")
              val padded = java.util.Arrays.copyOf(
                payload, math.max(w, (payload.length + w - 1) / w * w))
              MediaCodec.encodePng(padded, w)
            case 1 => MediaCodec.jpegHeaderBytes(w, h)
            case 2 => MediaCodec.gifHeaderBytes(w, h)
            case 3 => MediaCodec.bmpHeaderBytes(w, h)
            case _ => MediaCodec.wavHeaderBytes(w * 100, (id % 2 + 1).toInt)
          }
          val hd = MediaCodec.parseHeader(bytes)
          (id, hd.format, hd.width, hd.height)
        }
      }
      .toDF("media_id", "format", "width", "height")
      .orderBy("media_id")
  }

  // --- frame sampling ---------------------------------------------------------

  /** Frame geometry for [[mediaFrames]]: 64-byte frames, every 2nd sampled.
    * Smaller than [[FrameBytes]] deliberately — fixture payloads are a few
    * hundred bytes, and a 256-byte frame would leave exactly one sampled
    * frame per item, making the stride and the cross-frame audit vacuous
    * (the dedupClusterStats lesson). [[mediaFeatures]]' n_frames keeps the
    * original [[FrameBytes]] geometry for continuity with earlier rounds.
    */
  val SampleFrameBytes  = 64
  val SampleFrameStride = 2

  /** q_media_frames: the frame-sample stage of a video/audio pipeline —
    * decode each item (true PNG inflate for `png` rows), cut the decoded
    * stream into [[SampleFrameBytes]]-value frames (short tail kept), keep
    * every [[SampleFrameStride]]-th frame, and emit one row per SAMPLED
    * frame with its exact value-sum and length; rolled up per
    * (format, frame_idx) so the audit is geometry-bounded.
    *
    * In production the emitted row carries the frame's byte slice onward to
    * the encoder/captioner; the plumbing here is identical (partition-local
    * decode → per-frame iterator → aggregation) with the slice reduced to
    * its exact audit stats so the DuckDB oracle — which re-derives every
    * value from the ASCII text + PNG pad arithmetic — can hash-check the
    * cut points bit-exactly: an off-by-one frame boundary moves value mass
    * between frame indexes and fails the gate.
    *
    * Scale: decode + framing is embarrassingly parallel per item
    * (mapPartitions, no shuffle before the rollup); sampled-frame fan-out
    * is bounded by px_len/[[SampleFrameBytes]]/[[SampleFrameStride]] rows
    * per item, each a handful of integers.
    */
  def mediaFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val items = mediaTable(spark, dir).as[MediaItem]
    items.mapPartitions { it =>
      it.flatMap { m =>
        val px: Array[Int] =
          if (MediaCodec.isPng(m.content)) MediaCodec.decodePngGray8(m.content)._3
          else {
            val p = new Array[Int](m.content.length)
            var i = 0
            while (i < m.content.length) { p(i) = m.content(i) & 0xff; i += 1 }
            p
          }
        val nFrames = (px.length + SampleFrameBytes - 1) / SampleFrameBytes
        (0 until nFrames by SampleFrameStride).iterator.map { f =>
          val lo = f * SampleFrameBytes
          val hi = math.min(lo + SampleFrameBytes, px.length)
          var s = 0L; var i = lo
          while (i < hi) { s += px(i); i += 1 }
          (m.meta.format, f, hi - lo, s)
        }
      }
    }.toDF("format", "frame_idx", "frame_len", "frame_sum")
      .groupBy("format", "frame_idx")
      .agg(
        count(lit(1)).as("n_frames"),
        sum("frame_sum").as("sum_vals"),
        sum("frame_len").cast("long").as("sum_len"),
        max("frame_len").cast("int").as("max_len"))
      .orderBy("format", "frame_idx")
  }

  /** Oracle: frames re-derived from the ASCII text (byte == `unicode`),
    * with `png` rows extended by their zero-pad (pads lengthen frames but
    * add no value mass).
    */
  val mediaFramesOracle: String = {
    val (fb, fs) = (SampleFrameBytes, SampleFrameStride)
    s"""WITH m AS (
       |  SELECT doc_id,
       |         ['png','jpeg','wav','mp4'][(doc_id % 4 + 1)::INT] AS format,
       |         length(text)::BIGINT AS nb,
       |         CASE WHEN doc_id % 4 = 0
       |              THEN greatest($PngWidth, (length(text) + $PngWidth - 1) // $PngWidth * $PngWidth)
       |              ELSE length(text) END::BIGINT AS px_len,
       |         text
       |  FROM documents),
       |f AS (SELECT format, nb, px_len, text,
       |             unnest(range(0, (px_len + $fb - 1) // $fb)) AS fi
       |      FROM m),
       |s AS (SELECT format, fi,
       |             least((fi + 1) * $fb, px_len) - fi * $fb AS flen,
       |             CASE WHEN nb > fi * $fb
       |                  THEN list_sum(list_transform(
       |                         split(substr(text, (fi * $fb + 1)::INT,
       |                                      least($fb, nb - fi * $fb)::INT), ''),
       |                         c -> unicode(c)))
       |                  ELSE 0 END AS fsum
       |      FROM f WHERE fi % $fs = 0)
       |SELECT format, CAST(fi AS INT) AS frame_idx, COUNT(*) AS n_frames,
       |       CAST(SUM(COALESCE(fsum, 0)) AS BIGINT) AS sum_vals,
       |       CAST(SUM(flen) AS BIGINT) AS sum_len,
       |       CAST(MAX(flen) AS INT) AS max_len
       |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** Samples per energy window for [[audioEnergy]]. */
  val AudioWindow = 64

  /** Low-energy threshold on the per-window sum of squared samples
    * (unsigned 8-bit): a full window of ASCII space (32²·64 = 65536) or
    * any short tail sits below it; voiced text bytes (~100²·64) sit far
    * above. Exact integer compare on both engines.
    */
  val LowEnergySumSq = 150000L

  /** Sample rate stamped into the staged WAVs. */
  val AudioRate = 8000

  /** q_audio_energy: windowed energy / trim audit over REAL PCM WAV — the
    * VAD-style primitive a speech-data pipeline runs before transcription:
    * decode the byte stream ([[graft.util.MediaCodec.decodeWavPcm8]], a
    * real RIFF chunk walk), window the samples, score each window by its
    * exact integer sum of squares, flag low-energy windows, and report
    * per clip how much a leading/trailing trim would cut. Content is built
    * as a standard 44-byte-header WAV around the document's bytes
    * (encode→decode round-trips through the actual format, like the PNG
    * path), so the oracle can recompute every number from the text.
    *
    * Scale shape: decode + windowing is `mapPartitions` over opaque bytes
    * (decoder reuse per partition, no driver collect); the per-clip audit
    * is one map-side combined aggregation; output is clip-cardinality.
    */
  def audioEnergy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = AudioWindow
    val t = LowEnergySumSq
    val clips = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= 1)
      .as[(Long, String)]
    val windows = clips.mapPartitions { it =>
      it.flatMap { case (id, text) =>
        val wav = graft.util.MediaCodec.encodeWavPcm8(
          text.getBytes(java.nio.charset.StandardCharsets.US_ASCII), AudioRate)
        val (rate, samples) = graft.util.MediaCodec.decodeWavPcm8(wav)
        val n = (samples.length + w - 1) / w
        (0 until n).iterator.map { wi =>
          val lo = wi * w
          val hi = math.min(lo + w, samples.length)
          var ssq = 0L; var i = lo
          while (i < hi) { ssq += samples(i).toLong * samples(i); i += 1 }
          (id, rate, samples.length.toLong, wi.toLong, ssq)
        }
      }
    }.toDF("media_id", "sample_rate", "n_samples", "wi", "ssq")
    windows.groupBy("media_id", "sample_rate", "n_samples")
      .agg(
        count(lit(1)).as("n_windows"),
        count(when(col("ssq") < t, 1)).as("n_low"),
        min(when(col("ssq") >= t, col("wi"))).as("first_voiced"),
        max(when(col("ssq") >= t, col("wi"))).as("last_voiced"),
        sum("ssq").as("total_sumsq"))
      .select(
        col("media_id"), col("sample_rate"), col("n_samples"),
        col("n_windows"), col("n_low"),
        // trim audit: windows a leading/trailing cut removes; an all-low
        // clip trims entirely from the front (trail 0 by convention)
        coalesce(col("first_voiced"), col("n_windows")).as("lead_trim"),
        when(col("first_voiced").isNull, 0L)
          .otherwise(col("n_windows") - 1 - col("last_voiced")).as("trail_trim"),
        col("total_sumsq"))
      .orderBy("media_id")
  }

  val audioEnergyOracle: String = {
    val (w, t) = (AudioWindow, LowEnergySumSq)
    s"""WITH m AS (SELECT doc_id, text, length(text)::BIGINT AS nb FROM documents
       |           WHERE length(text) >= 1),
       |f AS (SELECT doc_id, nb, text,
       |             unnest(range(0, (nb + $w - 1) // $w)) AS wi
       |      FROM m),
       |s AS (SELECT doc_id, nb, wi,
       |             list_sum(list_transform(
       |               split(substr(text, (wi * $w + 1)::INT,
       |                            least($w, nb - wi * $w)::INT), ''),
       |               c -> unicode(c) * unicode(c))) AS ssq
       |      FROM f)
       |SELECT doc_id AS media_id, $AudioRate AS sample_rate, nb AS n_samples,
       |       COUNT(*) AS n_windows,
       |       COUNT(CASE WHEN ssq < $t THEN 1 END) AS n_low,
       |       CAST(COALESCE(MIN(CASE WHEN ssq >= $t THEN wi END), COUNT(*)) AS BIGINT) AS lead_trim,
       |       CAST(CASE WHEN MAX(CASE WHEN ssq >= $t THEN wi END) IS NULL THEN 0
       |            ELSE COUNT(*) - 1 - MAX(CASE WHEN ssq >= $t THEN wi END) END AS BIGINT) AS trail_trim,
       |       CAST(SUM(ssq) AS BIGINT) AS total_sumsq
       |FROM s GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin
  }

  val mediaHeadersOracle: String =
    s"""SELECT doc_id AS media_id,
       |       CASE doc_id % 5 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'gif'
       |                       WHEN 3 THEN 'bmp' ELSE 'wav' END AS format,
       |       CAST(CASE WHEN doc_id % 5 = 4 THEN (doc_id % 300 + 1) * 100
       |                 ELSE doc_id % 300 + 1 END AS INT) AS width,
       |       CAST(CASE doc_id % 5
       |            WHEN 0 THEN greatest(1, (length(text) + (doc_id % 300 + 1) - 1) // (doc_id % 300 + 1))
       |            WHEN 4 THEN doc_id % 2 + 1
       |            ELSE doc_id % 200 + 1 END AS INT) AS height
       |FROM documents ORDER BY media_id""".stripMargin
}
