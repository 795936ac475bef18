package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing (SURVEY.md §2.8): media as opaque `binary`
  * content columns with a typed metadata struct, plus the batch
  * decode / feature-extract / resize / frame-sample stages a training-data
  * pipeline needs.
  *
  * The Spark-side plumbing is real: schema, typed Dataset encoders,
  * `mapPartitions` batch processing (one decoder instance per partition,
  * streamed iterator — the Scala analogue of a batched pandas UDF), and the
  * aggregation plan. The codec itself is a DETERMINISTIC FAKE (this
  * container has no image/audio libraries): [[FakeCodec.decode]] interprets
  * the payload bytes as 8-bit grayscale pixels. Swapping in a real codec
  * (javacv / TwelveMonkeys) changes only that one function.
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
      n_bytes: Long, sum_vals: Long, n_frames: Int,
      mean_val: Double, entropy: Double, thumb: Array[Double])

  val FrameBytes  = 256 // one "frame" per 256-byte block
  val FrameStride = 2   // sample every 2nd frame
  val ThumbBins   = 8   // "resize": average-pool payload into 8 buckets

  /** The deterministic fake codec — the ONLY stub. A real deployment
    * replaces `decode` with an actual image/audio decoder; everything
    * downstream (batching, schema, aggregation) is unchanged.
    */
  object FakeCodec {
    /** DETERMINISTIC FAKE decode: payload bytes as 8-bit grayscale pixels. */
    def decode(content: Array[Byte]): Array[Int] = {
      val px = new Array[Int](content.length)
      var i = 0
      while (i < content.length) { px(i) = content(i) & 0xff; i += 1 }
      px
    }
  }

  /** Build the media table from the `documents` fixture: content = UTF-8
    * bytes of the text (an opaque payload as far as the pipeline cares),
    * kind/format assigned deterministically from doc_id, dimensions derived
    * from payload size.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
                 (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").cast("binary").as("content"),
      struct(
        element_at(array(lit("png"), lit("jpeg"), lit("wav"), lit("mp4")),
                   (col("doc_id") % 4 + 1).cast("int")).as("format"),
        lit(16).as("width"),
        ceil(octet_length(col("text")) / 16.0).cast("int").as("height"),
        octet_length(col("text")).cast("long").as("n_bytes")).as("meta"))

  /** Batched decode + feature extraction: one codec per partition, streamed.
    * Features: exact byte-sum, frame count under the sampling rule, mean
    * pixel, byte-histogram entropy, and an average-pooled thumbnail.
    */
  def extractFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // per-partition scratch (decoder state amortized across the batch)
      val hist = new Array[Long](256)
      it.map { m =>
        val px = FakeCodec.decode(m.content)
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
          m.meta.n_bytes, sum, nFrames,
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
    * values equal `unicode(char)` and byte length equals char length.
    */
  val mediaFeaturesOracle: String =
    s"""WITH m AS (
       |  SELECT doc_id,
       |         ['image','audio','video'][(doc_id % 3 + 1)::INT] AS kind,
       |         ['png','jpeg','wav','mp4'][(doc_id % 4 + 1)::INT] AS format,
       |         length(text)::BIGINT AS n_bytes,
       |         list_sum(list_transform(split(text, ''), c -> unicode(c)))::BIGINT AS sum_vals
       |  FROM documents)
       |SELECT kind, format, COUNT(*) AS n_items,
       |       CAST(SUM(n_bytes) AS BIGINT) AS sum_bytes,
       |       CAST(SUM(sum_vals) AS BIGINT) AS sum_vals,
       |       CAST(SUM(((n_bytes + $FrameBytes - 1) // $FrameBytes + $FrameStride - 1) // $FrameStride) AS BIGINT) AS sum_frames,
       |       CAST(MAX(n_bytes) AS BIGINT) AS max_bytes
       |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
