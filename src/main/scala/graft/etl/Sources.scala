package graft.etl

import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}
import java.nio.ByteBuffer
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sources — the reference's scan surface (SURVEY.md §2.1):
  *
  *  - S1 blob-listing scan with prefix predicate + take-first,
  *    (/root/reference/main.py:273-287) → path glob + limit(1).
  *  - S2 full binary read → `binaryFile` data source.
  *  - S3 zip decompression, first entry only, abort on empty archive
  *    (main.py:316-323).
  *  - S5 strict UTF-8 decode — fail on malformed bytes like Python's
  *    `bytes.decode` (main.py:32-38), unlike Spark's replacement-char
  *    default.
  *
  * The zip+decode step runs in `mapPartitions` over `binaryFile` rows: one
  * task per archive, streaming decode — the natural Spark unit for
  * one-file-per-day inputs, and it scales linearly when thousands of daily
  * files are listed by one glob.
  */
object Sources {

  /** S2: binary scan. Schema: (path, modificationTime, length, content). */
  def binaryFiles(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.format("binaryFile").load(pathGlob)

  /** S1: daily-file lookup — list files matching `R520.<yyyyMMdd>*` under
    * `dir`, warn-take-first semantics = deterministic min(path) limit 1.
    */
  def dailyFile(spark: SparkSession, dir: String, date: java.time.LocalDate,
                prefix: String = "R520."): Option[String] = {
    val yyyymmdd = date.format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE)
    // resolve the path's OWN filesystem (s3a://, hdfs://, file:) — the
    // default-FS form breaks when inputDir lives on a different scheme
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else fs.listStatus(p).iterator
      .map(_.getPath.toString)
      .filter(_.split("/").last.startsWith(prefix + yyyymmdd))
      .toSeq.sorted.headOption
  }

  /** S5: strict UTF-8 decode; throws CharacterCodingException on malformed
    * input (parity with the reference's fail-fast decode, main.py:36-38).
    */
  def strictDecodeUtf8(bytes: Array[Byte]): String = {
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    dec.decode(ByteBuffer.wrap(bytes)).toString
  }

  /** S3+S5: extract the FIRST entry of each zip blob and strict-decode it.
    * Empty archive → IllegalStateException (abort semantics,
    * main.py:318-320). Output: (path, text).
    */
  def readZipText(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    binaryFiles(spark, pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (path, bytes) =>
        (path, extractFirstEntry(bytes))
      })
      .toDF("path", "text")
  }

  /** First-entry zip extract with strict decode; package-visible for tests. */
  def extractFirstEntry(bytes: Array[Byte]): String = {
    val zin = new ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    val entry = zin.getNextEntry
    if (entry == null)
      throw new IllegalStateException("empty zip archive (no entries)")
    val buf = new java.io.ByteArrayOutputStream()
    val chunk = new Array[Byte](64 * 1024)
    var n = zin.read(chunk)
    while (n >= 0) { buf.write(chunk, 0, n); n = zin.read(chunk) }
    zin.close()
    strictDecodeUtf8(buf.toByteArray)
  }

  /** P3: business-date extraction from the daily filename —
    * `R520.YYYYMMDD_...zip` carries the date at chars [5:13]
    * (main.py:358-364); malformed names yield null (log+skip semantics).
    */
  def filenameDate(pathCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    to_date(substring(element_at(split(pathCol, "/"), -1), 6, 8), "yyyyMMdd")
}
