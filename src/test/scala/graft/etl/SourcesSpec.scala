package graft.etl

import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Zip + strict-decode source semantics (SURVEY.md §2.1 S3/S5):
  * first-entry-only, abort-on-empty, fail on malformed UTF-8.
  */
class SourcesSpec extends SparkSpec {

  private def zipBytes(entries: (String, Array[Byte])*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    entries.foreach { case (name, bytes) =>
      zos.putNextEntry(new ZipEntry(name)); zos.write(bytes); zos.closeEntry()
    }
    zos.close(); bos.toByteArray
  }

  test("first entry only (main.py:323)") {
    val z = zipBytes("a.txt" -> "FIRST".getBytes(StandardCharsets.UTF_8),
                     "b.txt" -> "SECOND".getBytes(StandardCharsets.UTF_8))
    assert(Sources.extractFirstEntry(z) == "FIRST")
  }

  test("empty zip aborts (main.py:318-320)") {
    val z = zipBytes()
    intercept[IllegalStateException](Sources.extractFirstEntry(z))
  }

  test("strict decode: multibyte UTF-8 ok, malformed bytes raise (main.py:36-38)") {
    assert(Sources.strictDecodeUtf8("当稼動日🙂".getBytes(StandardCharsets.UTF_8)) == "当稼動日🙂")
    val bad = Array[Byte]('a', 0xC3.toByte, 'x') // truncated 2-byte sequence
    intercept[java.nio.charset.CharacterCodingException](Sources.strictDecodeUtf8(bad))
  }

  test("readZipText end-to-end over binaryFile + filename date (main.py:358-364)") {
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "srcspec").toFile
    val f = new java.io.File(dir, "R520.19970315_214500.19970315214500.zip")
    val payload = ("r" * 520) + "tail"
    java.nio.file.Files.write(f.toPath,
      zipBytes("d.txt" -> payload.getBytes(StandardCharsets.UTF_8)))
    val got = Sources.readZipText(spark, f.getAbsolutePath)
      .withColumn("d", Sources.filenameDate(col("path")))
      .select("text", "d").head()
    assert(got.getString(0) == payload)
    assert(got.getDate(1) == java.sql.Date.valueOf("1997-03-15"))
  }

  test("dailyFile: prefix match, deterministic take-first, none -> None (main.py:273-287)") {
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "daily").toFile
    Seq("R520.19970315_2.zip", "R520.19970315_1.zip", "R520.19970316_1.zip", "other.txt")
      .foreach(n => java.nio.file.Files.write(new java.io.File(dir, n).toPath, Array[Byte](1)))
    val hit = Sources.dailyFile(spark, dir.getAbsolutePath,
                                java.time.LocalDate.of(1997, 3, 15))
    assert(hit.exists(_.endsWith("R520.19970315_1.zip")))
    assert(Sources.dailyFile(spark, dir.getAbsolutePath,
                             java.time.LocalDate.of(1999, 1, 1)).isEmpty)
  }
}
