package graft.etl

import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.ops.Ingestion

/** End-to-end spec for the complete daily run (SURVEY.md §3.1): a
  * reference-shaped zip of 520-char lineitem records flows through find →
  * unzip → explode → parse → promote → aggregate → retention → archive →
  * notify, and every stage's output is checked against the fixture.
  */
class DailyIngestSpec extends SparkSpec {

  private def stageLineitemZip(inputDir: String): String = {
    val recs = Ingestion.lineitemRecords(spark, sf0001)
      .orderBy("f_orderkey", "f_linenumber")
      .select("record").collect().map(_.getString(0))
    val text = recs.mkString
    val name = "R520.20240115_000000.20240115000000.zip"
    val f = new java.io.File(inputDir, name)
    val zos = new ZipOutputStream(new java.io.FileOutputStream(f))
    zos.putNextEntry(new ZipEntry("pos.txt"))
    zos.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    zos.closeEntry(); zos.close()
    f.getAbsolutePath
  }

  test("full daily run produces promoted, aggregated, retained, archived output + success notify") {
    val in = Files.createTempDirectory("daily_in").toFile.getAbsolutePath
    val work = Files.createTempDirectory("daily_work").toFile.getAbsolutePath
    stageLineitemZip(in)
    val li = Tables.lineitem(spark, sf0001)
    val nLineitem = li.count()

    var posted: Option[Map[String, String]] = None
    val m = DailyIngest.run(spark, in, java.time.LocalDate.of(2024, 1, 15), work,
      poster = p => { posted = Some(p); true })

    // metrics: every record counted, 520 bytes each (ASCII layout)
    assert(m.totalRows == nLineitem)
    assert(m.totalBytes == nLineitem * 520)
    assert(!m.isFileFailed && posted.exists(_("Subject").contains("succeeded")))

    // final table: retention keeps shipdate >= max - 4d (exclusive delete)
    val expectKept = {
      val asOf = li.agg(max(to_date(col("l_shipdate")))).head().getDate(0)
      li.filter(to_date(col("l_shipdate")) >= date_sub(lit(asOf), 4)).count()
    }
    val finalT = spark.read.parquet(s"$work/final")
    assert(finalT.count() == expectKept)

    // aggregates reconcile with the PROMOTED table: rollups run before the
    // retention cleanup, like the reference (procs at ingest 21:45,
    // retention at 00:30 — function_app.py:11,52)
    val sku = spark.read.parquet(s"$work/agg/sku_daily")
    assert(sku.agg(sum("n_lines")).head().getLong(0) == nLineitem)
    val sales = spark.read.parquet(s"$work/agg/sales_daily")
    assert(sales.count() > 0)

    // input archived into Daily/YYYY/YYYYMMDD and removed from the drop dir
    assert(new java.io.File(s"$work/archive/Daily/2024/20240115").listFiles().nonEmpty)
    assert(new java.io.File(in).listFiles().forall(!_.getName.startsWith("R520.")))

    // second run: file gone -> failure notification, error rethrown
    var failPosted: Option[Map[String, String]] = None
    intercept[IllegalStateException] {
      DailyIngest.run(spark, in, java.time.LocalDate.of(2024, 1, 15), work,
        poster = p => { failPosted = Some(p); true })
    }
    assert(failPosted.exists(_("Subject").contains("FAILED")))

    // idempotent promotion: re-staging the same file and re-running leaves
    // the final table unchanged (anti-join upsert + retention fixed point)
    stageLineitemZip(in)
    DailyIngest.run(spark, in, java.time.LocalDate.of(2024, 1, 15), work)
    assert(spark.read.parquet(s"$work/final").count() == expectKept)
  }
}
