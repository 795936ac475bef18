package graft.etl

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Clock

/** Sinks — the reference's write surface (SURVEY.md §2.4):
  *
  *  - K1 JDBC batch insert: 150-row array-bound batches
  *    (/root/reference/main.py:53, 213-262) → the stock JDBC writer with
  *    `batchsize=150`; Spark task retries replace the hand-rolled
  *    exponential backoff (main.py:250). Parquet is the offline stand-in
  *    (no database in this environment): same DataFrame, different format.
  *  - K3 file archive: copy → verify → delete-source = move into
  *    `Daily/<YYYY>/<YYYYMMDD>/<name>` (main.py:353-398, layout :366-368),
  *    idempotent when the destination exists (main.py:375).
  *  - K5 retention delete (daily_cleanup.py:19-79): strictly-exclusive
  *    `business_date < asOf − days` drop. Without a transactional table
  *    format this is filter + partitioned overwrite; the date-partitioned
  *    layout makes it a pure partition drop at scale (no data rewrite of
  *    kept days).
  *
  * Delivery semantics (SURVEY.md §2.5 C3): JDBC append is at-least-once —
  * exactly-once requires staging to storage and an idempotent MERGE, which
  * is what [[graft.ops.Relational.tempFinalPromotion]] models.
  */
object Sinks {

  val JdbcBatchSize = 150 // main.py:53

  /** K1: the JDBC writer, configured like the reference's insert path.
    * Caller supplies url/table/properties; `batchsize` and append mode are
    * pinned here.
    */
  def jdbcWriter(df: DataFrame, url: String, table: String,
                 props: java.util.Properties = new java.util.Properties()): Unit = {
    props.setProperty("batchsize", JdbcBatchSize.toString)
    df.write.mode(SaveMode.Append).jdbc(url, table, props)
  }

  /** Date-partitioned parquet sink — the offline K1 stand-in and the layout
    * that makes K5 a partition drop. Repartitions by the partition column
    * first so each task writes one partition directory (no small-file
    * explosion at scale).
    */
  def writeDatePartitioned(df: DataFrame, dateCol: String, outDir: String): Unit =
    df.repartition(col(dateCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(dateCol)
      .parquet(outDir)

  /** K3: archive move `src` → `<backupDir>/Daily/<YYYY>/<YYYYMMDD>/<name>`
    * (layout main.py:366-368). Copy, then delete source on success —
    * skipped idempotently if the destination already exists (main.py:375,
    * 395-396). The business date comes from the filename (chars [5:13],
    * main.py:360); malformed names raise.
    */
  def archiveFile(spark: SparkSession, src: String, backupDir: String): String = {
    val name = src.split("/").last
    val yyyymmdd = name.slice(5, 13)
    require(yyyymmdd.matches("\\d{8}"), s"no yyyyMMdd at [5:13] of $name")
    val dst = s"$backupDir/Daily/${yyyymmdd.take(4)}/$yyyymmdd/$name"
    val conf = spark.sparkContext.hadoopConfiguration
    val srcPath = new Path(src)
    val dstPath = new Path(dst)
    val fs = FileSystem.get(srcPath.toUri, conf)
    if (!fs.exists(dstPath)) {
      fs.mkdirs(dstPath.getParent)
      FileUtil.copy(fs, srcPath, fs, dstPath, /*deleteSource=*/ false, conf)
      require(fs.exists(dstPath), s"archive copy failed: $dst")
      fs.delete(srcPath, false)
    }
    dst
  }

  /** K5: retention rewrite — keep rows with `dateCol >= asOf - days`
    * (exclusive delete bound, daily_cleanup.py:30) and overwrite `outDir`
    * date-partitioned. Returns (kept, deleted) counts.
    */
  def retentionRewrite(df: DataFrame, dateCol: String, asOf: java.sql.Date,
                       outDir: String, days: Int = 4): (Long, Long) = {
    val total = df.count()
    val kept = df.filter(Clock.retentionKeep(col(dateCol), lit(asOf), days))
    writeDatePartitioned(kept, dateCol, outDir)
    val n = kept.sparkSession.read.parquet(outDir).count()
    (n, total - n)
  }
}
