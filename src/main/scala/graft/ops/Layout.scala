package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Physical-layout operators: multidimensional clustering for data
  * skipping (builder-prompt scale requirement; complements the
  * single-key bucketed layout in [[Relational.stageBucketedTables]]).
  *
  * At 100 TB the scan cost of a selective two-dimensional predicate
  * (`l_partkey IN (...) AND l_shipdate BETWEEN ...`) is decided by the
  * FILE LAYOUT, not the plan: parquet min/max footers prune whole files,
  * but only along dimensions the layout actually clusters. A date-linear
  * sort gives perfect date pruning and ZERO partkey pruning (every file
  * spans the full partkey range); interleaving the two dimensions on a
  * Z-order (Morton) curve bounds BOTH per-file extents, so either
  * predicate — or their conjunction — skips most files.
  */
object Layout {

  /** Bits per dimension for the Morton interleave (8 → a 256×256 cell
    * grid, 16-bit z-values).
    */
  val ZBits = 8

  /** Cells per layout "file" in the audit (65536 cells / 2048 = 32 files
    * — each file is a contiguous range of the curve, exactly how a
    * z-ordered write splits into row groups).
    */
  val ZCellsPerFile = 2048L

  /** Morton interleave of two [[ZBits]]-bit integers: dimension `a`'s bit
    * i lands at position 2i+1, `b`'s at 2i. Bits are disjoint, so the
    * combine is a plain sum — fully codegen'd integer arithmetic, no UDF.
    */
  def morton(a: Column, b: Column): Column =
    (0 until ZBits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)

  private def mortonSql(a: String, b: String): String =
    (0 until ZBits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i + 1}) + ((($b >> $i) & 1) << ${2 * i})"
    }.mkString(" + ")

  /** q_zorder_layout: the data-skipping audit for the two candidate
    * layouts of the (l_partkey, l_shipdate) query plane — `zorder`
    * (Morton-curve cell order) vs `linear_date` (date-major
    * lexicographic, the layout a plain `ORDER BY shipdate, partkey`
    * write produces). Both are bijections of the same 256×256 cell grid
    * split into the same 32 contiguous-curve "files"; the audit reports
    * each file's row count and its min/max extent in BOTH dimensions —
    * exactly the parquet footer stats a scan would prune on. The spans
    * tell the story: linear files cover 1/32 of the date range but the
    * ENTIRE partkey range (no partkey file ever skipped); z-order files
    * bound both extents near sqrt(cells), so selective predicates on
    * either dimension prune most files.
    *
    * Scale shape: dimension bounds come from one narrow min/max
    * aggregation (inlined as literals); bucketing, the Morton interleave,
    * and file assignment are codegen'd integer expressions in a single
    * scan; the audit is one map-side combined aggregation over ≤64
    * (layout, file) groups. Writing the real layout at scale is
    * `repartitionByRange(zval)` + sortWithinPartitions — the same
    * write-once economics as the bucketed tables.
    */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val n = 1 << ZBits
    val l = Tables.lineitem(spark, dir).select(
      col("l_partkey"), to_date(col("l_shipdate")).as("d"))
    // dimension bounds: one narrow aggregation, inlined as literals so
    // every pass buckets identically (PrefixSum's bounds idiom)
    // bounds collect decodes only primitives (longs + ISO strings) — never
    // java.sql.Date, whose driver-side row decode is JVM-sensitive
    val b = l.agg(min("l_partkey"), max("l_partkey"),
      min("d").cast("string"), max("d").cast("string")).head()
    val (pkMin, pkMax) = (b.getLong(0), b.getLong(1))
    val (dMinL, dMaxL) =
      (java.time.LocalDate.parse(b.getString(2)), java.time.LocalDate.parse(b.getString(3)))
    val dMin = java.sql.Date.valueOf(dMinL)
    val dSpan = java.time.temporal.ChronoUnit.DAYS.between(dMinL, dMaxL) + 1
    // integer `div` throughout (all values non-negative, so truncation ==
    // floor == the oracle's `//`) — never double division
    val bucketed = l.select(
      expr(s"(l_partkey - $pkMin) * $n div ${pkMax - pkMin + 1}").as("pk_b"),
      (datediff(col("d"), lit(dMin)).cast("long") * n).as("dd"))
      .select(col("pk_b"), expr(s"dd div $dSpan").as("dt_b"))
    val cells = bucketed.select(
      col("pk_b"), col("dt_b"),
      morton(col("pk_b"), col("dt_b")).as("z"),
      (col("dt_b") * n + col("pk_b")).as("lin"))
    val both =
      cells.select(lit("zorder").as("layout"),
        expr(s"z div $ZCellsPerFile").as("file_id"),
        col("pk_b"), col("dt_b"))
      .unionByName(
        cells.select(lit("linear_date").as("layout"),
          expr(s"lin div $ZCellsPerFile").as("file_id"),
          col("pk_b"), col("dt_b")))
    both.groupBy("layout", "file_id")
      .agg(count(lit(1)).as("n_rows"),
           (max("pk_b") - min("pk_b") + 1).as("pk_span"),
           (max("dt_b") - min("dt_b") + 1).as("dt_span"))
      .orderBy("layout", "file_id")
  }

  val zorderLayoutOracle: String = {
    val n = 1 << ZBits
    s"""WITH l AS (SELECT l_partkey, CAST(l_shipdate AS DATE) AS d FROM lineitem),
       |b AS (SELECT MIN(l_partkey) AS pk_min, MAX(l_partkey) AS pk_max,
       |             MIN(d) AS d_min, MAX(d) AS d_max FROM l),
       |cells AS (
       |  SELECT CAST(((l_partkey - pk_min) * $n) // (pk_max - pk_min + 1) AS BIGINT) AS pk_b,
       |         CAST((date_diff('day', d_min, d) * $n)
       |              // (date_diff('day', d_min, d_max) + 1) AS BIGINT) AS dt_b
       |  FROM l, b),
       |z AS (SELECT pk_b, dt_b,
       |             ${mortonSql("pk_b", "dt_b")} AS z,
       |             dt_b * $n + pk_b AS lin
       |      FROM cells),
       |uni AS (
       |  SELECT 'zorder' AS layout, z // $ZCellsPerFile AS file_id, pk_b, dt_b FROM z
       |  UNION ALL
       |  SELECT 'linear_date', lin // $ZCellsPerFile, pk_b, dt_b FROM z)
       |SELECT layout, CAST(file_id AS BIGINT) AS file_id,
       |       COUNT(*) AS n_rows,
       |       CAST(MAX(pk_b) - MIN(pk_b) + 1 AS BIGINT) AS pk_span,
       |       CAST(MAX(dt_b) - MIN(dt_b) + 1 AS BIGINT) AS dt_span
       |FROM uni GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }
}
