package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Exact distributed statistics monitors — the data-quality siblings of
  * q_benford/q_trend_slope: Pearson correlation from integer moments,
  * chi-squared independence over a contingency table, and Gini revenue
  * concentration. All three follow the suite's exactness discipline: every
  * intermediate is an exact integer (BIGINT where it provably fits,
  * DECIMAL(38,0)/HUGEINT where products exceed 2⁶³), divisions are either
  * integral (`div` / `//` on non-negative operands, so floor==trunc) or a
  * single shared-text IEEE double expression over exactly-agreed integer
  * operands — bit-identical on Spark and DuckDB.
  */
object Stats {

  /** q_corr_audit: exact Pearson correlation of line quantity vs line
    * price (cents) per return flag — the independence monitor a synthetic-
    * data / feature-leak audit runs (TPC-H's generator prices
    * independently of quantity, so the audit should report ≈0; a real POS
    * feed would show strong positive correlation, and a DRIFT of this
    * statistic is the alarm).
    *
    * Method: one map-side-combined pass accumulates the five moments
    * (n, Σx, Σy, Σxy, Σx², Σy²). x ≤ 50 keeps its products in BIGINT;
    * y is price cents (≤ ~10⁷), so y² sums through DECIMAL(38,0) on Spark
    * and HUGEINT on DuckDB — exact integers both ways. The only float op
    * is the final shared-formula `num / sqrt(vx·vy)`: num/vx/vy are
    * exactly-agreed integers, and IEEE cast/mult/sqrt/div are correctly
    * rounded on both engines, so the double is bit-identical.
    *
    * Scale shape: a single aggregation over a 3-column pruned scan —
    * 3 groups out, no join, no window. The moments themselves stay exact
    * to ~10²⁵ rows per group (DECIMAL(38,0) ceiling; at 100 TB lineitem is
    * ~10¹² rows — 13 orders of headroom).
    */
  def corrAudit(spark: SparkSession, dir: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val b = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
              col("l_quantity").cast("long").as("x"),
              round(col("l_extendedprice") * 100).cast("long").as("y"))
    b.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
           sum("x").as("sum_x"), sum("y").as("sum_y"),
           sum((col("x") * col("y")).cast(d38)).as("sxy"),
           sum((col("x") * col("x")).cast(d38)).as("sxx"),
           sum((col("y") * col("y")).cast(d38)).as("syy"))
      .withColumn("sxd", col("sum_x").cast(d38)) // Σy² overflows LONG at
      .withColumn("syd", col("sum_y").cast(d38)) // sf0.01 already (~10²²)
      .withColumn("num", col("n") * col("sxy") - col("sxd") * col("syd"))
      .withColumn("vx", col("n") * col("sxx") - col("sxd") * col("sxd"))
      .withColumn("vy", col("n") * col("syy") - col("syd") * col("syd"))
      .select(col("l_returnflag"), col("n").as("n_rows"),
              col("sum_x"), col("sum_y"),
              // zero-variance group → correlation undefined → NULL (never
              // a 0/0 whose NaN-vs-NULL semantics could differ cross-engine)
              when(col("vx") === 0 || col("vy") === 0, lit(null).cast("double"))
                .otherwise(col("num").cast("double") /
                  sqrt(col("vx").cast("double") * col("vy").cast("double")))
                .as("corr"))
      .orderBy("l_returnflag")
  }

  val corrAuditOracle: String =
    """WITH b AS (
      |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
      |         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
      |  FROM lineitem),
      |m AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |         CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
      |         CAST(SUM(x*y) AS HUGEINT) AS sxy,
      |         CAST(SUM(x*x) AS HUGEINT) AS sxx,
      |         SUM(CAST(y*y AS HUGEINT)) AS syy
      |  FROM b GROUP BY 1)
      |SELECT l_returnflag, n AS n_rows,
      |       CAST(sx AS BIGINT) AS sum_x, CAST(sy AS BIGINT) AS sum_y,
      |       CASE WHEN n*sxx - sx*sx = 0 OR n*syy - sy*sy = 0 THEN NULL
      |            ELSE CAST(n*sxy - sx*sy AS DOUBLE) /
      |                 SQRT(CAST(n*sxx - sx*sx AS DOUBLE) *
      |                      CAST(n*syy - sy*sy AS DOUBLE)) END AS corr
      |FROM m ORDER BY 1""".stripMargin

  /** q_chi2: chi-squared independence audit of the return-flag ×
    * line-status contingency table — the categorical sibling of
    * [[corrAudit]] (is the return outcome independent of fulfillment
    * status?). Each cell's χ² term is emitted in integer ppm so the gate
    * hashes exact values: term·10⁶ = (O·N − R·C)²·10⁶ div (R·C·N), all in
    * DECIMAL(38,0)/HUGEINT (O·N squared reaches ~10²³ at sf0.1 — far past
    * 2⁶³ but 15 digits inside the 38-digit ceiling). Operands are
    * non-negative so floor and truncating integral division agree.
    *
    * Scale shape: ONE map-side-combined aggregation over the two-column
    * scan produces the |flags|×|statuses| cell relation (6 rows); row
    * totals, column totals, and the grand total are re-aggregations OF
    * THE CELLS (never a second fact scan), joined back broadcast. At
    * 100 TB the fact pass is the same single shuffle of 6 partial rows
    * per task.
    */
  def chi2(spark: SparkSession, dir: String): DataFrame = {
    // pinned under the retained-cache convention: cell (|flags|×|statuses|
    // rows) feeds FOUR lazy branches of the returned plan — cells, row
    // totals, column totals, grand total — and without the pin each branch
    // would re-scan the fact table; the harness's per-query clearCache
    // releases it
    val cell = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag").as("returnflag"),
               col("l_linestatus").as("linestatus"))
      .agg(count(lit(1)).as("n_obs"))
      .persist()
    val rowT = cell.groupBy("returnflag").agg(sum("n_obs").as("rt"))
    val colT = cell.groupBy("linestatus").agg(sum("n_obs").as("ct"))
    val tot = cell.agg(sum("n_obs").as("n"))
    cell.join(broadcast(rowT), "returnflag")
      .join(broadcast(colT), "linestatus")
      .crossJoin(broadcast(tot))
      .withColumn("dev", (col("n_obs") * col("n") - col("rt") * col("ct"))
        .cast(DecimalType(38, 0)))
      .select(col("returnflag"), col("linestatus"), col("n_obs"),
              expr("(dev * dev * 1000000) div (CAST(rt AS DECIMAL(38,0)) * ct * n)")
                .as("term_ppm"))
      .orderBy("returnflag", "linestatus")
  }

  val chi2Oracle: String =
    """WITH cell AS (
      |  SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
      |         COUNT(*) AS n_obs
      |  FROM lineitem GROUP BY 1, 2),
      |r AS (SELECT returnflag, SUM(n_obs) AS rt FROM cell GROUP BY 1),
      |c AS (SELECT linestatus, SUM(n_obs) AS ct FROM cell GROUP BY 1),
      |t AS (SELECT SUM(n_obs) AS n FROM cell)
      |SELECT cell.returnflag, cell.linestatus, cell.n_obs,
      |       CAST((CAST(cell.n_obs * t.n - r.rt * c.ct AS HUGEINT) *
      |             CAST(cell.n_obs * t.n - r.rt * c.ct AS HUGEINT) * 1000000)
      |            // CAST(r.rt * c.ct * t.n AS HUGEINT) AS BIGINT) AS term_ppm
      |FROM cell
      |JOIN r ON cell.returnflag = r.returnflag
      |JOIN c ON cell.linestatus = c.linestatus
      |CROSS JOIN t
      |ORDER BY 1, 2""".stripMargin

  /** q_gini: per-nation Gini coefficient of customer lifetime revenue —
    * the concentration/inequality monitor (a training-data curation run
    * uses the same statistic to flag sources where a few documents carry
    * most of the tokens). Uses the rank formulation
    * `G = (2·Σ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx)` over revenues sorted within
    * each nation; ties in x leave the statistic invariant under any tie
    * order, so the custkey tiebreak is only for rank determinism, not a
    * semantic choice. Emitted in integer ppm via DECIMAL(38,0)/HUGEINT
    * floor division (numerator is provably non-negative; an all-zero
    * nation is guarded to 0 on both engines).
    *
    * Scale note: the rank runs in a window PARTITIONED BY nation over the
    * per-customer rollup. Nation cardinality is fixed (25), so at 100 TB
    * each partition holds ~10⁷ customers — sortable per-partition but
    * skew-prone; the scale path is to collapse to (nation, revenue-value)
    * groups first and rank value-groups via the two-phase
    * [[graft.plans.PrefixSum]] machinery (Σ i·x over a value group with
    * count c and preceding count P is x·(c·P + c·(c+1)/2)), which removes
    * the wide sort entirely. At fixture scales the direct rank is both
    * exact and the faster plan, and the formula is identical.
    */
  def gini(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = DecimalType(38, 0)
    val rev = Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir),
            col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_nationkey"))
      .agg(coalesce(sum(round(col("o_totalprice") * 100).cast("long")), lit(0L))
        .as("cents"))
    val i = row_number().over(
      Window.partitionBy("c_nationkey").orderBy("cents", "c_custkey"))
    rev.withColumn("i", i.cast("long"))
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n"),
           sum(col("cents").cast(d38)).as("sx"),
           sum((col("i").cast(d38) * col("cents")).cast(d38)).as("six"))
      .select(col("nationkey"), col("n").as("n_cust"),
              when(col("sx") === 0, lit(0L))
                .otherwise(expr(
                  "((2 * six - (n + 1) * sx) * 1000000) div (n * sx)"))
                .as("gini_ppm"),
              (col("sx").cast("double") / 100).cast("double").as("total_rev"))
      .orderBy("nationkey")
  }

  val giniOracle: String =
    """WITH rev AS (
      |  SELECT c.c_custkey, c.c_nationkey,
      |         COALESCE(CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
      |                       AS BIGINT), 0) AS cents
      |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      |  GROUP BY 1, 2),
      |rk AS (
      |  SELECT c_nationkey, cents,
      |         ROW_NUMBER() OVER (PARTITION BY c_nationkey
      |                            ORDER BY cents, c_custkey) AS i
      |  FROM rev),
      |agg AS (
      |  SELECT c_nationkey, COUNT(*) AS n, CAST(SUM(cents) AS HUGEINT) AS sx,
      |         CAST(SUM(i * cents) AS HUGEINT) AS six
      |  FROM rk GROUP BY 1)
      |SELECT c_nationkey AS nationkey, CAST(n AS BIGINT) AS n_cust,
      |       CASE WHEN sx = 0 THEN 0
      |            ELSE CAST(((2*six - (n+1)*sx) * 1000000) // (n * sx) AS BIGINT)
      |       END AS gini_ppm,
      |       CAST(CAST(sx AS DOUBLE) / 100 AS DOUBLE) AS total_rev
      |FROM agg ORDER BY 1""".stripMargin
}
