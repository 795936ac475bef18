package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  def chi2(spark: SparkSession, dir: String): DataFrame =
    chi2OfCells(Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag").as("returnflag"),
               col("l_linestatus").as("linestatus"))
      .agg(count(lit(1)).as("n_obs")))

  /** The χ² readout over an arbitrary (returnflag, linestatus, n_obs)
    * cell relation — split from [[chi2]] (the [[ksOfCounts]] discipline)
    * so the DECIMAL widening can be proven exact at PLANTED counts whose
    * products pass 2⁶³, without materializing 10⁹ fact rows (StatsSpec's
    * "chi2OfCells: deviation products past 2⁶³" test).
    */
  def chi2OfCells(cells: DataFrame): DataFrame = {
    // pinned under the retained-cache convention: cell (|flags|×|statuses|
    // rows) feeds FOUR lazy branches of the returned plan — cells, row
    // totals, column totals, grand total — and without the pin each branch
    // would re-scan the fact table; the harness's per-query clearCache
    // releases it
    val cell = cells.persist()
    val rowT = cell.groupBy("returnflag").agg(sum("n_obs").as("rt"))
    val colT = cell.groupBy("linestatus").agg(sum("n_obs").as("ct"))
    val tot = cell.agg(sum("n_obs").as("n"))
    // The 38-digit ceilings are GUARDED, not just documented (the
    // ksOfCounts discipline): under ANSI (the Spark 4 session default) a
    // decimal overflow already errors loudly, but an ANSI-OFF deployment
    // NULLs silently while the oracle's HUGEINT errors — divergent failure
    // modes. dev²·10⁶ stays inside DECIMAL(38,0) iff |dev| < 10¹⁶
    // (reachable near ~10¹² fact rows — the dev guard fires BEFORE any
    // overflow, in both ANSI modes), and the rt·ct·n denominator overflows
    // past ~4.6·10¹² rows (ANSI errors / the null-guard fires). Both
    // checks ride the |flags|×|statuses| cell relation — a handful of
    // rows, zero hot-path cost. StatsSpec forces both.
    def ceilGuard(c: Column, what: String, bad: Column): Column =
      when(bad, raise_error(concat(
        lit(s"chi2: $what exceeds the DECIMAL(38,0) exactness ceiling " +
          "(see scaladoc): "),
        coalesce(c.cast("string"), lit("overflow-null"))))).otherwise(c)
    cell.join(broadcast(rowT), "returnflag")
      .join(broadcast(colT), "linestatus")
      .crossJoin(broadcast(tot))
      // widen BEFORE the multiply: O·N and R·C individually pass 2⁶³ near
      // ~10⁹ fact rows (long math would wrap silently with ANSI off while
      // the oracle's HUGEINT errors — divergent failure modes); in
      // DECIMAL(38,0) both products and their difference stay exact to the
      // same 38-digit ceiling the squared term already documents
      .withColumn("dev0",
        col("n_obs").cast(DecimalType(38, 0)) * col("n") -
        col("rt").cast(DecimalType(38, 0)) * col("ct"))
      .withColumn("dev", ceilGuard(col("dev0"), "deviation |O*N - R*C|",
        col("dev0").isNull ||
          abs(col("dev0")) >= lit(new java.math.BigDecimal("10000000000000000"))))
      .withColumn("den0", expr("CAST(rt AS DECIMAL(38,0)) * ct * n"))
      // den0.isNull is the ANSI-off overflow shape; den0 === 0 (reachable
      // through the public chi2OfCells API with zero counts) would divide
      // by zero — loud under ANSI but a silent NULL term_ppm with ANSI
      // off, the divergent-failure class this guard exists to close
      .withColumn("den", ceilGuard(col("den0"), "denominator rt*ct*n",
        col("den0").isNull || col("den0") === 0))
      .select(col("returnflag"), col("linestatus"), col("n_obs"),
              expr("(dev * dev * 1000000) div den").as("term_ppm"))
      .orderBy("returnflag", "linestatus")
  }

  val chi2Oracle: String =
    """WITH cell AS (
      |  SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
      |         COUNT(*) AS n_obs
      |  FROM lineitem GROUP BY 1, 2),
      |r AS (SELECT returnflag, SUM(n_obs) AS rt FROM cell GROUP BY 1),
      |c AS (SELECT linestatus, SUM(n_obs) AS ct FROM cell GROUP BY 1),
      |t AS (SELECT SUM(n_obs) AS n FROM cell),
      |d AS (
      |  SELECT cell.returnflag, cell.linestatus, cell.n_obs,
      |         CAST(cell.n_obs AS HUGEINT) * t.n - CAST(r.rt AS HUGEINT) * c.ct AS dev,
      |         CAST(r.rt AS HUGEINT) * c.ct * t.n AS den
      |  FROM cell
      |  JOIN r ON cell.returnflag = r.returnflag
      |  JOIN c ON cell.linestatus = c.linestatus
      |  CROSS JOIN t)
      |SELECT returnflag, linestatus, n_obs,
      |       CAST((dev * dev * 1000000) // den AS BIGINT) AS term_ppm
      |FROM d
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
  /** Per-customer lifetime revenue in exact cents (order-less customers
    * kept at 0 via the left join) — the shared input of the concentration
    * monitors [[gini]] and [[hhi]]. */
  private def customerRevenueCents(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir),
            col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_nationkey"))
      .agg(coalesce(sum(round(col("o_totalprice") * 100).cast("long")), lit(0L))
        .as("cents"))

  def gini(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = DecimalType(38, 0)
    val rev = customerRevenueCents(spark, dir)
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

  /** q_hhi: per-nation Herfindahl–Hirschman concentration of customer
    * lifetime revenue — the squared-share sibling of [[gini]] (the same
    * statistic a curation run uses to flag sources where a few documents
    * carry most of the tokens; HHI is the one antitrust reviewers quote).
    * Computed WITHOUT per-share division: HHI·10⁶ = (Σx²·10⁶) div (Σx)²
    * — one floor division of exactly-agreed DECIMAL(38,0)/HUGEINT
    * integers (x² reaches ~10²⁶ for 100 TB lifetime-cents, far past 2⁶³
    * but 12 digits inside the 38-digit ceiling). All-zero nations are
    * guarded to 0, never a 0/0.
    *
    * Scale shape: strictly better than gini — two map-side-combined
    * aggregation levels (custkey → nation), no window, no rank, nothing
    * collected. The 25-group output is SF-invariant.
    */
  def hhi(spark: SparkSession, dir: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    customerRevenueCents(spark, dir)
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n"),
           sum(col("cents").cast(d38)).as("sx"),
           sum((col("cents").cast(d38) * col("cents")).cast(d38)).as("sxx"))
      .select(col("nationkey"), col("n").as("n_cust"),
              when(col("sx") === 0, lit(0L))
                .otherwise(expr("(sxx * 1000000) div (sx * sx)"))
                .as("hhi_ppm"),
              (col("sx").cast("double") / 100).cast("double").as("total_rev"))
      .orderBy("nationkey")
  }

  val hhiOracle: String =
    """WITH rev AS (
      |  SELECT c.c_custkey, c.c_nationkey,
      |         COALESCE(CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
      |                       AS BIGINT), 0) AS cents
      |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      |  GROUP BY 1, 2),
      |agg AS (
      |  SELECT c_nationkey, COUNT(*) AS n, CAST(SUM(cents) AS HUGEINT) AS sx,
      |         SUM(CAST(cents AS HUGEINT) * cents) AS sxx
      |  FROM rev GROUP BY 1)
      |SELECT c_nationkey AS nationkey, CAST(n AS BIGINT) AS n_cust,
      |       CASE WHEN sx = 0 THEN 0
      |            ELSE CAST((sxx * 1000000) // (sx * sx) AS BIGINT)
      |       END AS hhi_ppm,
      |       CAST(CAST(sx AS DOUBLE) / 100 AS DOUBLE) AS total_rev
      |FROM agg ORDER BY 1""".stripMargin

  /** Bucket count for [[decileGains]]. */
  val GainsBuckets = 10

  /** q_decile_gains: the cumulative-gains (lift) table — THE model/score
    * evaluation readout: customers ranked best-first by lifetime revenue,
    * split into [[GainsBuckets]] NTILE buckets, each bucket's exact
    * revenue and the CUMULATIVE revenue share in ppm ("the top decile
    * holds X% of the value"). The same table a curation run reads over
    * quality scores to choose a selection cutoff.
    *
    * Scale shape: ranks come from the two-phase
    * [[graft.plans.PrefixSum]] scaffold with value = 1 (the packScalable
    * usage — a GLOBAL row number at full shuffle width; the naive form is
    * `ntile(10) OVER (ORDER BY ...)`, an unpartitioned window over
    * corpus-cardinality customers, the exact q_rfm scale-sin this suite
    * rewrote away). The NTILE bucket is then derived from the rank in
    * CLOSED FORM (first n%b buckets get ⌈n/b⌉ rows — pure integer
    * arithmetic, exact on both engines without shared text), while the
    * ORACLE uses DuckDB's native NTILE — two genuinely different
    * derivations differentially checking each other. The only window is
    * the cumulative sum over the ≤10-row decile rollup (bucket-count
    * bounded by construction). Ranking is made a total order by the
    * (−cents, custkey) tiebreak, which NTILE bucket COUNTS don't depend
    * on but bucket CONTENTS do.
    */
  def decileGains(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = DecimalType(38, 0)
    // pinned under the retained-cache convention: the PrefixSum pass makes
    // three jobs over this rollup and the (n, Σ) totals a fourth
    val rev = customerRevenueCents(spark, dir)
      .withColumn("neg", -col("cents")).withColumn("_g", lit(0))
      .persist()
    val ranked = graft.plans.PrefixSum.exclusiveRunningSum(
        rev, lit(1L), Seq("_g"), Seq("neg", "c_custkey"), out = "rk0")
      .withColumn("rk", col("rk0") + 1)
    val tot = rev.agg(count(lit(1)).as("n"),
                      sum(col("cents").cast(d38)).as("tot_cents"))
    val w = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked.crossJoin(broadcast(tot))
      .withColumn("decile", expr(
        s"""CASE WHEN rk <= (n % $GainsBuckets) * ((n div $GainsBuckets) + 1)
           |THEN ((rk - 1) div ((n div $GainsBuckets) + 1)) + 1
           |ELSE (n % $GainsBuckets) +
           |     ((rk - 1 - (n % $GainsBuckets) * ((n div $GainsBuckets) + 1))
           |       div (n div $GainsBuckets)) + 1 END""".stripMargin))
      .groupBy(col("decile"), col("tot_cents"))
      .agg(count(lit(1)).as("n_cust"), sum(col("cents").cast(d38)).as("dc"))
      .withColumn("cum", sum("dc").over(w))
      .select(col("decile"), col("n_cust"),
              (col("dc").cast("double") / 100).cast("double").as("decile_rev"),
              when(col("tot_cents") === 0, lit(0L))
                .otherwise(expr("(cum * 1000000) div tot_cents"))
                .as("cum_share_ppm"))
      .orderBy("decile")
  }

  val decileGainsOracle: String =
    s"""WITH rev AS (
       |  SELECT c.c_custkey,
       |         COALESCE(CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
       |                       AS BIGINT), 0) AS cents
       |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
       |  GROUP BY 1),
       |t AS (SELECT COUNT(*) AS n, CAST(SUM(cents) AS HUGEINT) AS tot FROM rev),
       |rk AS (SELECT cents,
       |              NTILE($GainsBuckets) OVER (ORDER BY -cents, c_custkey) AS decile
       |       FROM rev),
       |d AS (SELECT decile, COUNT(*) AS n_cust,
       |             CAST(SUM(cents) AS HUGEINT) AS dc
       |      FROM rk GROUP BY 1),
       |c AS (SELECT decile, n_cust, dc,
       |             SUM(dc) OVER (ORDER BY decile) AS cum FROM d)
       |SELECT CAST(decile AS BIGINT) AS decile, n_cust,
       |       CAST(CAST(dc AS DOUBLE) / 100 AS DOUBLE) AS decile_rev,
       |       CAST(CASE WHEN tot = 0 THEN 0
       |                 ELSE (cum * 1000000) // tot END AS BIGINT) AS cum_share_ppm
       |FROM c CROSS JOIN t ORDER BY 1""".stripMargin

  /** The two populations compared by [[ksTest]] and [[mannWhitney]]:
    * returned (R) vs delivered-and-kept (N) line prices — the
    * did-returns-shift-the-price-distribution drift monitor. */
  val TwoSampleA = "R"
  val TwoSampleB = "N"

  /** Shared per-value counts relation for the two-sample rank statistics:
    * one map-side-combined pass collapses the fact table to
    * (price-cent value, count in A, count in B) — the ONLY relation the
    * rank machinery ever touches, bounded by the price domain rather
    * than the row count. */
  def twoSampleCountsOf(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_returnflag").isin(TwoSampleA, TwoSampleB))
      .select(round(col("l_extendedprice") * 100).cast("long").as("v"),
              (col("l_returnflag") === TwoSampleA).as("is_a"))
      .groupBy("v")
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("c1"),
           sum(when(col("is_a"), 0L).otherwise(1L)).as("c2"))

  private def twoSampleCounts(spark: SparkSession, dir: String): DataFrame =
    twoSampleCountsOf(Tables.lineitem(spark, dir))

  /** q_ks_test: EXACT two-sample Kolmogorov–Smirnov distance between the
    * returned-line and kept-line price distributions — the
    * distribution-drift monitor (the exact-statistic sibling of the
    * sketch-based q_quality_drift/q_embed_drift family; a curation
    * pipeline runs the same statistic between two snapshots or sources).
    *
    * D = max over the merged support of |F₁(v) − F₂(v)| is computed
    * without ANY division until the last line: the deviation is the
    * cross-multiplied integer |n₂·C₁(v) − n₁·C₂(v)| over inclusive
    * cumulative counts, its max is an exactly-agreed BIGINT, and
    * `d_num / (n₁·n₂)` is one shared-text IEEE division. Exact while
    * n₁·n₂ < 2⁶³ — samples up to ~3·10⁹ rows each; past that the
    * deviation must move to DECIMAL(38,0) (same bound class as the
    * documented stream long-sum ceiling).
    *
    * Scale shape: the fact collapses to the per-value counts relation in
    * one map-side-combined pass; BOTH cumulatives come from ONE pass of
    * the two-phase [[graft.plans.PrefixSum]] scaffold over that counts
    * relation (value-bucketed, full shuffle-width parallelism — never an
    * unpartitioned window over the support, which at 100 TB is millions
    * of distinct cents), with (c₁, c₂) packed into one long as
    * c₁·2³¹ + c₂ — sums of packs are packs of sums with no cross-field
    * carry while each sample stays below 2³¹ rows (a TIGHTER bound than
    * the 2⁶³ deviation ceiling above, same ~10⁹ class; the first draft
    * ran the scaffold twice, measured 5.0-5.7 s vs ~3 s packed at sf0.1);
    * the readout is a 1-row max.
    */
  def ksTest(spark: SparkSession, dir: String): DataFrame =
    ksOfCounts(twoSampleCounts(spark, dir))

  /** Pack base for the one-pass (c₁, c₂) prefix sum: fields stay
    * carry-free while every cumulative count is < 2³¹. */
  private val PackBase = 1L << 31

  /** The KS readout over an arbitrary (v, c1, c2) counts relation — shared
    * by the batch [[ksTest]] and the streaming face (which drains the same
    * counts as its complete-mode aggregation).
    *
    * The [[PackBase]] exactness ceiling is GUARDED, not just documented:
    * a cumulative count reaching 2³¹ would carry into the packed c₁ field
    * and corrupt both cumulatives silently — so the totals (which bound
    * every cumulative) are asserted in-plan and the query FAILS with a
    * named error past ~2·10⁹ rows per sample instead of emitting wrong
    * values. The guard rides the 1-row totals aggregate (evaluated once,
    * zero hot-path cost) and is a no-op below the ceiling.
    */
  def ksOfCounts(counts: DataFrame): DataFrame = {
    // pinned under the retained-cache convention (see chi2): the PrefixSum
    // pass makes three jobs over its input (quantile probe, offsets,
    // main) — without the pin every one re-runs the fact collapse; the
    // harness's per-query clearCache releases it
    val pts = counts.withColumn("_g", lit(0)).persist()
    val cum = graft.plans.PrefixSum.exclusiveRunningSum(
      pts, col("c1") * lit(PackBase) + col("c2"), Seq("_g"), Seq("v"), out = "p")
      .withColumn("_inc", col("p") + col("c1") * lit(PackBase) + col("c2"))
      .withColumn("cc1", expr(s"_inc div ${PackBase}L"))
      .withColumn("cc2", col("_inc") % lit(PackBase))
    // the ceiling guard: every cumulative is bounded by its total, so
    // checking (n1, n2) once here covers every packed row downstream
    def ceilGuard(c: Column, name: String): Column =
      when(c >= lit(PackBase), raise_error(concat(
        lit(s"ksOfCounts: $name >= 2^31 — packed (c1,c2) prefix sum would " +
          "carry across fields; split the pass (see PackBase scaladoc): "),
        c.cast("string")))).otherwise(c)
    val tot = pts.agg(sum("c1").as("n1"), sum("c2").as("n2"))
      .select(ceilGuard(col("n1"), "n1").as("n1"),
              ceilGuard(col("n2"), "n2").as("n2"))
    cum.crossJoin(broadcast(tot))
      .select(col("n1"), col("n2"),
              abs(col("n2") * col("cc1") - col("n1") * col("cc2")).as("dev"))
      .groupBy("n1", "n2")
      .agg(max("dev").as("d_num"))
      .select(col("n1"), col("n2"), col("d_num"),
              // an empty population → D undefined → NULL, never a
              // cross-engine 0/0 (the corrAudit guard discipline)
              when(col("n1") === 0 || col("n2") === 0, lit(null).cast("double"))
                .otherwise(col("d_num").cast("double") /
                  (col("n1").cast("double") * col("n2").cast("double")))
                .as("ks_d"))
  }

  val ksTestOracle: String =
    s"""WITH pts AS (
       |  SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
       |         SUM(CASE WHEN l_returnflag = '$TwoSampleA' THEN 1 ELSE 0 END) AS c1,
       |         SUM(CASE WHEN l_returnflag = '$TwoSampleB' THEN 1 ELSE 0 END) AS c2
       |  FROM lineitem WHERE l_returnflag IN ('$TwoSampleA', '$TwoSampleB')
       |  GROUP BY 1),
       |cum AS (
       |  SELECT v, SUM(c1) OVER (ORDER BY v) AS cc1,
       |         SUM(c2) OVER (ORDER BY v) AS cc2
       |  FROM pts),
       |tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
       |               CAST(SUM(c2) AS BIGINT) AS n2 FROM pts)
       |SELECT n1, n2, CAST(MAX(ABS(n2*cc1 - n1*cc2)) AS BIGINT) AS d_num,
       |       CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
       |            ELSE CAST(MAX(ABS(n2*cc1 - n1*cc2)) AS DOUBLE) /
       |                 (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) END AS ks_d
       |FROM cum CROSS JOIN tot GROUP BY 1, 2""".stripMargin

  /** q_mann_whitney: EXACT Mann–Whitney U (Wilcoxon rank-sum) between
    * the same two populations as [[ksTest]] — the nonparametric
    * did-the-median-shift monitor. Ties get textbook midranks, kept
    * integral by working in DOUBLED rank units: a value group with
    * counts (c₁, c₂) and P predecessors contributes c₁·(2P + t + 1) to
    * 2·R₁ (t = c₁+c₂; midrank = P + (t+1)/2), so 2R₁ and
    * 2U₁ = 2R₁ − n₁(n₁+1) are exactly-agreed BIGINTs and the AUC
    * readout U₁/(n₁n₂) is one shared-text IEEE division. The ORACLE
    * derives 2R₁ through a genuinely different formulation — per-ROW
    * min-ranks via RANK() plus the per-value tie count (2·midrank =
    * 2·rank + cnt − 1) — so the value-group arithmetic and the row-rank
    * window differentially check each other.
    *
    * Scale shape: same counts-relation collapse as [[ksTest]], ONE
    * PrefixSum pass (over t), a 1-row rollup. 2R₁ ≤ 2N² bounds
    * exactness to the same ~3·10⁹-row class documented there.
    */
  def mannWhitney(spark: SparkSession, dir: String): DataFrame =
    mannWhitneyOfCounts(twoSampleCounts(spark, dir))

  /** The Mann-Whitney readout over an arbitrary (v, c1, c2) counts
    * relation — split out (the [[ksOfCounts]] discipline) so the
    * exactness ceiling can be exercised at planted counts.
    *
    * The 2⁶³ ceiling is GUARDED, not just documented: the doubled-unit
    * rank sum is bounded by n₁·(2N+1) (N = n₁+n₂ — every doubled midrank
    * is ≤ 2N+1), and past 2⁶³ the BIGINT sum wraps silently (ANSI off)
    * while the oracle's HUGEINT stays exact — divergent failure modes,
    * the exact class the chi2/ksOfCounts guards close. The guard rides
    * the 1-row totals aggregate (overflow-free: an integral `div` bound
    * test, never the product itself) and is a no-op below ~10⁹ rows per
    * sample.
    */
  def mannWhitneyOfCounts(counts: DataFrame): DataFrame = {
    // pinned for the same multi-pass reason as in ksTest
    val pts = counts.withColumn("_g", lit(0)).persist()
    val cum = graft.plans.PrefixSum.exclusiveRunningSum(
      pts, col("c1") + col("c2"), Seq("_g"), Seq("v"), out = "p")
    val tot = pts.agg(sum("c1").as("n1"), sum("c2").as("n2"))
      .select(
        when(col("n1") > expr(s"${Long.MaxValue}L div (2 * (n1 + n2) + 1)"),
          raise_error(concat(
            lit("mannWhitney: doubled rank sum n1*(2N+1) would exceed 2^63 — " +
              "move r1_x2 to DECIMAL(38,0) (see scaladoc): n1="),
            col("n1").cast("string"), lit(" n2="), col("n2").cast("string"))))
          .otherwise(col("n1")).as("n1"),
        col("n2"))
    // grouped by the broadcast (n1, n2) scalars — NOT a global agg — so an
    // empty counts relation yields ZERO rows exactly like the oracle's
    // grouped form (a global .agg would emit one all-null row and the
    // one-empty-population AUC would divide to NaN); ksOfCounts has the
    // same shape for the same reason
    cum.crossJoin(broadcast(tot))
      .select(col("n1"), col("n2"),
              (col("c1") * (lit(2) * col("p") + col("c1") + col("c2") + lit(1)))
        .as("contrib"))
      .groupBy("n1", "n2")
      .agg(sum("contrib").as("r1_x2"))
      .select(col("n1"), col("n2"), col("r1_x2"),
              (col("r1_x2") - col("n1") * (col("n1") + lit(1))).as("u1_x2"))
      .select(col("n1"), col("n2"), col("r1_x2"), col("u1_x2"),
              // an empty population → AUC undefined → NULL (same guard
              // discipline as ks_d/corr)
              when(col("n1") === 0 || col("n2") === 0, lit(null).cast("double"))
                .otherwise(col("u1_x2").cast("double") /
                  (lit(2.0) * col("n1").cast("double") * col("n2").cast("double")))
                .as("auc"))
  }

  val mannWhitneyOracle: String =
    s"""WITH b AS (
       |  SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
       |         l_returnflag = '$TwoSampleA' AS s1
       |  FROM lineitem WHERE l_returnflag IN ('$TwoSampleA', '$TwoSampleB')),
       |r AS (
       |  SELECT s1, RANK() OVER (ORDER BY v) AS rk,
       |         COUNT(*) OVER (PARTITION BY v) AS cnt
       |  FROM b),
       |tot AS (SELECT CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |               CAST(SUM(CASE WHEN s1 THEN 0 ELSE 1 END) AS BIGINT) AS n2
       |        FROM b)
       |SELECT n1, n2,
       |       CAST(SUM(CASE WHEN s1 THEN 2*rk + cnt - 1 ELSE 0 END) AS BIGINT)
       |         AS r1_x2,
       |       CAST(SUM(CASE WHEN s1 THEN 2*rk + cnt - 1 ELSE 0 END)
       |              - n1*(n1+1) AS BIGINT) AS u1_x2,
       |       CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
       |            ELSE CAST(SUM(CASE WHEN s1 THEN 2*rk + cnt - 1 ELSE 0 END)
       |                        - n1*(n1+1) AS DOUBLE) /
       |                 (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
       |       END AS auc
       |FROM r CROSS JOIN tot GROUP BY 1, 2""".stripMargin

  /** q_cramers_v: Cramér's V effect size over the [[chi2]] contingency
    * table — the is-the-dependence-MATERIAL summary the per-cell χ² terms
    * don't answer on their own. Aggregates the chi2 relation itself
    * (χ²·10⁶ = Σ term_ppm — a sum of exactly-agreed integers, so the ppm
    * quantization of the per-cell floor division is inherited, never
    * re-divided), then V = √(χ²_ppm / (10⁶ · n · min(r−1, c−1))) as one
    * shared-text IEEE expression. A degenerate 1×c / r×1 table is
    * guarded to NULL (never a 0/0).
    *
    * Scale shape: everything downstream of the single fact pass inside
    * [[chi2]] operates on the |flags|×|statuses| cell relation; the two
    * COUNT(DISTINCT dim) run on those few rows, not the fact.
    */
  def cramersV(spark: SparkSession, dir: String): DataFrame =
    chi2(spark, dir)
      .agg(sum("n_obs").as("n"),
           countDistinct("returnflag").as("r"),
           countDistinct("linestatus").as("c"),
           sum("term_ppm").as("chi2_ppm"))
      .select(col("n"), least(col("r") - 1, col("c") - 1).as("df_min"),
              col("chi2_ppm"))
      .select(col("n"), col("df_min"), col("chi2_ppm"),
              when(col("df_min") === 0, lit(null).cast("double"))
                .otherwise(sqrt(col("chi2_ppm").cast("double") /
                  (lit(1000000.0) * col("n").cast("double") *
                    col("df_min").cast("double"))))
                .as("cramers_v"))

  val cramersVOracle: String =
    s"""WITH chi AS (${chi2Oracle.replace("ORDER BY 1, 2", "")}),
       |agg AS (
       |  SELECT CAST(SUM(n_obs) AS BIGINT) AS n,
       |         LEAST(COUNT(DISTINCT returnflag) - 1,
       |               COUNT(DISTINCT linestatus) - 1) AS df_min,
       |         CAST(SUM(term_ppm) AS BIGINT) AS chi2_ppm
       |  FROM chi)
       |SELECT n, df_min, chi2_ppm,
       |       CASE WHEN df_min = 0 THEN NULL
       |            ELSE SQRT(CAST(chi2_ppm AS DOUBLE) /
       |                   (1000000.0 * CAST(n AS DOUBLE) *
       |                    CAST(df_min AS DOUBLE))) END AS cramers_v
       |FROM agg""".stripMargin
}
