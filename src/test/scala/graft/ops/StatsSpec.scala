package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-data proofs for the decision-support shapes (Q17/Q15/Q22/Q2
  * skeletons in Relational) and the exact statistics monitors (Stats):
  * every hand-computable branch — gates, ties, guards — is pinned on a
  * fixture small enough to verify by hand, then the real fixture run is
  * checked for structural invariants (the value-level check is the
  * driver's DuckDB oracle gate).
  */
class StatsSpec extends SparkSpec {

  test("smallQtyRevenue: only strictly-below-20%-of-avg lines count; constant-qty parts never fire") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("smallqty").toFile.getAbsolutePath
    // part 10: quantities 1,10,10,10,10 (n=5, Σ=41) → gate 5·q·5 < 41
    //   holds only for q=1 (25<41); part 20: constant qty 5 → for a
    //   constant series 5·q·n = 5·Σ, never strictly below → no row
    Seq((10L, 1.0, 7.77), (10L, 10.0, 1.0), (10L, 10.0, 1.0),
        (10L, 10.0, 1.0), (10L, 10.0, 1.0),
        (20L, 5.0, 9.0), (20L, 5.0, 9.0))
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    Seq((10L, "B1"), (20L, "B2")).toDF("p_partkey", "p_brand")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/part.parquet")
    val out = Relational.smallQtyRevenue(spark, tmp).collect()
      .map(r => r.getAs[String]("brand") ->
        ((r.getAs[Long]("n_small"), r.getAs[Double]("lost_revenue")))).toMap
    assert(out == Map("B1" -> ((1L, 7.77))), out.toString)
  }

  test("topSupplier: argmax-all emits every tied winner; window bounds are [from, to)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("topsupp").toFile.getAbsolutePath
    // supp 1 and supp 2 tie at 100.00 inside Q1-1996; supp 3's 999 is
    // before the window; supp 4's 500 lands ON the exclusive upper bound
    Seq((1L, "1996-02-01", 100.0), (2L, "1996-01-15", 60.0),
        (2L, "1996-03-31", 40.0), (3L, "1995-12-31", 999.0),
        (4L, Relational.TopSupplierTo, 500.0))
      .toDF("l_suppkey", "d", "l_extendedprice")
      .withColumn("l_shipdate", to_timestamp(col("d")))
      .withColumn("l_discount", lit(0.0))
      .select("l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = Relational.topSupplier(spark, tmp).collect()
      .map(r => (r.getAs[Long]("s_suppkey"), r.getAs[Double]("total_rev")))
    assert(out.toSeq == Seq((1L, 100.0), (2L, 100.0)), out.mkString(","))
  }

  test("balanceAudit: strict above-average balance gate plus recency anti-join") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("balaudit").toFile.getAbsolutePath
    // positive balances 100, 10, 80 → Σ=190, n=3 (avg 63.33): cust 1 and 4
    // pass the gate; cust 3's negative balance is excluded from BOTH the
    // average and the audit. cust 1 has a recent order → anti-joined away;
    // cust 4's only order predates the cutoff → kept.
    Seq((1L, 0, 100.0), (2L, 0, 10.0), (3L, 1, -5.0), (4L, 1, 80.0))
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    Seq((1L, "1999-06-01"), (4L, "1998-01-01"))
      .toDF("o_custkey", "d")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val out = Relational.balanceAudit(spark, tmp).collect()
      .map(r => r.getAs[Int]("nationkey") ->
        ((r.getAs[Long]("n_cust"), r.getAs[Double]("total_bal")))).toMap
    assert(out == Map(1 -> ((1L, 80.0))), out.toString)
  }

  test("cheapestSupplier: struct-min picks min price then min suppkey; counts per winner") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("cheapest").toFile.getAbsolutePath
    // part 1: supp 9 wins on price; part 2: supp 3 and 5 tie at 4.00 →
    // the smaller suppkey wins; part 3: sole quote
    Seq((1L, 5L, 2.00), (1L, 3L, 2.00), (1L, 9L, 1.00),
        (2L, 5L, 4.00), (2L, 3L, 4.00),
        (3L, 3L, 9.99))
      .toDF("l_partkey", "l_suppkey", "l_extendedprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = Relational.cheapestSupplier(spark, tmp).collect()
      .map(r => (r.getAs[Long]("s_suppkey"), r.getAs[Long]("n_parts"),
                 r.getAs[Long]("sum_min_cents")))
    assert(out.toSeq == Seq((3L, 2L, 1399L), (9L, 1L, 100L)), out.mkString(","))
  }

  test("lateOrders: EXISTS semantics — one count per order however many lines are late; boundary day is on-time") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("lateord").toFile.getAbsolutePath
    // order 1: TWO late lines → still counts once; order 2: shipped at
    // exactly +30 days → NOT late (strict >); order 3: one late line of
    // three; order 4: no lines at all
    Seq((1L, "1-URGENT", "1997-01-01"), (2L, "1-URGENT", "1997-01-01"),
        (3L, "2-HIGH", "1997-06-01"), (4L, "2-HIGH", "1997-06-01"))
      .toDF("o_orderkey", "o_orderpriority", "d")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    Seq((1L, "1997-03-01"), (1L, "1997-04-01"),
        (2L, "1997-01-31"),
        (3L, "1997-06-05"), (3L, "1997-06-10"), (3L, "1997-08-01"))
      .toDF("l_orderkey", "d")
      .withColumn("l_shipdate", to_timestamp(col("d"))).drop("d")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = Relational.lateOrders(spark, tmp).collect()
      .map(r => r.getAs[String]("o_orderpriority") -> r.getAs[Long]("n_late_orders"))
    assert(out.toSeq == Seq("1-URGENT" -> 1L, "2-HIGH" -> 1L), out.mkString(","))
  }

  test("corrAudit: exact ±1 on perfectly (anti)correlated groups; zero-variance guard yields NULL") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("corr").toFile.getAbsolutePath
    // A: y = 100x → corr exactly 1.0 (num=600, vx=6, vy=60000,
    // sqrt(360000)=600 — all exact in IEEE); B: y = 400-100x → -1.0;
    // C: constant y → vy=0 → NULL, never 0/0
    val rows =
      Seq(("A", 1.0, 1.00), ("A", 2.0, 2.00), ("A", 3.0, 3.00),
          ("B", 1.0, 3.00), ("B", 2.0, 2.00), ("B", 3.0, 1.00),
          ("C", 1.0, 1.00), ("C", 2.0, 1.00), ("C", 3.0, 1.00))
    rows.toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = Stats.corrAudit(spark, tmp).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("sum_x"),
          r.getAs[Long]("sum_y"), Option(r.getAs[java.lang.Double]("corr"))))).toMap
    assert(out("A") == ((3L, 6L, 600L, Some(1.0))), out.toString)
    assert(out("B") == ((3L, 6L, 600L, Some(-1.0))), out.toString)
    assert(out("C") == ((3L, 6L, 300L, None)), out.toString)
  }

  test("corrAudit: fixture correlations are defined and inside [-1, 1]") {
    val out = Stats.corrAudit(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val c = r.getAs[java.lang.Double]("corr")
      assert(c != null && !c.isNaN && math.abs(c) <= 1.0, r.toString)
    }
  }

  test("chi2: independent table → all-zero terms; symmetric 2×2 skew → exact equal terms") {
    import spark.implicits._
    def run(cells: Seq[(String, String, Int)]): Map[(String, String), (Long, Long)] = {
      val tmp = Files.createTempDirectory("chi2").toFile.getAbsolutePath
      cells.flatMap { case (rf, ls, n) => Seq.fill(n)((rf, ls)) }
        .toDF("l_returnflag", "l_linestatus")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
      Stats.chi2(spark, tmp).collect()
        .map(r => (r.getAs[String]("returnflag"), r.getAs[String]("linestatus")) ->
          ((r.getAs[Long]("n_obs"), r.getAs[Long]("term_ppm")))).toMap
    }
    // perfectly independent: every O·N = R·C → every term 0
    val indep = run(Seq(("A", "F", 10), ("A", "O", 10), ("B", "F", 10), ("B", "O", 10)))
    assert(indep.values.forall(_._2 == 0L), indep.toString)
    // symmetric skew: dev = 30·80 − 40·40 = 800 in every cell, R·C·N equal
    // → term = 800²·10⁶ / (40·40·80) = χ²-term 5 exactly = 5·10⁶ ppm, all four
    val skew = run(Seq(("A", "F", 30), ("A", "O", 10), ("B", "F", 10), ("B", "O", 30)))
    assert(skew.size == 4 && skew.values.forall(_._2 == 5000000L), skew.toString)
  }

  test("chi2: fixture terms are non-negative and cell counts conserve the fact count") {
    val out = Stats.chi2(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Long]("term_ppm") >= 0L, r.toString))
    assert(out.map(_.getAs[Long]("n_obs")).sum ==
      graft.Tables.lineitem(spark, sf0001).count())
  }

  test("gini: hand-computed concentration, equal-wealth zero, and the all-zero-nation guard") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("gini").toFile.getAbsolutePath
    // nation 0: revenues 0 (no orders), 100 (two 0.50 orders), 200 cents →
    //   G = (2·800 − 4·300)/(3·300) = 400/900 → 444444 ppm
    // nation 1: both equal → 0; nation 2: sole customer, zero revenue →
    //   n·Σx = 0 → guarded to 0, not a division error
    Seq((11L, 0), (12L, 0), (13L, 0), (21L, 1), (22L, 1), (31L, 2))
      .toDF("c_custkey", "c_nationkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    Seq((12L, 0.50), (12L, 0.50), (13L, 2.00), (21L, 0.50), (22L, 0.50))
      .toDF("o_custkey", "o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val out = Stats.gini(spark, tmp).collect()
      .map(r => r.getAs[Int]("nationkey") ->
        ((r.getAs[Long]("n_cust"), r.getAs[Long]("gini_ppm"),
          r.getAs[Double]("total_rev")))).toMap
    assert(out(0) == ((3L, 444444L, 3.0)), out.toString)
    assert(out(1) == ((2L, 0L, 1.0)), out.toString)
    assert(out(2) == ((1L, 0L, 0.0)), out.toString)
  }

  test("gini: fixture coefficients live in [0, 1e6) and customers conserve") {
    val out = Stats.gini(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val g = r.getAs[Long]("gini_ppm")
      assert(g >= 0L && g < 1000000L, r.toString)
    }
    assert(out.map(_.getAs[Long]("n_cust")).sum ==
      graft.Tables.customer(spark, sf0001).count())
  }
}
