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

  test("hhi: equal split halves, a monopolist saturates, all-zero nations guard to 0") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("hhi").toFile.getAbsolutePath
    // nation 0: two equal customers → HHI = 1/2 = 500000 ppm; nation 1:
    // one customer owns everything → 10⁶ ppm; nation 2: zero revenue →
    // guarded 0, never 0/0
    Seq((11L, 0), (12L, 0), (21L, 1), (31L, 2))
      .toDF("c_custkey", "c_nationkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    Seq((11L, 1.00), (12L, 1.00), (21L, 3.00))
      .toDF("o_custkey", "o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val out = Stats.hhi(spark, tmp).collect()
      .map(r => r.getAs[Int]("nationkey") ->
        ((r.getAs[Long]("n_cust"), r.getAs[Long]("hhi_ppm"),
          r.getAs[Double]("total_rev")))).toMap
    assert(out(0) == ((2L, 500000L, 2.0)), out.toString)
    assert(out(1) == ((1L, 1000000L, 3.0)), out.toString)
    assert(out(2) == ((1L, 0L, 0.0)), out.toString)
  }

  test("decileGains: hand-computed exact gains table; n < buckets degenerates to one row per tile") {
    import spark.implicits._
    def run(custs: Seq[Long], orders: Seq[(Long, Double)]): Seq[(Long, Long, Double, Long)] = {
      val tmp = Files.createTempDirectory("gains").toFile.getAbsolutePath
      custs.map(c => (c, 0)).toDF("c_custkey", "c_nationkey")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/customer.parquet")
      orders.toDF("o_custkey", "o_totalprice")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/orders.parquet")
      val out = withClearCache {
        Stats.decileGains(spark, tmp).collect()
          .map(r => (r.getAs[Long]("decile"), r.getAs[Long]("n_cust"),
                     r.getAs[Double]("decile_rev"), r.getAs[Long]("cum_share_ppm")))
      }
      out.toSeq
    }
    // 10 customers, revenues 0.10..0.01 → exactly one per decile, ranked
    // best-first; cumulative ppm = floor(cum·10⁶/55) at every row and
    // EXACTLY 10⁶ at the last
    val ten = run((1L to 10L),
                  (1L to 10L).map(c => (c, (11 - c).toDouble / 100)))
    assert(ten == Seq(
      (1L, 1L, 0.10, 181818L), (2L, 1L, 0.09, 345454L), (3L, 1L, 0.08, 490909L),
      (4L, 1L, 0.07, 618181L), (5L, 1L, 0.06, 727272L), (6L, 1L, 0.05, 818181L),
      (7L, 1L, 0.04, 890909L), (8L, 1L, 0.03, 945454L), (9L, 1L, 0.02, 981818L),
      (10L, 1L, 0.01, 1000000L)), ten.mkString(","))
    // n = 3 < buckets: NTILE semantics give each row its own tile 1..3
    val three = run(Seq(1L, 2L, 3L), Seq((1L, 0.03), (2L, 0.02), (3L, 0.01)))
    assert(three.map(t => (t._1, t._2)) == Seq((1L, 1L), (2L, 1L), (3L, 1L)),
           three.mkString(","))
  }

  test("chi2OfCells: deviation products past 2⁶³ stay exact through the DECIMAL widening") {
    import spark.implicits._
    // Planted cell counts (the ScaleSpec discipline: force the big-value
    // branch without big data): every O·N and R·C product is ~2.5·10¹⁹ —
    // past 2⁶³ ≈ 9.2·10¹⁸, where an un-widened 64-bit multiply wraps —
    // while dev²·10⁶ (2.5·10³⁷) stays inside the DECIMAL(38,0)/HUGEINT
    // ceiling the scaladoc documents. BigInt hand computation per cell:
    //   n = 10¹⁰, every rt = ct = 5·10⁹ → R·C = 2.5·10¹⁹
    //   dev = ±(5·10⁵)·10¹⁰ = ±5·10¹⁵
    //   term = (2.5·10³¹ · 10⁶) div (2.5·10¹⁹ · 10¹⁰) = 10⁸ ppm, all cells
    val hi = 2500500000L
    val lo = 2499500000L
    val cells = Seq(("R", "O", hi), ("R", "F", lo), ("N", "O", lo), ("N", "F", hi))
      .toDF("returnflag", "linestatus", "n_obs")
    withClearCache {
      val out = Stats.chi2OfCells(cells).collect()
        .map(r => (r.getAs[String]("returnflag"), r.getAs[String]("linestatus"),
                   r.getAs[Long]("n_obs"), r.getAs[Long]("term_ppm")))
      assert(out.toSeq == Seq(
        ("N", "F", hi, 100000000L), ("N", "O", lo, 100000000L),
        ("R", "F", lo, 100000000L), ("R", "O", hi, 100000000L)), out.mkString(","))
    }
  }

  test("chi2OfCells: both DECIMAL(38,0) ceilings FAIL LOUDLY instead of NULLing silently") {
    import spark.implicits._
    def run(cells: Seq[(String, String, Long)]): Unit = withClearCache {
      Stats.chi2OfCells(cells.toDF("returnflag", "linestatus", "n_obs")).collect()
      ()
    }
    // |dev| = 10¹⁶ exactly (delta 10⁶ at n = 10¹⁰): dev²·10⁶ would need 39
    // digits — the deviation guard must fire the NAMED error
    val dHi = 2500000000L + 1000000L
    val dLo = 2500000000L - 1000000L
    val devOver = intercept[Exception] {
      run(Seq(("R", "O", dHi), ("R", "F", dLo), ("N", "O", dLo), ("N", "F", dHi)))
    }
    assert(causeMessages(devOver).exists(_.contains("chi2: deviation")),
           causeMessages(devOver).mkString(" | "))
    // n = 10¹³ with zero deviation: rt·ct·n = 2.5·10³⁸ overflows the
    // denominator — under ANSI (the Spark 4 session default) the engine
    // itself errors loudly (NUMERIC_VALUE_OUT_OF_RANGE); with ANSI off the
    // multiply NULLs and OUR guard fires. Either way the failure is
    // DETECTABLE, never a silent null/wrong term (dev = 0 passes its gate)
    val big = 2500000000000L
    val denOver = intercept[Exception] {
      run(Seq(("R", "O", big), ("R", "F", big), ("N", "O", big), ("N", "F", big)))
    }
    assert(causeMessages(denOver).exists(m =>
        m.contains("chi2: denominator") || m.contains("NUMERIC_VALUE_OUT_OF_RANGE")),
      causeMessages(denOver).mkString(" | "))
    // a LEGITIMATE zero denominator (all-zero counts through the public
    // API): division by zero is loud under ANSI but a silent NULL term_ppm
    // with ANSI off — the guard must fire on den = 0 too (r12 advice)
    val denZero = intercept[Exception] {
      run(Seq(("R", "O", 0L), ("R", "F", 0L), ("N", "O", 0L), ("N", "F", 0L)))
    }
    assert(causeMessages(denZero).exists(_.contains("chi2: denominator")),
      causeMessages(denZero).mkString(" | "))
  }

  test("ksOfCounts: the 2³¹ pack ceiling FAILS LOUDLY instead of corrupting the cumulatives") {
    import spark.implicits._
    // one row past the ceiling: a cumulative count of 2³¹ would carry into
    // the packed c1 field — the guard must surface the NAMED error
    val over = Seq((100L, 1L << 31, 1L)).toDF("v", "c1", "c2")
    withClearCache {
      val e = intercept[Exception] { Stats.ksOfCounts(over).collect() }
      assert(causeMessages(e).exists(_.contains("ksOfCounts: n1 >= 2^31")),
             causeMessages(e).mkString(" | "))
    }
    // directly below the ceiling the pack stays carry-free and the readout
    // completes: D = |1·(2³¹−1) − (2³¹−1)·1| / ((2³¹−1)·1) = 0 on a single
    // shared value
    val under = Seq((100L, (1L << 31) - 1, 1L)).toDF("v", "c1", "c2")
    withClearCache {
      val r = Stats.ksOfCounts(under).collect()
      assert(r.length == 1 && r.head.getAs[Double]("ks_d") == 0.0, r.mkString(","))
    }
  }

  test("mannWhitneyOfCounts: the 2⁶³ rank-sum ceiling FAILS LOUDLY instead of wrapping") {
    import spark.implicits._
    // n1 = n2 = 4·10⁹ → 2N+1 ≈ 1.6·10¹⁰ and Long.Max div (2N+1) ≈ 5.8·10⁸
    // < n1: the doubled rank sum would pass 2⁶³ — the guard must surface
    // the NAMED error, never a silently wrapped r1_x2
    val over = Seq((100L, 4000000000L, 4000000000L)).toDF("v", "c1", "c2")
    withClearCache {
      val e = intercept[Exception] { Stats.mannWhitneyOfCounts(over).collect() }
      assert(causeMessages(e).exists(_.contains("mannWhitney: doubled rank sum")),
             causeMessages(e).mkString(" | "))
    }
    // far below the ceiling the readout is unchanged: the KS fixture's
    // hand computation (see the midrank test below) still holds
    val under = Seq((100L, 2L, 1L), (200L, 1L, 0L)).toDF("v", "c1", "c2")
    withClearCache {
      val r = Stats.mannWhitneyOfCounts(under).collect()
      assert(r.length == 1 && r.head.getAs[Long]("n1") == 3L, r.mkString(","))
    }
  }

  test("ksTest: hand-computed exact D on a tied merged support; other flags excluded") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("kstest").toFile.getAbsolutePath
    // A(R) = {1.00, 2.00, 3.00}, B(N) = {2.00, 4.00} → over the merged
    // support the cross-multiplied deviation |n2·C1 − n1·C2| runs
    // 2, 1, 3, 0 → D = 3/6 = 0.5. The 'A'-flag row must not count.
    Seq(("R", 1.00), ("R", 2.00), ("R", 3.00),
        ("N", 2.00), ("N", 4.00), ("A", 9.99))
      .toDF("l_returnflag", "l_extendedprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    withClearCache {
      val out = Stats.ksTest(spark, tmp).collect()
        .map(r => (r.getAs[Long]("n1"), r.getAs[Long]("n2"),
                   r.getAs[Long]("d_num"), r.getAs[Double]("ks_d")))
      assert(out.toSeq == Seq((3L, 2L, 3L, 0.5)), out.mkString(","))
    }
  }

  test("mannWhitney: midrank tie handling in doubled units matches the pairwise count") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("mwu").toFile.getAbsolutePath
    // same samples as the KS test: sorted 1(A) 2(A) 2(B) 3(A) 4(B) —
    // midranks 1, 2.5, 2.5, 4, 5 → R1 = 7.5 (2R1 = 15),
    // 2U1 = 15 − 3·4 = 3 → U1 = 1.5, which pairwise counting confirms
    // (200>200 tie 0.5, 300>200 win 1) → AUC = 1.5/6 = 0.25
    Seq(("R", 1.00), ("R", 2.00), ("R", 3.00),
        ("N", 2.00), ("N", 4.00), ("A", 9.99))
      .toDF("l_returnflag", "l_extendedprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    withClearCache {
      val out = Stats.mannWhitney(spark, tmp).collect()
        .map(r => (r.getAs[Long]("n1"), r.getAs[Long]("n2"),
                   r.getAs[Long]("r1_x2"), r.getAs[Long]("u1_x2"),
                   r.getAs[Double]("auc")))
      assert(out.toSeq == Seq((3L, 2L, 15L, 3L, 0.25)), out.mkString(","))
    }
  }

  test("ksTest/mannWhitney degenerate inputs: empty → zero rows (like the oracle); one empty population → NULL statistic") {
    import spark.implicits._
    def write(rows: Seq[(String, Double)]): String = {
      val tmp = Files.createTempDirectory("twosample").toFile.getAbsolutePath
      rows.toDF("l_returnflag", "l_extendedprice")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
      tmp
    }
    // only R rows: statistics undefined → NULL, counts still exact
    val oneSided = write(Seq(("R", 1.00), ("R", 2.00), ("A", 9.99)))
    withClearCache {
      val ks = Stats.ksTest(spark, oneSided).collect()
      assert(ks.map(r => (r.getAs[Long]("n1"), r.getAs[Long]("n2"),
                          r.getAs[Long]("d_num"),
                          Option(r.getAs[java.lang.Double]("ks_d")))).toSeq ==
             Seq((2L, 0L, 0L, None)), ks.mkString(","))
      val mw = Stats.mannWhitney(spark, oneSided).collect()
      // r1_x2 degenerates to n1(n1+1); u1_x2 to 0
      assert(mw.map(r => (r.getAs[Long]("n1"), r.getAs[Long]("n2"),
                          r.getAs[Long]("r1_x2"), r.getAs[Long]("u1_x2"),
                          Option(r.getAs[java.lang.Double]("auc")))).toSeq ==
             Seq((2L, 0L, 6L, 0L, None)), mw.mkString(","))
    }
    // NO qualifying rows at all: both emit ZERO rows, exactly like the
    // oracle's grouped form (a global agg would emit one all-null row)
    val empty = write(Seq(("A", 9.99)))
    withClearCache {
      assert(Stats.ksTest(spark, empty).collect().isEmpty)
      assert(Stats.mannWhitney(spark, empty).collect().isEmpty)
    }
  }

  test("cramersV: symmetric 2×2 skew gives exactly 0.5; a single-column table guards to NULL") {
    import spark.implicits._
    def run(cells: Seq[(String, String, Int)]): (Long, Long, Long, Option[Double]) = {
      val tmp = Files.createTempDirectory("cramers").toFile.getAbsolutePath
      cells.flatMap { case (rf, ls, n) => Seq.fill(n)((rf, ls)) }
        .toDF("l_returnflag", "l_linestatus")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
      withClearCache {
        val r = Stats.cramersV(spark, tmp).collect().head
        (r.getAs[Long]("n"), r.getAs[Long]("df_min"),
         r.getAs[Long]("chi2_ppm"),
         Option(r.getAs[java.lang.Double]("cramers_v")).map(_.toDouble))
      }
    }
    // the chi2 spec's symmetric skew: four terms of exactly 5·10⁶ ppm →
    // χ² = 20, N = 80, df_min = 1 → V = √(20/80) = 0.5 exactly
    val skew = run(Seq(("A", "F", 30), ("A", "O", 10),
                       ("B", "F", 10), ("B", "O", 30)))
    assert(skew == ((80L, 1L, 20000000L, Some(0.5))), skew.toString)
    // one distinct linestatus → df_min 0 → NULL, never a 0/0
    val degen = run(Seq(("A", "F", 5), ("B", "F", 5)))
    assert(degen._2 == 0L && degen._4.isEmpty, degen.toString)
  }

  test("shipPriority: segment/date gates — on-the-day shipments and post-cutoff orders are out") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("shipprio").toFile.getAbsolutePath
    Seq((1L, "BUILDING"), (2L, "HOUSEHOLD"))
      .toDF("c_custkey", "c_mktsegment")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    // order 1: qualifies; order 2: placed after the as-of date; order 3:
    // wrong segment; order 4: its only line ships exactly ON the as-of
    // day (strict > → on-time, out)
    Seq((1L, 1L, "1998-01-01"), (2L, 1L, "1998-07-01"),
        (3L, 2L, "1998-01-01"), (4L, 1L, "1998-01-01"))
      .toDF("o_orderkey", "o_custkey", "d")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    // order 1 also has a pre-cutoff line that must NOT contribute
    Seq((1L, "1998-07-01", 10.0, 0.0), (1L, "1998-05-01", 99.0, 0.0),
        (2L, "1998-08-01", 50.0, 0.0), (3L, "1998-07-02", 50.0, 0.0),
        (4L, "1998-06-15", 50.0, 0.0))
      .toDF("l_orderkey", "d", "l_extendedprice", "l_discount")
      .withColumn("l_shipdate", to_timestamp(col("d"))).drop("d")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = Relational.shipPriority(spark, tmp)
      .withColumn("o_orderdate", col("o_orderdate").cast("string")).collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[String]("o_orderdate"),
                 r.getAs[Double]("revenue")))
    assert(out.toSeq == Seq((1L, "1998-01-01", 10.0)), out.mkString(","))
  }

  test("localVolume: only in-region customers supplied from their OWN nation count") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("localvol").toFile.getAbsolutePath
    Seq((0, "ASIA"), (1, "EUROPE")).toDF("r_regionkey", "r_name")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/region.parquet")
    Seq((0, "NATION_A", 0), (1, "NATION_B", 0), (2, "NATION_C", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/nation.parquet")
    Seq((1L, 0), (2L, 2)).toDF("c_custkey", "c_nationkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    Seq((10L, 0), (11L, 1)).toDF("s_suppkey", "s_nationkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/supplier.parquet")
    // order 100 in-window; 101 out-of-window; 102 belongs to the
    // out-of-region customer
    Seq((100L, 1L, "1997-06-01"), (101L, 1L, "1998-06-01"),
        (102L, 2L, "1997-06-01"))
      .toDF("o_orderkey", "o_custkey", "d")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    // line 2 of order 100 is supplied from a DIFFERENT nation → non-local
    Seq((100L, 10L, 10.0, 0.0), (100L, 11L, 99.0, 0.0),
        (101L, 10L, 50.0, 0.0), (102L, 10L, 50.0, 0.0))
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = Relational.localVolume(spark, tmp).collect()
      .map(r => (r.getAs[String]("n_name"), r.getAs[Long]("n_items"),
                 r.getAs[Double]("revenue")))
    assert(out.toSeq == Seq(("NATION_A", 1L, 10.0)), out.mkString(","))
  }

  test("returnedRevenue: only R lines on in-quarter orders; revenue ties break toward the smaller custkey") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("retrev").toFile.getAbsolutePath
    Seq((0, "NATION_A")).toDF("n_nationkey", "n_name")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/nation.parquet")
    Seq((1L, "C1", 5.5, 0), (2L, "C2", 1.0, 0))
      .toDF("c_custkey", "c_name", "c_acctbal", "c_nationkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    Seq((100L, 1L, "1998-02-01"), (101L, 1L, "1998-05-01"),
        (102L, 2L, "1998-02-01"))
      .toDF("o_orderkey", "o_custkey", "d")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    // cust 1 and cust 2 both return exactly 10.0 → deterministic tie
    Seq((100L, "R", 10.0, 0.0), (100L, "N", 99.0, 0.0),
        (101L, "R", 50.0, 0.0),
        (102L, "R", 7.0, 0.0), (102L, "R", 3.0, 0.0))
      .toDF("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = Relational.returnedRevenue(spark, tmp).collect()
      .map(r => (r.getAs[Long]("c_custkey"), r.getAs[String]("c_name"),
                 r.getAs[Double]("revenue")))
    assert(out.toSeq == Seq((1L, "C1", 10.0), (2L, "C2", 10.0)), out.mkString(","))
  }

  test("custOrderDist: the zero bucket exists and excluded-status orders don't count") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("custdist").toFile.getAbsolutePath
    Seq(1L, 2L, 3L).toDF("c_custkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    // cust 1: two counted orders plus one pending (excluded); cust 2:
    // none at all; cust 3: one counted
    Seq((10L, 1L, "O"), (11L, 1L, "F"), (12L, 1L, "P"), (13L, 3L, "O"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val out = Relational.custOrderDist(spark, tmp).collect()
      .map(r => (r.getAs[Long]("c_count"), r.getAs[Long]("custdist")))
    assert(out.toSeq == Seq((2L, 1L), (1L, 1L), (0L, 1L)), out.mkString(","))
  }

  test("promoShare: all-promo month is 100, promo-free month is 0, mixed month is exact") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("promoshare").toFile.getAbsolutePath
    Seq((1L, "PROMO"), (2L, "STANDARD")).toDF("p_partkey", "p_type")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/part.parquet")
    // Jan: 10 promo / 40 total → 25%; Feb: all promo → 100; Mar: none →
    // 0; the 1997 line is outside the ship-date window
    Seq((1L, "1998-01-10", 10.0, 0.0), (2L, "1998-01-20", 30.0, 0.0),
        (1L, "1998-02-10", 5.0, 0.0),
        (2L, "1998-03-10", 5.0, 0.0),
        (1L, "1997-06-01", 999.0, 0.0))
      .toDF("l_partkey", "d", "l_extendedprice", "l_discount")
      .withColumn("l_shipdate", to_timestamp(col("d"))).drop("d")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = Relational.promoShare(spark, tmp).collect()
      .map(r => (r.getAs[Long]("ship_month"), r.getAs[Double]("promo_share"),
                 r.getAs[Double]("promo_revenue"), r.getAs[Double]("total_revenue")))
    assert(out.toSeq == Seq((1L, 25.0, 10.0, 40.0), (2L, 100.0, 5.0, 5.0),
                            (3L, 0.0, 0.0, 5.0)), out.mkString(","))
  }

  test("bigOrders: the quantity gate is strict and the sum is the exact integer") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("bigord").toFile.getAbsolutePath
    Seq((1L, "C1")).toDF("c_custkey", "c_name")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    Seq((1L, 1L, "1997-01-01", 1000.0), (2L, 1L, "1997-01-02", 2000.0),
        (3L, 1L, "1997-01-03", 3000.0))
      .toDF("o_orderkey", "o_custkey", "d", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    // order 1: 301 (in); order 2: exactly 300 (strict > → out); order 3: 50
    Seq((1L, 200.0), (1L, 101.0), (2L, 300.0), (3L, 50.0))
      .toDF("l_orderkey", "l_quantity")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = Relational.bigOrders(spark, tmp)
      .withColumn("o_orderdate", col("o_orderdate").cast("string")).collect()
      .map(r => (r.getAs[String]("c_name"), r.getAs[Long]("o_orderkey"),
                 r.getAs[String]("o_orderdate"), r.getAs[Double]("o_totalprice"),
                 r.getAs[Long]("sum_qty")))
    assert(out.toSeq == Seq(("C1", 1L, "1997-01-01", 1000.0, 301L)),
           out.mkString(","))
  }

  test("filterScan: every predicate boundary — band edges in, band outside out, window end out, qty 24 out") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("filterscan").toFile.getAbsolutePath
    // rows: (ship, disc, qty, price) — only the first two qualify:
    // 0.05 and 0.07 are inclusive band EDGES; 0.04 is out; qty 24 fails
    // the strict <; a 1998-01-01 ship lands ON the exclusive window end
    Seq(("1997-06-01", 0.05, 1.0, 100.0), ("1997-06-01", 0.07, 23.0, 200.0),
        ("1997-06-01", 0.04, 1.0, 999.0), ("1997-06-01", 0.06, 24.0, 999.0),
        ("1998-01-01", 0.06, 1.0, 999.0), ("1996-12-31", 0.06, 1.0, 999.0))
      .toDF("d", "l_discount", "l_quantity", "l_extendedprice")
      .withColumn("l_shipdate", to_timestamp(col("d"))).drop("d")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = Relational.filterScan(spark, tmp).collect()
      .map(r => (r.getAs[Long]("n_lines"), r.getAs[Double]("revenue_delta")))
    // 100·0.05 + 200·0.07 = 19.0
    assert(out.toSeq == Seq((2L, 19.0)), out.mkString(","))
  }

  test("bracketRevenue: a line counts iff SOME bracket matches BOTH its part and its quantity") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("bracketrev").toFile.getAbsolutePath
    // part 1: Brand#1 size 10 (bracket-1 shaped); part 2: Brand#2 size 30
    // (size exceeds bracket 2's 25); part 3: Brand#3 size 35
    Seq((1L, "Brand#1", 10), (2L, "Brand#2", 30), (3L, "Brand#3", 35))
      .toDF("p_partkey", "p_brand", "p_size")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/part.parquet")
    // line A: part 1 qty 5 → bracket 1 fires (10.0); line B: part 1 qty
    // 20 → quantity outside bracket 1 and brand outside brackets 2/3;
    // line C: part 2 qty 15 → size kills bracket 2; line D: part 3 qty
    // 40 → bracket 3 fires at BOTH upper edges (20.0)
    Seq((1L, 5.0, 10.0, 0.0), (1L, 20.0, 999.0, 0.0),
        (2L, 15.0, 999.0, 0.0), (3L, 40.0, 20.0, 0.0))
      .toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = Relational.bracketRevenue(spark, tmp).collect()
      .map(r => (r.getAs[Long]("n_lines"), r.getAs[Double]("revenue")))
    assert(out.toSeq == Seq((2L, 30.0)), out.mkString(","))
  }

  test("waitSuppliers: only the UNIQUE late supplier of a multi-supplier order counts, once per order") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("waitsupp").toFile.getAbsolutePath
    Seq((10L, "S10"), (11L, "S11")).toDF("s_suppkey", "s_name")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/supplier.parquet")
    Seq((1L, "1997-01-01"), (2L, "1997-01-01"),
        (3L, "1997-01-01"), (4L, "1997-01-01"))
      .toDF("o_orderkey", "d")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    // order 1: supp 10 late TWICE (counts once), supp 11 on-time → supp 10
    // waits; order 2: single-supplier → out; order 3: BOTH late → out;
    // order 4: supp 11 is the unique late one
    Seq((1L, 10L, "1997-03-01"), (1L, 10L, "1997-04-01"), (1L, 11L, "1997-01-15"),
        (2L, 10L, "1997-03-01"),
        (3L, 10L, "1997-03-01"), (3L, 11L, "1997-03-01"),
        (4L, 11L, "1997-03-01"), (4L, 10L, "1997-01-15"))
      .toDF("l_orderkey", "l_suppkey", "d")
      .withColumn("l_shipdate", to_timestamp(col("d"))).drop("d")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = Relational.waitSuppliers(spark, tmp).collect()
      .map(r => (r.getAs[Long]("s_suppkey"), r.getAs[String]("s_name"),
                 r.getAs[Long]("numwait")))
    assert(out.toSeq == Seq((10L, "S10", 1L), (11L, "S11", 1L)), out.mkString(","))
  }
}
