package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.{SparkSpec, Tables}

/** Semantics of the round-4 join/profile operators: as-of join tie and
  * boundary rules, range-join bucket straddling, Bloom pre-filter
  * exactness, and the lang-quota prune's losslessness.
  */
class JoinOpsSpec extends SparkSpec {

  /** Hand-built events fixture written in the raw driver schema (ts =
    * epoch NANOS as long, the parquet TIMESTAMP(NANOS) surrogate that
    * Tables.events truncates to micros).
    *
    * Cases planted:
    *  - user 1: click and purchase at the SAME instant (`<=` must match),
    *    two clicks at one instant (max event_id must win the tie)
    *  - user 2: purchase with no prior click (null attach, no range pair)
    *  - user 3: purchase at exactly click+1h (strict upper bound must
    *    exclude) and a purchase in the NEXT hour bucket but inside the
    *    window (only the bucket-explode finds it)
    */
  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("joinops-events").toFile.getAbsolutePath
    val sec = (s: Long) => s * 1000L * 1000L * 1000L
    val rows = Seq(
      // (event_id, ts_s, user_id, type, value)
      (1L, 1000L, 1L, "click", 0.5),
      (2L, 1000L, 1L, "purchase", 10.0),
      (3L, 2000L, 1L, "click", 1.0),
      (4L, 2000L, 1L, "click", 2.0),
      (5L, 2500L, 1L, "purchase", 20.0),
      (6L, 0L, 3L, "click", 0.1),
      (7L, 3600L, 3L, "purchase", 30.0),
      (8L, 3599L, 3L, "purchase", 40.0),
      (9L, 3000L, 3L, "click", 0.2),
      (10L, 6500L, 3L, "purchase", 50.0),
      (11L, 100L, 2L, "purchase", 99.0))
    import spark.implicits._
    rows.map { case (id, t, u, ty, v) => (id, sec(t), u, ty, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("as-of join: <= at equal instants, max-event_id tie-break, null when no prior click") {
    val out = Temporal.asofJoin(spark, eventsDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(2L, 5L, 7L, 8L, 10L, 11L))
    // same-instant click attaches
    assert(out(2L).getAs[Double]("click_value") == 0.5)
    // two clicks at t=2000: event_id 4 (value 2.0) wins
    assert(out(5L).getAs[Double]("click_value") == 2.0)
    // user 3: last click at or before each purchase is the t=3000 click
    for (id <- Seq(7L, 8L, 10L))
      assert(out(id).getAs[Double]("click_value") == 0.2, s"purchase $id")
    // user 2: no click ever -> null attach
    assert(out(11L).isNullAt(out(11L).fieldIndex("click_value")))
  }

  test("range join: strict 1h upper bound, pairs found across hour-bucket seams") {
    val out = Temporal.rangeJoin(spark, eventsDir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    // user 1: (c1,p2) (c1,p5) (c3,p5) (c4,p5); purchase values 10 + 20*3
    assert(out(1L) == ((4L, 70.0)))
    // user 2: purchase only -> no pairs at all
    assert(!out.contains(2L))
    // user 3: (c6,p8) (c9,p7) (c9,p8) (c9,p10); p7 at exactly c6+1h excluded
    // for c6; p10 is in the NEXT hour bucket of c9 yet inside the window
    assert(out(3L) == ((4L, 160.0)))
  }

  test("bloom pre-filtered semi-join equals the plain exact semi-join") {
    val viaBloom = Relational.bloomSemiJoin(spark, sf0001).collect()
    val keys = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val plain = Tables.lineitem(spark, sf0001)
      .join(keys, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
           graft.util.Exact.sum2(graft.util.Exact.revenue).as("revenue"))
      .orderBy("l_returnflag").collect()
    assert(viaBloom.toSeq == plain.toSeq)
  }

  test("lang quota: pruned selection equals the unpruned rank; huge k keeps everything") {
    val k = 3
    val quota = Dedup.langQuota(spark, sf0001, k).collect()
      .map(r => r.getString(0) -> r).toMap
    // brute force: full window, no prune
    import org.apache.spark.sql.expressions.Window
    val ranked = Tables.documents(spark, sf0001)
      .withColumn("rk", conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy(col("rk"), col("doc_id"))))
    val expect = ranked.filter(col("rn") <= k).groupBy("lang")
      .agg(sum("doc_id").as("s"), count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    for ((lang, (s, n)) <- expect) {
      assert(quota(lang).getAs[Long]("n_kept") == n, lang)
      assert(quota(lang).getAs[Long]("kept_docid_sum") == s, lang)
    }
    // k far above every group size: quota is a no-op, prune must not lose rows
    val all = Dedup.langQuota(spark, sf0001, 1000000).collect()
    all.foreach(r => assert(r.getAs[Long]("n_kept") == r.getAs[Long]("n_total"), r.toString))
  }

  test("quantile profile check: every sketch rank lands inside its error budget") {
    val rows = Relational.quantileProfileCheck(spark, sf0001).collect()
    assert(rows.length == Relational.ProfileQuantiles.length)
    rows.foreach(r => assert(r.getAs[Boolean]("within_bound"), r.toString))
  }

  test("events gapfill: dense hour x type grid, conserved counts, gap flags consistent") {
    import org.apache.spark.sql.functions._
    val out = Temporal.eventsGapfill(spark, sf0001).collect()
    val e = graft.Tables.events(spark, sf0001)
    val nTypes = e.select("event_type").distinct().count()
    val hours = out.map(_.getAs[java.sql.Timestamp]("hour_start")).distinct
    // dense grid: every hour carries every type exactly once
    assert(out.length == hours.length * nTypes)
    assert(out.map(r => (r.get(0), r.get(1))).distinct.length == out.length)
    // zero-fill conserves the event total
    assert(out.map(_.getAs[Long]("n_events")).sum == e.count())
    out.foreach { r =>
      val n = r.getAs[Long]("n_events"); val gap = r.getAs[Int]("is_gap")
      assert(if (gap == 1) n == 0 else n > 0, r.toString)
    }
    // the spine is contiguous: hour steps are exactly 3600s
    val sorted = hours.map(_.getTime).sorted
    assert(sorted.zip(sorted.tail).forall { case (a, b) => b - a == 3600000L })
  }

  test("winsorize: bounds are order statistics, clamp fractions respect the quantiles") {
    val out = Relational.winsorizedStats(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n")
      val p05 = r.getAs[Double]("p05"); val p95 = r.getAs[Double]("p95")
      assert(p05 <= p95, r.toString)
      // strictly-below-p05 rows are fewer than rank(p05) = ceil(0.05 n)
      assert(r.getAs[Long]("n_clamped_low") < math.ceil(n * Relational.WinsorLo) + 1)
      // strictly-above-p95 rows are at most n - ceil(0.95 n)
      assert(r.getAs[Long]("n_clamped_high") <= n - math.ceil(n * Relational.WinsorHi).toLong)
      val s = r.getAs[Double]("sum_winsorized")
      assert(s >= n * p05 - 0.01 && s <= n * p95 + 0.01, r.toString)
    }
  }

  test("basketPairs: hand-computed support and lift on planted baskets; pair key ordered") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("basket").toFile.getAbsolutePath
    // orders: {1,2}, {1,2}, {1,3}, {2} (+ a duplicate line proving DISTINCT)
    // N=4, c_1=3, c_2=3, c_3=1; c_12=2 lift=2·4/9; c_13=1 lift=4/3
    val rows = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L), (11L, 2L),
                   (12L, 1L), (12L, 3L), (13L, 2L))
    rows.zipWithIndex.map { case ((o, p), i) =>
      (o, p, i.toLong, 1L, 1.0, 1.0, 0.0, java.sql.Date.valueOf("1995-01-01")) }
      .toDF("l_orderkey", "l_partkey", "l_linenumber", "l_suppkey",
            "l_quantity", "l_extendedprice", "l_discount", "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    try {
      val out = Relational.basketPairs(spark, tmp).collect()
        .map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b")) -> r).toMap
      assert(out.keySet == Set((1L, 2L), (1L, 3L)))
      assert(out((1L, 2L)).getAs[Long]("c_ab") == 2) // duplicate line counted once
      assert(out((1L, 2L)).getAs[Double]("lift") == 2.0 * 4 / 9)
      assert(out((1L, 3L)).getAs[Long]("c_ab") == 1)
      assert(out((1L, 3L)).getAs[Double]("lift") == 4.0 / 3)
    } finally {
      // basketPairs consumes the staged edge artifact; tmp-dir-named tables
      // would otherwise accumulate in the test warehouse across runs
      spark.sql(s"DROP TABLE IF EXISTS ${graft.ops.Graph.copurchaseTable(tmp)}")
    }
  }

  test("basketTriples: lifetime customer baskets union across orders; only support-2 triple survives") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("tri3").toFile.getAbsolutePath
    // customer 1's basket {1,2,3} assembles ACROSS two orders (10: {1,2},
    // 11: {3}); customer 2 buys {1,2,3} in one order; customer 3 {1,2,4};
    // customer 4 {7}. Triple (1,2,3) support 2 ≥ minsup; (1,2,4) support 1
    // dies — and its (1,4)/(2,4) pairs are infrequent, so the a-priori
    // prune kills it before enumeration.
    Seq((10L, 1L), (10L, 2L), (11L, 3L), (12L, 1L), (12L, 2L), (12L, 3L),
        (13L, 1L), (13L, 2L), (13L, 4L), (14L, 7L))
      .toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    Seq((10L, 1L), (11L, 1L), (12L, 2L), (13L, 3L), (14L, 4L))
      .toDF("o_orderkey", "o_custkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    try {
      val out = Relational.basketTriples(spark, tmp).collect()
      assert(out.length == 1, out.mkString(";"))
      val r = out.head
      assert((r.getAs[Long]("part_a"), r.getAs[Long]("part_b"),
              r.getAs[Long]("part_c"), r.getAs[Long]("support"))
             == ((1L, 2L, 3L, 2L)), r.toString)
    } finally {
      // basketTriples consumes the staged basket artifact; tmp-dir-named
      // tables would otherwise accumulate in the test warehouse
      spark.sql(s"DROP TABLE IF EXISTS ${Relational.customerBasketsTable(tmp)}")
    }
  }

  test("basketTriples: fixture leaderboard — ordered keys, support floor, deterministic") {
    val out = Relational.basketTriples(spark, sf0001).collect()
    assert(out.length <= Relational.TripleTopK)
    val sup = out.map(_.getAs[Long]("support"))
    assert(sup.sameElements(sup.sortBy(-_)), "not support-sorted")
    out.foreach { r =>
      assert(r.getAs[Long]("support") >= Relational.TripleMinSup, r.toString)
      assert(r.getAs[Long]("part_a") < r.getAs[Long]("part_b") &&
             r.getAs[Long]("part_b") < r.getAs[Long]("part_c"), r.toString)
    }
    val again = Relational.basketTriples(spark, sf0001).collect()
    assert(out.toSeq == again.toSeq, "basketTriples not deterministic")
  }

  test("recsItemCf: widest basket anchors; co-occurrence scores accumulate; owned parts excluded") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("itemcf").toFile.getAbsolutePath
    // baskets: c1 {1,2,6} (widest → anchor), c2 {1,3}, c3 {2,3}, c4 {9},
    // c5 {1,4}. Candidate 3 scores 2 (via part 1 @ c2 and part 2 @ c3),
    // candidate 4 scores 1 (via part 1 @ c5); owned {1,2,6} and the
    // unconnected 9 never appear.
    Seq((10L, 1L), (10L, 2L), (10L, 6L), (11L, 1L), (11L, 3L),
        (12L, 2L), (12L, 3L), (13L, 9L), (14L, 1L), (14L, 4L))
      .toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    Seq((10L, 1L), (11L, 2L), (12L, 3L), (13L, 4L), (14L, 5L))
      .toDF("o_orderkey", "o_custkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val out = Relational.recsItemCf(spark, tmp).collect()
      .map(r => (r.getAs[Long]("part"), r.getAs[Long]("score")))
    assert(out.toSeq == Seq((3L, 2L), (4L, 1L)), out.mkString(";"))
  }

  test("recsItemCf: fixture leaderboard — bounded, score-sorted, positive, deterministic") {
    val out = Relational.recsItemCf(spark, sf0001).collect()
    assert(out.nonEmpty && out.length <= Relational.RecsTopK)
    val sc = out.map(_.getAs[Long]("score"))
    assert(sc.sameElements(sc.sortBy(-_)), "not score-sorted")
    sc.foreach(s => assert(s >= 1))
    val again = Relational.recsItemCf(spark, sf0001).collect()
    assert(out.toSeq == again.toSeq, "recsItemCf not deterministic")
  }

  test("benfordAudit: planted cent values — exact digit counts, ppm splits, literal expectations") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("benford").toFile.getAbsolutePath
    // digits: 1.00→1, 19.99→1, 2.50→2, 900.00→9, 0.03→3 (sub-1 value
    // proves the digit comes from the CENT string, not the euro part)
    Seq(1.00, 19.99, 2.50, 900.00, 0.03).toDF("l_extendedprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = Relational.benfordAudit(spark, tmp).collect()
      .map(r => r.getAs[Long]("digit") ->
        ((r.getAs[Long]("n_values"), r.getAs[Long]("observed_ppm"),
          r.getAs[Long]("expected_ppm"), r.getAs[Long]("dev_ppm")))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 9L), out.toString)
    assert(out(1L) == ((2L, 400000L, 301030L, 98970L)), out.toString)
    assert(out(2L) == ((1L, 200000L, 176091L, 23909L)), out.toString)
    assert(out(3L) == ((1L, 200000L, 124939L, 75061L)), out.toString)
    assert(out(9L) == ((1L, 200000L, 45757L, 154243L)), out.toString)
  }

  test("benfordAudit: fixture — digits in 1..9, counts conserve, expectations sum to one million") {
    val out = Relational.benfordAudit(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val d = r.getAs[Long]("digit")
      assert(d >= 1 && d <= 9, r.toString)
      assert(r.getAs[Long]("dev_ppm") ==
        r.getAs[Long]("observed_ppm") - r.getAs[Long]("expected_ppm"), r.toString)
    }
    assert(Relational.BenfordPpm.map(_._2).sum == 1000000L)
    // every lineitem row lands in exactly one digit bucket
    val total = graft.Tables.lineitem(spark, sf0001).count()
    assert(out.map(_.getAs[Long]("n_values")).sum == total)
  }

  test("dqChecks: planted violations are counted per constraint; fixture structural checks pass") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("dq").toFile.getAbsolutePath
    def d(s: String) = java.sql.Date.valueOf(s)
    Seq(1L, 2L).toDF("c_custkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    // planted: one dup orderkey (101), one null custkey (102), one bad
    // status (103), one FK-orphan custkey (104 -> 9)
    Seq(
      (100L, Option(1L), "O", d("1995-01-02")),
      (101L, Option(2L), "F", d("1995-01-03")),
      (101L, Option(2L), "P", d("1995-01-04")),
      (102L, Option.empty[Long], "O", d("1995-01-05")),
      (103L, Option(1L), "X", d("1995-01-06")),
      (104L, Option(9L), "O", d("1995-01-07")))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    // planted: one negative quantity, one discount > 1, one orphan
    // orderkey (999), one ship-before-order line (101 @ 01-01)
    Seq(
      (100L, 5.0, 0.10, d("1995-01-10")),
      (100L, -1.0, 0.05, d("1995-01-11")),
      (101L, 2.0, 1.50, d("1995-01-12")),
      (999L, 1.0, 0.00, d("1995-01-13")),
      (101L, 3.0, 0.20, d("1995-01-01")))
      .toDF("l_orderkey", "l_quantity", "l_discount", "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = Relational.dqChecks(spark, tmp).collect()
      .map(r => r.getAs[String]("check_name") ->
        (r.getAs[Long]("n_checked"), r.getAs[Long]("n_violations"), r.getAs[Int]("passed"))).toMap
    assert(out("null_orders_custkey") == ((6L, 1L, 0)))
    assert(out("unique_orders_orderkey") == ((6L, 1L, 0)))
    assert(out("domain_orders_status") == ((6L, 1L, 0)))
    assert(out("range_lineitem_discount") == ((5L, 1L, 0)))
    assert(out("range_lineitem_quantity") == ((5L, 1L, 0)))
    assert(out("fk_lineitem_orderkey") == ((5L, 1L, 0)))
    // null custkey is exempt from the FK probe (SQL FK semantics): 5
    // non-null keys checked, only custkey 9 orphaned
    assert(out("fk_orders_custkey") == ((5L, 1L, 0)))
    // the dup orderkey 101 doubles its lines in the temporal join: rows
    // 100:2x1 + 101:2x2 = 6 pairs; the 01-01 line violates against both
    assert(out("temporal_ship_after_order") == ((6L, 2L, 0)))
    // the shipped fixture: all structural constraints hold; the temporal
    // check legitimately FIRES (the synthetic generator draws ship dates
    // independently of order dates — the audit surfacing that is the
    // feature, and the constant non-zero count is part of the oracle row)
    val fixture = Relational.dqChecks(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getAs[String]("check_name") -> r).toMap
    assert(fixture.size == 8)
    fixture.filterKeys(_ != "temporal_ship_after_order").values
      .foreach(r => assert(r.getAs[Int]("passed") == 1, r.toString))
    assert(fixture("temporal_ship_after_order").getAs[Long]("n_violations") > 0)
  }

  test("skyline: planted domination, tie, and frontier cases resolve exactly") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("sky").toFile.getAbsolutePath
    // frontier: price 5→size 3 (parts 4,7 tie — ties dominate nobody),
    // price 10→size 5 (parts 1,2 tie; 3 loses same-price/smaller;
    // 5 loses cheaper-equal-size), price 20→size 9 (part 6)
    Seq((1L, 10.0, 5), (2L, 10.0, 5), (3L, 10.0, 4), (4L, 5.0, 3),
        (5L, 20.0, 5), (6L, 20.0, 9), (7L, 5.0, 3))
      .toDF("p_partkey", "p_retailprice", "p_size")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/part.parquet")
    val got = Relational.skyline(spark, tmp).collect()
      .map(_.getAs[Long]("partkey")).toSet
    assert(got == Set(1L, 2L, 4L, 6L, 7L), got.toString)
  }

  test("joinSizeSketch: CMS inner product never underestimates and sits inside the budget") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("jsz").toFile.getAbsolutePath
    // A keys [1,1,2], B keys [1,2,2,3] → exact |A⋈B| = 2·1 + 1·2 = 4
    Seq(1L, 1L, 2L).toDF("l_orderkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    Seq(1L, 2L, 2L, 3L).toDF("o_orderkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val r = Relational.joinSizeSketch(spark, tmp).head()
    assert(r.getAs[Long]("exact_size") == 4)
    assert(r.getAs[Long]("est_size") >= 4, r.toString)
    assert(r.getAs[Boolean]("within_budget"), r.toString)
    // fixture: the estimator's one-sided guarantee and budget must hold on
    // real key distributions too
    val f = Relational.joinSizeSketch(spark, "/root/testdata/sf0.001").head()
    assert(f.getAs[Long]("est_size") >= f.getAs[Long]("exact_size"), f.toString)
    assert(f.getAs[Long]("overcount") ==
      f.getAs[Long]("est_size") - f.getAs[Long]("exact_size"))
    assert(f.getAs[Boolean]("within_budget"), f.toString)
  }

  test("rfm: buckets partition customers near-evenly, segment counts conserve, monetary exact") {
    val dir = "/root/testdata/sf0.001"
    val out = Relational.rfmSegments(spark, dir).collect()
    val nCust = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_custkey").distinct().count()
    assert(out.map(_.getAs[Long]("n_customers")).sum == nCust)
    out.foreach { r =>
      Seq("r_bucket", "f_bucket", "m_bucket").foreach { c =>
        val v = r.getAs[Int](c); assert(v >= 1 && v <= Relational.RfmBuckets, r.toString)
      }
    }
    // each metric's marginal distribution is a near-even quintile split
    // (ties can skew a boundary, never past one bucket's worth)
    Seq("r_bucket", "f_bucket", "m_bucket").foreach { c =>
      val marg = out.groupBy(_.getAs[Int](c)).map { case (_, rs) =>
        rs.map(_.getAs[Long]("n_customers")).sum }
      assert(marg.max <= 2L * nCust / Relational.RfmBuckets + nCust / 10 + 2,
        s"$c skewed: $marg")
    }
  }

  test("abLift: planted conversion asymmetry picks the right winner via exact cross-multiplication") {
    import spark.implicits._
    // arm 0 (k even): 4 clicks, 1 purchase (2500 bp); arm 1: 4 clicks,
    // 3 purchases (7500 bp) → winner = 1, lift = 3
    val rows = Seq(
      (1L, "click", 0L), (2L, "click", 2L), (3L, "click", 4L), (4L, "click", 6L),
      (5L, "purchase", 8L),
      (6L, "click", 1L), (7L, "click", 3L), (8L, "click", 5L), (9L, "click", 7L),
      (10L, "purchase", 9L), (11L, "purchase", 11L), (12L, "purchase", 13L))
    val tmp = java.nio.file.Files.createTempDirectory("ablift").toFile.getAbsolutePath
    rows.map { case (id, ty, k) => (id, id, ty, 1.0, s"""{"k": $k}""") }
      .toDF("event_id", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("make_timestamp(2024, 1, 1, 12, 0, 0)"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = Temporal.abLift(spark, tmp).collect().head
    assert(r.getAs[Long]("clicks_a") == 4 && r.getAs[Long]("purchases_a") == 1)
    assert(r.getAs[Long]("clicks_b") == 4 && r.getAs[Long]("purchases_b") == 3)
    assert(r.getAs[Long]("conv_bp_a") == 2500 && r.getAs[Long]("conv_bp_b") == 7500)
    assert(r.getAs[Double]("lift_b_over_a") == 3.0)
    assert(r.getAs[Int]("winner") == 1)
  }

  test("trendSlope: planted linear series recover the exact rational slope; flat gives trend 0") {
    import spark.implicits._
    // up: 10,20,..,50 value/day → slope 10 value/day = 1e5 units/day (num 50e5, den 50)
    val rows =
      (1 to 5).map(d => ("up", d, d * 10.0)) ++
      (1 to 5).map(d => ("down", d, 60.0 - d * 10.0)) ++
      (1 to 5).map(d => ("flat", d, 7.0))
    val events = rows.toDF("event_type", "d", "value")
      .withColumn("ts", expr("make_timestamp(2024, 1, d, 12, 0, 0)"))
      .withColumn("event_id", col("d").cast("long"))
      .select("event_id", "ts", "event_type", "value")
    val out = Temporal.trendSlope(spark, sf0001)
    val tmp = java.nio.file.Files.createTempDirectory("trend").toFile.getAbsolutePath
    events
      .withColumn("user_id", lit(1L)).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val planted = Temporal.trendSlope(spark, tmp).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(planted(("up")).getAs[Long]("slope_num") == 5000000L)
    assert(planted(("up")).getAs[Long]("slope_den") == 50L)
    assert(planted(("up")).getAs[Double]("slope_units_per_day") == 100000.0)
    assert(planted(("up")).getAs[Int]("trend") == 1)
    assert(planted(("down")).getAs[Int]("trend") == -1)
    assert(planted(("flat")).getAs[Int]("trend") == 0)
    assert(planted(("flat")).getAs[Long]("slope_num") == 0L)
    // fixture run well-formed
    assert(out.collect().forall(r => Set(-1, 0, 1)(r.getAs[Int]("trend"))))
  }

  test("scd2Delta: planted snapshots classify carry/change/insert/delete with paired open+close") {
    import spark.implicits._
    val prev = Seq((1L, "A"), (2L, "B"), (3L, "C")).toDF("key", "attr")
    val today = Seq((1L, "A"), (2L, "X"), (4L, "D")).toDF("key", "attr")
    val out = Relational.scd2Delta(prev, today).collect()
      .map(r => r.getAs[String]("action") -> r).toMap
    assert(out.keySet ==
      Set("carried", "changed_closed", "changed_opened", "inserted", "deleted"))
    assert(out("carried").getAs[Long]("sum_key") == 1)
    // a change emits BOTH a close and an open for the same key
    assert(out("changed_closed").getAs[Long]("sum_key") == 2)
    assert(out("changed_opened").getAs[Long]("sum_key") == 2)
    assert(out("deleted").getAs[Long]("sum_key") == 3)
    assert(out("inserted").getAs[Long]("sum_key") == 4)
    out.values.foreach(r => assert(r.getAs[Long]("n_rows") == 1))
  }

  test("rollingZscore: planted spike flagged, flat series and short-history head never flagged") {
    import spark.implicits._
    // type "flat": 12 identical days — zero variance, zero deviation → a
    // tie (dev² > 0 is false) must NOT flag. type "spike": 8 quiet days
    // then a 10× day — full 7-day window, σ=0, dev>0 → must flag; the two
    // days after (window now contains the spike, σ large) must not.
    val rows =
      (1 to 12).map(d => ("flat", d, 100.0)) ++
      (1 to 8).map(d => ("spike", d, 100.0)) ++
      Seq(("spike", 9, 1000.0), ("spike", 10, 100.0), ("spike", 11, 100.0))
    val events = rows.toDF("event_type", "d", "value")
      .withColumn("ts", expr("make_timestamp(2024, 1, d, 12, 0, 0)"))
      .select("event_type", "ts", "value")
    val out = Temporal.rollingZscoreOf(events).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("day").toString) -> r)
      .toMap
    assert(out.size == 23)
    // every row with short history is unflagged regardless of values
    out.values.filter(_.getAs[Long]("w_n") < Temporal.ZscoreWindowDays)
      .foreach(r => assert(r.getAs[Int]("is_anomaly") == 0, r.toString))
    // flat series: never flagged even with a full window
    (8 to 12).foreach(d => assert(out(("flat", f"2024-01-$d%02d")).getAs[Int]("is_anomaly") == 0))
    // the spike day is flagged; its quiet successors are not
    assert(out(("spike", "2024-01-09")).getAs[Int]("is_anomaly") == 1)
    assert(out(("spike", "2024-01-10")).getAs[Int]("is_anomaly") == 0)
    assert(out(("spike", "2024-01-11")).getAs[Int]("is_anomaly") == 0)
    // daily totals surfaced exactly
    assert(out(("spike", "2024-01-09")).getAs[Double]("sum_value") == 1000.0)
  }

  test("rollingZscore: fixture run is non-vacuous and window counts saturate at W") {
    val out = Temporal.rollingZscore(spark, sf0001).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("w_n") <= Temporal.ZscoreWindowDays))
    assert(out.exists(_.getAs[Long]("w_n") == Temporal.ZscoreWindowDays))
  }

  test("attribution: first/last touch, event_id tie-break at equal ts, none-cell for untouched purchases") {
    val dir = Files.createTempDirectory("attr-events").toFile.getAbsolutePath
    val sec = (s: Long) => s * 1000L * 1000L * 1000L
    val rows = Seq(
      // user 5: view and click at the SAME ts — event_id order decides
      // first (21=view) vs last (22=click); both purchases inherit them
      (21L, 100L, 5L, "view", 0.0),
      (22L, 100L, 5L, "click", 0.0),
      (23L, 200L, 5L, "purchase", 5.0),
      (24L, 300L, 5L, "purchase", 2.5),
      // user 6: purchase BEFORE any touch → 'none'; later purchase after
      // a click attributes (click, click)
      (31L, 50L, 6L, "purchase", 9.0),
      (32L, 60L, 6L, "click", 0.0),
      (33L, 70L, 6L, "purchase", 1.0),
      // user 7: non-funnel type only — filtered out entirely, no row
      (41L, 10L, 7L, "error", 0.0))
    import spark.implicits._
    rows.map { case (id, t, u, ty, v) => (id, sec(t), u, ty, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Temporal.attribution(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
                ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out == Map(
      ("view", "click") -> ((2L, 7.5)),
      ("none", "none")  -> ((1L, 9.0)),
      ("click", "click") -> ((1L, 1.0))), out.toString)
  }
}
