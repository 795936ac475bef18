package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Scale-technique specs: salted two-phase aggregation equals the plain
  * rollup, and bucketed tables join without a shuffle (co-located join) —
  * the two levers the 100 TB design leans on beyond AQE.
  */
class ScaleSpec extends SparkSpec {

  test("salted two-phase aggregation equals plain groupBy (skewed hot keys)") {
    val l = Tables.lineitem(spark, sf0001)
    val plain = l.groupBy(to_date(col("l_shipdate")).as("d"))
      .agg(sum("l_quantity").as("q"), count(lit(1)).as("n"), max("l_partkey").as("m"))
      .collect().map(r => (r.getDate(0).toString, r.getDouble(1), r.getLong(2), r.getLong(3))).toSet
    val salted = Skew.saltedAgg(
        l.withColumn("d", to_date(col("l_shipdate"))), Seq("d"), salts = 8,
        Seq("q" -> Skew.sumOf(col("l_quantity")),
            "n" -> Skew.countOf,
            "m" -> Skew.maxOf(col("l_partkey"))))
      .collect().map(r => (r.getDate(0).toString, r.getDouble(1), r.getLong(2), r.getLong(3))).toSet
    assert(salted == plain)
  }

  test("salted join equals plain join on a Zipf-hot fact key (inner and left)") {
    import spark.implicits._
    // 90% of fact rows hit one hot key; dim misses key 99 so LEFT has nulls
    val fact = (0 until 2000).map(i =>
      (i.toLong, if (i % 10 == 0) (i % 7).toLong else 3L, i * 1.5)).toDF("row_id", "k", "v")
    val dim = (0L to 6L).filter(_ != 5L).map(k => (k, s"dim_$k")).toDF("dk", "name")
    for (jt <- Seq("inner", "left")) {
      val plain = fact.join(dim, col("k") === col("dk"), jt)
        .select("row_id", "k", "v", "dk", "name")
        .collect().map(_.toSeq).toSet
      val salted = Skew.saltedJoin(fact, dim, "k", "dk", col("row_id"), salts = 8, jt)
        .select("row_id", "k", "v", "dk", "name")
        .collect().map(_.toSeq).toSet
      assert(salted == plain, s"joinType=$jt")
    }
    // the join really runs on (key, salt): both columns appear in the keys
    val j = Skew.saltedJoin(fact, dim, "k", "dk", col("row_id"), salts = 8)
    val joined = j.queryExecution.optimizedPlan.toString
    assert(joined.contains("_fsalt") && joined.contains("_dsalt"), joined)
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact, dim, "k", "dk", col("row_id"), 8, "right")
    }
  }

  test("range-partitioned layout yields file-disjoint ranges (zone-map prunable); round-robin does not") {
    // The write-side lever for scan pruning at 100 TB: repartitionByRange +
    // sortWithinPartitions clusters a predicate column so parquet file/
    // row-group min-max stats become disjoint — a time-window filter then
    // skips whole files. Round-robin layout interleaves values, so every
    // file's [min,max] spans the full domain and nothing can be skipped.
    def fileRanges(path: String): Seq[(Long, Long)] =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("ts").cast("long").as("lo"), max("ts").cast("long").as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val ev = Tables.events(spark, sf0001).select("ts", "user_id")
    val base = java.nio.file.Files.createTempDirectory("layout").toString
    ev.repartitionByRange(4, col("ts")).sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(s"$base/range")
    ev.repartition(4)
      .write.mode("overwrite").parquet(s"$base/rr")
    val ranged = fileRanges(s"$base/range")
    assert(ranged.size >= 3, s"expected >=3 files, got $ranged")
    // disjoint up to boundary ties (equal keys land in one range partition)
    ranged.sliding(2).foreach { case Seq((_, hi1), (lo2, _)) =>
      assert(lo2 >= hi1, s"overlapping file ranges: $ranged")
    case _ => ()
    }
    val rr = fileRanges(s"$base/rr")
    val domainSpan = rr.map(_._2).max - rr.map(_._1).min
    // every round-robin file covers (almost) the whole domain — unprunable
    assert(rr.forall { case (lo, hi) => hi - lo > domainSpan / 2 },
           s"round-robin layout unexpectedly clustered: $rr")
  }

  test("z-order layout bounds BOTH dimension extents per file; date-linear leaves partkey unprunable") {
    // the curve geometry, not the data, drives these bounds: a contiguous
    // 2048-cell Morton range sits inside a bounding box of at most
    // 128x64 cells (twice the aligned 64x32 block in each dimension),
    // while a date-major linear range spans <=9 date buckets but the FULL
    // 256-bucket partkey domain
    val out = Layout.zorderLayout(spark, sf0001).collect()
    val (z, lin) = out.partition(_.getAs[String]("layout") == "zorder")
    assert(z.nonEmpty && lin.nonEmpty)
    val nRows = Tables.lineitem(spark, sf0001).count()
    assert(z.map(_.getAs[Long]("n_rows")).sum == nRows)
    assert(lin.map(_.getAs[Long]("n_rows")).sum == nRows)
    z.foreach { r =>
      assert(r.getAs[Long]("pk_span") <= 128, r.toString)
      assert(r.getAs[Long]("dt_span") <= 128, r.toString)
    }
    lin.foreach(r => assert(r.getAs[Long]("dt_span") <= 9, r.toString))
    // the comparative claim: z-order makes partkey prunable, linear does not
    val zMaxPk = z.map(_.getAs[Long]("pk_span")).max
    val linMaxPk = lin.map(_.getAs[Long]("pk_span")).max
    assert(zMaxPk * 2 <= linMaxPk,
      s"z-order partkey extent $zMaxPk not materially tighter than linear $linMaxPk")
  }

  test("stop-shingle DF cap collapses the hot-bucket candidate blowup (100 TB skew defense)") {
    import spark.implicits._
    // 100 boilerplate docs sharing one hot shingle set + 1 genuine near-dup
    // pair with rare shingles — the web-scale skew shape in miniature
    val boiler = (0L until 100L).map(i =>
      (i, Seq("all rights reserved", "terms of service", "privacy policy page")))
    val dups = Seq(
      (1000L, Seq("quick brown fox", "jumps over the")),
      (1001L, Seq("quick brown fox", "jumps over the")))
    val sh = (boiler ++ dups).toDF("doc_id", "shingles")
    val uncapped = Dedup.jaccardPairsCapped(sh, Int.MaxValue)
    val capped = Dedup.jaccardPairsCapped(sh, 10)
    // uncapped: every boilerplate pair is a candidate AND passes (identical
    // sets) — quadratic in the hot bucket
    assert(uncapped.count() == 100L * 99 / 2 + 1)
    // capped: hot shingles (df=100 > 10) removed; only the genuine pair
    // (rare shingles, df=2) survives, with Jaccard over the capped sets
    val rows = capped.collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(0) == 1000L && rows.head.getLong(1) == 1001L)
    assert(rows.head.getDouble(5) == 1.0)
  }

  test("APSS df cap collapses the boilerplate-term blowup (100 TB skew defense)") {
    import spark.implicits._
    // 100 boilerplate docs with IDENTICAL count vectors (every term df=100)
    // + 1 genuine dup pair on rare terms — same web-scale shape as the
    // jaccard/simhash cap tests
    val boiler = (0L until 100L).flatMap(i =>
      Seq((i, "all rights reserved", 2L), (i, "terms of service", 1L)))
    val dups = Seq((1000L, "quick brown fox", 3L), (1001L, "quick brown fox", 3L))
    val tf = (boiler ++ dups).toDF("doc_id", "term", "tf")
    // uncapped: identical vectors ⇒ every boilerplate pair scores 1.0 —
    // quadratic in the hot inverted-index buckets
    assert(Dedup.apssPairsCapped(tf, Int.MaxValue).count() == 100L * 99 / 2 + 1)
    // capped: df=100 terms pruned from every vector — boilerplate docs
    // drop out of the index entirely; only the rare-term pair survives
    val rows = Dedup.apssPairsCapped(tf, 10).collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(0) == 1000L && rows.head.getLong(1) == 1001L)
    assert(rows.head.getAs[Double]("sim") == 1.0)
  }

  test("blocking cap skips the shared-prefix mega-block (100 TB skew defense)") {
    import spark.implicits._
    // 100 docs sharing one blocking key AND identical shingles (the
    // boilerplate-prefix block) + 1 genuine dup pair in a 2-doc block
    val boiler = (0L until 100L).map(i =>
      (i, "all rights reserved", Seq("all rights reserved", "reserved legal text"), 2))
    val dups = Seq(
      (1000L, "quick brown fox", Seq("quick brown fox", "fox jumps over"), 2),
      (1001L, "quick brown fox", Seq("quick brown fox", "fox jumps over"), 2))
    val d = (boiler ++ dups).toDF("doc_id", "bkey", "sh", "n")
    assert(Dedup.blockingPairs(d, Int.MaxValue).count() == 100L * 99 / 2 + 1)
    val rows = Dedup.blockingPairs(d, 10).collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(0) == 1000L && rows.head.getLong(1) == 1001L)
    assert(rows.head.getAs[Double]("jaccard") == 1.0)
  }

  test("simhash band-bucket cap collapses the degenerate-fingerprint blowup (100 TB skew defense)") {
    import spark.implicits._
    // 100 boilerplate docs with IDENTICAL fingerprints (one hot bucket per
    // band) + 1 genuine near-dup pair on a distinct fingerprint — the
    // degenerate-corpus shape the scale note on simhash warns about
    val boiler = (0L until 100L).map(i => (i, 0x11111111L))
    val dups = Seq((1000L, 0x22222222L), (1001L, 0x22222222L))
    val banded = Dedup.bandedOf((boiler ++ dups).toDF("doc_id", "fp"))
    // uncapped (cap that never fires): every boilerplate pair is a
    // candidate AND passes (hamming 0) — quadratic in the hot bucket
    assert(Dedup.simhashPairsCapped(banded, Int.MaxValue).count() == 100L * 99 / 2 + 1)
    // capped: the boilerplate buckets (df=100 > 10) are removed in every
    // band; only the genuine pair (df=2 per bucket) survives
    val rows = Dedup.simhashPairsCapped(banded, 10).collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(0) == 1000L && rows.head.getLong(1) == 1001L)
    assert(rows.head.getInt(2) == 0)
  }

  test("forced distributed connected-components equals the driver union-find path") {
    val viaDriver = Dedup.dedupResolution(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    val viaDistributed = Dedup.dedupResolution(spark, sf0001, maxDriverEdges = 0)
      .collect().map(_.toSeq).toSeq
    assert(viaDriver.nonEmpty)
    assert(viaDistributed == viaDriver)
  }

  test("distributed min-label propagation resolves a fixture graph (branch provably runs)") {
    import spark.implicits._
    implicit val s = spark
    // chain 1-2-3-4 (diameter forces >1 propagation round), pair 10-11,
    // triangle 20-21-22, self-contained — nEdges=6 > maxDriverEdges=0, so
    // the distributed branch MUST execute (no vacuous driver fallback, the
    // hole the sf0.001 end-to-end comparison can't close if the corpus
    // yields zero near-dup edges)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
                    (20L, 21L), (21L, 22L), (20L, 22L)).toDF("doc_a", "doc_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
                       10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L)
    val distributed = Dedup.resolveComponents(pairs, maxDriverEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val driver = Dedup.resolveComponents(pairs, maxDriverEdges = Long.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distributed == expected)
    assert(driver == expected)
  }

  test("prefix-sum offsets guard: many-keys input auto-falls back to the window form") {
    import spark.implicits._
    // 500 distinct keys x 4 rows — the many-keys regime the offsets
    // scaffold is NOT for; with a tiny cap the guard must route to the
    // window form and still produce exact per-key exclusive prefix sums
    val df = (0 until 2000).map(i => (s"k${i % 500}", i.toLong, (i % 7 + 1).toLong))
      .toDF("k", "ord", "v")
    def collectSums(maxRows: Long): Map[(String, Long), Long] =
      graft.plans.PrefixSum.exclusiveRunningSum(
          df, col("v"), Seq("k"), Seq("ord"), "cum", maxDriverOffsetRows = maxRows)
        .select("k", "ord", "cum").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val viaFallback = collectSums(maxRows = 1)     // forced window form
    val viaOffsets = collectSums(maxRows = 1 << 20) // offsets scaffold
    val expected = (0 until 2000).map { i =>
      val k = s"k${i % 500}"
      // rows for key k are i = idx, idx+500, ... in ord order; exclusive sum
      val prior = (0 until 2000).filter(j => j % 500 == i % 500 && j < i)
        .map(j => (j % 7 + 1).toLong).sum
      (k, i.toLong) -> prior
    }.toMap
    assert(viaFallback == expected)
    assert(viaOffsets == expected)
  }

  test("prefix-sum over a DECIMAL order column: driver probe stays double, sums stay exact") {
    import spark.implicits._
    // the quantile probe's .head() must decode only primitive doubles on
    // the driver (a decimal array decodes through java.math.BigDecimal —
    // the round-8 foreign-JVM abort class), while bucketing stays a
    // monotone split and the sums stay exact longs
    val df = (0 until 1200).map(i => (s"k${i % 3}", i.toLong, 1L))
      .toDF("k", "i", "v")
      .withColumn("ord", col("i").cast(org.apache.spark.sql.types.DecimalType(18, 0)))
    def sums(maxRows: Long): Map[(String, Long), Long] =
      graft.plans.PrefixSum.exclusiveRunningSum(
          df, col("v"), Seq("k"), Seq("ord", "i"), "cum", maxDriverOffsetRows = maxRows)
        .select("k", "i", "cum").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val viaOffsets = sums(1L << 20) // decimal ord rides the double probe
    val viaWindow = sums(1)
    assert(viaOffsets == viaWindow)
    // k0 rows are i = 0, 3, 6, ... — exactly 300 of them precede i = 900
    assert(viaOffsets(("k0", 900L)) == 300L)
  }

  test("bucketed tables co-locate: bucket join plans without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    // remove orphaned managed-table locations from any earlier aborted run
    for (t <- Seq("li_b", "ord_b")) {
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) org.apache.hadoop.fs.FileUtil.fullyDelete(loc)
    }
    Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
    Tables.orders(spark, sf0001).select("o_orderkey", "o_orderdate")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("ord_b")
    // force the shuffle-join path (tiny fixtures would broadcast) to show
    // bucketing removes the exchange that a shuffle join would need
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("li_b").join(spark.table("ord_b"),
        col("l_orderkey") === col("o_orderkey"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
             s"bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("keySkew: bands partition every key's row mass; uniform vs fan-out keys separate") {
    val nLines = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").count()
    val out = Skew.keySkew(spark, sf0001).collect()
    val byKey = out.groupBy(_.getAs[String]("key_name"))
    assert(byKey.keySet == Skew.SkewProfileKeys.toSet)
    byKey.foreach { case (k, rows) =>
      // the bands partition the fact table exactly
      assert(rows.map(_.getAs[Long]("sum_rows")).sum == nLines, k)
      rows.foreach { r =>
        val band = r.getAs[Int]("freq_band")
        val mx = r.getAs[Long]("max_rows")
        // band b holds counts in [2^(b-1), 2^b)
        assert(mx < (1L << band) && mx >= (1L << (band - 1)), r.toString)
      }
    }
    // l_orderkey is near-uniform (a handful of lines per order); l_suppkey
    // fans out far wider — the profile must separate them
    val maxBand = (k: String) => byKey(k).map(_.getAs[Int]("freq_band")).max
    assert(maxBand("l_suppkey") > maxBand("l_orderkey"),
      s"suppkey ${maxBand("l_suppkey")} vs orderkey ${maxBand("l_orderkey")}")
  }
}
