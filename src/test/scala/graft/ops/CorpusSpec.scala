package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Unit coverage for the corpus-construction ops (span-level dup audit,
  * BPE pair counting, DSIR importance weights) on hand-built fixtures where
  * the expected answer is checkable by eye — the DuckDB oracle gate covers
  * the full-corpus runs.
  */
class CorpusSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def docsDF(rows: (Long, String, String, String)*) =
    rows.toDF("doc_id", "text", "lang", "source")

  test("dupSpanAudit: planted shared span found, short docs audited with zero windows") {
    val span = (1 to 5).map(i => s"w$i").mkString(" ") // 5-token span
    val df = docsDF(
      (0L, s"alpha $span beta", "en", "a"),   // 7 tokens -> 3 windows at w=5
      (1L, s"gamma delta $span", "en", "a"),  // shares the span
      (2L, "only three tokens", "en", "b"),   // below w -> 0 windows
      (3L, "u1 u2 u3 u4 u5 u6", "en", "b"))   // 2 windows, unique
    val out = Corpus.dupSpanAudit(df, w = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // source a: docs 0 and 1 each contain the span once; exactly one window
    // hash (the span itself) repeats, each doc contributes 1 dup window
    assert(out.toSeq == Seq(
      ("a", 2L, 6L, 2L, 2L, 1L),
      ("b", 2L, 2L, 0L, 0L, 0L)))
  }

  test("bpePairStats: counts, deterministic tie-break, single-token docs skipped") {
    val df = docsDF(
      (0L, "x y x y", "en", "a"),   // pairs: "x y", "y x", "x y"
      (1L, "x y", "en", "a"),       // "x y"
      (2L, "solo", "en", "a"))      // no pairs
    val out = Corpus.bpePairStats(df, k = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq((1, "x y", 3L), (2, "y x", 1L)))
  }

  test("bpeMergeLog: greedy merge application, run parity, and round-2 sees round-1's fusion") {
    // round 1: "a b" wins (3 occurrences) → every one fuses (none overlap);
    // round 2's corpus is "a_b a_b c", "a_b c", "c c c" → winner "a_b c"
    // would tie "c c" at... count: "a_b a_b"=1, "a_b c"=2, "c c"=2 →
    // tiebreak pair asc: "a_b c" < "c c" → round 2's winner CONTAINS the
    // round-1 fused token (the iterated property q_bpe_pairs can't show).
    val df = docsDF(
      (0L, "a b a b c", "en", "a"),
      (1L, "a b c", "en", "a"),
      (2L, "c c c", "en", "b"))
    val out = Corpus.bpeMergeLog(df, steps = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out(0) == (1, "a b", 3L, 11L, 8L), s"round 1: ${out(0)}")
    assert(out(1) == (2, "a_b c", 2L, 8L, 6L), s"round 2: ${out(1)}")
  }

  test("bpeMergeLog: overlapping runs merge at even offsets only (greedy left-to-right)") {
    // "x x x x x" with winner (x,x): greedy fuses positions 1-2 and 3-4,
    // leaving the odd tail → 5 tokens become 3 (x_x, x_x, x); the pair
    // COUNT is 4 but only 2 merges apply
    val df = docsDF((0L, "x x x x x", "en", "a"))
    val out = Corpus.bpeMergeLog(df, steps = 1).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out(0) == (1, "x x", 4L, 5L, 3L), s"run parity violated: ${out(0)}")
  }

  test("bpeMergeLog: differential check vs a sequential reference on seeded random corpora") {
    import spark.implicits._
    // tiny alphabet maximizes runs and overlapping matches — the parity
    // rule's adversarial regime; the reference is the obvious sequential
    // greedy scan, kept independent of the windowed/array formulations
    def refGreedy(toks: Vector[String], p1: String, p2: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == p1 && toks(i + 1) == p2) {
          out += (p1 + "_" + p2); i += 2
        } else { out += toks(i); i += 1 }
      }
      out.result()
    }
    def refLog(corpus0: Seq[Vector[String]], steps: Int): Seq[(Int, String, Long, Long, Long)] = {
      var corpus = corpus0
      val log = Seq.newBuilder[(Int, String, Long, Long, Long)]
      for (t <- 1 to steps) {
        val counts = corpus.flatMap(_.sliding(2).filter(_.length == 2))
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        if (counts.nonEmpty) {
          val (win, cnt) = counts.toSeq.minBy { case (p, c) => (-c, p(0), p(1)) }
          val before = corpus.map(_.length.toLong).sum
          corpus = corpus.map(t0 => refGreedy(t0, win(0), win(1)))
          log += ((t, s"${win(0)} ${win(1)}", cnt, before, corpus.map(_.length.toLong).sum))
        }
      }
      log.result()
    }
    val rnd = new scala.util.Random(42)
    for (c <- 1 to 6) {
      val docs = (0 until (2 + rnd.nextInt(4))).map { id =>
        val n = rnd.nextInt(13)
        (id.toLong, "s", Vector.fill(n)(if (rnd.nextBoolean()) "a" else "b").mkString(" "))
      }
      val expect = refLog(docs.map(_._3.split("\\s+").toVector.filter(_.nonEmpty)), steps = 2)
      val got = Corpus.bpeMergeLog(docs.toDF("doc_id", "source", "text"), steps = 2)
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq
      assert(got == expect, s"case $c: docs=${docs.map(_._3)}\n got=$got\n exp=$expect")
    }
  }

  test("bpeMergeLog: successive winners are distinct (a merged pair never wins twice)") {
    val out = Corpus.bpeMerges(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == Corpus.BpeMergeSteps)
    val pairs = out.map(_.getString(1))
    assert(pairs.distinct.length == pairs.length, s"repeat winner: ${pairs.mkString(", ")}")
    // token counts chain and strictly decrease round over round
    for (i <- out.indices) {
      val (nb, na) = (out(i).getLong(3), out(i).getLong(4))
      assert(na < nb, s"round ${i + 1} merged nothing")
      if (i > 0) assert(nb == out(i - 1).getLong(4), "token counts don't chain")
    }
  }

  test("bpeCompressionAudit: per-source totals reconcile with the merge log") {
    val dir = "/root/testdata/sf0.001"
    val log = Corpus.bpeMerges(spark, dir).collect()
    spark.catalog.clearCache() // chain caches from the log run
    val comp = Corpus.bpeCompressionAudit(
      graft.util.Spread.forCpu(graft.Tables.documents(spark, dir))).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    spark.catalog.clearCache() // compression audit leaves finalGen pinned
    // corpus-wide mass: Σ tokens_before == log round 1's n_tokens_before,
    // Σ tokens_after == final round's n_tokens_after — same chain, same data
    assert(comp.map(_._3).sum == log.head.getLong(3), "before-mass mismatch vs log")
    assert(comp.map(_._4).sum == log.last.getLong(4), "after-mass mismatch vs log")
    assert(comp.map(_._5).sum ==
      log.head.getLong(3) - log.last.getLong(4), "merge totals mismatch")
    for ((src, nDocs, before, after, merges) <- comp) {
      assert(nDocs > 0 && before >= after && merges == before - after, s"bad row: $src")
    }
  }

  test("sourceDivergence: identical sources at exactly 0, disjoint pairs absent, bounds hold") {
    import spark.implicits._
    // sources a and b share the identical token multiset → JSD exactly 0
    // (every shared term is p·ln(1) = 0 and both shared masses are 1);
    // source c shares nothing with them → no (a,c)/(b,c) rows
    val df = Seq(
      (1L, "a", "x y z x"), (2L, "b", "x x y z"),
      (3L, "c", "q r s")
    ).toDF("doc_id", "source", "text")
    val out = Corpus.sourceDivergenceOf(df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    spark.catalog.clearCache()
    assert(out.toSeq == Seq(("a", "b", 3L, 0.0)), s"got: ${out.toSeq}")
    // fixture matrix: complete, bounded by ln 2, strictly positive
    val fx = Corpus.sourceDivergence(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getDouble(3))
    spark.catalog.clearCache()
    val nSrc = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("source").distinct().count()
    assert(fx.length == nSrc * (nSrc - 1) / 2, "matrix incomplete — some pair shares no token?")
    assert(fx.forall(v => v > 0 && v <= math.log(2) + 1e-9), s"jsd out of bounds: ${fx.max}")
  }

  test("spanNovelty: fixture non-vacuous in both directions; ratios well-formed") {
    val out = Corpus.spanNovelty(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    val (spans, novel) = (out.map(_._3).sum, out.map(_._4).sum)
    assert(novel > 0, "no novel spans — history would have seen everything")
    assert(novel < spans,
      "every batch span novel — the planted cross-boundary near-dups should repeat history spans")
    out.foreach { case (src, docs, s, n) =>
      assert(docs > 0 && n <= s, s"malformed row for $src")
    }
  }

  test("dsirAudit: target-like docs weigh positive, background-only docs negative") {
    // 'en' docs use tokens {good, nice}; the 'xx' doc uses {bad} — under
    // smoothed unigram models p_target(good) >> p_raw-only tokens, so the
    // en-like doc scores positive and the bad-token doc negative.
    val df = docsDF(
      (0L, "good nice good", "en", "a"),
      (1L, "good nice", "en", "a"),
      (2L, "bad bad bad", "xx", "b"),
      (3L, "good bad", "xx", "c")) // mixed
    val out = Corpus.dsirAudit(df, targetLang = "en").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    val bySrc = out.map(t => t._1 -> t).toMap
    assert(bySrc("a")._3 == 2L, "both en-like docs selected")
    assert(bySrc("a")._4 > 0, "en-like source weighs positive")
    assert(bySrc("b")._3 == 0L, "bad-token doc not selected")
    assert(bySrc("b")._4 < 0, "background-only source weighs negative")
  }

  test("dupSpans/bpePairs/dsirWeights run end-to-end on the fixture tables") {
    val dir = "/root/testdata/sf0.001"
    assert(Corpus.dupSpans(spark, dir).count() > 0)
    assert(Corpus.bpePairs(spark, dir).count() > 0)
    assert(Corpus.dsirWeights(spark, dir).count() > 0)
  }

  test("sourceOverlapSketch: complete pair matrix, sketch consistent with exact, bounded estimate error") {
    val dir = "/root/testdata/sf0.001"
    val out = Corpus.sourceOverlapSketch(spark, dir).collect()
    val nSrc = spark.read.parquet(s"$dir/documents.parquet")
      .select("source").distinct().count().toInt
    assert(out.length == nSrc * (nSrc - 1) / 2, s"matrix incomplete: ${out.length}")
    assert(out.exists(_.getAs[Long]("n_shared_exact") > 0),
      "planted cross-source near-dups should overlap")
    out.foreach { r =>
      val (nb, ex) = (r.getAs[Long]("n_both"), r.getAs[Long]("n_shared_exact"))
      val (na, b) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      val ku = r.getAs[Long]("k_used")
      // a shared sketch hash IS a shared span: no false positives
      if (ex == 0) assert(nb == 0, r.toString)
      assert(ku > 0 && ku <= 2L * Corpus.OverlapSketchK && nb <= ku, r.toString)
      // bottom-k estimate vs true Jaccard: deterministic fixture, generous
      // 3σ-ish band for k=128
      val jTrue = ex.toDouble / (na + b - ex)
      assert(math.abs(r.getAs[Double]("j_est") - jTrue) < 0.2,
        s"estimate off: ${r.getAs[Double]("j_est")} vs $jTrue ($r)")
    }
  }

  test("zipfFit: a perfect 1/r law recovers slope -1 and intercept ln C; fixture run well-formed") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("zipf").toString
    // counts 6, 3, 2 = 6/r for ranks 1..3 → exact Zipf with s = 1, C = 6
    Seq((0L, "a a a a a a b b b c c", "en", "s0", 21))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = Corpus.zipfFit(spark, tmp).collect().head
    assert(r.getAs[Long]("n_ranks") == 3)
    assert(math.abs(r.getAs[Double]("slope") + 1.0) < 1e-9, r.toString)
    assert(math.abs(r.getAs[Double]("intercept") - math.log(6.0)) < 1e-9, r.toString)
    // fixture: a shared-vocab synthetic corpus is much flatter than s=1 —
    // exactly what the diagnostic should expose
    val f = Corpus.zipfFit(spark, "/root/testdata/sf0.001").collect().head
    assert(f.getAs[Double]("slope") < 0.0 && f.getAs[Double]("slope") > -1.0)
  }

  test("pmiPairs: hand-computed PMI on a planted corpus; window-2 skip pairs; pair key normalized") {
    import spark.implicits._
    // corpus "a b" ×2, "c d" ×1 → window-2 forward pairs: (a,b)×2, (c,d)×1
    // T=6 tokens, P=3 pairs; PMI(a,b) = ln(2·6·6 / (3·2·2)) = ln(6),
    // PMI(c,d) = ln(1·6·6 / (3·1·1)) = ln(12)
    val docs = Seq("a b", "a b", "c d").toDF("text")
    val out = Corpus.pmiPairsOf(docs).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) -> r).toMap
    assert(out.keySet == Set(("a", "b"), ("c", "d")))
    assert(out(("a", "b")).getAs[Long]("c_ab") == 2)
    assert(math.abs(out(("a", "b")).getAs[Double]("pmi") - math.log(6.0)) < 1e-12)
    assert(math.abs(out(("c", "d")).getAs[Double]("pmi") - math.log(12.0)) < 1e-12)
    // skip-distance 2 and lexicographic normalization: "z y x" pairs
    // (y,z) d=1, (x,z) d=2, (x,y) d=1 — all normalized to sorted order
    val skip = Corpus.pmiPairsOf(Seq("z y x").toDF("text")).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"))).toSet
    assert(skip == Set(("y", "z"), ("x", "z"), ("x", "y")))
  }

  test("vocabGrowth: all-new shingles give beta exactly 1 and ln_k exactly 0; fixture beta in (0,1)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("heaps").toString
    // 8 docs, each with 4 unique tokens → 2 unique shingles per doc, never
    // repeated: at every checkpoint t_i = v_i, so the log-log points lie on
    // y = x and the OLS slope/intercept are BIT-exact 1.0 / 0.0 (sxy = sxx,
    // sy = sx — the formula cancels algebraically, not numerically)
    (0 until 8).map(i => (i.toLong, s"a$i b$i c$i d$i", "en", "s", 11))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = Corpus.vocabGrowth(spark, tmp).collect().head
    assert(r.getAs[Long]("n_points") == 4)
    assert(r.getAs[Long]("tokens_full") == 16 && r.getAs[Long]("vocab_full") == 16, r.toString)
    assert(r.getAs[Double]("beta") == 1.0, r.toString)
    assert(r.getAs[Double]("ln_k") == 0.0, r.toString)
    // fixture: shingle novelty grows sublinearly but strictly
    val f = Corpus.vocabGrowth(spark, sf0001).collect().head
    val beta = f.getAs[Double]("beta")
    assert(beta > 0.0 && beta <= 1.0, f.toString)
    assert(f.getAs[Long]("vocab_full") <= f.getAs[Long]("tokens_full"), f.toString)
    val again = Corpus.vocabGrowth(spark, sf0001).collect().head
    assert(f == again, "vocabGrowth not deterministic")
  }
}
