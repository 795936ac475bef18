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
}
