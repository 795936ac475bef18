package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics of the round-8 dedup-completion operators: quality-ranked
  * canonical selection (the keep-best step) and asymmetric containment
  * (the quote/subset detector Jaccard structurally misses).
  */
class DedupOpsSpec extends SparkSpec {

  /** Planted-fixture scope: the converted consumers self-stage the
    * doc_shingles/dedup_pairs artifacts for WHATEVER dir they are given, so
    * a temp-dir fixture would otherwise leave an orphan warehouse table
    * per test run. Drop the dir-addressed stages on the way out (both
    * paths — the withClearCache discipline applied to catalog state).
    */
  private def withPlantedDir[A](prefix: String)(body: String => A): A = {
    val tmp = java.nio.file.Files.createTempDirectory(prefix).toString
    try body(tmp)
    finally Seq(Dedup.docShinglesTable(tmp), Dedup.dedupPairsTable(tmp))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  private def writeDocs(rows: Seq[(Long, String, String)], dir: String): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("dedupCanonical: the longest cluster member overrides the min-id representative") {
    withPlantedDir("canon") { tmp =>
      // cluster {0,1,2}: 0 and 2 are identical 10-token docs, 1 appends a
      // token (jaccard 8/9 with each) and is the LONGEST → canonical must be
      // doc 1, overriding min-id label 0. doc 3 is isolated in its own source.
      val t = (1 to 10).map(i => s"w$i").mkString(" ")
      writeDocs(Seq(
        (0L, t, "s"), (1L, t + " zz", "s"), (2L, t, "s"),
        (3L, (1 to 6).map(i => s"u$i").mkString(" "), "t")), tmp)
      val out = Dedup.dedupCanonical(spark, tmp).collect()
        .map(r => r.getAs[String]("source") -> r).toMap
      val s0 = out("s")
      assert(s0.getAs[Long]("n_docs") == 3 && s0.getAs[Long]("n_canonical") == 1, s0.toString)
      assert(s0.getAs[Long]("n_quality_overrides") == 1, s0.toString)
      assert(s0.getAs[Long]("n_tokens_dropped") == 20, s0.toString) // docs 0 and 2
      val t0 = out("t")
      assert(t0.getAs[Long]("n_docs") == 1 && t0.getAs[Long]("n_canonical") == 1)
      assert(t0.getAs[Long]("n_quality_overrides") == 0 && t0.getAs[Long]("n_tokens_dropped") == 0)
    }
  }

  test("dedupCanonical: fixture audit conserves docs and never exceeds cluster counts") {
    val out = Dedup.dedupCanonical(spark, sf0001).collect()
    val res = Dedup.dedupResolution(spark, sf0001).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_kept")).toMap
    out.foreach { r =>
      val (n, c) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_canonical"))
      assert(c >= 1 && c <= n, r.toString)
      assert(r.getAs[Long]("n_quality_overrides") <= c, r.toString)
    }
    // canonical picks exactly one winner per cluster globally; resolution's
    // per-source countDistinct(label) counts a cross-source cluster once in
    // EVERY source it touches, so its sum is an upper bound, tight only for
    // source-pure clusters
    val canonTotal = out.map(_.getAs[Long]("n_canonical")).sum
    assert(canonTotal <= res.values.sum,
           s"canonical total $canonTotal exceeds resolution's per-source label sum ${res.values.sum}")
    assert(out.map(_.getAs[Long]("n_docs")).sum ==
           spark.read.parquet(s"$sf0001/documents.parquet").count(),
           "doc mass not conserved")
  }

  test("containmentPairs: a fully quoted short doc flags with containment 1.0, low-overlap pairs do not") {
    withPlantedDir("contain") { tmp =>
      // A (5 tokens, 3 shingles) is a verbatim prefix of B (25 tokens): every
      // A-shingle is in B → containment 1.0 while jaccard ≈ 3/23. C shares
      // only one shingle with A and B (containment 1/4 < 0.8). D and E are
      // identical (equal sizes → the larger id is the contained one).
      val a = "a b c d e"
      val b = a + " " + (1 to 20).map(i => s"f$i").mkString(" ")
      val c = "x y z a b c"
      val d = (1 to 7).map(i => s"d$i").mkString(" ")
      writeDocs(Seq((10L, a, "s"), (11L, b, "s"), (12L, c, "s"),
                    (13L, d, "s"), (14L, d, "s")), tmp)
      val out = Dedup.containmentPairs(spark, tmp).collect()
        .map(r => (r.getAs[Long]("contained_id"), r.getAs[Long]("container_id")) -> r).toMap
      assert(out.keySet == Set(10L -> 11L, 14L -> 13L), out.keys.toString)
      val ab = out(10L -> 11L)
      assert(ab.getAs[Double]("containment") == 1.0 && ab.getAs[Long]("n_contained") == 3, ab.toString)
      assert(ab.getAs[Long]("n_container") == 23, ab.toString)
      val de = out(14L -> 13L)
      assert(de.getAs[Double]("containment") == 1.0, de.toString)
      assert(de.getAs[Long]("n_contained") == de.getAs[Long]("n_container"), de.toString)
    }
  }

  test("containmentPairs: fixture pairs are direction-consistent and above threshold") {
    val out = Dedup.containmentPairs(spark, sf0001).collect()
    out.foreach { r =>
      assert(r.getAs[Double]("containment") >= Dedup.ContainmentThreshold, r.toString)
      assert(r.getAs[Long]("n_contained") <= r.getAs[Long]("n_container"), r.toString)
      assert(r.getAs[Long]("inter") <= r.getAs[Long]("n_contained"), r.toString)
    }
    val again = Dedup.containmentPairs(spark, sf0001).collect()
    assert(out.toSeq == again.toSeq, "containmentPairs not deterministic")
  }

  // --- prefix-filtered Jaccard -----------------------------------------------

  private def normalizedPairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long, Long, Double)] =
    df.select(col("doc_a").cast("long"), col("doc_b").cast("long"),
              col("inter").cast("long"), col("n_a").cast("long"),
              col("n_b").cast("long"), col("jaccard"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getDouble(5)))
      .toSet

  test("ngramJaccardPrefix ≡ ngramJaccard∩[j≥0.8] on the fixture (prefix filter is lossless)") {
    // the full 0.5-threshold result carries exact jaccard values, so its
    // ≥ 0.8 slice IS the unpruned definition at the prefix threshold
    val prefix = normalizedPairs(Dedup.ngramJaccardPrefix(spark, sf0001))
    val full = normalizedPairs(Dedup.ngramJaccard(spark, sf0001))
      .filter(_._6 >= Dedup.PrefixJaccardThreshold)
    assert(prefix == full,
      s"prefix path diverged: only-prefix=${(prefix -- full).take(3)} only-full=${(full -- prefix).take(3)}")
    assert(full.nonEmpty, "fixture has no j≥0.8 near-dup pairs — equivalence test vacuous")
  }

  test("prefix filter starves the hot-shingle bucket: one shared boilerplate gram, zero candidates") {
    withPlantedDir("jacpre") { tmp =>
      // 10 docs, each 8 unique tokens + the same 3-token boilerplate tail:
      // exactly ONE shared shingle per pair (df = 10), jaccard 1/17 << 0.5.
      // The raw inverted index would emit all 45 pairs into the hot bucket;
      // here each doc has cnt2 = 1 repeated shingle against a prefix budget
      // of cnt2 - ceil(0.8*9) + 1 = -6, so the prefix index emits ZERO.
      writeDocs((0L until 10L).map { i =>
        val uniq = (1 to 8).map(j => s"u${i}x$j").mkString(" ")
        (i, s"$uniq common1 common2 common3", "s")
      }, tmp)
      val cand = Dedup.jaccardPrefixCandidates(
        Dedup.docShingles(spark, tmp), Dedup.PrefixJaccardThreshold)
      assert(cand.count() == 0, "hot shingle leaked into a prefix")
      // and the end-to-end result still matches the unpruned definition
      // (both empty: the only shared shingle gives jaccard 1/17)
      assert(normalizedPairs(Dedup.ngramJaccardPrefix(spark, tmp)) ==
             normalizedPairs(Dedup.ngramJaccard(spark, tmp)))
    }
  }

  test("prefix path finds a planted qualifying pair with exact intersection") {
    withPlantedDir("jacpre2") { tmp =>
      // doc 0 and doc 1: 12-token base + one appended token on doc 1 →
      // 10 shared shingles of doc0's 10 and doc1's 11, jaccard 10/11 ≥ 0.5.
      // doc 2 is disjoint.
      val base = (1 to 12).map(j => s"w$j").mkString(" ")
      writeDocs(Seq(
        (0L, base, "s"), (1L, base + " tail", "s"),
        (2L, (1 to 12).map(j => s"z$j").mkString(" "), "s")), tmp)
      val out = normalizedPairs(Dedup.ngramJaccardPrefix(spark, tmp))
      assert(out == Set((0L, 1L, 10L, 10L, 11L, 10.0 / 11.0)), out.toString)
    }
  }
}
