package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics of the round-8 dedup-completion operators: quality-ranked
  * canonical selection (the keep-best step) and asymmetric containment
  * (the quote/subset detector Jaccard structurally misses).
  */
class DedupOpsSpec extends SparkSpec {

  private def writeDocs(rows: Seq[(Long, String, String)], dir: String): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("dedupCanonical: the longest cluster member overrides the min-id representative") {
    val tmp = java.nio.file.Files.createTempDirectory("canon").toString
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
    val tmp = java.nio.file.Files.createTempDirectory("contain").toString
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
}
