package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics of the round-8 analytics operators: Markov transition
  * normalization, MAD robust-outlier arithmetic (including the even-count
  * ×2 median fixed point), BM25 length normalization, and RRF fusion
  * score reconstruction.
  */
class AnalyticsSpec extends SparkSpec {

  private def writeEvents(rows: Seq[(Long, Int, Long, String, Double)], dir: String): Unit = {
    import spark.implicits._
    rows.toDF("event_id", "d", "user_id", "event_type", "value")
      .withColumn("ts", expr("make_timestamp(2024, 1, d, 12, 0, 0)"))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("markovNext: planted sequences — exact counts, ppm rows sum per source, id tiebreak") {
    // user 1: A,B,A,B (transitions A→B, B→A, A→B); user 2: A,A (A→A)
    val tmp = java.nio.file.Files.createTempDirectory("markov").toString
    writeEvents(
      Seq((1L, 1, 1L, "A", 1.0), (2L, 2, 1L, "B", 1.0),
          (3L, 3, 1L, "A", 1.0), (4L, 4, 1L, "B", 1.0),
          (5L, 1, 2L, "A", 1.0), (6L, 2, 2L, "A", 1.0)), tmp)
    val out = Temporal.markovNext(spark, tmp).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("total_from"), r.getAs[Long]("p_ppm"))).toMap
    assert(out.keySet == Set("A" -> "B", "B" -> "A", "A" -> "A"))
    assert(out("A" -> "B") == ((2L, 3L, 666666L)), out.toString)
    assert(out("A" -> "A") == ((1L, 3L, 333333L)), out.toString)
    assert(out("B" -> "A") == ((1L, 1L, 1000000L)), out.toString)
  }

  test("markovNext: same-timestamp events order by event_id (deterministic successor)") {
    import spark.implicits._
    // both events on the SAME day/time — the lead() must use event_id
    val tmp = java.nio.file.Files.createTempDirectory("markovtie").toString
    Seq((2L, 1L, "B", 1.0), (1L, 1L, "A", 1.0))
      .toDF("event_id", "user_id", "event_type", "value")
      .withColumn("ts", expr("make_timestamp(2024, 1, 1, 12, 0, 0)"))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Temporal.markovNext(spark, tmp).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("from_type") == "A" &&
           out.head.getAs[String]("to_type") == "B", out.mkString(","))
  }

  test("pathTopK: prefixes cap at P, short histories keep their full path, counts aggregate") {
    val tmp = java.nio.file.Files.createTempDirectory("path").toString
    // u1: A,B,C,D -> prefix A>B>C (4th event ignored); u2: A,B,C -> same
    // path; u3: A,B (short history kept at len 2); u4: Z,A
    writeEvents(Seq(
      (1L, 1, 1L, "A", 1.0), (2L, 2, 1L, "B", 1.0), (3L, 3, 1L, "C", 1.0), (4L, 4, 1L, "D", 1.0),
      (5L, 1, 2L, "A", 1.0), (6L, 2, 2L, "B", 1.0), (7L, 3, 2L, "C", 1.0),
      (8L, 1, 3L, "A", 1.0), (9L, 2, 3L, "B", 1.0),
      (10L, 1, 4L, "Z", 1.0), (11L, 2, 4L, "A", 1.0)), tmp)
    val out = Temporal.pathTopK(spark, tmp).collect()
      .map(r => r.getAs[String]("path") -> (r.getAs[Int]("path_len"), r.getAs[Long]("n_users")))
      .toMap
    assert(out == Map("A>B>C" -> ((3, 2L)), "A>B" -> ((2, 1L)), "Z>A" -> ((2, 1L))), out.toString)
  }

  test("madOutliers: planted spike flagged through a robust band; zero-MAD flags any deviation") {
    val tmp = java.nio.file.Files.createTempDirectory("mad").toString
    // "y": units 1e5..2e5 + 1e6 spike → med2 = 3.2e5, mad4 = 1.6e5, only
    // the spike crosses 3·MAD. "x": six flat days + spike → MAD = 0, the
    // degenerate band flags exactly the deviating day.
    writeEvents(
      (1 to 7).map(d => (d.toLong, d, 1L, "x", if (d == 7) 100.0 else 10.0)) ++
      (1 to 7).map(d => ((d + 10).toLong, d, 1L, "y",
        if (d == 7) 100.0 else 10.0 + 2.0 * (d - 1))), tmp)
    val out = Temporal.madOutliers(spark, tmp).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("day").toString) -> r)
      .toMap
    val y1 = out("y" -> "2024-01-01")
    assert(y1.getAs[Long]("med2") == 320000L && y1.getAs[Long]("mad4") == 160000L, y1.toString)
    (1 to 7).foreach { d =>
      val r = out("y" -> f"2024-01-$d%02d")
      assert(r.getAs[Int]("is_outlier") == (if (d == 7) 1 else 0), r.toString)
    }
    val x = (1 to 7).map(d => out("x" -> f"2024-01-$d%02d"))
    assert(x.head.getAs[Long]("mad4") == 0L)
    assert(x.map(_.getAs[Int]("is_outlier")).sum == 1 && x.last.getAs[Int]("is_outlier") == 1)
  }

  test("madOutliers: even day count interpolates the ×2 median exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("madeven").toString
    // units 1e5,2e5,3e5,4e5 → median 2.5e5 (x.5 exact at ×2): med2 = 5e5;
    // dev2 = 3e5,1e5,1e5,3e5 → median 2e5 → mad4 = 4e5; nothing flagged
    writeEvents((1 to 4).map(d => (d.toLong, d, 1L, "e", d * 10.0)), tmp)
    val out = Temporal.madOutliers(spark, tmp).collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(r.getAs[Long]("med2") == 500000L && r.getAs[Long]("mad4") == 400000L, r.toString)
      assert(r.getAs[Int]("is_outlier") == 0, r.toString)
    }
  }

  test("bm25TopK: identical docs tie exactly; a longer doc with equal tf scores lower") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("bm25").toString
    // aa..ee have df=3 → the 5 probe terms; doc 2 adds a non-probe token,
    // so its tf vector matches docs 0/1 but its dl is longer
    val t = "aa bb cc dd ee"
    Seq((0L, t), (1L, t), (2L, t + " qq"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.bm25TopK(spark, tmp).collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(0L, 1L, 2L), out.mkString(","))
    val s = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(s(0L) == s(1L), "identical docs must tie bit-exactly")
    assert(s(2L) < s(0L), "length normalization must penalize the longer doc")
    out.foreach(r => assert(r.getAs[Int]("n_terms") == 5 && r.getAs[Double]("score") > 0.0))
  }

  test("bm25TopK: fixture run — descending scores, bounded terms, deterministic") {
    val out = TextAnalysis.bm25TopK(spark, sf0001).collect()
    assert(out.nonEmpty && out.length <= TextAnalysis.BmTopK)
    val scores = out.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sorted.reverse), "not score-sorted")
    out.foreach { r =>
      val nt = r.getAs[Int]("n_terms")
      assert(nt >= 1 && nt <= TextAnalysis.BmPivots, r.toString)
    }
    val again = TextAnalysis.bm25TopK(spark, sf0001).collect()
    assert(out.toSeq == again.toSeq, "bm25TopK not deterministic")
  }

  test("knnHubness: histogram conserves vectors and retrievals, includes antihubs") {
    val out = Similarity.knnHubness(spark, sf0001).collect()
    val nVecs = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    val nRetrievals = Similarity.knnBruteForce(spark, sf0001).count()
    assert(out.map(_.getAs[Long]("n_vectors")).sum == nVecs, "vector mass not conserved")
    assert(out.map(r => r.getAs[Long]("k_occ") * r.getAs[Long]("n_vectors")).sum == nRetrievals,
           "retrieval mass not conserved")
    assert(out.exists(_.getAs[Long]("k_occ") == 0L), "antihub bucket missing")
    val ks = out.map(_.getAs[Long]("k_occ"))
    assert(ks.sameElements(ks.sorted), "histogram not k-ordered")
  }

  test("rrfFusion: scores reconstruct from ranks, fused order is descending, ranks bounded") {
    val out = Similarity.rrfFusion(spark, sf0001).collect()
    assert(out.nonEmpty && out.length <= Similarity.RrfTopK)
    val scores = out.map(_.getAs[Double]("rrf_score"))
    assert(scores.sameElements(scores.sorted.reverse), "not rrf-sorted")
    out.foreach { r =>
      val (rl, rd) = (r.getAs[Int]("r_lex"), r.getAs[Int]("r_dense"))
      assert(rl >= 0 && rl <= Similarity.RrfCandidates, r.toString)
      assert(rd >= 0 && rd <= Similarity.RrfCandidates, r.toString)
      assert(rl > 0 || rd > 0, "a fused row must appear in at least one ranking")
      val expect = (if (rl > 0) 1.0 / (Similarity.RrfK + rl) else 0.0) +
                   (if (rd > 0) 1.0 / (Similarity.RrfK + rd) else 0.0)
      assert(r.getAs[Double]("rrf_score") == expect, r.toString)
    }
    val again = Similarity.rrfFusion(spark, sf0001).collect()
    assert(out.toSeq == again.toSeq, "rrfFusion not deterministic")
  }

  test("rollingDistinct: exact-7-day gap splits runs whose deltas cancel; zero-activity days covered") {
    // user 1 active on day 1 and day 8 (gap EXACTLY 7: two coverage runs
    // [1,7] and [8,14], whose -1/+1 boundary deltas land on day 8 and
    // cancel — coverage is continuous); user 2 active day 1 only
    val tmp = java.nio.file.Files.createTempDirectory("rolldist").toString
    writeEvents(Seq(
      (1L, 1, 1L, "view", 0.0),
      (2L, 8, 1L, "view", 0.0),
      (3L, 1, 2L, "click", 0.0)), tmp)
    val out = Temporal.rollingDistinct(spark, tmp).collect()
      .map(r => r.getDate(0).toString ->
                ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.size == 8, s"spine must span day 1..8: $out")
    assert(out("2024-01-01") == ((2L, 2L)), out.toString)
    // days 2-7: no activity, but both users' trailing-7d coverage holds
    (2 to 7).foreach { d =>
      assert(out(f"2024-01-$d%02d") == ((0L, 2L)), s"day $d: $out")
    }
    // day 8: only user 1 was active in [day 2, day 8]
    assert(out("2024-01-08") == ((1L, 1L)), out.toString)
  }

  test("bootstrapCi: deterministic, CI ordered around the point estimate, B resamples") {
    val out = Relational.bootstrapCi(spark, sf0001).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_resamples") == Relational.BootstrapResamples)
    val (lo, pt, hi) = (r.getAs[Double]("ci_lo"),
      r.getAs[Double]("point_mean"), r.getAs[Double]("ci_hi"))
    assert(lo < hi, r.toString)
    // fixed fixture + keyed hash ⇒ the interval is a constant of the data;
    // the bootstrap-mean distribution clusters on the point estimate
    assert(lo <= pt && pt <= hi, r.toString)
    val again = Relational.bootstrapCi(spark, sf0001).collect()
    assert(out.toSeq == again.toSeq, "bootstrapCi not deterministic")
  }
}
