package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale-curve validation of the dedup/ANN scaling claims (r12
  * verdict item 3): replicates the sf0.1 `documents`/`embeddings` fixtures
  * by an integer factor with FRESH ids, runs the staged near-dup pipeline
  * (`stageDocShingles` → prefix candidates → `q_dedup_jaccard_prefix` →
  * `q_dedup_resolution`) and the ANN family (staged IVF, IVF-PQ, brute
  * force) at each factor, and prints candidate/pair counts + wall time per
  * stage, so the "bucketed, never all-pairs / O(corpus)" claims are
  * MEASURED, not argued.
  *
  * Replication design — structure-preserving, never self-colliding:
  *
  *  - documents: copy c gets `doc_id + c·10⁶` and a per-copy Caesar
  *    rotation of letters and digits (`translate`). A rotation is a
  *    shingle-alphabet isomorphism: every copy's INTERNAL near-dup
  *    structure (shingle DF distribution, pair set, candidate set) is
  *    exactly the base corpus's, while cross-copy shingle overlap is zero
  *    (only whitespace/punctuation survive, and shingles span words) — so
  *    a pipeline that is O(corpus) must show candidates, pairs, and
  *    seconds growing ~linearly in the factor. Naive replication (same
  *    text, fresh ids) would instead plant factor²·N cross-copy duplicate
  *    pairs — an adversarial duplicate corpus, not a scaling probe.
  *  - embeddings: copy c gets `vec_id + c·18500` (a multiple of
  *    QueryStride·CentroidStride = lcm(50,37)·k, so the strided query and
  *    centroid PATTERNS are copy-invariant — queries and cells both grow
  *    with the corpus, the production ratio) and a cyclic coordinate
  *    rotation by c. Rotation is an isometry: intra-copy geometry is
  *    exactly the base corpus's, while cross-copy similarities scatter —
  *    copies behave as distinct corpora sharing one space (identical
  *    copies would stack duplicate centroids and concentrate every cell's
  *    occupancy, a degenerate geometry, not scaling).
  *
  * Expected shape (recorded in BASELINE.md): dedup counts and seconds
  * ~linear in the factor; IVF serving linear (queries ×f, per-query cell
  * work ~flat since cells grow with the corpus); brute force the
  * deliberate quadratic baseline (queries ×f times corpus ×f); the IVF
  * BUILD's assignment pass is N×C — the fixture's stride-derived C makes
  * it superlinear here, named and bounded in the module scaladoc (C is a
  * workload knob; production holds C fixed or grows it ~√N).
  *
  * Usage: ScaleCurve [baseDir] [factors] [mode] — defaults sf0.1, "1,3,10",
  * "full". Mode "adv" (r13 verdict item 6) runs ONLY the prefix near-dup
  * family on the ADVERSARIAL hot-shingle fixture: every doc in every copy
  * ends with the same literal boilerplate tail, so those shingles' corpus
  * document frequency equals the FULL doc count N·f — the exact d²
  * candidate bomb the prefix filter's df-ascending global order is
  * designed to starve (a raw inverted index would emit C(N·f, 2) ≈ 10⁹
  * pairs from the hot bucket alone at ×10). The probe measures candidates,
  * verified pairs, and wall per factor, plus the max observed df as proof
  * the fixture is actually adversarial; the defense holds iff candidates
  * and seconds stay ~linear in f.
  */
object ScaleCurve {

  private val Lower  = "abcdefghijklmnopqrstuvwxyz"
  private val Digits = "0123456789"

  private def rot(s: String, c: Int): String = {
    val k = c % s.length
    s.drop(k) + s.take(k)
  }

  private def caesarFrom: String = Lower + Lower.toUpperCase + Digits

  private def caesarTo(c: Int): String =
    rot(Lower, c) + rot(Lower.toUpperCase, c) + rot(Digits, c)

  /** Build (once) the factor-replicated fixture dir; returns its path. */
  private def fixture(spark: SparkSession, base: String, factor: Int,
                      work: String): String = {
    val dir = s"$work/x$factor"
    // versioned marker: a fixture layout change (v2 added lineitem) must
    // invalidate fixtures staged by the previous tool version
    val done = new java.io.File(s"$dir/_done_v2")
    if (!done.exists()) {
      val docs = spark.read.parquet(s"$base/documents.parquet")
      val emb = spark.read.parquet(s"$base/embeddings.parquet")
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      val docCopies = (0 until factor).map { c =>
        docs.select(
          (col("doc_id") + lit(c * 1000000L)).as("doc_id"),
          (if (c == 0) col("text")
           else translate(col("text"), caesarFrom, caesarTo(c))).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionAll _)
      docCopies.coalesce(math.max(1, factor / 2))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val embCopies = (0 until factor).map { c =>
        val k = c % dim
        val rotated =
          if (k == 0) col("embedding")
          else concat(slice(col("embedding"), k + 1, dim - k),
                      slice(col("embedding"), 1, k))
        emb.select((col("vec_id") + lit(c * 18500L)).as("vec_id"),
                   rotated.as("embedding"), col("label"))
      }.reduce(_ unionAll _)
      embCopies.coalesce(math.max(1, factor / 2))
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      // lineitem: copy c offsets l_orderkey by c·10⁶ (the fixed-width
      // layout's 12-char f_orderkey field holds it) — per-order structure,
      // the returnflag partitioning, and the (orderkey, linenumber) pack
      // ordering keys stay intact while copies never collide, so the ETL
      // chain's per-flag group sizes scale exactly ×factor
      val li = spark.read.parquet(s"$base/lineitem.parquet")
      val liCopies = (0 until factor).map { c =>
        li.withColumn("l_orderkey", col("l_orderkey") + lit(c * 1000000L))
      }.reduce(_ unionAll _)
      liCopies.coalesce(math.max(1, factor))
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      done.createNewFile()
    }
    dir
  }

  /** Tokens appended (after the per-copy rotation, so they are shared
    * ACROSS copies too) to every doc of the adversarial fixture: 6 tokens
    * → 4 pure-boilerplate 3-gram shingles whose df is the full doc count.
    */
  private val HotTail =
    " grafthotaa grafthotbb grafthotcc grafthotdd grafthotee grafthotff"

  /** Build (once) the adversarial hot-shingle fixture at `factor`. Same
    * copy scheme as [[fixture]] (fresh ids, Caesar-rotated uniques — so
    * cross-copy candidate structure stays zero on the UNIQUE content) with
    * [[HotTail]] appended un-rotated to every doc.
    */
  private def advFixture(spark: SparkSession, base: String, factor: Int,
                         work: String): String = {
    val dir = s"$work/adv_x$factor"
    val done = new java.io.File(s"$dir/_done_v1")
    if (!done.exists()) {
      val docs = spark.read.parquet(s"$base/documents.parquet")
      val copies = (0 until factor).map { c =>
        docs.select(
          (col("doc_id") + lit(c * 1000000L)).as("doc_id"),
          concat(
            if (c == 0) col("text")
            else translate(col("text"), caesarFrom, caesarTo(c)),
            lit(HotTail)).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionAll _)
      copies.coalesce(math.max(1, factor / 2))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      done.createNewFile()
    }
    dir
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("1,3,10").split(",").map(_.trim.toInt)
    val mode = args.lift(2).getOrElse("full")
    val spark = ToolSession.start()
    val work = new java.io.File("target/tmp/scale_curve").getAbsolutePath
    val D = graft.ops.Dedup
    val S = graft.ops.Similarity
    val staged = scala.collection.mutable.ListBuffer.empty[String]
    if (mode == "adv") {
      try {
        factors.foreach { f =>
          val dir = advFixture(spark, base, f, work)
          staged += D.docShinglesTable(dir)
          println(s"== adversarial factor $f ($dir) ==")
          def t(label: String)(body: => Unit): Unit =
            ToolSession.timed(spark, label)(body)
          t("adv: stageDocShingles (build)")(D.stageDocShingles(spark, dir))
          val sh = D.docShinglesStaged(spark, dir)
          println(s"  count: docs = ${sh.count()}")
          // proof the fixture is adversarial: the hot tail's df must equal
          // the full doc count (every doc shares it)
          val maxDf = sh.select(explode(col("shingles")).as("s"))
            .groupBy("s").agg(count(lit(1)).as("df"))
            .agg(max("df")).head().getLong(0)
          println(s"  count: max shingle df = $maxDf (d2 bomb = " +
            s"~${maxDf * (maxDf - 1) / 2} raw hot-bucket pairs)")
          var cand = 0L
          t("adv: prefix candidates") {
            cand = D.jaccardPrefixCandidatesLazy(
              sh, D.PrefixJaccardThreshold).count()
          }
          println(s"  count: prefix candidates = $cand")
          var verified = 0L
          t("adv: q_dedup_jaccard_prefix (verify)") {
            verified = D.ngramJaccardPrefix(spark, dir).count()
          }
          println(s"  count: verified pairs = $verified")
        }
      } finally {
        staged.distinct.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
        spark.stop()
      }
      return
    }
    try {
      factors.foreach { f =>
        val dir = fixture(spark, base, f, work)
        staged ++= Seq(D.docShinglesTable(dir), D.dedupPairsTable(dir))
        println(s"== factor $f ($dir) ==")
        def t(label: String)(body: => Unit): Unit =
          ToolSession.timed(spark, label)(body)
        // --- staged near-dup chain ---
        t("dedup: stageDocShingles (build)")(D.stageDocShingles(spark, dir))
        println(s"  count: shingled docs = ${D.docShinglesStaged(spark, dir).count()}")
        var cand = 0L
        t("dedup: prefix candidates") {
          cand = D.jaccardPrefixCandidatesLazy(
            D.docShinglesStaged(spark, dir), D.PrefixJaccardThreshold).count()
        }
        println(s"  count: prefix candidates = $cand")
        var verified = 0L
        t("dedup: q_dedup_jaccard_prefix (verify)") {
          verified = D.ngramJaccardPrefix(spark, dir).count()
        }
        println(s"  count: verified pairs = $verified")
        var capped = 0L
        t("dedup: stageDedupPairs (build)") {
          capped = spark.table(D.stageDedupPairs(spark, dir)).count()
        }
        println(s"  count: staged capped pairs = $capped")
        t("dedup: q_dedup_resolution")(D.dedupResolution(spark, dir).count())
        // --- ANN family ---
        t("ann: stageIvfIndex (build, NxC assignment)") {
          S.stageIvfIndex(spark, dir)
        }
        // the same build under the PRODUCTION centroid policy: stride grows
        // with the corpus so C stays at the factor-1 count — the N×C
        // assignment must then measure ~linear in the factor (the stated
        // mitigation for the fixture policy's superlinear curve, proven
        // here rather than argued). At factor 1 the two policies are the
        // SAME stride, so the probe would hit needsBuild's recovery
        // short-circuit on the tables the default build just staged and
        // time a catalog no-op — skip it rather than print a misleading
        // "build" number (r13 advice).
        if (f == 1)
          println(s"  ann: stageIvfIndex fixed-C policy: skipped at x1 — " +
            s"stride=${S.CentroidStride} is the default build above (same tables)")
        else
          t(s"ann: stageIvfIndex fixed-C policy (stride=${S.CentroidStride}*$f)") {
            S.stageIvfIndex(spark, dir, stride = S.CentroidStride.toLong * f)
          }
        staged ++= {
          val safe = dir.replaceAll("[^A-Za-z0-9]", "_")
          Seq(S.CentroidStride.toLong, S.CentroidStride.toLong * f).flatMap(s =>
            Seq(s"ivf_cells$s$safe", s"ivf_cents$s$safe"))
        }
        t("ann: q_knn_ivf_staged (serve)")(S.knnIvfStaged(spark, dir).count())
        t("ann: q_knn_ivf_pq")(S.knnIvfPq(spark, dir).count())
        t("ann: q_knn_bruteforce (quadratic baseline)") {
          S.knnBruteForce(spark, dir).count()
        }
        // --- ETL core (the reference's own operator chain, T1/T3) ---
        // format → parse → aggregate, and format → scalable pack(1000) →
        // length stats: the two full-corpus passes of the reconstruction.
        // Row-linear by construction; measured here so the claim has a
        // curve. The per-flag record counts must scale EXACTLY ×factor
        // (structure-preserving replication), printed as the count check.
        var nRecs = 0L
        t("etl: q_fixedwidth_parse (format+parse+agg)") {
          nRecs = graft.ops.Ingestion.fixedWidthParse(spark, dir)
            .agg(sum("n_records")).head().getLong(0)
        }
        println(s"  count: parsed records = $nRecs")
        t("etl: q_pack_scalable_stats (format+pack 1000→1)") {
          graft.ops.Ingestion.packScalableStats(spark, dir).count()
        }
      }
    } finally {
      // leave no probe-staged artifacts behind (the ShingleCost discipline)
      staged.distinct.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      spark.stop()
    }
  }
}
