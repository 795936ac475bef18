package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SeqPackSpec extends SparkSpec {
  import SeqPack._

  private def windowCum(df: org.apache.spark.sql.DataFrame): Seq[(String, Int, Long)] = {
    val w = Window.partitionBy("g").orderBy("i")
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("cum", coalesce(sum(col("v")).over(w), lit(0L)))
      .orderBy("g", "i").collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Int]("i"), r.getAs[Long]("cum"))).toSeq
  }

  private def scalableCum(df: org.apache.spark.sql.DataFrame,
                          numParts: Int): Seq[(String, Int, Long)] =
    graft.plans.PrefixSum
      .exclusiveRunningSum(df, col("v"), Seq("g"), Seq("i"), numParts = numParts)
      .orderBy("g", "i").collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Int]("i"), r.getAs[Long]("cum"))).toSeq

  test("two-phase exclusive running sum equals the window form (adversarial partitioning)") {
    import spark.implicits._
    val df = (0 until 257).map(i => (s"g${i % 3}", i, (i * 7 % 11).toLong))
      .toDF("g", "i", "v").repartition(7)
    assert(scalableCum(df, 5) == windowCum(df))
  }

  test("running sum: single bucket, zero values, and a key that is empty in early buckets") {
    import spark.implicits._
    // key g9 appears only in the top of the order range; zeros sprinkled in
    val rows = (0 until 120).map(i => ("g0", i, if (i % 4 == 0) 0L else i.toLong)) ++
      (120 until 140).map(i => ("g9", i, 3L))
    val df = rows.toDF("g", "i", "v").repartition(6)
    assert(scalableCum(df, 4) == windowCum(df))
    assert(scalableCum(df, 1) == windowCum(df)) // degenerate: no bucketing
  }

  test("KeyedOffsetRunningSum: interpreted eval equals the codegen path") {
    import spark.implicits._
    val df = (0 until 201).map(i => (s"g${i % 4}", i, (i % 9).toLong))
      .toDF("g", "i", "v").repartition(6)
    val withCodegen = scalableCum(df, 4)
    // wholeStage=false alone still runs generated UnsafeProjection code;
    // NO_CODEGEN forces InterpretedUnsafeProjection -> evalInternal
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = scalableCum(df, 4)
      assert(interpreted == withCodegen)
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("null values in the summed column read as 0 on both eval paths") {
    import spark.implicits._
    val df = (0 until 90)
      .map(i => (s"g${i % 2}", i, if (i % 5 == 0) None else Some(i.toLong)))
      .toDF("g", "i", "v").repartition(5)
    val zeroed = df.withColumn("v", coalesce(col("v"), lit(0L)))
    def run(d: org.apache.spark.sql.DataFrame) = scalableCum(d, 3)
    val expected = run(zeroed)
    assert(run(df) == expected)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run(df) == expected)
    finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("randomized sweep: scalable cumsum equals window form across sizes/keys/parts") {
    import spark.implicits._
    // property-style but seeded and bounded: each case costs real Spark
    // jobs, so a full scalacheck forAll (100 cases) is too slow — 8
    // deterministic draws cover the parameter space (including the
    // empty-string key, a dominant hot key, and single-row/single-part
    // degenerates)
    val rnd = new scala.util.Random(20260812L)
    val cases = Seq(
      (1, 1, 1),      // single row, single part
      (7, 1, 3),      // one key only
      (50, 2, 2),
      (120, 5, 4),
      (257, 3, 5),
      (400, 7, 8),
      (333, 4, 6),
      (600, 6, 7))
    for ((n, k, parts) <- cases) {
      val keys = (0 until k).map(j => if (j == 0) "" else s"k$j")
      val rows = (0 until n).map { i =>
        // hot key: ~half the rows land on key 0
        val g = if (rnd.nextBoolean()) keys.head else keys(rnd.nextInt(k))
        (g, i, rnd.nextInt(100).toLong)
      }
      val df = rows.toDF("g", "i", "v").repartition(1 + rnd.nextInt(6))
      assert(scalableCum(df, parts) == windowCum(df), s"case n=$n k=$k parts=$parts")
    }
  }

  test("seqPack audit matches a brute-force packing of the fixture corpus") {
    val res = seqPack(spark, sf0001).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
                 r.getAs[Long]("total_tokens"), r.getAs[Long]("n_seqs"),
                 r.getAs[Long]("n_boundary_docs"), r.getAs[Long]("max_doc_span"))).toSeq
    // brute force: per source ordered by doc_id, accumulate token counts
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"),
              size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"), r.getAs[Long]("n_tok")))
    val expected = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, rows) =>
      var cum = 0L
      var boundary = 0L
      var maxSpan = Long.MinValue
      rows.sortBy(_._2).foreach { case (_, _, t) =>
        val fc = cum / SeqBudget
        val lc = if (t > 0) (cum + t - 1) / SeqBudget else fc
        if (lc > fc) boundary += 1
        maxSpan = math.max(maxSpan, lc - fc + 1)
        cum += t
      }
      (src, rows.size.toLong, cum, (cum + SeqBudget - 1) / SeqBudget, boundary, maxSpan)
    }
    assert(res == expected)
  }
}
