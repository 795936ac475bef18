package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The r18 codegen vector primitives must be BIT-IDENTICAL to the
  * higher-order-function chains they replaced on the hot similarity paths
  * (guide §4 — the swap is only legal because no hash-compared result can
  * change). Each test evaluates both forms over the real embeddings
  * fixture and demands exact equality, including the adversarial shapes
  * (empty arrays, null elements) the fixtures never produce.
  */
class VecOpsSpec extends SparkSpec {
  import graft.plans.{SqDequant, VecCastDouble, VecScaleFloor}

  private def emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("vec_cast_double == transform(cast) on the float fixture, bit-exact") {
    withClearCache {
      val both = emb.select(
        VecCastDouble.column(col("embedding")).as("a"),
        transform(col("embedding"), x => x.cast("double")).as("b"))
      assert(both.filter(not(col("a") <=> col("b"))).count() === 0)
      assert(both.count() > 0)
    }
  }

  test("vec_cast_double widens long arrays exactly (the centroid-sum path)") {
    withClearCache {
      val df = spark.range(1).select(
        array(lit(Long.MaxValue), lit(-7L), lit(0L)).as("v"))
      val r = df.select(VecCastDouble.column(col("v")).as("a"),
          transform(col("v"), x => x.cast("double")).as("b"))
        .head()
      assert(r.getSeq[Double](0) === r.getSeq[Double](1))
    }
  }

  test("vec_cast_double: null array -> null, null elements stay null, empty stays empty") {
    withClearCache {
      val df = spark.sql(
        """SELECT * FROM VALUES
          |  (CAST(NULL AS ARRAY<FLOAT>)),
          |  (ARRAY(CAST(1.5 AS FLOAT), CAST(NULL AS FLOAT))),
          |  (ARRAY(CAST(NULL AS FLOAT), CAST(-2.25 AS FLOAT))),
          |  (CAST(ARRAY() AS ARRAY<FLOAT>)) AS t(v)""".stripMargin)
      val both = df.select(VecCastDouble.column(col("v")).as("a"),
        transform(col("v"), x => x.cast("double")).as("b"))
      assert(both.filter(not(col("a") <=> col("b"))).count() === 0)
    }
  }

  test("vec_scale_floor == transform(floor(x*scale)) on the fixture, incl. null elements") {
    withClearCache {
      val v = Similarity.asDouble(col("embedding"))
      val both = emb.select(
          VecScaleFloor.column(v, lit(Similarity.QuantScale)).as("a"),
          transform(v, x => floor(x * lit(Similarity.QuantScale))).as("b"))
      assert(both.filter(not(col("a") <=> col("b"))).count() === 0)
      val edge = spark.sql(
        """SELECT * FROM VALUES
          |  (CAST(NULL AS ARRAY<DOUBLE>)),
          |  (ARRAY(CAST(NULL AS DOUBLE), 1.75, -3.5)),
          |  (CAST(ARRAY() AS ARRAY<DOUBLE>)) AS t(v)""".stripMargin)
      val eb = edge.select(
        VecScaleFloor.column(col("v"), lit(Similarity.QuantScale)).as("a"),
        transform(col("v"), x => floor(x * lit(Similarity.QuantScale))).as("b"))
      assert(eb.filter(not(col("a") <=> col("b"))).count() === 0)
    }
  }

  test("sq_dequant == the two-transform HOF chain on the dense fixture, bit-exact") {
    withClearCache {
      val dim = Similarity.Dim
      val lv = Similarity.SqLevels
      val vecs = emb.select(col("vec_id"),
        Similarity.asDouble(col("embedding")).as("v"))
      val mm = vecs.agg(
        array((1 to dim).map(i => min(element_at(col("v"), i))): _*).as("mns"),
        array((1 to dim).map(i => max(element_at(col("v"), i))): _*).as("mxs"))
      def mn(i: org.apache.spark.sql.Column) = element_at(col("mns"), i)
      def mx(i: org.apache.spark.sql.Column) = element_at(col("mxs"), i)
      // the pre-r18 HOF chain, verbatim
      val hof = vecs.crossJoin(broadcast(mm))
        .select(col("vec_id"), col("mns"), col("mxs"),
          transform(sequence(lit(1), lit(dim)), i =>
            when(mx(i) === mn(i), lit(0L)).otherwise(
              least(floor((element_at(col("v"), i) - mn(i)) / (mx(i) - mn(i)) * lit(lv)),
                    lit((lv - 1).toLong)))).as("code"))
        .select(col("vec_id"),
          transform(sequence(lit(1), lit(dim)), i =>
            mn(i) + (element_at(col("code"), i) + lit(0.5)) * (mx(i) - mn(i)) / lit(lv.toDouble))
            .as("dv_hof"))
      val fused = vecs.crossJoin(broadcast(mm))
        .select(col("vec_id"),
          SqDequant.column(col("v"), col("mns"), col("mxs"), lv).as("dv"))
      val joined = fused.join(hof, "vec_id")
      assert(joined.filter(not(col("dv") <=> col("dv_hof"))).count() === 0)
      assert(joined.count() === emb.count())
    }
  }

  test("sq_dequant: constant dimension codes to the min (mx == mn branch)") {
    withClearCache {
      val df = spark.range(1).select(
        array(lit(3.5), lit(1.0)).as("v"),
        array(lit(3.5), lit(0.0)).as("mns"),
        array(lit(3.5), lit(2.0)).as("mxs"))
      val r = df.select(SqDequant.column(col("v"), col("mns"), col("mxs"), 256).as("dv"))
        .head().getSeq[Double](0)
      // dim 0: mx == mn -> code 0 -> mn + 0.5*(0)/256 = mn
      assert(r(0) === 3.5)
      // dim 1: code = floor(1.0/2.0*256) = 128 -> 0 + 128.5*2/256
      assert(r(1) === 128.5 * 2.0 / 256.0)
    }
  }

  test("vec_centered_diff == the element_at HOF lambda on the fixture, bit-exact") {
    withClearCache {
      val dim = Similarity.Dim
      val q = Similarity.QuantScale
      val vecs = emb.select(col("vec_id"), col("label"),
        Similarity.asDouble(col("embedding")).as("v"))
      val cents = vecs.groupBy("label").agg(
        count(lit(1)).as("n"),
        array((1 to dim).map(i =>
          sum(floor(element_at(col("v"), i) * lit(q)))): _*).as("qsl"))
      def centAt(i: org.apache.spark.sql.Column) =
        element_at(col("qsl"), i) / (col("n") * lit(q))
      val joined = vecs.join(cents, "label")
      val both = joined.select(
        graft.plans.VecCenteredDiff.column(col("v"), col("qsl"),
          col("n") * lit(q)).as("a"),
        transform(sequence(lit(1), lit(dim)),
          i => element_at(col("v"), i) - centAt(i)).as("b"))
      assert(both.filter(not(col("a") <=> col("b"))).count() === 0)
      assert(both.count() > 0)
    }
  }

  test("vec_mul_scale_floor == transform(floor((x*u)*scale)) bit-exact, two-multiply order") {
    withClearCache {
      val q = Similarity.QuantScale
      // u exercises values where pre-folding u*q would round differently
      val df = emb.select(Similarity.asDouble(col("embedding")).as("v"),
        (col("vec_id").cast("double") / 9973.0 + lit(1e-7)).as("u"))
      val both = df.select(
        graft.plans.VecMulScaleFloor.column(col("v"), col("u"), lit(q)).as("a"),
        transform(col("v"), x => floor((x * col("u")) * lit(q))).as("b"))
      assert(both.filter(not(col("a") <=> col("b"))).count() === 0)
      assert(both.count() > 0)
    }
  }

  test("sq_dequant: length mismatch nulls the result, null element nulls the element") {
    withClearCache {
      val mismatch = spark.range(1).select(
        array(lit(1.0), lit(2.0)).as("v"), array(lit(0.0)).as("mns"),
        array(lit(4.0)).as("mxs"))
      assert(mismatch.select(
        SqDequant.column(col("v"), col("mns"), col("mxs"), 256).as("dv"))
        .head().isNullAt(0))
      val nullElem = spark.sql(
        """SELECT ARRAY(CAST(NULL AS DOUBLE), 1.0) AS v,
          |       ARRAY(0.0D, 0.0D) AS mns, ARRAY(2.0D, 2.0D) AS mxs""".stripMargin)
      val dv = nullElem.select(
        SqDequant.column(col("v"), col("mns"), col("mxs"), 256).as("dv"))
        .selectExpr("dv[0] AS d0", "dv[1] AS d1").head()
      assert(dv.isNullAt(0))
      assert(!dv.isNullAt(1))
    }
  }
}
