package graft.tools

import org.apache.spark.sql.functions._

/** A/B the co-purchase PAIR BUILD (the front half of the live q_pagerank,
  * and the staged-edge builder) — the one unexamined lever on the suite's
  * slowest query (r17): form A is the shipped per-order SELF-JOIN
  * (exchange reused across both sides, SMJ/SHJ probe, then the (u,v)
  * count); form B builds each order's sorted distinct part list once
  * (collect_list + sort_array) and ENUMERATES the i<j pairs in the array
  * domain (no join operator at all), then the same (u,v) count. Both
  * produce the identical pair multiset → identical weighted edges, so the
  * winner can be adopted without touching the oracle.
  * Usage: PairBuildAB <sfDir> [reps]
  */
object PairBuildAB {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = ToolSession.start()

    def li = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()

    def formA() = {
      val l = li
      l.as("a").join(l.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("u"), col("b.p").as("v"))
        .agg(count(lit(1)).as("w"))
    }

    def formB() = li
      .groupBy("o").agg(sort_array(collect_list(col("p"))).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps,
          |  (x, i) -> transform(slice(ps, i + 2, size(ps)),
          |            y -> struct(x AS u, y AS v))))""".stripMargin)).as("pr"))
      .groupBy(col("pr.u").as("u"), col("pr.v").as("v"))
      .agg(count(lit(1)).as("w"))

    (1 to reps).foreach { i =>
      println(s"== rep $i ==")
      ToolSession.timed(spark, "A self-join")(formA().count())
      ToolSession.timed(spark, "B array-enum")(formB().count())
    }
    // value identity: symmetric difference must be empty
    val a = formA(); val b = formB()
    val d1 = a.exceptAll(b).count(); val d2 = b.exceptAll(a).count()
    println(s"identity check: exceptAll A-B=$d1 B-A=$d2 (both must be 0)")
    spark.stop()
  }
}
