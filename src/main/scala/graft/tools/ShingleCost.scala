package graft.tools

/** Measures the LIVE shingle/pair build costs the staged doc_shingles and
  * dedup_pairs artifacts amortize, next to the staged-consumer timings —
  * the conversion-benefit check for r11 verdict item 5. The consumers now
  * self-stage, so this tool times the live pipelines EXPLICITLY (a plain
  * consumer rep would bill the one-time staging to rep 1 and staged reads
  * to rep 2 — neither is the live cost), and drops the staged tables it
  * creates so a probe run cannot leave pre-staged artifacts behind for a
  * later bench to silently recover.
  * Usage: ShingleCost <sfDir>
  */
object ShingleCost {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = ToolSession.start()
    def t(label: String)(body: => Unit): Unit = ToolSession.timed(spark, label)(body)
    val D = graft.ops.Dedup
    // try/finally (r12 advice): an exception mid-probe must still drop the
    // staged tables, or a later bench silently recovers them — exactly the
    // hazard this tool exists to prevent
    try {
      (1 to 2).foreach { i =>
        println(s"== rep $i ==")
        t("live docShingles materialize")(D.docShingles(spark, dir).count())
        t("live capped pairs build") {
          D.jaccardPairsCapped(D.docShingles(spark, dir), D.MaxShingleDF)
            .select("doc_a", "doc_b").count()
        }
        // staged-consumer timings (first call inside rep 1 pays the staging
        // write — printed separately so the one-time cost is visible)
        t("q_dedup_jaccard_prefix (staged)")(D.ngramJaccardPrefix(spark, dir).count())
        t("q_dedup_resolution (staged)")(D.dedupResolution(spark, dir).count())
        t("q_dedup_canonical (staged)")(D.dedupCanonical(spark, dir).count())
      }
    } finally {
      // leave no pre-staged artifacts behind for a later bench run
      Seq(D.docShinglesTable(dir), D.dedupPairsTable(dir))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      spark.stop()
    }
  }
}
