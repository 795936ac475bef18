package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Token-budget sequence packing — the concat-then-chunk batch prep every
  * pretraining pipeline runs: per source, documents are concatenated in
  * doc_id order into one token stream and cut every `SeqBudget` tokens
  * into fixed-size training sequences. A document's placement is fully
  * determined by the EXCLUSIVE prefix sum of token counts before it — its
  * first chunk is `cum div budget`, its last `(cum + n_tok - 1) div
  * budget` — so the whole operator reduces to a global per-key running
  * sum.
  *
  * The naive Spark form is `sum(n_tok) OVER (PARTITION BY source ORDER BY
  * doc_id)` — one reducer per source, the exact single-stream ceiling the
  * pack operator already escaped (etl/FixedWidth.packScalable). The scale
  * path here is the same two-phase shape, generalized from row counting to
  * value accumulation:
  *
  *  1. Quantile bounds of the leading order column from one narrow
  *     aggregation, inlined as literals (no repartitionByRange
  *     re-sampling).
  *  2. Per-(bucket, key) token sums — a second narrow job — prefix-summed
  *     on the driver into per-run global starting offsets (tiny: buckets ×
  *     keys).
  *  3. One full-data pass: cluster by bucket, sort within partitions on
  *     (bucket, key, order), then the stateful codegen'd
  *     [[graft.plans.KeyedOffsetRunningSum]] projection assigns exact
  *     global exclusive prefix sums with full parallelism, entirely on
  *     Tungsten rows.
  *
  * Equivalence to the window form is property-tested in SeqPackSpec.
  */
object SeqPack {

  /** Tokens per packed training sequence (the "context window"). */
  val SeqBudget = 256

  /** Run-key separator (matches the packScalable convention: a char that
    * cannot appear in the key columns' string forms).
    */
  private val Sep = 1.toChar.toString

  /** Exclusive per-key prefix sum of `valueCol` (long, non-null) in
    * (partCols, orderCols) order, as column `out` — the scalable
    * equivalent of `sum(valueCol) OVER (PARTITION BY partCols ORDER BY
    * orderCols ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)` with
    * null→0. The leading order column must be numeric (quantile
    * bucketing); (partCols, orderCols) must be a total order of `df`.
    */
  def exclusiveRunningSum(df: DataFrame, valueCol: String,
                          partCols: Seq[String], orderCols: Seq[String],
                          out: String = "cum",
                          numParts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts =
      if (numParts > 0) numParts else spark.sessionState.conf.numShufflePartitions
    val ord = col(orderCols.head)
    val keyCol = concat_ws(Sep, partCols.map(c => col(c).cast("string")): _*)

    val bounds: Seq[Any] =
      if (parts <= 1) Nil
      else {
        val probs = (1 until parts).map(_.toDouble / parts)
        val r = df.agg(
          percentile_approx(ord, array(probs.map(lit): _*), lit(1000)).as("b")).head()
        if (r.isNullAt(0)) Nil else r.getSeq[Any](0)
      }
    val bucketCol: Column =
      if (bounds.isEmpty) lit(0)
      else bounds.map(b => when(ord > lit(b), 1).otherwise(0)).reduce(_ + _)
    val runCol = concat_ws(Sep, col("_b").cast("string"), keyCol)

    // narrow pre-job: per-(bucket, key) value sums -> per-run global
    // starting offsets (exclusive prefix over buckets, per key)
    val sums = df.select(keyCol.as("_key"), bucketCol.as("_b"),
                         col(valueCol).cast("long").as("_v"))
      .groupBy("_b", "_key").agg(sum("_v").as("_s")).collect()
    val offsets = new java.util.HashMap[String, java.lang.Long]()
    sums.groupBy(_.getAs[String]("_key")).foreach { case (key, rows) =>
      var acc = 0L
      rows.sortBy(_.getAs[Int]("_b")).foreach { r =>
        if (acc != 0L) offsets.put(r.getAs[Int]("_b") + Sep + key, acc)
        acc += r.getAs[Long]("_s")
      }
    }

    df.withColumn("_b", bucketCol)
      .repartition(parts, col("_b"))
      .sortWithinPartitions(col("_b") +: (partCols ++ orderCols).map(col): _*)
      .withColumn(out, graft.plans.KeyedOffsetRunningSum.column(
        runCol, col(valueCol).cast("long"), offsets))
      .drop("_b")
  }

  /** q_seq_pack: per-source packing audit — stream totals, sequence count,
    * and how many documents straddle a chunk boundary (those need either
    * splitting or example-boundary attention masking downstream). All
    * exact integers; `div` is integer division on both engines (all values
    * non-negative, so truncation == floor).
    */
  def seqPack(spark: SparkSession, dir: String,
              budget: Int = SeqBudget): DataFrame = {
    // persisted: the narrow (doc_id, source, n_tok) projection feeds both
    // the two-phase pre-jobs and the final pass — without it the corpus
    // would be re-tokenized per consumer (~24 B/row cached vs a full text
    // scan; cache lifecycle contract in the Dedup header applies)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
              size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
      .persist()
    val cum = exclusiveRunningSum(docs, "n_tok", Seq("source"), Seq("doc_id"),
                                  out = "cum0")
    val per = cum.select(
      col("source"), col("n_tok"),
      expr(s"cum0 div $budget").as("fc"),
      expr(s"CASE WHEN n_tok > 0 THEN (cum0 + n_tok - 1) div $budget " +
           s"ELSE cum0 div $budget END").as("lc"))
    per.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("total_tokens"),
        expr(s"(sum(n_tok) + ${budget - 1}) div $budget").as("n_seqs"),
        sum(when(col("lc") > col("fc"), 1L).otherwise(0L)).as("n_boundary_docs"),
        max(col("lc") - col("fc") + 1).as("max_doc_span"))
      .orderBy("source")
  }

  def seqPackOracle(budget: Int = SeqBudget): String =
    s"""WITH toks AS (
       |  SELECT doc_id, source,
       |         CAST(len(${TextAnalysis.tokensSql}) AS BIGINT) AS n_tok
       |  FROM documents),
       |cum AS (
       |  SELECT source, n_tok,
       |         COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum0
       |  FROM toks),
       |per AS (
       |  SELECT source, n_tok,
       |         cum0 // $budget AS fc,
       |         CASE WHEN n_tok > 0 THEN (cum0 + n_tok - 1) // $budget
       |              ELSE cum0 // $budget END AS lc
       |  FROM cum)
       |SELECT source, COUNT(*) AS n_docs,
       |       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       |       CAST((SUM(n_tok) + $budget - 1) // $budget AS BIGINT) AS n_seqs,
       |       CAST(SUM(CASE WHEN lc > fc THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_docs,
       |       CAST(MAX(lc - fc + 1) AS BIGINT) AS max_doc_span
       |FROM per GROUP BY 1 ORDER BY 1""".stripMargin
}
