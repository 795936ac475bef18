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
  * path is the shared two-phase scaffold [[graft.plans.PrefixSum]] (which
  * also powers packScalable's global row numbers, value = 1), here
  * accumulating token counts. Equivalence to the window form is
  * property-tested in SeqPackSpec.
  */
object SeqPack {

  /** Tokens per packed training sequence (the "context window"). */
  val SeqBudget = 256

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
    val cum = graft.plans.PrefixSum.exclusiveRunningSum(
      docs, col("n_tok"), Seq("source"), Seq("doc_id"), out = "cum0")
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
