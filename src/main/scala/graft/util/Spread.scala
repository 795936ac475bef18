package graft.util

import org.apache.spark.sql.DataFrame

/** Conditional re-spread before CPU-heavy per-row work.
  *
  * A parquet scan's parallelism is its split count, and splits cannot cut
  * inside a row group — so a small-but-expensive table (the sf0.1
  * `documents`/`embeddings` fixtures are a single row group) feeds every
  * downstream projection from ONE task, serializing shingling, embedding
  * math, fingerprinting, and codec work that the session has 32 slots for.
  * Measured: q_knn_recall's 5000-row scan stages ran 3.7 s single-task.
  *
  * `forCpu` inserts one narrow round-robin shuffle ONLY when the source
  * yields fewer partitions than the session's shuffle width. At scale the
  * guard keeps it a no-op: a 100-TB table has thousands of row groups, and
  * re-spreading it would be a full extra pass over the data.
  */
object Spread {
  def forCpu(df: DataFrame): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions < parts) df.repartition(parts) else df
  }

  /** [[forCpu]] with a width CAP — for a CPU-heavy producer whose output
    * is persisted and then consumed by several SMALL downstream stages.
    * Full session width on the producer makes every consumer stage a
    * session-width task floor (the r17 bm25 rejection: a 32-partition
    * postings cache turned five small consumer stages into 32-task
    * scheduling floors that cost more than the single-task tokenize they
    * parallelized). A small fixed cap parallelizes the producer most of
    * the way while keeping consumer stages a few tasks wide. Same at-scale
    * guard as [[forCpu]]: a no-op once the source has `min(cap, width)`
    * splits, so a real table is never re-shuffled.
    */
  def forCpu(df: DataFrame, cap: Int): DataFrame = {
    val parts = math.min(cap,
      df.sparkSession.sessionState.conf.numShufflePartitions)
    if (df.rdd.getNumPartitions < parts) df.repartition(parts) else df
  }
}
