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
}
