package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The two-phase global prefix-sum scaffold shared by the scalable pack
  * (`etl/FixedWidth.packScalable`, value = 1 → global per-key row numbers)
  * and the token-budget sequence packer (`ops/SeqPack`, value = token
  * count → global per-key token offsets). One implementation of the
  * contract-heavy parts — quantile bucketing, driver-side offset
  * prefixing, run-contiguous clustering — so the two operators cannot
  * drift.
  *
  *  1. Bucket bounds: `parts` quantiles of the LEADING order column, from
  *     one narrow aggregation (all other columns prune away). Bounds are
  *     collected once and inlined as literals, so every pass buckets
  *     identically — no repartitionByRange re-sampling nondeterminism and
  *     no need to cache the full data for consistency.
  *  2. Per-(bucket, key) value sums — a second narrow job — turned into
  *     per-run global starting offsets on the driver (a tiny table:
  *     buckets × keys).
  *  3. One full-data pass: cluster by bucket, sort within partitions on
  *     (bucket, partCols, orderCols) — every (bucket, key) run is
  *     contiguous in exactly one partition and runs follow the global
  *     order (bucketing is monotone in the leading order column) — then
  *     the stateful codegen'd [[KeyedOffsetRunningSum]] projection
  *     assigns exact global exclusive prefix sums with full parallelism,
  *     entirely on Tungsten rows.
  *
  * The driver-side offsets table is small BY REGIME, not by luck: this
  * scaffold exists for the few-huge-keys layout (a handful of part keys /
  * sources, each a single ordered stream), where the plain window form
  * ceilings at one reducer per key. In the opposite regime — many small
  * keys — the window form already parallelizes across keys and needs no
  * scaffold (which is exactly what `etl/FixedWidth.pack`'s adaptive
  * rows-per-key probe dispatches on), and buckets × keys would not be
  * driver-sized. Use the window form there.
  */
object PrefixSum {

  /** Run-key separator: a char that cannot appear in the key columns'
    * string forms.
    */
  private val Sep = 1.toChar.toString

  /** Ceiling on the driver-side offsets table (buckets × distinct keys
    * rows). The few-huge-keys regime this scaffold serves sits orders of
    * magnitude below it (32 buckets × thousands of keys); crossing it
    * means the caller is in the many-keys regime, where the plain window
    * form already parallelizes across keys — so the guard auto-falls back
    * rather than silently collecting an unbounded table.
    */
  val MaxDriverOffsetRows = 1L << 20

  /** Exclusive per-key prefix sum of `value` in (partCols, orderCols)
    * order, as column `out` — the scalable equivalent of `sum(value)
    * OVER (PARTITION BY partCols ORDER BY orderCols ROWS BETWEEN UNBOUNDED
    * PRECEDING AND 1 PRECEDING)`, with every null — the window's first-row
    * null AND null input values — read as 0. Null inputs are coalesced to
    * 0 HERE, before the stateful expression, which requires a non-null
    * long (its codegen and interpreted paths would otherwise disagree on
    * nulls). The leading order column must be numeric (quantile
    * bucketing); (partCols, orderCols) must be a total order of `df`;
    * part keys must be non-null.
    */
  def exclusiveRunningSum(df: DataFrame, value: Column,
                          partCols: Seq[String], orderCols: Seq[String],
                          out: String = "cum",
                          numParts: Int = 0,
                          maxDriverOffsetRows: Long = MaxDriverOffsetRows): DataFrame = {
    val spark = df.sparkSession
    val parts =
      if (numParts > 0) numParts else spark.sessionState.conf.numShufflePartitions
    // The quantile probe and the bucket comparisons run on a DOUBLE
    // projection of the leading order column, never its native type:
    // bucketing needs only a monotone split (cast-to-double is monotone up
    // to ties, and ties just share a bucket — run contiguity is from the
    // sort, which uses the ORIGINAL columns), and the probe's .head() must
    // decode only primitive doubles on the driver. A DECIMAL order column
    // would otherwise reach the driver as java.math.BigDecimal through
    // getSeq — the JVM-sensitive decode class (EXPRESSION_DECODING_FAILED
    // in the round-8 foreign-JVM sandbox) the date-collect removals
    // eliminated everywhere else.
    val ord = col(orderCols.head).cast("double")
    val keyCol = concat_ws(Sep, partCols.map(c => col(c).cast("string")): _*)
    val valCol = coalesce(value.cast("long"), lit(0L))

    val bounds: Seq[Double] =
      if (parts <= 1) Nil
      else {
        val probs = (1 until parts).map(_.toDouble / parts)
        val r = df.agg(
          percentile_approx(ord, array(probs.map(lit): _*), lit(1000)).as("b")).head()
        if (r.isNullAt(0)) Nil else r.getSeq[Double](0)
      }
    // bucket = #bounds strictly below the value: monotone in the leading
    // order column, so bucket order == global order within every key
    val bucketCol: Column =
      if (bounds.isEmpty) lit(0)
      else bounds.map(b => when(ord > lit(b), 1).otherwise(0)).reduce(_ + _)
    val runCol = concat_ws(Sep, col("_b").cast("string"), keyCol)

    // narrow pre-job: per-(bucket, key) value sums -> per-run global
    // starting offsets (exclusive prefix over buckets, per key). The
    // limit(cap+1) bounds what can ever reach the driver: the aggregation
    // still runs in full, but at most cap+1 rows transfer, and crossing
    // the cap routes to the window form instead of collecting on faith —
    // the regime documented above is enforced here, not by comment.
    val capped = maxDriverOffsetRows min (Int.MaxValue - 1).toLong
    val sums = df.select(keyCol.as("_key"), bucketCol.as("_b"), valCol.as("_v"))
      .groupBy("_b", "_key").agg(sum("_v").as("_s"))
      .limit(capped.toInt + 1).collect()
    if (sums.length > capped) {
      // many-keys regime: one window reducer PER KEY is full parallelism
      // here — exactly the layout the offsets scaffold is not for
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(partCols.map(col): _*).orderBy(orderCols.map(col): _*)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      return df.withColumn(out, coalesce(sum(valCol).over(w), lit(0L)))
    }
    val offsets = new java.util.HashMap[String, java.lang.Long]()
    sums.groupBy(_.getAs[String]("_key")).foreach { case (key, rows) =>
      var acc = 0L
      rows.sortBy(_.getAs[Int]("_b")).foreach { r =>
        if (acc != 0L) offsets.put(s"${r.getAs[Int]("_b")}$Sep$key", acc)
        acc += r.getAs[Long]("_s")
      }
    }

    df.withColumn("_b", bucketCol)
      .repartition(parts, col("_b"))
      .sortWithinPartitions(col("_b") +: (partCols ++ orderCols).map(col): _*)
      .withColumn(out, KeyedOffsetRunningSum.column(runCol, valCol, offsets))
      .drop("_b")
  }
}
