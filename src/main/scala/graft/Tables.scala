package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet fixtures (TESTDATA.md).
  *
  * All queries take `(spark, sfDir)` and resolve tables through here so the
  * source layout is swappable (parquet today; the same names could be managed
  * tables or a catalog on a real cluster). Reads are plain
  * `spark.read.parquet` so Catalyst performs column pruning and predicate
  * pushdown into the scan — verified via `.explain("formatted")` in
  * PlanAuditSpec.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts has shipped as either parquet TIMESTAMP(NANOS) (early
    * fixture generations — vanilla Spark rejects it, PARQUET_TYPE_ILLEGAL,
    * so read nanos as long and truncate to microseconds) or plain
    * TIMESTAMP(MICROS)/NTZ (round-6 regeneration). Dispatch on the read
    * schema so both layouts land on the same session-TZ TimestampType
    * column; sub-µs truncation on the nanos path is invisible to every
    * date/window/gap operator downstream.
    */
  /** Conf key for the legacy nanos-parquet escape hatch. Always SCOPED —
    * set, resolve the relation, restore — never left mutated on the shared
    * session (an unrestored global would make query results order-
    * dependent). The relation's hadoop conf snapshot is taken eagerly at
    * `spark.read.parquet` resolution, so the restore is safe.
    */
  private val NanosKey = "spark.sql.legacy.parquet.nanosAsLong"

  /** The one sanctioned UNSCOPED set of [[NanosKey]]: on a detected
    * legacy nanos layout the flag must stay set through execution
    * planning (ParquetFileFormat re-reads it from the session conf), so
    * [[events]] and the streaming source share this single exception
    * point instead of re-hardcoding the key string.
    */
  def setNanosForLegacyLayout(s: SparkSession): Unit =
    s.conf.set(NanosKey, "true")

  /** Runs `body` with [[NanosKey]] set, restoring the prior value after. */
  def withNanosAsLong[A](s: SparkSession)(body: => A): A = {
    val prior = s.conf.getOption(NanosKey)
    s.conf.set(NanosKey, "true")
    try body
    finally prior match {
      case Some(v) => s.conf.set(NanosKey, v)
      case None    => s.conf.unset(NanosKey)
    }
  }

  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    val df = withNanosAsLong(s) {
      val r = table(s, d, "events")
      r.schema // force relation + schema resolution inside the scope
      r
    }
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // nanos fixture detected: ParquetFileFormat re-reads the flag from
        // the session conf at EXECUTION-planning time, so on this (legacy)
        // layout it must stay set for the scan to succeed — a deliberate,
        // documented exception to the scoped-restore rule above
        setNanosForLegacyLayout(s)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
