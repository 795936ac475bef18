package graft

/** Standalone runs of the queries that previously collected `java.sql.Date`
  * scalars on the driver (VERDICT r8 item 2: `q_rfm`, `q_retention`,
  * `q_zorder_layout`, `q_stream_zscore` aborted with
  * EXPRESSION_DECODING_FAILED / `DateTimeUtils.toJavaDate` in a foreign
  * JVM). Each is exercised through the DRIVER's entry point
  * (`SparkEntry.queries`) exactly as `Verify` runs it — constructed and
  * fully materialized with no other query having warmed any state — and
  * the source tree is asserted free of driver-side date decodes, so the
  * fragile pattern cannot silently return.
  */
class DriverPathSpec extends SparkSpec {

  private val fixed = Seq("q_rfm", "q_retention", "q_zorder_layout", "q_stream_zscore")

  for (name <- fixed)
    test(s"$name runs standalone through SparkEntry.queries and yields rows") {
      spark.catalog.clearCache()
      val df = SparkEntry.queries(name)(spark, sf0001)
      val rows = df.collect()
      assert(rows.nonEmpty, s"$name produced no rows")
      // no decimal-typed output columns anywhere (the round-8 hasher rule)
      val decs = df.schema.fields.filter(
        _.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType])
      assert(decs.isEmpty, s"$name emits decimal columns: ${decs.map(_.name).mkString(",")}")
    }

  test("the stream_zscore drain carries only the exact long-units encoding (no decimal/date widening)") {
    // historically the memory sink decoded every drained row on the DRIVER,
    // making a decimal or date column the same foreign-JVM decode class as
    // the round-8 aborts; the file-sink drain removed that hazard, but the
    // long-units encoding stays for its documented exactness bound — lock
    // the drained schema so it can't silently widen back. q_stream_zscore
    // just ran above, so its drained relation is on disk.
    import org.apache.spark.sql.types.{DateType, DecimalType, TimestampType}
    val sink = graft.streaming.StreamingQueries
      .drainedRelation(spark, "stream_rolling_zscore").schema
    val hazard = sink.fields.filter(f => f.dataType.isInstanceOf[DecimalType] ||
      f.dataType == DateType || f.dataType == TimestampType)
    assert(hazard.isEmpty,
      s"drained schema widened past the long-units encoding: ${hazard.map(f => s"${f.name}:${f.dataType}").mkString(",")}")
  }

  test("no driver-side date/timestamp/decimal row decodes anywhere in main sources") {
    val srcRoot = java.nio.file.Paths.get("src/main/scala")
    val bad = new scala.collection.mutable.ArrayBuffer[String]
    java.nio.file.Files.walk(srcRoot).forEach { p =>
      if (p.toString.endsWith(".scala")) {
        val lines = java.nio.file.Files.readAllLines(p)
        for (i <- 0 until lines.size()) {
          val l = lines.get(i)
          if (l.contains(".getDate(") || l.contains("getAs[java.sql.Date]") ||
              l.contains(".getTimestamp(") || l.contains("getAs[java.sql.Timestamp]") ||
              l.contains(".getDecimal(") || l.contains("getAs[java.math.BigDecimal]"))
            bad += s"$p:${i + 1}: ${l.trim}"
        }
      }
    }
    assert(bad.isEmpty,
      "driver-side date decodes (JVM-sensitive toJavaDate) found:\n" + bad.mkString("\n"))
  }
}
