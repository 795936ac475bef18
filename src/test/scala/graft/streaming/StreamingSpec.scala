package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec
import graft.streaming.StreamingIngest._

/** Streaming parity (SURVEY.md §7.6): file-source ingest with AvailableNow
  * + checkpoint, the flatMapGroupsWithState leftover carry (T2,
  * main.py:472-485, 560-565), and the watermarked hourly window vs its
  * batch twin.
  */
class StreamingSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("file stream ingest: AvailableNow drains staged files, records match batch explode") {
    val in = tmpDir("stream_in")
    val out = tmpDir("stream_out")
    val ckp = tmpDir("stream_ckp")
    val text = ("A" * 520) * 3 + "B" * 17 // 3 full records + short tail
    Files.writeString(java.nio.file.Paths.get(s"$in/R520.20240115_000000.x.txt"), text)

    val records = fileStreamRecords(spark, in)
    runAvailableNow(records, out, ckp)
    val got = spark.read.parquet(out)
    assert(got.count() == 4)
    assert(got.filter(col("record") === "B" * 17).count() == 1)
    assert(got.select("business_date").distinct().collect()
      .map(_.getDate(0).toString).toSeq == Seq("2024-01-15"))

    // restart with the same checkpoint: nothing new to process (exactly-once per file)
    runAvailableNow(fileStreamRecords(spark, in), out, ckp)
    assert(spark.read.parquet(out).count() == 4)
  }

  test("flatMapGroupsWithState leftover carry equals batch segmentation across chunk seams") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val payload = (0 until 23).map(i => f"<$i%06d>" * 65).mkString // 23 records of 520 chars
      .concat("tail-odd-bytes") // short tail
    // adversarial seams: cut at non-record boundaries
    val cuts = Seq(0, 13, 519, 520, 1041, 5000, payload.length)
    val chunks = cuts.sliding(2).zipWithIndex.map { case (Seq(a, b), i) =>
      Chunk("f1", i.toLong, payload.substring(a, b), b == payload.length)
    }.toSeq

    val stream = MemoryStream[Chunk]
    stream.addData(chunks)
    val q = reassembleChunks(stream.toDS())
      .writeStream.format("memory").queryName("reassembled")
      .outputMode(OutputMode.Append).trigger(Trigger.Once()).start()
    q.awaitTermination()

    val got = spark.table("reassembled").orderBy("idx")
      .select("record").collect().map(_.getString(0))
    val expect = payload.grouped(520).toSeq
    assert(got.toSeq == expect)
  }

  test("carry state persists across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val payload = "R" * 520 + "S" * 520 + "tt"
    val stream = MemoryStream[Chunk]
    val q = reassembleChunks(stream.toDS())
      .writeStream.format("memory").queryName("carry2")
      .outputMode(OutputMode.Append).start()
    stream.addData(Chunk("f", 0, payload.substring(0, 700), isLast = false))
    q.processAllAvailable()
    assert(spark.table("carry2").count() == 1) // one full record so far
    stream.addData(Chunk("f", 1, payload.substring(700), isLast = true))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("carry2").orderBy("idx").select("record")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("R" * 520, "S" * 520, "tt"))
  }

  test("out-of-order chunk delivery reassembles byte-identically (pending seq-buffer state)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val payload = (0 until 9).map(i => f"[$i%06d]" * 65).mkString + "short-tail"
    val cuts = Seq(0, 77, 600, 1200, 2333, payload.length)
    val inOrder = cuts.sliding(2).zipWithIndex.map { case (Seq(a, b), i) =>
      Chunk("f", i.toLong, payload.substring(a, b), b == payload.length)
    }.toSeq
    // adversarial delivery: the LAST chunk arrives first, then the rest
    // scrambled across separate micro-batches (gaps must hold in state)
    val stream = MemoryStream[Chunk]
    val q = reassembleChunks(stream.toDS())
      .writeStream.format("memory").queryName("ooo")
      .outputMode(OutputMode.Append).start()
    stream.addData(inOrder(4), inOrder(2))
    q.processAllAvailable()
    assert(spark.table("ooo").count() == 0) // nothing drains past the seq-0 gap
    stream.addData(inOrder(0), inOrder(3))
    q.processAllAvailable()
    stream.addData(inOrder(1))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ooo").orderBy("idx").select("record")
      .collect().map(_.getString(0))
    assert(got.toSeq == payload.grouped(520).toSeq)
  }

  test("redelivered already-drained chunks are ignored (at-least-once delivery)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val payload = "A" * 520 + "B" * 520 + "tail"
    val stream = MemoryStream[Chunk]
    val q = reassembleChunks(stream.toDS())
      .writeStream.format("memory").queryName("redeliver")
      .outputMode(OutputMode.Append).start()
    stream.addData(Chunk("f", 0, payload.substring(0, 600), isLast = false))
    q.processAllAvailable()
    // at-least-once source redelivers the drained seq-0 chunk — without
    // the seq >= nextSeq guard it parks in `pending` forever (state
    // growth) and a stale isLast=true on it regresses lastSeq below
    // nextSeq, truncating the file at the redelivered chunk
    stream.addData(Chunk("f", 0, payload.substring(0, 600), isLast = true))
    q.processAllAvailable()
    stream.addData(Chunk("f", 1, payload.substring(600), isLast = true))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("redeliver").orderBy("idx").select("record")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("A" * 520, "B" * 520, "tail"))
  }

  test("streaming exact dedup: watermarked dropDuplicates emits each key once across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ts = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val stream = MemoryStream[(String, java.sql.Timestamp)]
    val q = stream.toDF().toDF("doc_hash", "ts")
      .withWatermark("ts", "1 hour")
      .dropDuplicates("doc_hash") // state pruned by the watermark at scale
      .writeStream.format("memory").queryName("streamdedup")
      .outputMode(OutputMode.Append).start()
    stream.addData(Seq(("h1", ts), ("h2", ts), ("h1", ts)))
    q.processAllAvailable()
    stream.addData(Seq(("h2", ts), ("h3", ts))) // h2 is a cross-batch dup
    q.processAllAvailable()
    q.stop()
    val got = spark.table("streamdedup").select("doc_hash")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(got == Seq("h1", "h2", "h3"))
  }

  test("stream-static broadcast join enriches a stream with a dimension table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "segment")
    val stream = MemoryStream[(Long, Double)]
    stream.addData(Seq((1L, 10.0), (2L, 5.0), (1L, 2.5), (3L, 99.0))) // 3 has no segment
    val q = stream.toDF().toDF("user_id", "value")
      .join(broadcast(dim), Seq("user_id")) // inner: unknown users dropped
      .groupBy("segment").agg(sum("value").as("total"))
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Complete).trigger(Trigger.Once()).start()
    q.awaitTermination()
    val got = spark.table("enriched").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got == Map("gold" -> 12.5, "silver" -> 5.0))
  }

  test("stream-stream interval self-join equals the batch range join on the events fixture") {
    val streamed = graft.streaming.StreamingQueries
      .streamClickAttribution(spark, sf0001).collect()
    val e = graft.Tables.events(spark, sf0001)
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("purchase_id"),
              col("ts").as("purchase_ts"), col("value"))
    val batch = c.join(p,
        col("user_id") === col("pu") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select("user_id", "click_id", "purchase_id", "value")
      .orderBy("user_id", "click_id", "purchase_id").collect()
    assert(streamed.nonEmpty, "fixture yields no click->purchase pairs")
    assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
  }

  test("native session_window equals the lag-based sessionization on the events fixture") {
    // Temporal.userSessions splits at gaps > 30 min via lag(); Spark's
    // session_window(ts, '30 minutes') closes a session when the next event
    // is >= gap later — same partitioning for the fixture's continuous
    // timestamps. Cross-check total session counts and event conservation.
    val e = graft.Tables.events(spark, sf0001)
    val native = e.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
    val nativeTotals = native.agg(
      count(lit(1)), sum("n_events"), max("n_events")).head()
    val manual = graft.ops.Temporal.userSessions(spark, sf0001).head()
    assert(nativeTotals.getLong(0) == manual.getAs[Long]("n_sessions"))
    assert(nativeTotals.getLong(1) == manual.getAs[Long]("n_events"))
    assert(nativeTotals.getLong(2) == manual.getAs[Long]("max_session_events"))
  }

  test("watermarked hourly window matches the batch rollup on closed windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ts = (h: Int, m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val rows = Seq(
      (ts(0, 10), "click"), (ts(0, 40), "click"), (ts(0, 55), "view"),
      (ts(1, 5), "click"), (ts(1, 59), "view"),
      (ts(9, 0), "view")) // late-hour event closes earlier windows past the watermark
    val stream = MemoryStream[(java.sql.Timestamp, String)]
    stream.addData(rows)
    val q = hourlyCounts(stream.toDF().toDF("ts", "event_type"))
      .writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Append).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("hourly")
      .select(col("hour_start").cast("string"), col("event_type"), col("n_events"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val expect = Set(
      ("2024-01-01 00:00:00", "click", 2L), ("2024-01-01 00:00:00", "view", 1L),
      ("2024-01-01 01:00:00", "click", 1L), ("2024-01-01 01:00:00", "view", 1L))
    assert(got == expect) // the 09:00 window is still open -> not emitted
  }

  test("streaming stateful dedup is micro-batch-split invariant (3 files, 1 per trigger)") {
    // duplicate a slice of the fixture and scatter everything across 3 part
    // files; 1 file per trigger forces hash groups to SPAN micro-batches, so
    // the cumulative update-mode reduction (min rep / max count over the
    // sink's accumulated rows) is what's actually under test
    val dir = tmpDir("stream_dedup")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    docs.union(docs.limit(7)).repartition(3)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val streamed = StreamingQueries.streamDedupExact(spark, dir, maxFilesPerTrigger = Some(1))
    val batch = graft.ops.Dedup.dedupExact(spark, dir)
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("streaming rolling z-score equals the batch monitor and is micro-batch-split invariant") {
    // daily DECIMAL sums are associative and complete mode re-emits full
    // state; the z-test readout is shared with the batch query — results
    // must be identical under a forced 3-file split
    val dir = tmpDir("stream_zscore")
    spark.read.parquet(s"$sf0001/events.parquet").repartition(3)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val streamed = StreamingQueries.streamRollingZscore(spark, dir, maxFilesPerTrigger = Some(1))
    val batch = graft.ops.Temporal.rollingZscore(spark, dir)
    assert(streamed.collect().toSeq == batch.collect().toSeq)
    assert(streamed.schema.fieldNames.contains("is_anomaly"))
  }

  test("streaming markov equals the batch matrix under an order-scrambling 3-file split") {
    // repartition(3) scatters rows across files with no per-user time
    // order, and 1 file per trigger forces user histories to SPAN
    // micro-batches with later batches carrying earlier events — the
    // cumulative re-sort + take-latest-per-user reduction is what is
    // actually under test
    val dir = tmpDir("stream_markov")
    spark.read.parquet(s"$sf0001/events.parquet").repartition(3)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val streamed = StreamingQueries.streamMarkovNext(spark, dir, maxFilesPerTrigger = Some(1))
    val batch = graft.ops.Temporal.markovNext(spark, dir)
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("streaming vocab top-k equals the batch leaderboard and is micro-batch-split invariant") {
    // counting is associative and complete mode re-emits full state, so
    // the drained counts — and the shared rank readout — must equal the
    // batch query under any file split
    val dir = tmpDir("stream_topk")
    spark.read.parquet(s"$sf0001/documents.parquet").repartition(3)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val streamed = StreamingQueries.streamVocabTopK(spark, dir, maxFilesPerTrigger = Some(1))
    val batch = graft.ops.TextAnalysis.vocabTopK(spark, dir)
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("streaming quality gate equals the batch audit and is micro-batch-split invariant") {
    // scatter the fixture across 3 part files, 1 per trigger: the gate is
    // stateless and the audit aggregation associative, so the complete-mode
    // result must equal the batch query under any split
    val dir = tmpDir("stream_quality")
    spark.read.parquet(s"$sf0001/documents.parquet").repartition(3)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val streamed = StreamingQueries.streamQualityFilter(spark, dir, maxFilesPerTrigger = Some(1))
    val batch = graft.ops.TextAnalysis.qualityFilter(spark, dir)
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("streaming quality drift equals the batch monitor and is micro-batch-split invariant") {
    // the per-(source, side) count/Σbp pairs are associative and complete
    // mode re-emits full state; the mean-shift/rank readout is shared with
    // the batch monitor — results must be identical under a forced 3-file
    // split
    val dir = tmpDir("stream_drift")
    spark.read.parquet(s"$sf0001/documents.parquet").repartition(3)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val streamed = StreamingQueries.streamQualityDrift(spark, dir, maxFilesPerTrigger = Some(1))
    val batch = graft.ops.Curation.qualityDrift(spark, dir)
    assert(streamed.collect().toSeq == batch.collect().toSeq)
    assert(streamed.schema.fieldNames.contains("drifted"))
  }

  test("streaming DQ arrival gate equals the batch lineitem checks and is micro-batch-split invariant") {
    // all three drained aggregations are associative counts (row-local
    // flags, the stream-static anti-join orphan count, the stream-static
    // key-join temporal count), so the assembled audit must equal the
    // batch gate's lineitem rows under a forced 3-file split
    val dir = tmpDir("stream_dq")
    spark.read.parquet(s"$sf0001/lineitem.parquet").repartition(3)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    spark.read.parquet(s"$sf0001/orders.parquet")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    spark.read.parquet(s"$sf0001/customer.parquet")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val streamed = StreamingQueries.streamDqChecks(spark, dir, maxFilesPerTrigger = Some(1))
    val batch = graft.ops.Relational.dqChecks(spark, dir)
      .filter(col("table_name") === "lineitem")
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("streaming Benford audit equals the batch audit and is micro-batch-split invariant") {
    // the drained aggregation is a pure associative count per digit, so
    // the assembled ppm audit must equal the batch monitor under a forced
    // 3-file split
    val dir = tmpDir("stream_benford")
    spark.read.parquet(s"$sf0001/lineitem.parquet").repartition(3)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val streamed = StreamingQueries.streamBenford(spark, dir, maxFilesPerTrigger = Some(1))
    val batch = graft.ops.Relational.benfordAudit(spark, dir)
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("streaming KS drift equals the batch statistic and is micro-batch-split invariant") {
    // the drained (v, c1, c2) counts are pure associative sums, and the
    // rank readout is SHARED with the batch query (Stats.ksOfCounts), so
    // the exact D must be identical under a forced 3-file split
    val dir = tmpDir("stream_ks")
    spark.read.parquet(s"$sf0001/lineitem.parquet").repartition(3)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val streamed = StreamingQueries.streamKs(spark, dir, maxFilesPerTrigger = Some(1))
    val batch = graft.ops.Stats.ksTest(spark, dir)
    withClearCache {
      assert(streamed.collect().toSeq == batch.collect().toSeq)
    }
  }

  test("streaming session_window summary equals the batch lag-form summary") {
    val streamed = StreamingQueries.streamUserSessions(spark, sf0001).head()
    val batch = graft.ops.Temporal.userSessions(spark, sf0001).head()
    assert(streamed == batch)
  }

  test("watermark late-data exemplar: planted late subset provably dropped, on-time windows exact") {
    val streamed = StreamingQueries.streamLate(spark, sf0001).collect().toSeq
    def batchAgg(onTimeOnly: Boolean) = {
      val ev = graft.Tables.events(spark, sf0001)
      (if (onTimeOnly) ev.filter(col("event_id") % StreamingQueries.LateMod =!= 0)
       else ev)
        .groupBy(date_trunc("day", col("ts")).cast("date").as("day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy("day", "event_type")
        .collect().toSeq
    }
    // non-vacuous: the planted late subset must exist and change the counts
    val late = graft.Tables.events(spark, sf0001)
      .filter(col("event_id") % StreamingQueries.LateMod === 0).count()
    assert(late > 0, "fixture has no planted late rows — the exemplar is vacuous")
    assert(batchAgg(onTimeOnly = false) != batchAgg(onTimeOnly = true),
      "late rows do not change the aggregation — the drop would be unobservable")
    // deterministic: drained result == batch over the on-time subset, twice
    assert(streamed == batchAgg(onTimeOnly = true),
      "watermark did not drop exactly the planted late subset")
    val again = StreamingQueries.streamLate(spark, sf0001).collect().toSeq
    assert(again == streamed, "late-drop result not deterministic across runs")
    // the horizon watermark-driver row must never surface
    assert(!streamed.exists(_.getAs[String]("event_type") == "__horizon"))
  }

  test("complete-mode drains are value-domain bounded (never corpus-bounded)") {
    // the KS and Benford faces retain their FULL aggregation support in the
    // state store and rewrite it per micro-batch through the file-sink
    // drain; that shape is only scale-legitimate while the support
    // cardinality is bounded by the VALUE DOMAIN, not the corpus. Lock both
    // bounds (r10 verdict watch item): Benford at exactly ≤9 digit rows,
    // KS at ≤ the observed price spread in cents + 1 — a bound that is
    // corpus-size invariant because new rows revisit cents.
    withClearCache {
      StreamingQueries.streamBenford(spark, sf0001).collect()
      val benfordSupport =
        StreamingQueries.drainedRelation(spark, "stream_benford").count()
      assert(benfordSupport <= 9L,
        s"Benford drain support $benfordSupport > 9 digit rows")

      StreamingQueries.streamKs(spark, sf0001).collect()
      val ksSupport =
        StreamingQueries.drainedRelation(spark, "stream_ks").count()
      val Array(spread, distinctCents) = spark.read
        .parquet(s"$sf0001/lineitem.parquet")
        .filter(col("l_returnflag").isin(
          graft.ops.Stats.TwoSampleA, graft.ops.Stats.TwoSampleB))
        .select(expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").as("v"))
        .agg((max("v") - min("v") + 1).as("spread"),
             count_distinct(col("v")).as("d"))
        .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
      assert(ksSupport == distinctCents,
        s"KS drain support $ksSupport != batch distinct cents $distinctCents")
      assert(ksSupport <= spread,
        s"KS drain support $ksSupport exceeds the cents spread bound $spread")
    }
  }
}
