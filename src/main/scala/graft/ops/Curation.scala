package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Training-set curation operators, round 6 of the north-star extension
  * suite (SURVEY.md §2.8): the steps between "filtered corpus" and "tensors
  * on the trainer" that large-scale LLM data pipelines run after the
  * dedup/quality passes in [[Dedup]] / [[TextAnalysis]] / [[Corpus]]:
  *
  *  - [[tokenizeIds]]: vocabulary-indexed tokenization — map every token to
  *    a dense integer id under a corpus-derived top-K vocabulary (OOV → 0),
  *    the id-ification step every tokenizer pipeline ends with.
  *  - [[batchPadding]]: length-grouped batching audit — assign docs to
  *    fixed-size batches by descending token count (the standard
  *    padding-minimization trick) and account the padding waste per batch.
  *  - [[mixTemperature]]: temperature-scaled source mixing (the multilingual
  *    α-sampling of Conneau & Lample 2019, α = 0.5): per-source sampling
  *    weights ∝ count^α, flattening the source distribution so head sources
  *    don't drown the tail.
  *  - [[cdcChunks]]: content-defined chunking — Rabin/FastCDC-style rolling
  *    hash boundaries, so chunk edges survive insertions/deletions and
  *    chunk-level dedup can dedupe storage across near-identical documents.
  *  - [[dedupClusterStats]]: duplicate-cluster size histogram — the summary
  *    metric curation reports actually publish (how many singletons, how
  *    many N-way duplicate groups).
  *  - [[qualityQuartiles]]: per-source quality stratification — NTILE
  *    quartiles over the stopword-ratio quality signal, the bucketing step
  *    of curriculum/mixture schedule construction.
  *
  * Scale shape: everything is scan → (posexplode | window keyed on source |
  * hash groupBy) → aggregation. The only windows are partitioned by
  * `source` (parallel across sources; for one giant source the two-phase
  * range-bucketed pattern of [[SeqPack]] applies) or run over a vocabulary
  * already LIMITed to a bounded size. No all-pairs joins, no UDFs, no
  * driver-side loops; vocab and mixing tables are broadcast.
  */
object Curation {

  /** Vocabulary size for id-tokenization (top-K by corpus frequency). */
  val VocabSize = 256

  /** Docs per batch for length-grouped batching. */
  val BatchSize = 16

  /** Doc-id slice bound for the per-token outputs (keeps the oracle result
    * row count bounded while the vocab stays corpus-wide).
    */
  val TokenizeDocSlice = 20

  // --- vocabulary-indexed tokenization ---------------------------------------

  /** q_tokenize_ids: corpus-vocabulary tokenization to integer ids.
    *
    * The vocabulary is the corpus-wide top-[[VocabSize]] tokens by
    * (frequency desc, token) — a total order, so the cut at K is
    * deterministic — with ids 1..K in that order; out-of-vocabulary tokens
    * map to 0 (the UNK convention). Output is the exploded (doc_id, pos,
    * tok, tok_id) stream for the audit slice doc_id < [[TokenizeDocSlice]].
    *
    * Plan shape: one posexplode for the token stream; the vocab is a
    * map-side-combined groupBy over the same stream, LIMITed to K rows
    * BEFORE its row_number window (the window input is K rows, not the
    * vocabulary — bounded regardless of corpus size) and broadcast into the
    * id-lookup join, so the per-token side never shuffles. The doc-slice
    * filter sits below the explode on the lookup side; the vocab side stays
    * corpus-wide (ids are a corpus artifact, like idf in [[TextAnalysis.tfidf]]).
    */
  def tokenizeIds(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
    val tokRows = docs.select(col("doc_id"), posexplode(col("toks")).as(Seq("pos0", "tok")))
    val topVocab = tokRows.groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(VocabSize)
    // window over the already-LIMITed K rows only — not a corpus-wide window
    val vocab = topVocab
      .withColumn("tok_id", row_number().over(Window.orderBy(col("c").desc, col("tok"))))
      .select("tok", "tok_id")
    tokRows.filter(col("doc_id") < TokenizeDocSlice)
      .join(broadcast(vocab), Seq("tok"), "left")
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("tok"),
              coalesce(col("tok_id"), lit(0)).as("tok_id"))
      .orderBy("doc_id", "pos")
  }

  val tokenizeIdsOracle: String = {
    import TextAnalysis.tokensSql
    s"""WITH t AS (SELECT doc_id, $tokensSql AS toks FROM documents),
       |tok AS (SELECT doc_id, CAST(unnest(range(1, len(toks) + 1)) AS INT) AS pos,
       |               unnest(toks) AS tok
       |        FROM t),
       |vocab AS (SELECT tok, CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) AS INT) AS tok_id
       |          FROM tok GROUP BY tok ORDER BY COUNT(*) DESC, tok LIMIT $VocabSize)
       |SELECT t.doc_id, t.pos, t.tok, COALESCE(v.tok_id, 0) AS tok_id
       |FROM tok t LEFT JOIN vocab v USING (tok)
       |WHERE t.doc_id < $TokenizeDocSlice
       |ORDER BY doc_id, pos""".stripMargin
  }

  // --- length-grouped batching audit -----------------------------------------

  /** q_batch_padding: length-grouped batching with padding-waste accounting.
    *
    * Within each source, documents are ordered by (token count desc,
    * doc_id) and grouped into batches of [[BatchSize]]; each batch pads to
    * its longest member, so `pad_waste = max_len·n_docs − sum_len` is the
    * token budget burned on padding. Length-sorting is exactly the trick
    * trainers use to make that waste small; the audit makes it measurable.
    *
    * The row_number window is partitioned by source — sources are the
    * parallelism, no global single-partition sort. All outputs are exact
    * integers.
    */
  def batchPadding(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
              size(TextAnalysis.tokens(col("text"))).as("n_toks"))
    val w = Window.partitionBy("source").orderBy(col("n_toks").desc, col("doc_id"))
    docs.withColumn("rn", row_number().over(w))
      .withColumn("batch_id", (((col("rn") - 1) / BatchSize).cast("int")))
      .groupBy("source", "batch_id")
      .agg(count(lit(1)).as("n_docs"),
           max("n_toks").as("max_len"),
           sum("n_toks").as("sum_len"))
      .withColumn("pad_waste", col("max_len") * col("n_docs") - col("sum_len"))
      .orderBy("source", "batch_id")
  }

  val batchPaddingOracle: String = {
    import TextAnalysis.tokensSql
    s"""WITH t AS (SELECT doc_id, source, len($tokensSql) AS n_toks FROM documents),
       |r AS (SELECT source, n_toks,
       |             ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_toks DESC, doc_id) AS rn
       |      FROM t)
       |SELECT source, CAST((rn - 1) // $BatchSize AS INT) AS batch_id,
       |       COUNT(*) AS n_docs,
       |       CAST(MAX(n_toks) AS INT) AS max_len,
       |       CAST(SUM(n_toks) AS BIGINT) AS sum_len,
       |       CAST(MAX(n_toks) * COUNT(*) - SUM(n_toks) AS BIGINT) AS pad_waste
       |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  // --- temperature-scaled source mixing --------------------------------------

  /** Epoch size (documents) the mixing weights are projected onto. */
  val MixEpochDocs = 10000L

  /** q_mix_temperature: temperature-scaled source-mixing weights.
    *
    * weight_s = count_s^α / Σ count^α with α = 0.5 — the multilingual
    * α-sampling scheme (Conneau & Lample 2019; GPT-3 uses the same shape
    * for source mixing). α = 0.5 makes count^α an IEEE-exact `sqrt`, and
    * the denominator is summed as DECIMAL(28,10) so the sum is
    * order-independent (same cross-engine exactness discipline as
    * [[TextAnalysis.lmQuality]]); the final division is one double op.
    * `epoch_docs = floor(weight · epochSize)` uses floor, not round —
    * floor of a double is engine-independent, round-half conventions are
    * not.
    *
    * Plan: one map-side-combined groupBy, a 1-row broadcast denominator —
    * the per-source table is bounded by source cardinality, never
    * corpus-sized.
    */
  def mixTemperature(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
    val denom = counts.agg(
      sum(sqrt(col("n_docs").cast("double")).cast("decimal(28,10)")).as("wsum"))
    counts.crossJoin(broadcast(denom))
      .withColumn("weight", sqrt(col("n_docs").cast("double")) / col("wsum").cast("double"))
      .withColumn("epoch_docs", floor(col("weight") * lit(MixEpochDocs.toDouble)).cast("bigint"))
      .select("source", "n_docs", "weight", "epoch_docs")
      .orderBy("source")
  }

  val mixTemperatureOracle: String =
    s"""WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
       |s AS (SELECT SUM(CAST(sqrt(CAST(n_docs AS DOUBLE)) AS DECIMAL(28,10))) AS wsum FROM c)
       |SELECT source, n_docs,
       |       sqrt(CAST(n_docs AS DOUBLE)) / CAST(wsum AS DOUBLE) AS weight,
       |       CAST(FLOOR(sqrt(CAST(n_docs AS DOUBLE)) / CAST(wsum AS DOUBLE) * ${MixEpochDocs}.0) AS BIGINT) AS epoch_docs
       |FROM c, s ORDER BY 1""".stripMargin

  // --- quality drift monitoring ----------------------------------------------

  /** How many sources the drift report flags (largest absolute mean
    * shifts). Rank-based rather than a fixed bp threshold: absolute shifts
    * shrink as 1/√n with source size, so any constant is vacuous at one SF
    * or another (measured: max |shift| 489 bp at sf0.01), while the
    * top-K-shifted report is the alerting shape reviewers consume anyway.
    */
  val QualityDriftTopK = 3

  /** q_quality_drift: per-source quality-signal drift between the
    * accumulated corpus and today's batch (md5 80/20 split — the fixture's
    * source IS doc_id % 20, so the modulo convention would alias entire
    * sources to one side; the hash split is layout-independent) — the
    * text-side data-drift monitor next to `q_embed_drift`: a shifted
    * stopword-density mean for a source means the feed changed register,
    * language mix, or boilerplate profile, and the source's quality gates
    * need re-tuning. The signal is the integer basis-point stopword
    * density ([[tokenBudget]]'s key); mean shifts are exact-integer
    * cross-multiplied rationals surfaced as one double division, and the
    * flag is rank-based — the [[QualityDriftTopK]] largest absolute
    * shifts (the double only ORDERS, the house transcendental-ordering
    * rule).
    *
    * Scale: two map-side combined per-source aggregations and one
    * source-keyed join of source-cardinality rows; in production the
    * corpus side is a stored running (n, Σbp) pair updated O(batch)/day.
    */
  def qualityDrift(spark: SparkSession, dir: String): DataFrame =
    qualityDriftOfSides(qualityDriftSidesOf(
      qualityDriftSignalOf(Tables.documents(spark, dir))))

  /** Per-doc drift signal: (doc_id, source, bp) — the integer basis-point
    * stopword density. Row-local projections only, so it runs unchanged on
    * a streaming relation (the streaming face's ingest stage).
    */
  def qualityDriftSignalOf(docs: DataFrame): DataFrame =
    TextAnalysis.qualitySignals(docs)
      .select(col("doc_id"), col("source"),
        when(col("n_tokens") > 0,
          expr("CAST(n_stopwords AS BIGINT) * 10000 div n_tokens"))
          .otherwise(0L).as("bp"))

  /** The side-aggregated (source, side, n, s) relation from the per-doc
    * signal — side 'c' = accumulated corpus (md5 buckets 0-7), 'b' =
    * today's batch (8-9). Associative count/sum only, so a complete-mode
    * streaming aggregation of this stage is micro-batch-split invariant.
    */
  def qualityDriftSidesOf(sig: DataFrame): DataFrame = {
    val bucket = pmod(conv(substring(md5(concat(lit("drift:"),
      col("doc_id").cast("string"))), 1, 6), 16, 10).cast("long"), lit(10))
    sig.withColumn("side", when(bucket < 8, lit("c")).otherwise(lit("b")))
      .groupBy("source", "side")
      .agg(count(lit(1)).as("n"), sum("bp").as("s"))
  }

  /** Batch readout over the drained side relation: mean-shift rationals,
    * rank, top-K flags — shared verbatim by [[qualityDrift]] and the
    * streaming face (`q_stream_drift`), so both are held to the same
    * DuckDB oracle.
    */
  def qualityDriftOfSides(sides: DataFrame): DataFrame = {
    val t = QualityDriftTopK
    // one conditional aggregation, not a self-join: a single pass over the
    // source×2-row relation beats a self-join of the drained relation
    // (which would scan it twice and shuffle for the equi-join); sources
    // missing either side drop out like the former inner join
    val joined = sides.groupBy("source")
      .agg(sum(when(col("side") === "c", col("n"))).as("n_corpus"),
           sum(when(col("side") === "c", col("s"))).as("s_corpus"),
           sum(when(col("side") === "b", col("n"))).as("n_batch"),
           sum(when(col("side") === "b", col("s"))).as("s_batch"))
      .filter(col("n_corpus").isNotNull && col("n_batch").isNotNull)
      .withColumn("mean_shift_bp",
        (col("s_batch") * col("n_corpus") - col("s_corpus") * col("n_batch"))
          .cast("double") / (col("n_corpus") * col("n_batch")).cast("double"))
    val rw = Window.orderBy(abs(col("mean_shift_bp")).desc, col("source"))
    joined
      .withColumn("shift_rank", row_number().over(rw))
      .select(
        col("source"), col("n_corpus"), col("n_batch"),
        col("s_corpus").as("sum_bp_corpus"), col("s_batch").as("sum_bp_batch"),
        col("mean_shift_bp"), col("shift_rank"),
        (col("shift_rank") <= t).cast("int").as("drifted"))
      .orderBy("source")
  }

  val qualityDriftOracle: String = {
    import TextAnalysis.{tokensSql, stopwordsSql}
    val t = QualityDriftTopK
    s"""WITH sig AS (
       |  SELECT doc_id, source,
       |         CASE WHEN len(toks) > 0
       |              THEN CAST(len(list_filter(toks, x -> list_contains($stopwordsSql, x))) AS BIGINT)
       |                   * 10000 // len(toks)
       |              ELSE 0 END AS bp
       |  FROM (SELECT doc_id, source, $tokensSql AS toks FROM documents)),
       |h AS (SELECT *, ('0x' || substr(md5('drift:' || CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT % 10 AS bkt
       |     FROM sig),
       |c AS (SELECT source, COUNT(*) AS n_corpus, CAST(SUM(bp) AS BIGINT) AS s_corpus
       |      FROM h WHERE bkt < 8 GROUP BY 1),
       |b AS (SELECT source, COUNT(*) AS n_batch, CAST(SUM(bp) AS BIGINT) AS s_batch
       |      FROM h WHERE bkt >= 8 GROUP BY 1),
       |j AS (
       |  SELECT source, n_corpus, n_batch, s_corpus, s_batch,
       |         CAST(s_batch * n_corpus - s_corpus * n_batch AS DOUBLE)
       |           / CAST(n_corpus * n_batch AS DOUBLE) AS mean_shift_bp
       |  FROM c JOIN b USING (source))
       |SELECT source, n_corpus, n_batch,
       |       s_corpus AS sum_bp_corpus, s_batch AS sum_bp_batch,
       |       mean_shift_bp,
       |       CAST(ROW_NUMBER() OVER (ORDER BY ABS(mean_shift_bp) DESC, source) AS INT) AS shift_rank,
       |       CAST(ROW_NUMBER() OVER (ORDER BY ABS(mean_shift_bp) DESC, source) <= $t AS INT) AS drifted
       |FROM j ORDER BY 1""".stripMargin
  }

  // --- deterministic epoch shuffle -------------------------------------------

  /** Docs per shard for [[epochShuffle]]. */
  val ShuffleShardSize = 100L

  /** Epoch seed for [[epochShuffle]] — changing it is the "new epoch, new
    * order" lever; everything downstream stays bit-deterministic.
    */
  val ShuffleSeed = "epoch1"

  /** q_epoch_shuffle: reproducible global training order without RNG
    * state — every document's epoch position is the rank of
    * md5(seed:doc_id) (keyed hash as the shuffle permutation), so any
    * worker can recompute any shard from (seed, corpus) alone; a new
    * epoch is a new seed, not a new random state to checkpoint. The audit
    * reports, per contiguous [[ShuffleShardSize]]-doc shard: doc count,
    * how many sources landed in the shard and the largest single-source
    * clump (the mixing property a training shard needs — hash order
    * provably interleaves sources), position extents, and an id checksum
    * pinning the exact membership.
    *
    * Scale shape: the permutation is ONE range-partitioned sort by the
    * 60-bit numeric hash prefix; global positions come from the
    * [[graft.plans.PrefixSum]] scaffold (bucket-offset two-phase — never
    * a single-partition window), and the shard audit is two map-side
    * combined aggregations over (shard, source). At 100 TB the epoch
    * layout is written once per seed and the data loader consumes shards
    * as contiguous ranges of the sorted files.
    */
  def epochShuffle(spark: SparkSession, dir: String,
                   seed: String = ShuffleSeed): DataFrame = {
    val s = ShuffleShardSize
    // 15 hex chars = 60 bits: numeric (PrefixSum's leading-order contract)
    // and far from BIGINT overflow on both engines; doc_id breaks the
    // (negligible) collision ties so the order is total
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
      .withColumn("k",
        conv(substring(md5(concat(lit(s"$seed:"),
          col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long"))
      .withColumn("ep", lit(0))
    val pos = graft.plans.PrefixSum.exclusiveRunningSum(
      docs, lit(1L), Seq("ep"), Seq("k", "doc_id"), out = "pos0")
    val perSource = pos
      .withColumn("shard", expr(s"pos0 div $s"))
      .groupBy("shard", "source")
      .agg(count(lit(1)).as("n"), sum("doc_id").as("ck"),
           min("pos0").as("mn"), max("pos0").as("mx"))
    perSource.groupBy("shard")
      .agg(sum("n").as("n_docs"),
           count(lit(1)).as("n_sources"),
           max("n").as("max_source_docs"),
           (min("mn") + 1).as("first_pos"),
           (max("mx") + 1).as("last_pos"),
           sum("ck").as("id_checksum"))
      .orderBy("shard")
  }

  val epochShuffleOracle: String = {
    val s = ShuffleShardSize
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |         ('0x' || substr(md5('$ShuffleSeed:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS k
       |  FROM documents),
       |p AS (SELECT doc_id, source,
       |             ROW_NUMBER() OVER (ORDER BY k, doc_id) - 1 AS pos0 FROM d),
       |ps AS (SELECT pos0 // $s AS shard, source, COUNT(*) AS n,
       |              CAST(SUM(doc_id) AS BIGINT) AS ck,
       |              MIN(pos0) AS mn, MAX(pos0) AS mx
       |       FROM p GROUP BY 1, 2)
       |SELECT shard, CAST(SUM(n) AS BIGINT) AS n_docs,
       |       COUNT(*) AS n_sources,
       |       CAST(MAX(n) AS BIGINT) AS max_source_docs,
       |       CAST(MIN(mn) + 1 AS BIGINT) AS first_pos,
       |       CAST(MAX(mx) + 1 AS BIGINT) AS last_pos,
       |       CAST(SUM(ck) AS BIGINT) AS id_checksum
       |FROM ps GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // --- deterministic interleave schedule -------------------------------------

  /** Schedule length (slots) for [[mixSchedule]]. */
  val ScheduleSlots = 200L

  /** q_mix_schedule: turn mixing quotas into the deterministic interleave a
    * data loader actually consumes — stride scheduling: source s with quota
    * q_s emits copies j = 0..q_s−1 at fractional positions (j+0.5)/q_s, and
    * the merged position order IS the slot order, so every source is spread
    * evenly through the epoch instead of clumped (the property plain
    * concatenation or per-source shuffling loses). Quotas are the Hamilton
    * largest-remainder allocation of [[ScheduleSlots]] over per-source doc
    * counts (Σ quota = slots exactly — [[sampleStratified]]'s idiom).
    *
    * Determinism: quotas are exact integer div/mod; stride keys are one
    * IEEE division each and only ORDER the merge (ties broken by source,
    * j — the `q_sample_weighted` transcendental-ordering precedent), and
    * the emitted schedule carries only exact columns. Scale: everything
    * after the per-source count rollup operates on slots+sources rows;
    * the merge window is a single tiny sort — at real epoch sizes the
    * schedule generator runs per shard over its quota slice, same math.
    */
  def mixSchedule(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = ScheduleSlots
    val counts = Tables.documents(spark, dir)
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(sum("n_docs").as("n_total"))
    val quota = counts.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"(n_docs * $n) div n_total"))
      .withColumn("rem", expr(s"(n_docs * $n) % n_total"))
    val leftover = quota.agg((lit(n) - sum("base")).as("n_extra"))
    val rw = Window.orderBy(col("rem").desc, col("source"))
    val alloc = quota.crossJoin(broadcast(leftover))
      .withColumn("rrk", row_number().over(rw))
      .withColumn("alloc",
        col("base") + when(col("rrk") <= col("n_extra"), 1L).otherwise(0L))
      .filter(col("alloc") > 0)
      .select("source", "alloc")
    val copies = alloc
      .select(col("source"), col("alloc"),
        explode(sequence(lit(0L), col("alloc") - 1)).as("j"))
      .withColumn("pos", (col("j").cast("double") + 0.5) / col("alloc"))
    val sw = Window.orderBy(col("pos"), col("source"), col("j"))
    copies.withColumn("slot", (row_number().over(sw) - 1).cast("int"))
      .select("slot", "source", "j", "alloc")
      .orderBy("slot")
  }

  val mixScheduleOracle: String = {
    val n = ScheduleSlots
    s"""WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
       |t AS (SELECT SUM(n_docs) AS n_total FROM c),
       |q AS (SELECT source, n_docs,
       |             (n_docs * $n) // n_total AS base,
       |             (n_docs * $n) % n_total AS rem
       |      FROM c, t),
       |lo AS (SELECT $n - SUM(base) AS n_extra FROM q),
       |a AS (SELECT source,
       |             CAST(base + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, source)
       |                              <= n_extra THEN 1 ELSE 0 END AS BIGINT) AS alloc
       |      FROM q, lo),
       |cp AS (SELECT source, alloc, unnest(range(0, alloc)) AS j
       |       FROM a WHERE alloc > 0),
       |p AS (SELECT source, alloc, j,
       |             (CAST(j AS DOUBLE) + 0.5) / alloc AS pos
       |      FROM cp)
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY pos, source, j) - 1 AS INT) AS slot,
       |       source, CAST(j AS BIGINT) AS j, CAST(alloc AS BIGINT) AS alloc
       |FROM p ORDER BY slot""".stripMargin
  }

  // --- budget-constrained selection ------------------------------------------

  /** Per-source token budget for [[tokenBudget]] — sized to cut mid-source
    * at every fixture SF, so the boundary logic is always exercised.
    */
  val BudgetTokens = 500L

  /** q_token_budget: budget-constrained quality-first selection — fill each
    * source's token budget with its best documents first (the "we can only
    * afford B tokens from this source, take the best" pass that follows
    * scoring and precedes packing). Quality key = stopword density in
    * integer basis points (the [[qualityQuartiles]] signal, integer-exact),
    * best-first with doc_id tiebreak; a doc is selected while the running
    * token total stays within budget — the classic cumulative-window cut.
    *
    * Plan: one signal projection (fused into the scan), ONE per-source
    * window for the running sum (source partitions are the parallelism; at
    * production key cardinality this is the standard pattern, and a
    * two-phase prefix-sum — `plans/PrefixSum` — swaps in if a single
    * source outgrows a partition), then a map-side combined audit. All
    * columns integer → hash-exact.
    */
  def tokenBudget(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = BudgetTokens
    val sig = TextAnalysis.qualitySignals(Tables.documents(spark, dir))
      .select(col("doc_id"), col("source"), col("n_tokens").cast("long").as("n_tokens"),
        when(col("n_tokens") > 0,
          expr("CAST(n_stopwords AS BIGINT) * 10000 div n_tokens"))
          .otherwise(0L).as("q"))
    val w = Window.partitionBy("source")
      .orderBy(col("q").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = sig.withColumn("cum_tokens", sum("n_tokens").over(w))
      .withColumn("selected", (col("cum_tokens") <= b).cast("int"))
    ranked.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("selected").as("n_selected"),
        sum("n_tokens").as("tokens_total"),
        sum(col("selected") * col("n_tokens")).as("tokens_selected"),
        coalesce(min(when(col("selected") === 1, col("q"))), lit(-1L)).as("cut_q"))
      .withColumn("fill_bp", expr(s"tokens_selected * 10000 div $b"))
      .orderBy("source")
  }

  val tokenBudgetOracle: String = {
    import TextAnalysis.{tokensSql, stopwordsSql}
    val b = BudgetTokens
    s"""WITH sig AS (
       |  SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tokens,
       |         CASE WHEN len(toks) > 0
       |              THEN CAST(len(list_filter(toks, t -> list_contains($stopwordsSql, t))) AS BIGINT)
       |                   * 10000 // len(toks)
       |              ELSE 0 END AS q
       |  FROM (SELECT doc_id, source, $tokensSql AS toks FROM documents)),
       |r AS (
       |  SELECT *, SUM(n_tokens) OVER (PARTITION BY source
       |              ORDER BY q DESC, doc_id
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
       |  FROM sig),
       |sel AS (SELECT *, CASE WHEN cum_tokens <= $b THEN 1 ELSE 0 END AS selected FROM r)
       |SELECT source, COUNT(*) AS n_docs,
       |       CAST(SUM(selected) AS BIGINT) AS n_selected,
       |       CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
       |       CAST(SUM(selected * n_tokens) AS BIGINT) AS tokens_selected,
       |       CAST(COALESCE(MIN(CASE WHEN selected = 1 THEN q END), -1) AS BIGINT) AS cut_q,
       |       CAST(SUM(selected * n_tokens) * 10000 // $b AS BIGINT) AS fill_bp
       |FROM sel GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // --- content-defined chunking ----------------------------------------------

  /** Rolling-hash window width (chars) for CDC boundary detection. */
  val CdcWindow = 8

  /** Boundary divisor: a position is a cut when hash % CdcMask == 0 —
    * expected chunk length ≈ CdcMask chars.
    */
  val CdcMask = 64L

  /** Polynomial base powers 31^0..31^(w-1) — fits comfortably in a long
    * (127 · Σ 31^j < 2^63 for w = 8), so no modular reduction is needed and
    * the arithmetic is exact on both engines.
    */
  private val CdcPows: Seq[Long] =
    Iterator.iterate(1L)(_ * 31L).take(CdcWindow).toSeq

  /** q_cdc_chunks: content-defined chunking + chunk-level dedup audit.
    *
    * Every char position p gets the polynomial hash of the [[CdcWindow]]
    * chars starting there (Σ code(c_{p+j})·31^j — Rabin-style, exact long
    * arithmetic); positions where the hash ≡ 0 mod [[CdcMask]] cut the
    * document AFTER the window. Chunk edges therefore move with content,
    * not offsets — an insertion reshuffles only the chunks it touches,
    * which is what makes chunk-digest dedup across near-identical documents
    * work (FastCDC / LBFS lineage). Per source the audit reports chunk
    * counts, distinct-digest counts (the dedupable fraction), and length
    * extremes.
    *
    * Plan shape: boundary detection runs INSIDE array transforms (sequence
    * → transform → filter) so only the per-chunk rows are ever exploded —
    * one scan, one explode (≈ chars/[[CdcMask]] rows per doc), one
    * map-side-combined aggregation; linear in corpus chars, embarrassingly
    * parallel per document. Digests are md5, the cross-engine-identical
    * hash used throughout ([[TextAnalysis]] design rules).
    *
    * The per-position hash reads char codes from a per-doc `codes` array
    * built in ONE linear pass (`split` + `ascii`), not via
    * `substr(text, p, 1)`: UTF8String positional substr is an O(p)
    * codepoint scan, which made the original formulation quadratic in doc
    * length (the 16.5 s BENCH_r06 outlier); `element_at` on the array is
    * O(1) and produces bit-identical hash values (`ascii` of the
    * single-char string IS `ascii(substr(text, p, 1))`), so the oracle is
    * unchanged.
    *
    * ASCII precondition (cross-engine contract): Spark's `ascii` returns
    * the first UTF-8 BYTE of the char (negative beyond 0x7F) while
    * DuckDB's returns the code point, so engine and oracle agree only on
    * ASCII text. The precondition is ENFORCED per row below — a non-ASCII
    * document raises with its doc_id (`octet_length == length` is the
    * one-comparison ASCII test; both are precomputed scan-side) instead of
    * silently producing engine-specific hashes. The documents fixture is
    * ASCII-only (also asserted by CurationSpec's fixture-contract test);
    * non-ASCII corpora would need a byte-level hash on both engines.
    */
  def cdcChunks(spark: SparkSession, dir: String): DataFrame = {
    val w = CdcWindow
    def rollHash(p: Column): Column =
      CdcPows.zipWithIndex.map { case (pw, j) =>
        element_at(col("codes"), p + lit(j)) * lit(pw)
      }.reduce(_ + _)
    // re-spread (util.Spread): the per-position rolling hash — CdcWindow
    // multiply-adds per char — inherits the scan's split count, and the
    // fixture is single-row-group parquet, so the WHOLE chunking pass ran
    // as one task (StageBench r17: 3.2 s single-task over 5000 docs, the
    // query's entire execution cost); spread it runs at session width.
    // No-op at real split counts, per-doc work → result invariant.
    val docs = graft.util.Spread.forCpu(Tables.documents(spark, dir))
      .select(col("doc_id"), col("source"), col("text"), length(col("text")).as("n"))
      .filter(col("n") >= 1)
      // loud ASCII guard: replaces n with itself on ASCII rows, raises on
      // the first multibyte row — one integer compare per row, codegen'd
      .withColumn("n",
        when(octet_length(col("text")) === col("n"), col("n"))
          .otherwise(raise_error(concat(
            lit("cdcChunks requires ASCII text (cross-engine ascii() hash contract); non-ASCII doc_id="),
            col("doc_id").cast("string")))))
    val spans = docs
      .withColumn("codes",
        transform(split(col("text"), ""), c => ascii(c).cast("bigint")))
      // cut positions: p + w for every boundary p (cut AFTER the window),
      // kept only while inside the document
      .withColumn("cuts",
        when(col("n") >= w,
          filter(
            transform(sequence(lit(1), col("n") - w + 1),
              p => when(rollHash(p) % CdcMask === 0, p + w).otherwise(lit(null).cast("int"))),
            c => c.isNotNull && c <= col("n")))
          .otherwise(array().cast("array<int>")))
      .withColumn("starts", concat(array(lit(1)), col("cuts")))
      // ends[i] = starts[i+1], last end = n+1 → len = end − start
      .withColumn("ends",
        concat(slice(col("starts"), lit(2), greatest(size(col("starts")) - 1, lit(0))),
               array(col("n") + 1)))
      .select(col("doc_id"), col("source"), col("text"),
        explode(zip_with(col("starts"), col("ends"),
          (s, e) => struct(s.as("s"), (e - s).as("clen")))).as("ch"))
      .select(col("source"), col("ch.clen").as("clen"),
              md5(col("text").substr(col("ch.s"), col("ch.clen"))).as("dg"))
    spans.groupBy("source")
      .agg(count(lit(1)).as("n_chunks"),
           count_distinct(col("dg")).as("n_uniq_chunks"),
           sum("clen").as("sum_chars"),
           max("clen").as("max_len"),
           min("clen").as("min_len"))
      .orderBy("source")
  }

  val cdcChunksOracle: String = {
    val w = CdcWindow
    val hashTerms = CdcPows.zipWithIndex
      .map { case (pw, j) => s"CAST(ascii(substr(text, p + $j, 1)) AS BIGINT) * $pw" }
      .mkString(" + ")
    s"""WITH d AS (SELECT doc_id, source, text, length(text) AS n
       |           FROM documents WHERE length(text) >= 1),
       |pos AS (SELECT doc_id, text, n, unnest(range(1, n - $w + 2)) AS p
       |        FROM d WHERE n >= $w),
       |cuts AS (SELECT doc_id, p + $w AS s FROM pos
       |         WHERE ($hashTerms) % $CdcMask = 0 AND p + $w <= n),
       |starts AS (SELECT doc_id, 1 AS s FROM d
       |           UNION ALL SELECT doc_id, CAST(s AS INT) FROM cuts),
       |sp AS (SELECT doc_id, s, LEAD(s) OVER (PARTITION BY doc_id ORDER BY s) AS nxt
       |       FROM starts),
       |ch AS (SELECT d.source,
       |              CAST(COALESCE(sp.nxt, d.n + 1) - sp.s AS INT) AS clen,
       |              md5(substr(d.text, sp.s, COALESCE(sp.nxt, d.n + 1) - sp.s)) AS dg
       |       FROM sp JOIN d USING (doc_id))
       |SELECT source, COUNT(*) AS n_chunks, COUNT(DISTINCT dg) AS n_uniq_chunks,
       |       CAST(SUM(clen) AS BIGINT) AS sum_chars,
       |       CAST(MAX(clen) AS INT) AS max_len,
       |       CAST(MIN(clen) AS INT) AS min_len
       |FROM ch GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // --- stratified sampling (largest-remainder allocation) --------------------

  /** Total sample size for stratified sampling — kept <= the sf0.001 corpus
    * (50 docs) so the allocation is meaningful at every fixture scale.
    */
  val StratTotal = 30

  /** q_sample_stratified: proportional stratified sampling with EXACT
    * total — Hamilton's largest-remainder method over source strata, then
    * a deterministic content-hash draw inside each stratum.
    *
    * Allocation is pure integer arithmetic: base_s = ⌊count_s·T / N⌋
    * (exact `div`, never a float quotient whose rounding could cross an
    * integer boundary), remainder_s = (count_s·T) mod N, and the
    * T − Σbase leftover seats go to the largest remainders (source asc
    * tiebreak) — so Σalloc = T exactly, the property plain per-stratum
    * rounding loses. The within-stratum draw ranks by md5(doc_id)
    * (reproducible under any partitioning, the [[Corpus.weightedSample]]
    * discipline — no RNG), and the audit reports the allocation plus a
    * selected-id checksum so the oracle verifies the actual draw, not just
    * the quotas.
    *
    * Scale shape: stratum stats are one map-side-combined groupBy; the
    * remainder-ranking window runs over #sources rows (bounded, like the
    * tokenize vocab window); the selection window partitions BY SOURCE.
    * Corpus-sized data crosses the shuffle once, keyed on source.
    */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(sum("n_docs").as("n_total"))
    val quota = counts.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"(n_docs * $StratTotal) div n_total"))
      .withColumn("rem", expr(s"(n_docs * $StratTotal) % n_total"))
    val leftover = quota.agg((lit(StratTotal.toLong) - sum("base")).as("n_extra"))
    // remainder ranking: #sources rows — bounded regardless of corpus size
    val rw = Window.orderBy(col("rem").desc, col("source"))
    val alloc = quota.crossJoin(broadcast(leftover))
      .withColumn("rrk", row_number().over(rw))
      .withColumn("alloc",
        col("base") + when(col("rrk") <= col("n_extra"), 1L).otherwise(0L))
      .select("source", "n_docs", "alloc")
    val sw = Window.partitionBy("source")
      .orderBy(md5(concat(lit("strat:"), col("doc_id").cast("string"))), col("doc_id"))
    val picked = docs.withColumn("srn", row_number().over(sw))
      .join(broadcast(alloc.select("source", "alloc")), Seq("source"))
      .filter(col("srn") <= col("alloc"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_selected"), sum("doc_id").as("sel_checksum"))
    alloc.join(picked, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("alloc"),
        coalesce(col("n_selected"), lit(0L)).as("n_selected"),
        coalesce(col("sel_checksum"), lit(0L)).as("sel_checksum"))
      .orderBy("source")
  }

  val sampleStratifiedOracle: String =
    s"""WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
       |tot AS (SELECT SUM(n_docs) AS n_total FROM c),
       |q AS (SELECT source, n_docs,
       |             (n_docs * $StratTotal) // n_total AS base,
       |             (n_docs * $StratTotal) % n_total AS rem
       |      FROM c, tot),
       |lo AS (SELECT $StratTotal - SUM(base) AS n_extra FROM q),
       |al AS (SELECT source, n_docs,
       |              CAST(base + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, source) <= lo.n_extra
       |                               THEN 1 ELSE 0 END AS BIGINT) AS alloc
       |       FROM q, lo),
       |r AS (SELECT doc_id, source,
       |             ROW_NUMBER() OVER (PARTITION BY source
       |               ORDER BY md5('strat:' || doc_id::VARCHAR), doc_id) AS srn
       |      FROM documents),
       |sel AS (SELECT r.source, COUNT(*) AS n_selected,
       |               CAST(SUM(r.doc_id) AS BIGINT) AS sel_checksum
       |        FROM r JOIN al ON r.source = al.source AND r.srn <= al.alloc
       |        GROUP BY 1)
       |SELECT al.source, al.n_docs, al.alloc,
       |       COALESCE(sel.n_selected, 0) AS n_selected,
       |       COALESCE(sel.sel_checksum, 0) AS sel_checksum
       |FROM al LEFT JOIN sel ON al.source = sel.source ORDER BY 1""".stripMargin

  // --- duplicate-cluster size histogram --------------------------------------

  /** q_dedup_cluster_stats: exact-duplicate cluster-size histogram — for
    * each cluster size s, how many content-hash clusters have exactly s
    * members and how many documents they hold. The headline numbers of a
    * dedup report (singleton fraction, largest clone family) in one pass:
    * two map-side-combined aggregations keyed on md5(text) then size —
    * scale-safe at any corpus size.
    */
  def dedupClusterStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("dg"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size")
      .agg(count(lit(1)).as("n_clusters"),
           sum("cluster_size").as("n_docs"))
      .orderBy("cluster_size")

  val dedupClusterStatsOracle: String =
    """WITH cl AS (SELECT md5(text) AS dg, COUNT(*) AS cluster_size
      |            FROM documents GROUP BY 1)
      |SELECT cluster_size, COUNT(*) AS n_clusters,
      |       CAST(SUM(cluster_size) AS BIGINT) AS n_docs
      |FROM cl GROUP BY 1 ORDER BY 1""".stripMargin

  // --- per-source quality stratification -------------------------------------

  /** q_quality_quartiles: NTILE(4) quality stratification per source over
    * the stopword-ratio signal (deterministic total order via the doc_id
    * tiebreak). The bucketing step of curriculum schedules and
    * quality-mixed sampling ("train on top-half first"). Window is
    * partitioned by source; ratio is a single exact double division, and
    * per-bucket outputs are counts + min/max (order-independent), so the
    * oracle hash-compares.
    */
  def qualityQuartiles(spark: SparkSession, dir: String): DataFrame = {
    val sig = TextAnalysis.qualitySignals(Tables.documents(spark, dir))
      .withColumn("ratio",
        col("n_stopwords").cast("double") / greatest(col("n_tokens"), lit(1)))
    val w = Window.partitionBy("source").orderBy(col("ratio"), col("doc_id"))
    sig.withColumn("quartile", ntile(4).over(w))
      .groupBy("source", "quartile")
      .agg(count(lit(1)).as("n_docs"),
           min("ratio").as("min_ratio"),
           max("ratio").as("max_ratio"),
           sum("n_tokens").as("n_tokens"))
      .orderBy("source", "quartile")
  }

  val qualityQuartilesOracle: String = {
    import TextAnalysis.{tokensSql, stopwordsSql}
    s"""WITH sig AS (
       |  SELECT doc_id, source, len(toks) AS n_tokens,
       |         CAST(len(list_filter(toks, t -> list_contains($stopwordsSql, t))) AS DOUBLE)
       |           / greatest(len(toks), 1) AS ratio
       |  FROM (SELECT doc_id, source, $tokensSql AS toks FROM documents)),
       |q AS (SELECT source, n_tokens, ratio,
       |             NTILE(4) OVER (PARTITION BY source ORDER BY ratio, doc_id) AS quartile
       |      FROM sig)
       |SELECT source, CAST(quartile AS INT) AS quartile, COUNT(*) AS n_docs,
       |       MIN(ratio) AS min_ratio, MAX(ratio) AS max_ratio,
       |       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
       |FROM q GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  // --- composed end-to-end curation pipeline ---------------------------------

  /** Selection budget (documents per epoch) for the composed pipeline —
    * deliberately larger than any fixture's survivor count per source, so
    * the `least(quota, survivors)` cap is exercised at every SF.
    */
  val PipelineEpochDocs = 1000L

  /** q_curation_pipeline: the composed end-to-end curation funnel — the
    * "whole pipeline" shape every training-set build runs, as ONE
    * oracle-checked query instead of isolated stages:
    *
    *   1. quality filter ([[TextAnalysis.qualityFilter]]'s keep predicate:
    *      token-count band, mean-token-length band, stopword presence);
    *   2. exact dedup over survivors (keep min doc_id per content hash —
    *      [[dedupClusterStats]]'s clustering, resolved);
    *   3. temperature-quota selection: α = 0.5 mixing weights over
    *      SURVIVOR counts ([[mixTemperature]]'s exact-decimal discipline)
    *      project a [[PipelineEpochDocs]] budget into per-source quotas
    *      (capped at the survivor count), filled by the deterministic
    *      md5-ranked draw ([[sampleStratified]]'s idiom — no RNG).
    *
    * The audit reports the funnel per source: raw → quality-kept → unique
    * → quota → selected, plus the selected token mass (the number a
    * trainer actually budgets against). Composition is the point: stage
    * boundaries are plain DataFrames, so the whole funnel stays one
    * Catalyst plan — filters fuse into the scan, the dedup and the rank
    * windows both partition by their natural keys, and no stage
    * materializes an intermediate corpus.
    *
    * 100 TB shape: one corpus scan feeds the signal projection; dedup
    * shuffles on the content hash (uniform); the per-source rank window
    * partitions by source over SURVIVORS only; quotas ride a broadcast
    * join; every aggregate is map-side combined.
    */
  def curationPipeline(spark: SparkSession, dir: String): DataFrame =
    curationFunnel(Tables.documents(spark, dir))

  /** [[curationPipeline]] core over an explicit documents relation
    * (injectable for planted-fixture tests — the [[graft.ops.Corpus]]
    * idiom; the shipped fixture exercises the quality gates but has no
    * exact duplicates, so the dedup stage's bite is proven by the spec).
    */
  def curationFunnel(docsIn: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = TextAnalysis.tokens(col("text"))
    val sig = docsIn.select(
      col("doc_id"), col("source"), col("text"),
      size(toks).as("n_tokens"),
      size(filter(toks, t => t.isin(TextAnalysis.Stopwords.map(lit): _*))).as("n_stop"),
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("sum_tok_chars"))
    val keep = col("n_tokens") >= 20 && col("n_tokens") <= 2000 &&
      col("sum_tok_chars") >= col("n_tokens") * 2 &&
      col("sum_tok_chars") <= col("n_tokens") * 12 &&
      col("n_stop") > 0
    val qual = sig.withColumn("keep", keep)
    val uniq = qual.filter(col("keep"))
      .withColumn("rn",
        row_number().over(Window.partitionBy(md5(col("text"))).orderBy("doc_id")))
      .filter(col("rn") === 1)
      .select("doc_id", "source", "n_tokens")
    val counts = uniq.groupBy("source").agg(count(lit(1)).as("n_unique"))
    val denom = counts.agg(
      sum(sqrt(col("n_unique").cast("double")).cast("decimal(28,10)")).as("wsum"))
    val quotas = counts.crossJoin(broadcast(denom))
      .select(col("source"), col("n_unique"),
        least(col("n_unique"),
          floor(sqrt(col("n_unique").cast("double")) / col("wsum").cast("double")
            * lit(PipelineEpochDocs.toDouble)).cast("bigint")).as("quota"))
    val sel = uniq
      .withColumn("srn", row_number().over(Window.partitionBy("source")
        .orderBy(md5(concat(lit("pipe:"), col("doc_id").cast("string"))), col("doc_id"))))
      .join(broadcast(quotas.select("source", "quota")), "source")
      .filter(col("srn") <= col("quota"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_selected"), sum("n_tokens").as("sel_tokens"))
    val funnel = qual.groupBy("source").agg(
      count(lit(1)).as("n_raw"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("n_quality"))
    funnel
      .join(quotas, Seq("source"), "left")
      .join(sel, Seq("source"), "left")
      .select(col("source"), col("n_raw"), col("n_quality"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"),
        coalesce(col("quota"), lit(0L)).as("quota"),
        coalesce(col("n_selected"), lit(0L)).as("n_selected"),
        coalesce(col("sel_tokens"), lit(0L)).as("sel_tokens"))
      .orderBy("source")
  }

  val curationPipelineOracle: String = {
    import TextAnalysis.{tokensSql, stopwordsSql}
    s"""WITH sig AS (
       |  SELECT doc_id, source, text, len(toks) AS n_tokens,
       |         len(list_filter(toks, t -> list_contains($stopwordsSql, t))) AS n_stop,
       |         list_sum(list_transform(toks, t -> len(t))) AS sum_tok_chars
       |  FROM (SELECT doc_id, source, text, $tokensSql AS toks FROM documents)),
       |q AS (SELECT *, (n_tokens >= 20 AND n_tokens <= 2000
       |                 AND sum_tok_chars >= n_tokens * 2
       |                 AND sum_tok_chars <= n_tokens * 12
       |                 AND n_stop > 0) AS keep
       |      FROM sig),
       |uniq AS (SELECT doc_id, source, n_tokens FROM (
       |           SELECT doc_id, source, n_tokens,
       |                  ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
       |           FROM q WHERE keep) WHERE rn = 1),
       |c AS (SELECT source, COUNT(*) AS n_unique FROM uniq GROUP BY 1),
       |s AS (SELECT SUM(CAST(sqrt(CAST(n_unique AS DOUBLE)) AS DECIMAL(28,10))) AS wsum FROM c),
       |qt AS (SELECT source, n_unique,
       |              least(n_unique, CAST(FLOOR(sqrt(CAST(n_unique AS DOUBLE))
       |                / CAST(wsum AS DOUBLE) * ${PipelineEpochDocs}.0) AS BIGINT)) AS quota
       |       FROM c, s),
       |r AS (SELECT uniq.source, n_tokens,
       |             ROW_NUMBER() OVER (PARTITION BY uniq.source
       |               ORDER BY md5('pipe:' || doc_id::VARCHAR), doc_id) AS srn
       |      FROM uniq),
       |sel AS (SELECT r.source, COUNT(*) AS n_selected,
       |               CAST(SUM(n_tokens) AS BIGINT) AS sel_tokens
       |        FROM r JOIN qt ON r.source = qt.source AND r.srn <= qt.quota
       |        GROUP BY 1),
       |funnel AS (SELECT source, COUNT(*) AS n_raw,
       |                  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_quality
       |           FROM q GROUP BY 1)
       |SELECT funnel.source, funnel.n_raw, funnel.n_quality,
       |       COALESCE(qt.n_unique, 0) AS n_unique,
       |       COALESCE(qt.quota, 0) AS quota,
       |       COALESCE(sel.n_selected, 0) AS n_selected,
       |       COALESCE(sel.sel_tokens, 0) AS sel_tokens
       |FROM funnel
       |LEFT JOIN qt ON funnel.source = qt.source
       |LEFT JOIN sel ON funnel.source = sel.source
       |ORDER BY 1""".stripMargin
  }
}
