package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables
import graft.functions.Deterministic

/** Feature-engineering operators a training-data pipeline runs ahead of
  * modeling (north-star tier; no reference analog): fuzzy entity matching
  * with blocking, and per-group standardization / anomaly flagging.
  */
object Features {

  /** Fuzzy name matching with BLOCKING: distinct part names self-joined
    * only within a block (the name's SECOND token — the noun of the
    * fixture's adjective-noun names), then exact Levenshtein ≤ 2 on the
    * candidates. Blocking is what makes fuzzy joins scale: the quadratic
    * candidate space shrinks to per-block squares (the same
    * candidate-then-verify shape as the LSH dedup tier), and the
    * edit-distance only runs on candidates. The fixture plants adjective
    * typo pairs ("cold gear" / "old gear"), so the output is non-trivial
    * at every scale factor. `split_part` (not `element_at`) mirrors the
    * oracle exactly: a single-token name blocks to the empty string on
    * both engines, where ANSI `element_at` would error instead.
    */
  def fuzzyPartNamePairs(spark: SparkSession, sfDir: String): DataFrame = {
    val names = Tables.part(spark, sfDir)
      .select(col("p_name")).distinct()
      .withColumn("block", expr("split_part(p_name, ' ', 2)"))
    names.alias("a")
      .join(names.alias("b"),
        col("a.block") === col("b.block") && col("a.p_name") < col("b.p_name"))
      .select(col("a.p_name").alias("name_a"), col("b.p_name").alias("name_b"),
        levenshtein(col("a.p_name"), col("b.p_name")).alias("edit_distance"))
      .filter(col("edit_distance") <= 2)
      .orderBy("name_a", "name_b")
  }

  /** Per-type standardization of event values from exact integer power
    * sums (the [[Stats.lineitemCorr]] determinism pattern): z-scores are
    * `(value − mean) / stddev_pop` where mean/stddev derive from exact
    * DECIMAL sums of the cent-quantized values, so both engines compute
    * the identical doubles; rows with |z| > 2.5 are flagged as anomalies
    * and returned. One aggregation shuffle + one broadcast join back to
    * the stream — the standard shape for feature scaling at 100 TB
    * (stats pass, then a stateless map).
    */
  def eventsValueZscore(spark: SparkSession, sfDir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val qv = Deterministic.quantize(col("value"), 2).cast(dec)
    val stats = Tables.events(spark, sfDir)
      .select(col("event_type"), qv.alias("q"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast(dec).alias("n"),
        sum(col("q")).alias("s1"),
        sum(col("q") * col("q")).alias("s2"))
    val mean = col("s1").cast("double") / col("n").cast("double") / lit(100.0)
    val std = sqrt((col("n") * col("s2") - col("s1") * col("s1")).cast("double") /
      (col("n") * col("n")).cast("double")) / lit(100.0)
    val typed = stats.select(col("event_type"), mean.alias("mean_value"),
      std.alias("std_value"))
    Tables.events(spark, sfDir)
      .join(broadcast(typed), Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("value"),
        ((col("value") - col("mean_value")) / col("std_value")).alias("zscore"))
      .filter(abs(col("zscore")) > 2.5)
      .orderBy("event_id")
  }

  /** ROBUST anomaly scores — the outlier-resistant twin of
    * [[eventsValueZscore]]: median/MAD replace mean/stddev, so a handful
    * of extreme values cannot drag the baseline toward themselves and
    * mask each other (the masking failure that makes plain z-scores
    * unreliable for data-quality gates). `robust_z = 0.6745·(x − med) /
    * MAD` (the consistency constant makes it σ-comparable under
    * normality); rows with |z| > 3.5 (the standard Iglewicz-Hoaglin cut)
    * are returned.
    *
    * Determinism: `percentile` interpolation is the same closed form in
    * Spark and DuckDB's `quantile_cont` (proven cross-engine-exact by
    * `order_price_quantiles`), and every derived double flows through
    * identical IEEE expression trees. Two aggregation passes (median,
    * then MAD over the re-joined deviations) + broadcast joins back —
    * exact medians sort per group, so at 100 TB the scale path swaps in
    * `approx_percentile` exactly as `order_price_quantiles_approx`
    * prescribes; the exact spelling is the verifiable one.
    */
  def eventsValueMad(spark: SparkSession, sfDir: String): DataFrame = {
    val med = Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(percentile(col("value"), lit(0.5)).alias("med"))
    val mad = Tables.events(spark, sfDir)
      .join(broadcast(med), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(first(col("med")).alias("med"),
        percentile(abs(col("value") - col("med")), lit(0.5)).alias("mad"))
    Tables.events(spark, sfDir)
      .join(broadcast(mad), Seq("event_type"))
      .filter(col("mad") > 0)
      .select(col("event_id"), col("event_type"), col("value"),
        (lit(0.6745) * (col("value") - col("med")) / col("mad"))
          .alias("robust_z"))
      .filter(abs(col("robust_z")) > 3.5)
      .orderBy("event_id")
  }

  private val ChunkSize = 32
  private val ChunkStride = 24 // 8-token overlap between consecutive chunks

  /** Overlapping token-window chunking — the step that turns documents
    * into model-sized training samples. Chunk k of a doc covers tokens
    * `[k·stride + 1, k·stride + size]` (1-based, 8-token overlap); the
    * last chunk starts at the last stride boundary that still adds new
    * tokens, so every token lands in ≥ 1 chunk and no empty chunks are
    * emitted. Pure narrow work (sequence/explode/slice HOFs — one row
    * widens to its chunk count, no shuffle until the verification sort).
    */
  def docsChunkedOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions
    Tables.loadSpread(spark, sfDir, "documents")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).alias("t"))
      .select(col("doc_id"),
        posexplode(TextFunctions.chunkWindows(col("t"), ChunkSize, ChunkStride))
          .as(Seq("chunk_id", "chunk")))
      .select(col("doc_id"), col("chunk_id"),
        size(col("chunk")).alias("n_tokens"),
        concat_ws(" ", col("chunk")).alias("chunk_text"))
      .orderBy("doc_id", "chunk_id")
  }

  private[operators] val PackBudget = 256

  /** Streaming token packing: documents in doc_id order are assigned to
    * fixed-capacity bins by the bin their FIRST token falls into
    * (`bin = exclusive-cumsum div budget`) — the fully-parallel
    * boundary-slicing approximation of greedy packing (a bin can overflow
    * by at most one document's tokens; exact first-fit is a sequential
    * fold and does not distribute).
    *
    * The global cumsum runs as a DISTRIBUTED PREFIX SUM, not a
    * single-reducer global window: documents shard deterministically by
    * doc_id range, each shard computes its local cumsum in parallel
    * (shard-partitioned window), and the per-shard totals — one row per
    * shard — roll into exclusive offsets that broadcast back. Identical
    * result to `sum() OVER (ORDER BY doc_id)` (which remains the oracle
    * spelling), but the only single-partition step touches `Shards` rows.
    */
  def docsTokenPacking(spark: SparkSession, sfDir: String): DataFrame =
    tokenPackingOf(Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).alias("n_tokens")))

  /** The distributed-prefix-sum packing over ANY (`doc_id`, `n_tokens`)
    * sizing frame — factored so the trained-tokenizer variant
    * ([[TextAnalysis.bpeTokenPacking]]) packs by REAL model tokens
    * through the identical machinery.
    */
  private[operators] def tokenPackingOf(sized: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val Shards = 16
    // deterministic arithmetic range sharding (sampling-based
    // repartitionByRange boundaries would not be reproducible)
    val maxId = sized.agg(max(col("doc_id"))).head().getLong(0)
    val perShard = math.max(1L, maxId / Shards + 1)
    val sharded = sized.withColumn("shard", (col("doc_id") / perShard).cast("int"))
    val localW = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sharded.withColumn("local_cum", sum(col("n_tokens")).over(localW))
    // constant partition key: same single-partition plan over the bounded
    // (≤256-shard) side table, without the unpartitioned-window warning
    val offsetW = Window
      .partitionBy(graft.functions.Deterministic.onePartitionKey(col("shard")))
      .orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = sharded.groupBy(col("shard"))
      .agg(sum(col("n_tokens")).alias("shard_total"))
      .withColumn("offset",
        sum(col("shard_total")).over(offsetW) - col("shard_total"))
      .select(col("shard").alias("o_shard"), col("offset"))
    local.join(broadcast(offsets), col("shard") === col("o_shard"))
      .select(col("doc_id"), col("n_tokens"),
        (col("local_cum") + col("offset")).alias("cum_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("cum_tokens"),
        expr(s"(cum_tokens - n_tokens) div $PackBudget").alias("bin_id"))
      .orderBy("doc_id")
  }

  /** Deterministic multi-source training schedule: round-robin interleave
    * across languages, positions computed ARITHMETICALLY
    * (`(rank−1)·n_langs + lang_idx`) rather than by a global window —
    * rank-within-language is the only real shuffle, the language index
    * rides a broadcast, and no total-order sort of the corpus ever runs
    * (the verification `ORDER BY position` is on the gate, not the
    * schedule computation). Positions are globally unique; once a
    * language exhausts, its slots simply go unused — still a valid
    * deterministic schedule, with no cross-partition coordination at
    * 100 TB.
    */
  def corpusMixtureSchedule(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val langs = Tables.documents(spark, sfDir)
      .select(col("lang")).distinct()
      .withColumn("lang_idx",
        row_number().over(Window
          .partitionBy(graft.functions.Deterministic.onePartitionKey(col("lang")))
          .orderBy(col("lang"))) - 1)
      .withColumn("n_langs", count(lit(1)).over(Window
        .partitionBy(graft.functions.Deterministic.onePartitionKey(col("lang")))))
    val ranked = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"))
      .withColumn("rank_in_lang",
        row_number().over(Window.partitionBy(col("lang")).orderBy(col("doc_id"))))
    ranked.join(broadcast(langs), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("rank_in_lang"),
        ((col("rank_in_lang") - 1).cast("long") * col("n_langs") +
          col("lang_idx")).alias("position"))
      .orderBy("position")
  }

  /** PACKING-EFFICIENCY AUDIT over [[docsTokenPacking]]'s bins: docs per
    * bin, tokens landed in the bin, and fill percentage against the
    * 256-token budget — the padding-waste number that decides whether a
    * packing scheme is paying for itself (every unfilled slot is a
    * padded position the training step computes over for nothing; fills
    * over 100% mark documents straddling a bin boundary, which the
    * slot-by-start rule permits by design). Pure rollup of the packing
    * assignment — same shuffles, plus one bounded per-bin aggregate.
    */
  def packEfficiency(spark: SparkSession, sfDir: String): DataFrame =
    docsTokenPacking(spark, sfDir)
      .groupBy(col("bin_id"))
      .agg(count(lit(1)).alias("n_docs"),
        sum(col("n_tokens")).alias("used_tokens"))
      .select(col("bin_id"), col("n_docs"), col("used_tokens"),
        (col("used_tokens") * lit(100)).cast("double")
          ./(lit(PackBudget)).alias("fill_pct"))
      .orderBy("bin_id")

  /** POINT-IN-TIME-CORRECT TRAINING MATRIX (the feature-store "training
    * example generation" shape): one row per purchase event carrying
    * features computed ONLY from state strictly before the label's
    * timestamp — the discipline that prevents feature leakage. Composes
    * the two point-in-time machineries the library already pins:
    * rows-frame windows for the user's running history (event count,
    * prior purchase value — exact-integer cents, divided once) and the
    * LEFT as-of join for the newest order at-or-before the event (null
    * when the user had no order yet — "no state" is an answer, the
    * [[AsOfJoin.eventsAsofOrderLeft]] rule). The DuckDB oracle spells
    * the identical matrix with WINDOW + ASOF LEFT JOIN, so leakage
    * discipline (strictly-before frames, ≤-as-of) is a gate fact.
    *
    * Scale shape: ONE shuffle on user_id serves the history windows, the
    * as-of union-carry rides the same key — never a per-event range
    * probe; at 100 TB this is the backfill job that materializes a
    * training table, and its cost is two keyed sorts of the event log.
    */
  def userPurchaseFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wPrev = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val feats = Tables.events(spark, sfDir)
      .withColumn("n_prior_events", count(lit(1)).over(wPrev))
      .withColumn("prior_purchase_value",
        (coalesce(sum(when(col("event_type") === "purchase",
          Deterministic.quantize(col("value"), 2))).over(wPrev), lit(0L))
          / lit(100.0)).cast("double"))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").alias("purchase_id"), col("user_id"),
        unix_micros(col("ts")).alias("ts_us"),
        col("n_prior_events"), col("prior_purchase_value"))
    val ordersPerTs = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).alias("o_ts_us"))
      .agg(max(col("o_orderkey")).alias("asof_order_key"))
    AsOfJoin.asOf(
      left = feats, right = ordersPerTs,
      leftKey = "user_id", rightKey = "o_custkey",
      leftTimeUs = col("ts_us"), rightTimeUs = col("o_ts_us"),
      carries = Seq("asof_order_key"), rightTiebreak = "asof_order_key",
      joinType = "left")
      .select(col("purchase_id"), col("user_id"), col("n_prior_events"),
        col("prior_purchase_value"), col("asof_order_key"))
      .orderBy("purchase_id")
  }

  /** DETERMINISTIC NEGATIVE SAMPLING for contrastive training: K=3
    * cross-label negatives per anchor, reproducible run-over-run (a
    * training job that resamples negatives on every retry silently
    * changes the dataset). Sampling key = md5 over the (anchor,
    * candidate) pair — uniform, engine-portable, and seedable by
    * construction; candidates are restricted to the anchor's md5
    * bucket (first hex nibble here, B=16) so the pair stream is
    * N·(N/B) instead of N² — at 100 TB the bucket width is the
    * tunable that keeps this a bounded equi-join per anchor, never an
    * all-pairs cross. The top-K-per-anchor window plans as
    * WindowGroupLimit (per-partition heap, no global sort).
    */
  def contrastiveNegatives(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("label"),
      substring(md5(col("vec_id").cast("string")), 1, 1).as("bkt"))
    val cands = e.select(col("vec_id").as("neg_id"),
      col("label").as("neg_label"), col("bkt"))
    e.join(cands, Seq("bkt"))
      .filter(col("label") =!= col("neg_label"))
      .withColumn("score", md5(concat_ws(":",
        col("vec_id").cast("string"), col("neg_id").cast("string"))))
      .withColumn("neg_rank", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("score"), col("neg_id"))))
      .filter(col("neg_rank") <= 3)
      .select(col("vec_id"), col("neg_rank"), col("neg_id"), col("neg_label"))
      .orderBy("vec_id", "neg_rank")
  }

  val oracles: Map[String, String] = Map(
    "contrastive_negatives" ->
      """WITH e AS (
        |  SELECT vec_id, label,
        |         substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) AS bkt
        |  FROM embeddings),
        |pairs AS (
        |  SELECT a.vec_id, c.vec_id AS neg_id, c.label AS neg_label,
        |         md5(CAST(a.vec_id AS VARCHAR) || ':' ||
        |             CAST(c.vec_id AS VARCHAR)) AS score
        |  FROM e a JOIN e c ON a.bkt = c.bkt AND a.label != c.label)
        |SELECT vec_id,
        |       CAST(row_number() OVER (PARTITION BY vec_id
        |                               ORDER BY score, neg_id) AS INT)
        |         AS neg_rank,
        |       neg_id, neg_label
        |FROM pairs
        |QUALIFY neg_rank <= 3
        |ORDER BY vec_id, neg_rank""".stripMargin,
    "docs_pack_efficiency" ->
      s"""WITH sized AS (
         |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
         |  FROM documents),
         |packed AS (
         |  SELECT doc_id, n_tokens,
         |         CAST((sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
         |               - n_tokens) // $PackBudget AS BIGINT) AS bin_id
         |  FROM sized)
         |SELECT bin_id, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n_tokens) AS BIGINT) AS used_tokens,
         |       CAST(sum(n_tokens) * 100 AS DOUBLE) / $PackBudget AS fill_pct
         |FROM packed GROUP BY bin_id ORDER BY bin_id""".stripMargin,
    "user_purchase_features" ->
      """WITH f AS (
        |  SELECT event_id, user_id, ts, event_type,
        |         CAST(count(*) OVER wprev AS BIGINT) AS n_prior_events,
        |         CAST(coalesce(SUM(CASE WHEN event_type = 'purchase'
        |                THEN CAST(round(value * 1e2) AS BIGINT) END)
        |              OVER wprev, 0) / 1e2 AS DOUBLE) AS prior_purchase_value
        |  FROM events
        |  WINDOW wprev AS (PARTITION BY user_id ORDER BY ts, event_id
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |op AS (
        |  SELECT o_custkey, o_orderdate AS ots, max(o_orderkey) AS asof_order_key
        |  FROM orders GROUP BY 1, 2)
        |SELECT f.event_id AS purchase_id, f.user_id AS user_id,
        |       n_prior_events, prior_purchase_value, op.asof_order_key
        |FROM f ASOF LEFT JOIN op
        |  ON f.user_id = op.o_custkey AND op.ots <= f.ts
        |WHERE f.event_type = 'purchase'
        |ORDER BY purchase_id""".stripMargin,
    "corpus_mixture_schedule" ->
      """WITH langs AS (
        |  SELECT lang,
        |         CAST(row_number() OVER (ORDER BY lang) - 1 AS INT) AS lang_idx,
        |         CAST(count(*) OVER () AS BIGINT) AS n_langs
        |  FROM (SELECT DISTINCT lang FROM documents)),
        |ranked AS (
        |  SELECT doc_id, lang,
        |         CAST(row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS INT)
        |           AS rank_in_lang
        |  FROM documents)
        |SELECT doc_id, r.lang AS lang, rank_in_lang,
        |       CAST((rank_in_lang - 1) AS BIGINT) * n_langs + lang_idx AS position
        |FROM ranked r JOIN langs USING (lang)
        |ORDER BY position""".stripMargin,
    "docs_chunked_overlap" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |k AS (
         |  SELECT doc_id, t,
         |         (greatest(len(t) - $ChunkSize, 0) + ${ChunkStride - 1}) // $ChunkStride AS kmax
         |  FROM toks),
         |chunks AS (
         |  SELECT doc_id, unnest(generate_series(0, kmax)) AS chunk_id, t FROM k)
         |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
         |       CAST(len(list_slice(t, chunk_id * $ChunkStride + 1,
         |                           chunk_id * $ChunkStride + $ChunkSize)) AS INT) AS n_tokens,
         |       array_to_string(list_slice(t, chunk_id * $ChunkStride + 1,
         |                                  chunk_id * $ChunkStride + $ChunkSize), ' ') AS chunk_text
         |FROM chunks ORDER BY doc_id, chunk_id""".stripMargin,
    "docs_token_packing" ->
      s"""WITH sized AS (
         |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
         |  FROM documents)
         |SELECT doc_id, n_tokens,
         |       CAST(sum(n_tokens) OVER (ORDER BY doc_id
         |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
         |       CAST((sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
         |             - n_tokens) // $PackBudget AS BIGINT) AS bin_id
         |FROM sized ORDER BY doc_id""".stripMargin,
    "fuzzy_part_name_pairs" ->
      """WITH names AS (
        |  SELECT DISTINCT p_name, split_part(p_name, ' ', 2) AS block FROM part)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_distance
        |FROM names a JOIN names b
        |  ON a.block = b.block AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY name_a, name_b""".stripMargin,
    "events_value_zscore" ->
      """WITH sums AS (
        |  SELECT event_type,
        |         CAST(count(*) AS HUGEINT) AS n,
        |         CAST(SUM(CAST(round(value * 1e2) AS BIGINT)) AS HUGEINT) AS s1,
        |         CAST(SUM(CAST(round(value * 1e2) AS BIGINT)
        |           * CAST(round(value * 1e2) AS BIGINT)) AS HUGEINT) AS s2
        |  FROM events GROUP BY 1),
        |stats AS (
        |  SELECT event_type,
        |         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean_value,
        |         sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)
        |              / CAST(n * n AS DOUBLE)) / 100.0 AS std_value
        |  FROM sums)
        |SELECT event_id, e.event_type AS event_type, value,
        |       (value - mean_value) / std_value AS zscore
        |FROM events e JOIN stats USING (event_type)
        |WHERE abs((value - mean_value) / std_value) > 2.5
        |ORDER BY event_id""".stripMargin,
    "events_value_mad" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1),
        |mad AS (
        |  SELECT e.event_type, first(med) AS med,
        |         quantile_cont(abs(value - med), 0.5) AS mad
        |  FROM events e JOIN med USING (event_type)
        |  GROUP BY 1)
        |SELECT event_id, e.event_type AS event_type, value,
        |       0.6745 * (value - med) / mad AS robust_z
        |FROM events e JOIN mad USING (event_type)
        |WHERE mad > 0 AND abs(0.6745 * (value - med) / mad) > 3.5
        |ORDER BY event_id""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fuzzy_part_name_pairs" -> fuzzyPartNamePairs _,
    "contrastive_negatives" -> contrastiveNegatives _,
    "events_value_zscore"   -> eventsValueZscore _,
    "events_value_mad"      -> eventsValueMad _,
    "docs_chunked_overlap"  -> docsChunkedOverlap _,
    "docs_token_packing"    -> docsTokenPacking _,
    "corpus_mixture_schedule" -> corpusMixtureSchedule _,
    "user_purchase_features"  -> userPurchaseFeatures _,
    "docs_pack_efficiency"    -> packEfficiency _,
  )
}
