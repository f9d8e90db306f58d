package graft.operators

import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Sketch-based operators — the bounded-memory paths a 100 TB pipeline
  * uses when exact per-key state no longer fits (no reference analog; the
  * reference's only aggregate is one groupBy-sum).
  *
  * Pattern shared by both operators here: sketches are MERGEABLE, so they
  * aggregate map-side, merge associatively across partitions (safe under
  * AQE re-plans), and can be rolled up across grouping granularities
  * without touching raw data again.
  */
object Sketches {

  /** Exact heavy hitters through a Count-Min-Sketch prune:
    *
    *  1. one aggregation builds a CMS of `l_partkey` (bounded memory:
    *     width×depth counters regardless of key cardinality);
    *  2. the distinct key set is probed against the broadcast sketch —
    *     CMS only ever OVER-estimates, so the candidate set is a strict
    *     superset of the true heavy hitters (no false negatives, same
    *     one-sided guarantee as [[graft.functions.BloomPrune]]);
    *  3. an exact count restricted to the candidates (broadcast semi
    *     join) trims the false positives.
    *
    * Output is therefore EXACT (oracle: plain GROUP BY ... HAVING), while
    * per-key exact state is only ever held for candidates. On uniform
    * fixture data the prune is weak; on the Zipfian key distributions
    * heavy-hitter queries exist for, candidates ≈ the hot keys only.
    * The sketch probe is the codegen'd [[graft.plans.CmsAtLeast]]
    * Catalyst predicate over the DISTINCT keys — never the fact table —
    * with the sketch bytes riding a broadcast variable (same transport
    * rationale as [[graft.functions.BloomPrune]]; no UDF, no plan
    * literal).
    *
    * Threshold: 1.5× the mean per-key count, derived from two exact
    * scalars (row count, distinct count) so both engines compute the
    * identical double.
    */
  def heavyHitterParts(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
    val statsRow = l.agg(count(lit(1)).alias("total"),
      countDistinct(col("l_partkey")).alias("nkeys")).head()
    // same operation order as the oracle's `1.5 * avg(n)`: divide the two
    // exact integers first, then scale — double ops on identical inputs
    // in identical order are bit-identical across engines
    val threshold = 1.5 * (statsRow.getLong(0).toDouble / statsRow.getLong(1))
    val cmsBytes = l.stat.countMinSketch(col("l_partkey"),
      eps = 0.0001, confidence = 0.99, seed = 42).toByteArray
    // tracked so CacheLifecycle.unpersistAll destroys the sketch blocks —
    // same leak rationale as BloomPrune.broadcastBloom
    val cmsBc = graft.CacheLifecycle.trackedBroadcast(
      spark.sparkContext.broadcast(cmsBytes))
    val candidates = l.select(col("l_partkey")).distinct()
      .filter(GraftSqlBridge.column(graft.plans.CmsAtLeast(
        GraftSqlBridge.expression(col("l_partkey").cast("long")),
        cmsBc, threshold)))
    l.join(broadcast(candidates), Seq("l_partkey"), "left_semi")
      .groupBy(col("l_partkey").alias("part_key"))
      .agg(count(lit(1)).alias("n"))
      .filter(col("n") >= threshold)
      .orderBy("part_key")
  }

  /** Mergeable-HLL vocabulary rollup: one DataSketches HLL sketch of the
    * token stream per (lang, source), then per-language vocabulary by
    * UNIONING the source sketches — in production the raw tokens are read
    * exactly once and any coarser granularity derives from stored
    * sketches, which is how a 100 TB corpus keeps distinct counts
    * maintainable. Estimates are engine-specific, so the VERIFIED output
    * carries the exact per-language vocabulary plus a boolean asserting
    * the rolled-up estimate landed within 5% of it; the oracle pins the
    * exact value and expects `true` (same bounded-gate pattern as
    * `text_vocab_approx`). The exact twin costs a second pass over the
    * tokens — gate-spelling only; production keeps the sketch-only rollup.
    */
  def vocabHllRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val tokens = Tables.loadSpread(spark, sfDir, "documents")
      .select(col("lang"), col("source"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).alias("token"))
    val perSource = tokens
      .groupBy(col("lang"), col("source"))
      .agg(hll_sketch_agg(col("token")).alias("sk"))
    val rolled = perSource.groupBy(col("lang"))
      .agg(count(lit(1)).alias("n_sources"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).alias("est"))
    val exact = tokens.groupBy(col("lang"))
      .agg(countDistinct(col("token")).alias("vocab_exact"))
    rolled.join(exact, Seq("lang"))
      .select(col("lang"), col("n_sources"), col("vocab_exact"),
        (abs(col("est") - col("vocab_exact"))
          <= col("vocab_exact") * lit(0.05)).alias("rollup_within_5pct"))
      .orderBy("lang")
  }

  /** SELF-JOIN-SIZE / F2 ESTIMATION via an AMS count-sketch (the
    * Alon-Matias-Szegedy tug-of-war estimator in its bucketed
    * "fast-AMS" form) — the third sketch family beside CMS (point
    * frequency) and HLL (distinct count): it answers "how many rows
    * would `lineitem ⋈ lineitem ON l_partkey` produce?" from ONE
    * bounded-memory pass, the statistic a cost-based optimizer needs
    * BEFORE committing to a join strategy at 100 TB. Three independent
    * estimator rows of 8192 signed-sum counters (bucket and sign from
    * seeded xxhash64 — deterministic, no stored model); each row's
    * estimate is Σ_j c_j² (expected value F2 = Σ_k cnt(k)², relative
    * std ≈ √(2/w) ≈ 1.6%), and the registered value is the MEDIAN of
    * the three. Every quantity is an exact integer; like the other
    * sketch gates the verified output carries the exact F2 plus a
    * boolean pinning the estimate within 10% (the oracle expects TRUE),
    * so a hash or width change surfaces as a CORRECTNESS diff.
    *
    * GATE SEMANTICS (deliberate, shared with `text_vocab_hll_rollup`'s
    * 5% bound): the boolean is a DETERMINISTIC function of (data,
    * seeds, width) — re-runs on the same fixture can never flip it —
    * but it is a probabilistic guarantee over DATASETS: on a NEW corpus
    * or scale factor a legitimate ~1.6%-relative-std estimator can land
    * outside 10% without any code defect. A red `ams_within_10pct` on
    * changed data therefore means "re-tune width/rows (or re-derive the
    * expected bound) for the new fixture", not "the sketch is broken";
    * only a flip on UNCHANGED data indicates a real regression. To
    * diagnose, compute the relative error directly: both `med` and
    * `exact_selfjoin_size` are exposed one `select` above the boolean.
    *
    * Scale shape: the sketch is a map-side-mergeable aggregation onto a
    * FIXED 3×8192 counter grid — the shuffle moves ≤ 24k rows no matter
    * the corpus size; the exact twin (groupBy key) is gate-spelling
    * only. The median is computed arithmetically over the 3-row frame
    * (sum − max − min), and exact/estimate meet in one conditional
    * aggregate over a 4-row union — no cross join, no collect.
    */
  def selfJoinSizeAms(spark: SparkSession, sfDir: String): DataFrame = {
    val W = 8192
    val keyed = Tables.lineitem(spark, sfDir).select(col("l_partkey"))
    // three independent estimator passes unioned, NOT an explode into
    // (r, b, sgn) triples: the generator spelling tripled every tuple
    // through the aggregate's hash-lookup path and measured ~3× slower
    // at sf0.1; this shape keeps each pass a plain codegen'd
    // scan→partial-agg over the original rows (the scan re-read is a
    // single int column), and each partial agg collapses to ≤ w rows
    // map-side before its bounded shuffle
    val ests = (0 until 3).map { i =>
      keyed
        .select(
          pmod(xxhash64(lit(i), col("l_partkey")), lit(W)).alias("b"),
          (pmod(xxhash64(lit(i + 100), col("l_partkey")), lit(2)) * 2 - 1)
            .alias("sgn"))
        .groupBy(col("b")).agg(sum(col("sgn")).alias("c"))
        .agg(sum(col("c") * col("c")).alias("v"))
        .select(lit(i).alias("r"), col("v"))
    }.reduce(_ unionAll _)
    val exact = keyed.groupBy(col("l_partkey")).agg(count(lit(1)).alias("n"))
      .agg(sum(col("n") * col("n")).alias("v"))
      .select(lit(-1).alias("r"), col("v"))
    ests.select(col("r"), col("v")).union(exact)
      .agg(
        max(when(col("r") === -1, col("v"))).alias("exact_selfjoin_size"),
        (sum(when(col("r") >= 0, col("v")))
          - max(when(col("r") >= 0, col("v")))
          - min(when(col("r") >= 0, col("v")))).alias("med"))
      .select(col("exact_selfjoin_size"),
        (abs(col("med") - col("exact_selfjoin_size"))
          <= col("exact_selfjoin_size").cast("double") * lit(0.1))
          .alias("ams_within_10pct"))
  }

  val oracles: Map[String, String] = Map(
    "lineitem_selfjoin_size_ams" ->
      """SELECT CAST(sum(n * n) AS BIGINT) AS exact_selfjoin_size,
        |       TRUE AS ams_within_10pct
        |FROM (SELECT CAST(count(*) AS BIGINT) AS n
        |      FROM lineitem GROUP BY l_partkey)""".stripMargin,
    "heavy_hitter_parts" ->
      """WITH c AS (
        |  SELECT l_partkey AS part_key, CAST(count(*) AS BIGINT) AS n
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT 1.5 * avg(n) AS thr FROM c)
        |SELECT part_key, n FROM c, t WHERE n >= thr
        |ORDER BY part_key""".stripMargin,
    "text_vocab_hll_rollup" ->
      """SELECT lang,
        |       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |       CAST(count(DISTINCT token) AS BIGINT) AS vocab_exact,
        |       TRUE AS rollup_within_5pct
        |FROM (SELECT lang, source, unnest(string_split(text, ' ')) AS token
        |      FROM documents)
        |GROUP BY lang ORDER BY lang""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "heavy_hitter_parts"    -> heavyHitterParts _,
    "text_vocab_hll_rollup" -> vocabHllRollup _,
    "lineitem_selfjoin_size_ams" -> selfJoinSizeAms _,
  )
}
