package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{VectorFunctions => V}

/** HYBRID RETRIEVAL — reciprocal-rank fusion (RRF) of a lexical BM25 arm
  * and a semantic embedding-cosine arm, the two-tower serving shape every
  * production retrieval stack runs (lexical recall for exact terms,
  * embedding recall for paraphrase) and the composition the registry's
  * two retrieval tiers ([[TextAnalysis.bm25TopDocs]],
  * [[Similarity.knnBrute]]) individually stop short of. No reference
  * analog (north-star tier — the reference is a star-schema ETL).
  *
  * Semantics: each arm independently ranks documents to depth
  * [[ArmDepth]]; a document's fused score is Σ over arms of
  * 1/(k + rank) with k = [[RrfK]] = 60 (the constant from the original
  * RRF paper, Cormack et al. SIGIR'09), missing-arm contributions are 0;
  * the top 5 by fused score are served. Query encoding is an INPUT: a
  * production run supplies (q_text, q_vec) pairs from its query encoder —
  * the fixture derives q_vec as the stored embedding whose vec_id equals
  * the query id (the `vec_id ≡ doc_id` fixture convention, see
  * [[Curation]]), which stands in for the encoder deterministically.
  *
  * Exactness discipline (the `lineitem_corr` / BM25 precedent): the
  * reciprocal term is quantized to integer billionths BEFORE the
  * cross-arm sum — `Q div (k + rank)` with Q = 10⁹ is exact integer
  * division on both engines, so fused scores are longs and summation
  * order cannot drift them. Arm ranks themselves are integer
  * row_numbers over deterministic orderings (exact-long BM25 millionths;
  * the exactly-rounded quantized cosine), ties broken by doc_id.
  *
  * Scale shape: the lexical arm rides the session (doc, term)
  * term-frequency frame (one tokenize-once shuffle, broadcast query-term
  * probe — [[TextAnalysis.bm25Ranked]]); the semantic arm rides the
  * session-persisted quantized embeddings and scores |Q|·N pairs via a
  * broadcast of the query vectors (the brute baseline shape — at 100 TB
  * this arm swaps to the IVF-PQ candidate path, [[Similarity]]'s ladder,
  * with the SAME fusion downstream); the fusion itself joins two
  * ≤ |Q|·depth row lists — metadata-sized at any corpus scale.
  */
object Retrieval {

  /** Per-arm list depth fed into fusion (deeper than either arm serves
    * alone — RRF's value is rescuing docs ranked moderately by both arms).
    */
  private[operators] val ArmDepth = 20

  /** The RRF smoothing constant (60, per the original paper). */
  private[operators] val RrfK = 60

  /** Reciprocal terms are pinned to integer billionths: Q div (k+rank). */
  private[operators] val RrfQ = 1000000000L

  /** One fused arm contribution: Q div (k + rank), 0 when the arm missed
    * the document (NULL rank).
    */
  private def rrfTerm(rank: Column): Column =
    coalesce((lit(RrfQ) / (lit(RrfK) + rank.cast("long"))).cast("long"), lit(0L))

  /** RRF fusion of two ranked arms over any (query_id, doc_id, rank)
    * pair of frames — the spec drives this directly with planted lists.
    * Full-outer on (query_id, doc_id): a document surfaced by one arm
    * only still competes, with the other arm contributing 0.
    */
  private[graft] def rrfFuse(lex: DataFrame, sem: DataFrame): DataFrame = {
    val fused = lex.select(col("query_id"), col("doc_id"), col("rank").alias("lex_rank"))
      .join(sem.select(col("query_id"), col("doc_id"), col("rank").alias("sem_rank")),
        Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_m", rrfTerm(col("lex_rank")) + rrfTerm(col("sem_rank")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_m").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("doc_id"), col("lex_rank"), col("sem_rank"),
        col("rrf_m"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** The semantic arm: cosine rank of every corpus vector against each
    * broadcast query vector, to `depth`. Self-inclusion is deliberate:
    * queries are NOT corpus members semantically (the id-aligned fixture
    * vector stands in for a query encoder), so no pair is excluded.
    */
  private[graft] def cosineRanked(corpus: DataFrame, queryVecs: DataFrame,
      depth: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queryVecs))
      .select(col("query_id"), col("vec_id").alias("doc_id"),
        V.qcosineFrom(V.qdot(col("qv"), col("v")), col("qn2"), col("n2"))
          .alias("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= depth)
  }

  /** The shared lexical arm — ONE spelling for both hybrids (an edit to
    * depth or the corpus-count source must move them together).
    */
  private def lexArm(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    TextAnalysis.bm25Ranked(
      TextAnalysis.termFreqs(spark, sfDir),
      Tables.documents(spark, sfDir).agg(count(lit(1)).alias("n_docs")),
      TextAnalysis.Bm25Queries.toDF("query_id", "q_text"), ArmDepth)
  }

  def hybridRrfTopDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val lex = lexArm(spark, sfDir)
    val corpus = Similarity.quantized(spark, sfDir)
    // select by the ACTUAL query-id set, not a 1..n range: a non-contiguous
    // Bm25Queries edit must re-align the semantic arm, not silently drop it
    val queryVecs = corpus
      .filter(col("vec_id").isin(TextAnalysis.Bm25Queries.map(_._1.toLong): _*))
      .select(col("vec_id").cast("int").alias("query_id"),
        col("v").alias("qv"), col("n2").alias("qn2"))
    rrfFuse(lex, cosineRanked(corpus, queryVecs, ArmDepth))
  }

  private def queryIdListSql: String =
    TextAnalysis.Bm25Queries.map(_._1).mkString(", ")

  /** The fusion tail as DuckDB SQL — full-outer join of `lex`
    * (query_id, doc_id, lex_rank) and `sem` (query_id, doc_id, sem_rank),
    * quantized reciprocal-rank sum, top-5 cut. ONE spelling shared by
    * both hybrid oracles: only the sem arm may differ between them, never
    * the fusion rule. Twin of [[rrfFuse]].
    */
  private def fusionTailSql: String =
    s"""fused AS (
       |  SELECT COALESCE(l.query_id, s.query_id) AS query_id,
       |         COALESCE(l.doc_id, s.doc_id) AS doc_id,
       |         l.lex_rank, s.sem_rank,
       |         CAST(COALESCE(CAST($RrfQ AS BIGINT) // ($RrfK + l.lex_rank), 0)
       |            + COALESCE(CAST($RrfQ AS BIGINT) // ($RrfK + s.sem_rank), 0)
       |           AS BIGINT) AS rrf_m
       |  FROM lex l FULL JOIN sem s
       |    ON l.query_id = s.query_id AND l.doc_id = s.doc_id),
       |rrf_ranked AS (
       |  SELECT query_id, doc_id, lex_rank, sem_rank, rrf_m,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |           ORDER BY rrf_m DESC, doc_id ASC) AS INT) AS rank
       |  FROM fused)
       |SELECT query_id, doc_id, lex_rank, sem_rank, rrf_m, rank
       |FROM rrf_ranked WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  /** The INDEX-BACKED hybrid — [[hybridRrfTopDocs]] with its scale-path
    * claim made a GATE FACT: the semantic arm is the production serving
    * stack ([[Similarity.ivfpqRerankRanked]] — IVF-probed PQ-ADC top-20
    * candidates, full-precision re-rank) instead of the brute |Q|·N scan,
    * with the IDENTICAL fusion downstream. At 100 TB this is the query
    * the stack actually serves: the index never stores full vectors, the
    * full vectors never ride a scan, the fusion joins two ≤ |Q|·depth
    * lists. Differences from the brute-arm twin are exactly the index's:
    * candidates come from probed cells only (recall < 1 by design — the
    * registered `ivfpq_rerank_recall_at_5` measures that loss) and the
    * query's own row is excluded (index serving convention). The oracle
    * replays index training + serving + fusion end-to-end in DuckDB.
    */
  def hybridRrfIvfTopDocs(spark: SparkSession, sfDir: String): DataFrame = {
    // the IVF stack serves the fixture query domain vec_id < 10 (probes,
    // LUT, and re-rank queries all filter on it, Spark AND oracle) — a
    // Bm25Queries id outside it would silently lose its semantic arm on
    // BOTH sides, invisibly to the gate. Fail loudly at plan build.
    require(TextAnalysis.Bm25Queries.forall(_._1 < 10),
      "hybrid_rrf_ivf_top_docs: every query id must lie in the IVF " +
        s"stack's query domain (vec_id < 10); got ${TextAnalysis.Bm25Queries.map(_._1)}")
    val lex = lexArm(spark, sfDir)
    val sem = Similarity.ivfpqRerankRanked(spark, sfDir, ArmDepth)
      .filter(col("query_id").isin(TextAnalysis.Bm25Queries.map(_._1.toLong): _*))
      .select(col("query_id").cast("int").alias("query_id"),
        col("neighbor_id").alias("doc_id"), col("rank"))
    rrfFuse(lex, sem)
  }

  /** HYBRID RETRIEVAL WITH A METADATA FILTER (r18 verdict #6) — the r18
    * filtered-ANN machinery composed into the fusion tier: both arms
    * honor the SAME predicate over the shared id space (the fixture's
    * `vec_id ≡ doc_id` convention puts the label metadata in one place
    * — [[Similarity.annFilterPred]], the mild selectivity-0.5 tenant).
    * The lexical arm treats the survivors as its corpus — the tf frame
    * is id-semi-joined to the survivor set BEFORE any statistic, so
    * df/dl/token totals and `n_docs` are all survivor-corpus values
    * (what a filtered query means, the filtered-brute-baseline
    * philosophy); the semantic arm is the REGISTERED filtered serving
    * path ([[Similarity.ivfpqFilteredRanked]] — ADC over-fetch,
    * key-side predicate decimation, exact re-rank) at the fusion
    * depth; the fusion rule is [[rrfFuse]] unchanged. The oracle
    * replays filtered BM25 (the parameterized CTE over the survivor
    * window) + the filtered index chain (shared CTEs) through the
    * shared fusion tail; RetrievalSpec pins the semantic arm's top-5
    * agreement with the registered `ann_filtered_recall_at_5` rung and
    * that no served document violates the predicate.
    *
    * Scale shape: the survivor semi-join is an id-keyed equi-join
    * (never a corpus scan), the index stays metadata-free, and the
    * fusion still joins two ≤ |Q|·depth lists.
    */
  def hybridRrfFilteredTopDocs(spark: SparkSession, sfDir: String): DataFrame = {
    require(TextAnalysis.Bm25Queries.forall(_._1 < 10),
      "hybrid_rrf_filtered_top_docs: every query id must lie in the IVF " +
        s"stack's query domain (vec_id < 10); got ${TextAnalysis.Bm25Queries.map(_._1)}")
    val survivors = Similarity.quantized(spark, sfDir)
      .filter(Similarity.annFilterPred(col("label")))
      .select(col("vec_id"))
    val lex = TextAnalysis.bm25Ranked(
      TextAnalysis.termFreqs(spark, sfDir)
        .join(survivors.withColumnRenamed("vec_id", "doc_id"), Seq("doc_id")),
      // the survivor CORPUS count — documents ∩ survivors, not the raw
      // survivor-vector count, so a vector without a document can never
      // skew the lexical statistics
      Tables.documents(spark, sfDir).select(col("doc_id"))
        .join(survivors.withColumnRenamed("vec_id", "doc_id"), Seq("doc_id"))
        .agg(count(lit(1)).alias("n_docs")),
      {
        import spark.implicits._
        TextAnalysis.Bm25Queries.toDF("query_id", "q_text")
      },
      ArmDepth)
    val sem = Similarity.ivfpqFilteredRanked(spark, sfDir,
        Similarity.FilteredOverfetch, Similarity.annFilterPred, ArmDepth)
      .filter(col("query_id").isin(TextAnalysis.Bm25Queries.map(_._1.toLong): _*))
      .select(col("query_id").cast("int").alias("query_id"),
        col("neighbor_id").alias("doc_id"), col("rank"))
    rrfFuse(lex, sem)
  }

  val oracles: Map[String, String] = Map(
    "hybrid_rrf_top_docs" ->
      s"""WITH ${TextAnalysis.bm25RankedCte},
         |lex AS (SELECT query_id, doc_id, rank AS lex_rank
         |        FROM ranked WHERE rank <= $ArmDepth),
         |${Similarity.quantizedSql},
         |qv AS (
         |  SELECT CAST(vec_id AS INT) AS query_id, v AS qv, n2 AS qn2
         |  FROM qn WHERE vec_id IN ($queryIdListSql)),
         |sem_scored AS (
         |  SELECT qv.query_id, b.vec_id AS doc_id,
         |         CAST(row_number() OVER (PARTITION BY qv.query_id
         |           ORDER BY ${V.qdotSql("qv.qv", "b.v", 64)}
         |                      / (sqrt(qv.qn2) * sqrt(b.n2)) DESC,
         |                    b.vec_id ASC) AS INT) AS sem_rank
         |  FROM qn b CROSS JOIN qv),
         |sem AS (SELECT query_id, doc_id, sem_rank
         |        FROM sem_scored WHERE sem_rank <= $ArmDepth),
         |$fusionTailSql""".stripMargin,
    // the index-backed twin: the semantic arm is the full IVF-PQ serving
    // chain (shared CTEs — the index definition cannot drift from the
    // recall reports), re-ranked full-precision to the arm depth
    // both arms filtered: survivor-corpus BM25 (the parameterized CTE
    // over the doc ∩ survivor window) + the registered filtered index
    // chain at the arm depth, fused by the shared tail
    "hybrid_rrf_filtered_top_docs" -> {
      val survivorWindow =
        "documents d JOIN embeddings e ON e.vec_id = d.doc_id " +
          "WHERE e.label % 2 = 0"
      s"""WITH ${TextAnalysis.bm25RankedCteOver(
             docsFrom = s"(SELECT d.doc_id, d.text FROM $survivorWindow) fd",
             ndSql = "SELECT CAST(count(*) AS BIGINT) AS n_docs " +
               s"FROM $survivorWindow")},
         |lex AS (SELECT query_id, doc_id, rank AS lex_rank
         |        FROM ranked WHERE rank <= $ArmDepth),
         |${Similarity.quantizedSql},
         |${Similarity.cellsSql},
         |${Similarity.ivfpqAdcCte},
         |${Similarity.filteredServedCtes(Similarity.AnnFilterKeepSql,
             depth = ArmDepth, name = "fserved")},
         |sem AS (
         |  SELECT CAST(query_id AS INT) AS query_id, neighbor_id AS doc_id,
         |         rank AS sem_rank
         |  FROM fserved WHERE query_id IN ($queryIdListSql)),
         |$fusionTailSql""".stripMargin
    },
    "hybrid_rrf_ivf_top_docs" ->
      s"""WITH ${TextAnalysis.bm25RankedCte},
         |lex AS (SELECT query_id, doc_id, rank AS lex_rank
         |        FROM ranked WHERE rank <= $ArmDepth),
         |${Similarity.quantizedSql},
         |${Similarity.cellsSql},
         |${Similarity.ivfpqAdcCte},
         |${Similarity.ivfpqRerankCte(ArmDepth)},
         |sem AS (
         |  SELECT CAST(query_id AS INT) AS query_id, neighbor_id AS doc_id,
         |         rank AS sem_rank
         |  FROM rr WHERE query_id IN ($queryIdListSql)),
         |$fusionTailSql""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "hybrid_rrf_top_docs" -> hybridRrfTopDocs _,
    "hybrid_rrf_ivf_top_docs" -> hybridRrfIvfTopDocs _,
    "hybrid_rrf_filtered_top_docs" -> hybridRrfFilteredTopDocs _,
  )
}
