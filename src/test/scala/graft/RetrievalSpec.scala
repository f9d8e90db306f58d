package graft

import org.apache.spark.sql.functions._

import graft.operators.{Retrieval, TextAnalysis}
import graft.functions.{VectorFunctions => V}

class RetrievalSpec extends SparkSpec {

  test("rrfFuse: planted lists fuse by quantized reciprocal rank, missing arm = 0") {
    import spark.implicits._
    // q1: lexical serves A(1), B(2); semantic serves B(1), C(2).
    val lex = Seq((1, 100L, 1), (1, 200L, 2))
      .toDF("query_id", "doc_id", "rank")
    val sem = Seq((1, 200L, 1), (1, 300L, 2))
      .toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(lex, sem)
      .select(col("doc_id"), col("lex_rank"), col("sem_rank"), col("rrf_m"), col("rank"))
      .collect()
    val r61 = 1000000000L / 61 // = Q div (60 + 1), exact integer division
    val r62 = 1000000000L / 62
    // B hits both arms and must outrank either single-arm doc; ordering
    // then B(both), A(lex 1), C(sem 2)
    assert(got.map(_.getLong(0)).toSeq == Seq(200L, 100L, 300L),
      s"wrong fusion order: ${got.mkString(", ")}")
    assert(got.map(_.getLong(3)).toSeq == Seq(r62 + r61, r61, r62))
    // the single-arm docs carry a NULL rank for the arm that missed them
    assert(got(1).isNullAt(2) && got(2).isNullAt(1))
    assert(got.map(_.getInt(4)).toSeq == Seq(1, 2, 3))
  }

  test("rrfFuse: equal fused scores break ties by doc_id ascending") {
    import spark.implicits._
    val lex = Seq((2, 900L, 1)).toDF("query_id", "doc_id", "rank")
    val sem = Seq((2, 50L, 1)).toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(lex, sem).select(col("doc_id")).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(50L, 900L))
  }

  test("cosineRanked: planted vectors rank self, orthogonal, opposite") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Seq(1000L, 0L, 0L, 0L)),
      (2L, Seq(0L, 1000L, 0L, 0L)),
      (3L, Seq(-1000L, 0L, 0L, 0L)))
      .toDF("vec_id", "v")
      .withColumn("n2", V.qnorm2(col("v")))
    val queryVecs = corpus.filter(col("vec_id") === 1L)
      .select(col("vec_id").cast("int").alias("query_id"),
        col("v").alias("qv"), col("n2").alias("qn2"))
    val got = Retrieval.cosineRanked(corpus, queryVecs, depth = 3)
      .select(col("doc_id"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq.sortBy(_._2)
    assert(got == Seq((1L, 1), (2L, 2), (3L, 3)), s"got $got")
  }

  test("hybrid_rrf_top_docs: per-query top-5, scores recompute from arm ranks") {
    val rows = q("hybrid_rrf_top_docs").collect()
    assert(rows.nonEmpty)
    val byQuery = rows.groupBy(_.getInt(0))
    assert(byQuery.keySet == TextAnalysis.Bm25Queries.map(_._1).toSet)
    for ((qid, rs) <- byQuery) {
      assert(rs.map(_.getInt(5)).toSeq.sorted == (1 to 5).toSeq,
        s"query $qid must serve exactly ranks 1..5")
      for (r <- rs) {
        val lexTerm = if (r.isNullAt(2)) 0L else 1000000000L / (60L + r.getInt(2))
        val semTerm = if (r.isNullAt(3)) 0L else 1000000000L / (60L + r.getInt(3))
        assert(r.getLong(4) == lexTerm + semTerm,
          s"rrf_m must be the sum of the quantized reciprocal terms: $r")
      }
    }
  }

  test("the arm-depth rank filters plan as WindowGroupLimit, not full sorts") {
    // the scaladoc's scale claim: `filter(rank <= depth)` adjacent to the
    // row_number window lets Spark keep per-partition state at depth rows
    // instead of sorting every hit/candidate — pin it so a refactor that
    // separates filter from window (losing the rewrite) fails here
    val plan = q("hybrid_rrf_top_docs").queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank-depth filters no longer plan as WindowGroupLimit:\n${plan.take(900)}")
  }

  test("index-backed hybrid: sem arm top-5 IS the registered serving stack's" +
      " top-5, and fused scores recompute from the arm ranks") {
    import graft.operators.Similarity
    val rows = q("hybrid_rrf_ivf_top_docs").collect()
    assert(rows.nonEmpty)
    // sem ranks ≤ 5 must agree pair-for-pair with ivfpqRerankTop5 (the
    // frame the ivfpq_rerank_recall_at_5 gate certifies)
    val served = Similarity.ivfpqRerankTop5(spark, sf).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1))).toSet
    val semTop5 = rows.filter(r => !r.isNullAt(3) && r.getInt(3) <= 5)
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(semTop5.nonEmpty, "fixture should surface index top-5 docs in the fusion")
    // EVERY query must carry a live semantic arm — a query id outside the
    // index's query domain would lose it silently on both engines
    val semQueries = rows.filter(!_.isNullAt(3)).map(_.getInt(0)).toSet
    assert(semQueries == TextAnalysis.Bm25Queries.map(_._1).toSet,
      s"queries missing their semantic arm: " +
        s"${TextAnalysis.Bm25Queries.map(_._1).toSet -- semQueries}")
    semTop5.foreach { p =>
      assert(served(p), s"hybrid sem arm served a pair the index stack does not: $p")
    }
    for (r <- rows) {
      val lexTerm = if (r.isNullAt(2)) 0L else 1000000000L / (60L + r.getInt(2))
      val semTerm = if (r.isNullAt(3)) 0L else 1000000000L / (60L + r.getInt(3))
      assert(r.getLong(4) == lexTerm + semTerm)
    }
  }

  test("phrase matching: adjacent counts, scattered/reversed do not," +
      " repeated-word runs count overlapping occurrences") {
    import spark.implicits._
    // the planted adjacent-vs-scattered fixture driving the FACTORED
    // production body (phraseTopDocsOf), not an inline re-spelling:
    //  doc 1: one exact occurrence
    //  doc 2: both words present but scattered — no occurrence
    //  doc 3: two exact occurrences (outranks doc 1)
    //  doc 4: reversed order — no occurrence
    //  doc 5: a 4-token run of 'z' vs the 2-token phrase 'z z' —
    //         THREE overlapping occurrences (starts 0, 1, 2)
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha gamma beta alpha"),
      (3L, "alpha beta x alpha beta"),
      (4L, "beta alpha"),
      (5L, "z z z z")).toDF("doc_id", "text")
    val phrases = Seq((1, "alpha beta"), (2, "z z")).toDF("query_id", "p_text")
    val got = TextAnalysis.phraseTopDocsOf(docs, phrases)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1, 3L, 1, 2L), (1, 1L, 2, 1L),
      (2, 5L, 1, 3L)), s"got: ${got.mkString(",")}")
    // the registered query is non-degenerate: every phrase finds docs
    val reg = q("phrase_top_docs").collect()
    assert(TextAnalysis.PhraseQueries.map(_._1).toSet ==
      reg.map(_.getInt(0)).toSet, "a registered phrase matched no document")
  }

  test("proximity matching: order-free within the window, spread terms miss," +
      " denser co-occurrence outranks") {
    import spark.implicits._
    // doc 1: both terms adjacent but REVERSED — proximity hits where the
    //        phrase query would miss (one anchored window: 'beta' at 0
    //        covers both; 'alpha' at 1 sees no later 'beta')
    // doc 2: terms 8 tokens apart — outside the W=8 anchored window
    // doc 3: dense co-occurrence — three covering anchors, outranks doc 1
    // doc 4: only one of the terms — never covered
    val docs = Seq(
      (1L, "beta alpha filler filler filler filler filler filler filler"),
      (2L, "alpha x1 x2 x3 x4 x5 x6 x7 beta"),
      (3L, "alpha beta alpha beta filler"),
      (4L, "alpha alpha alpha")).toDF("doc_id", "text")
    val queries = Seq((1, "alpha beta")).toDF("query_id", "p_text")
    val got = TextAnalysis.proximityTopDocsOf(docs, queries, win = 8)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    // doc 3 anchors: pos 0 (a) covers, pos 1 (b) covers via alpha@2,
    // pos 2 (a) covers via beta@3, pos 3 (b) sees no later alpha → 3
    assert(got.toSeq == Seq((1, 3L, 1, 3L), (1, 1L, 2, 1L)),
      s"got: ${got.mkString(",")}")
    // the registered query is non-degenerate: every proximity query
    // finds documents (incl. the reversed-phrase query)
    val reg = q("proximity_top_docs").collect()
    assert(TextAnalysis.ProximityQueries.map(_._1).toSet ==
      reg.map(_.getInt(0)).toSet, "a registered proximity query matched nothing")
  }

  test("filtered hybrid: no served doc violates the predicate; the sem" +
      " arm's top-5 IS the registered filtered serving rung") {
    import graft.operators.Similarity
    val fused = q("hybrid_rrf_filtered_top_docs").collect()
    assert(fused.length == TextAnalysis.Bm25Queries.size * 5)
    // the predicate contract: every served document is a survivor —
    // whichever arm surfaced it
    val labelOf = Tables.embeddings(spark, sf).select("vec_id", "label")
      .collect()
      .map(r => r.getAs[Number](0).longValue -> r.getAs[Number](1).longValue)
      .toMap
    fused.foreach { r =>
      val doc = r.getLong(1)
      assert(labelOf.get(doc).exists(_ % 2 == 0),
        s"filtered hybrid served non-survivor doc $doc (label ${labelOf.get(doc)})")
    }
    // arm agreement: the sem arm's rank ≤ 5 slice equals the registered
    // ann_filtered_recall_at_5 serving plan's pair set (same over-fetch,
    // same predicate, same re-rank — only the depth differs, and a
    // depth-20 list's top-5 prefix is the depth-5 list)
    val semTop5 = fused
      .filter(r => !r.isNullAt(3) && r.getInt(3) <= 5)
      .map(r => (r.getInt(0).toLong, r.getLong(1))).toSet
    val rung = Similarity.ivfpqFilteredTop5(spark, sf, Similarity.FilteredOverfetch)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the fused report only carries sem ranks for docs that survive to
    // the fused top-5, so agreement is containment of the visible slice
    assert(semTop5.nonEmpty, "fixture surfaced no sem-arm top-5 docs in the fusion")
    semTop5.foreach { pair =>
      assert(rung.contains(pair),
        s"fused sem arm served $pair outside the registered filtered rung")
    }
  }

  test("hybrid lexical arm agrees with the registered bm25_top_docs ranking") {
    val hybrid = q("hybrid_rrf_top_docs").collect()
      .filter(r => !r.isNullAt(2) && r.getInt(2) <= 5)
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getInt(2)).toMap
    val bm25 = q("bm25_top_docs").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(hybrid.nonEmpty, "fixture should surface lexical top-5 docs in the fusion")
    for ((key, lexRank) <- hybrid)
      assert(bm25.get(key).contains(lexRank),
        s"hybrid lex_rank disagrees with bm25_top_docs at $key: " +
          s"hybrid=$lexRank bm25=${bm25.get(key)}")
  }
}
