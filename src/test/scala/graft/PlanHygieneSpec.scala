package graft

/** One safety net over the WHOLE query registry: physical-plan smells
  * that would silently regress the 100 TB posture fail here, naming the
  * query, before any bench run has to notice.
  */
class PlanHygieneSpec extends SparkSpec {

  // Both checks share one plan materialization per query: a few registry
  // entries (dedup_clusters, heavy_hitter_parts, bloom_pruned_order_items)
  // run eager driver jobs at construction time, so every extra
  // fn(spark, sf) call re-executes them. Known limitation: those eager
  // internal jobs' plans are not inspected here — only the returned
  // frame's plan is; their shapes are pinned by their own module specs.
  private lazy val executedPlans: Map[String, String] =
    SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf).queryExecution.executedPlan.toString
    }

  test("no registered query plans a cartesian product") {
    for ((name, plan) <- executedPlans) {
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n${plan.take(800)}")
    }
  }

  test("broadcast nested-loop joins appear only where a broadcast was asked for") {
    // BNLJ is legitimate ONLY where a broadcast scan of every pair is
    // the algorithm: the range-join band dim, IVF centroid assignment,
    // and the brute-force kNN baseline (score all |Q|·N pairs by
    // design); anywhere else it means an equi-key was lost and the
    // join degenerated
    // ...plus the exhaustive near-dup baseline, whose scale path is the
    // LSH-bucketed twin
    // ...and the single-row broadcast totals of ratio-to-report /
    // division (broadcasting one aggregate row IS the scale-correct
    // alternative to an unpartitioned window)
    // ...and deliberate dims-only cross products: the region×priority
    // dense matrix (5×5 dimension rows) and TF-IDF's single-row corpus
    // size riding a broadcast
    // ...and the DAU/WAU rolling-distinct range join (day spine × user-days
    // on a 7-day interval — bounded fan-out by construction, no equi key
    // exists for a moving window)
    // ...and the temperature mix's single-row corpus totals (same
    // broadcast-one-aggregate-row shape as ratio-to-report)
    // ...and the k-means step, which shares IVF's broadcast N·C centroid
    // assignment
    // ...and the ANN recall report, which embeds the exhaustive near-dup
    // baseline by definition (recall is measured AGAINST it)
    // ...and the SQ8 recall report, which embeds the brute-force baseline
    // AND scores its own |Q|·N int8 pairs by design
    // ...and the equi-depth histogram's single-row corpus total (the same
    // broadcast-one-aggregate-row shape as ratio-to-report)
    val allowed = Set("range_join_price_band", "ivf_ann_cosine",
      "kmeans_lloyd_step", "knn_brute_cosine", "embedding_near_dup",
      "revenue_share_by_flag", "customers_all_years",
      // ...surprisal shares TF-IDF's single-row corpus-size broadcast
      "region_priority_matrix", "text_tfidf_top_terms", "text_surprisal_quality",
      // BM25 rides two single-row aggregates (corpus token total + doc
      // count) on broadcasts — the same TF-IDF/ratio-to-report shape;
      // the stored-table twin runs the identical probe plan over the
      // materialized token cache
      "bm25_top_docs", "bm25_stored_top_docs",
      "events_dau_wau", "docs_temperature_mix", "ann_recall_report",
      // funnel + source report read the flag frame, which embeds the
      // semantic-decon rung's deliberate IVF cell-assignment broadcast
      "ivf_recall_at_5", "ivf_ann_nprobe2", "curation_funnel_report",
      "curation_source_report",
      "sq8_recall_at_5", "order_price_equidepth",
      // triangle census: three single-row aggregates composed on one-row
      // broadcasts (funnel-report shape)
      "copurchase_triangles",
      // hierarchy shares and pareto: grand totals ride one-row broadcasts
      // (ratio-to-report shape)
      "revenue_share_hierarchy", "brand_revenue_pareto",
      // PQ recall embeds the brute-force baseline it is measured against
      // (both the subsample and the Lloyd-refined codebook rung, and the
      // IVFADC composition over them)
      // ...the serving-stack re-rank composes the same IVF-PQ index
      // (deliberate N·C assignment) and is measured against the same
      // embedded brute baseline
      "pq_adc_recall_at_5", "pq_recall_refined", "ivfpq_recall_at_5",
      // ...the maintained-index gate trains and assigns with the same
      // deliberate N·C / N·m·k broadcasts and embeds the brute baseline
      "ivfpq_rerank_recall_at_5", "ivfpq_maintained_recall_at_5",
      // semantic dedup reads the IVF cell assignment, which shares the
      // deliberate broadcast N·C centroid scoring of ivf_ann_cosine
      "semantic_dedup",
      // refined-centroid IVF runs the same deliberate N·C assignment per
      // Lloyd round; the multiprobe recall report embeds the brute baseline
      "ivf_recall_refined", "lsh_multiprobe_recall_at_5",
      // centroid matrix: all-pairs inequality join over the bounded
      // (≤ label-count) centroid table — report shape, deliberate
      "label_centroid_matrix",
      // semantic decon reads the IVF cell assignment (deliberate N·C
      // broadcast scoring, as semantic_dedup); the pipeline embeds it
      // through its semantic contamination branch
      "docs_decontaminate_semantic", "docs_curation_pipeline",
      // MRL truncation recall scores its own |Q|·N truncated pairs by
      // design AND embeds the brute baseline it is measured against;
      // the re-rank rung runs the same stage-1 truncated scan
      "mrl_truncation_recall_at_5", "mrl_rerank_recall_at_5",
      // hybrid fusion: the lexical arm rides BM25's two single-row
      // broadcasts; the semantic arm deliberately scores all |Q|·N pairs
      // (the brute baseline shape — the 100 TB arm is the IVF-PQ ladder)
      "hybrid_rrf_top_docs",
      // ...and the index-backed twin embeds the IVF-PQ index itself
      // (deliberate N·C assignment broadcasts, as ivfpq_recall_at_5)
      "hybrid_rrf_ivf_top_docs",
      // the filtered hybrid rides the same index broadcasts; its sem
      // arm is the registered filtered serving plan at fusion depth
      "hybrid_rrf_filtered_top_docs",
      // the ANN erasure gate embeds the brute survivor baseline it is
      // measured against (|Q|·N by definition) — serving itself reads
      // the stored erased index through equi-joins
      "ann_forget_vectors",
      // the drift report IS the N·C frozen-centroid assignment pass run
      // as a diagnostic (min-d2 per vector — ivf_ann_cosine's deliberate
      // broadcast scoring shape, paid as a byproduct of assignment in a
      // deployment)
      "ann_drift_report",
      // the filtered-ANN gate embeds the brute top-5 over predicate
      // survivors it is measured against (|Q|·N by definition) and the
      // IVF-PQ index's deliberate broadcasts; the served path itself is
      // equi-joins + a broadcast candidate list
      "ann_filtered_recall_at_5",
      // the pre-filter rungs read the same deliberate N·C cell
      // assignment (nprobe=2 also scores the 10-query probe block
      // against the centroid table) and embed the same filtered brute
      // baseline
      "ann_prefiltered_recall_at_5", "ann_prefiltered_nprobe2_recall_at_5",
      // the sharp-predicate crossover pair: same two serving plans with
      // the selectivity-0.1 keep rule — same deliberate index broadcasts,
      // same embedded filtered-brute baseline
      "ann_filtered_sharp_recall_at_5", "ann_prefiltered_sharp_recall_at_5",
      // ...and the sharp nprobe=2 recovery rung (same probe-block and
      // filtered-brute shapes as its mild twin)
      "ann_prefiltered_sharp_nprobe2_recall_at_5",
      // the retrain gate trains (N·C Lloyd assignment per round, twice:
      // frozen + retrained), serves via the same assignment, and embeds
      // the brute baseline over the planted corpus — all deliberate
      "ann_retrain_recall",
      // the as-of stored BM25 serves the identical probe plan as
      // bm25_stored_top_docs (two single-row aggregate broadcasts)
      "bm25_stored_asof")
    for ((name, plan) <- executedPlans if !allowed(name)) {
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name unexpectedly plans a BroadcastNestedLoopJoin:\n${plan.take(800)}")
    }
  }

  test("no registered query plans a Scala UDF — sketch probes included") {
    // every scalar in the registry is a built-in or a codegen'd Catalyst
    // expression (BloomProbe, CmsAtLeast, MinHash16, SimHash60...); a
    // ScalaUDF node means a hot path dropped out of whole-stage codegen
    for ((name, plan) <- executedPlans) {
      assert(!plan.contains("UDF"),
        s"$name plans a UDF:\n${plan.take(800)}")
    }
  }

  test("per-source curation report rides the cached flag frame — no corpus join of its own") {
    // `source` is carried IN the flag frame (one corpus join, at build),
    // so the report must plan as a pure aggregate over the cached frame:
    // any Join node or fresh documents scan means the second corpus-wide
    // join this rewrite deleted has crept back
    val plan = SparkEntry.queries("curation_source_report")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
      s"report does not read the cached flag frame:\n${plan.take(800)}")
    // the plan string inlines the CACHED frame's build plan under its
    // InMemoryRelation (which legitimately holds the one corpus join);
    // the report's OWN operators are everything above that marker
    val own = plan.linesIterator
      .takeWhile(!_.contains("InMemoryRelation")).mkString("\n")
    assert(own.contains("InMemoryTableScan"), own.take(800))
    assert(!own.contains("documents.parquet"),
      s"report re-scans the corpus:\n${own.take(800)}")
    assert(!own.contains("Join"),
      s"report plans a join of its own:\n${own.take(800)}")
  }

  test("star-schema scans prune to the referenced columns") {
    // the flagship fact query must not drag unused lineitem columns
    // through the join (ReadSchema is the pushed projection)
    val plan = SparkEntry.queries("fact_sales_detail")(spark, sf)
      .queryExecution.executedPlan.toString
    val lineitemScan = plan.linesIterator
      .find(l => l.contains("lineitem.parquet") && l.contains("ReadSchema"))
    assert(lineitemScan.isDefined)
    assert(!lineitemScan.get.contains("l_comment") &&
      !lineitemScan.get.contains("l_shipinstruct"))
  }
}
