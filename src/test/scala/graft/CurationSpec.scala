package graft

import org.apache.spark.sql.functions._

/** Semantic checks for the curation tier beyond the DuckDB oracle:
  * benchmark exclusion, metric-threshold consistency, redaction counts by
  * an independent spelling, temperature-mix target arithmetic, and the
  * per-customer threshold filter against a direct computation.
  */
class CurationSpec extends SparkSpec {

  test("docs_decontaminate never flags benchmark documents and bounds the ratio") {
    val benchIds = Tables.documents(spark, sf)
      .filter(col("source") === "src0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val out = q("docs_decontaminate").collect()
    assert(out.nonEmpty, "fixture plants cross-source near-dups of src0 docs")
    out.foreach { r =>
      assert(!benchIds.contains(r.getLong(0)), s"benchmark doc ${r.getLong(0)} flagged")
      val c = r.getDouble(3)
      assert(c >= 0.5 && c <= 1.0, s"contamination $c out of [0.5, 1]")
      assert(r.getLong(1) <= r.getInt(2).toLong, "overlap exceeds shingle count")
    }
  }

  test("text_repetition_quality: ratios bounded, keep flag consistent with metrics") {
    val rows = q("text_repetition_quality").collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (nTok, nDis, topN) = (r.getInt(1), r.getInt(2), r.getLong(3))
      val (dr, tf, db) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(nDis <= nTok && topN <= nTok)
      assert(dr > 0 && dr <= 1 && tf > 0 && tf <= 1 && db >= 0 && db < 1)
      assert(r.getBoolean(7) == (dr >= 0.15 && tf <= 0.15 && db <= 0.5),
        s"keep flag inconsistent at doc ${r.getLong(0)}")
    }
    // the synthetic corpus is not degenerate: both verdicts occur
    assert(rows.exists(_.getBoolean(7)) && rows.exists(!_.getBoolean(7)))
  }

  test("docs_denylist_redact hit counts match an independent token-filter spelling") {
    val out = q("docs_denylist_redact")
    val independent = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(filter(split(col("text"), " "),
          t => t === "customer" || t === "spark")).alias("expected"))
    val joined = out.join(independent, "doc_id")
      .filter(col("n_hits") =!= col("expected"))
    assert(joined.count() == 0)
    assert(out.agg(sum("n_hits")).head.getLong(0) > 0, "denylist never fires")
  }

  test("docs_temperature_mix: per-lang counts equal the integer target formula") {
    val langCounts = Tables.documents(spark, sf)
      .groupBy("lang").agg(count(lit(1)).alias("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val wSum = langCounts.values.map(n => math.floor(math.sqrt(n.toDouble)).toLong).sum
    val nTotal = langCounts.values.sum
    // cap at n_l: the operator can never emit more rows than the language
    // has (sample_rank <= target_l over n_l rows), and under α-flattening
    // a low-resource language's raw target CAN exceed its population
    val expected = langCounts.map { case (l, n) =>
      l -> math.min(
        (nTotal / 2) * math.floor(math.sqrt(n.toDouble)).toLong / wSum, n)
    }
    val got = q("docs_temperature_mix").groupBy("lang")
      .agg(count(lit(1)).alias("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected.filter(_._2 > 0), s"got $got expected $expected")
    // temperature flattening: the head language's sampled share shrinks
    val (headLang, headN) = langCounts.maxBy(_._2)
    assert(got(headLang).toDouble / got.values.sum <
      headN.toDouble / nTotal, "α=0.5 must shrink the head language's share")
  }

  test("docs_token_budget_mix: md5-prefix selection fills each language's char budget") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val budget = docs.groupBy(_._2).view
      .mapValues(ds => ds.map(_._3).sum * 30 / 100).toMap
    // reference spelling: per-lang md5 order, keep while chars_before < budget
    def md5(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val expected = docs.groupBy(_._2).flatMap { case (lang, ds) =>
      val ordered = ds.sortBy(d => md5(d._1.toString))
      val cum = ordered.scanLeft(0L)(_ + _._3)
      ordered.zip(cum).toSeq
        .collect { case (d, before) if before < budget(lang) => d._1 }
    }.toSet
    val got = q("docs_token_budget_mix").collect()
    assert(got.map(_.getLong(0)).toSet == expected,
      "sharded prefix-sum selection drifted from the per-lang window reference")
    // the budget is a floor: kept mass reaches it, and dropping the
    // boundary document would fall below it
    for ((lang, rows) <- got.groupBy(_.getString(1))) {
      val kept = rows.map(_.getLong(2)).sum
      val maxBefore = rows.map(r => r.getLong(3)).max
      assert(kept >= budget(lang), s"$lang kept $kept < budget ${budget(lang)}")
      assert(maxBefore < budget(lang), s"$lang kept a doc past the budget")
    }
  }

  test("source overlap matrix covers every source pair with bounded jaccard") {
    val rows = q("source_overlap_matrix").collect()
    val nSources = Tables.documents(spark, sf)
      .select("source").distinct().count().toInt
    // the synthetic corpus shares vocabulary across sources, so every
    // unordered pair intersects and the matrix is complete
    assert(rows.length == nSources * (nSources - 1) / 2,
      s"expected all pairs of $nSources sources, got ${rows.length}")
    rows.foreach { r =>
      val (common, na, nb, j) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(r.getString(0) < r.getString(1), "pair not canonically ordered")
      assert(common >= 1 && common <= math.min(na, nb))
      assert(j > 0.0 && j <= 1.0)
      assert(j == common.toDouble / (na + nb - common))
    }
  }

  test("docs_decontaminate_exact: no benchmark docs, hits bounded by shingle count") {
    val benchIds = Tables.documents(spark, sf)
      .filter(col("source") === "src0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val out = q("docs_decontaminate_exact").collect()
    assert(out.nonEmpty,
      "planted 0.99-jaccard near-dups of src0 docs must share a 13-token run")
    out.foreach { r =>
      assert(!benchIds.contains(r.getLong(0)), s"benchmark doc ${r.getLong(0)} flagged")
      assert(r.getLong(1) >= 1L)
    }
    // the exact-substring rule and the 50%-overlap rule flag overlapping
    // but not identical sets: every ratio-flagged doc (>=50% of ALL its
    // 3-gram shingles shared) necessarily shares some 13-token run in
    // this fixture's near-verbatim plants
    val ratioFlagged = q("docs_decontaminate").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val exactFlagged = out.map(_.getLong(0)).toSet
    assert(ratioFlagged.subsetOf(exactFlagged),
      s"ratio-flagged ${ratioFlagged -- exactFlagged} missing from exact rule")
  }

  test("curation pipeline equals the conjunction of its registered stages") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val survivors = ids(q("dedup_survivors"))
    val contamR = ids(q("docs_decontaminate"))
    val contamE = ids(q("docs_decontaminate_exact"))
    val contamS = ids(q("docs_decontaminate_semantic"))
    val keep = ids(q("text_repetition_quality").filter(col("keep")))
    val gateKeep = ids(q("docs_quality_gate").filter(col("keep")))
    val bench = ids(Tables.documents(spark, sf).filter(col("source") === "src0"))
    val expected =
      ((survivors intersect keep intersect gateKeep)
        -- contamR -- contamE -- contamS) -- bench
    val got = ids(q("docs_curation_pipeline"))
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
    // every stage bites on the fixture: the pipeline is strictly smaller
    // than any single stage's keep-set
    assert(got.size < survivors.size && got.size < keep.size)
  }

  test("flag frame's kept column equals pipeline membership per document") {
    // the funnel derives n_final from curationFlags.kept, the pipeline
    // from its anti/semi join chain — the two spellings of the same
    // conjunction must agree on every document, not just in count
    val keptIds = graft.operators.Curation.curationFlags(spark, sf)
      .filter(col("kept")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val pipelineIds = q("docs_curation_pipeline").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(keptIds == pipelineIds,
      s"missing=${pipelineIds -- keptIds} extra=${keptIds -- pipelineIds}")
  }

  test("source report rows sum to the funnel's corpus-wide counts") {
    val rows = q("curation_source_report").collect()
    val funnel = q("curation_funnel_report").head()
    def total(i: Int) = rows.map(_.getLong(i)).sum
    assert(total(1) == funnel.getAs[Long]("n_documents"))
    assert(total(2) == funnel.getAs[Long]("n_dedup_removed"))
    assert(total(6) == funnel.getAs[Long]("n_final"))
    assert(total(4) == funnel.getAs[Long]("n_quality_fail"))
    assert(total(5) == funnel.getAs[Long]("n_gate_fail"))
    // the benchmark source keeps nothing by construction
    val bench = rows.find(_.getString(0) == "src0")
    assert(bench.exists(_.getLong(6) == 0L))
  }

  test("funnel report counts agree with the registered stage queries") {
    val r = q("curation_funnel_report").collect()
    assert(r.length == 1)
    val row = r(0)
    def n(name: String) = row.getAs[Long](name)
    assert(n("n_documents") == Tables.documents(spark, sf).count())
    assert(n("n_dedup_removed") == n("n_documents") - q("dedup_survivors").count(),
      "n_dedup_removed must complement the survivors count")
    assert(n("n_contaminated_ratio") == q("docs_decontaminate").count())
    assert(n("n_contaminated_exact") == q("docs_decontaminate_exact").count())
    assert(n("n_contaminated_semantic") ==
      q("docs_decontaminate_semantic").count())
    assert(n("n_quality_fail") ==
      q("text_repetition_quality").filter(!col("keep")).count())
    assert(n("n_gate_fail") == q("docs_quality_gate").filter(!col("keep")).count())
    assert(n("n_final") == q("docs_curation_pipeline").count())
    // the funnel narrows: final <= total - benchmark
    assert(n("n_final") <= n("n_documents") - n("n_benchmark"))
    // the winnowing column (r19 verdict #6) counts exactly the distinct
    // endpoints of the registered overlap-pair gate — the funnel signal
    // and the dedup gate are the same fact, never two derivations
    val endpoints = q("winnowing_overlap_pairs").collect()
      .flatMap(p => Seq(p.getLong(0), p.getLong(1))).toSet
    assert(endpoints.nonEmpty, "fixture surfaced no winnow overlap docs")
    assert(n("n_winnow_overlap_docs") == endpoints.size.toLong)
    // and the flag frame flags exactly those documents
    val flagged = graft.operators.Curation.curationFlags(spark, sf)
      .filter(col("winnow_overlap")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(flagged == endpoints,
      s"missing=${endpoints -- flagged} extra=${flagged -- endpoints}")
  }

  test("docs_quality_gate: signals match source queries, score arithmetic exact") {
    val gate = q("docs_quality_gate").collect()
    assert(gate.length == 500)
    val rep = q("text_repetition_quality").select("doc_id", "keep", "n_tokens")
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getInt(2)))).toMap
    val rare = q("text_rare_bigram_ratio").select("doc_id", "n_bigrams", "n_rare")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val lang = q("text_langid_ngram").collect().map(r =>
      r.getLong(0) -> Seq(r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)).max).toMap
    gate.foreach { r =>
      val id = r.getLong(0)
      assert(r.getAs[Boolean]("rep_ok") == rep(id)._1, s"rep_ok at $id")
      assert(r.getAs[Boolean]("len_ok") == (rep(id)._2 >= 20), s"len_ok at $id")
      // absent rare-bigram evidence (doc too short for bigrams) passes
      val expRare = rare.get(id).forall { case (nb, nr) => nr * 20 <= nb }
      assert(r.getAs[Boolean]("rare_ok") == expRare, s"rare_ok at $id")
      assert(r.getAs[Boolean]("lang_ok") == (lang(id) >= 4), s"lang_ok at $id")
      val score = Seq("rep_ok", "len_ok", "rare_ok", "lang_ok")
        .count(c => r.getAs[Boolean](c))
      assert(r.getAs[Int]("quality_score") == score, s"score at $id")
      assert(r.getAs[Boolean]("keep") == (score >= 3), s"keep at $id")
    }
    // the gate bites in both directions on the fixture
    assert(gate.exists(_.getAs[Boolean]("keep"))
      && gate.exists(r => !r.getAs[Boolean]("keep")))
  }

  test("decontaminate broadcast cap derives from the session broadcast threshold") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val orig = spark.conf.get(key)
    try {
      spark.conf.set(key, "1048576") // 1 MB auto → 16 MB deliberate budget
      assert(graft.operators.Curation.maxBroadcastKeys(spark) == 16L * 1048576 / 32)
      spark.conf.set(key, "-1") // auto-broadcast disabled → conservative floor
      assert(graft.operators.Curation.maxBroadcastKeys(spark) == (256L << 20) / 16 / 32)
      spark.conf.set(key, "1g") // 16× would exceed the ceiling → clamped
      assert(graft.operators.Curation.maxBroadcastKeys(spark) == (256L << 20) / 32)
    } finally spark.conf.set(key, orig)
  }

  test("decontaminate emits identical rows through broadcast and shuffle guard branches") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val orig = spark.conf.get(key)
    val viaBroadcast = q("docs_decontaminate").collect().toSeq
    try {
      // 32-byte budget → cap of 16 keys, far below any real benchmark
      // shingle set — forces the shuffle branch of the guard
      spark.conf.set(key, "32")
      assert(graft.operators.Curation.maxBroadcastKeys(spark) == 16L)
      val viaShuffle = q("docs_decontaminate").collect().toSeq
      assert(viaShuffle == viaBroadcast,
        "guard branches must be plan-only: same rows either way")
    } finally spark.conf.set(key, orig)
  }

  test("docs_decontaminate_semantic: subset of exhaustive bench-adjacent set, no bench docs") {
    val benchIds = Tables.documents(spark, sf)
      .filter(col("source") === "src0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val flagged = q("docs_decontaminate_semantic").collect()
    assert(flagged.nonEmpty, "fixture has bench-adjacent embeddings at 0.4")
    flagged.foreach { r =>
      assert(!benchIds.contains(r.getLong(0)), s"bench doc ${r.getLong(0)} flagged")
      assert(r.getDouble(2) >= 0.4 && r.getDouble(2) <= 1.0000001,
        s"max_cos ${r.getDouble(2)} out of range")
    }
    // candidate soundness: the cell restriction only PRUNES — every
    // flagged doc is also in the EXHAUSTIVE bench-adjacent set, computed
    // driver-side from the raw embeddings
    val raw = Tables.loadSpread(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).toArray.map(x => math.round(x.toDouble * 1000.0)))
      .toMap
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum.toDouble
      dot / (math.sqrt(a.map(x => x * x).sum.toDouble)
        * math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    val exhaustive = raw.keySet.filterNot(benchIds).filter { id =>
      benchIds.exists(b => cos(raw(id), raw(b)) >= 0.4)
    }
    val got = flagged.map(_.getLong(0)).toSet
    assert(got.subsetOf(exhaustive),
      s"cell bucketing invented hits: ${got -- exhaustive}")
  }

  test("pii redaction: planted strings redact fully, rules never cross-fire") {
    import spark.implicits._
    val planted = Seq(
      (1L, "mail bob.smith+x@sub.example.co.uk today", 1, 0, 0, 0),
      (2L, "card 4111-1111-1111-0042 swiped", 0, 1, 0, 0),
      (3L, "call 555-012-3456 or 555-999-0000", 0, 0, 2, 0),
      (4L, "host 10.0.0.1 and 192.168.255.254 up", 0, 0, 0, 2),
      (5L, "a@b.io 4111-2222-3333-4444 555-111-2222 8.8.8.8", 1, 1, 1, 1),
      (6L, "no pii here at all", 0, 0, 0, 0)).toDF(
      "id", "s", "e_email", "e_cc", "e_phone", "e_ipv4")
    val counted = planted.select(col("*") +:
      graft.operators.Curation.PiiRules.map { case (name, pat, _) =>
        size(regexp_extract_all(col("s"), lit(pat), lit(0))).alias(s"n_$name")
      } :+ graft.operators.Curation.piiRedact(col("s")).alias("red"): _*)
    counted.collect().foreach { r =>
      for (n <- Seq("email", "cc", "phone", "ipv4"))
        assert(r.getAs[Int](s"n_$n") == r.getAs[Int](s"e_$n"),
          s"rule $n miscounted on id ${r.getLong(0)}: ${r.getAs[String]("red")}")
      // full redaction: no digit runs that look like PII survive, and no
      // partially-consumed token is re-matched by a later rule
      val red = r.getAs[String]("red")
      assert(!red.matches(".*\\d{3}-\\d{3}.*") && !red.contains("@"),
        s"residual PII in: $red")
    }
    // ordering property the scaladoc claims: an intact card number is
    // consumed by the cc rule, never split into a phone match
    val cc = counted.filter(col("id") === 2).head()
    assert(cc.getAs[Int]("n_cc") == 1 && cc.getAs[Int]("n_phone") == 0)
    assert(cc.getAs[String]("red").contains("[CC]"))
  }

  test("docs_pii_redacted: residue-class coverage and funnel agreement") {
    val rows = q("docs_pii_redacted").collect()
    assert(rows.length == 500)
    // the deterministic augmentation fires exactly on its residue class
    rows.foreach { r =>
      val id = r.getLong(0)
      assert((r.getAs[Int]("n_email") > 0) == (id % 3 == 0), s"email at $id")
      assert((r.getAs[Int]("n_cc") > 0) == (id % 7 == 0), s"cc at $id")
      assert((r.getAs[Int]("n_phone") > 0) == (id % 4 == 0), s"phone at $id")
      assert((r.getAs[Int]("n_ipv4") > 0) == (id % 5 == 0), s"ipv4 at $id")
    }
    // funnel's per-rule coverage columns equal direct counts over this set
    val funnel = q("curation_funnel_report").head()
    for (n <- Seq("email", "cc", "phone", "ipv4"))
      assert(funnel.getAs[Long](s"n_pii_${n}_docs") ==
        rows.count(_.getAs[Int](s"n_$n") > 0), s"funnel disagrees on $n")
  }

  test("orders_above_customer_avg matches a direct per-customer computation") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .collect()
    val byCust = orders.groupBy(_.getLong(1))
    val expected = orders.filter { r =>
      val cents = math.round(r.getDouble(2) * 100)
      val grp = byCust(r.getLong(1))
      val s = grp.map(g => math.round(g.getDouble(2) * 100)).sum
      cents * grp.length > s
    }.map(_.getLong(0)).toSet
    val got = q("orders_above_customer_avg")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(got == expected)
  }

  test("htmlClean: uppercase tags strip, entity decode is single-pass," +
      " boilerplate lines drop") {
    import spark.implicits._
    // the oracle gate cannot catch case-sensitivity (both engines would
    // share the miss), so the (?i) rules are pinned here; doc 2 pins the
    // amp-last decode order (the literal text '&amp;lt;' must decode to
    // '&lt;' once, never to '<'); doc 3 pins the short-line and
    // nav-line boilerplate rules
    val docs = Seq(
      (1L, "<SCRIPT>var leak = 1;</SCRIPT>real content line of text here"),
      (2L, "before &amp;lt; after with longer padding text"),
      (3L, "a long informative line of document text\nok\n" +
        "<a href=\"/x\">Home</a> | <a href=\"/y\">About</a>"))
      .toDF("doc_id", "text")
    val got = docs
      .select(col("doc_id"),
        graft.operators.Curation.htmlClean(col("text")).alias("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!got(1L).contains("leak"),
      s"uppercase script content leaked into the corpus: '${got(1L)}'")
    assert(got(1L).contains("real content line of text here"))
    assert(got(2L).contains("&lt;") && !got(2L).contains("&amp;") &&
      !got(2L).contains("<"), s"entity decode order broke: '${got(2L)}'")
    assert(got(3L) == "a long informative line of document text",
      s"boilerplate lines survived: '${got(3L)}'")
  }

  test("htmlClean: CRLF and Unicode line separators normalize before the" +
      " line-anchored rules") {
    import spark.implicits._
    // Java regex treats \r and U+2028/U+2029 as line terminators, RE2
    // only \n — so every (?m) rule would diverge between the engines on
    // CRLF crawl text if rule 0 didn't normalize endings first. The
    // planted CRLF and U+2028 docs pin that the short-line and nav-line
    // rules fire on non-\n-terminated lines, and that output carries
    // no \r at all (the normalized form both engines then agree on).
    val docs = Seq(
      (1L, "a long informative line of document text\r\nok\r\n" +
        "<a href=\"/x\">Home</a> | <a href=\"/y\">About</a>\r\n"),
      (2L, "first informative long line of text\u2028ok\u2028" +
        "second informative long line of text"))
      .toDF("doc_id", "text")
    val got = docs
      .select(col("doc_id"),
        graft.operators.Curation.htmlClean(col("text")).alias("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "a long informative line of document text",
      s"CRLF boilerplate lines survived: '${got(1L)}'")
    assert(got(2L) == "first informative long line of text\n" +
      "second informative long line of text",
      s"U+2028-separated short line survived: '${got(2L)}'")
    assert(!got.values.exists(_.contains("\r")), "output still carries \\r")
  }
}
