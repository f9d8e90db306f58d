package graft

import org.apache.spark.sql.functions._

class TextEventsSpec extends SparkSpec {

  test("text_bpe_learned_merges matches a driver-side BPE training recomputation") {
    import org.apache.spark.sql.functions.col
    // the full trainer re-implemented imperatively: word histogram, then
    // per round weighted pair counts → argmax → greedy left-to-right fold
    val freq = scala.collection.mutable.Map[String, Long]()
    Tables.documents(spark, sf).select(col("text")).collect().foreach { r =>
      r.getString(0).split(" ", -1).filter(_.nonEmpty)
        .foreach(w => freq(w) = freq.getOrElse(w, 0L) + 1L)
    }
    val vocab = scala.collection.mutable.Map[String, Vector[String]](
      freq.keys.map(w => w -> w.toVector.map(_.toString)).toSeq: _*)
    val want = (1 to 3).map { round =>
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      for ((w, s) <- vocab; i <- 0 until s.length - 1)
        pc((s(i), s(i + 1))) = pc.getOrElse((s(i), s(i + 1)), 0L) + freq(w)
      val ((l, r), c) = pc.minBy { case ((l, r), c) => (-c, l, r) }
      for ((w, s) <- vocab) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < s.length) {
          if (i < s.length - 1 && s(i) == l && s(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += s(i); i += 1 }
        }
        vocab(w) = out.result()
      }
      (round, l, r, c)
    }
    val got = q("text_bpe_learned_merges").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == want, s"got $got\nwant $want")
    // the merges must actually be learned from pair statistics, not
    // degenerate: counts strictly positive and non-increasing is NOT
    // guaranteed (a merge can create a more frequent pair), but every
    // count must be positive and pairs distinct
    assert(got.map(m => (m._2, m._3)).distinct.size == 3 && got.forall(_._4 > 0))
  }

  test("BPE trainer: planted vocabulary pins greedy-fold semantics and symbol escaping") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // "aaaaa" is THE distinguishing case: greedy left-to-right merging of
    // (a,a) yields [aa, aa, a]; a replace-until-fixpoint lookalike yields
    // [aa, a, aa]. "o'x" plants a quote in the symbol alphabet so round
    // 3's fold must escape its injected literal. freqs force merge
    // order: (a,a)=12, then (a,b)=5, then round 3 is a 4-vs-4 tie of
    // (o,') and (',x) against (aa,aa)=(aa,a)=3 — broken lexicographically
    // to (', x), the quoted symbol.
    val words = Seq(("aaaaa", 3L), ("ab", 5L), ("o'x", 4L)).toDF("w", "freq")
    val (merges, sym) = graft.operators.TextAnalysis.bpeTrainOn(words, 3)
    assert(merges == Seq((1, "a", "a", 12L), (2, "a", "b", 5L), (3, "'", "x", 4L)),
      s"merges: $merges")
    val seg = sym.select(col("w"),
        org.apache.spark.sql.functions.array_join(col("s"), "|").alias("seg"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(seg("aaaaa") == "aa|aa|a", s"greedy fold broken: ${seg("aaaaa")}")
    assert(seg("ab") == "ab")
    assert(seg("o'x") == "o|'x", s"quote symbol mishandled: ${seg("o'x")}")
    // backslash in the symbol alphabet: the winning merge's injected
    // literal must escape it for Spark's default \x-processing parser
    val bs = Seq(("q\\z", 7L)).toDF("w", "freq")
    val (bm, bsym) = graft.operators.TextAnalysis.bpeTrainOn(bs, 2)
    assert(bm == Seq((1, "\\", "z", 7L), (2, "q", "\\z", 7L)), s"merges: $bm")
    val bseg = bsym.select(org.apache.spark.sql.functions.array_join(col("s"), "|"))
      .collect()(0).getString(0)
    assert(bseg == "q\\z", s"backslash symbol mishandled: $bseg")
    // vocabulary exhaustion: asking for more rounds than pairs exist must
    // stop cleanly with the merges actually learnable, not throw
    val (em, _) = graft.operators.TextAnalysis.bpeTrainOn(
      Seq(("ab", 1L)).toDF("w", "freq"), 5)
    assert(em == Seq((1, "a", "b", 1L)), s"exhaustion merges: $em")
  }

  test("trained-tokenizer application: planted multi-merge word end-to-end plus the OOV id") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // the trainer-spec vocabulary: merges (a,a) → (a,b) → (',x); final
    // segmentations aaaaa → [aa,aa,a], ab → [ab], o'x → [o,'x]
    val words = Seq(("aaaaa", 3L), ("ab", 5L), ("o'x", 4L)).toDF("w", "freq")
    val (merges, sym) = graft.operators.TextAnalysis.bpeTrainOn(words, 3)
    val vocab = graft.operators.TextAnalysis.trainedVocabIds(sym)
    // ids by symbol sort order, 0-based — the cross-engine rule
    assert(vocab == Seq("'x", "a", "aa", "ab", "o"), s"vocab: $vocab")
    val docs = Seq(
      (1L, Seq("aaaaa", "ab")), // the multi-merge word through the dictionary
      (2L, Seq("o'x", "aaaaa")), // quoted symbol in the segmentation dictionary
      (3L, Seq("zzz")), // OOV: char fallback, 'z' unknown — every char to -1
      // OOV with mergeable content: the RULE is char fallback, NOT
      // fold-then-map — "aaz" maps per char (a=1, a=1, z=-1), never [aa, z]
      (4L, Seq("aaz")))
      .toDF("doc_id", "t")
    assert(merges.nonEmpty) // the fold learned something to apply
    val got = graft.operators.TextAnalysis.bpeTokenIdsOf(docs, sym, vocab)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got(0) == ((1L, 2L, 4L, "2 2 1 3")), s"doc 1: ${got(0)}")
    assert(got(1) == ((2L, 2L, 5L, "4 0 2 2 1")), s"doc 2: ${got(1)}")
    assert(got(2) == ((3L, 1L, 3L, "-1 -1 -1")), s"doc 3: ${got(2)}")
    assert(got(3) == ((4L, 1L, 3L, "1 1 -1")), s"doc 4: ${got(3)}")
  }

  test("docs_bpe_token_ids: per-doc totals agree with the trained vocabulary table") {
    import org.apache.spark.sql.functions._
    // every document's n_bpe_tokens must equal the sum of its words'
    // n_sym in text_bpe_vocab — application ≡ the word-grain training
    // artifact (the oracle pins the ids; this pins internal consistency)
    val vocabSyms = q("text_bpe_vocab").select(col("w"), col("n_sym"))
    val docWords = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).alias("w"))
      .filter(col("w") =!= "")
    val expected = docWords.join(vocabSyms, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).alias("e_words"), sum(col("n_sym")).alias("e_bpe"))
    val bad = q("docs_bpe_token_ids")
      .join(expected, "doc_id")
      .filter(col("n_words") =!= col("e_words") || col("n_bpe_tokens") =!= col("e_bpe"))
    assert(bad.count() == 0)
    assert(q("docs_bpe_token_ids").count() == expected.count())
  }

  test("docs_token_packing_bpe: sized by the tokenizer frame, bins consistent") {
    import org.apache.spark.sql.functions._
    val packed = q("docs_token_packing_bpe")
    val ids = q("docs_bpe_token_ids").select(col("doc_id"),
      col("n_bpe_tokens"), col("n_words"))
    val joined = packed.join(ids, "doc_id")
    assert(joined.count() == packed.count() && packed.count() > 0)
    // the packing's sizes ARE the trained-tokenizer counts, and BPE can
    // only split words — never fewer tokens than words
    assert(joined.filter(col("n_tokens") =!= col("n_bpe_tokens")).count() == 0)
    assert(joined.filter(col("n_tokens") < col("n_words")).count() == 0)
    // bin arithmetic: bin of the doc's FIRST token, exclusive cumsum
    assert(packed.filter(
      col("bin_id") =!= floor((col("cum_tokens") - col("n_tokens")) / 256)).count() == 0)
  }

  test("text_quality: n_chars matches the documents table's own column") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("n_chars").alias("expected"))
    val bad = q("text_quality").join(docs, "doc_id")
      .filter(col("n_chars") =!= col("expected")).count()
    assert(bad == 0)
  }

  test("text_rare_bigram_ratio: bounded ratios, full coverage, consistent counts") {
    val rows = q("text_rare_bigram_ratio").collect()
    // every multi-token document gets a row (single-token docs have no bigrams)
    val expectedDocs = Tables.documents(spark, sf)
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(rows.length.toLong == expectedDocs)
    rows.foreach { r =>
      val (n, rare, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(n > 0 && rare >= 0 && rare <= n)
      assert(ratio == rare.toDouble / n)
    }
    // the signal discriminates on the fixture: not constant everywhere
    assert(rows.map(_.getDouble(3)).distinct.length > 1)
  }

  test("tfidf: exactly top-3 per doc, score consistent with tf·n_docs/df") {
    val nDocs = Tables.documents(spark, sf).count()
    val out = q("text_tfidf_top_terms").cache()
    val perDoc = out.groupBy("doc_id").agg(count(lit(1)).alias("k"),
      max(col("rank")).alias("maxr")).filter(col("k") =!= 3 || col("maxr") =!= 3)
    assert(perDoc.count() == 0) // every doc has ≥3 distinct terms in the fixture
    val bad = out.filter(
      col("tfidf") =!= (col("tf") * nDocs).cast("double") / col("df") ||
        col("df") < 1 || col("df") > nDocs).count()
    assert(bad == 0)
    out.unpersist()
  }

  test("text_surprisal_quality: bits match a driver-side df recompute") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val nDocs = docs.size
    val df = docs.values.flatMap(_.split(" ").distinct).groupBy(identity)
      .view.mapValues(_.size).toMap
    def bits(term: String): Long =
      (63 - java.lang.Long.numberOfLeadingZeros(nDocs.toLong / df(term))).toLong
    val rows = q("text_surprisal_quality").collect()
    assert(rows.length == nDocs)
    rows.take(25).foreach { r =>
      val toks = docs(r.getLong(0)).split(" ")
      assert(r.getLong(1) == toks.length.toLong)
      assert(r.getLong(2) == toks.map(bits).sum, s"doc ${r.getLong(0)}")
      assert(r.getDouble(3) >= 0.0 &&
        r.getDouble(3) <= math.log(nDocs.toDouble) / math.log(2.0))
    }
  }

  test("text_token_stats: one row per language, totals positive") {
    val rows = q("text_token_stats").collect()
    assert(rows.length == 5)
    assert(rows.forall(r => r.getAs[Long]("n_tokens") > 0 && r.getAs[Long]("vocab") > 0))
  }

  test("text_langid: predicted language is always one of the known codes") {
    val langs = q("text_langid").select("predicted_lang").distinct()
      .collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "es", "de", "fr", "und")))
  }

  test("text_fingerprint: permutation-sensitive (rolling, not bag-of-words)") {
    import spark.implicits._
    import graft.functions.TextFunctions
    val two = Seq("alpha beta gamma", "gamma beta alpha").toDF("text")
      .select(TextFunctions.rollingFingerprint(TextFunctions.tokens(col("text"))).alias("fp"))
      .collect().map(_.getLong(0))
    assert(two(0) != two(1))
  }

  test("events_sessionize: events sum to total and session times ordered") {
    val sess = q("events_sessionize")
    val totalEvents = sess.agg(sum("n_events")).collect()(0).getLong(0)
    assert(totalEvents == Tables.events(spark, sf).count())
    assert(sess.filter(col("session_end") < col("session_start")).count() == 0)
  }

  test("events_latest_per_user: one row per user at the max timestamp") {
    val latest = q("events_latest_per_user")
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(latest.count() == users)
    val maxTs = Tables.events(spark, sf).groupBy("user_id").agg(max("ts").alias("mx"))
    val bad = latest.join(maxTs, "user_id").filter(col("ts") =!= col("mx")).count()
    assert(bad == 0)
  }

  test("events_hourly: window starts are hour-aligned") {
    val bad = q("events_hourly")
      .filter(minute(col("hour_start")) =!= 0 || second(col("hour_start")) =!= 0)
      .count()
    assert(bad == 0)
  }

  test("docs_length_profile matches driver-side interpolated percentiles") {
    val bySource = Tables.documents(spark, sf)
      .select(col("source"), size(split(col("text"), " ")).alias("n")).collect()
      .map(r => (r.getString(0), r.getInt(1).toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    // Spark's Percentile.getPercentile two-sided weighted form — the
    // formula matters to the last ulp: a + frac*(b-a) differs from it
    // by one ulp on this fixture
    def pct(xs: IndexedSeq[Long], p: Double): Double = {
      val pos = p * (xs.length - 1)
      val lo = math.floor(pos).toInt
      val hi = math.ceil(pos).toInt
      if (lo == hi) xs(lo).toDouble
      else (hi - pos) * xs(lo) + (pos - lo) * xs(hi)
    }
    val got = q("docs_length_profile").collect()
    assert(got.map(_.getString(0)).toSet == bySource.keySet)
    got.foreach { r =>
      val xs = bySource(r.getString(0))
      assert(r.getLong(1) == xs.length.toLong)
      assert(r.getDouble(2) == xs.sum.toDouble / xs.length)
      assert(r.getDouble(3) == pct(xs, 0.5), s"${r.getString(0)} p50")
      assert(r.getDouble(4) == pct(xs, 0.9), s"${r.getString(0)} p90")
      assert(r.getDouble(5) == pct(xs, 0.99), s"${r.getString(0)} p99")
    }
  }

  test("bm25_top_docs: planted relevance ranks as BM25 must") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // four planted documents, one query — the ordering is the theorem:
    //  d1: 'zebra' three times in a SHORT doc  → highest score
    //  d2: 'zebra' once, same short length     → below d1 (tf saturation
    //      grows, never shrinks, with tf at fixed dl)
    //  d3: 'zebra' once in a LONG doc          → below d2 (length
    //      normalization penalizes dl > avgdl)
    //  d4: no query term                       → absent from the result
    val docs = Seq(
      (1L, "zebra zebra zebra pad"),
      (2L, "zebra pad pad pad"),
      (3L, "zebra " + Seq.fill(20)("pad").mkString(" ")),
      (4L, "pad pad pad pad")).toDF("doc_id", "text")
    val queries = Seq((7, "zebra")).toDF("query_id", "q_text")
    val got = TextAnalysis.bm25TopDocsOf(docs, queries)
      .select(col("query_id"), col("rank"), col("doc_id"), col("n_hit_terms"),
        col("score_m")).collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L),
      s"wrong ranking: ${got.mkString(", ")}")
    assert(got.forall(_.getInt(0) == 7))
    assert(got.map(_.getInt(1)).toSeq == Seq(1, 2, 3))
    assert(got.forall(_.getLong(3) == 1L), "each doc hits exactly one query term")
    val scores = got.map(_.getLong(4)).toSeq
    assert(scores == scores.sorted.reverse && scores.distinct == scores,
      s"scores not strictly descending: $scores")
    // and a multi-term query accumulates per-term millionths exactly:
    // a doc hitting both terms outranks the same doc hitting one
    val q2 = Seq((9, "zebra pad")).toDF("query_id", "q_text")
    val both = TextAnalysis.bm25TopDocsOf(docs, q2)
      .filter(col("doc_id") === 1L).collect()(0)
    assert(both.getLong(3) == 2L)
    assert(both.getLong(4) > got.head.getLong(4),
      "adding a second matched term must add score")
  }

  test("langid_confusion cells recompute from the per-doc predictions and" +
      " shares sum to 100 per actual language") {
    import org.apache.spark.sql.functions.col
    val preds = q("text_langid_ngram").collect()
      .map(r => (r.getString(1), r.getString(6)))
    val want = preds.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = q("langid_confusion").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want, s"matrix disagrees with per-doc predictions")
    // total = corpus size; shares sum to 100 within each actual language
    assert(got.values.sum == preds.length)
    q("langid_confusion").collect()
      .groupBy(_.getString(0))
      .foreach { case (lang, rows) =>
        val share = rows.map(_.getDouble(3)).sum
        assert(math.abs(share - 100.0) < 1e-9, s"$lang shares sum to $share")
      }
  }

  test("dfForgetDocs: a term living only in forgotten docs VANISHES;" +
      " shared terms decrement exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // doc_id % 10 == 7 marks the erasure set (7, 17); `secretname`
    // occurs ONLY there — after erasure it must be gone entirely, not
    // tombstoned at df = 0 (the term itself is the private datum)
    val docs = Seq(
      (7L, "secretname shared"),
      (17L, "secretname shared shared"),
      (1L, "shared other"),
      (2L, "other other")).toDF("doc_id", "text")
    // drives the PRODUCTION operator body (dfForgetDocsOf), not a
    // re-spelling — the vanish/decrement properties pin the real code
    val got = operators.TextAnalysis.dfForgetDocsOf(
        operators.TextAnalysis.termFreqsOf(docs), col("doc_id") % 10 === 7)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!got.contains("secretname"),
      "a term occurring only in forgotten docs must vanish from the index")
    assert(got("shared") == (1L, 1L),
      "shared term must decrement by exactly the forgotten contributions")
    assert(got("other") == (2L, 3L), "untouched term must be unchanged")
  }
}
