package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.plans.GraftFunctions

/** Randomized differential tests: the codegen expressions must agree
  * with their interpreted higher-order-function spellings on arbitrary
  * inputs — including null elements, empty arrays, and (for the dot)
  * mismatched lengths — not just on the fixture corpus. Fixed seeds
  * keep failures reproducible.
  */
class ExpressionPropertySpec extends SparkSpec {

  private val elemGen: Gen[Option[Long]] = Gen.frequency(
    9 -> Gen.chooseNum(-1000000L, 1000000L).map(Some(_)),
    1 -> Gen.const(None))

  private def arrays(seed: Long, n: Int): List[Option[List[Option[Long]]]] =
    Gen.listOfN(n, Gen.frequency(
        9 -> Gen.chooseNum(0, 12).flatMap(len => Gen.listOfN(len, elemGen)).map(Some(_)),
        1 -> Gen.const(None)))
      .apply(Gen.Parameters.default, Seed(seed)).get

  test("morton32 Catalyst expression equals the JVM reference on arbitrary longs") {
    import spark.implicits._
    // full long range — the expression must mask to the low 32 bits the
    // same way the reference does, including negatives and high bits set
    val pairs = Gen.listOfN(500,
        Gen.zip(Gen.chooseNum(Long.MinValue, Long.MaxValue),
          Gen.chooseNum(Long.MinValue, Long.MaxValue)))
      .apply(Gen.Parameters.default, Seed(43L)).get
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.functions.ZOrder.morton32(col("a"), col("b")).alias("m"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) ==
        graft.functions.ZOrder.morton32Ref(r.getLong(0), r.getLong(1)),
        s"morton(${r.getLong(0)}, ${r.getLong(1)})")
    }
    // monotone locality sanity on the masked domain: code of (x, y) has
    // a's bits on even positions — recover both inputs by de-interleave
    got.foreach { r =>
      val m = r.getLong(2)
      def unspread(v: Long): Long = {
        var x = v & 0x5555555555555555L
        x = (x | (x >>> 1)) & 0x3333333333333333L
        x = (x | (x >>> 2)) & 0x0F0F0F0F0F0F0F0FL
        x = (x | (x >>> 4)) & 0x00FF00FF00FF00FFL
        x = (x | (x >>> 8)) & 0x0000FFFF0000FFFFL
        (x | (x >>> 16)) & 0xFFFFFFFFL
      }
      assert(unspread(m) == (r.getLong(0) & 0xFFFFFFFFL)
        && unspread(m >>> 1) == (r.getLong(1) & 0xFFFFFFFFL),
        "morton code must be losslessly de-interleavable")
    }
  }

  test("piiRedact is idempotent on arbitrary PII-shaped strings") {
    import spark.implicits._
    val span = Gen.oneOf(
      Gen.const("user@example.com"),
      Gen.const("4111-1111-1111-0042"),
      Gen.const("555-012-3456"),
      Gen.const("10.0.0.1"),
      Gen.alphaLowerStr.map(_.take(8)),
      Gen.numStr.map(_.take(6)),
      Gen.const("@"), Gen.const("."), Gen.const("-"))
    val strings = Gen.listOfN(300,
        Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, span)).map(_.mkString(" ")))
      .apply(Gen.Parameters.default, Seed(101L)).get
    val out = strings.toDF("s")
      .select(graft.operators.Curation.piiRedact(col("s")).alias("once"))
      .select(col("once"),
        graft.operators.Curation.piiRedact(col("once")).alias("twice"))
      .collect()
    out.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"redaction not idempotent: '${r.getString(0)}' -> '${r.getString(1)}'")
    }
  }

  test("chunkWindows: full coverage, stride starts, bounded sizes on random docs") {
    import spark.implicits._
    val docs = Gen.listOfN(200,
        Gen.chooseNum(1, 120).flatMap(len =>
          Gen.listOfN(len, Gen.alphaLowerStr.map(_.take(3)))))
      .apply(Gen.Parameters.default, Seed(17L)).get
      .zipWithIndex.map { case (toks, i) => (i.toLong, toks) } :+
      (999L, List.empty[String]) // empty array → no chunks at all, not [[]]
    val df = docs.toDF("id", "toks")
    val out = df.select(col("id"),
        graft.functions.TextFunctions.chunkWindows(col("toks"), 32, 24).alias("cs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[scala.collection.Seq[String]](1)).toMap
    for ((id, toks) <- docs) {
      val cs = out(id)
      if (toks.isEmpty) {
        assert(cs.isEmpty, s"doc $id: empty input must yield zero chunks")
      } else {
      val expectedK = if (toks.length <= 32) 0 else (toks.length - 32 + 23) / 24
      assert(cs.length == expectedK + 1, s"doc $id chunk count")
      cs.zipWithIndex.foreach { case (c, k) =>
        assert(c == toks.slice(k * 24, k * 24 + 32), s"doc $id chunk $k content")
        assert(c.nonEmpty && c.length <= 32)
      }
      // coverage: every token index falls inside some chunk's range
      assert(cs.map(_.length).sum >= toks.length)
      assert(cs.last.length + (cs.length - 1) * 24 == toks.length,
        s"doc $id tail coverage")
      }
    }
  }

  test("LongArrayDot ≡ HOF dot on random arrays with nulls and length skew") {
    import spark.implicits._
    val pairs = arrays(11L, 150).zip(arrays(13L, 150))
    val df = pairs.toDF("a", "b")
    val rows = df.select(
        GraftFunctions.longDot(col("a"), col("b")).alias("fast"),
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")
          .alias("hof"))
      .filter(!(col("fast") <=> col("hof")))
      .take(3)
    assert(rows.isEmpty, rows.mkString("; "))
  }

  test("DoubleArrayDot ≡ HOF dot on random vectors with nulls and length skew") {
    import spark.implicits._
    // same null/length-skew domain as the long test, double-valued
    val delemGen: Gen[Option[Double]] = Gen.frequency(
      9 -> Gen.chooseNum(-1000.0, 1000.0).map(Some(_)),
      1 -> Gen.const(None))
    def darrays(seed: Long): List[Option[List[Option[Double]]]] =
      Gen.listOfN(150, Gen.frequency(
          9 -> Gen.chooseNum(0, 12).flatMap(len => Gen.listOfN(len, delemGen)).map(Some(_)),
          1 -> Gen.const(None)))
        .apply(Gen.Parameters.default, Seed(seed)).get
    val df = darrays(17L).zip(darrays(19L)).toDF("a", "b")
    val rows = df.select(
        graft.functions.VectorFunctions.dot(col("a"), col("b")).alias("fast"),
        graft.functions.VectorFunctions.dotHof(col("a"), col("b")).alias("hof"))
      .filter(!(col("fast") <=> col("hof")))
      .take(3)
    assert(rows.isEmpty, rows.mkString("; "))
    // and the fixture float embeddings agree end-to-end (upcast path)
    val emb = Tables.embeddings(spark, sf).limit(50)
      .select(graft.functions.VectorFunctions.dot(col("embedding"), col("embedding"))
          .alias("fast"),
        graft.functions.VectorFunctions.dotHof(col("embedding"), col("embedding"))
          .alias("hof"))
      .filter(!(col("fast") <=> col("hof")))
      .take(3)
    assert(emb.isEmpty, emb.mkString("; "))
  }

  test("SimHash60 ≡ HOF simhash on random hash arrays with null elements") {
    import spark.implicits._
    // simhash input domain: NON-NULL arrays of non-negative 60-bit
    // hashes (elements may be null). On a NULL array the spellings
    // deliberately diverge — asserted separately below.
    val hashGen: Gen[Option[Long]] = Gen.frequency(
      9 -> Gen.chooseNum(0L, (1L << 60) - 1).map(Some(_)),
      1 -> Gen.const(None))
    val docs = Gen.listOfN(120,
        Gen.chooseNum(0, 20).flatMap(len => Gen.listOfN(len, hashGen)))
      .apply(Gen.Parameters.default, Seed(29L)).get
    val df = docs.toDF("hashes")
    val hof = expr(
      """aggregate(
        |  sequence(59, 0, -1),
        |  CAST(0 AS BIGINT),
        |  (acc, b) -> acc * 2 + (CASE WHEN
        |     aggregate(hashes, CAST(0 AS BIGINT),
        |       (a, h) -> a + (CASE WHEN (h div CAST(pow(2, b) AS BIGINT)) % 2 = 1
        |                      THEN 1 ELSE -1 END)) > 0
        |     THEN 1 ELSE 0 END))""".stripMargin)
    val rows = df.select(
        GraftFunctions.simHash60(col("hashes")).alias("fast"), hof.alias("hof"))
      .filter(!(col("fast") <=> col("hof")))
      .take(3)
    assert(rows.isEmpty, rows.mkString("; "))
  }

  test("MinHash16 ≡ HOF minhash on random shingle arrays with null elements") {
    import spark.implicits._
    // shingle domain: arrays of short strings (some null elements, some
    // null arrays, some empty arrays) — the codegen one-pass signature
    // must bit-match the two-layer HOF spelling everywhere, including
    // the skip-null-element and empty-array→all-MaxValue contracts.
    val strGen: Gen[Option[String]] = Gen.frequency(
      9 -> Gen.alphaNumStr.map(s => Some(s.take(12))),
      1 -> Gen.const(None))
    val docs = Gen.listOfN(150, Gen.frequency(
        9 -> Gen.chooseNum(0, 25).flatMap(len => Gen.listOfN(len, strGen)).map(Some(_)),
        1 -> Gen.const(Option.empty[List[Option[String]]])))
      .apply(Gen.Parameters.default, Seed(31L)).get
    val df = docs.toDF("sh")
    val rows = df.select(
        operators.Dedup.minhashSignature(col("sh")).alias("fast"),
        operators.Dedup.minhashSignatureHof(col("sh")).alias("hof"))
      .filter(!(col("fast") <=> col("hof")))
      .take(3)
    assert(rows.isEmpty, rows.mkString("; "))
  }

  test("PHash60 ≡ HOF block-mean hash on random ASCII payloads") {
    import spark.implicits._
    // payload domain: ASCII strings (where byte = codepoint, the regime
    // the HOF/oracle spelling shares), lengths straddling every block
    // regime — empty, shorter than 61, around multiples of 61, long
    val asciiGen = for {
      len <- Gen.frequency(
        1 -> Gen.const(0), 2 -> Gen.chooseNum(1, 60),
        3 -> Gen.chooseNum(61, 200), 2 -> Gen.chooseNum(480, 500))
      cs <- Gen.listOfN(len, Gen.chooseNum(32, 126).map(_.toChar))
    } yield cs.mkString
    val docs = Gen.listOfN(200, asciiGen)
      .apply(Gen.Parameters.default, Seed(31L)).get
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val hof = expr("(length(text) + 60) div 61").alias("bs")
    val staged = df.select(col("doc_id"), col("text"), hof)
      .select(col("doc_id"), col("text"),
        expr("transform(sequence(0, 60), k -> struct(" +
          "aggregate(slice(split(text, ''), CAST(k * bs + 1 AS INT), CAST(bs AS INT)), " +
          "CAST(0 AS BIGINT), (acc, c) -> acc + ascii(c)) AS s, " +
          "CAST(length(substring(text, CAST(k * bs + 1 AS INT), CAST(bs AS INT))) AS BIGINT) AS l))")
          .alias("b"))
      .select(col("doc_id"), col("text"),
        expr("aggregate(sequence(0, 59), CAST(0 AS BIGINT), (acc, g) -> " +
          "acc * 2 + (CASE WHEN element_at(b, g + 2).s * element_at(b, g + 1).l " +
          "> element_at(b, g + 1).s * element_at(b, g + 2).l " +
          "THEN 1 ELSE 0 END))").alias("hof"))
    val bad = staged
      .select(col("doc_id"), GraftFunctions.pHash60(col("text")).alias("fast"),
        col("hof"))
      .filter(!(col("fast") <=> col("hof")))
      .take(3)
    assert(bad.isEmpty, bad.mkString("; "))
    // null in, null out
    val nulls = Seq((1L, Option.empty[String])).toDF("doc_id", "text")
    assert(nulls.select(GraftFunctions.pHash60(col("text"))).head().isNullAt(0))
  }

  test("PHash60 over arbitrary binary payloads matches the JVM reference past ASCII") {
    import spark.implicits._
    // the binary-typed contract: the expression hashes BYTES, any bytes —
    // not just the ASCII regime the HOF/oracle codepoint twin shares.
    // Reference is an independent driver-side loop over the same
    // definition; payload domain covers sign-extension traps (bytes
    // ≥ 0x80), empties, and every block-size regime
    def ref(b: Array[Byte]): Long = {
      val n = b.length
      val bs = (n + 60) / 61
      val sums = new Array[Long](61)
      val lens = new Array[Long](61)
      if (bs > 0) {
        for (k <- 0 until 61) {
          val st = k.toLong * bs
          val en = math.min(st + bs, n.toLong)
          if (en > st) {
            lens(k) = en - st
            sums(k) = (st.toInt until en.toInt).map(i => (b(i) & 0xff).toLong).sum
          }
        }
      }
      (0 until 60).foldLeft(0L)((acc, g) =>
        (acc << 1) + (if (sums(g + 1) * lens(g) > sums(g) * lens(g + 1)) 1L else 0L))
    }
    val byteGen = for {
      len <- Gen.frequency(
        1 -> Gen.const(0), 2 -> Gen.chooseNum(1, 60),
        3 -> Gen.chooseNum(61, 200), 2 -> Gen.chooseNum(480, 500))
      bs <- Gen.listOfN(len, Gen.chooseNum(-128, 127).map(_.toByte))
    } yield bs.toArray
    val payloads = Gen.listOfN(200, byteGen)
      .apply(Gen.Parameters.default, Seed(47L)).get
    val got = payloads.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("doc_id", "payload")
      .select(col("doc_id"), GraftFunctions.pHash60(col("payload")).alias("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    payloads.zipWithIndex.foreach { case (b, i) =>
      assert(got(i.toLong) == ref(b), s"payload $i (${b.length} bytes)")
    }
    // string arguments ride the implicit byte-preserving string→binary
    // cast: a NON-ASCII string hashes as its UTF-8 bytes
    val uni = "héllo wörld — ünïcode ✓ 日本語テキスト" * 8
    val viaString = Seq(Tuple1(uni)).toDF("text")
      .select(GraftFunctions.pHash60(col("text"))).head().getLong(0)
    assert(viaString == ref(uni.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    // null binary in, null out
    val nulls = Seq(Tuple1(Option.empty[Array[Byte]])).toDF("payload")
    assert(nulls.select(GraftFunctions.pHash60(col("payload"))).head().isNullAt(0))
  }

  test("WinnowFingerprints ≡ HOF winnowing on random text including multi-byte UTF-8") {
    import spark.implicits._
    // text domain: lengths straddling the short-doc filter (k + w - 1)
    // and block boundaries, drawn from an alphabet that MIXES ASCII with
    // 2-, 3- and 4-byte UTF-8 code points — the multi-byte strings drive
    // the expression's char→byte offset table while the ASCII-only ones
    // take its identity fast path; the HOF + window spelling works in
    // character space throughout, so any drift between byte slicing and
    // character substring surfaces as a fingerprint diff. Small alphabet
    // (8 symbols) makes repeated k-grams — and thus hash ties and
    // change-dedup suppressions — common rather than incidental.
    val sym = Gen.oneOf("a", "b", " ", "é", "ß", "日", "語", "😀")
    val textGen = Gen.frequency(
      1 -> Gen.chooseNum(0, 10),   // below the k+w-1 filter
      4 -> Gen.chooseNum(11, 40),
      2 -> Gen.chooseNum(100, 160))
      .flatMap(len => Gen.listOfN(len, sym)).map(_.mkString)
    val docs = Gen.listOfN(150, textGen)
      .apply(Gen.Parameters.default, Seed(53L)).get
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val fast = operators.Dedup.winnowFingerprintsOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hof = operators.Dedup.winnowFingerprintsOfHof(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fast == hof,
      s"only-fast=${(fast -- hof).take(3)} only-hof=${(hof -- fast).take(3)}")
    assert(fast.nonEmpty, "degenerate domain: no fingerprints selected at all")
  }

  test("SimHash60 null-array contract intentionally diverges from the HOF spelling") {
    import spark.implicits._
    // the HOF CASE swallows the inner null and folds to 0; the
    // expression propagates null — the saner "unknown input" answer.
    // The query never hits this (split of non-null text is non-null);
    // this test pins the divergence so it stays a documented choice.
    val df = Seq(Option.empty[List[Option[Long]]]).toDF("hashes")
    val r = df.select(
      GraftFunctions.simHash60(col("hashes")).alias("fast"),
      expr("""aggregate(sequence(59, 0, -1), CAST(0 AS BIGINT),
             |  (acc, b) -> acc * 2 + (CASE WHEN
             |     aggregate(hashes, CAST(0 AS BIGINT), (a, h) -> a + 1) > 0
             |     THEN 1 ELSE 0 END))""".stripMargin).alias("hof")).head
    assert(r.isNullAt(0) && !r.isNullAt(1) && r.getLong(1) == 0L)
  }

  test("MinKByHash ≡ rank window on random grouped data (ties, nulls, short groups, merges)") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // narrow hash range [0, 25] forces plenty of ties (id tiebreak),
    // 22 groups over 800 rows leaves some groups smaller than k, and
    // repartition(7) forces real partial-buffer merges
    val rows = Gen.listOfN(800,
        Gen.zip(Gen.chooseNum(0, 21),
          Gen.frequency(
            9 -> Gen.chooseNum(0L, 25L).map(Some(_)),
            1 -> Gen.const(Option.empty[Long])),
          Gen.chooseNum(0L, 10000L)))
      .apply(Gen.Parameters.default, Seed(67L)).get
    val df = rows.map { case (g, h, id) => (g, h.map(Long.box).orNull, id) }
      .toDF("g", "h", "id").repartition(7)
    for (k <- Seq(1, 3, 5)) {
      val agg = df.groupBy(col("g"))
        .agg(graft.plans.MinKByHash.minKByHash(col("h"), col("id"), k).alias("s"))
        .select(col("g"), posexplode(col("s")))
        .select(col("g"), (col("pos") + 1).alias("rank"),
          col("col.h").alias("h"), col("col.id").alias("id"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      val win = df.filter(col("h").isNotNull)
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("g")).orderBy(col("h"), col("id"))))
        .filter(col("rank") <= k)
        .select(col("g"), col("rank"), col("h"), col("id"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      assert(agg.toSet == win.toSet, s"k=$k")
      // groups with any non-null row appear with min(k, group size) rows
      assert(agg.length == win.length, s"k=$k cardinality")
    }
  }

  test("DistinctMinK ≡ slice(array_sort(collect_set), 1, k) on random grouped longs") {
    import spark.implicits._
    // group sizes and duplication rates straddle k, so the buffer's
    // three regimes all occur: never-full (distinct < k), exactly-full,
    // and saturated-with-eviction (distinct > k, arrivals out of order);
    // nulls exercise the skip discipline
    val rowGen = Gen.zip(
      Gen.chooseNum(0L, 30L),                       // group key
      Gen.frequency(
        9 -> Gen.chooseNum(-50L, 50L).map(Some(_)), // heavy duplication
        1 -> Gen.const(Option.empty[Long])))
    val rows = Gen.listOfN(4000, rowGen)
      .apply(Gen.Parameters.default, Seed(61L)).get
    val df = rows.toDF("g", "v")
    for (k <- Seq(1, 3, 21)) {
      val got = df.groupBy(col("g"))
        .agg(graft.plans.DistinctMinK.distinctMinK(col("v"), k).alias("docs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
      val ref = df.groupBy(col("g"))
        .agg(slice(array_sort(collect_set(col("v"))), 1, k).alias("docs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
      assert(got == ref, s"k=$k: ${got.toSeq.diff(ref.toSeq).take(3)}")
    }
    // all-null group evaluates to an empty array, like collect_set
    val empty = Seq((1L, Option.empty[Long])).toDF("g", "v")
      .groupBy(col("g"))
      .agg(graft.plans.DistinctMinK.distinctMinK(col("v"), 5).alias("d"))
      .head().getSeq[Long](1)
    assert(empty.isEmpty)
  }

  test("winnowOverlapOf ≡ the r21 window+self-join spelling on random fingerprints") {
    import spark.implicits._
    // random (doc_id, h) occurrence frames with DUPLICATE occurrences
    // (in the real frame the p column makes (doc_id, h) repeat) and hash
    // df straddling the cap (20): the weighted head hashes go HOT (df >
    // cap over the 41-doc domain — their pairs must all vanish), the
    // tail hashes stay rare, and docs share enough rare hashes for the
    // ≥10-shared threshold to pass on some pairs and fail on others.
    val hGen = Gen.frequency(
      1 -> Gen.chooseNum(0L, 2L),     // hot head: df ≈ all 41 docs
      4 -> Gen.chooseNum(3L, 150L))   // rare tail: df well under the cap
    val rowGen = Gen.zip(Gen.chooseNum(0L, 40L), hGen)
    val rows = Gen.listOfN(2600, rowGen)
      .apply(Gen.Parameters.default, Seed(67L)).get
    val fp = rows.toDF("doc_id", "h")
    val got = operators.Dedup.winnowOverlapOf(fp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // reference: the r21 spelling — dedup, window df, cap filter,
    // self-join, pair count
    val rare = fp.dropDuplicates("doc_id", "h")
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
      .filter(col("df") <= 20)
      .select(col("doc_id"), col("h"))
    val ref = rare.alias("a").join(rare.alias("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").alias("doc_a"), col("b.doc_id").alias("doc_b"))
      .agg(count(lit(1)).alias("n_shared"))
      .filter(col("n_shared") >= 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == ref,
      s"only-new=${(got -- ref).take(3)} only-ref=${(ref -- got).take(3)}")
    assert(got.nonEmpty, "degenerate domain: no overlap pairs at all")
  }

  test("MinKByHash survives serialize/deserialize round trips (sort-based fallback shape)") {
    import spark.implicits._
    val e = graft.plans.MinKByHash(
      org.apache.spark.sql.GraftSqlBridge.expression(col("h")),
      org.apache.spark.sql.GraftSqlBridge.expression(col("id")), 3)
    val buf = e.createAggregationBuffer()
    Seq((5L, 1L), (2L, 9L), (2L, 3L), (7L, 0L), (1L, 4L)).foreach { p =>
      buf.enqueue(p); if (buf.size > 3) buf.dequeue()
    }
    val rt = e.deserialize(e.serialize(buf))
    assert(rt.toArray.sorted.toSeq == buf.toArray.sorted.toSeq)
    // an empty buffer round-trips to an empty buffer
    assert(e.deserialize(e.serialize(e.createAggregationBuffer())).isEmpty)
  }
}
