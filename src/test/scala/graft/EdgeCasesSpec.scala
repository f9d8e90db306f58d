package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{AsOfJoin, Multimodal}
import graft.operators.Multimodal.MediaRow

/** Regression specs for review findings: short-document shingling, as-of
  * joins with nullable carry columns, empty-payload frame sampling, and
  * type safety of the custom dot-product expression.
  */
class EdgeCasesSpec extends SparkSpec {

  test("shingles of documents shorter than n are empty, not an error") {
    import spark.implicits._
    val out = Seq("one", "one two", "one two three", "a b c d")
      .toDF("text")
      .select(TextFunctions.tokens(col("text")).alias("t"))
      .select(size(TextFunctions.shingles(col("t"), 3)).alias("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(out == Seq(0, 0, 1, 2))
  }

  test("chunksOf edge inputs: empty text, exact multiple, one-over, and" +
      " chunks always rejoin to the original text") {
    import spark.implicits._
    val docs = Seq(
      (1L, ""),
      (2L, (1 to 32).map(i => s"t$i").mkString(" ")),
      (3L, (1 to 33).map(i => s"t$i").mkString(" ")),
      (4L, "solo")).toDF("doc_id", "text")
    val chunks = graft.operators.Dedup.chunksOf(docs)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(chunks(1L) == Seq(""))
    assert(chunks(2L).size == 1 && chunks(3L).size == 2)
    assert(chunks(3L)(1) == "t33")
    assert(chunks(4L) == Seq("solo"))
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    chunks.foreach { case (id, cs) => assert(cs.mkString(" ") == texts(id)) }
  }

  test("chunksOf property: for arbitrary token counts, chunk sizes are" +
      " ⌈n/32⌉ full-then-remainder and chunks always rejoin to the text") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val counts = Gen.listOfN(60, Gen.chooseNum(0, 200))
      .apply(Gen.Parameters.default, Seed(47L)).get
    val docs = counts.zipWithIndex.map { case (n, i) =>
      (i.toLong, (1 to n).map(k => s"w$k").mkString(" "))
    }.toDF("doc_id", "text")
    val got = graft.operators.Dedup.chunksOf(docs)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    counts.zipWithIndex.foreach { case (n, i) =>
      val cs = got(i.toLong)
      // a 0-token text splits to [""] (split semantics), so 1 chunk
      val tokens = math.max(n, 1)
      assert(cs.size == (tokens + 31) / 32, s"doc $i with $n tokens")
      assert(cs.init.forall(_.split(" ", -1).length == 32) || cs.size == 1)
      val want = (1 to n).map(k => s"w$k").mkString(" ")
      assert(cs.mkString(" ") == want, s"doc $i reassembly")
    }
  }

  test("asOf with a null value in a carry column does not stitch rows or drop the match") {
    import spark.implicits._
    val left = Seq((10L, 1L, 30L)).toDF("lid", "k", "lt")
    val right = Seq(
      (1L, 10L, Some(5L), Option.empty[Long]),   // t=10: a=5, b=null
      (1L, 20L, Option.empty[Long], Some(7L)))   // t=20: a=null, b=7
      .toDF("rk", "rt", "a", "b")
    val out = AsOfJoin.asOf(left, right,
        leftKey = "k", rightKey = "rk",
        leftTimeUs = col("lt"), rightTimeUs = col("rt"),
        carries = Seq("a", "b"), rightTiebreak = "rt")
      .select("lid", "a", "b").collect()
    // the match is the t=20 row AS A WHOLE: (a=null, b=7) — not a=5 from
    // the earlier row, and not dropped because one carry field is null
    assert(out.length == 1)
    assert(out(0).isNullAt(1) && out(0).getLong(2) == 7L)
  }

  test("copurchase pair fan-out stays bounded on a degenerate mega-basket") {
    import spark.implicits._
    // one order holding 10⁴ distinct parts: uncapped pairing would emit
    // ~5·10⁷ rows from a single basket; the cap bounds it at C(256, 2)
    val cap = graft.operators.Relational.MaxBasketSize
    val mega = (1L to 10000L).map(p => (1L, p)) ++ Seq((2L, 1L), (2L, 2L))
    val out = graft.operators.Relational.basketPairCounts(
      mega.toDF("l_orderkey", "l_partkey"))
    // order 2's (1,2) pair merges into the mega-basket's group, so the
    // distinct-pair count is exactly C(cap, 2)
    val n = out.count()
    assert(n == cap.toLong * (cap - 1) / 2,
      s"expected capped fan-out, got $n pairs")
    // the cap keeps the SMALLEST partkeys, deterministically: the pair
    // (1,2) is counted from both orders, and no pair references a part
    // beyond the cap boundary
    assert(out.filter(col("part_a") === 1 && col("part_b") === 2)
      .head.getLong(2) == 2L)
    assert(out.filter(col("part_b") > cap).count() == 0)
  }

  test("sampleFrames of an empty payload emits zero rows") {
    import spark.implicits._
    val ds = Seq(MediaRow(3L, "image", Array.empty[Byte], 0, 0, 0)).toDS()
    assert(Multimodal.sampleFrames(ds.toDF(), everyK = 1).count() == 0)
  }

  test("graft_long_dot casts int arrays up instead of misreading them") {
    graft.plans.GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_long_dot(array(1, 2, 3), array(4, 5, 6)) AS d")
      .collect()(0).getLong(0)
    assert(r == 32L)
  }

  test("graft_long_dot rejects wrong arity with a clear message") {
    graft.plans.GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_long_dot(array(1L))").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("expects 2 arguments")),
      s"expected the arity message, got: ${messages(e).mkString(" | ")}")
  }

  test("graft_long_dot yields null on unequal lengths (HOF parity)") {
    graft.plans.GraftFunctions.register(spark)
    val rows = spark.sql(
      """SELECT graft_long_dot(array(1L,2L,3L), array(1L,2L)) AS fast,
        |  aggregate(zip_with(array(1L,2L,3L), array(1L,2L), (x,y) -> x*y),
        |            0L, (acc,v) -> acc + v) AS hof""".stripMargin).collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
  }

  test("graft_long_dot yields null on a null element (HOF parity), interpreted and codegen") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    // via a real column (exercises the codegen path, not constant folding)
    val rows = Seq(
      (Seq(Some(1L), None, Some(3L)), Seq(Some(1L), Some(2L), Some(3L))),
      (Seq(Some(1L), Some(2L)), Seq(Some(4L), Some(5L))))
      .toDF("a", "b")
      .selectExpr("graft_long_dot(a, b) AS fast",
        "aggregate(zip_with(a, b, (x,y) -> x*y), 0L, (acc,v) -> acc + v) AS hof")
      .collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(rows(1).getLong(0) == 14L && rows(1).getLong(1) == 14L)
  }

  test("piiRedact edge inputs: empty string, adjacent spans, boundary non-matches") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      // empty + whitespace-only: no match, text unchanged
      (1L, "", ""),
      (2L, "   ", "   "),
      // adjacent PII spans with no separator word
      (3L, "a@b.co 1.2.3.4", "[EMAIL] [IP]"),
      // boundary NON-matches: 5-digit groups are not cards, 2-group
      // dotted numbers are not IPs, bare @ is not an email
      (4L, "41111-1111-1111-0042 ok", "41111-1111-1111-0042 ok"),
      (5L, "1.2 and lone @ sign", "1.2 and lone @ sign"),
      // an IP embedded in a longer dotted run: \b\d{1,3} quads still
      // match the first four groups (documented greedy-left behavior)
      (6L, "v 1.2.3.4.5", "v [IP].5")).toDF("id", "s", "expected")
    val got = rows.withColumn("red", graft.operators.Curation.piiRedact(col("s")))
    got.collect().foreach { r =>
      assert(r.getAs[String]("red") == r.getAs[String]("expected"),
        s"id ${r.getLong(0)}: got '${r.getAs[String]("red")}'")
    }
  }

  test("asOf rejects carry/internal name collisions up front") {
    import spark.implicits._
    val left = Seq((10L, 1L, 30L, 9L)).toDF("lid", "k", "lt", "a")
    val right = Seq((1L, 10L, 5L)).toDF("rk", "rt", "a")
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, right, leftKey = "k", rightKey = "rk",
        leftTimeUs = col("lt"), rightTimeUs = col("rt"),
        carries = Seq("a"), rightTiebreak = "rt")
    }
    assert(e1.getMessage.contains("collide with left columns"))
    val badLeft = Seq((10L, 1L, 30L, 0L)).toDF("lid", "k", "lt", "__side")
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(badLeft, right, leftKey = "k", rightKey = "rk",
        leftTimeUs = col("lt"), rightTimeUs = col("rt"),
        carries = Seq("a"), rightTiebreak = "rt")
    }
    assert(e2.getMessage.contains("internal"))
  }

  test("events_asof_order right side has a unique tiebreak per (key, time)") {
    // the max-per-(custkey, ts) reduction guarantees one row per group,
    // which is the documented precondition for a deterministic carry
    val dup = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).alias("k"))
      .groupBy(col("o_custkey"), col("o_orderdate")).count()
      .filter(col("count") > 1).count()
    assert(dup == 0)
  }

  test("events nanos->micros conversion floors (DuckDB cast semantics)") {
    import spark.implicits._
    val out = Seq(1999L, -1500L, 1000L, -1000L).toDF("ts")
      .selectExpr(s"unix_micros(${Tables.eventsTsMicrosExpr}) AS us")
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, -2L, 1L, -1L))
  }
}
