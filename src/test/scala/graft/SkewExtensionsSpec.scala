package graft

import org.apache.spark.sql.functions._

import graft.functions.Skew
import graft.plans.GraftFunctions

class SkewExtensionsSpec extends SparkSpec {

  test("saltedJoin returns exactly the rows of the unsalted join") {
    val li = Tables.lineitem(spark, sf)
    val p = Tables.part(spark, sf)
    val plain = li.join(p, li("l_partkey") === p("p_partkey"), "inner")
      .select(col("l_orderkey"), col("l_linenumber"), col("p_partkey"))
    val salted = Skew.saltedJoin(li, p,
        probeKey = "l_partkey", buildKey = "p_partkey",
        scatterOn = col("l_linenumber"), saltBuckets = 8)
      .select(col("l_orderkey"), col("l_linenumber"), col("p_partkey"))
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("graft_long_dot is callable from SQL text after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_long_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .collect()(0).getLong(0)
    assert(r == 32L)
  }

  test("RewriteHofDotProduct also rewrites the double-precision HOF form") {
    import spark.implicits._
    val df = Seq((Seq(1.5, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
    // Column-API spelling (lit(0.0) is a folded double literal — the
    // shape the rule sees after Catalyst's constant folding)
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).alias("d"))
    val rewritten = graft.plans.RewriteHofDotProduct(
      hof.queryExecution.analyzed)
    assert(rewritten.toString.contains("doublearraydot"), rewritten.toString)
    assert(hof.collect()(0).getDouble(0) == 12.5)
  }

  test("SimHash60 equals the interpreted HOF spelling on the fixture corpus") {
    val hofSig = expr(
      """aggregate(
        |  sequence(59, 0, -1),
        |  CAST(0 AS BIGINT),
        |  (acc, b) -> acc * 2 + (CASE WHEN
        |     aggregate(hashes, CAST(0 AS BIGINT),
        |       (a, h) -> a + (CASE WHEN (h div CAST(pow(2, b) AS BIGINT)) % 2 = 1
        |                      THEN 1 ELSE -1 END)) > 0
        |     THEN 1 ELSE 0 END))""".stripMargin)
    val hashed = Tables.documents(spark, sf)
      .select(col("doc_id"), expr(
        "transform(split(text, ' '), t -> CAST(conv(substring(md5(t), 18, 15), 16, 10) AS BIGINT))")
        .alias("hashes"))
    val diff = hashed
      .select(col("doc_id"), hofSig.alias("a"),
        GraftFunctions.simHash60(col("hashes")).alias("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("SimHash60 edge semantics: null votes -1 everywhere, empty array is zero, null array is null") {
    GraftFunctions.register(spark)
    val rows = spark.sql(
      """SELECT graft_simhash60(array(CAST(NULL AS BIGINT), 7L)) AS with_null,
        |       graft_simhash60(array(7L)) AS single,
        |       graft_simhash60(CAST(array() AS array<bigint>)) AS empty,
        |       graft_simhash60(CAST(NULL AS array<bigint>)) AS null_arr""".stripMargin)
      .collect()(0)
    // [null, 7]: each bit gets votes (-1, ±1) → sum ≤ 0 → no bit set
    assert(rows.getLong(0) == 0L)
    assert(rows.getLong(1) == 7L) // single element: its bits win
    assert(rows.getLong(2) == 0L) // zero votes → sum 0 → not > 0
    assert(rows.isNullAt(3))
  }

  test("GraftExtensions wires the same function at session-extension level") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext) // must register cleanly
  }

  test("RewriteHofDotProduct rewrites the HOF form and preserves the value") {
    import graft.plans.{LongArrayDot, RewriteHofDotProduct}
    val df = spark.range(1).select(
      aggregate(
        zip_with(typedlit(Seq(1L, 2L, 3L)), typedlit(Seq(4L, 5L, 6L)), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v).alias("d"))
    val before = df.queryExecution.analyzed
    val after = RewriteHofDotProduct(before)
    val rewritten = after.expressions.exists(_.exists(_.isInstanceOf[LongArrayDot]))
    assert(rewritten, s"rule did not fire:\n$after")
    assert(df.collect()(0).getLong(0) == 32L) // HOF semantics unchanged
  }

  test("RewriteHofDotProduct fires on containsNull arrays (transform output)") {
    import graft.plans.{LongArrayDot, RewriteHofDotProduct}
    val df = spark.range(3).select(
      aggregate(
        zip_with(transform(sequence(lit(1L), lit(3L)), x => x * col("id")),
          transform(sequence(lit(1L), lit(3L)), x => x + col("id")),
          (x, y) => x * y),
        lit(0L), (acc, v) => acc + v).alias("d"))
    val after = RewriteHofDotProduct(df.queryExecution.analyzed)
    assert(after.expressions.exists(_.exists(_.isInstanceOf[LongArrayDot])),
      s"rule did not fire on containsNull input:\n$after")
    // id=1: [1,2,3]·[2,3,4] = 20; id=2: [2,4,6]·[3,4,5] = 52
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 20L, 52L))
  }

  test("custom dot expression agrees with the HOF formulation") {
    import graft.functions.{VectorFunctions => V}
    val e = Tables.embeddings(spark, sf).limit(100)
      .select(V.quantize1000(col("embedding")).alias("v"))
    val bad = e.select(
        V.qdot(col("v"), col("v")).alias("fast"),
        V.qdotHof(col("v"), col("v")).alias("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(bad == 0)
  }
}
