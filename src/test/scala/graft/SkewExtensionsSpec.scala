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
