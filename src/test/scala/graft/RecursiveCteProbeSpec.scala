package graft

/** Pins this Spark build's `WITH RECURSIVE` surface (SPARK-24497): what
  * executes (UNION ALL recursion — the shape `customer_order_chain_sql`
  * relies on) and what is rejected (UNION-distinct recursion — which is
  * why cyclic transitive closure, e.g. connected components, cannot be
  * spelled as a recursive CTE here and stays the doubling DataFrame
  * implementation in [[graft.operators.Dedup.connectedComponents]]; the
  * DuckDB oracle CAN use recursive UNION for exactly that reason).
  */
class RecursiveCteProbeSpec extends SparkSpec {
  test("recursive CTE with UNION ALL executes") {
    val df = spark.sql("""
      WITH RECURSIVE r(n) AS (
        SELECT 1 AS n
        UNION ALL
        SELECT n + 1 FROM r WHERE n < 5)
      SELECT sum(n) AS s FROM r""")
    assert(df.collect()(0).getLong(0) == 15L)
  }

  test("recursive CTE with UNION-distinct is rejected (cycle-safe closure" +
      " is not expressible; CC stays the doubling implementation)") {
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L))
      .toDF("src", "dst").createOrReplaceTempView("probe_edges")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("""
        WITH RECURSIVE reach(node, r) AS (
          SELECT src AS node, src AS r FROM probe_edges
          UNION
          SELECT reach.node, e.dst
          FROM reach JOIN probe_edges e ON reach.r = e.src)
        SELECT node, min(r) AS cluster_id FROM reach GROUP BY node""").collect()
    }
    assert(e.getErrorClass == "UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE")
  }

  test("customer_order_chain_sql ordinal equals the window-rank spelling") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val want = Tables.orders(spark, sf)
      .select(col("o_custkey").alias("customer_key"),
        col("o_orderkey").alias("order_key"),
        row_number().over(Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))).alias("ordinal"))
      .filter(col("ordinal") <= 5)
      .orderBy("customer_key", "ordinal").collect().toSeq
    val got = q("customer_order_chain_sql").collect().toSeq
    assert(got == want)
  }
}
