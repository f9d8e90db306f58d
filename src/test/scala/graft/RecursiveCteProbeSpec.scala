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

  test("part_bom_explosion_sql: edges form a strictly-decreasing DAG (termination)" +
      " and the recursive walk matches a driver-side path recomputation") {
    import org.apache.spark.sql.functions.col
    val keys = Tables.part(spark, sf).select(col("p_partkey")).collect()
      .map(_.getLong(0)).toSet
    // the same edge derivation the query spells in SQL
    val edges = keys.toSeq.flatMap { p =>
      val half = if (p / 2 >= 1) Seq((p, p / 2, p % 3 + 1)) else Nil
      val third = if (p / 3 >= 1 && p / 3 != p / 2) Seq((p, p / 3, p % 5 + 1)) else Nil
      half ++ third
    }
    // TERMINATION: every edge strictly decreases the key → acyclic, and
    // UNION-ALL fixpoint recursion must empty within log2(max key) levels
    assert(edges.nonEmpty && edges.forall { case (p, c, _) => c < p })
    val adj = edges.groupBy(_._1)
    val want = scala.collection.mutable.Map[(Long, Long), (Long, Long, Int)]()
    // the registered walk's depth cap: the recursive branch only extends
    // rows with lvl < 9, so children exist at levels 1..9
    def walk(root: Long, node: Long, qty: Long, lvl: Int): Unit =
      if (lvl < 9) adj.getOrElse(node, Nil).foreach { case (_, c, q) =>
        val nq = qty * q
        val (p0, q0, l0) = want.getOrElse((root, c), (0L, 0L, Int.MaxValue))
        want((root, c)) = (p0 + 1, q0 + nq, math.min(l0, lvl + 1))
        walk(root, c, nq, lvl + 1)
      }
    keys.filter(_ % 50 == 0).foreach(r => walk(r, r, 1L, 0))
    val got = q("part_bom_explosion_sql").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getInt(4)))
      .toMap
    assert(got == want.toMap,
      s"BOM walk mismatch: got ${got.size} cells, want ${want.size}")
    // path multiplicity is load-bearing somewhere on the fixture —
    // otherwise the query degenerates to reachability and a non-recursive
    // spelling would cover it
    assert(got.values.exists(_._1 > 1), "no multi-path component on fixture")
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
