package graft

/** Invariants of the BI-tier relational queries (percent-of-parent
  * hierarchy shares, Pareto/ABC classification) that the DuckDB hash
  * check can't express: share closure and class monotonicity.
  */
class RelationalSpec extends SparkSpec {

  test("hierarchy shares close to 1 at every level") {
    val rows = q("revenue_share_hierarchy").collect()
    assert(rows.nonEmpty)
    // grand-total closure
    val totalShare = rows.map(_.getDouble(4)).sum
    assert(math.abs(totalShare - 1.0) < 1e-9, s"share_of_total sums to $totalShare")
    // per-region closure
    for ((region, rs) <- rows.groupBy(_.getString(0))) {
      val s = rs.map(_.getDouble(3)).sum
      assert(math.abs(s - 1.0) < 1e-9, s"region $region shares sum to $s")
    }
    // every nation's region share >= its global share (parent mass <= total)
    rows.foreach(r => assert(r.getDouble(3) >= r.getDouble(4) - 1e-12))
  }

  test("pareto classes are contiguous A..B..C in rank order, cumulative share ends at 1") {
    val rows = q("brand_revenue_pareto").collect().sortBy(_.getInt(1))
    assert(rows.nonEmpty)
    // ranks are 1..n, cum_share nondecreasing and exactly 1.0 at the end
    assert(rows.map(_.getInt(1)).toSeq == (1 to rows.length))
    val shares = rows.map(_.getDouble(3))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(shares.last == 1.0)
    // classes never go backwards (A before B before C) and A exists
    val classes = rows.map(_.getString(4))
    assert(classes.head == "A")
    assert(classes.zip(classes.tail).forall { case (a, b) => a <= b },
      s"classes out of order: ${classes.mkString}")
    // revenue is ranked descending (ties broken by brand, still non-increasing)
    val revs = rows.map(_.getDouble(2))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }
}
