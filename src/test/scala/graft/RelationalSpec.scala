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

  test("degree orientation bounds wedge fan-out on a planted 10³-degree hub") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Adversarial skew: hub 0 touches spokes 1..1000 (undirected degree
    // 10³), plus one triangle among spokes {1,2,3}. Id-orientation would
    // enumerate all C(1000,2) ≈ 5·10⁵ hub wedges in ONE task; degree
    // orientation points every hub edge INTO the hub, so its out-degree
    // is 0 and the enumerated wedge count collapses to the handful at
    // the low-degree spokes.
    val hubEdges  = (1L to 1000L).map(i => (0L, i))
    val spokeTris = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val edges = (hubEdges ++ spokeTris).toDF("part_a", "part_b")
    val degrees = edges
      .select(explode(array(col("part_a"), col("part_b"))).alias("node"))
      .groupBy(col("node")).agg(count(lit(1)).alias("d"))
    val oriented = graft.operators.Relational.orientByDegree(edges, degrees)

    // triangles: hub-1-2, hub-2-3, hub-1-3, 1-2-3
    val tri = graft.operators.Relational.countTrianglesOriented(oriented).collect()
    assert(tri.length == 1 && tri(0).getLong(0) == 4L, s"triangles: ${tri.mkString}")

    // orientation sanity: every edge present exactly once, hub never a tail
    assert(oriented.count() == 1003L)
    assert(oriented.filter(col("src") === 0L).count() == 0L, "hub must have out-degree 0")

    // the skew bound itself: enumerated wedges Σ outdeg·(outdeg-1)/2 stays
    // tiny although the undirected wedge total is ≥ C(1000,2)
    val outdegs = oriented.groupBy(col("src")).agg(count(lit(1)).alias("od"))
      .select(col("od")).as[Long].collect()
    assert(outdegs.max <= 4L, s"max out-degree ${outdegs.max} — fan-out not bounded")
    val enumerated = outdegs.map(d => d * (d - 1) / 2).sum
    val undirected = 1000L * 999L / 2
    assert(enumerated < 20L,
      s"enumerated $enumerated wedges; id-orientation would pay >= $undirected")
  }

  test("copurchase_pagerank: planted hub-and-spoke matches the exact integer recurrence") {
    import spark.implicits._
    // a 6-spoke star plus a disconnected pair: the hub must dominate, the
    // spokes must tie EXACTLY (quantized arithmetic — no float jitter),
    // and every rank must equal a driver-side replay of the integer
    // recurrence rank' = 0.15Q + Σ (85·rank) div (100·outdeg)
    val edgeList = (1 to 6).map(i => (100L, i.toLong)) :+ (200L, 201L)
    val got = graft.operators.Relational.pagerankOf(
        edgeList.toDF("part_a", "part_b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val adj = scala.collection.mutable.Map[Long, List[Long]]().withDefaultValue(Nil)
    edgeList.foreach { case (a, b) =>
      adj(a) = b :: adj(a); adj(b) = a :: adj(b)
    }
    val Q = 1000000000L
    var rank = adj.keys.map(_ -> Q).toMap
    for (_ <- 1 to 5) {
      val in = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for ((u, ns) <- adj; v <- ns)
        in(v) = in(v) + (85L * rank(u)) / (100L * ns.size)
      rank = adj.keys.map(k => k -> (Q * 15L / 100L + in(k))).toMap
    }
    assert(got == rank, s"got $got\nwant $rank")
    assert(got(100L) == got.values.max, "hub must carry the highest rank")
    assert((1 to 6).map(i => got(i.toLong)).distinct.size == 1, "spokes must tie exactly")
    assert(got(200L) == got(201L), "the isolated pair must tie exactly")
    assert(got(100L) > got(1L) && got(1L) != got(200L))
  }
}
