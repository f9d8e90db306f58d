package graft

import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {

  test("gapfill spine is continuous: one row per day, no holes, bounds match data") {
    val out = q("orders_daily_gapfill").cache()
    val n = out.count()
    val bounds = out.agg(min(col("date")).alias("lo"), max(col("date")).alias("hi"),
      countDistinct(col("date")).alias("nd")).collect()(0)
    // continuous spine: distinct dates == rows == datediff+1
    assert(bounds.getLong(2) == n)
    val span = out.select(datediff(max(col("date")), min(col("date"))) + 1).collect()(0).getInt(0)
    assert(span.toLong == n, s"spine has holes: $span days in range, $n rows")
    // data bounds: first/last day must carry at least one order
    val firstLast = out.orderBy("date").collect()
    assert(firstLast.head.getLong(1) > 0 && firstLast.last.getLong(1) > 0)
    out.unpersist()
  }

  test("gapfill preserves totals: sum of filled series equals raw totals") {
    val filled = q("orders_daily_gapfill")
      .agg(sum(col("n_orders")).alias("n")).collect()(0).getLong(0)
    assert(filled == Tables.orders(spark, sf).count())
  }

  test("yoy growth is consistent with the revenue column") {
    val rows = q("orders_yoy_growth").orderBy("year").collect()
    assert(rows.length > 1)
    assert(rows.head.isNullAt(3) && rows.head.isNullAt(4)) // first year: no prev
    rows.sliding(2).foreach { case Array(prev, cur) =>
      assert(cur.getDouble(3) == prev.getDouble(2)) // prev_revenue chains
      val expected = (cur.getDouble(2) - cur.getDouble(3)) / cur.getDouble(3)
      assert(cur.getDouble(4) == expected)
    }
  }
}
