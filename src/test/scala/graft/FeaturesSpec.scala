package graft

import org.apache.spark.sql.functions._

class FeaturesSpec extends SparkSpec {

  test("fuzzy pairs: same block, bounded distance, and the planted typo pairs found") {
    val rows = q("fuzzy_part_name_pairs").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, d) = (r.getString(0), r.getString(1), r.getInt(2))
      assert(d >= 1 && d <= 2)
      assert(a.split(" ").last == b.split(" ").last, s"($a, $b) cross-block")
      assert(a < b)
    }
    // the fixture's planted adjective typo: cold X ~ old X at distance 1
    assert(rows.exists(r => r.getString(0).startsWith("cold ") &&
      r.getString(1).startsWith("old ") && r.getInt(2) == 1))
  }

  test("zscore output only flags |z| > 2.5 and z reconstructs from group stats") {
    val out = q("events_value_zscore").collect()
    assert(out.nonEmpty)
    assert(out.forall(r => math.abs(r.getDouble(3)) > 2.5))
    // reconstruct per-type mean/std from raw data (float tolerance)
    val stats = Tables.events(spark, sf).groupBy("event_type")
      .agg(avg("value").alias("m"), stddev_pop("value").alias("s"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    out.foreach { r =>
      val (m, s) = stats(r.getString(1))
      val z = (r.getDouble(2) - m) / s
      assert(math.abs(z - r.getDouble(3)) < 1e-6)
    }
  }
}
