package graft

import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  test("heavy hitters equal the exact GROUP BY ... HAVING result") {
    val exact = {
      val counts = Tables.lineitem(spark, sf)
        .groupBy(col("l_partkey").alias("part_key"))
        .agg(count(lit(1)).alias("n"))
      val avg = counts.agg(sum("n"), count(lit(1))).head()
      val thr = 1.5 * (avg.getLong(0).toDouble / avg.getLong(1))
      counts.filter(col("n") >= thr)
    }
    val ours = q("heavy_hitter_parts")
    assert(ours.except(exact).count() == 0 && exact.except(ours).count() == 0)
  }

  test("unpersistAll releases tracked sketch broadcasts without poisoning them") {
    val bc = CacheLifecycle.trackedBroadcast(
      spark.sparkContext.broadcast(Array[Byte](1, 2, 3)))
    assert(bc.value.length == 3)
    CacheLifecycle.unpersistAll()
    // unpersist (not destroy): executor blocks are released, but a
    // still-held plan embedding the broadcast must remain re-executable —
    // the value lazily re-ships from the driver copy
    assert(bc.value.length == 3)
    // and the registry drained: a second release pass has nothing to do
    CacheLifecycle.unpersistAll()
  }

  test("CMS never under-estimates: every true heavy hitter survives the prune") {
    // estimateCount(k) >= true count for every key, by CMS construction —
    // spot-check the whole key set against the same sketch config
    val l = Tables.lineitem(spark, sf)
    val cms = l.stat.countMinSketch(col("l_partkey"), 0.0001, 0.99, 42)
    val counts = l.groupBy("l_partkey").count().collect()
    counts.foreach { r =>
      assert(cms.estimateCount(r.getLong(0)) >= r.getLong(1),
        s"CMS under-estimated key ${r.getLong(0)}")
    }
  }

  test("HLL union rollup: exact vocab matches token stats, bound verdict true") {
    val rows = q("text_vocab_hll_rollup").collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    val exact = q("text_token_stats").select("lang", "vocab").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == exact.keySet)
    for ((lang, v) <- exact) {
      assert(rows(lang)._1 == v, s"$lang: exact twin ${rows(lang)._1} != $v")
      assert(rows(lang)._2, s"$lang: HLL rollup estimate outside 5% of $v")
    }
  }

  test("AMS self-join size: exact F2 matches a driver groupBy, verdict true," +
      " and the sketch is deterministic across runs") {
    val counts = Tables.lineitem(spark, sf).groupBy(col("l_partkey")).count()
      .collect().map(_.getLong(1))
    val wantF2 = counts.map(n => n * n).sum
    val row = q("lineitem_selfjoin_size_ams").collect()
    assert(row.length == 1)
    assert(row(0).getLong(0) == wantF2)
    assert(row(0).getBoolean(1), "AMS median estimate outside 10% of exact F2")
    val again = q("lineitem_selfjoin_size_ams").collect()
    assert(again(0) == row(0), "seeded xxhash sketch must be deterministic")
  }
}
