package graft

import org.apache.spark.sql.functions._

/** Plan-shape assertions for the knobs a 100 TB deployment leans on:
  * join-strategy hints and range-clustered output layout. These pin
  * behavior that silent Catalyst changes could regress.
  */
class ScalePostureSpec extends SparkSpec {

  test("join strategy hints select the hinted physical join") {
    val l = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf)
    val merge = l.join(o.hint("merge"), l("l_orderkey") === o("o_orderkey"))
    assert(merge.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
    val shuffleHash = l.join(o.hint("shuffle_hash"), l("l_orderkey") === o("o_orderkey"))
    assert(shuffleHash.queryExecution.executedPlan.toString.contains("ShuffledHashJoin"))
    val bcast = l.join(broadcast(o), l("l_orderkey") === o("o_orderkey"))
    assert(bcast.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("time-range filters on raw nanos push down to the events parquet scan") {
    // the converted `ts` column wraps the physical long in an expression,
    // which parquet cannot skip on — a 100 TB time-slice scan must filter
    // the RAW nanos first (same instant × 1000), then convert
    val cutoffNs = 1704067200L * 1000000000L // 2024-01-01T00:00Z
    val raw = spark.read.schema(Tables.eventsPhysicalSchema)
      .parquet(s"$sf/events.parquet")
      .filter(col("ts") >= cutoffNs)
    val scan = raw.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("PushedFilters"))
    assert(scan.isDefined && scan.get.contains("GreaterThanOrEqual(ts"),
      scan.getOrElse("no scan line"))
    // and the derived micros column agrees with filtering after conversion
    val viaConverted = Tables.events(spark, sf)
      .filter(unix_micros(col("ts")) >= cutoffNs / 1000).count()
    assert(raw.count() == viaConverted)
  }

  test("repartitionByRange + sortWithinPartitions writes range-clustered files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-range").toString
    Tables.orders(spark, sf)
      .repartitionByRange(4, col("o_orderdate"))
      .sortWithinPartitions(col("o_orderdate"))
      .write.mode("overwrite").parquet(s"$dir/orders")
    // each file covers a disjoint date range → downstream date filters
    // can skip whole files via parquet row-group stats
    val files = new java.io.File(s"$dir/orders").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length > 1)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(unix_micros(col("o_orderdate").cast("timestamp"))),
          max(unix_micros(col("o_orderdate").cast("timestamp")))).head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    for (Array(a, b) <- ranges.sliding(2))
      assert(a._2 <= b._1, s"overlapping file ranges: $a vs $b")
    // and the full row set survives the re-layout
    assert(spark.read.parquet(s"$dir/orders").count() ==
      Tables.orders(spark, sf).count())
  }
}
