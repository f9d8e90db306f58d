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
