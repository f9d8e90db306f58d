package graft

import org.apache.spark.sql.functions._

import graft.sources.BucketedTableSink

/** Bucketing = the pre-paid shuffle: co-located joins on the bucket key
  * must plan WITHOUT a shuffle exchange on either side.
  */
class BucketingSpec extends SparkSpec {

  /** Idempotent setup shared by both tests so each runs in isolation.
    * The in-memory catalog resets per JVM but the warehouse directory
    * persists — stale locations make CREATE TABLE AS fail, hence the
    * directory cleanup before each (re)create.
    */
  private def ensureBucketedTables(): Unit = {
    if (spark.catalog.tableExists("li_bucketed") &&
      spark.catalog.tableExists("o_bucketed")) return
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    for (t <- Seq("li_bucketed", "o_bucketed")) {
      val dir = new java.io.File(s"/tmp/graft-test-warehouse/$t")
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete())
        dir.delete()
      }
    }
    BucketedTableSink("li_bucketed", buckets = 4,
      bucketCols = Seq("l_orderkey"), sortCols = Seq("l_orderkey"))
      .write(Tables.lineitem(spark, sf))
    BucketedTableSink("o_bucketed", buckets = 4,
      bucketCols = Seq("o_orderkey"), sortCols = Seq("o_orderkey"))
      .write(Tables.orders(spark, sf))
  }

  test("join of two tables bucketed on the join key plans with no shuffle") {
    ensureBucketedTables()
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the bucket co-location (not a broadcast) is
      // what eliminates the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed").join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"), "inner")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n${plan.take(800)}")
      assert(joined.count() == Tables.lineitem(spark, sf).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("groupBy on the bucket key also skips the shuffle") {
    ensureBucketedTables()
    val agg = spark.table("li_bucketed").groupBy("l_orderkey")
      .agg(count(lit(1)).alias("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n${plan.take(800)}")
    assert(agg.count() == Tables.lineitem(spark, sf).select("l_orderkey").distinct().count())
  }
}
