package graft

import org.apache.spark.sql.functions._

import graft.functions.PowerSums

class PowerSumsSpec extends SparkSpec {

  test("udaf-registered PowerSums reproduces order_price_stats exactly") {
    val agg = udaf(PowerSums)
    val viaUdaf = Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus").alias("order_status"))
      .agg(agg(col("o_totalprice")).alias("s"))
      .select(col("order_status"), col("s.n").alias("n"),
        col("s.mean").alias("mean_price"), col("s.stddev").alias("stddev_price"))
    val viaQuery = q("order_price_stats")
      .select("order_status", "n", "mean_price", "stddev_price")
    val mismatch = viaUdaf.alias("a")
      .join(viaQuery.alias("b"), Seq("order_status"))
      .filter(col("a.n") =!= col("b.n") ||
        col("a.mean_price") =!= col("b.mean_price") ||
        col("a.stddev_price") =!= col("b.stddev_price"))
    assert(mismatch.count() == 0)
    assert(viaUdaf.count() == viaQuery.count())
  }

  test("merge associativity: same result at any partitioning") {
    import spark.implicits._
    val data = (1 to 1000).map(i => (i % 7).toString -> (i * 1.37)).toDF("k", "x")
    val agg = udaf(PowerSums)
    def run(parts: Int) = data.repartition(parts).groupBy("k")
      .agg(agg(col("x")).alias("s")).select(col("k"), col("s.stddev"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(run(1) == run(13))
  }
}
