package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time registered queries at sf0.1 after a sf0.001 warm-up of
  * the same query (the Bench warm-up pattern), 32 threads. Usage:
  * `sbt "runMain graft.TimeQ <query> [<query> ...]"`. Not part of the
  * driver contract — see Bench for the measured surface.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      val warm = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      val t1 = System.nanoTime()
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
      println(f"$name warm_sf0.001: $warm%.2f s, then_sf0.1: ${(System.nanoTime() - t1) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
