package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: replicate the Bench measurement loop exactly (sibling-SF
  * warm-up, clearCache, timed loop in registry iteration order) but print
  * per-query seconds in RUN order, to separate per-query cost from
  * run-position cost (JIT, GC, cache rebuilds landing on early queries).
  * Not part of the driver contract.
  */
object BenchOrder {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm-up dir derived exactly like Bench: smallest SIBLING sf* dir
    val warmDir = Option(new java.io.File(sfDir).getParentFile)
      .toSeq
      .flatMap(p => Option(p.listFiles).toSeq.flatten)
      .filter(f => f.isDirectory && f.getName.startsWith("sf") &&
        f.getAbsolutePath != new java.io.File(sfDir).getAbsolutePath)
      .sortBy(f => scala.util.Try(f.getName.stripPrefix("sf").toDouble)
        .getOrElse(Double.MaxValue))
      .headOption.map(_.toString)
    warmDir.foreach(dir => SparkEntry.queries.valuesIterator.foreach(fn =>
      try fn(spark, dir).count() catch { case _: Throwable => }))
    spark.catalog.clearCache()
    var i = 0
    val t00 = System.nanoTime()
    SparkEntry.queries.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      // a failed query must not print a normal-looking timing
      val status =
        try { fn(spark, sfDir).count(); "" }
        catch { case t: Throwable => s"  FAILED: ${t.getClass.getSimpleName}" }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[$i%02d] $name%-35s ${dt}%7.3f s$status")
      i += 1
    }
    println(f"TOTAL ${(System.nanoTime() - t00) / 1e9}%.3f s")
    spark.stop()
  }
}
