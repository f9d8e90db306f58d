package graft
import org.apache.spark.sql.SparkSession
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    for (name <- args) {
      println(s"########## $name ##########")
      // full plan, not a prefix: the optimization-round plan artifacts
      // (plans/rNN/<query>_{before,after}.txt) need every operator's
      // detail section, and a 4000-char cut dropped exactly the
      // PushedFilters/ReadSchema lines claims are checked against
      println(SparkEntry.queries(name)(spark, sf).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
